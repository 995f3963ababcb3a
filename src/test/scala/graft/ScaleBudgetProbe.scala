package graft

import java.nio.file.Files

/** One-off measuring harness for widening the [[ScaleShapeSpec]] exchange
  * budgets (VERDICT r13 #1): plans every declared query on the same 5×
  * replica the gate uses and prints, per query, the formatted-plan
  * Exchange line count, SortMergeJoin/CartesianProduct hits, unbounded
  * broadcasts, and whether the plan degrades to SMJ when estimate-based
  * auto-broadcast is disabled (the sf1-regression proxy). Output is the
  * raw material for pinning budgets — not a gate itself.
  *
  *   sbt "Test/runMain graft.ScaleBudgetProbe [q_name ...]"
  */
object ScaleBudgetProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSuite.spark
    val dest = Files.createTempDirectory("graft_budget_probe").toString
    ScaleGen.generate(s, "/root/testdata/sf0.01", dest, 5)
    val wanted: Seq[String] =
      if (args.nonEmpty) args.toSeq else Queries.all.map(_.name)
    val dims = Set("region", "nation", "customer", "supplier", "part")
    wanted.foreach { name =>
      val out =
        try {
          val df = Queries.byName(name).run(s, dest)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          def n(m: String): Int = plan.linesIterator.count(_.contains(m))
          val unbounded = {
            val bounding = Set("HashAggregateExec", "ObjectHashAggregateExec",
              "SortAggregateExec", "LocalTableScanExec", "GlobalLimitExec",
              "LocalLimitExec", "TakeOrderedAndProjectExec", "SubqueryBroadcastExec")
            df.queryExecution.sparkPlan.collect {
              case p if p.getClass.getSimpleName == "BroadcastExchangeExec" => p
            }.count { b =>
              val hasBound = b.exists(x => bounding(x.getClass.getSimpleName))
              val factScan = b.collect {
                case f if f.getClass.getSimpleName == "FileSourceScanExec" &&
                  !dims.exists(d => f.toString.contains(s"$d.parquet")) => f
              }
              !hasBound && factScan.nonEmpty
            }
          }
          val key = "spark.sql.autoBroadcastJoinThreshold"
          val prev = s.conf.get(key)
          val robustSmj =
            try {
              s.conf.set(key, "-1")
              val p2 = Queries.byName(name).run(s, dest).queryExecution
                .explainString(
                  org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
              p2.linesIterator.count(_.contains("SortMergeJoin"))
            } finally s.conf.set(key, prev)
          f"PROBE $name%-28s exch=${n("Exchange")}%3d smj=${n("SortMergeJoin")}%d " +
            f"cart=${n("CartesianProduct")}%d unboundedBc=$unbounded%d robustSmj=$robustSmj%d"
        } catch {
          case e: Throwable => s"PROBE $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}"
        }
      // println is the product here: a measuring main, not library code
      println(out)
    }
  }
}
