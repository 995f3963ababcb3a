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
    wanted.foreach { name =>
      val out =
        try {
          // every classifier comes from ScaleShape — the gate's OWN
          // definitions — so a probe measurement is a gate measurement
          val df = Queries.byName(name).run(s, dest)
          def n(m: String): Int = ScaleShape.markerLines(df, m)
          val unbounded =
            ScaleShape.unboundedBroadcasts(df.queryExecution.sparkPlan).size
          val robustSmj =
            ScaleShape.robustSmjLines(s, Queries.byName(name).run(s, dest))
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
