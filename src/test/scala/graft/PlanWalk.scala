package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Test-side plan spelunking: AQE wraps subplans in LEAF nodes
  * (AdaptiveSparkPlanExec, the query stages), so a plain `collect` never
  * reaches the scans — this walker unwraps them. Shared by the specs
  * that pin partition-pruning contracts (AnnLayoutSpec,
  * VectorStoreSpec). */
object PlanWalk {
  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case f: FileSourceScanExec => Seq(f) }.flatten ++
      p.collect {
        case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
        case qs: QueryStageExec => fileScans(qs.plan)
      }.flatten
}

/** THE scale-gate plan classifier — one definition shared by the gate
  * (ScaleShapeSpec) and the budget-measuring main (ScaleBudgetProbe), so
  * the probe can never measure a different invariant than the gate
  * enforces (r14 review: the two had drifted into copy-pastes). */
object ScaleShape {
  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** Bounded dimension tables: a broadcast built from ONLY these scans is
    * scale-safe by data-model contract. */
  val dims: Set[String] = Set("region", "nation", "customer", "supplier", "part")

  /** Formatted-plan line count for a marker (each node appears twice:
    * tree + details). */
  def markerLines(df: DataFrame, marker: String): Int =
    formatted(df).linesIterator.count(_.contains(marker))

  def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** BroadcastExchanges whose build subtree is neither aggregation/limit/
    * local-relation-bounded nor dim-scans-only — the unbounded-broadcast
    * offenders the gate rejects. */
  def unboundedBroadcasts(plan: SparkPlan): Seq[String] = {
    val bounding = Set("HashAggregateExec", "ObjectHashAggregateExec",
      "SortAggregateExec", "LocalTableScanExec", "GlobalLimitExec",
      "LocalLimitExec", "TakeOrderedAndProjectExec", "SubqueryBroadcastExec")
    plan.collect {
      case p if p.getClass.getSimpleName == "BroadcastExchangeExec" => p
    }.flatMap { b =>
      val hasBound = b.exists(n => bounding(n.getClass.getSimpleName))
      val factScan = b.collect {
        case f if f.getClass.getSimpleName == "FileSourceScanExec" &&
          !dims.exists(d => f.toString.contains(s"$d.parquet")) => f
      }
      if (hasBound || factScan.isEmpty) Nil
      else Seq(s"unbounded broadcast over fact scan:\n$b")
    }
  }

  /** The sf1-regression proxy: re-plan with estimate-based auto-broadcast
    * DISABLED and count SortMergeJoin lines — a join that only avoids SMJ
    * through a small-SF size estimate will degrade at real scale. */
  def robustSmjLines(s: SparkSession, replan: => DataFrame): Int = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = s.conf.get(key)
    try {
      s.conf.set(key, "-1")
      markerLines(replan, "SortMergeJoin")
    } finally s.conf.set(key, prev)
  }
}
