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
