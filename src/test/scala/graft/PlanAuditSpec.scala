package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB plan contract, enforced at test time instead of by round-end
  * inspection: NO query's physical plan may contain a SortMergeJoin —
  * every join in the surface is either broadcastable by design (dims,
  * single-row query frames, probe lists) or restructured to avoid pairwise
  * joins entirely (LSH buckets, in-row zips, bucket-local generators). A
  * SMJ appearing here means a broadcast hint was lost or an input grew
  * past the threshold-free shape the query was designed around — the
  * classic silent scale regression (at sf0.001 it would still pass every
  * correctness gate while shuffling both sides at 100 TB).
  *
  * Plans are built (not executed) over sf0.001, the same dir graft.Explain
  * audits; queries whose construction trains driver-side models still run
  * those bounded jobs.
  *
  * SCOPE: the audit sees each query's FINAL plan. Iterative engines that
  * localCheckpoint per round (connectedComponents) execute their per-round
  * joins during construction, behind the checkpoint boundary — those are
  * out of this audit's sight and are pinned by explicit SHUFFLE_HASH hints
  * at the join site instead (the intended at-scale plan there: both sides
  * big, sort adds nothing). */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark
  private val dir = "/root/testdata/sf0.001"

  test("no query plans a SortMergeJoin") {
    val offenders = Queries.all.flatMap { q =>
      val plan = q.run(s, dir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      if (plan.contains("SortMergeJoin")) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"SortMergeJoin in: ${offenders.mkString(", ")} — a broadcast hint " +
        "was lost or a side outgrew its designed shape")
  }
}
