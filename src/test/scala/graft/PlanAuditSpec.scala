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

  test("q_source_overlap's EXECUTED plan reuses the gram exchange (one corpus shuffle)") {
    // The r13 collect_set rewrite's whole point: the corpus shuffles once
    // (the gram-keyed set aggregation) and both downstream consumers
    // (pair expansion, per-source sizes) reuse stages instead of
    // re-scanning. Static plans can't show this — AQE stage reuse only
    // materializes in the adaptive FINAL plan — so drive this
    // QueryExecution and assert on its executed form: at least two
    // ReusedExchange nodes (the gram agg + the source rollup) and
    // exactly one documents scan outside the printed initial-plan
    // section. A regression to the self-join-with-fresh-aliases spelling
    // (which re-scanned the corpus for the sizes branch) fails here.
    val df = Queries.byName("q_source_overlap").run(s, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val finalSection = plan.split("== Initial Plan ==").head
    assert(finalSection.linesIterator.count(_.contains("ReusedExchange")) >= 2,
      s"expected >= 2 reused stages in the final plan:\n$finalSection")
    assert(finalSection.linesIterator.count(_.contains("FileScan parquet")) === 1,
      s"expected exactly one corpus scan in the final plan:\n$finalSection")
  }
}
