package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the semantic-curation pair (q_semantic_dedup,
  * q_embed_prototypes) that the DuckDB oracle cannot express as a
  * hash-compare: the election/ranking CONTRACTS. The oracle proves the
  * numbers match; this spec proves the numbers mean what the scaladoc
  * says (min-keeper direction, threshold floor, ranking coherence), so a
  * future edit that keeps outputs deterministic but flips a contract
  * (e.g. electing the max id) fails here, not at the next judge. */
class SemanticCurationSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark
  private val dir = "/root/testdata/sf0.01"

  test("semantic dedup: min-keeper election invariants hold") {
    val rows = Queries.byName("q_semantic_dedup").run(s, dir).collect()
    assert(rows.nonEmpty, "the demo threshold should flag some within-cell pairs")
    val total = Tables.embeddings(s, dir).count()
    assert(rows.length < total, "removing everything means the threshold is degenerate")
    rows.foreach { r =>
      val vecId = r.getAs[Long]("vec_id")
      val keeper = r.getAs[Long]("keeper")
      val maxCos = r.getAs[Double]("max_cosine")
      assert(keeper < vecId,
        s"keeper $keeper must be the LOWER id of the pair (removed $vecId)")
      assert(maxCos >= 0.4 && maxCos <= 1.0 + 1e-9,
        s"max_cosine $maxCos outside [tau, 1] for removed $vecId")
    }
    // one decision per removed vector — the groupBy contract
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length === rows.length)
  }

  test("semantic dedup is deterministic across runs (trained path included)") {
    def snap() = Queries.byName("q_semantic_dedup").run(s, dir)
      .collect().map(_.toSeq).toSeq
    assert(snap() === snap(),
      "two runs disagree — the trained assignment or election is unstable")
  }

  test("prototype/outlier ranking is coherent per cell") {
    val rows = Queries.byName("q_embed_prototypes").run(s, dir).collect()
    assert(rows.nonEmpty)
    val byCell = rows.groupBy(_.getAs[Long]("cell"))
    assert(byCell.nonEmpty && byCell.size <= 16, "at most k=16 cells")
    byCell.foreach { case (cell, rs) =>
      // every emitted row is in one of the two top-2 sets, and each cell
      // emits at most 4 rows (fewer when the sets overlap in a tiny cell)
      assert(rs.length <= 4, s"cell $cell emitted ${rs.length} rows")
      rs.foreach { r =>
        assert(r.getAs[Int]("rank_proto") <= 2 || r.getAs[Int]("rank_outlier") <= 2)
      }
      val protoTop = rs.find(_.getAs[Int]("rank_proto") == 1)
      val outlierTop = rs.find(_.getAs[Int]("rank_outlier") == 1)
      assert(protoTop.nonEmpty && outlierTop.nonEmpty,
        s"cell $cell is missing one of its rank-1 rows")
      assert(protoTop.get.getAs[Double]("cos_centroid") >=
        outlierTop.get.getAs[Double]("cos_centroid"),
        s"cell $cell: the top prototype scores below the top outlier")
    }
  }
}
