package graft

import java.math.{BigDecimal => JBig, MathContext, RoundingMode}

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The batched k-NN join family (q_knn_join, q_knn_join_ivf) and the
  * native bounded top-k aggregate they ride on.
  *
  * Three layers:
  *  1. topk_pairs semantics — total order, ties, null handling, payload
  *     transport, and PARTITION-INSENSITIVITY (the property that makes
  *     the bounded map-side partials correct, not just fast);
  *  2. q_knn_join against an in-driver brute-force referee that replays
  *     the decimal-cosine contract over every (query, corpus) pair —
  *     proving the KnnR nomination width loses nothing at this SF;
  *  3. q_knn_join_ivf structure — every neighbor's cell is probed by its
  *     query, and recall vs the exact join stays above a pinned floor. */
class KnnJoinSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark
  private val dir = "/root/testdata/sf0.01"

  // ---- topk_pairs -----------------------------------------------------------

  test("topk_pairs keeps the k best by (score desc, id asc) with payloads") {
    val rows = s.sql(
      """SELECT topk_pairs(s, i, p, 3) AS t FROM VALUES
         (0.5D, 1L, 'a'), (0.9D, 2L, 'b'), (0.5D, 0L, 'c'),
         (0.1D, 3L, 'd'), (0.9D, 9L, 'e')
         AS v(s, i, p)""").collect()
    val t = rows.head.getSeq[org.apache.spark.sql.Row](0)
    assert(t.map(r => (r.getDouble(0), r.getLong(1), r.getString(2))) ===
      Seq((0.9, 2L, "b"), (0.9, 9L, "e"), (0.5, 0L, "c")))
  }

  test("topk_pairs skips null score/id, carries null payload, handles k > n") {
    val t = s.sql(
      """SELECT topk_pairs(s, i, p, 10) AS t FROM VALUES
         (CAST(NULL AS DOUBLE), 1L, 'x'), (0.3D, CAST(NULL AS BIGINT), 'y'),
         (0.7D, 5L, CAST(NULL AS STRING))
         AS v(s, i, p)""").collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(t.size === 1)
    assert(t.head.getDouble(0) === 0.7 && t.head.getLong(1) === 5L && t.head.isNullAt(2))
  }

  test("topk_pairs is partition-insensitive (bounded partials merge exactly)") {
    import s.implicits._
    // adversarial scores: heavy exact-tie load so the (score, id) tie-break
    // actually decides membership at the k boundary
    val df = (0L until 997L).map(i => (i % 7, (i % 13).toDouble, i)).toDF("g", "sc", "id")
    def run(parts: Int) =
      df.repartition(parts)
        .groupBy("g")
        .agg(call_function("topk_pairs", col("sc"), col("id"), col("id"), lit(5)).as("t"))
        .orderBy("g")
        .collect()
        .map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getDouble(0), e.getLong(1), e.getLong(2)))))
        .toSeq
    assert(run(1) === run(13))
  }

  test("topk_pairs rejects bad k and bad input types at analysis time") {
    intercept[AnalysisException] {
      s.sql("SELECT topk_pairs(1.0D, 1L, 1, 0) ").collect()
    }
    intercept[AnalysisException] {
      s.sql("SELECT topk_pairs(1.0D, 1L, 1, i) FROM VALUES (2) v(i)").collect()
    }
    intercept[AnalysisException] {
      s.sql("SELECT topk_pairs(CAST(1 AS INT), 1L, 1, 2)").collect()
    }
    intercept[AnalysisException] {
      s.sql("SELECT topk_pairs(1.0D, CAST(1 AS INT), 1, 2)").collect()
    }
  }

  // ---- the decimal-cosine referee ------------------------------------------

  /** Replays the query family's exact-cosine contract in plain Scala:
    * per-element double product → DECIMAL(38,18) HALF_UP → exact sum →
    * double → cosine → round 9 HALF_UP. */
  private def cosine9(a: Array[Float], b: Array[Float]): Double = {
    def dotDec(x: Array[Float], y: Array[Float]): JBig = {
      var acc = JBig.ZERO
      var i = 0
      while (i < x.length) {
        acc = acc.add(new JBig(x(i).toDouble * y(i).toDouble)
          .setScale(18, RoundingMode.HALF_UP))
        i += 1
      }
      acc
    }
    val c = dotDec(a, b).doubleValue() /
      (math.sqrt(dotDec(a, a).doubleValue()) * math.sqrt(dotDec(b, b).doubleValue()))
    new JBig(c, MathContext.UNLIMITED).setScale(9, RoundingMode.HALF_UP).doubleValue()
  }

  private lazy val all: Array[(Long, Array[Float])] =
    Tables.embeddings(s, dir).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** Exact per-query top-5 by (cosine9 desc, vec_id) over ALL pairs. */
  private lazy val exactTop5: Map[Long, Seq[(Long, Double)]] = {
    val qs = all.filter { case (id, v) => id % 25 == 0 && v.exists(_ != 0f) }
    val cs = all.filter { case (id, v) => id % 25 != 0 && v.exists(_ != 0f) }
    qs.map { case (qid, qv) =>
      qid -> cs.map { case (cid, cv) => (cid, cosine9(cv, qv)) }
        .sortBy { case (cid, cos) => (-cos, cid) }.take(5).toSeq
    }.toMap
  }

  test("q_knn_join equals the all-pairs decimal referee (nomination loses nothing)") {
    val got = Queries.byName("q_knn_join").run(s, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val want = exactTop5.toSeq.sortBy(_._1).flatMap { case (qid, top) =>
      top.zipWithIndex.map { case ((cid, cos), i) => (qid, i + 1, cid, cos) }
    }
    assert(got.toSeq === want)
  }

  test("q_hard_negatives equals the label-filtered all-pairs referee; never a positive") {
    val labels: Map[Long, Int] =
      Tables.embeddings(s, dir).select("vec_id", "label").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Queries.byName("q_hard_negatives").run(s, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // no mined negative may share its query's label (a positive leaking
    // into the negatives is the failure mode that poisons a contrastive
    // run)
    got.foreach { case (qid, _, cid, _) =>
      assert(labels(cid) !== labels(qid), s"positive $cid mined for query $qid")
    }
    // exact contract: the label-filtered all-pairs top-5 under the same
    // decimal-cosine referee
    val qs = all.filter { case (id, v) => id % 25 == 0 && v.exists(_ != 0f) }
    val cs = all.filter { case (id, v) => id % 25 != 0 && v.exists(_ != 0f) }
    val want = qs.sortBy(_._1).flatMap { case (qid, qv) =>
      cs.filter { case (cid, _) => labels(cid) != labels(qid) }
        .map { case (cid, cv) => (cid, cosine9(cv, qv)) }
        .sortBy { case (cid, cos) => (-cos, cid) }.take(5)
        .zipWithIndex.map { case ((cid, cos), i) => (qid, i + 1, cid, cos) }
    }
    assert(got.toSeq === want.toSeq)
    // the filter visibly bit: some query's plain top-5 contained a
    // same-label vector (else this query tests nothing)
    val differs = qs.exists { case (qid, _) =>
      exactTop5(qid).exists { case (cid, _) => labels(cid) == labels(qid) }
    }
    assert(differs, "fixture degenerate: no positives in any plain top-5")
  }

  test("q_knn_join_ivf probes are honest and recall clears the floor") {
    val emb = Tables.embeddings(s, dir)
    val centroids = VectorQueries.trainCentroids(emb, s)
    val got = Queries.byName("q_knn_join_ivf").run(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.nonEmpty)
    val byId = all.toMap
    // structural honesty: a neighbor only appears when its assigned cell
    // is one of its query's 4 probe cells (replayed via the same helpers)
    got.foreach { case (qid, cid) =>
      val probes = VectorQueries.probeCellsOf(centroids, byId(qid), 4)
      val cell = VectorQueries.probeCellsOf(centroids, byId(cid), 1).head
      assert(probes.contains(cell), s"neighbor $cid of $qid sits in unprobed cell $cell")
    }
    // recall vs the exact join — near-uniform embeddings are the hard case
    // (see AnnRecallSpec); the floor gates probe-set regressions
    val hits = got.count { case (qid, cid) => exactTop5(qid).exists(_._1 == cid) }
    val recall = hits.toDouble / exactTop5.iterator.map(_._2.size).sum
    info(f"knn-join IVF recall@5 = $recall%.2f")
    assert(recall >= 0.3)
  }

  test("q_knn_join plan: bounded object-hash aggregate, no sort-merge join") {
    val plan = Queries.byName("q_knn_join").run(s, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), "nominate must partial-aggregate")
    assert(!plan.contains("SortMergeJoin"), "no unbounded shuffle joins in this family")
  }
}
