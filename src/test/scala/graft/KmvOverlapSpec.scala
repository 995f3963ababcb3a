package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** q_kmv_overlap — the sketch-only pair-overlap estimators, refereed
  * against the TRUE pairwise distinct-shingle overlap (exact sets,
  * computed brute-force at sf0.01). The declared query's DuckDB oracle
  * pins that both engines compute the same integers from the same
  * sketches; this spec pins that those integers mean what they claim. */
class KmvOverlapSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark
  private val dir = "/root/testdata/sf0.01"
  private val K = 128

  /** (pair -> (true distinct union, true distinct intersection)). */
  private lazy val truth: Map[(String, String), (Long, Long)] = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val toks = split(col("text"), " ")
    val grams = call_function("token_grams", toks, lit(3))
    val h = conv(substring(md5(col("gram")), 1, 15), 16, 10).cast(LongType)
    val perSource = Tables.documents(s, dir)
      .filter(size(toks) >= 3)
      .select(col("source"), explode_outer(grams).as("gram"))
      .select(col("source"), h.as("h")).distinct()
      .collect().groupBy(_.getString(0)).map { case (src, rows) =>
        src -> rows.map(_.getLong(1)).toSet
      }
    val srcs = perSource.keys.toSeq.sorted
    (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      (a, b) = (srcs(i), srcs(j))
    } yield (a, b) -> (
      (perSource(a) | perSource(b)).size.toLong,
      (perSource(a) & perSource(b)).size.toLong)).toMap
  }

  private lazy val est = Queries.byName("q_kmv_overlap").run(s, dir).collect()

  test("every source pair appears exactly once, ordered, in estimate regime") {
    assert(est.map(r => (r.getString(0), r.getString(1))).toSet === truth.keySet)
    assert(est.length === truth.size)
    // verify scale: sources carry >> k distinct shingles, so the gate
    // exercises the ESTIMATE path, not the degenerate exact one
    assert(est.forall(!_.getBoolean(5)), "expected estimate regime at sf0.01")
    assert(est.forall(_.getLong(2) === K.toLong), "union sketch must hold k minima")
  }

  test("union estimate lands within 4 sigma of the true union cardinality") {
    val sigma = 4.0 / math.sqrt(K - 2.0) // KMV relative-error contract
    for (r <- est) {
      val (tUnion, _) = truth((r.getString(0), r.getString(1)))
      val rel = math.abs(r.getLong(6).toDouble - tUnion) / tUnion
      assert(rel <= sigma,
        s"${r.getString(0)}x${r.getString(1)}: est_union=${r.getLong(6)} " +
          s"true=$tUnion rel=$rel > $sigma")
    }
  }

  test("jaccard and intersection estimates track the true overlap") {
    for (r <- est) {
      val (tUnion, tInter) = truth((r.getString(0), r.getString(1)))
      val tJ = tInter.toDouble / tUnion
      val eJ = r.getLong(8).toDouble / 1e6
      // k_both/k is a proportion over k draws: sigma = sqrt(J(1-J)/k),
      // plus the union-estimate jitter — 5 sigma with the binomial term
      val bound = 5.0 * math.sqrt(math.max(tJ * (1 - tJ), 0.01) / K)
      assert(math.abs(eJ - tJ) <= bound,
        s"${r.getString(0)}x${r.getString(1)}: jaccard est=$eJ true=$tJ bound=$bound")
      // intersection = jaccard * union composes both errors; check sign
      // and magnitude only (relative where the truth is non-trivial)
      val eI = r.getLong(7)
      if (tInter > 200)
        assert(math.abs(eI.toDouble - tInter) / tInter <= 0.5,
          s"est_inter=$eI true=$tInter")
      if (tInter == 0)
        assert(eI <= (0.05 * tUnion).toLong, s"est_inter=$eI for disjoint pair")
    }
  }

  test("exact regime covers the middle zone: both sketches unsaturated, union >= k") {
    import s.implicits._
    graft.functions.GraftExtensions.ensureRegistered(s)
    // 100 + 100 distinct hashes, 20 shared: both sketches are complete
    // sets (< k = 128) while their union (180) exceeds k — review r13:
    // the old |ku| < k gate degraded this exactly-computable zone to the
    // ~1/sqrt(k) h_k estimator
    val rows = (1L to 100L).map(h => ("a", h)) ++ (81L to 180L).map(h => ("b", h))
    val sk = rows.toDF("source", "h").groupBy("source")
      .agg(call_function("bottomk", col("h"), lit(K)).as("mins"))
    val r = TextQueries.kmvOverlapOf(sk, k = K).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Boolean]("exact"))
    assert(row.getAs[Long]("est_union") === 180L)
    assert(row.getAs[Long]("est_inter") === 20L)
    assert(row.getAs[Long]("jaccard_ppm") ===
      math.floor(20.0 * 1000000.0 / 180).toLong)
    // n_union_minima still describes the union SKETCH (sliced at k)
    assert(row.getAs[Long]("n_union_minima") === K.toLong)
  }

  test("exact regime: sketches below the bound reproduce set algebra exactly") {
    import s.implicits._
    graft.functions.GraftExtensions.ensureRegistered(s)
    // two tiny hand sets with known overlap, distinct counts << k
    val rows = (1L to 40L).map(h => ("a", h)) ++ (21L to 60L).map(h => ("b", h))
    val sk = rows.toDF("source", "h")
      .groupBy("source")
      .agg(call_function("bottomk", col("h"), lit(K)).as("mins"))
    val a = sk.select(col("source").as("source_a"), col("mins").as("ma"))
    val b = sk.select(col("source").as("source_b"), col("mins").as("mb"))
    val r = a.join(b, col("source_a") < col("source_b"))
      .withColumn("ku", slice(array_sort(array_union(col("ma"), col("mb"))), 1, K))
      .withColumn("nu", size(col("ku")).cast(LongType))
      .withColumn("k_both", size(filter(col("ku"),
        x => array_contains(col("ma"), x) && array_contains(col("mb"), x)))
        .cast(LongType))
      .select("nu", "k_both").head()
    assert(r.getLong(0) === 60L) // |A u B|
    assert(r.getLong(1) === 20L) // |A n B|
  }
}
