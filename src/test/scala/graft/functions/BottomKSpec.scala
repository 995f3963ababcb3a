package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Referees for the bounded `bottomk` (KMV) aggregate: the kept set is
  * exactly the k smallest DISTINCT values, invariant across partitionings
  * and merge orders, and the KMV cardinality estimate derived from h_k is
  * referee-bounded against brute-force truth past the exact regime. */
class BottomKSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def bottomK(xs: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    xs.toDF("h").repartition(parts)
      .selectExpr(s"bottomk(h, $k) AS mins")
      .head().getSeq[Long](0)
  }

  test("kept set = the k smallest distinct values, ascending, dedup'd") {
    val xs = Seq[Long](9, 3, 7, 3, 1, 9, 5, 1, 11, 2)
    assert(bottomK(xs, 4, parts = 3) === Seq(1L, 2L, 3L, 5L))
  }

  test("below k distinct values the array IS the distinct set (exact regime)") {
    val xs = Seq[Long](42, 7, 42, 7, 42, 99)
    assert(bottomK(xs, 128, parts = 2) === Seq(7L, 42L, 99L))
  }

  test("partitioning-invariant: identical output for 1, 5, and 32 partitions") {
    val xs = (1 to 5000).map(i => ((i * 2654435761L) % 100000)) // dup-heavy
    val ref = bottomK(xs, 64, parts = 1)
    for (p <- Seq(5, 32)) assert(bottomK(xs, 64, p) === ref, s"parts=$p")
  }

  test("KMV estimate from h_k lands within 4 sigma of the true cardinality") {
    // hashes uniform on [0, 2^60): the house md5-60-bit domain
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val n = 20000
    val k = 256
    val mins = (1 to n).map(i => s"v$i").toDF("x")
      .selectExpr("CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT) AS h")
      .selectExpr(s"bottomk(h, $k) AS mins")
      .head().getSeq[Long](0)
    assert(mins.size === k)
    val hk = mins.last.toDouble
    val est = (k - 1).toDouble * 1152921504606846976.0 / hk
    val sigma = 1.0 / math.sqrt(k - 2.0) // KMV relative std error
    assert(math.abs(est - n) / n < 4 * sigma, s"est $est vs $n")
  }

  test("merge math: union-then-trim equals trim-of-union (mergeability)") {
    val a = Seq[Long](1, 4, 9, 16, 25, 36)
    val b = Seq[Long](2, 3, 4, 30, 100)
    val whole = bottomK(a ++ b, 5, parts = 1)
    // two groups aggregated separately then re-aggregated through bottomk
    import s.implicits._
    val twoPhase = (a.map(("g1", _)) ++ b.map(("g2", _)))
      .toDF("g", "h").repartition(4)
      .groupBy("g").agg(org.apache.spark.sql.functions.expr("bottomk(h, 5)").as("mins"))
      .selectExpr("explode(mins) AS h")
      .selectExpr("bottomk(h, 5) AS mins")
      .head().getSeq[Long](0)
    assert(twoPhase === whole)
  }

  test("null hashes are skipped, k = 1 keeps the single minimum") {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val out = Seq(Some(5L), None, Some(2L), None, Some(8L)).toDF("h")
      .selectExpr("bottomk(h, 1) AS mins").head().getSeq[Long](0)
    assert(out === Seq(2L))
  }
}
