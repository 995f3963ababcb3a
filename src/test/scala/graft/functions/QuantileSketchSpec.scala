package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Referees for the two-regime `quantile_sketch` aggregate: exact-regime
  * bit-equality with the house integer-rank percentiles, the γ
  * relative-value bound in the dense regime against brute-force order
  * statistics, partitioning invariance in BOTH regimes, the regime
  * boundary, and the zero/negative domain edges. */
class QuantileSketchSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def sketch(xs: Seq[Long], cap: Int, parts: Int): (Long, Long, Long, Long, Long, Boolean) = {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val r = xs.toDF("x").repartition(parts)
      .selectExpr(s"quantile_sketch(x, $cap) AS q")
      .selectExpr("q.n", "q.p50", "q.p90", "q.p99", "q.max", "q.exact")
      .head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getBoolean(5))
  }

  /** The house integer-rank percentile: 1-indexed ceil(n·p/100). */
  private def exactQ(xs: Seq[Long], p: Int): Long = {
    val sorted = xs.sorted
    sorted(((xs.size.toLong * p + 99) / 100).toInt - 1)
  }

  test("exact regime: bit-equal to the integer-rank percentiles, any partitioning") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(1000)(rnd.nextInt(90).toLong + 10) // the token-length shape
    val want = (1000L, exactQ(xs, 50), exactQ(xs, 90), exactQ(xs, 99), xs.max, true)
    for (parts <- Seq(1, 7, 32))
      assert(sketch(xs, cap = 4096, parts) === want, s"parts=$parts")
  }

  test("regime boundary: capacity distinct values stay exact, capacity+1 tips dense") {
    val exact = (1L to 64L)
    assert(sketch(exact, cap = 64, parts = 4)._6, "at the bound: exact")
    val over = (1L to 65L)
    val r = sketch(over, cap = 64, parts = 4)
    assert(!r._6, "past the bound: dense")
    // dense values still within gamma of truth (γ = sqrt(1.02)-1 ~ 1%)
    assert(math.abs(r._2 - 33.0) / 33.0 < 0.02, s"p50 ${r._2}")
  }

  test("dense regime: every reported quantile within gamma of the true order statistic") {
    val rnd = new scala.util.Random(13)
    // wide dynamic range forces the dense regime at cap 256 and exercises
    // buckets across five orders of magnitude
    val xs = Seq.fill(20000)(math.abs(rnd.nextLong()) % 1000000L + 1L)
    val r = sketch(xs, cap = 256, parts = 16)
    assert(!r._6 && r._1 === 20000L)
    val gamma = math.sqrt(QSketch.Base) - 1 + 1e-3 // + integer-rounding slack
    for ((got, p) <- Seq((r._2, 50), (r._3, 90), (r._4, 99), (r._5, 100))) {
      val truth = if (p == 100) xs.max else exactQ(xs, p)
      assert(math.abs(got - truth.toDouble) / truth <= gamma,
        s"p$p: $got vs $truth (bound $gamma)")
    }
  }

  test("dense regime: bit-identical across partitionings and merge orders") {
    val rnd = new scala.util.Random(29)
    val xs = Seq.fill(5000)(math.abs(rnd.nextLong()) % 100000L)
    val rs = for (parts <- Seq(1, 5, 32)) yield sketch(xs, cap = 128, parts)
    assert(rs.distinct.size === 1, s"partitioning changed the sketch: $rs")
  }

  test("zeros ride the dedicated slot in both regimes") {
    val xs = Seq.fill(60)(0L) ++ Seq.fill(40)(1000L)
    val ex = sketch(xs, cap = 4096, parts = 3)
    assert(ex === ((100L, 0L, 1000L, 1000L, 1000L, true)))
    val dn = sketch(xs ++ (1L to 300L), cap = 64, parts = 3)
    assert(!dn._6 && dn._2 > 0L, s"dense with zeros: $dn") // p50 of the mix is nonzero
    val allZero = sketch(Seq.fill(10)(0L), cap = 4, parts = 2)
    assert(allZero === ((10L, 0L, 0L, 0L, 0L, true)))
  }

  test("negative input fails loudly; empty input is exact zero row") {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val e = intercept[Exception] {
      graft.SparkSuite.quietly(
        Seq(-1L).toDF("x").selectExpr("quantile_sketch(x, 16) AS q").collect())
    }
    assert(e.getMessage != null)
    val r = Seq.empty[Long].toDF("x")
      .selectExpr("quantile_sketch(x, 16) AS q")
      .selectExpr("q.n", "q.exact").head()
    assert((r.getLong(0), r.getBoolean(1)) === ((0L, true)))
  }

  test("driver-side QSketch merge equals the aggregate path (sketch-of-sketches)") {
    val rnd = new scala.util.Random(3)
    val (a, b) = (Seq.fill(500)(rnd.nextInt(5000).toLong),
      Seq.fill(700)(rnd.nextInt(5000).toLong))
    def bufOf(xs: Seq[Long], cap: Int): QBuffer = {
      val buf = new QBuffer(new java.util.HashMap[java.lang.Long, Array[Long]](), false)
      xs.foreach(x => QSketch.add(buf, x, 1L, cap))
      buf
    }
    val merged = QSketch.merge(bufOf(a, 128), bufOf(b, 128), 128)
    val (n, p50, p90, p99, mx) = QSketch.quantiles(merged)
    val agg = sketch(a ++ b, cap = 128, parts = 8)
    assert((n, p50, p90, p99, mx, !merged.dense) === agg)
  }
}
