package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The native freq_items mergeable heavy-hitters aggregate: exact-regime
  * parity with groupBy counts, partitioning independence in the exact
  * regime, and — the load-bearing part — a brute-force referee for the
  * lossy regime's bounds: for EVERY item (reported or not),
  * est <= true <= est + err, and every item with true count > the
  * summary's total dropped mass is guaranteed reported. Those invariants
  * are what make the q_heavy_terms `est >= threshold` filter a sound
  * "guaranteed heavy" report at any scale and partitioning. */
class FreqItemsSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  /** Run freq_items over `items` with `parts` partitions, returning
    * (item -> (est, err)) plus the exact truth map. */
  private def sketch(
      items: Seq[String], cap: Int, parts: Int): (Map[String, (Long, Long)], Map[String, Long]) = {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val out = items.toDF("item").repartition(parts)
      .selectExpr(s"freq_items(item, $cap) AS hh")
      .selectExpr("explode(hh) AS e")
      .selectExpr("e.item", "e.est", "e.err")
      .as[(String, Long, Long)].collect()
      .map { case (i, a, b) => i -> (a, b) }.toMap
    val truth = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    (out, truth)
  }

  test("exact regime: capacity >= cardinality reproduces groupBy counts, err 0") {
    val rnd = new scala.util.Random(7)
    val items = Seq.fill(5000)(s"t${rnd.nextInt(200)}")
    val (got, truth) = sketch(items, cap = 256, parts = 7)
    assert(got.size === truth.size)
    truth.foreach { case (k, n) =>
      assert(got(k) === ((n, 0L)), s"item $k")
    }
  }

  test("exact regime is partitioning-independent") {
    val rnd = new scala.util.Random(11)
    val items = Seq.fill(3000)(s"x${rnd.nextInt(97)}")
    val a = sketch(items, cap = 128, parts = 1)._1
    val b = sketch(items, cap = 128, parts = 6)._1
    assert(a === b)
  }

  test("lossy regime: est <= true <= est + err for every item, across partitionings") {
    // zipfish stream with cardinality far above capacity, several layouts
    val rnd = new scala.util.Random(3)
    val items = Seq.fill(20000) {
      val r = rnd.nextDouble()
      if (r < 0.5) s"hot${rnd.nextInt(10)}"       // ~1000 each
      else if (r < 0.8) s"warm${rnd.nextInt(100)}" // ~60 each
      else s"cold${rnd.nextInt(8000)}"             // ~1 each
    }
    for (parts <- Seq(1, 4, 9)) {
      val (got, truth) = sketch(items, cap = 64, parts = parts)
      assert(got.size <= 64)
      // err is the summary's total subtracted mass: identical on every row
      val errs = got.values.map(_._2).toSet
      assert(errs.size === 1, s"parts=$parts err not uniform: $errs")
      val dropped = errs.head
      got.foreach { case (k, (est, err)) =>
        val t = truth.getOrElse(k, 0L)
        assert(est <= t, s"parts=$parts item $k: est $est > true $t")
        assert(t <= est + err, s"parts=$parts item $k: true $t > est+err ${est + err}")
      }
      // detection guarantee: every item with true count > dropped is
      // tracked (the hot items sit far above the 2n/cap envelope)
      truth.foreach { case (k, t) =>
        if (t > dropped) assert(got.contains(k), s"parts=$parts lost $k (true $t > dropped $dropped)")
      }
    }
  }

  test("reported bounds are honest under adversarial order (sorted input)") {
    // sorted order maximises MG damage: all cold items first, then hot
    val items = (1 to 6000).map(i => s"c$i") ++ Seq.fill(500)("HOT")
    val (got, truth) = sketch(items, cap = 32, parts = 1)
    got.foreach { case (k, (est, err)) =>
      val t = truth.getOrElse(k, 0L)
      assert(est <= t && t <= est + err, s"item $k bounds")
    }
    assert(got.contains("HOT"))
    assert(got("HOT")._1 <= 500L)
  }

  test("nulls are skipped; null-only input yields an empty array") {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val out = Seq(Some("a"), None, Some("a"), None).toDF("item")
      .selectExpr("freq_items(item, 8) AS hh").selectExpr("size(hh) AS n")
      .as[Int].collect()
    assert(out === Array(1))
    val empty = Seq(Option.empty[String]).toDF("item")
      .selectExpr("freq_items(item, 8) AS hh").selectExpr("size(hh) AS n")
      .as[Int].collect()
    assert(empty === Array(0))
  }

  test("grouped: per-group buffers stay independent") {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val rows = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "a"))
    val got = rows.toDF("g", "item").repartition(3)
      .groupBy("g").agg(org.apache.spark.sql.functions.expr("freq_items(item, 16)").as("hh"))
      .selectExpr("g", "explode(hh) AS e").selectExpr("g", "e.item", "e.est")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("g1", "a", 2L), ("g1", "b", 1L), ("g2", "a", 1L)))
  }

  test("weighted form: exact regime equals groupBy sum(weight); zero skips; negative throws") {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val rows = Seq(("a", 5L), ("b", 2L), ("a", 1L), ("c", 0L))
    val got = rows.toDF("t", "w").repartition(3)
      .selectExpr("freq_items_w(t, w, 16) AS hh")
      .selectExpr("explode(hh) AS e").selectExpr("e.item", "e.est", "e.err")
      .as[(String, Long, Long)].collect().toSet
    // zero-weight c contributes nothing (and is not tracked)
    assert(got === Set(("a", 6L, 0L), ("b", 2L, 0L)))
    // the natural SQL spelling with an INT literal weight works (the
    // builder widens integral weights to BIGINT — r12 review)
    val lit2 = Seq("x", "x").toDF("t")
      .selectExpr("freq_items_w(t, 2, 8) AS hh")
      .selectExpr("explode(hh) AS e").selectExpr("e.est")
      .as[Long].collect()
    assert(lit2 === Array(4L))
    val e = intercept[Exception] {
      graft.SparkSuite.quietly(
        Seq(("a", -1L)).toDF("t", "w")
          .selectExpr("freq_items_w(t, w, 16)").collect())
    }
    assert(e.getMessage != null)
  }

  test("sketch-of-sketches: re-aggregating (item, est) rows with weight est matches the direct sketch (exact regime)") {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val rnd = new scala.util.Random(23)
    val items = Seq.fill(4000)(s"t${rnd.nextInt(150)}")
    val direct = items.toDF("t").repartition(5)
      .selectExpr("freq_items(t, 256) AS hh")
      .selectExpr("explode(hh) AS e").selectExpr("e.item", "e.est")
      .as[(String, Long)].collect().toMap
    // two half-sketches, re-aggregated weighted
    val (h1, h2) = items.splitAt(items.size / 2)
    def half(xs: Seq[String]) = xs.toDF("t").repartition(3)
      .selectExpr("freq_items(t, 256) AS hh")
      .selectExpr("explode(hh) AS e").selectExpr("e.item", "e.est")
      .as[(String, Long)].collect().toSeq
    val merged = (half(h1) ++ half(h2)).toDF("t", "w")
      .selectExpr("freq_items_w(t, w, 256) AS hh")
      .selectExpr("explode(hh) AS e").selectExpr("e.item", "e.est")
      .as[(String, Long)].collect().toMap
    assert(merged === direct)
  }

  test("analysis-time rejection: bad item type, bad capacity") {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val df = Seq(1L).toDF("x")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.selectExpr("freq_items(x, 8)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq("a").toDF("x").selectExpr("freq_items(x, 0)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq("a").toDF("x").selectExpr("freq_items(x, x)").collect()
    }
  }

  test("output order is (est DESC, item ASC)") {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val items = Seq("b", "b", "a", "a", "c")
    val got = items.toDF("item")
      .selectExpr("freq_items(item, 8) AS hh")
      .selectExpr("explode(hh) AS e").selectExpr("e.item")
      .as[String].collect()
    assert(got === Array("a", "b", "c"))
  }
}
