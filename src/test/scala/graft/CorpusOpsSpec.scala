package graft

import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

/** Property/edge referees for the r12 corpus-analysis additions, beyond
  * their single-SF DuckDB oracles: rank-quantiles vs a brute-force
  * percentile, LM-score structural invariants, separable-corpus
  * classification, and heavy-terms vs the exact groupBy at random
  * widths. These run on small random frames so they cover shapes the
  * fixed testdata never produces (ties, single-token docs, disjoint
  * vocabularies). */
class CorpusOpsSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def docsDF(rows: Seq[(Long, String, String)]): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("length quantiles match a brute-force rank percentile, ties and tiny groups included") {
    val rnd = new scala.util.Random(31)
    // sources with 1, 2, and ~40 docs; many tied lengths
    val rows = (1L to 43L).map { i =>
      val src = if (i == 1) "one" else if (i <= 3) "two" else "many"
      val len = 1 + rnd.nextInt(6)
      (i, src, Seq.fill(len)("w").mkString(" "))
    }
    val got = TextQueries.lengthQuantilesOf(docsDF(rows)).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("p50_tokens"),
          r.getAs[Long]("p90_tokens"), r.getAs[Long]("p99_tokens"),
          r.getAs[Long]("max_tokens"))).toMap
    def brute(src: String): (Long, Long, Long, Long, Long) = {
      // sort by (len, doc_id) — the engine's tie order; the value at rank
      // ceil(p*n/100) is the rank percentile
      val lens = rows.filter(_._2 == src).sortBy(r => (r._3.split(" ").length, r._1))
        .map(_._3.split(" ").length.toLong)
      val n = lens.size
      def at(p: Int) = lens(((n * p + 99) / 100 - 1).toInt)
      (n.toLong, at(50), at(90), at(99), lens.max)
    }
    Seq("one", "two", "many").foreach { src =>
      assert(got(src) === brute(src), s"source $src")
    }
  }

  test("lm score invariants: surprisal >= 1, all-novel doc, n_bigrams = len - 1") {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val rows = Seq(
      (1L, "s", "a b a b a"),   // repeated bigrams
      (2L, "s", "x y z"),       // bigrams unique corpus-wide
      (3L, "s", "a b c"),       // shares "a b" with doc 1
      (4L, "s", "solo"))        // single token: filtered out entirely
    val got = TextQueries.lmScoreOf(docsDF(rows)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("surprisal"))).toMap
    assert(!got.contains(4L)) // < 2 tokens: no bigram positions
    assert(got(1L)._1 === 4L && got(2L)._1 === 2L && got(3L)._1 === 2L)
    // context count >= bigram count, so every ratio and mean is >= 1
    got.values.foreach { case (_, _, sc) => assert(sc >= 1.0) }
    // doc 2's bigrams occur once each corpus-wide
    assert(got(2L)._2 === 2L)
    // doc 1: "a b" x2 (+1 in doc 3) and "b a" x2 — nothing novel
    assert(got(1L)._2 === 0L)
  }

  test("trained langid is diagonal on a separable corpus and ties break lexicographically") {
    import s.implicits._
    val rows = Seq(
      (1L, "aa", "foo bar foo"), (2L, "aa", "bar foo bar"),
      (3L, "bb", "qux quux qux"), (4L, "bb", "quux qux quux"))
    val got = rows.map { case (id, lang, text) => (id, lang, "src", text) }
      .toDF("doc_id", "lang", "source", "text")
    val confusion = TextQueries.langidNbOf(got.select("doc_id", "lang", "text"))
      .as[(String, String, Long)].collect().toSet
    // disjoint vocabularies: perfectly diagonal
    assert(confusion === Set(("aa", "aa", 2L), ("bb", "bb", 2L)))
  }

  test("heavy terms equal the exact groupBy at random widths (exact regime)") {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val rnd = new scala.util.Random(41)
    val rows = (1L to 50L).map { i =>
      (i, "s", Seq.fill(3 + rnd.nextInt(10))(s"t${rnd.nextInt(7)}").mkString(" "))
    }
    for (w <- Seq(1, 2, 4)) {
      val got = TextQueries.heavyTermsOf(docsDF(rows), width = w, minCount = 2L)
        .collect().map(r => r.getAs[String]("gram") -> r.getAs[Long]("n")).toMap
      val truth = rows.flatMap { case (_, _, text) =>
        val t = text.split(" ")
        if (t.length < w) Nil else t.sliding(w).map(_.mkString(" ")).toSeq
      }.groupBy(identity).collect { case (g, occ) if occ.size >= 2 => g -> occ.size.toLong }
      assert(got === truth.toMap, s"width $w")
    }
  }

  test("shuffle export is a permutation: every doc once, shard seqs contiguous") {
    val d = "/root/testdata/sf0.001"
    val out = Queries.byName("q_shuffle_export").run(s, d).collect()
    val docs = Tables.documents(s, d).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    // a shuffle must neither drop nor duplicate examples
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq === docs.toSeq)
    // within each shard the sequence is 1..n with no gaps (a reader can
    // range-scan a shard and trust the positions)
    out.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rows) =>
      val seqs = rows.map(_.getAs[Long]("seq")).sorted.toSeq
      assert(seqs === (1L to rows.length.toLong), s"shard $shard")
    }
  }

  test("mixScheduleOf holds its prefix contract on a skewed corpus with a weight table") {
    import org.apache.spark.sql.functions._
    // populations 200/30/5 with weights 5/2/1 (LCM 10) — shapes the fixed
    // testdata never produces: a dominant source, a near-empty one, and
    // weights that are NOT a permutation of the populations' order
    val rows = (1L to 200L).map(i => (i, "a", "w")) ++
      (201L to 230L).map(i => (i, "b", "w")) ++
      (231L to 235L).map(i => (i, "c", "w"))
    val weights = Map("a" -> 5L, "b" -> 2L, "c" -> 1L)
    val wExpr = when(col("source") === "a", 5L)
      .when(col("source") === "b", 2L).otherwise(1L)
    val out = TextQueries.mixScheduleOf(docsDF(rows), wExpr, 10L, nShards = 2)
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("vpos"),
        r.getAs[String]("source")))
    assert(out.length === rows.length)
    out.groupBy(_._1).foreach { case (shard, sh) =>
      val bySrc = sh.groupBy(_._3)
      val vs = sh.map(_._2).distinct.sorted.take(25) :+ (sh.map(_._2).max + 1L)
      for (v <- vs; (src, srcRows) <- bySrc) {
        val stride = 10L / weights(src)
        val want = math.min(srcRows.length.toLong, (v + stride - 1L) / stride)
        assert(srcRows.count(_._2 < v).toLong === want,
          s"shard $shard source $src prefix vpos<$v")
      }
    }
  }

  test("shuffleExportOf is partitioning-invariant: same layout from a repartitioned input") {
    val rows = (1L to 97L).map(i => (i, s"s${i % 3}", "w"))
    def layout(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      TextQueries.shuffleExportOf(df, nShards = 4).collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq"),
          r.getAs[Long]("doc_id"))).sortBy(t => (t._1, t._2)).toSeq
    val base = layout(docsDF(rows))
    val shuffled = layout(docsDF(scala.util.Random.shuffle(rows)).repartition(7))
    assert(base === shuffled, "export layout depends on input partitioning/order")
  }

  test("diffSnapshotsOf null contract: null text == empty text, never a status leak") {
    import s.implicits._
    def snap(rows: (Long, String, Option[String])*): org.apache.spark.sql.DataFrame =
      rows.toSeq.toDF("doc_id", "source", "text")
    // doc 1: null on both sides -> unchanged (a null digest on a present
    // row would have misread as added+removed); doc 2: null vs "" ->
    // unchanged (the null-total contract); doc 3: null vs text ->
    // changed; doc 4: only in prev -> removed; doc 5: only in cur, null
    // text -> added
    val prev = snap((1L, "s", None), (2L, "s", None), (3L, "s", None), (4L, "s", Some("x")))
    val cur = snap((1L, "s", None), (2L, "s", Some("")), (3L, "s", Some("x")), (5L, "s", None))
    val got = TextQueries.diffSnapshotsOf(prev, cur).collect()
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n")).toMap
    assert(got === Map("unchanged" -> 2L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
  }

  test("snapshot diff reconciles: statuses partition both snapshots exactly") {
    val d = "/root/testdata/sf0.001"
    val out = Queries.byName("q_snapshot_diff").run(s, d).collect()
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n"))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val ids = Tables.documents(s, d).select("doc_id")
      .collect().map(_.getLong(0))
    val aN = ids.count(_ % 10 != 7).toLong
    val bN = ids.count(_ % 10 != 3).toLong
    def n(st: String): Long = out.getOrElse(st, 0L)
    // every A-doc is removed/changed/unchanged; every B-doc is
    // added/changed/unchanged — the diff must account for both exactly
    assert(n("removed") + n("changed") + n("unchanged") === aN)
    assert(n("added") + n("changed") + n("unchanged") === bN)
    assert(n("added") === ids.count(_ % 10 == 7).toLong)
    assert(n("removed") === ids.count(_ % 10 == 3).toLong)
  }

  test("mixScheduleOf fails loudly on a weight that does not divide the lcm") {
    import s.implicits._
    val docs = Seq((1L, "src1", "a"), (2L, "src2", "b"))
      .toDF("doc_id", "source", "text")
    // weight 4 does not divide lcm 6: must raise, not truncate 6/4 -> 1
    val bad = TextQueries.mixScheduleOf(
      docs, weightExpr = lit(4L), weightLcm = 6L, nShards = 2)
    val e = intercept[Exception](SparkSuite.quietly(bad.collect()))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("not divisible by weight")), e.toString)
    // and the weightLcm domain is enforced eagerly
    intercept[IllegalArgumentException](TextQueries.mixScheduleOf(
      docs, weightExpr = lit(1L), weightLcm = 0L, nShards = 2))
  }

  test("mix schedule: every prefix realizes the stride-exact mixture") {
    val d = "/root/testdata/sf0.001"
    val out = Queries.byName("q_mix_schedule").run(s, d).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("vpos"),
        r.getAs[String]("source")))
    def stride(src: String): Long = 6L / ((src.drop(3).toLong % 3L) + 1L)
    // permutation claim first
    assert(out.length === Tables.documents(s, d).count())
    // stride scheduling is EXACT, not statistical: within a shard, the
    // number of weight-w source rows at vpos < V is ceil(V / stride)
    // capped by the source's population — for every prefix V
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val bySrc = rows.groupBy(_._3)
      val vs = rows.map(_._2).distinct.sorted.take(20) :+ (rows.map(_._2).max + 1L)
      for (v <- vs; (src, srcRows) <- bySrc) {
        val got = srcRows.count(_._2 < v).toLong
        val want = math.min(srcRows.length.toLong,
          (v + stride(src) - 1L) / stride(src))
        assert(got === want, s"shard $shard source $src prefix vpos<$v")
      }
    }
  }
}
