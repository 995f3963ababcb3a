package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Independent referees for the r13 analytics operators, beyond their
  * fixed-SF DuckDB oracles: each query is replayed by a SECOND
  * implementation (plain-Scala brute force over collected rows, or exact
  * BigInt arithmetic) on sf0.001 — a different SF than the driver's gate —
  * plus targeted threshold/degenerate fixtures the synthetic corpus never
  * exercises. The DuckDB oracle proves cross-engine hash equality; these
  * prove the SEMANTICS against an implementation that shares no code with
  * the queries. */
class CorpusAnalyticsSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark
  private val dir = "/root/testdata/sf0.001"

  private val stop = Set("the", "a", "of", "and", "to", "in", "is")

  test("c4LinesOf: every line rule, the lorem page rule, and clean_text order") {
    import s.implicits._
    // one doc exercising every rule plus order preservation; one lorem
    // page (all lines dropped, but line-rule counters still tally); one
    // null text (the null-total contract: one empty line, fails words)
    val doc1 = Seq(
      "keep me please.",          // kept
      "good line too!",           // kept
      "no punctuation here",      // fails punct
      "short.",                   // fails words (1 word)
      "bad brace { line.",        // fails brace
      "Enable JavaScript now.",   // fails js (case-insensitive)
      "accept our Cookie terms.", // fails cookie
      "also keep this one?"       // kept — order check vs doc start
    ).mkString("\n")
    val doc2 = "fine line here.\nLorem Ipsum dolor sit amet."
    val docs = Seq(
      ("a", 1L, doc1), ("a", 2L, doc2), ("b", 3L, null: String))
      .toDF("source", "doc_id", "text")
    val got = TextQueries.c4LinesOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[String]("clean_text") ===
      "keep me please.\ngood line too!\nalso keep this one?")
    assert(r1.getAs[Long]("n_lines") === 8L)
    assert(r1.getAs[Long]("n_kept") === 3L)
    assert(r1.getAs[Long]("fail_punct") === 1L)
    assert(r1.getAs[Long]("fail_words") === 1L)
    assert(r1.getAs[Long]("fail_brace") === 1L)
    assert(r1.getAs[Long]("fail_js") === 1L)
    assert(r1.getAs[Long]("fail_cookie") === 1L)
    assert(!r1.getAs[Boolean]("doc_lorem"))
    val r2 = got(2L) // page rule: both lines pass the line rules, page drops
    assert(r2.getAs[Boolean]("doc_lorem"))
    assert(r2.getAs[String]("clean_text") === "")
    assert(r2.getAs[Long]("n_kept") === 0L)
    assert(r2.getAs[Long]("n_lines") === 2L)
    assert(r2.getAs[Long]("fail_punct") === 0L)
    val r3 = got(3L) // null text == empty: one line, fails punct + words
    assert(r3.getAs[Long]("n_lines") === 1L)
    assert(r3.getAs[Long]("n_kept") === 0L)
    assert(r3.getAs[String]("clean_text") === "")
    assert(r3.getAs[Long]("fail_words") === 1L)
  }

  test("property: c4LinesOf matches a plain-Scala reference on random multi-line text") {
    import s.implicits._
    val rnd = new scala.util.Random(59)
    val words = Seq("alpha", "beta", "gamma", "delta", "word", "Cookie",
      "JavaScript", "x{y", "plain")
    val enders = Seq("", ".", "!", "?", "\"", " ")
    def randLine(): String = {
      val n = rnd.nextInt(6) // 0..5 words (0 = empty line)
      Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ") +
        enders(rnd.nextInt(enders.length))
    }
    def randText(): String = {
      val lines = Seq.fill(1 + rnd.nextInt(6))(randLine())
      val sep = if (rnd.nextBoolean()) "\n" else "\r\n"
      val base = lines.mkString(sep)
      if (rnd.nextInt(10) == 0) base + "\nsome Lorem Ipsum filler" else base
    }
    val rows: Seq[(String, Long, String)] = (1L to 60L).map(i =>
      ("s" + (i % 3), i, if (rnd.nextInt(20) == 0) null else randText()))
    // the independent reference: plain Scala over the same rules
    def ref(text0: String): (String, Long, Long, Long, Long, Long, Long, Long, Boolean) = {
      val text = Option(text0).getOrElse("")
      val lines = text.split("\n", -1).map(_.replaceAll("\r$", ""))
      def punct(l: String) = l.matches("(?s).*[.!?\"]$")
      def wordsOk(l: String) = l.split(" ", -1).length >= 3
      def braceOk(l: String) = !l.contains("{") && !l.contains("}")
      def jsOk(l: String) = !l.toLowerCase.contains("javascript")
      def ckOk(l: String) = !l.toLowerCase.contains("cookie")
      def keep(l: String) = punct(l) && wordsOk(l) && braceOk(l) && jsOk(l) && ckOk(l)
      val lorem = text.toLowerCase.contains("lorem ipsum")
      (if (lorem) "" else lines.filter(keep).mkString("\n"),
        lines.length.toLong,
        if (lorem) 0L else lines.count(keep).toLong,
        lines.count(!punct(_)).toLong, lines.count(!wordsOk(_)).toLong,
        lines.count(!braceOk(_)).toLong, lines.count(!jsOk(_)).toLong,
        lines.count(!ckOk(_)).toLong, lorem)
    }
    val got = TextQueries.c4LinesOf(
        rows.toDF("source", "doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    rows.foreach { case (_, id, text) =>
      val (ct, nl, nk, fp, fw, fb, fj, fc, lorem) = ref(text)
      val r = got(id)
      assert(r.getAs[String]("clean_text") === ct, s"doc $id clean_text")
      assert(r.getAs[Long]("n_lines") === nl, s"doc $id n_lines")
      assert(r.getAs[Long]("n_kept") === nk, s"doc $id n_kept")
      assert(r.getAs[Long]("fail_punct") === fp, s"doc $id fail_punct")
      assert(r.getAs[Long]("fail_words") === fw, s"doc $id fail_words")
      assert(r.getAs[Long]("fail_brace") === fb, s"doc $id fail_brace")
      assert(r.getAs[Long]("fail_js") === fj, s"doc $id fail_js")
      assert(r.getAs[Long]("fail_cookie") === fc, s"doc $id fail_cookie")
      assert(r.getAs[Boolean]("doc_lorem") === lorem, s"doc $id lorem")
    }
  }

  test("c4LinesOf normalizes CRLF: \\r never decides a rule or leaks into clean_text") {
    import s.implicits._
    // Windows-crawled page: CRLF separators and a final bare \r. Java
    // regex $ matches before a trailing \r (RE2 engines don't) — without
    // the strip, "keep me please.\r" would pass the punctuation rule in
    // Spark only, and clean_text would carry the \r
    val crlf = "keep me please.\r\nno punct here\r\nshort.\r"
    val docs = Seq(("a", 1L, crlf)).toDF("source", "doc_id", "text")
    val r = TextQueries.c4LinesOf(docs).collect().head
    assert(r.getAs[Long]("n_lines") === 3L)
    assert(r.getAs[String]("clean_text") === "keep me please.")
    assert(!r.getAs[String]("clean_text").contains("\r"))
    assert(r.getAs[Long]("n_kept") === 1L)
    assert(r.getAs[Long]("fail_punct") === 1L) // only the unpunctuated line
    assert(r.getAs[Long]("fail_words") === 1L) // only "short."
  }

  test("q_c4_lines demo matches a brute-force line replay on sf0.001") {
    val docs = Tables.documents(s, dir).select("source", "text").collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("")))
    def linesOf(text: String): Seq[String] =
      text.split(" ", -1).grouped(6).map { chunk =>
        val l = chunk.mkString(" ")
        if (l.length % 2 == 0) l + "." else l
      }.toSeq
    def keep(l: String): Boolean =
      l.matches(".*[.!?\"]$") && l.split(" ", -1).length >= 3 &&
        !l.contains("{") && !l.contains("}") &&
        !l.toLowerCase.contains("javascript") &&
        !l.toLowerCase.contains("cookie")
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val ls = ds.map(d => linesOf(d._2))
      src -> (ds.length.toLong, ls.map(_.length.toLong).sum,
        ls.map(_.count(keep).toLong).sum,
        ls.map(_.count(l => !l.matches(".*[.!?\"]$")).toLong).sum,
        ls.map(_.count(_.split(" ", -1).length < 3).toLong).sum)
    }
    val got = Queries.byName("q_c4_lines").run(s, dir).collect()
    assert(got.map(_.getAs[String]("source")).toSet === want.keySet)
    got.foreach { r =>
      val (nDocs, nLines, nKept, fPunct, fWords) = want(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === nDocs)
      assert(r.getAs[Long]("n_lines") === nLines)
      assert(r.getAs[Long]("n_kept") === nKept)
      assert(r.getAs[Long]("fail_punct") === fPunct)
      assert(r.getAs[Long]("fail_words") === fWords)
      assert(r.getAs[Long]("fail_brace") === 0L)
      assert(r.getAs[Long]("fail_js") === 0L)
      assert(r.getAs[Long]("n_docs_lorem") === 0L)
    }
  }

  test("lineDedupOf: keep-first election across docs, normalization, empty lines") {
    import s.implicits._
    // doc 2's first line normalizes to doc 1's ("click here") and its
    // "shared line" repeats doc 1's — both drop, keep-first electing the
    // (doc_id, line_idx)-min occurrence. The blank line normalizes to
    // empty: outside the dedup domain, kept verbatim. Null text = one
    // empty line, kept.
    val docs = Seq(
      ("a", 1L, "Click here!\nunique one.\n\nshared line"),
      ("a", 2L, "click  HERE\nshared line\nunique two."),
      ("b", 3L, null: String)).toDF("source", "doc_id", "text")
    val got = TextQueries.lineDedupOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[String]("clean_text") ===
      "Click here!\nunique one.\n\nshared line")
    assert(r1.getAs[Long]("n_lines") === 4L)
    assert(r1.getAs[Long]("n_dup") === 0L)
    assert(r1.getAs[Long]("chars_removed") === 0L)
    val r2 = got(2L)
    assert(r2.getAs[String]("clean_text") === "unique two.")
    assert(r2.getAs[Long]("n_lines") === 3L)
    assert(r2.getAs[Long]("n_dup") === 2L)
    assert(r2.getAs[Long]("chars_removed") ===
      ("click  HERE".length + "shared line".length).toLong)
    val r3 = got(3L)
    assert(r3.getAs[String]("clean_text") === "")
    assert(r3.getAs[Long]("n_lines") === 1L)
    assert(r3.getAs[Long]("n_dup") === 0L)
  }

  test("property: lineDedupOf matches a plain-Scala reference on random multi-line text") {
    import s.implicits._
    val rnd = new scala.util.Random(61)
    // tiny vocabulary so cross-document duplicate lines are dense; case,
    // punctuation and double spaces exercise the normalization; ~1/4
    // empty lines sit outside the dedup domain; CRLF and null text ride
    val words = Seq("red", "blue", "green", "Red", "BLUE", "gray")
    val enders = Seq("", ".", "!", "  ", ", ok")
    def randLine(): String =
      if (rnd.nextInt(4) == 0) (if (rnd.nextBoolean()) "" else "  .. ")
      else Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(words.length)))
        .mkString(if (rnd.nextInt(5) == 0) "  " else " ") +
        enders(rnd.nextInt(enders.length))
    def randText(): String = {
      val sep = if (rnd.nextInt(4) == 0) "\r\n" else "\n"
      Seq.fill(1 + rnd.nextInt(5))(randLine()).mkString(sep)
    }
    val rows: Seq[(String, Long, String)] = (1L to 80L).map(i =>
      ("s" + (i % 3), i, if (rnd.nextInt(20) == 0) null else randText()))
    // the independent reference: same semantics in plain Scala
    def linesOf(text0: String): Seq[(String, String)] = {
      val text = Option(text0).getOrElse("")
      text.split("\n", -1).toSeq.map(_.replaceAll("\r$", "")).map(l =>
        l -> l.toLowerCase.replaceAll("[^a-z0-9 ]", "")
          .replaceAll(" +", " ").trim)
    }
    val firstOcc: Map[String, (Long, Int)] = rows
      .flatMap { case (_, id, t) =>
        linesOf(t).zipWithIndex.collect {
          case ((_, n), i) if n.nonEmpty => n -> (id, i)
        }
      }
      .groupBy(_._1).map { case (n, occ) => n -> occ.map(_._2).min }
    val got = TextQueries.lineDedupOf(rows.toDF("source", "doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    rows.foreach { case (_, id, t) =>
      val ls = linesOf(t).zipWithIndex
      val kept = ls.collect {
        case ((l, n), i) if n.isEmpty || firstOcc(n) == (id, i) => l
      }
      val dropped = ls.collect {
        case ((l, n), i) if n.nonEmpty && firstOcc(n) != (id, i) => l
      }
      val r = got(id)
      assert(r.getAs[String]("clean_text") === kept.mkString("\n"), s"doc $id clean_text")
      assert(r.getAs[Long]("n_lines") === ls.size.toLong, s"doc $id n_lines")
      assert(r.getAs[Long]("n_dup") === dropped.size.toLong, s"doc $id n_dup")
      assert(r.getAs[Long]("chars_removed") === dropped.map(_.length.toLong).sum,
        s"doc $id chars_removed")
    }
  }

  test("q_line_dedup demo matches a brute-force replay on sf0.001") {
    val docs = Tables.documents(s, dir)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)).getOrElse("")))
      .sortBy(d => d._2)
    def linesOf(text: String): Seq[String] =
      text.split(" ", -1).grouped(3).map(_.mkString(" ")).toSeq
    val firstOcc: Map[String, (Long, Int)] = docs
      .flatMap { case (_, id, t) =>
        linesOf(t).zipWithIndex.collect { case (l, i) if l.trim.nonEmpty => l -> (id, i) }
      }
      .groupBy(_._1).map { case (l, occ) => l -> occ.map(_._2).min }.toMap
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val per = ds.map { case (_, id, t) =>
        val ls = linesOf(t).zipWithIndex
        val dropped = ls.collect {
          case (l, i) if l.trim.nonEmpty && firstOcc(l) != (id, i) => l
        }
        val kept = ls.collect {
          case (l, i) if l.trim.isEmpty || firstOcc(l) == (id, i) => l
        }
        (ls.size.toLong, dropped.size.toLong, dropped.map(_.length.toLong).sum,
          kept.mkString("\n").length.toLong, kept.isEmpty)
      }
      src -> (per.length.toLong, per.map(_._1).sum, per.map(_._2).sum,
        per.map(_._3).sum, per.map(_._4).sum, per.count(_._5).toLong)
    }
    val got = Queries.byName("q_line_dedup").run(s, dir).collect()
    assert(got.map(_.getAs[String]("source")).toSet === want.keySet)
    got.foreach { r =>
      val (nDocs, nLines, nDup, cRm, cKp, emptied) = want(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === nDocs)
      assert(r.getAs[Long]("n_lines") === nLines)
      assert(r.getAs[Long]("n_dup_lines") === nDup)
      assert(r.getAs[Long]("n_kept_lines") === nLines - nDup)
      assert(r.getAs[Long]("chars_removed") === cRm)
      assert(r.getAs[Long]("clean_chars") === cKp)
      assert(r.getAs[Long]("docs_emptied") === emptied)
    }
    // the 3-token derivation must actually FIRE at this scale — a
    // zero-dup corpus would verify nothing
    assert(got.map(_.getAs[Long]("n_dup_lines")).sum > 0L)
  }

  test("q_length_buckets matches a brute-force bucket replay, incl. boundary and clamp") {
    import s.implicits._
    // fixture pins the 2^k boundary (len 16 → bucket 16, len 17 →
    // bucket 32), the floor bucket (len 1 → 1), the null-text exclusion
    // and the top-bucket clamp semantics the synthetic corpus never
    // reaches; then the sf0.001 corpus replays brute-force
    val fix = Seq(
      ("a", 1L, Seq.fill(16)("w").mkString(" ")),
      ("a", 2L, Seq.fill(17)("w").mkString(" ")),
      ("a", 3L, "w"),
      ("b", 4L, null: String)).toDF("source", "doc_id", "text")
    val fr = TextQueries.lengthBucketsOf(fix).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket_cap")) -> r).toMap
    assert(fr.keySet === Set(("a", 1L), ("a", 16L), ("a", 32L)))
    assert(fr(("a", 16L)).getAs[Long]("padding_waste") === 0L)
    assert(fr(("a", 32L)).getAs[Long]("padding_waste") === 15L)
    // single max-bucket comparison: 3 docs padded to 32 = 96 − 34 tokens
    assert(fr(("a", 1L)).getAs[Long]("src_waste_unbucketed") === 96L - 34L)
    val docs = Tables.documents(s, dir).select("source", "text").collect()
      .flatMap(r => Option(r.getString(1)).map(t => (r.getString(0), t)))
    def capOf(len: Long): Long =
      (0 to 20).map(1L << _).find(_ >= len).getOrElse(1L << 20)
    val want = docs
      .map { case (src, t) => (src, capOf(t.split(" ", -1).length.toLong), t.split(" ", -1).length.toLong) }
      .groupBy(x => (x._1, x._2))
      .map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._3).sum) }
    val got = Queries.byName("q_length_buckets").run(s, dir).collect()
    assert(got.map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket_cap"))).toSet
      === want.keySet)
    got.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[Long]("bucket_cap"))
      val (nDocs, nTok) = want(k)
      assert(r.getAs[Long]("n_docs") === nDocs, s"$k n_docs")
      assert(r.getAs[Long]("n_tokens") === nTok, s"$k n_tokens")
      assert(r.getAs[Long]("padding_waste") === nDocs * k._2 - nTok, s"$k waste")
    }
  }

  test("q_gopher_rules matches a brute-force rule evaluation on sf0.001") {
    val docs = Tables.documents(s, dir).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    case class Flags(w: Boolean, ml: Boolean, al: Boolean, st: Boolean,
        sy: Boolean, rep: Boolean) {
      def pass: Boolean = !(w || ml || al || st || sy || rep)
    }
    def flags(text: String): Flags = {
      val tk = text.split(" ", -1)
      val nw = tk.length.toLong
      val sumLen = text.length.toLong - (nw - 1)
      val alpha = tk.count(_.exists(c => c.isLetter && c <= 'z')).toLong
      val stops = tk.count(stop).toLong
      val syms = "#|\\.\\.\\.".r.findAllIn(text).length.toLong
      val uniq = tk.distinct.length.toLong
      Flags(
        !(nw >= 20 && nw <= 100000),
        !(nw * 3 <= sumLen && sumLen <= nw * 10),
        !(alpha * 5 >= nw * 4),
        !(stops >= 2),
        !(syms * 10 < nw),
        !(uniq * 2 >= nw))
    }
    val want = docs.groupBy(_._1).view.mapValues { ds =>
      val fs = ds.map(d => flags(d._2))
      (ds.length.toLong, fs.count(_.pass).toLong, fs.count(_.w).toLong,
        fs.count(_.ml).toLong, fs.count(_.al).toLong, fs.count(_.st).toLong,
        fs.count(_.sy).toLong, fs.count(_.rep).toLong)
    }.toMap
    val got = Queries.byName("q_gopher_rules").run(s, dir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))
    }.toMap
    assert(got === want)
  }

  test("q_gopher_rules: every threshold boundary lands on the correct side") {
    import s.implicits._
    // one doc per rule, sitting exactly ON its boundary (pass) and one
    // just past it (fail) — the off-by-one surface the sf corpus, where
    // two rules never fire at all, cannot pin
    def doc(id: Long, text: String, source: String) =
      (id, text, "en", source, text.length.toLong)
    val rows = Seq(
      // words rule: nw=19 < 20 fails ONLY f_words (5-6 char tokens keep
      // meanlen in [3,10]; the/a/of/is give the stop floor)
      doc(1L, (1 to 15).map(i => s"word$i").mkString(" ") + " the a of is",
        "words"),
      // meanlen: 18 one-char 'x' + 'a a' -> 20 tokens, sumlen 20 < 3*20;
      // 'x'/'a' are letters (alpha passes), 2 distinct of 20 fails rep too
      doc(2L, (1 to 18).map(_ => "x").mkString(" ") + " a a", "meanlen"),
      // symbol boundary: 2 '#' in 20 tokens -> syms*10 == nw, NOT < -> fails
      doc(3L, ("the is of and " + (1 to 14).map(i => s"tok$i").mkString(" ")
        + " # #"), "symbol"),
      // stop boundary: exactly 2 stopword hits passes everything
      doc(4L, "the is " + (1 to 18).map(i => s"word$i").mkString(" "), "stopok"),
      // repetition boundary: uniq*2 == nw exactly (10 distinct, 20 tokens)
      doc(5L, ((1 to 8).flatMap(i => Seq(s"tok$i", s"tok$i"))
        ++ Seq("the", "the", "is", "is")).mkString(" "), "repok"))
    val tmp = Files.createTempDirectory("graft-gopher").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Queries.byName("q_gopher_rules").run(s, tmp).collect().map { r =>
      r.getString(0) -> (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(2))
    }.toMap
    // (fail_words, fail_meanlen, fail_alpha, fail_stop, fail_symbol, fail_rep, n_pass)
    assert(got("words") === ((1L, 0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got("meanlen") === ((0L, 1L, 0L, 0L, 0L, 1L, 0L)))
    assert(got("symbol") === ((0L, 0L, 0L, 0L, 1L, 0L, 0L)))
    assert(got("stopok") === ((0L, 0L, 0L, 0L, 0L, 0L, 1L)))
    assert(got("repok") === ((0L, 0L, 0L, 0L, 0L, 0L, 1L)))
  }

  test("q_source_overlap matches brute-force gram-set Jaccard and its bounds") {
    val docs = Tables.documents(s, dir).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val gramsBySource: Map[String, Set[String]] = docs.groupBy(_._1).view
      .mapValues(_.flatMap { case (_, t) =>
        val tk = t.split(" ", -1)
        if (tk.length < 3) Seq.empty
        else tk.sliding(3).map(_.mkString(" ")).toSeq
      }.toSet).toMap
    val want = (for {
      (a, ga) <- gramsBySource; (b, gb) <- gramsBySource if a < b
      shared = (ga & gb).size if shared > 0
    } yield (a, b) -> (ga.size.toLong, gb.size.toLong, shared.toLong)).toMap
    val got = Queries.byName("q_source_overlap").run(s, dir).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
    }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, (ga, gb, sh, j)) =>
      assert((ga, gb, sh) === want(k))
      val exact = sh.toDouble / (ga + gb - sh)
      assert(math.abs(j - exact) < 1e-9 && j > 0.0 && j <= 1.0, s"$k jaccard $j")
    }
  }

  test("q_source_divergence matches exact BigInt total variation; bounds hold") {
    val docs = Tables.documents(s, dir).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySource = docs.groupBy(_._1).view
      .mapValues(_.flatMap(_._2.split(" ", -1)).groupBy(identity).view
        .mapValues(_.length.toLong).toMap).toMap
    val corpus = bySource.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tAll = BigInt(corpus.values.sum)
    val want = bySource.map { case (src, cnt) =>
      val tS = BigInt(cnt.values.sum)
      // .toSeq: mapping over a Map/keys-Set would DEDUPLICATE equal
      // products and understate both sums
      val present = cnt.toSeq.map { case (tok, c) =>
        (BigInt(c) * tAll - BigInt(corpus(tok)) * tS).abs
      }.sum
      val covered = cnt.keys.toSeq.map(tok => BigInt(corpus(tok)) * tS).sum
      val num = present + tAll * tS - covered
      src -> (cnt.size.toLong, cnt.values.sum,
        num.toDouble / (tAll * tS * 2).toDouble)
    }
    val got = Queries.byName("q_source_divergence").run(s, dir).collect().map { r =>
      r.getString(0) -> (r.getLong(2), r.getLong(1), r.getDouble(3))
    }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (src, (dt, nt, tv)) =>
      val (wd, wn, wtv) = want(src)
      assert((dt, nt) === ((wd, wn)))
      assert(math.abs(tv - wtv) < 1e-9, s"$src tv $tv vs $wtv")
      assert(tv >= 0.0 && tv < 1.0)
    }
  }

  test("q_source_divergence: a single-source corpus has zero distance from itself") {
    import s.implicits._
    val tmp = Files.createTempDirectory("graft-tv").toString
    Seq((1L, "a b c a", "en", "only", 7L), (2L, "b c d", "en", "only", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = Queries.byName("q_source_divergence").run(s, tmp).collect()
    assert(rows.length === 1 && rows(0).getDouble(3) === 0.0)
  }

  test("q_bm25_topk matches a brute-force BM25 ranking on sf0.001") {
    val qterms = Set("dup", "spark", "merge", "key")
    val docs = Tables.documents(s, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val n = docs.length.toLong
    val tAll = docs.map(_._2.length.toLong).sum
    val df = qterms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val scored = docs.map { case (id, tk) =>
      val dl = tk.length.toLong
      val sc = qterms.toSeq.map { t =>
        val tf = tk.count(_ == t).toLong
        if (tf == 0) BigDecimal(0)
        else {
          val tfPart = (22.0 * tf * tAll) / (10.0 * tf * tAll + 3.0 * tAll + 9.0 * dl * n)
          val idf = (2.0 * n - 2.0 * df(t) + 1.0) / (2.0 * df(t) + 1.0)
          BigDecimal(tfPart * idf).setScale(18, BigDecimal.RoundingMode.HALF_UP)
        }
      }.sum
      (id, sc)
    }.filter(_._2 > 0)
    val want = scored.sortBy { case (id, sc) => (-sc, id) }.take(10)
      .map { case (id, sc) => (id, sc.toDouble) }
    val got = Queries.byName("q_bm25_topk").run(s, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.map(_._1).toSeq === want.map(_._1).toSeq)
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-6, s"score $g vs $w")
    }
  }

  test("q_hybrid_rrf matches a brute-force fusion; bound rank <= a+b-1 holds") {
    // lexical leg: the q_bm25_topk brute force above, full top-100 list
    val qterms = Set("dup", "spark", "merge", "key")
    val docs = Tables.documents(s, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val n = docs.length.toLong
    val tAll = docs.map(_._2.length.toLong).sum
    val dfm = qterms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val lexRank = docs.map { case (id, tk) =>
      val dl = tk.length.toLong
      val sc = qterms.toSeq.map { t =>
        val tf = tk.count(_ == t).toLong
        if (tf == 0) BigDecimal(0)
        else BigDecimal(
          ((22.0 * tf * tAll) / (10.0 * tf * tAll + 3.0 * tAll + 9.0 * dl * n)) *
            ((2.0 * n - 2.0 * dfm(t) + 1.0) / (2.0 * dfm(t) + 1.0)))
          .setScale(18, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      (id, sc)
    }.filter(_._2 > 0).sortBy { case (id, sc) => (-sc, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // dense leg: decimal-summed cosine vs vec 0, mirroring dotDec's
    // per-product round-to-18 then the engine's exact double expression
    val embs = Tables.embeddings(s, dir).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dotDec(a: Array[Double], b: Array[Double]): BigDecimal =
      a.zip(b).map { case (x, y) =>
        BigDecimal(x * y).setScale(18, BigDecimal.RoundingMode.HALF_UP)
      }.sum
    val qe = embs.find(_._1 == 0L).get._2
    val qn = dotDec(qe, qe)
    val denseRank = embs.filter(_._1 != 0L).map { case (id, e) =>
      val cos = BigDecimal(dotDec(e, qe).toDouble /
        (math.sqrt(dotDec(e, e).toDouble) * math.sqrt(qn.toDouble)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, cos)
    }.sortBy { case (id, c) => (-c, id) }.take(100)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // exact-rational RRF fusion: compare n1*d2 vs n2*d1 (never a float)
    val ids = (lexRank.keySet ++ denseRank.keySet).toSeq
    def frac(id: Long): (BigInt, BigInt) = (lexRank.get(id), denseRank.get(id)) match {
      case (Some(a), Some(b)) => (BigInt(120 + a + b), BigInt((60 + a) * (60 + b)))
      case (Some(a), None) => (BigInt(1), BigInt(60 + a))
      case (None, Some(b)) => (BigInt(1), BigInt(60 + b))
      case _ => sys.error("unreachable")
    }
    val wantOrder = ids.sortWith { (x, y) =>
      val ((nx, dx), (ny, dy)) = (frac(x), frac(y))
      val cmp = (nx * dy).compare(ny * dx)
      if (cmp != 0) cmp > 0 else x < y
    }
    val got = Queries.byName("q_hybrid_rrf").run(s, dir).collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === wantOrder)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(Option(r.getAs[java.lang.Long]("rank_lex")).map(_.toLong) ===
        lexRank.get(id))
      assert(Option(r.getAs[java.lang.Long]("rank_dense")).map(_.toLong) ===
        denseRank.get(id))
    }
    // the PROVABLE fusion guarantee: at most (a-1)+(b-1) docs can outscore
    // a doc ranked (a, b) — any doc with a higher RRF sum must beat it in
    // at least one leg — so rank_fused <= a + b - 1. (The stronger claim
    // "never below both source ranks", i.e. <= max(a, b), is FALSE for
    // RRF: with k=60, d=(2,2) loses to both e=(1,3) and g=(3,1) —
    // 2/62 < 1/61 + 1/63 — putting d at fused rank 3 > max(2,2).)
    got.filter(r => r.getAs[java.lang.Long]("rank_lex") != null &&
        r.getAs[java.lang.Long]("rank_dense") != null)
      .foreach { r =>
        assert(r.getAs[Long]("rank_fused") <=
          r.getAs[Long]("rank_lex") + r.getAs[Long]("rank_dense") - 1)
      }
    // and a sanity floor: the fused top doc leads at least one leg's top-2
    val top = got.minBy(_.getAs[Long]("rank_fused"))
    assert(Option(top.getAs[java.lang.Long]("rank_lex")).exists(_ <= 2) ||
      Option(top.getAs[java.lang.Long]("rank_dense")).exists(_ <= 2))
  }

  test("property: rrfFuseOf matches exact-rational fusion on random rank lists") {
    import s.implicits._
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 5) {
      // random universes with partial overlap, including disjoint and
      // singleton lists — shapes the corpus demo can't produce
      val nLex = 1 + rnd.nextInt(30)
      val nDns = 1 + rnd.nextInt(30)
      val ids = rnd.shuffle((1L to 60L).toList)
      val lexIds = ids.take(nLex)
      val dnsIds = rnd.shuffle(ids).take(nDns)
      val lex = lexIds.zipWithIndex.map { case (id, i) => (id, i + 1L) }
        .toDF("doc_id", "rank_lex")
      val dns = dnsIds.zipWithIndex.map { case (id, i) => (id, i + 1L) }
        .toDF("doc_id", "rank_dense")
      val got = VectorQueries.rrfFuseOf(lex, dns).collect()
      val lexR = lexIds.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
      val dnsR = dnsIds.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
      def frac(id: Long): (BigInt, BigInt) = (lexR.get(id), dnsR.get(id)) match {
        case (Some(a), Some(b)) => (BigInt(120 + a + b), BigInt((60 + a) * (60 + b)))
        case (Some(a), None) => (BigInt(1), BigInt(60 + a))
        case (None, Some(b)) => (BigInt(1), BigInt(60 + b))
        case _ => sys.error("unreachable")
      }
      val want = (lexR.keySet ++ dnsR.keySet).toSeq.sortWith { (x, y) =>
        val ((nx, dx), (ny, dy)) = (frac(x), frac(y))
        val cmp = (nx * dy).compare(ny * dx)
        if (cmp != 0) cmp > 0 else x < y
      }
      assert(got.map(_.getAs[Long]("doc_id")).toSeq === want, s"trial $trial")
      assert(got.map(_.getAs[Long]("rank_fused")).toSeq ===
        (1L to want.length.toLong), s"trial $trial rank_fused")
      // the provable bound on every both-list doc
      got.filter(r => r.getAs[java.lang.Long]("rank_lex") != null &&
          r.getAs[java.lang.Long]("rank_dense") != null)
        .foreach(r => assert(r.getAs[Long]("rank_fused") <=
          r.getAs[Long]("rank_lex") + r.getAs[Long]("rank_dense") - 1,
          s"trial $trial bound"))
    }
  }

  test("property: rrfFuseByQidOf == an independent rrfFuseOf per qid (r19 batched fusion)") {
    import s.implicits._
    val rnd = new scala.util.Random(61)
    // three probes with different overlap shapes, fused in ONE batched
    // call — each qid's slice must equal the single-query engine run on
    // that qid's lists alone (the per-qid window cannot leak across
    // probes, and a doc ranked for one probe must not surface for
    // another)
    val perQid: Map[Long, (Seq[Long], Seq[Long])] = (1L to 3L).map { qid =>
      val ids = rnd.shuffle((1L to 40L).toList)
      qid -> (ids.take(1 + rnd.nextInt(10)),
        rnd.shuffle(ids).take(1 + rnd.nextInt(10)))
    }.toMap
    val lexB = perQid.toSeq.flatMap { case (qid, (l, _)) =>
      l.zipWithIndex.map { case (id, i) => (qid, id, i + 1L) }
    }.toDF("qid", "doc_id", "rank_lex")
    val dnsB = perQid.toSeq.flatMap { case (qid, (_, d)) =>
      d.zipWithIndex.map { case (id, i) => (qid, id, i + 1L) }
    }.toDF("qid", "doc_id", "rank_dense")
    val got = VectorQueries.rrfFuseByQidOf(lexB, dnsB).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank_fused"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("rrf_score")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(x => (x._2, x._3, x._4)).toSeq).toMap
    perQid.foreach { case (qid, (l, d)) =>
      val lex = l.zipWithIndex.map { case (id, i) => (id, i + 1L) }
        .toDF("doc_id", "rank_lex")
      val dns = d.zipWithIndex.map { case (id, i) => (id, i + 1L) }
        .toDF("doc_id", "rank_dense")
      val want = VectorQueries.rrfFuseOf(lex, dns).collect()
        .map(r => (r.getAs[Long]("rank_fused"), r.getAs[Long]("doc_id"),
          r.getAs[Double]("rrf_score"))).toSeq
      assert(got(qid) === want, s"qid $qid diverges from the single-query fusion")
    }
  }

  test("q_topic_mix: shares sum to 1 per source and doc counts reconcile") {
    val rows = Queries.byName("q_topic_mix").run(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docCounts = Tables.documents(s, dir).groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._3).sum === docCounts(src), s"$src doc count")
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-6, s"$src share sum")
    }
    assert(rows.map(_._1).toSet === docCounts.keySet)
  }

  test("q_asof_join matches a brute-force most-recent-prior-click scan") {
    val ev = Tables.events(s, dir)
      .select("event_id", "user_id", "ts_us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._2)
    val want = ev.filter(_._4 == "purchase").sortBy(_._1).map { case (id, u, ts, _) =>
      val prior = clicksByUser.getOrElse(u, Array.empty)
        .filter(_._3 < ts)
      val best = if (prior.isEmpty) None
        else Some(prior.maxBy(c => (c._3, c._1)))
      (id, u, ts, best.map(_._1), best.map(c => ts - c._3))
    }
    val got = Queries.byName("q_asof_join").run(s, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }
    assert(got.toSeq === want.toSeq)
  }

  test("asof join excludes same-microsecond clicks and breaks earlier ties by max id") {
    import s.implicits._
    // review r13: ts is nanos, so distinct raw timestamps CAN collide at
    // µs — the (ts_us, event_id)-ordered frame used to let a same-µs
    // click with a smaller event_id inside the strictly-earlier contract
    val ev = Seq(
      // user 1: click in the SAME µs as the purchase, smaller event_id —
      // must NOT be attributed (strictly earlier at µs resolution)
      (1L, 1L, 100L, "click"),
      (2L, 1L, 100L, "purchase"),
      // user 2: two clicks tied on an earlier µs — the max event_id wins
      (10L, 2L, 50L, "click"),
      (11L, 2L, 50L, "click"),
      (12L, 2L, 100L, "purchase"),
      // user 3: the only click is later — NULL attribution survives
      (20L, 3L, 100L, "purchase"),
      (21L, 3L, 200L, "click"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
    val got = EventQueries.asofWindowOf(ev).orderBy("purchase_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.toSeq === Seq(
      (2L, None, None),
      (12L, Some(11L), Some(50L)),
      (20L, None, None)))
  }

  test("q_range_join matches a brute-force banded count") {
    val ev = Tables.events(s, dir)
      .select("event_id", "user_id", "ts_us", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._2)
    val band = 86400000000L
    val want = ev.filter(_._4 == "error").sortBy(_._1).map { case (id, u, ts, _) =>
      val n = clicksByUser.getOrElse(u, Array.empty)
        .count(c => c._3 < ts && c._3 >= ts - band)
      (id, u, ts, n.toLong)
    }
    val got = Queries.byName("q_range_join").run(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === want.toSeq)
  }
}
