package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the corpus-build queries that must hold at ANY
  * scale factor — the DuckDB oracle pins exact values at sf0.01; these pin
  * the SHAPE (conservation, monotonicity, contiguity) on a second SF so a
  * future edit can't silently break the semantics the exact hash happens
  * not to exercise. */
class CorpusPipelineSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark
  private val dir = "/root/testdata/sf0.001"

  test("q_pack_sequences conserves the token stream and numbers windows contiguously") {
    val packed = Queries.byName("q_pack_sequences").run(s, dir)
      .select("source", "window_id", "n_docs", "n_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(s, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // conservation: every document's tokens land in exactly one window
    val packedBySource = packed.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val docsBySource = docs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(packedBySource === docsBySource)
    assert(packed.map(_._3).sum === docs.length) // ...and every doc exactly once
    // contiguity: window ids run 0..max with no gaps (a doc STARTS in
    // every window because windows are cut from the running stream)
    packed.groupBy(_._1).foreach { case (src, ws) =>
      val ids = ws.map(_._2).sorted
      assert(ids === (0L until ids.length).toArray, s"window gap in $src")
    }
  }

  test("q_corpus_select's funnel only narrows") {
    val rows = Queries.byName("q_corpus_select").run(s, dir)
      .select("n_total", "n_pass", "n_keeper", "n_selected").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, p, k, sel) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(t >= p && p >= k && k >= sel,
        s"funnel widened: total=$t pass=$p keeper=$k selected=$sel")
    }
  }

  test("substrDedupOf: span coverage unions overlaps, counts within-doc repeats, drops sub-W docs") {
    import s.implicits._
    // W=3 hand fixture. Cross-corpus gram counts: "a b c" x3 (docs 1,2,6),
    // "b c d" x3 (docs 1,6,7), doc 3 repeats its own period-3 shingles;
    // everything else is unique.
    val docs = Seq(
      (1L, "a b c d e f"),             // dup pos 1,2 -> union [1,4] = 4
      (2L, "a b c x y z"),             // dup pos 1 -> 3
      (3L, "p q r p q r p q r"),       // within-doc: pos 1..7 dup -> 9 (all)
      (4L, "u v w x"),                 // no dup -> 0, but row kept
      (5L, "s t"),                     // < W tokens -> filtered out
      (6L, "m a b c d n o"),           // dup pos 2,3 -> union [2,5] = 4
      (7L, "k1 b c d k2 k3")           // dup pos 2 -> 3
    ).toDF("doc_id", "text")
    val got = TextQueries.substrDedupOf(docs, W = 3)
      .select("doc_id", "n_tokens", "dup_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Array(
      (1L, 6L, 4L), (2L, 6L, 3L), (3L, 9L, 9L),
      (4L, 4L, 0L), (6L, 7L, 4L), (7L, 6L, 3L)))
  }

  test("property: substrDedupOf matches a brute-force coverage oracle on random corpora") {
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small vocab + short docs force heavy cross-doc AND within-doc shingle
    // collisions, the regimes the interval-union arithmetic must survive
    val docGen = for {
      nDocs <- Gen.choose(1, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(1, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    def oracle(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, Long)] = {
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val shingles = toks.toSeq.flatMap { case (id, ts) =>
        ts.sliding(w).filter(_.size == w).zipWithIndex.map { case (g, p) => (id, p, g.mkString(" ")) }
      }
      val counts = shingles.groupBy(_._3).view.mapValues(_.size).toMap
      toks.collect { case (id, ts) if ts.size >= w =>
        val dupPos = shingles.collect { case (`id`, p, g) if counts(g) >= 2 => p }
        val covered = dupPos.flatMap(p => p until p + w).toSet.size
        id -> (ts.size.toLong, covered.toLong)
      }.toMap
    }
    var seed = Seed(7L)
    (0 until 15).foreach { _ =>
      val docs = docGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val w = 2
      val got = TextQueries.substrDedupOf(docs.toDF("doc_id", "text"), w)
        .select("doc_id", "n_tokens", "dup_tokens").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === oracle(docs, w), s"docs: $docs")
    }
  }

  test("substrScrubOf removes exactly the tokens substrDedupOf counts") {
    import s.implicits._
    // same fixture as the coverage test, plus the invariant that ties the
    // two engines: kept == n_tokens - dup_tokens, and clean_text's token
    // count is kept (empty text = 0 tokens)
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c x y z"), (3L, "p q r p q r p q r"),
      (4L, "u v w x"), (5L, "s t"), (6L, "m a b c d n o"), (7L, "k1 b c d k2 k3")
    ).toDF("doc_id", "text")
    val signal = TextQueries.substrDedupOf(docs, W = 3)
      .select("doc_id", "n_tokens", "dup_tokens").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val scrub = TextQueries.substrScrubOf(docs, W = 3)
      .select("doc_id", "kept_tokens", "clean_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(scrub.map(_._1).toSeq === signal.keys.toSeq.sorted)
    scrub.foreach { case (id, kept, text) =>
      val (n, dup) = signal(id)
      assert(kept === n - dup, s"doc $id: kept $kept != $n - $dup")
      val textToks = if (text.isEmpty) 0 else text.split(" ", -1).length
      assert(textToks === kept, s"doc $id: clean_text has $textToks tokens, kept=$kept")
    }
    // the fully-duplicated doc scrubs to empty; the untouched doc survives verbatim
    assert(scrub.find(_._1 == 3L).get._3 === "")
    assert(scrub.find(_._1 == 4L).get._3 === "u v w x")
  }

  test("substrScrubOf KeepFirst keeps each duplicated gram's min-(doc_id, pos) occurrence") {
    import s.implicits._
    // same fixture as the coverage test. Keepers at W=3: "a b c" -> (1,1),
    // "b c d" -> (1,2), "p q r" -> (3,1), "q r p" -> (3,2), "r p q" -> (3,3).
    // So doc 1 (first holder of both cross-doc grams) survives verbatim,
    // doc 3 (period-3 self-repeat) keeps exactly its first period, and the
    // later holders lose only the marked spans.
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c x y z"), (3L, "p q r p q r p q r"),
      (4L, "u v w x"), (5L, "s t"), (6L, "m a b c d n o"), (7L, "k1 b c d k2 k3")
    ).toDF("doc_id", "text")
    val got = TextQueries.substrScrubOf(docs, W = 3,
        policy = TextQueries.ScrubPolicy.KeepFirst)
      .select("doc_id", "n_tokens", "kept_tokens", "clean_text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      (1L, 6L, 6L, "a b c d e f"),
      (2L, 6L, 3L, "x y z"),
      (3L, 9L, 3L, "p q r"),
      (4L, 4L, 4L, "u v w x"),
      (6L, 7L, 3L, "m n o"),
      (7L, 6L, 3L, "k1 k2 k3")))
    // conservation vs RemoveAll: KeepFirst's marked set is a subset, so
    // kept_tokens dominates ROW-BY-ROW; strictly greater in total whenever
    // any gram duplicates (here: every doc with a keeper span gains)
    val removeAll = TextQueries.substrScrubOf(docs, W = 3)
      .select("doc_id", "kept_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, _, kept, _) =>
      assert(kept >= removeAll(id), s"doc $id: KeepFirst kept $kept < RemoveAll ${removeAll(id)}")
    }
    assert(got.map(_._3).sum > removeAll.values.sum)
  }

  test("property: KeepFirst scrub matches a brute-force keeper-election oracle") {
    import s.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val docGen = for {
      nDocs <- Gen.choose(1, 8)
      docs <- Gen.listOfN(nDocs, Gen.choose(1, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // brute oracle: per gram with count >= 2, keeper = min (doc_id, pos);
    // marked = all non-keeper occurrences; kept = tokens outside the
    // union of marked spans
    def oracle(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, String)] = {
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val shingles = toks.toSeq.flatMap { case (id, ts) =>
        ts.sliding(w).filter(_.size == w).zipWithIndex.map { case (g, p) => (id, p, g.mkString(" ")) }
      }
      val byGram = shingles.groupBy(_._3).filter(_._2.size >= 2)
      val marked = byGram.values.toSeq.flatMap { occ =>
        val keeper = occ.map(o => (o._1, o._2)).min
        occ.map(o => (o._1, o._2)).filterNot(_ == keeper)
      }
      toks.collect { case (id, ts) if ts.size >= w =>
        val covered = marked.collect { case (`id`, p) => p }
          .flatMap(p => p until p + w).toSet
        val keptToks = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        id -> (keptToks.size.toLong, keptToks.mkString(" "))
      }.toMap
    }
    var seed = Seed(23L)
    (0 until 15).foreach { _ =>
      val docs = docGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val got = TextQueries.substrScrubOf(docs.toDF("doc_id", "text"), W = 2,
          policy = TextQueries.ScrubPolicy.KeepFirst)
        .select("doc_id", "kept_tokens", "clean_text").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got === oracle(docs, 2), s"docs: $docs")
    }
  }

  test("q_corpus_split conserves the corpus and is stable across reruns") {
    val rows = Queries.byName("q_corpus_split").run(s, dir)
      .select("source", "split", "n_docs", "n_tokens").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // conservation: every document lands in exactly one split
    val docs = Tables.documents(s, dir)
    assert(rows.map(_._3).sum === docs.count())
    assert(rows.forall(r => Set("train", "val", "test")(r._2)))
    // determinism: a rerun (fresh plan, same data) assigns identically —
    // the content-stable hash contract, which rand() or row_number would break
    val rerun = Queries.byName("q_corpus_split").run(s, dir)
      .select("source", "split", "n_docs", "n_tokens").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === rerun.toSeq)
  }

  test("q_dedup_payoff removals never exceed the clustered population") {
    val payoff = Queries.byName("q_dedup_payoff").run(s, dir)
      .select("source", "docs_removed", "n_clusters").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    payoff.foreach { case (src, removed, clusters) =>
      assert(clusters >= 1 && removed >= clusters,
        s"$src: $removed removals from $clusters clusters (each cluster " +
          "must remove at least one non-keeper)")
    }
  }

  test("q_quality_gate cuts exactly each source's bottom decile, conservation intact") {
    val rows = Queries.byName("q_quality_gate").run(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val docCount = Tables.documents(s, dir).count()
    assert(rows.map(_._2).sum === docCount, "per-source totals must cover the corpus")
    rows.foreach { case (src, nTotal, nCut, nKept, thr) =>
      assert(nCut === (nTotal + 9) / 10, s"$src: cut must be ceil(n/10)")
      assert(nKept === nTotal - nCut, s"$src: conservation")
      assert(nCut >= 1, s"$src: even a clean source sheds its worst row")
      assert(thr >= 0.0 && thr <= 1.0, s"$src: stopword-ratio threshold out of range")
    }
  }

  test("q_mix_epoch conserves targets: per-source emitted == n_target, reps differ by <= 1") {
    val rows = Queries.byName("q_mix_epoch").run(s, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("k")))
    // the targets the epoch must realize, re-derived from q_source_mix's
    // spelling (same sqrt draw, scaled to the demo's 2000 budget)
    val per = Tables.documents(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(size(split(col("text"), " ")).cast("long")).as("nt"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Long]("nt")))
    val wTot = per.map(p => BigDecimal(math.sqrt(p._3.toDouble))
      .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum
    val target = per.map { case (src, _, nt) =>
      val share = BigDecimal(
        (BigDecimal(math.sqrt(nt.toDouble)).setScale(18, BigDecimal.RoundingMode.HALF_UP)
          / wTot).toDouble).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      src -> (share * 2000).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
    }.toMap
    val nDocs = per.map(p => p._1 -> p._2).toMap
    val bySrc = rows.groupBy(_._1)
    assert(bySrc.keySet === target.filter(_._2 > 0).keySet)
    bySrc.foreach { case (src, rs) =>
      // conservation: exactly the target count, k a permutation of 0..target-1
      assert(rs.length.toLong === target(src), s"source $src")
      assert(rs.map(_._3).sorted.toSeq === (0L until target(src)).toSeq)
      // wraparound repetition: per-doc emission counts differ by <= 1,
      // and distinct docs = min(population, target)
      val perDoc = rs.groupBy(_._2).map(_._2.length)
      assert(perDoc.max - perDoc.min <= 1)
      assert(perDoc.size.toLong === math.min(nDocs(src), target(src)))
    }
  }

  test("property: mixEpochOf conserves targets on random corpora (skew, tiny sources, big budgets)") {
    import s.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 4) {
      val nSources = 1 + rnd.nextInt(4)
      val sizes = Seq.fill(nSources)(1 + rnd.nextInt(40))
      var id = 0L
      val rows = sizes.zipWithIndex.flatMap { case (n, si) =>
        Seq.fill(n) {
          id += 1
          (id, s"src$si", Seq.fill(1 + rnd.nextInt(30))("w").mkString(" "))
        }
      }
      val budget = 1L + rnd.nextInt(500)
      val out = TextQueries.mixEpochOf(
          rows.toDF("doc_id", "source", "text"), budget, nShards = 3)
        .collect().map(r => (r.getAs[String]("source"),
          r.getAs[Long]("doc_id"), r.getAs[Long]("k")))
      // expected targets: the sourceMixOf spelling re-derived independently
      val perTok = rows.groupBy(_._2).view
        .mapValues(_.map(_._3.split(" ").length.toLong).sum).toMap
      val wTot = perTok.values.toSeq
        .map(t => BigDecimal(math.sqrt(t.toDouble))
          .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum
      def target(src: String): Long = {
        val share = BigDecimal(
          (BigDecimal(math.sqrt(perTok(src).toDouble))
            .setScale(18, BigDecimal.RoundingMode.HALF_UP) / wTot).toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        (share * budget).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
      }
      val nDocs = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val bySrc = out.groupBy(_._1)
      assert(bySrc.keySet === perTok.keySet.filter(target(_) > 0),
        s"trial $trial sources")
      bySrc.foreach { case (src, rs) =>
        val t = target(src)
        assert(rs.length.toLong === t, s"trial $trial $src count")
        assert(rs.map(_._3).sorted.toSeq === (0L until t),
          s"trial $trial $src k permutation")
        val perDoc = rs.groupBy(_._2).map(_._2.length)
        assert(perDoc.max - perDoc.min <= 1, s"trial $trial $src balance")
        assert(perDoc.size.toLong === math.min(nDocs(src), t),
          s"trial $trial $src distinct docs")
      }
    }
  }

  test("property: unimaxMixOf is exact water-filling on random corpora") {
    import s.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 6) {
      val nSources = 1 + rnd.nextInt(6)
      val sizes = Seq.fill(nSources)(1 + rnd.nextInt(60))
      var id = 0L
      val rows = sizes.zipWithIndex.flatMap { case (n, si) =>
        Seq.fill(n) {
          id += 1
          (id, s"src$si", Seq.fill(1 + rnd.nextInt(25))("w").mkString(" "))
        }
      }
      val budget = 1L + rnd.nextInt(3000)
      val epochs = 1L + rnd.nextInt(3)
      val out = TextQueries.unimaxMixOf(
          rows.toDF("doc_id", "source", "text"), budget, epochs)
        .collect().map(r => (r.getAs[String]("source"),
          r.getAs[Long]("cap_tokens"), r.getAs[Boolean]("capped"),
          r.getAs[Long]("n_target")))
      val label = s"trial $trial (B=$budget E=$epochs sizes=$sizes)"
      // cap respected everywhere; capped sources sit exactly AT cap
      out.foreach { case (src, cap, capped, tgt) =>
        assert(tgt <= cap, s"$label: $src target $tgt > cap $cap")
        if (capped) assert(tgt === cap, s"$label: capped $src below its cap")
      }
      // budget conservation: never overspent, and underspend is only the
      // integer-division remainder (< number of uncapped sources) unless
      // EVERYTHING capped (budget exceeds the whole corpus × epochs)
      val total = out.map(_._4).sum
      assert(total <= budget || out.forall(_._3) && total == out.map(_._2).sum,
        s"$label: overspent $total > $budget")
      val nUncapped = out.count(!_._3)
      if (nUncapped > 0)
        assert(budget - total < nUncapped,
          s"$label: left ${budget - total} unspent with $nUncapped uncapped sources")
      // uniformity: every uncapped source gets the SAME share, and that
      // share is >= every capped source's cap (the water level)
      val shares = out.filter(!_._3).map(_._4).distinct
      assert(shares.size <= 1, s"$label: uneven uncapped shares $shares")
      shares.headOption.foreach { tau =>
        out.filter(_._3).foreach { case (src, cap, _, _) =>
          assert(cap <= tau, s"$label: capped $src's cap $cap above the water level $tau")
        }
      }
      // the batch engine agrees with a plain-Scala greedy reference
      val caps = out.map(x => (x._1, x._2)).sortBy(x => (x._2, x._1))
      var remaining = budget
      var left = caps.size
      val want = scala.collection.mutable.Map.empty[String, Long]
      var stillFilling = true
      caps.foreach { case (src, cap) =>
        val even = remaining / left
        if (stillFilling && cap <= even) { want(src) = cap; remaining -= cap }
        else { stillFilling = false; want(src) = remaining / left }
        if (stillFilling) left -= 1
      }
      out.foreach { case (src, _, _, tgt) =>
        assert(tgt === want(src), s"$label: $src got $tgt, greedy reference ${want(src)}")
      }
    }
  }

  test("property: mixEpochUnimaxOf conserves token budgets and respects caps on random corpora") {
    import s.implicits._
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 4) {
      val nSources = 1 + rnd.nextInt(5)
      val sizes = Seq.fill(nSources)(1 + rnd.nextInt(40))
      var id = 0L
      val rows = sizes.zipWithIndex.flatMap { case (n, si) =>
        Seq.fill(n) {
          id += 1
          (id, s"src$si", Seq.fill(1 + rnd.nextInt(30))("w").mkString(" "))
        }
      }
      val budget = 50L + rnd.nextInt(4000)
      val epochs = 1L + rnd.nextInt(3)
      val docs = rows.toDF("doc_id", "source", "text")
      val out = TextQueries
        .mixEpochUnimaxOf(docs, budget, epochs, nShards = 3)
        .collect().map(r => (r.getAs[String]("source"),
          r.getAs[Long]("doc_id"), r.getAs[Long]("k")))
      val label = s"trial $trial (B=$budget E=$epochs sizes=$sizes)"
      // independent referee: per-source token totals + the plain-Scala
      // greedy water-filler (the unimaxMixOf property test's spelling)
      val docTok = rows.map(r => r._1 -> r._3.split(" ").length.toLong).toMap
      val perTok = rows.groupBy(_._2).view
        .mapValues(_.map(r => docTok(r._1)).sum).toMap
      val nDocs = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val caps = perTok.toSeq.map { case (src, t) => (src, t * epochs) }
        .sortBy(x => (x._2, x._1))
      var remaining = budget
      var left = caps.size
      val target = scala.collection.mutable.Map.empty[String, Long]
      var stillFilling = true
      caps.foreach { case (src, cap) =>
        val even = remaining / left
        if (stillFilling && cap <= even) { target(src) = cap; remaining -= cap }
        else { stillFilling = false; target(src) = remaining / left }
        if (stillFilling) left -= 1
      }
      perTok.keys.foreach { src =>
        val rs = out.filter(_._1 == src)
        val spent = rs.map(r => docTok(r._2)).sum
        val tgt = target(src)
        val cap = perTok(src) * epochs
        // conservation: never past the target (so never past the cap),
        // and maximal — the shortfall is smaller than the source's
        // biggest doc (the next whole doc in order would have crossed)
        assert(spent <= tgt, s"$label: $src spent $spent > target $tgt")
        assert(spent <= cap, s"$label: $src spent $spent > cap $cap")
        val maxDoc = rows.filter(_._2 == src).map(r => docTok(r._1)).max
        assert(tgt - spent < maxDoc,
          s"$label: $src left ${tgt - spent} unfilled with docs <= $maxDoc")
        // a capped source emits EVERY doc exactly `epochs` times
        if (tgt == cap) {
          val perDoc = rs.groupBy(_._2).map(_._2.length.toLong)
          assert(perDoc.toSet === Set(epochs) || (epochs == 0L && rs.isEmpty),
            s"$label: capped $src per-doc reps ${perDoc.toSet}")
          assert(rs.groupBy(_._2).size.toLong === nDocs(src))
        }
        // wraparound shape: per-doc reps differ by <= 1, k a contiguous
        // 0..n_emit-1 permutation (the partial cycle is a rank prefix)
        if (rs.nonEmpty) {
          val perDoc = rs.groupBy(_._2).map(_._2.length)
          assert(perDoc.max - perDoc.min <= 1, s"$label: $src balance")
          assert(rs.map(_._3).sorted.toSeq === (0L until rs.length.toLong),
            s"$label: $src k permutation")
        }
      }
      // total epoch tokens never exceed the budget
      val spentAll = out.map(r => docTok(r._2)).sum
      assert(spentAll <= budget, s"$label: epoch spent $spentAll > $budget")
    }
  }

  test("mixEpochUnimaxOf: a budget smaller than the source count realizes an EMPTY epoch, loudly nothing") {
    import s.implicits._
    // 4 sources, budget 3 tokens: the integer water level is 0, every
    // target is 0, and the materializer must emit zero rows — not
    // divide by zero (the corpusBuildOf ANSI precedent) and not invent
    // a partial emission (reps = c + (p <= 0) with p >= 1 is 0)
    val docs = (1L to 12L)
      .map(i => (i, s"src${i % 4}", "w w w"))
      .toDF("doc_id", "source", "text")
    val out = TextQueries.mixEpochUnimaxOf(docs, totalBudget = 3L,
      maxEpochs = 2L, nShards = 2)
    assert(out.count() === 0L)
    // the targets themselves say why: all-zero, none capped
    val tg = TextQueries.unimaxMixOf(docs, 3L, 2L)
      .select("n_target").as[Long].collect()
    assert(tg.forall(_ === 0L))
  }

  test("mixEpochUnimaxOf epochs are distinct per index but identically conserved") {
    import s.implicits._
    val docs = (1L to 30L)
      .map(i => (i, s"src${i % 3}", Seq.fill((i % 7 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "source", "text")
    def epoch(idx: Long) = TextQueries
      .mixEpochUnimaxOf(docs, 60L, 2L, nShards = 3, epochIdx = idx)
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[String]("source"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("k")))
    val e0 = epoch(0L)
    val e1 = epoch(1L)
    // token conservation holds at EVERY index (emission counts may
    // legitimately differ: the partial cycle fills whole docs in the
    // index's own hash order, so a different order can fit a different
    // number of docs under the same token remainder)
    val docTok = (1L to 30L).map(i => i -> (i % 7 + 1)).toMap
    Seq(e0, e1).foreach { e =>
      e.groupBy(_._2).foreach { case (src, rs) =>
        assert(rs.map(r => docTok(r._3)).sum <= 20L,
          s"$src spent past its 60/3 water-filled share at some index")
      }
    }
    assert(e0.toSeq.sorted !== e1.toSeq.sorted,
      "epoch index 1 must not replay epoch 0's selection/interleave")
    assert(epoch(0L).toSeq.sorted === e0.toSeq.sorted,
      "the same index must replay byte-identically")
  }

  test("corpus-build mix policies share the funnel prefix; unimax stage respects caps") {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    def rows(policy: String) = TextQueries.corpusBuildOf(docs, policy)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    val sqrtRows = rows("sqrt")
    val uniRows = rows("unimax")
    // the manifest is the DECLARED query on the default policy
    assert(sqrtRows.toSeq === Queries.byName("q_corpus_build").run(s, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))).toSeq)
    // stages 0-7 are policy-independent (the shared funnel prefix)
    assert(uniRows.filter(_._1 <= 7L).toSeq === sqrtRows.filter(_._1 <= 7L).toSeq)
    // stage 8 carries the policy and respects the per-source cap of
    // maxEpochs x train tokens; the budget is never overspent
    val mix = uniRows.filter(_._1 == 8L)
    assert(mix.nonEmpty && mix.forall(_._2 == "mix_targets_unimax"))
    mix.foreach { case (_, _, src, _, t7, tgt) =>
      assert(tgt >= 0L && tgt <= 2L * t7, s"$src target $tgt past cap ${2L * t7}")
    }
    val total = mix.map(_._6).sum
    assert(total <= 100000L || mix.forall(m => m._6 == 2L * m._5),
      s"unimax manifest overspent: $total")
    // uncapped sources share one integer water level
    val shares = mix.filter(m => m._6 != 2L * m._5).map(_._6).distinct
    assert(shares.size <= 1, s"uneven uncapped shares: ${shares.toSeq}")
  }

  test("q_corpus_build population-consistency: stages agree with the standalone rung queries") {
    val rows = Queries.byName("q_corpus_build").run(s, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val byStage = rows.groupBy(_._2).view
      .mapValues(_.map(t => t._3 -> t._4).toMap).toMap
    // stage 0 counts the whole corpus — q_c4_lines' n_docs rollup (which
    // runs over ALL docs) must see the identical per-source populations
    val c4 = Queries.byName("q_c4_lines").run(s, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStage("raw") === c4)
    // the gopher stage's survivors == q_gopher_rules' n_pass per source
    val gopher = Queries.byName("q_gopher_rules").run(s, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_pass")).toMap
    assert(byStage("gopher") === gopher.filter(_._2 > 0))
    // attrition is monotone: each stage's per-source count never exceeds
    // the previous stage's (mix_targets shares split_train's population)
    val order = Seq("raw", "gopher", "c4_lines", "line_dedup", "exact_dedup",
      "decontaminate", "quality_gate", "split_train")
    order.sliding(2).foreach { case Seq(a, b) =>
      byStage.getOrElse(b, Map.empty).foreach { case (src, n) =>
        assert(n <= byStage(a).getOrElse(src, 0L), s"$b > $a for $src")
      }
    }
    assert(byStage("mix_targets") === byStage("split_train"))
    // the funnel genuinely sheds at the data-driven stages on this corpus
    // (r17: the line-dedup rung drops docs whose content collapses into
    // earlier docs' lines — on this fixture that absorbs the exact-dup
    // shedding too, the expected CCNet-order interaction)
    assert(byStage("line_dedup").values.sum < byStage("c4_lines").values.sum)
    assert(byStage("quality_gate").values.sum < byStage("decontaminate").values.sum)
    assert(byStage("split_train").values.sum < byStage("quality_gate").values.sum)
    // mix targets re-derive from the final token counts (sourceMixOf's
    // exact spelling, checked independently of the oracle)
    val toksBySrc = rows.filter(_._2 == "split_train")
      .map(t => t._3 -> t._4).toMap
    val fullRows = Queries.byName("q_corpus_build").run(s, dir).collect()
    val trainToks = fullRows.filter(_.getString(1) == "split_train")
      .map(r => r.getString(2) -> r.getLong(4)).toMap
    val targets = fullRows.filter(_.getString(1) == "mix_targets")
      .map(r => r.getString(2) -> r.getLong(5)).toMap
    val wTot = trainToks.values.toSeq.sorted
      .map(t => BigDecimal(math.sqrt(t.toDouble))
        .setScale(18, BigDecimal.RoundingMode.HALF_UP)).sum
    targets.foreach { case (src, tgt) =>
      val share = BigDecimal(
        (BigDecimal(math.sqrt(trainToks(src).toDouble))
          .setScale(18, BigDecimal.RoundingMode.HALF_UP) / wTot).toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      assert(tgt === (share * 100000).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong,
        s"mix target mismatch for $src")
    }
    assert(toksBySrc.nonEmpty)
  }

  test("multi-epoch determinism: distinct epochIdx permutes, identical epochIdx is byte-identical") {
    import s.implicits._
    val rows = (1L to 40L).map(i =>
      (i, s"src${i % 3}", Seq.fill(8 + (i % 5).toInt)(s"w$i").mkString(" ")))
    val docs = rows.toDF("doc_id", "source", "text")
    def epoch(idx: Long) = TextQueries.mixEpochOf(docs, 60L, nShards = 3, epochIdx = idx)
      .orderBy(col("shard"), col("vtime"), col("source"), col("doc_id"), col("k"))
      .collect().map(_.toSeq).toSeq
    val e0 = epoch(0L)
    val e1 = epoch(1L)
    val e2 = epoch(2L)
    // same conservation in EVERY epoch: per-source counts and the k
    // permutation are target-determined, independent of the index
    def bySrc(e: Seq[Seq[Any]]) = e.groupBy(_(2)).view
      .mapValues(rs => (rs.size, rs.map(_(4).asInstanceOf[Long]).sorted)).toMap
    assert(bySrc(e0) === bySrc(e1) && bySrc(e1) === bySrc(e2))
    // ...but the SELECTION (which docs repeat) and the interleave (who
    // lands where) are measurably distinct permutations per index
    assert(e0 != e1 && e1 != e2 && e0 != e2,
      "different epoch indexes must materialize different permutations")
    def selection(e: Seq[Seq[Any]]) = e.groupBy(_(2)).view
      .mapValues(_.map(r => (r(3).asInstanceOf[Long], r(4).asInstanceOf[Long])).sorted).toMap
    assert(selection(e0) != selection(e1),
      "the doc->k assignment must differ across epoch indexes, not just the shard layout")
    // identical epochIdx ⇒ byte-identical shard FILES through writeShards
    def writeOnce(dir: String, idx: Long): Map[String, String] = {
      graft.ingest.Sink.writeShards(
        TextQueries.mixEpochExportOf(docs, 60L, 3, epochIdx = idx), dir,
        orderCols = Seq("vtime", "source", "doc_id", "k"))
      // one data file per shard=N directory; file NAMES carry task ids
      // (non-deterministic), so key by shard and hash the file bytes
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
        .map { sd =>
          val f = sd.listFiles().filter(f =>
            f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
          assert(f.length === 1, s"${sd.getName}: expected one data file")
          sd.getName -> java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.head.toPath))
            .map("%02x".format(_)).mkString
        }.toMap
    }
    val d1 = java.nio.file.Files.createTempDirectory("graft-epoch-a").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft-epoch-b").toString
    val d3 = java.nio.file.Files.createTempDirectory("graft-epoch-c").toString
    val w1 = writeOnce(d1, 1L)
    assert(w1 === writeOnce(d2, 1L))
    assert(writeOnce(d3, 2L) != w1)
  }

  test("curriculum epoch: same selection and mix, per-source quality annealed in-shard") {
    import s.implicits._
    // quality varies by doc: stopword density rises with doc id, so the
    // annealed order is observable; vocab includes the stopword list
    val rows = (1L to 40L).map { i =>
      val stops = Seq.fill((i % 7).toInt)("the")
      val body = Seq.fill(8)(s"w$i")
      (i, s"src${i % 3}", (body ++ stops).mkString(" "))
    }
    val docs = rows.toDF("doc_id", "source", "text")
    def run(curr: Boolean) = TextQueries
      .mixEpochOf(docs, 60L, nShards = 3, curriculum = curr)
      .orderBy(col("shard"), col("vtime"), col("source"), col("doc_id"), col("k"))
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Double]("vtime"),
        r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("k")))
      .toSeq
    val plain = run(curr = false)
    val curr = run(curr = true)
    // identical SELECTION: the same (source, doc_id, k) multiset — the
    // curriculum changes only the order each source's emissions take
    assert(plain.map(t => (t._3, t._4, t._5)).sorted ===
      curr.map(t => (t._3, t._4, t._5)).sorted)
    // identical MIX: per (shard, source) the vtime sequences coincide
    // (only which doc occupies each slot changes)
    def slots(e: Seq[(Long, Double, String, Long, Long)]) =
      e.groupBy(t => (t._1, t._3)).view.mapValues(_.map(_._2).sorted).toMap
    assert(slots(plain) === slots(curr))
    // ...and measurably NOT the same order
    assert(plain !== curr)
    // ANNEALING: within every (shard, source), the integer quality score
    // is non-decreasing along vtime — each shard's tail is its
    // highest-quality slice
    val qOf: Map[Long, Long] = rows.map { case (id, _, text) =>
      val toks = text.split(" ", -1)
      val stops = toks.count(Set("the", "a", "of", "and", "to", "in", "is"))
      id -> stops * 1000000L / toks.length
    }.toMap
    curr.groupBy(t => (t._1, t._3)).foreach { case (key, es) =>
      val qs = es.sortBy(_._2).map(t => qOf(t._4))
      assert(qs === qs.sorted, s"quality not annealed within $key: $qs")
    }
    // the plain epoch is NOT accidentally annealed (the fixture has
    // enough quality spread that hash order scrambles it somewhere)
    val scrambled = plain.groupBy(t => (t._1, t._3)).exists { case (_, es) =>
      val qs = es.sortBy(_._2).map(t => qOf(t._4))
      qs !== qs.sorted
    }
    assert(scrambled, "fixture degenerate: hash order already quality-sorted")
  }

  test("q_mix_epoch is partitioning-invariant (the no-RNG claim, executed)") {
    val base = Queries.byName("q_mix_epoch").run(s, dir)
    val a = base.collect()
    val b = TextQueries.mixEpochOf(
        Tables.fanOut(Tables.documents(s, dir)), totalBudget = 2000L, nShards = 4)
      .orderBy(col("shard"), col("vtime"), col("source"), col("doc_id"), col("k"))
      .select(col("shard"), round(col("vtime"), 9).as("vtime"),
        col("source"), col("doc_id"), col("k"))
      .collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("q_source_mix interpolates toward uniform: small sources upweighted, large damped") {
    val rows = Queries.byName("q_source_mix").run(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(rows.length > 1)
    val wSum = rows.map(_._3).sum
    assert(math.abs(wSum - 1.0) < 1e-6, s"weights must normalize, got $wSum")
    val nSum = rows.map(_._2).sum.toDouble
    rows.foreach { case (src, n, w, target) =>
      val prop = n / nSum
      // sqrt-temperature sits strictly between proportional and uniform
      // (ties only if all sources are equal-sized, which this table isn't)
      if (prop < 1.0 / rows.length) assert(w > prop, s"$src: small source not upweighted")
      if (prop > 1.0 / rows.length) assert(w < prop, s"$src: large source not damped")
      assert(target === math.floor(100000.0 * w).toLong)
    }
    // monotone: more tokens never means a smaller weight
    rows.sortBy(_._2).sliding(2).foreach {
      case Array((_, _, w1, _), (_, _, w2, _)) => assert(w2 >= w1)
      case _ =>
    }
  }

  test("q_split_leakage: leaky docs bounded by train population, consistent with the split") {
    val leak = Queries.byName("q_split_leakage").run(s, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(leak.nonEmpty)
    leak.foreach { case (src, nTrain, nLeaky, shared) =>
      assert(nLeaky <= nTrain, s"$src: more leaky docs than train docs")
      assert((nLeaky == 0) == (shared == 0), s"$src: leaky docs and shared grams must co-vanish")
    }
    // the train populations must agree with q_corpus_split's own counts
    // (same hash, same 90-bucket boundary — a drift here means the audit
    // is auditing a DIFFERENT split than the one shipped); leakage filters
    // out sub-width docs, so its population is a lower bound
    val split = Queries.byName("q_corpus_split").run(s, dir).collect()
      .filter(_.getString(1) == "train")
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    leak.foreach { case (src, nTrain, _, _) =>
      assert(nTrain <= split(src), s"$src: audit train population exceeds the split's")
    }
  }
}
