package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Persistent inverted-index (postings) store — the SERVING shape behind
  * BM25 retrieval (VERDICT r15 Next #1): `Cli search` and q_bm25_topk
  * recompute tf/df/corpus totals with a full corpus scan per query, which
  * is the right ANALYTICS spelling but the wrong shape for ad-hoc
  * retrieval at 100 TB — there, the index is built once (or maintained
  * per micro-batch) and each query reads ONLY its terms' slice.
  *
  * Layout (the NeardupStore/VectorStore lake-table pattern):
  *  - `<store>/postings`: one row per (token, doc_id) — (token, doc_id,
  *    tf, dl), partitioned by `token_bucket = pmod(xxhash64(token), 64)`.
  *    ALL postings of a token live in exactly one bucket, so a probe's
  *    driver-side isin over its terms' buckets (bounded by the 64-value
  *    partition domain) turns the store scan into static partition
  *    pruning — never a full-store scan per query — AND makes the
  *    pruned slice self-sufficient for df (df = distinct postings of the
  *    token, all co-located in its bucket).
  *  - `<store>/_totals.json`: the corpus totals BM25 needs (n_docs,
  *    t_all) as ONE tiny document — two longs, never a table scan at
  *    query time — atomically replaced via temp-file + ATOMIC_MOVE (the
  *    FreqStore/PlaneStore idiom) with the same lineage-scoped batch-id
  *    watermark as FreqStore: totals are ADDITIVE, so a replayed batch
  *    must fold exactly once.
  *
  * Exactly-once posture (the NeardupStore contract): postings append
  * BEFORE the totals save, so the one crash window (postings committed,
  * totals not) replays the batch into duplicate posting ROWS — which the
  * probe folds with a bounded distinct over the matched slice and
  * [[compact]] folds away on disk — while the totals watermark keeps the
  * ADDITIVE side exactly-once. In the composed pipeline
  * ([[Streaming.releaseLoadStream]]) the control plane's registered-file
  * guard additionally drops already-loaded files before they reach this
  * store, exactly as for the near-dup signature store.
  *
  * Scoring is [[graft.TextQueries.bm25ScoreExpr]] — the ONE spelling of
  * the exact-rational BM25 shared with the full-scan engine, so an
  * indexed search returns byte-identical scores to the scan
  * (q_bm25_indexed hash-matches q_bm25_topk against the same oracle). */
object PostingsStore {

  /** Partition-pruning bucket domain (see [[NeardupStore.Buckets]] for the
    * sizing rationale: coarse enough to prune, small enough that the
    * partition listing is a metadata no-op at any corpus size). */
  val Buckets = 64

  def postingsPath(store: String): String = s"$store/postings"

  private def tokenBucket(token: Column): Column =
    pmod(xxhash64(token), lit(Buckets.toLong))

  /** The additive corpus totals + the replay watermark. */
  final case class Totals(
      nDocs: Long, tAll: Long, lastBatchId: Long,
      lineage: Option[String] = None)

  private def totalsPath(store: String): Path = Paths.get(store, "_totals.json")

  def loadTotals(store: String): Option[Totals] = {
    val p = totalsPath(store)
    if (!Files.exists(p)) None
    else {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readString(p))
      Some(Totals(
        root.get("n_docs").asLong(), root.get("t_all").asLong(),
        root.get("last_batch_id").asLong(),
        Option(root.get("lineage")).filterNot(_.isNull).map(_.asText())))
    }
  }

  private def saveTotals(store: String, t: Totals): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("n_docs", t.nDocs)
    root.put("t_all", t.tAll)
    root.put("last_batch_id", t.lastBatchId)
    t.lineage.foreach(root.put("lineage", _))
    Files.createDirectories(Paths.get(store))
    val target = totalsPath(store)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, mapper.writeValueAsString(root))
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Postings rows of a (doc_id, text) frame: one row per (token, doc_id)
    * with its term frequency and the doc length — the same space
    * tokenization and dl definition as the full-scan engine
    * ([[graft.TextQueries.bm25ScoresOf]]), or indexed and scanned scores
    * would silently diverge. One corpus-wide shuffle (the groupBy) — the
    * index BUILD cost, paid once per batch, never per query. */
  private[streaming] def postingsOf(docs: DataFrame): DataFrame = {
    val tk = split(col("text"), " ")
    docs
      .select(col("doc_id"), size(tk).cast(LongType).as("dl"),
        explode(tk).as("token"))
      .groupBy("token", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .withColumn("token_bucket", tokenBucket(col("token")))
  }

  /** Append one batch of (doc_id, text) docs to the store: postings rows
    * bucket-partitioned (one narrow shuffle; file count per batch =
    * touched buckets, not tasks × buckets), then the totals fold under
    * the lineage-scoped batch-id watermark. A replayed batch id within
    * the same lineage is a full no-op; see the class doc for the one
    * crash window and its duplicate-tolerance contract.
    *
    * PRECONDITION (the mixEpochExportOf discipline): doc_id is unique in
    * `docs` and across batches — the load path's content-addressed dedup
    * guarantees it for collection documents; a re-appended doc_id would
    * double its dl in t_all and itself in n_docs. */
  def appendBatch(
      store: String, docs: DataFrame, batchId: Long,
      lineage: String = "adhoc"): Totals = {
    val tot = loadTotals(store).getOrElse(Totals(0L, 0L, -1L, None))
    val sameLineage = tot.lineage.forall(_ == lineage)
    if (sameLineage && batchId <= tot.lastBatchId) return tot // replayed: no-op
    postingsOf(docs)
      .repartition(col("token_bucket"))
      .write.mode("append").partitionBy("token_bucket")
      .parquet(postingsPath(store))
    // batch totals: one tiny (2-long) aggregate over the batch docs
    val r = docs
      .agg(count(lit(1)).as("n"),
        coalesce(sum(size(split(col("text"), " ")).cast(LongType)), lit(0L)).as("t"))
      .head()
    val folded = Totals(
      tot.nDocs + r.getAs[Long]("n"), tot.tAll + r.getAs[Long]("t"),
      batchId, Some(lineage))
    saveTotals(store, folded)
    folded
  }

  /** BM25-scored documents for a query-term set, served FROM THE STORE:
    * reads only the terms' buckets (static partition pruning via the
    * driver-side isin — the probed slice is |terms| × df rows, never the
    * corpus), folds replay-window duplicate rows with a bounded distinct,
    * derives df inside the slice, and scores with the shared
    * exact-rational BM25 against the totals document's two longs — no
    * corpus scan anywhere at query time. Output: (doc_id, n_terms,
    * score_dec), the full-scan engine's contract, unordered — callers
    * rank. Empty frame when the store does not exist yet. */
  def probe(spark: SparkSession, store: String, qterms: Seq[String]): DataFrame = {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, java.math.BigDecimal)]
      .toDF("doc_id", "n_terms", "score_dec")
      .select(col("doc_id"), col("n_terms"),
        col("score_dec").cast(org.apache.spark.sql.types.DecimalType(38, 18))
          .as("score_dec"))
    val tot = loadTotals(store).getOrElse(return empty)
    if (!Files.isDirectory(Paths.get(postingsPath(store)))) return empty
    // bucket membership computed over a LOCAL relation of the query terms
    // (bounded by the 64-value partition domain, touches no store files) —
    // the driver-side isin is what turns the store scan into static
    // partition pruning, the NeardupStore idiom
    val buckets = qterms.toDF("token")
      .select(tokenBucket(col("token")).as("b"))
      .distinct().as[Long].collect()
    val posts = spark.read.parquet(postingsPath(store))
      .filter(col("token_bucket").isin(buckets: _*))
      .filter(col("token").isin(qterms: _*))
      .select(col("token"), col("doc_id"), col("tf"), col("dl"))
      .distinct() // fold crash-window replay duplicates (exact rows)
    val dfT = posts.groupBy("token").agg(count(lit(1)).as("df"))
    posts
      .join(broadcast(dfT), Seq("token"))
      .select(col("doc_id"),
        graft.TextQueries.bm25ScoreExpr(
          col("tf"), col("dl"), col("df"), lit(tot.nDocs), lit(tot.tAll))
          .as("score_dec"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("score_dec")).as("score_dec"))
  }

  /** The BATCHED [[probe]] — one store read serving MANY queries (the
    * lexical twin of [[VectorStore.knnJoin]]'s many-query composition):
    * `qterms` is a bounded (qid, token) probe frame. Bucket pruning,
    * replay folding, in-slice df and the shared exact-rational scoring
    * are [[probe]]'s spellings verbatim, so the store read does not
    * grow with the probe count — the matched slice is |union of terms|
    * × df rows (read twice, df leg + scoring leg, both statically
    * pruned — [[probe]]'s exact scan shape), never the corpus, never
    * per-query scans. df stays GLOBAL per token (all of a token's
    * postings live in its bucket), so a posting scores identically
    * under every query probing it — byte-identical to per-query
    * [[probe]] calls by construction (PostingsStoreSpec pins it). The
    * probe frame is deduplicated driver-side (it is collected once
    * anyway, bounded by contract): a caller passing duplicate
    * (qid, token) rows would otherwise fold a matched posting into a
    * query's sum once per duplicate and silently inflate n_terms and
    * score_dec (ADVICE r18) — exactly as [[probe]] is insensitive to a
    * repeated term in `qterms` via the postings-side distinct.
    *
    * Fan-out shape (r20, guide §8 "decide with small rows"): the BM25
    * term value depends only on (token, doc), never on which query
    * probes it, so each matched posting is DECIMAL-scored exactly once
    * and the per-(qid, doc) sums fold in ONE in-memory pass over the
    * doc-partitioned slice (token → probing-qids is a broadcast map —
    * the [[VectorStore.knnJoin]] inverted-probe idiom). The previous
    * spelling materialized the (postings × probing-queries) lattice
    * through a join and re-aggregated it with a decimal hash-agg —
    * at sf0.1's 200-probe eval frame that is 17.5M fanned rows and
    * 17.5M UnsafeRow decimal-sum updates for 116k matched postings
    * (measured 6.3 s of the lex leg's 8 s; the whole leg dropped ~7×
    * under this spelling, parity-checked row-identical). Exactness is
    * unchanged: DECIMAL(38,18) addition is exact, so any fold order
    * and grouping of the same per-posting terms yields the identical
    * sum. Per-task state is its doc slice's (qid, doc) partial rows —
    * exactly the rows this operator must emit anyway, never the
    * lattice; it shrinks with the shuffle partition count, and the
    * shuffle itself carries the matched POSTINGS (narrow rows), not
    * the fan-out. Output: (qid, doc_id, n_terms, score_dec),
    * unordered — callers rank per qid. */
  def probeBatch(spark: SparkSession, store: String, qterms: DataFrame): DataFrame = {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long, java.math.BigDecimal)]
      .toDF("qid", "doc_id", "n_terms", "score_dec")
      .select(col("qid"), col("doc_id"), col("n_terms"),
        col("score_dec").cast(org.apache.spark.sql.types.DecimalType(38, 18))
          .as("score_dec"))
    val tot = loadTotals(store).getOrElse(return empty)
    if (!Files.isDirectory(Paths.get(postingsPath(store)))) return empty
    // the probe frame is bounded (queries × terms) — collected ONCE,
    // deduplicated here (distinctness made structural, not a caller
    // precondition); the token list drives the two driver-side isin
    // pruning lists, the [[probe]] idiom
    val pairs = qterms.select(col("qid"), col("token"))
      .as[(Long, String)].collect().distinct.toSeq
    val toks = pairs.map(_._2).distinct
    if (toks.isEmpty) return empty
    val buckets = toks.toSeq.toDF("token")
      .select(tokenBucket(col("token")).as("b"))
      .distinct().as[Long].collect()
    val posts = spark.read.parquet(postingsPath(store))
      .filter(col("token_bucket").isin(buckets: _*))
      .filter(col("token").isin(toks.toSeq: _*))
      .select(col("token"), col("doc_id"), col("tf"), col("dl"))
      .distinct() // fold crash-window replay duplicates (exact rows)
    val dfT = posts.groupBy("token").agg(count(lit(1)).as("df"))
    // each matched posting scored ONCE (the value is qid-independent)
    val scored = posts
      .join(broadcast(dfT), Seq("token"))
      .select(col("token"), col("doc_id"),
        graft.TextQueries.bm25ScoreExpr(
          col("tf"), col("dl"), col("df"), lit(tot.nDocs), lit(tot.tAll))
          .as("score_dec"))
    val byTok: Map[String, Array[Long]] =
      pairs.groupBy(_._2).map { case (t, xs) => (t, xs.map(_._1).toArray) }
    val bcByTok = spark.sparkContext.broadcast(byTok)
    scored
      // co-locate each doc's postings so every (qid, doc) sum completes
      // inside one task — the shuffle moves the narrow matched slice
      .repartition(col("doc_id"))
      .as[(String, Long, java.math.BigDecimal)]
      .mapPartitions { it =>
        val m = bcByTok.value
        // doc → (qid → [n_terms, exact decimal sum]); same-scale
        // BigDecimal adds, so the fold is exact in any arrival order
        final class St { var n = 0L; var sum = java.math.BigDecimal.ZERO }
        val acc = new java.util.HashMap[Long, java.util.HashMap[Long, St]]()
        it.foreach { case (tok, doc, sd) =>
          m.get(tok).foreach { qs =>
            var dm = acc.get(doc)
            if (dm == null) {
              dm = new java.util.HashMap[Long, St]()
              acc.put(doc, dm)
            }
            var i = 0
            while (i < qs.length) {
              var st = dm.get(qs(i))
              if (st == null) { st = new St; dm.put(qs(i), st) }
              st.n += 1L
              st.sum = st.sum.add(sd)
              i += 1
            }
          }
        }
        import scala.jdk.CollectionConverters._
        acc.entrySet.iterator.asScala.flatMap { e =>
          val doc = e.getKey.longValue
          e.getValue.entrySet.iterator.asScala.map { q =>
            (q.getKey.longValue, doc, q.getValue.n, q.getValue.sum)
          }
        }
      }
      .toDF("qid", "doc_id", "n_terms", "score_dec")
      .select(col("qid"), col("doc_id"), col("n_terms"),
        col("score_dec").cast(org.apache.spark.sql.types.DecimalType(38, 18))
          .as("score_dec"))
  }

  /** REBUILD the store from scratch without ever destroying the previous
    * copy before the replacement exists (code-review r16: the first cut
    * deleted then rebuilt, so a failed build job permanently lost the
    * index) — the aside-write → swap idiom of the sibling stores:
    * build into `<store>_rebuild_tmp`, then rename store → `_rebuild_old`
    * → tmp → store → sweep old. A crash anywhere self-heals on the next
    * call (or any later rebuild): a tmp with the store present is an
    * incomplete build and is swept; an old dir with the store ABSENT is
    * the one crash point between the two live renames and is promoted
    * back. Readers (`search --indexed`) see the old store or the new
    * one; the absence window is the single rename pair, as in
    * `Sink.swapCollectionPartition`. */
  def rebuild(store: String, docs: DataFrame, batchId: Long = 0L): Totals = {
    import java.nio.file.{Files => JF, Paths => JP}
    val target = JP.get(store)
    val tmp = JP.get(store + "_rebuild_tmp")
    val old = JP.get(store + "_rebuild_old")
    // crash recovery, BEFORE anything else (idempotent)
    if (JF.exists(old)) {
      if (JF.exists(target)) deleteDir(old) // died pre-sweep: old is stale
      else JF.move(old, target)             // died between the two renames
    }
    deleteDir(tmp) // any leftover tmp is an incomplete build
    val tot = appendBatch(tmp.toString, docs, batchId)
    if (JF.exists(target)) JF.move(target, old)
    JF.move(tmp, target)
    deleteDir(old)
    tot
  }

  private def deleteDir(dir: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(dir)
      try s.iterator.asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally s.close()
    }

  /** Small-file + duplicate-row maintenance — [[NeardupStore.compactTable]]
    * verbatim over the postings table (distinct rewrite, one file per
    * bucket partition, aside-write → ready-mark → sweep-promote commit
    * protocol with crash self-healing). MUST only run against a
    * terminated stream, same contract as the sibling stores. The totals
    * document is not touched: it is additive state, not foldable rows.
    * Returns the retained posting-row count. */
  def compact(spark: SparkSession, store: String): Long =
    NeardupStore.compactTable(spark, postingsPath(store), "token_bucket")
}
