package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Base64

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftExtensions, Hll, HllBuffer, QBuffer, QSketch}

/** Persistent corpus-statistics sketches — the 5th batch↔streaming store
  * (exact-hash dedup, NeardupStore, VectorStore, FreqStore, this):
  * documents arriving in micro-batches keep the corpus's distinct-token
  * CARDINALITY ([[Hll]] two-regime sketch) and token-length DISTRIBUTION
  * ([[QSketch]] two-regime quantiles) current without re-scanning
  * history — the dataset-card numbers a 100 TB ingest keeps live.
  *
  * Design (the [[FreqStore]] pattern, with the sketches swapped in):
  *  - Per batch, ONE distributed aggregation compresses the batch to a
  *    single bounded row: `distinct_sketch_bin` of the token stream +
  *    `quantile_sketch_bin` of per-doc token counts + doc/token totals.
  *    The only collect is that row (two blobs ≤ ~64 KiB + two longs),
  *    never the stream.
  *  - The driver folds it into the stored sketches with the IDENTICAL
  *    [[Hll.merge]]/[[QSketch.merge]] the Catalyst aggregates use —
  *    mergeable-summaries across TIME instead of across partitions; the
  *    same fold would merge per-day sketches at 100 TB.
  *  - One atomically-replaced json document (PlaneStore idiom); sketch
  *    blobs ride as base64 of the PUBLIC [[Hll.toBytes]]/
  *    [[QSketch.toBytes]] format.
  *  - Exactly-once under foreachBatch replay via (lineage, last_batch_id)
  *    — the checkpoint-lineage-scoped guard FreqStore carries (r12
  *    advice): a reset checkpoint's batch 0 folds instead of being
  *    dropped as a replay; within a lineage, replayed ids no-op.
  *    Across a lineage reset the store is at-least-once unless the
  *    caller's file-registry guard (the control plane, which survives
  *    checkpoint resets) filters re-deliveries — as
  *    [[Streaming.releaseLoadStream]]'s does.
  *  - SINGLE-writer per store directory (the FreqStore ownership
  *    contract); readers always see a complete document. */
object StatsStore {

  final case class Stats(
      precision: Int, qCapacity: Int, lastBatchId: Long,
      nDocs: Long, nTokens: Long,
      hll: HllBuffer, lengths: QBuffer,
      lineage: Option[String] = None) {
    /** The readout: (distinct-token est, exact flag). */
    def distinctTokens: (Long, Boolean) =
      if (hll.regs == null) (hll.sparse.size.toLong, true)
      else (Hll.estimate(hll.regs, precision), false)
    /** The readout: (n, p50, p90, p99, max) over per-doc token counts. */
    def lengthQuantiles: (Long, Long, Long, Long, Long) = QSketch.quantiles(lengths)
  }

  private def path(dir: String): Path = Paths.get(dir, "_stats_sketch.json")

  def load(dir: String): Option[Stats] = {
    val p = path(dir)
    if (!Files.exists(p)) None
    else {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(Files.readString(p))
      Some(Stats(
        root.get("precision").asInt(), root.get("q_capacity").asInt(),
        root.get("last_batch_id").asLong(),
        root.get("n_docs").asLong(), root.get("n_tokens").asLong(),
        Hll.fromBytes(Base64.getDecoder.decode(root.get("hll").asText())),
        QSketch.fromBytes(Base64.getDecoder.decode(root.get("lengths").asText())),
        Option(root.get("lineage")).filterNot(_.isNull).map(_.asText())))
    }
  }

  private def save(dir: String, s: Stats): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("precision", s.precision)
    root.put("q_capacity", s.qCapacity)
    root.put("last_batch_id", s.lastBatchId)
    root.put("n_docs", s.nDocs)
    root.put("n_tokens", s.nTokens)
    root.put("hll", Base64.getEncoder.encodeToString(Hll.toBytes(s.hll)))
    root.put("lengths", Base64.getEncoder.encodeToString(QSketch.toBytes(s.lengths)))
    s.lineage.foreach(root.put("lineage", _))
    Files.createDirectories(Paths.get(dir))
    val target = path(dir)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, mapper.writeValueAsString(root))
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def empty(precision: Int, qCapacity: Int): Stats =
    Stats(precision, qCapacity, -1L, 0L, 0L,
      new HllBuffer(new java.util.HashSet[java.lang.Long](), null),
      new QBuffer(new java.util.HashMap[java.lang.Long, Array[Long]](), false))

  /** Fold one micro-batch of documents into the stored stats. `textCol`
    * tokenizes by space (the house rule). Returns the updated stats (or
    * the stored ones unchanged on a same-lineage replayed batch id). */
  def appendBatch(
      dir: String, batch: DataFrame, textCol: String, batchId: Long,
      precision: Int = 14, qCapacity: Int = 4096,
      lineage: String = "adhoc"): Stats = {
    val store = load(dir).getOrElse(empty(precision, qCapacity))
    require(store.precision == precision && store.qCapacity == qCapacity,
      s"stored sketch params (p=${store.precision}, cap=${store.qCapacity}) != " +
        s"requested (p=$precision, cap=$qCapacity) — a param change needs a new store dir")
    val sameLineage = store.lineage.forall(_ == lineage)
    if (sameLineage && batchId <= store.lastBatchId) return store // replay: no-op
    GraftExtensions.ensureRegistered(batch.sparkSession)
    val toks = split(col(textCol), " ")
    val row = batch
      .select(explode_outer(toks).as("tok"))
      .agg(
        call_function("distinct_sketch_bin", col("tok"), lit(precision)).as("hb"),
        count(col("tok")).as("n_tokens"))
      .head()
    // lengths need per-doc rows, not the exploded stream — second bounded
    // agg over the un-exploded frame (both aggs are one job each over the
    // batch, which is micro-batch-sized by construction)
    val lrow = batch
      .select(size(toks).cast("long").as("len"))
      .agg(
        call_function("quantile_sketch_bin", col("len"), lit(qCapacity)).as("qb"),
        count(lit(1)).as("n_docs"))
      .head()
    val batchHll = Hll.fromBytes(row.getAs[Array[Byte]]("hb"))
    val batchQ = QSketch.fromBytes(lrow.getAs[Array[Byte]]("qb"))
    val folded = store.copy(
      lastBatchId = batchId,
      nDocs = store.nDocs + lrow.getAs[Long]("n_docs"),
      nTokens = store.nTokens + row.getAs[Long]("n_tokens"),
      hll = Hll.merge(store.hll, batchHll, precision),
      lengths = QSketch.merge(store.lengths, batchQ, qCapacity),
      lineage = Some(lineage))
    save(dir, folded)
    folded
  }
}
