package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Persistent perceptual-fingerprint store for MEDIA payloads — the
  * production shape behind the q_image/audio/video_neardup batch queries
  * (VERDICT r18 Next #7): those queries recompute every decode on every
  * run, which is exactly linear per-row CPU (the stamped q_audio_neardup
  * 10.68× tail), while a real pipeline decodes each payload ONCE at
  * ingest, persists the 64-bit fingerprint, and answers near-dup checks
  * O(batch) against the store forever after — the [[NeardupStore]]
  * pattern in the perceptual domain.
  *
  * One lake table, `media_fps`: one row per (id, kind, ahash, band_id,
  * band_val) — the 4×16-bit banding of the 64-bit hash materialized as
  * rows (the hash itself rides along, so the verify needs no second
  * table, unlike MinHash whose verify needs token sets) — partitioned by
  * `band_bucket = pmod(band_val, 64)` so a batch probe statically prunes
  * to the partitions its own band values land in (the driver-side isin
  * is bounded by the 64-value partition DOMAIN, never by data volume).
  *
  * Fingerprints come from the REAL decode engines, once per payload
  * ([[fingerprintsOf]]): image → [[Multimodal.aHash64]] over the decoded
  * raster (animated GIFs land here too — first composed frame, the
  * videoNeardup scope); audio → [[Multimodal.audioHash64]] over decoded
  * PCM; MJPEG-in-AVI video → first-frame aHash. Undecodable payloads
  * yield no fingerprint (nothing to perceptually match — the batch
  * queries' contract). Matching is WITHIN kind only (an audio hash
  * band-colliding with an image hash is noise, not a near-dup).
  *
  * Per-batch flow (probe BEFORE append, so a payload never matches
  * itself): batch fingerprints → bucket-pruned candidate join on
  * (kind, band_id, band_val) → hamming ≤ τ verify on the carried full
  * hashes → one deterministic flag per batch id (min dup_of on ties,
  * the [[VectorStore.probeBatch]] contract) → then the batch appends
  * partition-wise. Replay duplicates are byte-identical rows: harmless
  * to the probe (candidates are DISTINCT per pair, self-pairs dropped)
  * and folded by [[compact]] — the at-least-once posture every store
  * here shares. Join strategy is shuffle_hash (the store side grows with
  * the corpus; never an estimate-dependent broadcast).
  *
  * Measured (AbFingerprintBench, interleaved min-of-N, 32 cores, WAV
  * corpus + a 1-in-50 near-copy batch): store-served check vs the
  * recompute-everything batch shape — 1.24 vs 1.56 s at sf0.1 and
  * 6.8 vs 20.4 s on the 10× replica: the recompute grows ~13× with the
  * corpus (every check re-decodes everything) while the store check
  * grows only with the batch (here 10× bigger too); at a FIXED batch
  * size the store check is O(1) in corpus growth — the pruned probe
  * reads only the batch's band buckets. */
object FingerprintStore {

  /** Partition-pruning bucket domain — [[NeardupStore.Buckets]]' rationale. */
  val Buckets = 64

  def fpPath(lake: String): String = s"$lake/media_fps"

  /** The replay watermark (last appended batch id + its lineage) — the
    * [[PostingsStore.Totals]] discipline without the additive totals:
    * a replayed batch id within the same lineage skips the append
    * entirely, and the probe excludes the batch's OWN stored rows, so
    * the dup-flag output of [[probeAppend]] is REPLAY-STABLE (ADVICE
    * r19: without the exclusion, a batch replayed after a
    * crash-after-append would flag its within-batch near-dups against
    * the first attempt's stored copies — flags the first run never
    * emitted). */
  private final case class Meta(lastBatchId: Long, lineage: String)

  private def metaPath(lake: String): java.nio.file.Path =
    java.nio.file.Paths.get(lake, "_fp_meta.json")

  private def loadMeta(lake: String): Option[Meta] = {
    val p = metaPath(lake)
    if (!java.nio.file.Files.exists(p)) None
    else {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(p))
      Some(Meta(root.get("last_batch_id").asLong(),
        root.get("lineage").asText()))
    }
  }

  private def saveMeta(lake: String, m: Meta): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("last_batch_id", m.lastBatchId)
    root.put("lineage", m.lineage)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(lake))
    val target = metaPath(lake)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp, mapper.writeValueAsString(root))
    try java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Decode an (id BIGINT, content BINARY) media frame ONCE and emit
    * (id, kind, ahash) — image/audio/video routed to their real decode
    * engines; payloads that decode no signal drop out.
    *
    * `scenes = true` (r20 — the at-ingest twin of the batch
    * q_video_neardup_scenes rung) additionally emits one `kind =
    * "scene"` row PER DECODED FRAME of each multi-frame payload
    * ([[Multimodal.sceneHashesOf]], the ONE per-frame spelling), still
    * within the same single decode pass. Scene rows match scene rows
    * only (the within-kind probe contract), so the first-frame flag
    * semantics are unchanged and scene matches — clips whose FIRST
    * frame was edited but that share a later scene — are strictly
    * additive. */
  def fingerprintsOf(
      media: DataFrame, s: SparkSession, scenes: Boolean = false): DataFrame = {
    import s.implicits._
    media.select(col("id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val base = fpOf(bytes).map { case (kind, h) => (id, kind, h) }
          if (!scenes) base.iterator
          else base.iterator ++
            Multimodal.sceneHashesOf(bytes).iterator.map(h => (id, "scene", h))
        }
      }.toDF("id", "kind", "ahash")
  }

  private def fpOf(bytes: Array[Byte]): Option[(String, Long)] =
    Multimodal.decodeImage(bytes).flatMap(d =>
        d.pixels.map(px =>
          ("image", Multimodal.aHash64(px, d.width.toInt, d.height.toInt))))
      .orElse(Multimodal.decodeAudio(bytes).map(d =>
        ("audio", Multimodal.audioHash64(d.frames.toArray.flatten))))
      .orElse(Multimodal.decodeVideo(bytes).flatMap(d =>
        d.pixels.map(px =>
          ("video", Multimodal.aHash64(px, d.width.toInt, d.height.toInt)))))

  private def bandsOf(fps: DataFrame): DataFrame = {
    val bandVals = (0 until 4).map(b =>
      shiftright(col("ahash"), 16 * b).bitwiseAND(lit(0xFFFFL)))
    fps.select(col("id"), col("kind"), col("ahash"),
        posexplode(array(bandVals: _*)).as(Seq("band_id", "band_val")))
      .withColumn("band_bucket", pmod(col("band_val"), lit(Buckets.toLong)))
  }

  /** Probe a batch's fingerprints ((id, kind, ahash) —
    * [[fingerprintsOf]]'s output) against ALREADY-STORED fingerprints:
    * (id, dup_of, hamming) for each batch row within hamming ≤
    * `maxHamming` of a stored row of the SAME kind (min dup_of on ties).
    * The store scan is statically pruned to the batch's band buckets.
    * Empty frame when the store does not exist yet.
    *
    * `excludeBatch = Some((lineage, batchId))` drops stored rows THIS
    * batch appended on a previous (crashed or replayed) attempt — the
    * replay-stability half of the keyed [[probeAppend]] contract: on the
    * first attempt the filter matches nothing, on a replay it removes
    * exactly the batch's own copies, so the flags are identical either
    * way. Rows from pre-watermark store files (no batch_id column, read
    * with schema merge) carry nulls and are always kept. */
  def probe(
      spark: SparkSession, lake: String, fps: DataFrame,
      maxHamming: Int = 6,
      excludeBatch: Option[(String, Long)] = None): DataFrame = {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "dup_of", "hamming")
    val stored = graft.ingest.Sink.readOrEmpty(spark, fpPath(lake), merge = true)
      .getOrElse(return empty)
    val store = excludeBatch match {
      case Some((lin, bid)) if stored.columns.contains("batch_id") =>
        stored.filter(!coalesce(
          col("lineage") === lit(lin) && col("batch_id") === lit(bid),
          lit(false)))
      case _ => stored
    }
    val batch = bandsOf(fps)
    // bounded by the 64-value partition domain, never by batch size —
    // the driver-side list is what turns the store scan into static
    // partition pruning (the NeardupStore idiom)
    val touched = batch.select("band_bucket").distinct().as[Long].collect()
    if (touched.isEmpty) return empty
    store.filter(col("band_bucket").isin(touched: _*))
      .select(col("kind"), col("band_id"), col("band_val"),
        col("id").as("dup_of"), col("ahash").as("sh"))
      .join(batch.hint("shuffle_hash"), Seq("kind", "band_id", "band_val"))
      .filter(col("id") =!= col("dup_of"))
      .select(col("id"), col("dup_of"), col("ahash"), col("sh"))
      .distinct() // one candidate per pair (bands collide repeatedly);
                  // also folds byte-identical replay rows in the store
      .withColumn("hamming", expr("cast(bit_count(ahash ^ sh) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id"))
      .agg(min_by(struct(col("dup_of"), col("hamming")), col("dup_of")).as("m"))
      .select(col("id"), col("m.dup_of").as("dup_of"), col("m.hamming").as("hamming"))
  }

  /** Append a batch's fingerprints to the store, stamped with the
    * batch's (lineage, batch_id) key so a replayed [[probeAppend]] can
    * skip it and exclude it from its probe. One narrow shuffle:
    * repartition on the partition key keeps files-per-batch = touched
    * buckets, not tasks × buckets. */
  def append(
      lake: String, fps: DataFrame,
      batchId: Long = -1L, lineage: String = "adhoc"): Unit =
    bandsOf(fps)
      .withColumn("batch_id", lit(batchId))
      .withColumn("lineage", lit(lineage))
      .repartition(col("band_bucket"))
      .write.mode("append").partitionBy("band_bucket").parquet(fpPath(lake))

  /** The per-batch composition — decode ONCE, probe BEFORE append
    * (nothing matches itself), then persist: returns the batch's dup
    * flags. The fingerprint frame is checkpointed so the decode cost is
    * paid exactly once across the probe and the append.
    *
    * `batchId >= 0` keys the batch under the lineage-scoped replay
    * watermark (the [[PostingsStore.appendBatch]] discipline, ADVICE
    * r19): a replayed batch id skips the append (no duplicate rows
    * even across a crash-after-append, whose only residue is the
    * pre-watermark double-append the probe's distinct and [[compact]]
    * already fold), and the probe excludes the batch's own stored rows,
    * so the returned flags are identical on every attempt. The default
    * `batchId = -1` keeps the unkeyed ad-hoc shape: always append, no
    * exclusion — callers replaying unkeyed batches may see within-batch
    * near-dups flagged on the replay (the documented weaker contract).
    * The meta save runs AFTER the append commits (the house ordering:
    * the one crash window between them replays into the duplicate-
    * tolerant store, never into a lost batch). */
  def probeAppend(
      spark: SparkSession, lake: String, media: DataFrame,
      maxHamming: Int = 6,
      batchId: Long = -1L, lineage: String = "adhoc",
      scenes: Boolean = false): DataFrame = {
    val keyed = batchId >= 0L
    val replayed = keyed && loadMeta(lake).exists(m =>
      m.lineage == lineage && batchId <= m.lastBatchId)
    val fps = fingerprintsOf(media, spark, scenes).localCheckpoint()
    val flags = probe(spark, lake, fps, maxHamming,
      excludeBatch = if (keyed) Some((lineage, batchId)) else None)
      .localCheckpoint() // materialize BEFORE the append mutates the store
    if (!replayed) {
      append(lake, fps, batchId, lineage)
      if (keyed) saveMeta(lake, Meta(batchId, lineage))
    }
    flags
  }

  /** Small-file + duplicate-row maintenance; same commit protocol and
    * terminated-stream contract as [[NeardupStore.compact]]. */
  def compact(spark: SparkSession, lake: String): Long =
    NeardupStore.compactTable(spark, fpPath(lake), "band_bucket")
}
