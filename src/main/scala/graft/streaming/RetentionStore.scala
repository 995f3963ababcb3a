package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Persistent cohort-retention MATRIX — the keyed downstream sink that
  * folds [[Streaming.retentionProgress]]'s signed (cohort, offset)
  * deltas into a lake table (VERDICT r19 Next #5: the claim "a
  * downstream keyed sink maintains the exact matrix" as an artifact,
  * not architecture). The matrix is the exact
  * [[graft.EventQueries.retentionOf]] readout over every event the
  * stream has folded — late re-cohorts included, because the deltas
  * retract moved pairs — kept current per micro-batch.
  *
  * Exactly-once shape (the additive-store problem: a signed fold is NOT
  * duplicate-tolerant, so the postings-style "dup rows + watermarked
  * totals" split doesn't apply): each fold writes the new matrix into a
  * VERSIONED directory (`matrix_b<batchId>`), derived deterministically
  * from the PREVIOUS meta pointer's matrix plus this batch's deltas,
  * and then atomically swaps the `_retention_meta.json` pointer (tmp +
  * ATOMIC_MOVE — the PlaneStore idiom). The pointer swap IS the commit:
  * a crash after the directory write but before the swap replays the
  * batch, which recomputes the SAME directory from the SAME inputs and
  * swaps once; a replayed batch at-or-below the lineage-scoped
  * watermark is a full no-op. Superseded directories are
  * garbage-collected after the swap (best-effort — a reader that
  * resolved the old pointer mid-fold retries through [[matrix]]).
  *
  * Scale shape: the fold reads matrix + batch deltas — the matrix is
  * bounded by (cohorts × offsets), calendar-sized, never event-sized,
  * so the per-batch cost is O(batch) + O(calendar²) regardless of
  * corpus scale. */
object RetentionStore {

  private final case class Meta(lastBatchId: Long, lineage: String, dir: String)

  private def metaPath(store: String) = Paths.get(store, "_retention_meta.json")

  private def loadMeta(store: String): Option[Meta] = {
    val p = metaPath(store)
    if (!Files.exists(p)) None
    else {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readString(p))
      Some(Meta(root.get("last_batch_id").asLong(),
        root.get("lineage").asText(), root.get("dir").asText()))
    }
  }

  private def saveMeta(store: String, m: Meta): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("last_batch_id", m.lastBatchId)
    root.put("lineage", m.lineage)
    root.put("dir", m.dir)
    Files.createDirectories(Paths.get(store))
    val target = metaPath(store)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, mapper.writeValueAsString(root))
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def emptyMatrix(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Long)].toDF("cohort", "offset", "n_users")
  }

  /** THE reader: the current matrix ((cohort, offset, n_users), every
    * n_users > 0) — resolves the committed pointer and reads that
    * directory. Empty frame before the first fold. */
  def matrix(spark: SparkSession, store: String): DataFrame =
    loadMeta(store) match {
      case None => emptyMatrix(spark)
      case Some(m) =>
        graft.ingest.Sink.readOrEmpty(spark, s"$store/${m.dir}")
          .getOrElse(emptyMatrix(spark))
    }

  /** Fold one batch of signed deltas ((cohort, offset, delta) columns —
    * [[Streaming.RetentionDelta]]'s shape, user_id ignored) into the
    * committed matrix under the lineage-scoped watermark. Returns false
    * when the batch id was already folded (replay no-op). */
  def foldBatch(
      spark: SparkSession, store: String, deltas: DataFrame,
      batchId: Long, lineage: String = "adhoc"): Boolean = {
    val meta = loadMeta(store)
    if (meta.exists(m => m.lineage == lineage && batchId <= m.lastBatchId))
      return false
    val agg = deltas
      .groupBy(col("cohort"), col("offset"))
      .agg(sum(col("delta")).cast(LongType).as("n_users"))
    val folded = matrix(spark, store)
      .unionByName(agg)
      .groupBy(col("cohort"), col("offset"))
      .agg(sum(col("n_users")).cast(LongType).as("n_users"))
      .filter(col("n_users") =!= 0L)
    val dirName = s"matrix_b$batchId"
    folded.coalesce(1).write.mode("overwrite").parquet(s"$store/$dirName")
    saveMeta(store, Meta(batchId, lineage, dirName))
    // GC superseded versions AFTER the pointer swap (best-effort)
    val base = Paths.get(store)
    if (Files.isDirectory(base)) {
      val listing = Files.list(base)
      try {
        val it = listing.iterator()
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (n.startsWith("matrix_b") && n != dirName)
            scala.util.Try {
              import scala.jdk.CollectionConverters._
              val w = Files.walk(p)
              try w.iterator().asScala.toSeq.reverse.foreach(Files.delete)
              finally w.close()
            }
        }
      } finally listing.close()
    }
    true
  }
}
