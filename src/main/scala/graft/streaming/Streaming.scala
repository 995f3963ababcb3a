package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

import com.fasterxml.jackson.databind.node.ObjectNode

import graft.ocds.{Canonical, RecordCompile}

/** Structured-Streaming side of the engine (SURVEY.md §2 T1/T2/T4/T9;
  * reference: the always-on RabbitMQ dataflow of the
  * `process/management/commands` workers).
  *
  * Two reference semantics matter here:
  *
  *  - **Record packages compile per-file immediately, while the collection
  *    is still loading** (`compiler.py:146-148`): rendered as a file-source
  *    stream over a landing directory with `foreachBatch` — every
  *    micro-batch's records are decision-treed and persisted as they
  *    arrive, no end-of-collection barrier. Exactly-once comes from the
  *    checkpoint + an idempotent sink (each batch owns and overwrites its
  *    own output partition on replay), replacing the reference's
  *    at-least-once queue + dedup errback (T1/T2).
  *  - **Last-write-wins key state** (the core of compile, W2) as live
  *    state: `mapGroupsWithState` keeps one latest-value state per key —
  *    the streaming form of the batch `row_number() = 1` compaction.
  *
  * The landing format is concatenated JSON (one record per line) — one of
  * the reference's physical shapes (S3) — so each streamed value costs
  * O(item) memory, consistent with the batch ingest bound.
  */
object Streaming {

  /** One streamed record's compile outcome. */
  final case class RecordOutcome(
      ocid: String, outcome: String, compiled_id: String, batch_id: Long)

  /** T4 record-package path: compile each micro-batch of landed records
    * immediately and persist the outcomes under `outDir`, partitioned by
    * batch id. The write is IDEMPOTENT — a replayed batch (crash between
    * the sink write and the checkpoint commit) dynamically overwrites its
    * own `batch_id=` partition instead of appending duplicates, which is
    * what upgrades the checkpoint's at-least-once replay to effective
    * exactly-once. A malformed landed line (truncated file, blank line)
    * yields a `malformed` outcome row rather than poisoning the batch
    * forever — the reference marks the file failed and continues. */
  def recordCompileStream(
      spark: SparkSession, landingDir: String, outDir: String,
      checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    spark.readStream
      .format("text")
      .load(landingDir)
      .as[String]
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[String], batchId: Long) =>
        val outcomes = batch.mapPartitions { it =>
          it.flatMap { line =>
            val parsed =
              try Some(Canonical.parse(line))
              catch { case _: Exception => None }
            parsed match {
              case None if line.trim.isEmpty => None // blank separator lines
              case None =>
                Some(RecordOutcome("", "malformed", null, batchId))
              case Some(node) if !node.isObject => None
              case Some(node) =>
                val rec = node.asInstanceOf[ObjectNode]
                val ocid = Option(rec.get("ocid")).filter(_.isTextual)
                  .map(_.asText).getOrElse("")
                val d = RecordCompile.decide(ocid, rec)
                Some(RecordOutcome(
                  ocid, d.outcome,
                  d.compiled.flatMap(c => Option(c.get("id")).map(_.asText)).orNull,
                  batchId))
            }
          }
        }
        outcomes.write
          .partitionBy("batch_id")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite")
          .parquet(outDir)
        () // Unit-returning VoidFunction2 overload
      }
      .start()
  }

  /** S6/T1 release-package path — the api_loader's dataflow
    * (`api_loader.py:28-50`: Collect announces a stored file, the loader
    * registers it and the file_worker loads it) as a Structured Streaming
    * query over a landing directory: each micro-batch's NEW files are
    * registered into the control plane and stream-loaded into the lake by
    * [[graft.Pipeline.loadFilesInto]] (the same engine the batch load
    * runs), with the plane persisted after every batch.
    *
    * Exactly-once is FILE-granular and needs no transactional store:
    * a file's facts land through one Spark write job (atomic commit — a
    * crashed job leaves nothing visible), so "this file's rows are already
    * in the lake" is a reliable idempotence key. Each batch anti-checks
    * arrived paths against the lake's loaded filenames before loading —
    * a checkpoint replay (crash between sink write and checkpoint commit)
    * re-offers the same files and skips them all. This is the reference's
    * at-least-once queue + unique-constraint dedup errback (T1),
    * re-expressed as lake-state dedup.
    *
    * The file source is `binaryFile` pruned to `path` — the stream carries
    * file ARRIVALS, not contents (a queue source in a real deployment);
    * the loader re-opens each file executor-side with the O(item)-memory
    * item reader. */
  def releaseLoadStream(
      spark: SparkSession,
      landingDir: String,
      lakeDir: String,
      collectionId: Long,
      upgradedId: Option[Long],
      plane: java.util.concurrent.atomic.AtomicReference[graft.control.Control.Plane],
      checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    // the binaryFile source's fixed schema, declared explicitly (streaming
    // sources don't infer); only `path` is ever read
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    spark.readStream
      .format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.json")
      .load(landingDir)
      .select($"path")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // collect(): file ARRIVALS are control-plane-sized (paths, not data)
        val arrived = batch.select("path").as[String].collect().toSeq.sorted
        val lakePath = new java.io.File(s"$lakeDir/release")
        val loaded: Set[String] =
          if (!lakePath.exists()) Set.empty
          else spark.read.parquet(lakePath.toString)
            .filter($"collection_id" === collectionId)
            .select("filename").distinct().as[String].collect().toSet
        val fresh = arrived.filterNot(loaded)
        var p = plane.get()
        if (fresh.nonEmpty) {
          val (p2, _, _) = graft.Pipeline.loadFilesInto(
            spark, fresh, lakeDir, p, collectionId, upgradedId)
          p = p2
        }
        // a replayed file whose facts ARE in the lake but whose plane rows
        // were lost (crash between the lake write and the plane save) must
        // still be registered, or the close-time expected-files gate counts
        // it missing forever; registerFile is idempotent, so this is a
        // no-op for files the plane already tracks
        for (f <- arrived.filter(loaded); cid <- collectionId +: upgradedId.toSeq) {
          p = graft.control.Control.registerFile(p, cid, f)
          p = graft.control.Control.completeStep(
            p, cid, graft.control.Control.StepName.Load, Some(f))
        }
        if (p ne plane.get()) {
          plane.set(p)
          graft.control.PlaneStore.save(lakeDir, p)
        }
        ()
      }
      .start()
  }

  /** A timestamped event for windowed aggregation. */
  final case class TimedEvent(key: String, ts: java.sql.Timestamp)

  /** T9 extension (SURVEY §2.10: "if we add streaming windows they're
    * built-ins"): watermarked tumbling-window counts per key. The
    * watermark bounds state — windows older than (max event time −
    * `watermark`) finalize, emit (in append mode) and drop their state,
    * so the query runs forever in bounded memory. The reference has no
    * analogue (it buffers everything until an explicit close); this is
    * the monitoring-rollup (q_hourly_rollup) as a live query. */
  def windowedCounts(
      events: Dataset[TimedEvent],
      window: String = "1 hour",
      watermark: String = "10 minutes"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{functions => F}
    events.toDF()
      .withWatermark("ts", watermark)
      .groupBy(F.window(F.col("ts"), window), F.col("key"))
      .count()
      .select(F.col("window.start").as("window_start"), F.col("key"), F.col("count").as("n"))
  }

  /** An event for the stateful compaction. */
  final case class KeyedEvent(key: String, seq: Long, value: String)

  /** The latest value per key (the streaming W2 state row). */
  final case class Latest(key: String, seq: Long, value: String, n_seen: Long)

  /** W2/T9 as live state: one `Latest` per key, updated as events arrive;
    * later `seq` wins, ties keep the earlier arrival. Emits the key's new
    * state each time it changes (use outputMode "update"). */
  def lastWriteWins(events: Dataset[KeyedEvent]): Dataset[Latest] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedEvent], state: GroupState[Latest]) =>
          val prev = state.getOption
          var latest = prev
          var seen = prev.map(_.n_seen).getOrElse(0L)
          rows.foreach { e =>
            seen += 1
            if (latest.forall(_.seq < e.seq))
              latest = Some(Latest(key, e.seq, e.value, seen))
          }
          val out = latest.map(_.copy(n_seen = seen))
            .getOrElse(Latest(key, Long.MinValue, null, seen))
          state.update(out)
          out
      }
  }
}
