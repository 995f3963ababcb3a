package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** graft.streaming semantics: incremental record-compile per micro-batch
  * (T4's record-package path, `compiler.py:146-148`) with checkpointed
  * resume, and last-write-wins key state via mapGroupsWithState (W2/T9). */
class StreamingSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def record(ocid: String, date: String): String =
    s"""{"ocid":"$ocid","releases":[{"ocid":"$ocid","id":"$ocid-r","date":"$date","tag":["planning"]}]}"""

  test("record packages compile per micro-batch as files land; checkpoint resumes") {
    val base = Files.createTempDirectory("graft-stream")
    val landing = Files.createDirectory(base.resolve("landing"))
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString

    def runOnce(): Unit = {
      val q = Streaming.recordCompileStream(s, landing.toString, out, ckpt)
      q.awaitTermination() // AvailableNow: drains what has landed, stops
    }

    Files.writeString(landing.resolve("f1.jsonl"),
      record("ocds-1", "2020-01-01") + "\n" + record("ocds-2", "2020-01-02") + "\n")
    runOnce()

    val after1 = s.read.parquet(out)
    assert(after1.count() === 2) // compiled BEFORE the collection is closed

    // a malformed line must not poison the batch (the reference marks the
    // file failed and continues); it surfaces as a `malformed` outcome row
    Files.writeString(landing.resolve("f2.jsonl"),
      record("ocds-3", "2020-01-03") + "\n{\"truncat\n")
    runOnce()

    import s.implicits._
    val all = s.read.parquet(out)
      .select("ocid", "outcome", "compiled_id", "batch_id")
      .as[(String, String, String, Long)].collect()
    val bad = all.filter(_._2 == "malformed")
    assert(bad.length === 1 && bad.head._1 === "") // surfaced, not fatal
    val rows = all.filterNot(_._2 == "malformed").sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq("ocds-1", "ocds-2", "ocds-3"))
    assert(rows.forall(_._2 == "merged"))
    assert(rows.map(_._3).toSeq === Seq(
      "ocds-1-2020-01-01", "ocds-2-2020-01-02", "ocds-3-2020-01-03"))
    // the restarted query continued from the checkpoint: new batch id,
    // and the first batch's rows were NOT reprocessed (counts prove it)
    assert(rows.map(_._4).distinct.length === 2)
  }

  test("windowedCounts finalizes watermark-expired windows in bounded state (T9)") {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ev(key: String, minute: Int) =
      Streaming.TimedEvent(key, java.sql.Timestamp.valueOf(f"2020-01-01 10:$minute%02d:00"))
    val input = MemoryStream[Streaming.TimedEvent]
    val q = Streaming.windowedCounts(input.toDS(), window = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append").format("memory").queryName("wc").start()

    input.addData(ev("a", 1), ev("a", 4), ev("b", 7))
    q.processAllAvailable() // nothing finalized: watermark at 10:02
    assert(s.table("wc").count() === 0)

    // an event at 10:31 moves the watermark to 10:26 → both earlier
    // 10-minute windows close and emit; their state is dropped
    input.addData(ev("a", 31))
    q.processAllAvailable()
    val rows = s.table("wc")
      .select("window_start", "key", "n")
      .as[(java.sql.Timestamp, String, Long)].collect()
      .map { case (w, k, n) => (w.toString, k, n) }.sortBy(r => (r._1, r._2))
    assert(rows.toSeq === Seq(
      ("2020-01-01 10:00:00.0", "a", 2L),
      ("2020-01-01 10:00:00.0", "b", 1L)))
    q.stop()
  }

  test("lastWriteWins keeps latest per key across batches; late data never regresses (T9)") {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[Streaming.KeyedEvent]
    val q = Streaming.lastWriteWins(input.toDS())
      .writeStream.outputMode("update").format("memory").queryName("lww").start()

    input.addData(
      Streaming.KeyedEvent("k1", 1, "v1"),
      Streaming.KeyedEvent("k1", 3, "v3"),
      Streaming.KeyedEvent("k2", 2, "v2"))
    q.processAllAvailable()
    input.addData(Streaming.KeyedEvent("k1", 2, "late")) // late arrival
    q.processAllAvailable()

    val latest = s.table("lww")
      .groupBy("key").agg(org.apache.spark.sql.functions.max_by(
        org.apache.spark.sql.functions.struct("seq", "value", "n_seen"),
        org.apache.spark.sql.functions.col("n_seen")).as("st"))
      .select("key", "st.seq", "st.value", "st.n_seen")
      .as[(String, Long, String, Long)].collect().sortBy(_._1)
    assert(latest === Array(("k1", 3L, "v3", 3L), ("k2", 2L, "v2", 1L)))
    q.stop()
  }
}
