package graft

import java.nio.file.Files
import java.time.{LocalDateTime, ZoneOffset}

import org.scalatest.funsuite.AnyFunSuite

/** Tables.events' encoding adaptation: the generator has shipped `ts`
  * as INT64 nanos (read as LongType under nanosAsLong) AND as
  * TIMESTAMP_NTZ across rounds, and the loader normalizes both to the
  * same BIGINT microseconds. The legs are data-dependent — only the
  * encoding the current testdata happens to use runs in the oracle
  * gate — so this pins BOTH against each other on the same instants
  * (incl. the ADVICE r10 fix: the NTZ leg casts via the TimestampType
  * OBJECT, immune to spark.sql.timestampType=NTZ making a string cast
  * a no-op). */
class TablesSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  test("events ts_us is identical across nanos-long and TIMESTAMP_NTZ encodings") {
    import s.implicits._
    val dir = Files.createTempDirectory("graft-tables").toString
    val micros = Seq(0L, 86_400_000_000L, 1_700_000_000_123_456L)
    micros.map(_ * 1000L).toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/nanos/events.parquet")
    micros.map(u => LocalDateTime.ofEpochSecond(
        u / 1_000_000L, ((u % 1_000_000L) * 1000L).toInt, ZoneOffset.UTC))
      .toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    // the NTZ frame must actually exercise the NTZ leg, not fall through
    import org.apache.spark.sql.types.TimestampNTZType
    assert(Tables.load(s, s"$dir/ntz", "events").schema("ts").dataType === TimestampNTZType)
    val a = Tables.events(s, s"$dir/nanos").select("ts_us").as[Long].collect().sorted.toSeq
    val b = Tables.events(s, s"$dir/ntz").select("ts_us").as[Long].collect().sorted.toSeq
    assert(a === micros.sorted)
    assert(b === micros.sorted)
  }
}
