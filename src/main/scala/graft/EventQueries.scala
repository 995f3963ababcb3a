package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream operator surface: JSON extraction, time bucketing,
  * last-write-wins compaction and gap sessionization (SURVEY.md §2.8 F1/F7,
  * §2.10). These are the batch forms of the reference's incremental
  * semantics; the last-write-wins compaction also runs live in
  * [[graft.streaming.Streaming.lastWriteWins]] (`mapGroupsWithState`), and
  * the incremental record-compile path in
  * [[graft.streaming.Streaming.recordCompileStream]].
  *
  * `ts` arrives as epoch NANOS (LongType via nanosAsLong); all arithmetic is
  * integer microseconds (`ts_us`) to stay bit-identical with DuckDB's
  * nanos→micros truncating parquet reader.
  */
object EventQueries {

  private val SessionGapUs = 1800000000L // 30 min

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_json_extract_agg", Seq("F1", "P4", "A4"),
      (s, d) => Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy(col("k"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
        .orderBy("k"),
      Some("""SELECT CAST(props->>'$.k' AS BIGINT) AS k, count(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
              FROM events GROUP BY 1 ORDER BY k"""),
      "JSON path extraction + cast + aggregate (reference: querying-data.rst:62-77 `->>`/::numeric)"),

    QueryDef(
      "q_hourly_rollup", Seq("F7", "A1", "A2"),
      (s, d) => Tables.events(s, d)
        .withColumn("hour", date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd HH:00"))
        .groupBy(col("hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("hour", "event_type"),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
                     event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
              FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""),
      "Time bucketing + distinct users (monitoring rollup over the work stream)"),

    QueryDef(
      "q_compile_lastwins", Seq("A6", "W2"),
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").desc, col("event_id").desc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("user_id"),
            col("event_type").as("last_event_type"),
            col("value").as("last_value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, last_event_type, last_value FROM (
                SELECT user_id, event_type AS last_event_type, value AS last_value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) WHERE rn = 1
              ORDER BY user_id"""),
      "Last-write-wins per key in arrival order — the relational core of compile-releases (compiler.py:56-74)"),

    QueryDef(
      "q_sessionize", Seq("W1", "T9"),
      (s, d) => {
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("prev_us", lag(col("ts_us"), 1).over(wOrd))
          .withColumn(
            "is_new",
            when(col("prev_us").isNull || col("ts_us") - col("prev_us") > SessionGapUs, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("is_new")).over(wRun))
          .groupBy(col("user_id"))
          .agg(
            max(col("session_id")).as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      // CAST .. AS BIGINT: DuckDB's SUM(int) is HUGEINT — same values, but
      // the driver's hasher distinguishes int128 from int64 (r1 mismatch)
      Some(s"""SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
                      count(*) AS n_events FROM (
                 SELECT user_id,
                        SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > $SessionGapUs
                                 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                 FROM (
                   SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                          lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
                                                     ORDER BY epoch_us(ts), event_id) AS prev_us
                   FROM events))
               GROUP BY user_id ORDER BY user_id"""),
      "Gap-based sessionization (lag + running flag-sum) — streaming-state pattern in batch form"),

    QueryDef(
      "q_dedup_store", Seq("S8", "F5", "A2"),
      (s, d) => Tables.events(s, d)
        .groupBy(md5(col("props")).as("hash_md5"))
        .agg(
          count(lit(1)).as("n_refs"),
          min(col("event_id")).as("first_id"))
        .orderBy("hash_md5"),
      Some("""SELECT md5(props) AS hash_md5, count(*) AS n_refs, min(event_id) AS first_id
              FROM events GROUP BY 1 ORDER BY hash_md5"""),
      "Content-addressed dedup store: md5(blob) get-or-create (reference: util.py:93-110)")
  )
}
