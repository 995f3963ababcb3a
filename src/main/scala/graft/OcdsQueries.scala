package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ocds.Compile

/** OCDS compile-releases wired into Spark (SURVEY.md §2 A6/A7 — the
  * reference's flagship transform, `process/processors/compiler.py:21-114`).
  *
  * The driver's tables carry no OCDS documents, so releases are SYNTHESIZED
  * deterministically from `events`: one release per event, ocid per user,
  * date = zero-padded epoch-micros (lexicographic == numeric order, exactly
  * the reference's ISO-string ordering semantics), scalar fields under
  * `tender.*` (exercises last-write-wins), and id-keyed `parties`/`awards`
  * arrays (exercises id-merge + duplicate-id warnings). The DuckDB oracle
  * recomputes the same semantics relationally (window functions), so a green
  * hash-match checks the WHOLE engine: flatten, id-keyed array merge,
  * last-write-wins, date/id synthesis, warning emission.
  *
  * Fine-grained merge semantics (nulls, nested arrays, whole-list merge,
  * non-object releases) are pinned by the MergeSpec goldens ported from
  * `tests/processors/test_compiler.py`.
  */
object OcdsQueries {

  /** One synthetic OCDS release per event.
    * Columns: ocid, date, tiebreak, release (JSON text). */
  private def releasesFromEvents(s: SparkSession, d: String, dupIds: Boolean): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    val parties =
      if (dupIds)
        array(
          struct((k % 5).as("id"), concat(lit("P"), k % 5).as("name")),
          struct((k % 3).as("id"), concat(lit("P"), k % 3).as("name")))
      else
        array(struct((k % 5).as("id"), concat(lit("P"), k % 5).as("name")))
    val awards =
      if (dupIds)
        array(
          struct((k % 7).as("id"), lit("active").as("status")),
          struct((k % 2).as("id"), lit("active").as("status")))
      else
        array(struct((k % 7).as("id"), lit("active").as("status")))
    Tables.events(s, d).select(
      concat(lit("ocds-"), col("user_id")).as("ocid"),
      lpad(col("ts_us").cast(StringType), 20, "0").as("date"),
      col("event_id").as("tiebreak"),
      to_json(struct(
        lpad(col("ts_us").cast(StringType), 20, "0").as("date"),
        col("event_id").cast(StringType).as("id"),
        struct(
          col("event_type").as("status"),
          struct(col("value").as("amount")).as("value")).as("tender"),
        parties.as("parties"),
        awards.as("awards"))).as("release"))
  }

  /** Shared oracle prelude: the same synthesized releases, relationally. */
  private val OracleRel =
    """SELECT 'ocds-' || CAST(user_id AS VARCHAR) AS ocid,
              event_id,
              lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') AS rdate,
              event_type, value,
              CAST(props->>'$.k' AS BIGINT) AS k
       FROM events"""

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_compile_ocds", Seq("A6", "W1", "O1", "F8", "J8"),
      (s, d) => Compile.summaries(releasesFromEvents(s, d, dupIds = false), s)
        .toDF()
        .orderBy("ocid"),
      Some(s"""WITH r AS ($OracleRel),
               w AS (SELECT ocid, event_id, rdate, event_type, value, k % 5 AS party,
                            row_number() OVER (PARTITION BY ocid
                                               ORDER BY rdate DESC, event_id DESC) AS rn,
                            CASE WHEN rdate = lag(rdate) OVER (PARTITION BY ocid
                                                               ORDER BY rdate, event_id)
                                 THEN 1 ELSE 0 END AS rep
                     FROM r)
               SELECT ocid,
                      ocid || '-' || max(rdate) AS compiled_id,
                      max(rdate) AS max_date,
                      max(CASE WHEN rn = 1 THEN event_type END) AS tender_status,
                      max(CASE WHEN rn = 1 THEN value END) AS tender_amount,
                      count(DISTINCT party) AS n_parties,
                      count(*) AS n_releases,
                      CAST(sum(rep) AS BIGINT) AS n_warnings
               FROM w GROUP BY ocid ORDER BY ocid"""),
      "Compile-releases flagship: per-ocid sorted merge via graft.ocds.Merge inside one shuffle + narrow pass; oracle recomputes last-write-wins/id-merge relationally"),

    QueryDef(
      "q_compile_warnings", Seq("A7", "A1"),
      (s, d) => Compile.warnings(releasesFromEvents(s, d, dupIds = true), s)
        .toDF()
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n"))
        .orderBy("path"),
      Some(s"""WITH r AS ($OracleRel),
               d AS (SELECT CASE WHEN rdate = lag(rdate) OVER (PARTITION BY ocid
                                                               ORDER BY rdate, event_id)
                                 THEN 1 ELSE 0 END AS rep
                     FROM r)
               SELECT path, n FROM (
                 SELECT 'parties' AS path, count(*) AS n FROM r WHERE k % 5 = k % 3
                 UNION ALL
                 SELECT 'awards' AS path, count(*) AS n FROM r WHERE k % 7 = k % 2
                 UNION ALL
                 SELECT '(date)' AS path, CAST(coalesce(sum(rep), 0) AS BIGINT) AS n FROM d)
               WHERE n > 0 ORDER BY path"""),
      "Warning aggregation by path (A7): duplicate-id + repeated-date side-outputs of the merge, grouped per JSON path (compiler.py:154-165)")
  )
}
