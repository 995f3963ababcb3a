package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.check.Checker

/** Structural-check query surface (SURVEY.md §2 V1; reference checker.py).
  *
  * The driver's tables carry no OCDS documents, so release packages are
  * SYNTHESIZED from `events` with five deterministically-injected defect
  * classes, one per row at most (if/else on k mods, so each class's count is
  * a pure predicate count the DuckDB oracle re-derives relationally):
  * k%5=0 drops the required `date`; else k%7=0 types `date` as a number;
  * else k%11=0 uses a non-codelist `initiationType`; else k%13=0 blanks
  * `ocid` (minLength); else k%17=0 sends a date-only string where date-time
  * is required (format). A green hash checks the whole V1 path: repackaging
  * into the envelope, schema compile/cache, recursive validation, error
  * paths, and the aggregation over the exploded error rows.
  */
object CheckQueries {

  /** The defect-injected release rows shared by the check queries (and
    * AbCheckBloomBench, so the A/B measures what ships). */
  private[graft] def defectRows(s: org.apache.spark.sql.SparkSession, d: String) = {
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    val isReq = k % 5 === 0
    val isType = !isReq && (k % 7 === 0)
    val isEnum = !isReq && !isType && (k % 11 === 0)
    val isMinLen = !isReq && !isType && !isEnum && (k % 13 === 0)
    val isFmt = !isReq && !isType && !isEnum && !isMinLen && (k % 17 === 0)
    val ocidStr = when(isMinLen, lit("")).otherwise(concat(lit("ocds-"), col("user_id")))
    val dateFrag = when(isReq, lit(""))
      .when(isType, lit("\"date\":123,"))
      .when(isFmt, lit("\"date\":\"2020-01-02\","))
      .otherwise(lit("\"date\":\"2020-01-02T03:04:05Z\","))
    val initType = when(isEnum, lit("direct")).otherwise(lit("tender"))
    // fanOut below the projection: the validator costs ~10 µs/row; the
    // single-row-group scan would otherwise check on one core
    Tables.fanOut(Tables.events(s, d)).select(
      col("event_id").as("id"),
      concat(
        lit("{\"ocid\":\""), ocidStr,
        lit("\",\"id\":\""), col("event_id").cast(StringType), lit("\","),
        dateFrag,
        lit("\"tag\":[\"planning\"],\"initiationType\":\""), initType, lit("\"}")
      ).as("data"),
      concat(
        lit("{\"uri\":\"http://example.org/"), col("event_id").cast(StringType),
        lit("\",\"publishedDate\":\"2020-01-01T00:00:00Z\","),
        lit("\"publisher\":{\"name\":\"P\"},\"version\":\"1.1\"}")
      ).as("package_data"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_check_releases", Seq("V1", "A1", "P3"),
      (s, d) =>
        Checker.checkErrors(defectRows(s, d), "release", s)
          .toDF()
          .groupBy(col("path"), col("kind"))
          .agg(count(lit(1)).as("n"))
          .orderBy("path", "kind"),
      Some("""WITH c AS (
                SELECT CASE WHEN k % 5 = 0 THEN 'required'
                            WHEN k % 7 = 0 THEN 'type'
                            WHEN k % 11 = 0 THEN 'enum'
                            WHEN k % 13 = 0 THEN 'minLength'
                            WHEN k % 17 = 0 THEN 'format'
                            ELSE 'ok' END AS kind
                FROM (SELECT CAST(props->>'$.k' AS BIGINT) AS k FROM events))
              SELECT CASE kind WHEN 'minLength' THEN 'releases/0/ocid'
                               WHEN 'enum' THEN 'releases/0/initiationType'
                               ELSE 'releases/0/date' END AS path,
                     kind, count(*) AS n
              FROM c WHERE kind <> 'ok'
              GROUP BY 1, 2 ORDER BY path, kind"""),
      "Structural checks (V1): repackage each stored release into its envelope, validate " +
        "against the vendored OCDS 1.1.5 standard, aggregate exploded validation errors by " +
        "path+kind; oracle re-derives each defect class as a predicate count"),

    QueryDef(
      "q_check_incremental", Seq("V1", "J3", "A1"),
      (s, d) => {
        // addchecks.py:38-45: rows with event_id % 3 == 0 are 'already
        // checked'; the job left-anti-joins them away and validates only
        // the remainder, summarizing to one row.
        // Negative A/B, so it is not retried (AbCheckBloomBench, r14):
        // routing definitely-new rows past the anti-join with a bounded
        // bloom_agg prefilter measured 6.2x WORSE at sf0.1 (0.84 -> 5.24
        // s interleaved min-of-5) — the two-branch union recomputes the
        // payload projection per branch and splits one codegen'd
        // pipeline, costing far more than the payload shuffle it saves
        val existing = Tables.events(s, d)
          .filter(col("event_id") % 3 === 0)
          .select(col("event_id").as("id"))
        Checker.checkUnchecked(defectRows(s, d), existing, "release", s)
          .toDF()
          .agg(
            count(lit(1)).as("n_checked"),
            sum(when(col("ok"), 0L).otherwise(1L)).as("n_failed"),
            sum(col("n_errors")).as("n_errors"))
          .select(col("n_checked"), col("n_failed"), col("n_errors"))
      },
      Some("""WITH c AS (
                SELECT CASE WHEN k % 5 = 0 THEN 1 WHEN k % 7 = 0 THEN 1
                            WHEN k % 11 = 0 THEN 1 WHEN k % 13 = 0 THEN 1
                            WHEN k % 17 = 0 THEN 1 ELSE 0 END AS defect
                FROM (SELECT CAST(props->>'$.k' AS BIGINT) AS k FROM events
                      WHERE event_id % 3 <> 0))
              SELECT count(*) AS n_checked,
                     CAST(sum(defect) AS BIGINT) AS n_failed,
                     CAST(sum(defect) AS BIGINT) AS n_errors
              FROM c"""),
      "Incremental checks (addchecks.py:38-45): LEFT ANTI against the existing check " +
        "table's ids, then validate only the unchecked remainder; each injected defect " +
        "class yields exactly one error, so failures == errors"),

    QueryDef(
      "q_check_records", Seq("V1", "A1", "P3"),
      (s, d) => {
        // record-package checks against the vendored 1.1.5 record schema,
        // four deterministically-injected defect classes (if/else on k
        // mods, one per row at most): k%5=0 drops required `releases`;
        // else k%7=0 makes releases a bare-int list failing BOTH oneOf
        // branches; else k%11=0 embeds a compiledRelease without its
        // required date (exercises the cross-document ref into the full
        // release schema); else k%13=0 breaks the package version pattern;
        // else a valid linked-release record
        val k = get_json_object(col("props"), "$.k").cast(LongType)
        val isReq = k % 5 === 0
        val isOneOf = !isReq && (k % 7 === 0)
        val isCrDate = !isReq && !isOneOf && (k % 11 === 0)
        val isVer = !isReq && !isOneOf && !isCrDate && (k % 13 === 0)
        val releasesFrag = when(isReq, lit(""))
          .when(isOneOf, lit(""""releases":[7],"""))
          .otherwise(lit(
            """"releases":[{"url":"http://x/r","date":"2020-01-02T03:04:05Z","tag":["tender"]}],"""))
        val crFrag = when(isCrDate, lit(
          """"compiledRelease":{"ocid":"ocds-r","id":"c","tag":["compiled"],"initiationType":"tender"},"""))
          .otherwise(lit(""))
        val rows = Tables.fanOut(Tables.events(s, d)).select(
          col("event_id").as("id"),
          concat(
            lit("{"), releasesFrag, crFrag,
            lit("\"ocid\":\"ocds-"), col("user_id"), lit("\"}")).as("data"),
          concat(
            lit("{\"uri\":\"http://example.org/"), col("event_id").cast(StringType),
            lit("\",\"publishedDate\":\"2020-01-01T00:00:00Z\","),
            lit("\"publisher\":{\"name\":\"P\"},\"version\":\""),
            when(isVer, lit("v1")).otherwise(lit("1.1")), lit("\"}")).as("package_data"))
        Checker.checkErrors(rows, "record", s)
          .toDF()
          .groupBy(col("path"), col("kind"))
          .agg(count(lit(1)).as("n"))
          .orderBy("path", "kind")
      },
      Some("""WITH c AS (
                SELECT CASE WHEN k % 5 = 0 THEN 'required'
                            WHEN k % 7 = 0 THEN 'oneOf'
                            WHEN k % 11 = 0 THEN 'crdate'
                            WHEN k % 13 = 0 THEN 'pattern'
                            ELSE 'ok' END AS cls
                FROM (SELECT CAST(props->>'$.k' AS BIGINT) AS k FROM events))
              SELECT CASE cls WHEN 'required' THEN 'records/0/releases'
                              WHEN 'oneOf' THEN 'records/0/releases'
                              WHEN 'crdate' THEN 'records/0/compiledRelease/date'
                              ELSE 'version' END AS path,
                     CASE cls WHEN 'crdate' THEN 'required' ELSE cls END AS kind,
                     count(*) AS n
              FROM c WHERE cls <> 'ok'
              GROUP BY 1, 2 ORDER BY path, kind"""),
      "Record-package checks (V1 over the record schema): required/oneOf on the releases " +
        "list, cross-document ref into the full release schema for compiledRelease, package " +
        "version pattern; oracle re-derives each class as a predicate count")
  )
}
