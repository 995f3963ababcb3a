package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ingest.{FormatDetect, Ingest}

/** Driver-checked coverage for the ingest family (SURVEY.md §2 S3/S5/S8
  * item side; VERDICT r3 noted S2-S5 had only ScalaTest goldens).
  *
  * Release packages are SYNTHESIZED as JSON text from `events` — each row
  * becomes a single-file package whose first release is written in
  * CANONICAL form (sorted keys, string values only) with an embedded
  * literal backslash-u0000 escape, and whose second release carries no
  * ocid. Extraction must: stream items out of the package, scrub the
  * escape (S5), skip the ocid-less release (`file_worker.py:346-348`), and
  * take the content hash over the canonical text (S8). The DuckDB oracle
  * reconstructs the expected post-scrub canonical string per event and
  * hashes it — a green hash pins the entire reader+scrub+hash path.
  */
object IngestQueries {

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_ingest_items", Seq("S3", "S5", "S8", "F5", "P5"),
      (s, d) => {
        val eid = col("event_id").cast(StringType)
        val u = col("user_id").cast(StringType)
        val dstr = lpad(col("ts_us").cast(StringType), 20, "0")
        val nul = "\\" + "u0000" // the literal 6-char escape, built so the
        // compiler never sees a \u sequence
        val r1 = concat(
          lit("{\"date\":\""), dstr,
          lit("\",\"id\":\""), eid,
          lit("\",\"note\":\"ab" + nul + "cd\",\"ocid\":\"ocds-"), u, lit("\"}"))
        // fanOut below the projection: the streaming item reader + scrub +
        // md5 is per-row engine CPU on an otherwise single-task scan
        val texts = Tables.fanOut(Tables.events(s, d)).select(
          eid.as("filename"),
          concat(
            lit("{\"publisher\":{\"name\":\"P\"},\"releases\":["), r1,
            lit(",{\"id\":\"x\"}],\"uri\":\"u"), eid, lit("\"}")).as("text"))
        val dt = FormatDetect.DataType(
          FormatDetect.Format.ReleasePackage, concatenated = false, array = false)
        Ingest.itemsFromText(texts, dt, s)
          .toDF()
          .select("filename", "ocid", "release_id", "release_date", "hash_md5")
          .orderBy("filename")
      },
      Some("""SELECT CAST(event_id AS VARCHAR) AS filename,
                     'ocds-' || CAST(user_id AS VARCHAR) AS ocid,
                     CAST(event_id AS VARCHAR) AS release_id,
                     lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') AS release_date,
                     md5('{"date":"' || lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                          || '","id":"' || CAST(event_id AS VARCHAR)
                          || '","note":"abcd","ocid":"ocds-'
                          || CAST(user_id AS VARCHAR) || '"}') AS hash_md5
              FROM events ORDER BY filename"""),
      "Streaming item extraction (S3) + control-code scrub (S5) + content hash (S8): " +
        "one synthesized single-release package per event; the ocid-less second release " +
        "is skipped; oracle reconstructs the post-scrub canonical text and re-hashes"),

    QueryDef(
      "q_ingest_records", Seq("S3", "S7", "A9"),
      (s, d) => {
        // the record-package ROUTE of the load (`file_worker.py:351-360`
        // Record rows): one synthesized single-record package per event,
        // extracted through the records.item data key with its in-file
        // sequence — the deterministic order the per-ocid record compile
        // elects its first record by
        val eid = col("event_id").cast(StringType)
        val u = col("user_id").cast(StringType)
        val dstr = lpad(col("ts_us").cast(StringType), 20, "0")
        val rel = concat(
          lit("{\"date\":\""), dstr, lit("\",\"id\":\""), eid,
          lit("\",\"ocid\":\"ocds-"), u, lit("\",\"tag\":[\"tender\"]}"))
        val record = concat(
          lit("{\"ocid\":\"ocds-"), u, lit("\",\"releases\":["), rel, lit("]}"))
        val texts = Tables.fanOut(Tables.events(s, d)).select(
          eid.as("filename"),
          concat(lit("{\"publisher\":{\"name\":\"P\"},\"records\":["), record,
            lit("],\"uri\":\"u"), eid, lit("\"}")).as("text"))
        val dt = FormatDetect.DataType(
          FormatDetect.Format.RecordPackage, concatenated = false, array = false)
        Ingest.recordsFromText(texts, dt, s)
          .toDF()
          .select("filename", "ocid", "record_seq", "hash_md5")
          .orderBy("filename")
      },
      Some("""SELECT CAST(event_id AS VARCHAR) AS filename,
                     'ocds-' || CAST(user_id AS VARCHAR) AS ocid,
                     CAST(0 AS BIGINT) AS record_seq,
                     md5('{"ocid":"ocds-' || CAST(user_id AS VARCHAR)
                         || '","releases":[{"date":"' || lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                         || '","id":"' || CAST(event_id AS VARCHAR)
                         || '","ocid":"ocds-' || CAST(user_id AS VARCHAR)
                         || '","tag":["tender"]}]}') AS hash_md5
              FROM events ORDER BY filename"""),
      "Record-package routing (S3/S7): records extracted through the records.item data " +
        "key with per-file sequence numbers and content hashes; oracle reconstructs the " +
        "canonical record text and re-hashes"),

    QueryDef(
      "q_load_compiled", Seq("S3", "S7", "A6"),
      (s, d) => {
        // the compiled-release DIRECT-LOAD route (`file_worker.py:371-380`):
        // bare compiled releases summarized into the same row shape the
        // merge engine emits, no merge pass
        val eid = col("event_id").cast(StringType)
        val u = col("user_id").cast(StringType)
        val dstr = lpad(col("ts_us").cast(StringType), 20, "0")
        val k = get_json_object(col("props"), "$.k").cast(LongType)
        val doc = concat(
          lit("{\"date\":\""), dstr,
          lit("\",\"id\":\""), eid,
          lit("\",\"ocid\":\"ocds-"), u,
          lit("\",\"parties\":[{\"id\":\"p1\"},{\"id\":\"p2\"}]," +
            "\"tag\":[\"compiled\"]," +
            "\"tender\":{\"status\":\"complete\",\"value\":{\"amount\":"), k,
          lit("}}}"))
        val texts = Tables.fanOut(Tables.events(s, d))
          .select(eid.as("filename"), doc.as("text"))
        val dt = FormatDetect.DataType(
          FormatDetect.Format.CompiledRelease, concatenated = false, array = false)
        import s.implicits._
        Ingest.itemsFromText(texts, dt, s)
          .toDF().select("ocid", "data").as[(String, String)]
          .mapPartitions(_.map { case (ocid, data) =>
            graft.ocds.Compile.summarizeDoc(
              ocid, graft.ocds.Canonical.parse(data), nReleases = 1L, nWarnings = 0L)
          })
          .toDF()
          .select("ocid", "compiled_id", "max_date", "tender_status",
            "tender_amount", "n_parties", "n_releases", "n_warnings")
          .orderBy("compiled_id")
      },
      Some("""SELECT 'ocds-' || CAST(user_id AS VARCHAR) AS ocid,
                     CAST(event_id AS VARCHAR) AS compiled_id,
                     lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') AS max_date,
                     'complete' AS tender_status,
                     CAST(CAST(props->>'$.k' AS BIGINT) AS DOUBLE) AS tender_amount,
                     CAST(2 AS BIGINT) AS n_parties,
                     CAST(1 AS BIGINT) AS n_releases,
                     CAST(0 AS BIGINT) AS n_warnings
              FROM events ORDER BY compiled_id"""),
      "Compiled-release direct load (file_worker.py:371-380): bare compiled releases " +
        "summarized into the merge engine's row shape without a merge pass; oracle " +
        "replays the projection"),

    QueryDef(
      "q_canonical_hash", Seq("F5", "F6", "S8"),
      (s, d) => {
        // the dedup identity as a NATIVE codegen'd Catalyst expression
        // (graft.functions.CanonicalHash): input documents are synthesized
        // with UNSORTED keys + a nested object, so the hash is only right
        // if the expression really canonicalizes (sorts keys recursively)
        // the driver may run this in ITS OWN session (no build-time
        // extensions); registration is idempotent
        graft.functions.GraftExtensions.ensureRegistered(s)
        val k = get_json_object(col("props"), "$.k").cast(LongType)
        val u = col("user_id").cast(StringType)
        val raw = concat(
          lit("{\"z\":"), k,
          lit(",\"m\":{\"y\":1,\"x\":\"s\"},\"a\":\"u"), u, lit("\"}"))
        // fanOut below the projection: canonicalize+md5 is ~6 µs/row of CPU
        // that would otherwise run on the single-task scan
        Tables.fanOut(Tables.events(s, d))
          .select(col("event_id"), raw.as("raw"))
          .selectExpr("event_id", "canonical_hash(raw) AS hash_md5")
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
                     md5('{"a":"u' || CAST(user_id AS VARCHAR)
                         || '","m":{"x":"s","y":1},"z":'
                         || CAST(CAST(props->>'$.k' AS BIGINT) AS VARCHAR)
                         || '}') AS hash_md5
              FROM events ORDER BY event_id"""),
      "Content-hash identity (F5/F6/S8) as a native codegen'd Catalyst Expression " +
        "registered via SparkSessionExtensions; oracle md5s the recursively key-sorted " +
        "canonical text the expression must produce")
  )
}
