package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ocds.TypedProjection

/** The typed-projection analytics surface (SURVEY.md §1.4; reference
  * `docs/querying-data.rst:60-121` — the two canonical JSONB queries users
  * run daily, re-expressed over ONE `from_json` struct instead of per-field
  * blob re-parses).
  *
  * Input synthesis mirrors the reference's storage: a `data` table of raw
  * compiled-release JSON joined to a `compiled_release` fact carrying
  * `collection_id` (`data.id = compiled_release.data_id`,
  * querying-data.rst:41-49), filtered to one collection. Amounts are
  * 2-decimal doubles (the testdata generator's own contract, same as the
  * lineitem family) so the JSON round-trip and the oracle's
  * `CAST(… AS DECIMAL(18,2))` agree exactly; sums accumulate in
  * DECIMAL(38,18) — the projection's lossless `number` rendering — and cast
  * to DOUBLE at the very end on both sides.
  */
object TypedQueries {

  private val Ccy = array(lit("EUR"), lit("GBP"), lit("USD"))

  /** The `data` table: one compiled-release JSON blob per event,
    * materialized as real parquet ([[Tables.materialize]]) like the
    * reference's persistent `data` table — so the typed queries' pushed
    * from_json predicates land on a many-file SCAN, not on the synthesis
    * expression tree. Fields beyond what the two queries touch (parties,
    * tag) are included on purpose: schema pruning must pay for only the
    * accessed subtree. */
  private def dataTable(s: SparkSession, d: String): DataFrame =
    Tables.materialize("typed_data", d, buildDataTable(s, d))

  private def buildDataTable(s: SparkSession, d: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    val u = col("user_id")
    val cur = element_at(Ccy, (u % 3 + 1).cast(IntegerType))
    val status = when(k % 4 === 0, lit("complete")).otherwise(col("event_type"))
    val award2Amount = when(k % 5 === 0, lit(0L)).otherwise(k % 97 + 1)
    Tables.events(s, d).select(
      col("event_id").as("id"),
      to_json(struct(
        concat(lit("ocds-"), u).as("ocid"),
        col("event_id").cast(StringType).as("id"),
        array(lit("compiled")).as("tag"),
        struct(
          status.as("status"),
          struct(col("value").as("amount"), cur.as("currency")).as("value")).as("tender"),
        struct(concat(lit("Buyer-"), u % 7).as("name")).as("buyer"),
        array(
          struct(
            (k % 7).cast(StringType).as("id"),
            lit("active").as("status"),
            struct(col("value").as("amount"), cur.as("currency")).as("value")),
          struct(
            (k % 2 + 7).cast(StringType).as("id"),
            when(k % 2 === 0, lit("active")).otherwise(lit("cancelled")).as("status"),
            struct(award2Amount.as("amount"), cur.as("currency")).as("value"))).as("awards"),
        array(struct(
          (u % 7).cast(StringType).as("id"),
          concat(lit("Buyer-"), u % 7).as("name"),
          array(lit("buyer")).as("roles"))).as("parties"))).as("data"))
  }

  /** The `compiled_release` fact: (data_id, collection_id). */
  private def compiledRelease(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id").as("data_id"),
      (col("user_id") % 4).as("collection_id"))

  /** rst:41-49's join shape, filtered to one collection, typed with an
    * explicitly minimal projection. The narrow `structFor(paths)` schema is
    * applied in its own single-expression select: CollapseProject declines
    * to inline a multi-referenced expensive expression, so downstream field
    * accesses read the materialized struct — exactly one runtime parse per
    * surviving row. (A predicate on a typed field additionally pushes a
    * tender-pruned parse below the join, onto the scan side — the shape you
    * want at 100 TB: rows drop before the shuffle; plan-asserted in
    * TypedProjectionSpec.) */
  private[graft] def typedCollection(s: SparkSession, d: String, paths: Seq[String]): DataFrame =
    dataTable(s, d)
      // SHUFFLE_HASH-pinned: both sides are corpus-sized at 100 TB (every
      // data row / every compiled-release fact), so an estimate-based
      // broadcast at small SF would silently degrade to SortMergeJoin at
      // scale; the build side is the collection-filtered fact leg
      .join(compiledRelease(s, d).filter(col("collection_id") === 1)
          .hint("SHUFFLE_HASH"),
        col("id") === col("data_id"))
      .select(from_json(col("data"), TypedProjection.structFor(paths)).as("r"))

  /** Shared oracle prelude: collection-1 rows with the same derived
    * columns, relationally. */
  private val OracleRel =
    """SELECT user_id AS u, event_id, value,
              CAST(props->>'$.k' AS BIGINT) AS k, event_type,
              CASE CAST(user_id % 3 AS INTEGER)
                   WHEN 0 THEN 'EUR' WHEN 1 THEN 'GBP' ELSE 'USD'
              END AS currency
       FROM events WHERE user_id % 4 = 1"""

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_typed_tender_sum", Seq("P4", "F1", "A4", "J1"),
      (s, d) => typedCollection(s, d, Seq("tender.status", "tender.value"))
        .filter(col("r.tender.status") === "complete")
        .groupBy(col("r.tender.value.currency").as("currency"))
        .agg(sum(col("r.tender.value.amount")).cast(DoubleType).as("tender_value"))
        .orderBy("currency"),
      Some(s"""WITH r AS ($OracleRel)
               SELECT currency,
                      -- scale-2 accumulation: same exact rational as the
                      -- projection's DECIMAL(38,18) sum, but DuckDB's
                      -- wide-scale decimal->double cast is not correctly
                      -- rounded (int128/10^18), scale 2 is
                      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS tender_value
               FROM r
               WHERE (CASE WHEN k % 4 = 0 THEN 'complete' ELSE event_type END) = 'complete'
               GROUP BY currency ORDER BY currency"""),
      "querying-data.rst:60-77 over the typed projection: total value of completed " +
        "processes per currency — struct field predicate + DECIMAL(38,18) sum off ONE " +
        "schema-pruned from_json, not per-field blob re-parses"),

    QueryDef(
      "q_typed_awards_topk", Seq("J7", "P4", "A5", "O3"),
      (s, d) => typedCollection(s, d, Seq("buyer", "awards.status", "awards.value"))
        .select(col("r.buyer.name").as("buyer_name"), explode(col("r.awards")).as("award"))
        .filter(col("award.value.amount") > 0 && col("award.status") === "active")
        .groupBy(col("buyer_name"), col("award.value.currency").as("currency"))
        .agg(sum(col("award.value.amount")).cast(DoubleType).as("award_value"))
        .orderBy(col("award_value").desc, col("buyer_name"), col("currency"))
        .limit(10),
      Some(s"""WITH r AS ($OracleRel),
               a AS (
                 SELECT 'Buyer-' || CAST(u % 7 AS VARCHAR) AS buyer_name, currency,
                        CAST(value AS DECIMAL(18,2)) AS amount,
                        'active' AS status
                 FROM r
                 UNION ALL
                 SELECT 'Buyer-' || CAST(u % 7 AS VARCHAR), currency,
                        CAST(CASE WHEN k % 5 = 0 THEN 0 ELSE k % 97 + 1 END AS DECIMAL(18,2)),
                        CASE WHEN k % 2 = 0 THEN 'active' ELSE 'cancelled' END
                 FROM r)
               SELECT buyer_name, currency,
                      CAST(SUM(amount) AS DOUBLE) AS award_value
               FROM a WHERE amount > 0 AND status = 'active'
               GROUP BY buyer_name, currency
               ORDER BY award_value DESC, buyer_name, currency
               LIMIT 10"""),
      "querying-data.rst:88-121 over the typed projection: top-10 buyers by active " +
        "award value — awards array exploded from the struct (the jsonb_array_elements " +
        "CROSS JOIN), amount > 0 predicate on DECIMAL, top-k with total tiebreak"),

    QueryDef(
      "q_variant_status_sum", Seq("P4", "F1", "A4"),
      (s, d) => {
        // SURVEY §1.4's dynamic remainder: fields NOT in the typed
        // projection stay queryable as a Spark 4 VARIANT — parse once
        // (binary variant encoding), prune per path with variant_get.
        // The single-expression select materializes the variant like the
        // typed queries' struct: one parse_json per row, both extractions
        // read the variant (plan-asserted in TypedProjectionSpec).
        dataTable(s, d)
          .select(parse_json(col("data")).as("v"))
          .select(
            try_variant_get(col("v"), "$.tender.status", "string").as("status"),
            try_variant_get(col("v"), "$.tender.value.amount", "decimal(18,2)").as("amount"))
          .groupBy(col("status"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("amount")).cast(DoubleType).as("total"))
          .orderBy("status")
      },
      Some("""WITH t AS (
                SELECT CASE WHEN CAST(props->>'$.k' AS BIGINT) % 4 = 0
                            THEN 'complete' ELSE event_type END AS status,
                       value
                FROM events)
              SELECT status, count(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM t GROUP BY status ORDER BY status"""),
      "VARIANT remainder (SURVEY §1.4): parse_json once into Spark 4's binary variant, " +
        "per-path pruning with try_variant_get incl. a DECIMAL target type — the dynamic " +
        "complement to the typed struct projection")
  )
}
