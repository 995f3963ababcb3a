package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator demonstration: a Spark DataFrame program over the driver's
  * parquet tables plus (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * Conventions that make the driver's hash-compare deterministic:
  *  - every output column is explicitly aliased, identically on both sides;
  *  - every query ends in a total ORDER BY (ties broken by a key column);
  *  - no floating-point aggregation: SUMs go through DECIMAL (exact,
  *    order-insensitive) and are cast back to DOUBLE at the very end;
  *    double arithmetic is restricted to per-row expressions, which are
  *    bit-deterministic across engines.
  *
  * `survey` lists the SURVEY.md §2 operator ids the query exercises.
  */
final case class QueryDef(
    name: String,
    survey: Seq[String],
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "",
    /** Optional oracle-side auxiliary input: `(spark, sfDir, auxDir)` writes
      * parquet under `auxDir` that this query's oracle SQL reads via
      * [[OracleAux.Token]]. This is how an oracle covers an operator whose
      * DERIVATION is not SQL-expressible but whose derived artifact is
      * deterministic (e.g. trained k-means centroids): the artifact is
      * materialized once, and the oracle recomputes everything downstream
      * of it from the raw tables. Verify runs the hook and substitutes the
      * token with the real directory when dumping `oracle_sql.json`. */
    aux: Option[(SparkSession, String, String) => Unit] = None,
    /** For the oracle-less queries (oracle = None): WHAT pins correctness
      * instead — the referee spec and its independent implementation.
      * Verify emits these as `no_oracle_notes.json` next to
      * `oracle_sql.json`, so the driver's correctness artifact is
      * self-describing about rows it records as weaker rows-only checks
      * (VERDICT r13/r14 handoff ask). */
    pinnedBy: Option[String] = None)

/** Path token in oracle SQL that Verify replaces with the absolute aux
  * directory it materialized [[QueryDef.aux]] outputs into. */
object OracleAux { val Token = "__GRAFT_AUX__" }

object Queries {
  def all: Seq[QueryDef] =
    RelationalQueries.defs ++ EventQueries.defs ++ TextQueries.defs ++
      VectorQueries.defs ++ OcdsQueries.defs ++ CheckQueries.defs ++
      IngestQueries.defs ++ DagQueries.defs ++ WipeQueries.defs ++
      TypedQueries.defs

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
