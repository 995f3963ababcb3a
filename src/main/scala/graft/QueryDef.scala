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
    doc: String = "")

object Queries {
  def all: Seq[QueryDef] =
    RelationalQueries.defs ++ EventQueries.defs ++ TextQueries.defs ++
      VectorQueries.defs ++ OcdsQueries.defs ++ CheckQueries.defs ++
      IngestQueries.defs ++ DagQueries.defs ++ WipeQueries.defs ++
      TypedQueries.defs

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
