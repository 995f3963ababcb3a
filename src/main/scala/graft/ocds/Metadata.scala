package graft.ocds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The compiled collection's `metadata` read surface (reference
  * `process/views.py:157-234`): ocid prefix + publication date range from
  * the compiled releases, license/publicationPolicy from a sample package.
  *
  * Spark shape: two single-row plans — a full-scan aggregate over the
  * compiled facts (partial aggregation, no shuffle of data rows) and a
  * `TakeOrderedAndProject` over package metadata — joined broadcast-style.
  * Both sides are O(1) in result size at any table size. The reference
  * samples its package with a bare `LIMIT 1`; this engine orders by
  * filename so the sample (and therefore the output) is deterministic
  * under any partitioning.
  */
object Metadata {

  /** One-row metadata frame: (ocid_prefix, published_from, published_to,
    * license, publication_policy).
    *
    * `compiled` needs (ocid, release_date); `packageData` needs
    * (filename, package_data). Dates outside (1970-01-01, today] are
    * excluded like the reference's WHERE clause. The comparison is
    * LEXICOGRAPHIC on purpose: the reference's `release_date` is a TEXT
    * column (models.py:303, the `<= today` bind is a date string), so a
    * full ISO timestamp dated today compares greater than the date-only
    * bound and is excluded — matching that behavior exactly, quirk
    * included. */
  def metadata(compiled: DataFrame, packageData: DataFrame, today: String): DataFrame = {
    val dates = compiled
      .filter(col("release_date") > "1970-01-01" && col("release_date") <= today)
      .agg(
        substring(max(col("ocid")), 1, 11).as("ocid_prefix"),
        min(col("release_date")).as("published_from"),
        max(col("release_date")).as("published_to"))
    val sample = packageData
      .orderBy("filename").limit(1)
      .select(
        get_json_object(col("package_data"), "$.license").as("license"),
        get_json_object(col("package_data"), "$.publicationPolicy").as("publication_policy"))
    // left join on true: an empty package table still yields the date row
    // with null license fields, like the reference's dictfetchone merge
    dates.join(sample, lit(true), "left")
  }
}
