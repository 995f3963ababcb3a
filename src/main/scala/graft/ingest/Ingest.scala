package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ocds.Canonical

/** The load path (SURVEY.md §2 S1-S8; reference
  * `process/management/commands/file_worker.py` + `load.py`): files →
  * format sniff → streamed item extraction → typed fact rows + content-
  * addressed data + per-file package metadata.
  *
  * Spark shape: `spark.read.text(wholetext)` gives one row per file
  * (parallelism = files, the reference's one-message-per-file unit), then a
  * single `flatMap` runs the streaming [[ItemReader]] per file ON THE
  * EXECUTORS — the driver never touches file contents. Downstream dedup is
  * a hash `dropDuplicates` + optional left-anti against the existing store
  * (S8), both plain shuffles on `hash_md5`; at 100 TB the store is a table
  * hash-partitioned on the same key so the anti-join co-locates.
  *
  * The reference's per-row envelope (`process/models.py:295-380`):
  * release(ocid, release_id, release_date, data_id, package_data_id),
  * record(ocid, ...), compiled_release(ocid, release_date, ...). Here the
  * canonical JSON rides along as `data` and `hash_md5` IS the data_id (the
  * content-addressed identity, `process/util.py:93-110`).
  */
object Ingest {

  /** One extracted item with its envelope columns. */
  final case class ItemRow(
      filename: String,
      ocid: String,
      release_id: String,
      release_date: String,
      data: String,
      hash_md5: String)

  /** One file's package envelope (minus releases/records). */
  final case class PackageRow(filename: String, package_data: String, hash_md5: String)

  /** Sniff the collection's data_type from its first file, enforcing the
    * reference's supported-format gate (S2). Driver-side, like the
    * reference's set_data_type. */
  def detectDataType(firstFile: String): FormatDetect.DataType =
    FormatDetect.requireSupported(FormatDetect.detectFile(firstFile), firstFile)

  /** S3+S7: all items of all files as fact rows. Items without an ocid are
    * skipped (`file_worker.py:346-348`). */
  def loadItems(spark: SparkSession, paths: Seq[String], dt: FormatDetect.DataType): Dataset[ItemRow] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(paths: _*)
      .select(input_file_name().as("filename"), col("value"))
      .as[(String, String)]
      .flatMap { case (filename, raw) =>
        ItemReader.items(raw, dt).flatMap { node =>
          val ocid = Option(node.get("ocid")).filter(_.isTextual).map(_.asText)
          ocid.map { o =>
            val canonical = Canonical.canonicalize(node)
            ItemRow(
              filename = filename,
              ocid = o,
              release_id = Option(node.get("id")).filter(_.isValueNode).map(_.asText).getOrElse(""),
              release_date = Option(node.get("date")).filter(_.isTextual).map(_.asText).getOrElse(""),
              data = canonical,
              hash_md5 = Canonical.md5hex(canonical))
          }
        }
      }
  }

  /** S4: one package-metadata row per file (first package only). */
  def loadPackageData(spark: SparkSession, paths: Seq[String], dt: FormatDetect.DataType): Dataset[PackageRow] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").textFile(paths: _*)
      .select(input_file_name().as("filename"), col("value"))
      .as[(String, String)]
      .flatMap { case (filename, raw) =>
        ItemReader.packageMetadata(raw, dt).map { node =>
          val canonical = Canonical.canonicalize(node)
          PackageRow(filename, canonical, Canonical.md5hex(canonical))
        }
      }
  }

  /** S8: content-addressed dedup — one row per distinct document, plus an
    * optional left-anti against the already-stored hashes. Both sides hash-
    * shuffle on `hash_md5`; with the store bucketed on `hash_md5` the join
    * is co-located at any scale. */
  def dedupData(items: DataFrame, existingHashes: Option[DataFrame] = None): DataFrame = {
    val distinctData = items.select(col("hash_md5"), col("data")).dropDuplicates("hash_md5")
    existingHashes match {
      case Some(ex) => distinctData.join(ex.select("hash_md5"), Seq("hash_md5"), "left_anti")
      case None     => distinctData
    }
  }
}
