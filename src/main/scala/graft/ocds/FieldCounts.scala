package graft.ocds

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import com.fasterxml.jackson.databind.JsonNode

/** Field-coverage counts — the "which fields does this publisher actually
  * populate" surface the reference's own docs steer analysts to
  * (`docs/querying-data.rst:145-147`, the field-counts table of the
  * companion summarize tool): for every JSON path in a collection's
  * releases, how many times it occurs and in how many documents.
  *
  * Path convention matches the public field-counts contract: `/`-separated
  * object properties with ARRAY INDICES COLLAPSED — every element of
  * `awards` contributes its fields under `awards/…`, so a doc with two
  * awards counts `awards/id` twice but `awards` once (the array property
  * itself).
  *
  * Spark shape: a per-row Jackson walk (`mapPartitions`, mapper built once
  * per partition — the same CPU-engine pattern as merge/upgrade/check)
  * emitting one `(path, n)` pair per DISTINCT path per document, then ONE
  * hash aggregation: `sum(n)` = total occurrences, `count(*)` = documents
  * containing the path. No distinct, no second shuffle; the per-doc
  * pre-aggregation in the walker is the map-side combine. At 100 TB the
  * path dimension is tiny (schema-bounded) while rows are huge — exactly
  * the shape partial aggregation collapses. */
object FieldCounts {

  /** One (document, path) coverage row. */
  final case class PathCount(path: String, n: Long)

  /** Enumerate every path in `json` with its occurrence count (array
    * indices collapsed). Non-object payloads yield nothing. */
  def pathCounts(mapper: com.fasterxml.jackson.databind.ObjectMapper, json: String): Seq[PathCount] = {
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def walk(node: JsonNode, prefix: String): Unit =
      if (node.isObject) {
        node.fields.asScala.foreach { e =>
          val p = if (prefix.isEmpty) e.getKey else s"$prefix/${e.getKey}"
          counts.updateWith(p)(c => Some(c.getOrElse(0L) + 1L))
          walk(e.getValue, p)
        }
      } else if (node.isArray) {
        node.elements.asScala.foreach(walk(_, prefix)) // indices collapse
      }
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return Seq.empty } // a malformed row counts nothing
    if (root == null || !root.isObject) return Seq.empty
    walk(root, "")
    counts.iterator.map { case (p, n) => PathCount(p, n) }.toSeq
  }

  /** (path, n_total, n_docs) over `releases(dataCol)`, one aggregation. */
  def counts(releases: DataFrame, dataCol: String, s: SparkSession): DataFrame = {
    import s.implicits._
    releases.select(col(dataCol).as("data")).as[String]
      .mapPartitions { it =>
        val mapper = Canonical.mapper
        it.flatMap(pathCounts(mapper, _))
      }
      .groupBy(col("path"))
      .agg(
        sum(col("n")).as("n_total"),
        count(lit(1)).as("n_docs"))
  }
}
