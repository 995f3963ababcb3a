package graft.check

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.ocds.Canonical

/** Structural check job (SURVEY.md §2 V1; reference
  * `process/management/commands/checker.py:80-131`).
  *
  * Per item: re-wrap the stored release/record into its package envelope
  * (the reference rebuilds `{**package_data, releases: [data]}`,
  * `checker.py:101-108`), validate the package against the structural
  * schema, and emit a `cove_output`-shaped JSON summary — here the
  * validation-errors list plus counters, the analogue of the reference's
  * lib-cove output minus its aggregate sections (which the reference also
  * disables: `skip_aggregates`, `checker.py:23-30`).
  *
  * Spark shape: a narrow `mapPartitions` over (id, data, package_data) —
  * no shuffle, schema compiled once per executor ([[OcdsSchemas]]), scales
  * linearly with the fact table. The check table (release_check /
  * record_check) is the result Dataset; J3's left-anti join over it selects
  * unchecked items for incremental runs.
  */
object Checker {

  /** One check-table row (reference `process/models.py:383-407`). */
  final case class CheckRow(id: Long, ok: Boolean, n_errors: Long, cove_output: String)

  /** One validation error, exploded (for aggregation queries). */
  final case class CheckErrorRow(id: Long, path: String, kind: String, expected: String)

  /** Rebuild the package envelope around one stored item
    * (`checker.py:101-108`): package metadata minus the items array, plus
    * `itemsField: [item]`. A missing/blank package_data yields a bare
    * `{itemsField: [item]}` envelope, which then fails the envelope's
    * required checks — same behavior as checking a metadata-less package. */
  def repackage(itemJson: String, packageJson: String, itemsField: String): ObjectNode =
    repackage(itemJson, parsePackage(packageJson), itemsField)

  private def parsePackage(packageJson: String): ObjectNode =
    if (packageJson == null || packageJson.isEmpty) Canonical.mapper.createObjectNode()
    else Canonical.parse(packageJson) match {
      case o: ObjectNode => o.deepCopy()
      case _             => Canonical.mapper.createObjectNode()
    }

  private def repackage(itemJson: String, pkg: ObjectNode, itemsField: String): ObjectNode = {
    val items: ArrayNode = Canonical.mapper.createArrayNode()
    items.add(Canonical.parse(itemJson))
    pkg.set[JsonNode](itemsField, items)
    pkg
  }

  /** The `cove_output` analogue: canonical JSON with the error list. */
  def coveOutput(errors: Seq[JsonSchema.CheckError]): String = {
    val root = Canonical.mapper.createObjectNode()
    val arr = Canonical.mapper.createArrayNode()
    errors.foreach { e =>
      val o = Canonical.mapper.createObjectNode()
      o.put("path", e.path); o.put("kind", e.kind)
      if (e.expected.nonEmpty) o.put("expected", e.expected)
      arr.add(o)
    }
    root.set[JsonNode]("validation_errors", arr)
    root.put("validation_errors_count", errors.size)
    Canonical.canonicalize(root)
  }

  /** The check row's stable id: a hash of the fact row's content key —
    * deterministic across runs/partitionings (the reference keys
    * release_check on the release row's PK). ONE definition shared by the
    * pipeline's inline check and the CLI's incremental addchecks: the
    * LEFT ANTI in [[checkUnchecked]] only works if both sides computed
    * byte-identical ids. Expects (filename, ocid, release_id, hash_md5). */
  def checkId: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    xxhash64(col("filename"), col("ocid"), col("release_id"), col("hash_md5"))
  }

  private def itemsFieldFor(kind: String): String =
    if (kind == "record") "records" else "releases"

  /** One row's errors: parse the envelope once, read its `extensions` URL
    * list (dependency-closed, like `get_extensions` in `checker.py:107`),
    * fetch the (items_key, extensions)-cached extension-patched 1.1.5
    * schema, and validate the rebuilt package. */
  private def errorsFor(
      data: String, pkgJson: String, itemsField: String): Seq[JsonSchema.CheckError] = {
    val pkg = parsePackage(pkgJson)
    val schema = OcdsSchemas.forPackage(itemsField, graft.ocds.Extensions.getExtensions(pkg))
    JsonSchema.validate(schema, repackage(data, pkg, itemsField))
  }

  /** Check every (id, data, package_data) row; `kind` ∈ {release, record}.
    * One check row per item, like the reference's release_check table. */
  def checkItems(rows: DataFrame, kind: String, s: SparkSession): Dataset[CheckRow] = {
    import s.implicits._
    rows.select("id", "data", "package_data").as[(Long, String, String)]
      .mapPartitions { it =>
        val itemsField = itemsFieldFor(kind)
        it.map { case (id, data, pkg) =>
          val errs = errorsFor(data, pkg, itemsField)
          CheckRow(id, errs.isEmpty, errs.size.toLong, coveOutput(errs))
        }
      }
  }

  /** The incremental check job (`addchecks.py:38-45`): the reference
    * anti-joins items against the check table (`releasecheck__isnull`) and
    * enqueues only the unchecked — here the same LEFT ANTI on the check
    * table's stable id feeds straight into the check. At scale both sides
    * hash-shuffle on `id` (or co-locate if the check table is bucketed on
    * it); rows already checked are never re-validated. */
  def checkUnchecked(
      rows: DataFrame, existing: DataFrame, kind: String, s: SparkSession): Dataset[CheckRow] =
    checkItems(rows.join(existing.select("id"), Seq("id"), "left_anti"), kind, s)

  /** Same check, one row PER ERROR — the aggregation-friendly side output. */
  def checkErrors(rows: DataFrame, kind: String, s: SparkSession): Dataset[CheckErrorRow] = {
    import s.implicits._
    rows.select("id", "data", "package_data").as[(Long, String, String)]
      .mapPartitions { it =>
        val itemsField = itemsFieldFor(kind)
        it.flatMap { case (id, data, pkg) =>
          errorsFor(data, pkg, itemsField)
            .map(e => CheckErrorRow(id, e.path, e.kind, e.expected))
        }
      }
  }
}
