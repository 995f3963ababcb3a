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

  /** lib-cove-ocds's documented path_no_number: the JSON path with array
    * indices dropped — the "field" a dashboard groups errors by. */
  private[check] def fieldOf(path: String): String =
    path.split('/').filterNot(_.forall(_.isDigit)).mkString("/")

  /** Deterministic per-kind message in lib-cove's flavor (jsonschema's
    * validator messages, `context_api_transform`'s `description`). */
  private[check] def describe(e: JsonSchema.CheckError): String = {
    val leaf = e.path.split('/').lastOption.getOrElse(e.path)
    e.kind match {
      case "required"    => s"'$leaf' is missing but required"
      case "type"        => s"is not a '${e.expected}'"
      case "enum"        => "Invalid code found"
      case "format"      => s"does not match the format '${e.expected}'"
      case "pattern"     => s"does not match the pattern '${e.expected}'"
      case "minLength"   => "is too short"
      case "minItems"    => "has too few items"
      case "uniqueItems" => "has non-unique elements"
      case "oneOf"       => "is not valid under any of the given schemas"
      case other         => other
    }
  }

  /** The `cove_output` column, in the lib-cove-ocds API output layout the
    * reference documents (`docs/database.rst`: the libcoveocds format
    * without `additional_checks` / `records_aggregates` /
    * `releases_aggregates`, which the reference also disables —
    * `checker.py:23-30`). Checks this engine doesn't run (deprecations,
    * codelist scans, additional-field discovery) emit their documented
    * empty containers, so downstream consumers read the same keys. */
  def coveOutput(
      errors: Seq[JsonSchema.CheckError],
      versionUsed: String = "1.1",
      extensions: Set[String] = Set.empty): String = {
    val root = Canonical.mapper.createObjectNode()
    root.put("file_type", "json")
    root.put("version_used", versionUsed)
    val ext = Canonical.mapper.createObjectNode()
    val urls = Canonical.mapper.createArrayNode()
    extensions.toSeq.sorted.foreach(urls.add)
    ext.set[JsonNode]("extensions", urls)
    val invalid = Canonical.mapper.createObjectNode()
    extensions.toSeq.sorted
      .filterNot(graft.ocds.Extensions.schemaPatches.contains)
      .foreach(invalid.put(_, "fetching failed")) // zero-egress: unknown = unfetchable
    ext.set[JsonNode]("invalid_extension", invalid)
    ext.put("is_extended_schema",
      extensions.exists(graft.ocds.Extensions.schemaPatches.contains))
    root.set[JsonNode]("extensions", ext)
    val arr = Canonical.mapper.createArrayNode()
    errors.foreach { e =>
      val o = Canonical.mapper.createObjectNode()
      o.put("type", e.kind)
      o.put("field", fieldOf(e.path))
      o.put("description", describe(e))
      o.put("path", e.path)
      o.put("value", "")
      arr.add(o)
    }
    root.set[JsonNode]("validation_errors", arr)
    root.set[JsonNode]("common_error_types", Canonical.mapper.createArrayNode())
    root.set[JsonNode]("deprecated_fields", Canonical.mapper.createArrayNode())
    root.set[JsonNode]("additional_closed_codelist_values", Canonical.mapper.createObjectNode())
    root.set[JsonNode]("additional_open_codelist_values", Canonical.mapper.createObjectNode())
    root.set[JsonNode]("additional_fields", Canonical.mapper.createArrayNode())
    root.set[JsonNode]("all_additional_fields", Canonical.mapper.createArrayNode())
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

  /** One row's check: parse the envelope once, read its `extensions` URL
    * list (dependency-closed, like `get_extensions` in `checker.py:107`),
    * fetch the (items_key, extensions)-cached extension-patched 1.1.5
    * schema, and validate the rebuilt package. Returns the errors plus
    * the package context cove_output reports (version, extension set). */
  private def checkOne(
      data: String, pkgJson: String,
      itemsField: String): (Seq[JsonSchema.CheckError], String, Set[String]) = {
    val pkg = parsePackage(pkgJson)
    val exts = graft.ocds.Extensions.getExtensions(pkg)
    val schema = OcdsSchemas.forPackage(itemsField, exts)
    val errs = JsonSchema.validate(schema, repackage(data, pkg, itemsField))
    val version = Option(pkg.get("version")).filter(_.isTextual).map(_.asText)
      .getOrElse("1.1") // the reference's SchemaOCDS("1.1", ...) default
    (errs, version, exts)
  }

  private def errorsFor(
      data: String, pkgJson: String, itemsField: String): Seq[JsonSchema.CheckError] =
    checkOne(data, pkgJson, itemsField)._1

  /** Check every (id, data, package_data) row; `kind` ∈ {release, record}.
    * One check row per item, like the reference's release_check table. */
  def checkItems(rows: DataFrame, kind: String, s: SparkSession): Dataset[CheckRow] = {
    import s.implicits._
    rows.select("id", "data", "package_data").as[(Long, String, String)]
      .mapPartitions { it =>
        val itemsField = itemsFieldFor(kind)
        it.map { case (id, data, pkg) =>
          val (errs, version, exts) = checkOne(data, pkg, itemsField)
          CheckRow(id, errs.isEmpty, errs.size.toLong, coveOutput(errs, version, exts))
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
    // SHUFFLE_HASH-pinned anti-join: the existing-check table is as big as
    // the checked corpus at 100 TB, so an estimate-based broadcast at
    // small SF would silently degrade to SortMergeJoin at scale
    checkItems(rows.join(existing.select("id").hint("SHUFFLE_HASH"),
      Seq("id"), "left_anti"), kind, s)

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
