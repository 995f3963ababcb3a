package graft.ocds

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode

/** Extension handling for the merge step (SURVEY.md §2 A8/F13; reference
  * `process/util.py:172-183` (`get_extensions` + the lots→submissionTerms
  * dependency) and `process/processors/compiler.py:68-72,170-177` (per-ocid
  * extension union → `lru_cache`d merger with schema-derived rules)).
  *
  * The reference builds a ProfileBuilder-patched release schema per
  * extension set and derives merge rules (`omitWhenMerged`/`wholeListMerge`
  * annotations) from it — a network/schema pipeline. Our engine keeps the
  * same SHAPE with a local registry: extension URL → rule delta. Real
  * deployments fill the registry from their profile's patched schemas (a
  * data change); the dependency rule, per-group set union, rule caching and
  * merge wiring are all exercised here.
  */
object Extensions {

  /** The public extension-URL template (`process/util.py:22`). */
  def extensionUrl(name: String): String =
    s"https://raw.githubusercontent.com/open-contracting-extensions/ocds_${name}_extension/master/extension.json"

  /** `get_extensions(package)`: string entries of `extensions`, plus the
    * dependency rule — the lots extension implies submissionTerms
    * (`process/util.py:172-183`). */
  def getExtensions(packageNode: JsonNode): Set[String] = {
    val base: Set[String] = Option(packageNode)
      .flatMap(p => Option(p.get("extensions")))
      .filter(_.isArray)
      .map(_.elements.asScala.filter(_.isTextual).map(_.asText).toSet)
      .getOrElse(Set.empty)
    applyDependencies(base)
  }

  /** F13: dependency closure over an already-extracted URL set. */
  def applyDependencies(extensions: Set[String]): Set[String] =
    if (extensions.contains(extensionUrl("lots")))
      extensions + extensionUrl("submissionTerms")
    else extensions

  /** Registry: extension URL → merge-rule delta (the distilled form of the
    * reference's patched-schema rule derivation). Unknown extensions leave
    * the rules unchanged, like an extension that patches no merge
    * annotations. */
  type RuleDelta = Merge.Rules => Merge.Rules

  val defaultRegistry: Map[String, RuleDelta] = Map(
    // test/demo extension: declares `parties` as wholeListMerge
    "urn:graft:wholeListParties" ->
      (r => r.copy(wholeListMerge = r.wholeListMerge + "parties"))
  )

  /** Extension URL → release-schema merge-patch (RFC 7386), applied by the
    * CHECK step's schema builder (`graft.check.OcdsSchemas`) before
    * compiling — the analogue of SchemaOCDS fetching each extension's
    * `release-schema.json` fragment and ProfileBuilder-patching the
    * standard (`checker.py:70-77`). Zero-egress engine, so the fragments
    * live here: the lots and submissionTerms entries are DISTILLED subsets
    * of the public ocds_lots / ocds_submissionTerms extensions (the fields
    * their published patches constrain most: Lot identity + the
    * tender.lots / relatedLot wiring); a real deployment drops in the full
    * published fragments unchanged. */
  val schemaPatches: Map[String, String] = Map(
    extensionUrl("lots") -> """{
      "definitions": {
        "Tender": {"properties": {
          "lots": {"type": "array", "items": {"$ref": "#/definitions/Lot"}}}},
        "Item": {"properties": {
          "relatedLot": {"type": ["string", "integer", "null"]}}},
        "Document": {"properties": {
          "relatedLots": {"type": "array", "items": {"type": ["string", "integer"]}}}},
        "Lot": {
          "type": "object",
          "required": ["id"],
          "properties": {
            "id": {"type": ["string", "integer"]},
            "title": {"type": ["string", "null"]},
            "description": {"type": ["string", "null"]},
            "status": {"type": ["string", "null"]},
            "value": {"$ref": "#/definitions/Value"}
          }
        }
      }
    }""",
    extensionUrl("submissionTerms") -> """{
      "definitions": {
        "Tender": {"properties": {
          "submissionTerms": {
            "type": "object",
            "properties": {
              "electronicSubmissionPolicy": {"type": ["string", "null"]},
              "languages": {"type": "array", "items": {"type": "string"}}
            }
          }}}
      }
    }""")

  /** Rules for one ocid's unioned extension set. Deterministic: deltas are
    * applied in sorted-URL order. Cache the result per distinct set at the
    * call site (the reference memoizes the merger with `lru_cache`,
    * `compiler.py:170-177`). */
  def rulesFor(
      extensions: Set[String],
      registry: Map[String, RuleDelta] = defaultRegistry): Merge.Rules =
    applyDependencies(extensions).toSeq.sorted
      .foldLeft(Merge.DefaultRules)((rules, url) => registry.get(url).fold(rules)(_(rules)))
}
