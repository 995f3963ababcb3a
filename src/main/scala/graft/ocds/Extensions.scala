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

  private def patchResource(name: String): String = {
    val path = s"/graft/check/extensions/ocds_${name}_extension/release-schema.json"
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing vendored extension patch $path")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Extension URL → release-schema merge-patch (RFC 7386), applied by the
    * CHECK step's schema builder (`graft.check.OcdsSchemas`) before
    * compiling — the analogue of SchemaOCDS fetching each extension's
    * `release-schema.json` fragment and ProfileBuilder-patching the
    * standard (`checker.py:70-77`). The fragments are VENDORED files under
    * `resources/graft/check/extensions/` — validation-faithful renderings
    * of the published ocds_lots / ocds_bids / ocds_submissionTerms
    * extension patches (see PROVENANCE.md there for exactly what that
    * claim covers); a deployment with egress replaces the files with the
    * published artifacts unchanged. */
  lazy val schemaPatches: Map[String, String] = Map(
    extensionUrl("lots") -> patchResource("lots"),
    extensionUrl("bids") -> patchResource("bids"),
    extensionUrl("submissionTerms") -> patchResource("submissionTerms"))

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
