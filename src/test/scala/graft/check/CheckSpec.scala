package graft.check

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.check.JsonSchema.CheckError
import graft.ocds.Canonical

/** V1 goldens: repackaging semantics (`checker.py:101-108`), each validator
  * check kind, ref resolution, and the cove_output shape. */
class CheckSpec extends AnyFunSuite {

  private val validRelease =
    """{"ocid": "ocds-aaa-1", "id": "r1", "date": "2020-01-02T03:04:05Z",
      | "tag": ["planning"], "initiationType": "tender"}""".stripMargin

  private val pkgMeta =
    """{"uri": "http://example.org/1", "publishedDate": "2020-01-01T00:00:00Z",
      | "publisher": {"name": "Acme"}, "version": "1.1"}""".stripMargin

  private def check(item: String, pkg: String = pkgMeta): Seq[CheckError] =
    JsonSchema.validate(OcdsSchemas.releasePackage, Checker.repackage(item, pkg, "releases"))

  test("repackage rebuilds the envelope with releases=[item] (checker.py:101-108)") {
    val pkg = Checker.repackage(validRelease, pkgMeta, "releases")
    assert(pkg.get("uri").asText === "http://example.org/1")
    assert(pkg.get("releases").isArray && pkg.get("releases").size === 1)
    assert(pkg.get("releases").get(0).get("ocid").asText === "ocds-aaa-1")
  }

  test("repackage does not mutate shared package metadata across items") {
    val metaNode = pkgMeta
    val p1 = Checker.repackage(validRelease, metaNode, "releases")
    val p2 = Checker.repackage("""{"ocid":"ocds-bbb-2"}""", metaNode, "releases")
    assert(p1.get("releases").get(0).get("ocid").asText === "ocds-aaa-1")
    assert(p2.get("releases").get(0).get("ocid").asText === "ocds-bbb-2")
  }

  test("valid single-release package has no errors") {
    assert(check(validRelease) === Seq.empty)
  }

  test("missing required field → required error with item-scoped path") {
    val noDate = validRelease.replace(""""date": "2020-01-02T03:04:05Z",""", "")
    assert(check(noDate) === Seq(CheckError("releases/0/date", "required", "")))
  }

  test("mistyped field → one type error, interior not re-checked") {
    val numDate = validRelease.replace(""""2020-01-02T03:04:05Z"""", "123")
    assert(check(numDate) === Seq(CheckError("releases/0/date", "type", "string")))
  }

  test("codelist violation → enum error") {
    val bad = validRelease.replace(""""initiationType": "tender"""", """"initiationType": "direct"""")
    assert(check(bad).map(e => (e.path, e.kind)) === Seq(("releases/0/initiationType", "enum")))
  }

  test("blank ocid → minLength error") {
    val bad = validRelease.replace(""""ocid": "ocds-aaa-1"""", """"ocid": """"")
    assert(check(bad) === Seq(CheckError("releases/0/ocid", "minLength", "1")))
  }

  test("date-only string where date-time required → format error") {
    val bad = validRelease.replace("2020-01-02T03:04:05Z", "2020-01-02")
    assert(check(bad) === Seq(CheckError("releases/0/date", "format", "date-time")))
  }

  test("missing package metadata → envelope required errors (metadata-less package)") {
    val errs = JsonSchema.validate(
      OcdsSchemas.releasePackage, Checker.repackage(validRelease, null, "releases"))
    assert(errs.map(_.path).toSet === Set("uri", "publisher", "publishedDate", "version"))
    assert(errs.forall(_.kind == "required"))
  }

  test("$ref resolution: award without id flags required inside the array") {
    val withAward = validRelease.stripSuffix("}") +
      ""","awards": [{"status": "active"}]}"""
    assert(check(withAward) === Seq(CheckError("releases/0/awards/0/id", "required", "")))
  }

  test("union types accept integer ids in awards") {
    val withAward = validRelease.stripSuffix("}") + ""","awards": [{"id": 7}]}"""
    assert(check(withAward) === Seq.empty)
  }

  test("record package: compiledRelease validates as a Release; linked releases satisfy oneOf") {
    // the full 1.1.5 record schema REQUIRES `releases` (the authored subset
    // didn't) — give the record a linked-release list, which must also
    // satisfy the releases oneOf's first branch
    val record =
      """{"ocid": "ocds-aaa-1",
        | "releases": [{"url": "http://example.org/1.json#1", "date": "2020-01-02T03:04:05Z",
        |               "tag": ["tender"]}],
        | "compiledRelease": {"ocid": "ocds-aaa-1", "id": "c", "tag": ["compiled"],
        |                     "initiationType": "tender"}}""".stripMargin
    val errs = JsonSchema.validate(
      OcdsSchemas.recordPackage,
      Checker.repackage(record, pkgMeta.replace("http://example.org/1", "http://example.org/r"), "records"))
    assert(errs === Seq(CheckError("records/0/compiledRelease/date", "required", "")))
  }

  test("record releases failing both oneOf branches → oneOf error") {
    // linked branch needs url+date shapes; embedded branch needs full
    // versioned releases — a bare integer list matches neither
    val record = """{"ocid": "ocds-aaa-1", "releases": [7]}"""
    val errs = JsonSchema.validate(
      OcdsSchemas.recordPackage,
      Checker.repackage(record, pkgMeta.replace("http://example.org/1", "http://example.org/r"), "records"))
    assert(errs.exists(e => e.path == "records/0/releases" && e.kind == "oneOf"))
  }

  test("full-standard constraints the authored subset never had: version pattern, " +
    "tag minItems, parties uniqueItems, deep milestone identity") {
    // package version must match ^(\d+\.)(\d+)$
    assert(check(validRelease, pkgMeta.replace(""""version": "1.1"""", """"version": "v1""""))
      .map(e => (e.path, e.kind)) === Seq(("version", "pattern")))
    // tag: minItems 1
    val emptyTag = validRelease.replace("""["planning"]""", "[]")
    assert(check(emptyTag).map(e => (e.path, e.kind)) === Seq(("releases/0/tag", "minItems")))
    // parties: uniqueItems
    val dupParties = validRelease.stripSuffix("}") +
      ""","parties": [{"id": "p1", "name": "X"}, {"id": "p1", "name": "X"}]}"""
    assert(check(dupParties).map(e => (e.path, e.kind)) === Seq(("releases/0/parties", "uniqueItems")))
    // tender/milestones/0/id: required two levels below anything the subset modeled
    val noMilestoneId = validRelease.stripSuffix("}") +
      ""","tender": {"id": "t1", "milestones": [{"title": "m"}]}}"""
    assert(check(noMilestoneId) ===
      Seq(CheckError("releases/0/tender/milestones/0/id", "required", "")))
  }

  test("patternProperties: language-map keys validate, mistyped value is flagged") {
    val good = validRelease.stripSuffix("}") +
      ""","tender": {"id": "t1", "title_es": "hola"}}"""
    assert(check(good) === Seq.empty)
    val bad = validRelease.stripSuffix("}") +
      ""","tender": {"id": "t1", "title_es": 7}}"""
    assert(check(bad).map(e => (e.path, e.kind)) ===
      Seq(("releases/0/tender/title_es", "type")))
  }

  test("extension-patched check: lot constraints apply only when the package declares the extension") {
    import graft.ocds.Extensions
    val withLots = validRelease.stripSuffix("}") +
      ""","tender": {"id": "t1", "lots": [{"title": "no id"}]}}"""
    // undeclared: the standard schema knows nothing of tender.lots → ok
    assert(check(withLots) === Seq.empty)
    // declared: the merge-patched schema requires Lot.id (checker.py:70-77 flow)
    val extPkg = pkgMeta.stripSuffix("}") +
      s""","extensions": ["${Extensions.extensionUrl("lots")}"]}"""
    val errs = JsonSchema.validate(
      OcdsSchemas.forPackage("releases", Extensions.getExtensions(Canonical.parse(extPkg))),
      Checker.repackage(withLots, extPkg, "releases"))
    assert(errs === Seq(CheckError("releases/0/tender/lots/0/id", "required", "")))
  }

  test("vendored lots patch: closed-codelist enum flips the validation outcome") {
    import graft.ocds.Extensions
    // a lot with an id but a status outside the closed tenderStatus codelist
    val badStatus = validRelease.stripSuffix("}") +
      ""","tender": {"id": "t1", "lots": [{"id": "1", "status": "ongoing"}]}}"""
    // undeclared extension: tender.lots is unknown to the standard → clean
    assert(check(badStatus) === Seq.empty)
    val extPkg = pkgMeta.stripSuffix("}") +
      s""","extensions": ["${Extensions.extensionUrl("lots")}"]}"""
    val errs = JsonSchema.validate(
      OcdsSchemas.forPackage("releases", Extensions.getExtensions(Canonical.parse(extPkg))),
      Checker.repackage(badStatus, extPkg, "releases"))
    assert(errs.map(e => (e.path, e.kind)) ===
      Seq(("releases/0/tender/lots/0/status", "enum")))
    // a codelist value passes under the same patched schema
    val okStatus = validRelease.stripSuffix("}") +
      ""","tender": {"id": "t1", "lots": [{"id": "1", "status": "active"}]}}"""
    assert(JsonSchema.validate(
      OcdsSchemas.forPackage("releases", Extensions.getExtensions(Canonical.parse(extPkg))),
      Checker.repackage(okStatus, extPkg, "releases")) === Seq.empty)
  }

  test("vendored bids patch: BidsStatistic required fields flip the outcome") {
    import graft.ocds.Extensions
    val badStat = validRelease.stripSuffix("}") +
      ""","bids": {"statistics": [{"id": "1", "measure": "bids"}]}}"""
    assert(check(badStat) === Seq.empty) // standard schema: bids unknown → clean
    val extPkg = pkgMeta.stripSuffix("}") +
      s""","extensions": ["${Extensions.extensionUrl("bids")}"]}"""
    val errs = JsonSchema.validate(
      OcdsSchemas.forPackage("releases", Extensions.getExtensions(Canonical.parse(extPkg))),
      Checker.repackage(badStat, extPkg, "releases"))
    // value is required by the published patch; measure/id are present
    assert(errs.map(e => (e.path, e.kind)) ===
      Seq(("releases/0/bids/statistics/0/value", "required")))
  }

  test("lots dependency pulls in the submissionTerms patch (util.py:180-182)") {
    import graft.ocds.Extensions
    val withTerms = validRelease.stripSuffix("}") +
      ""","tender": {"id": "t1",
        "submissionTerms": {"languages": ["en", 7]}}}"""
    val extPkg = pkgMeta.stripSuffix("}") +
      s""","extensions": ["${Extensions.extensionUrl("lots")}"]}"""
    // submissionTerms was never declared — the lots dependency closure
    // brings its patch in, so the mistyped language entry is caught
    val errs = JsonSchema.validate(
      OcdsSchemas.forPackage("releases", Extensions.getExtensions(Canonical.parse(extPkg))),
      Checker.repackage(withTerms, extPkg, "releases"))
    assert(errs.map(e => (e.path, e.kind)) ===
      Seq(("releases/0/tender/submissionTerms/languages/1", "type")))
  }

  test("cove_output follows the lib-cove-ocds API layout minus the disabled sections") {
    import graft.ocds.Extensions
    val out = Checker.coveOutput(
      Seq(CheckError("releases/0/date", "required", "")),
      versionUsed = "1.1",
      extensions = Set(Extensions.extensionUrl("lots"), "http://example.com/nope"))
    val parsed = Canonical.parse(out)
    // the documented keys (database.rst: libcoveocds output without
    // additional_checks / records_aggregates / releases_aggregates)
    assert(parsed.fieldNames.asScala.toSet === Set(
      "file_type", "version_used", "extensions", "validation_errors",
      "common_error_types", "deprecated_fields",
      "additional_closed_codelist_values", "additional_open_codelist_values",
      "additional_fields", "all_additional_fields"))
    assert(!out.contains("additional_checks") && !out.contains("aggregates"))
    val err = parsed.get("validation_errors").get(0)
    assert(err.get("type").asText === "required")
    assert(err.get("field").asText === "releases/date") // path_no_number
    assert(err.get("path").asText === "releases/0/date")
    assert(err.get("description").asText === "'date' is missing but required")
    val ext = parsed.get("extensions")
    assert(ext.get("is_extended_schema").asBoolean)
    assert(ext.get("extensions").size === 2)
    assert(ext.get("invalid_extension").fieldNames.asScala.toSeq ===
      Seq("http://example.com/nope"))
  }

  test("cove_output reports the package's declared version") {
    val row = Checker.coveOutput(Seq.empty, versionUsed = "1.0")
    assert(Canonical.parse(row).get("version_used").asText === "1.0")
    assert(Canonical.parse(row).get("validation_errors").size === 0)
  }
}
