package graft.check

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

  test("record package: compiledRelease validates as a Release") {
    val record =
      """{"ocid": "ocds-aaa-1",
        | "compiledRelease": {"ocid": "ocds-aaa-1", "id": "c", "tag": ["compiled"],
        |                     "initiationType": "tender"}}""".stripMargin
    val errs = JsonSchema.validate(
      OcdsSchemas.recordPackage,
      Checker.repackage(record, pkgMeta.replace("http://example.org/1", "http://example.org/r"), "records"))
    assert(errs === Seq(CheckError("records/0/compiledRelease/date", "required", "")))
  }

  test("cove_output is canonical JSON with errors + count") {
    val out = Checker.coveOutput(Seq(CheckError("releases/0/date", "required", "")))
    assert(out ===
      """{"validation_errors":[{"kind":"required","path":"releases/0/date"}],"validation_errors_count":1}""")
    val parsed = Canonical.parse(out)
    assert(parsed.get("validation_errors_count").asInt === 1)
  }
}
