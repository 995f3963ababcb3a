package graft.ocds

import org.scalatest.funsuite.AnyFunSuite

/** Goldens ported from the reference's
  * `tests/processors/test_compiler.py:10-125` plus regression coverage for
  * the round-1 id-keyed-array crash (ADVICE r1: "array expected at
  * parties" for essentially every real OCDS release).
  */
class MergeSpec extends AnyFunSuite {

  private def json(s: String) = Canonical.parse(s)

  // --- test_compiler.py::test_merge_warning (the flagship golden) ---------
  test("id-keyed arrays merge by id; duplicate ids collapse with warnings") {
    val r1 =
      """{"ocid":"ocds-213czf-1","id":"1","date":"2020-01-01T00:00:00Z",
         "parties":[{"id":"ORG-001","name":"Acme Corp"},
                    {"id":"ORG-001","name":"Acme Inc."}],
         "awards":[{"id":"1"},{"id":"1"}]}"""
    val r2 =
      """{"ocid":"ocds-213czf-1","id":"2","date":"2020-01-01T00:00:00Z",
         "parties":[{"id":"ORG-002","name":"Widget Factory"}]}"""

    val res = Merge.compile("ocds-213czf-1", Seq(r1, r2))
    assert(res.compiled.isDefined)
    val expected = json(
      """{"ocid":"ocds-213czf-1","id":"ocds-213czf-1-2020-01-01T00:00:00Z",
         "date":"2020-01-01T00:00:00Z",
         "parties":[{"id":"ORG-001","name":"Acme Inc."},
                    {"id":"ORG-002","name":"Widget Factory"}],
         "awards":[{"id":"1"}],
         "tag":["compiled"]}""")
    assert(res.compiled.get == expected)

    // warnings: repeated date (index 1) + duplicate ids in parties and awards
    assert(res.warnings.contains(Merge.RepeatedDateValue(1, "2020-01-01T00:00:00Z")))
    assert(res.warnings.contains(Merge.DuplicateIdValue("parties", "ORG-001")))
    assert(res.warnings.contains(Merge.DuplicateIdValue("awards", "1")))
  }

  // --- test_compiler.py::test_merge_error ---------------------------------
  test("non-object release aborts the OCID with NonObjectRelease") {
    val res = Merge.compile("ocds-213czf-1", Seq("\"invalid release\""))
    assert(res.compiled.isEmpty)
    assert(res.warnings == Seq(Merge.NonObjectRelease(0)))
  }

  // --- test_compiler.py::test_extension_warning (merge core of it) --------
  test("minimal release compiles to envelope-only compiled release") {
    val res = Merge.compile(
      "ocds-213czf-1",
      Seq("""{"ocid":"ocds-213czf-1","id":"1","date":"2020-01-01T00:00:00Z"}"""))
    val expected = json(
      """{"date":"2020-01-01T00:00:00Z","id":"ocds-213czf-1-2020-01-01T00:00:00Z",
         "ocid":"ocds-213czf-1","tag":["compiled"]}""")
    assert(res.compiled.get == expected)
    assert(res.warnings.isEmpty)
  }

  // --- round-1 regression: nested id-keyed arrays under objects ----------
  test("id-keyed arrays nested in objects (tender.items) merge by id") {
    val r1 =
      """{"ocid":"x","id":"1","date":"2020-01-01",
         "tender":{"id":"t1","items":[{"id":"a","quantity":1},{"id":"b","quantity":2}]}}"""
    val r2 =
      """{"ocid":"x","id":"2","date":"2020-01-02",
         "tender":{"items":[{"id":"a","quantity":9},{"id":"c","quantity":3}]}}"""
    val res = Merge.compile("x", Seq(r1, r2))
    val expected = json(
      """{"ocid":"x","id":"x-2020-01-02","date":"2020-01-02",
         "tender":{"id":"t1","items":[{"id":"a","quantity":9},
                                      {"id":"b","quantity":2},
                                      {"id":"c","quantity":3}]},
         "tag":["compiled"]}""")
    assert(res.compiled.get == expected)
  }

  test("numeric id 1 and string id \"1\" stay distinct array items") {
    val r1 = """{"ocid":"x","date":"2020-01-01","awards":[{"id":1,"v":"num"}]}"""
    val r2 = """{"ocid":"x","date":"2020-01-02","awards":[{"id":"1","v":"str"}]}"""
    val res = Merge.compile("x", Seq(r1, r2))
    val awards = res.compiled.get.get("awards")
    assert(awards.size() == 2)
    assert(awards.get(0).get("v").asText == "num")
    assert(awards.get(1).get("v").asText == "str")
  }

  test("arrays without ids are replaced wholesale by the newest release") {
    val r1 = """{"ocid":"x","date":"2020-01-01","tender":{"submissionMethod":["a","b"]}}"""
    val r2 = """{"ocid":"x","date":"2020-01-02","tender":{"submissionMethod":["c"]}}"""
    val res = Merge.compile("x", Seq(r1, r2))
    assert(res.compiled.get.get("tender").get("submissionMethod") == json("""["c"]"""))
  }

  test("explicit null removes the field and its subtree") {
    val r1 = """{"ocid":"x","date":"2020-01-01","buyer":{"id":"b","name":"B"},"title":"t"}"""
    val r2 = """{"ocid":"x","date":"2020-01-02","buyer":null}"""
    val res = Merge.compile("x", Seq(r1, r2))
    assert(!res.compiled.get.has("buyer"))
    assert(res.compiled.get.get("title").asText == "t")
  }

  test("scalar fields are last-write-wins in date order") {
    val r1 = """{"ocid":"x","date":"2020-01-01","tender":{"status":"planning"}}"""
    val r2 = """{"ocid":"x","date":"2020-02-01","tender":{"status":"complete"}}"""
    val res = Merge.compile("x", Seq(r1, r2))
    assert(res.compiled.get.get("tender").get("status").asText == "complete")
    assert(res.compiled.get.get("date").asText == "2020-02-01")
    assert(res.compiled.get.get("id").asText == "x-2020-02-01")
  }

  test("wholeListMerge rule forces opaque replacement even with ids") {
    val r1 = """{"ocid":"x","date":"2020-01-01","parties":[{"id":"a","name":"A"}]}"""
    val r2 = """{"ocid":"x","date":"2020-01-02","parties":[{"id":"b","name":"B"}]}"""
    val res = Merge.compile(
      "x", Seq(r1, r2), Merge.Rules(wholeListMerge = Set("parties")))
    assert(res.compiled.get.get("parties") == json("""[{"id":"b","name":"B"}]"""))
  }

  test("merge is idempotent: compiling the compiled release is a fixpoint") {
    val r1 =
      """{"ocid":"x","id":"1","date":"2020-01-01",
         "parties":[{"id":"p","roles":["buyer"]}],"tender":{"value":{"amount":1.5}}}"""
    val once = Merge.compile("x", Seq(r1)).compiled.get
    val twice = Merge.compile("x", Seq(Canonical.canonicalize(once))).compiled.get
    // date/id re-synthesize identically; content is unchanged
    assert(twice == once)
  }

  // --- versioned merge (the public ocdsmerge spec's other half; the
  // standard's own merging example shape: per-field change history) -------

  private val v1 =
    """{"ocid":"ocds-213czf-A","id":"1","date":"2020-01-01T00:00:00Z",
       "tag":["tender"],"initiationType":"tender",
       "tender":{"status":"planning","value":{"amount":1000}},
       "parties":[{"id":"ORG-001","name":"Acme"}]}"""
  private val v2 =
    """{"ocid":"ocds-213czf-A","id":"2","date":"2020-02-01T00:00:00Z",
       "tag":["tenderUpdate"],"initiationType":"tender",
       "tender":{"status":"active","value":{"amount":1000}},
       "parties":[{"id":"ORG-001","name":"Acme Corp"}]}"""

  test("versioned: changed fields accumulate entries, unchanged fields keep one") {
    val res = Merge.versioned("ocds-213czf-A", Seq(v1, v2))
    val v = res.versioned.get
    assert(v.get("ocid").asText === "ocds-213czf-A") // literal, not versioned
    val status = v.get("tender").get("status")
    assert(status.isArray && status.size === 2)
    assert(status.get(0).get("releaseID").asText === "1")
    assert(status.get(0).get("releaseDate").asText === "2020-01-01T00:00:00Z")
    assert(status.get(0).get("releaseTag").get(0).asText === "tender")
    assert(status.get(0).get("value").asText === "planning")
    assert(status.get(1).get("value").asText === "active")
    // amount unchanged across releases → one entry
    assert(v.get("tender").get("value").get("amount").size === 1)
    // initiationType unchanged → one entry
    assert(v.get("initiationType").size === 1)
  }

  test("versioned: id-keyed items keep a literal id; member fields version") {
    val v = Merge.versioned("x", Seq(v1, v2)).versioned.get
    val party = v.get("parties").get(0)
    assert(party.get("id").asText === "ORG-001") // the key, not an array
    val name = party.get("name")
    assert(name.size === 2)
    assert(name.get(0).get("value").asText === "Acme")
    assert(name.get(1).get("value").asText === "Acme Corp")
  }

  test("versioned: arrays without ids version wholesale") {
    val a = """{"id":"1","date":"2020-01-01T00:00:00Z","tender":{"submissionMethod":["written"]}}"""
    val b = """{"id":"2","date":"2020-02-01T00:00:00Z","tender":{"submissionMethod":["written","electronic"]}}"""
    val v = Merge.versioned("x", Seq(a, b)).versioned.get
    val sm = v.get("tender").get("submissionMethod")
    assert(sm.size === 2)
    assert(sm.get(0).get("value").toString === """["written"]""")
    assert(sm.get(1).get("value").toString === """["written","electronic"]""")
  }

  test("versioned: non-object release aborts the ocid; warnings still fire") {
    val res = Merge.versioned("x", Seq(v1, "[1,2]"))
    assert(res.versioned.isEmpty)
    assert(res.warnings.contains(Merge.NonObjectRelease(1)))
    // duplicate-id + repeated-date warnings match compile's
    val dup =
      """{"id":"1","date":"2020-01-01T00:00:00Z",
         "parties":[{"id":"P","name":"a"},{"id":"P","name":"b"}]}"""
    assert(Merge.versioned("x", Seq(dup)).warnings
      .contains(Merge.DuplicateIdValue("parties", "P")))
  }

  test("versioned validates against the vendored versioned-release schema's shape") {
    // spot-check the schema contract: versioned fields are arrays of
    // {releaseID, releaseDate, releaseTag, value} — every entry carries
    // all four keys
    val v = Merge.versioned("x", Seq(v1, v2)).versioned.get
    val entry = v.get("tender").get("status").get(0)
    assert(Seq("releaseID", "releaseDate", "releaseTag", "value")
      .forall(entry.has))
  }
}
