package graft.ocds

import org.scalatest.funsuite.AnyFunSuite

/** A8/F13 goldens: get_extensions filtering, the lots→submissionTerms
  * dependency (`process/util.py:172-183`), and a registry extension
  * actually changing the compiled output (wholeListMerge flip). */
class ExtensionsSpec extends AnyFunSuite {

  test("getExtensions keeps string entries only (util.py:176-177)") {
    val pkg = Canonical.parse(
      """{"extensions": ["http://a", 42, null, "http://b", {"x": 1}]}""")
    assert(Extensions.getExtensions(pkg) === Set("http://a", "http://b"))
  }

  test("getExtensions handles missing/non-array extensions") {
    assert(Extensions.getExtensions(Canonical.parse("{}")) === Set.empty)
    assert(Extensions.getExtensions(Canonical.parse("""{"extensions": "x"}""")) === Set.empty)
    assert(Extensions.getExtensions(null) === Set.empty)
  }

  test("lots implies submissionTerms (util.py:180-182)") {
    val lots = Extensions.extensionUrl("lots")
    assert(Extensions.applyDependencies(Set(lots)) ===
      Set(lots, Extensions.extensionUrl("submissionTerms")))
    // and only lots triggers it
    assert(Extensions.applyDependencies(Set("http://other")) === Set("http://other"))
  }

  test("unknown extensions leave the default rules unchanged") {
    assert(Extensions.rulesFor(Set("http://unknown")) === Merge.DefaultRules)
  }

  test("registry extension flips parties to wholeListMerge and changes the compiled output") {
    val releases = Seq(
      """{"date": "2020-01-01", "parties": [{"id": 1, "name": "A"}]}""",
      """{"date": "2020-01-02", "parties": [{"id": 2, "name": "B"}]}""")

    val defaultRules = Extensions.rulesFor(Set.empty)
    val idMerged = Merge.compile("ocds-x", releases, defaultRules).compiled.get
    assert(idMerged.get("parties").size === 2) // id-merge unions the items

    val wlRules = Extensions.rulesFor(Set("urn:graft:wholeListParties"))
    assert(wlRules.wholeListMerge.contains("parties"))
    val wholeList = Merge.compile("ocds-x", releases, wlRules).compiled.get
    assert(wholeList.get("parties").size === 1) // last release's array wins
    assert(wholeList.get("parties").get(0).get("name").asText === "B")
  }
}
