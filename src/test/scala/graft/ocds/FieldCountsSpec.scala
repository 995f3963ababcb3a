package graft.ocds

import org.scalatest.funsuite.AnyFunSuite

/** Path-walk goldens for the field-coverage engine: array-index collapse,
  * per-doc occurrence counts, malformed/non-object tolerance. */
class FieldCountsSpec extends AnyFunSuite {

  private def counts(json: String): Map[String, Long] =
    FieldCounts.pathCounts(Canonical.mapper, json).map(p => p.path -> p.n).toMap

  test("array indices collapse: every element's fields share one path") {
    val c = counts(
      """{"ocid": "x", "awards": [
        |  {"id": "1", "value": {"amount": 5}},
        |  {"id": "2"}]}""".stripMargin)
    assert(c === Map(
      "ocid" -> 1L, "awards" -> 1L, "awards/id" -> 2L,
      "awards/value" -> 1L, "awards/value/amount" -> 1L))
  }

  test("nested arrays of scalars count the property once per doc") {
    assert(counts("""{"tag": ["planning", "tender"]}""") === Map("tag" -> 1L))
  }

  test("deep object paths use / separators") {
    val c = counts("""{"tender": {"value": {"amount": 1, "currency": "EUR"}}}""")
    assert(c("tender/value/amount") === 1L)
    assert(c("tender/value/currency") === 1L)
  }

  test("malformed and non-object payloads count nothing") {
    assert(counts("{truncated") === Map.empty)
    assert(counts("[1,2,3]") === Map.empty)
    assert(counts("42") === Map.empty)
  }
}
