package graft.ocds

import com.fasterxml.jackson.databind.node.ObjectNode
import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the record-compile decision tree, one per branch of
  * `process/management/commands/record_compiler.py:78-143`. */
class RecordCompileSpec extends AnyFunSuite {

  private def obj(s: String): ObjectNode = Canonical.parse(s).asInstanceOf[ObjectNode]

  test("all dated, none linked → dated releases merged (happy path)") {
    val rec = obj(
      """{"releases":[
        {"ocid":"o1","id":"a","date":"2000-01-01","tag":["planning"],"tender":{"status":"planned"}},
        {"ocid":"o1","id":"b","date":"2000-02-01","tag":["tender"],"tender":{"status":"active"}}]}""")
    val d = RecordCompile.decide("o1", rec)
    assert(d.outcome === "merged")
    assert(d.classification === RecordCompile.Classification(2, 2, 0, 0, 0))
    assert(d.notes.isEmpty)
    val c = d.compiled.get
    assert(c.get("id").asText === "o1-2000-02-01")
    assert(c.get("date").asText === "2000-02-01")
    assert(c.get("tender").get("status").asText === "active")
  }

  test("some undated → dated merged with skip warning (record_compiler.py:100-102)") {
    val rec = obj(
      """{"releases":[
        {"ocid":"o1","id":"a","date":"2000-01-01","x":1},
        {"ocid":"o1","id":"b","x":2}]}""")
    val d = RecordCompile.decide("o1", rec)
    assert(d.outcome === "merged")
    assert(d.notes === Seq(RecordCompile.Note(
      "WARNING", "OCID o1 has 1 undated releases. The 1 dated releases have been compiled.")))
    assert(d.compiled.get.get("x").asInt === 1)
  }

  test("merge input is sorted by date in-group regardless of record order (O2)") {
    val rec = obj(
      """{"releases":[
        {"ocid":"o1","id":"b","date":"2000-02-01","v":"late"},
        {"ocid":"o1","id":"a","date":"2000-01-01","v":"early"}]}""")
    val d = RecordCompile.decide("o1", rec)
    assert(d.compiled.get.get("v").asText === "late") // last-write-wins by date
  }

  test("all linked + compiledRelease → compiledRelease used at INFO level") {
    val rec = obj(
      """{"releases":[
        {"url":"http://x/1","date":"2000-01-01"},
        {"url":"http://x/2","date":"2000-02-01"}],
        "compiledRelease":{"ocid":"o1","id":"o1-x","tag":["compiled"]}}""")
    val d = RecordCompile.decide("o1", rec)
    assert(d.outcome === "compiledRelease")
    assert(d.classification.linked === 2)
    assert(d.notes === Seq(
      RecordCompile.Note("INFO", "OCID o1 has 2 linked releases among 2 dated releases and 2 releases."),
      RecordCompile.Note("INFO", "Its compiledRelease was used.")))
    assert(d.compiled.get.get("id").asText === "o1-x")
  }

  test("mixed linked + compiledRelease → WARNING level") {
    val rec = obj(
      """{"releases":[
        {"url":"http://x/1","date":"2000-01-01"},
        {"ocid":"o1","id":"full","date":"2000-02-01","url":"u","tag":["tender"],"tender":{}}],
        "compiledRelease":{"id":"o1-x"}}""")
    val d = RecordCompile.decide("o1", rec)
    assert(d.outcome === "compiledRelease")
    assert(d.notes.forall(_.level === "WARNING"))
  }

  test("all undated, tagged → first tagged release used (WARNING)") {
    val rec = obj(
      """{"releases":[
        {"ocid":"o1","id":"t1","tag":["compiled"],"z":1},
        {"ocid":"o1","id":"t2","tag":["compiled"],"z":2}]}""")
    val d = RecordCompile.decide("o1", rec)
    assert(d.outcome === "tagged")
    assert(d.notes === Seq(
      RecordCompile.Note("WARNING", "OCID o1 has 2 releases, all undated."),
      RecordCompile.Note("WARNING", "Its first release tagged 'compiled' was used.")))
    assert(d.compiled.get.get("z").asInt === 1)
  }

  test("single tagged release gets the 'only release' wording") {
    val rec = obj("""{"releases":[{"id":"t1","tag":["compiled"]}]}""")
    val d = RecordCompile.decide("o1", rec)
    assert(d.notes.last.text === "Its only release tagged 'compiled' was used.")
  }

  test("zero releases, nothing to fall back on → ERROR, not compiled") {
    val d = RecordCompile.decide("o1", obj("""{"releases":[]}"""))
    assert(d.outcome === "none")
    assert(d.compiled.isEmpty)
    assert(d.notes === Seq(
      RecordCompile.Note("ERROR", "OCID o1 has 0 releases."),
      RecordCompile.Note("ERROR",
        "It has no compiledRelease and no releases tagged 'compiled'. It was not compiled.")))
  }

  test("linked releases but no compiledRelease and no tagged → not compiled") {
    val rec = obj("""{"releases":[{"url":"http://x/1","date":"2000-01-01"}]}""")
    val d = RecordCompile.decide("o1", rec)
    assert(d.outcome === "none")
    assert(d.notes.head.text === "OCID o1 has 1 linked releases among 1 dated releases and 1 releases.")
    assert(d.notes.forall(_.level === "ERROR"))
  }
}
