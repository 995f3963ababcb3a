package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** The management-command surface end-to-end: load --upgrade, status,
  * incremental checks (idempotent), metadata, notes, orphan GC, tree
  * delete — each invocation a separate main() call composing through the
  * persisted _control.json, like the reference's commands compose through
  * its control tables. */
class CliSpec extends AnyFunSuite {

  // the shared local[*] session: Cli.session()'s getOrCreate reuses it
  private lazy val s = SparkSuite.spark

  private def inputTree(): Path = {
    val dir = Files.createTempDirectory("graft-cli")
    Files.writeString(dir.resolve("a.json"),
      """{"uri": "http://x/a", "version": "1.0", "publisher": {"name": "A"},
        | "publishedDate": "2020-01-01T00:00:00Z", "license": "https://creativecommons.org/publicdomain/zero/1.0/",
        | "releases": [
        |   {"ocid": "ocds-a", "id": "a1", "date": "2020-01-01T00:00:00Z",
        |    "tag": ["award"], "initiationType": "tender",
        |    "buyer": {"name": "B"},
        |    "tender": {"id": "t1", "tenderers": [{"name": "T"}]},
        |    "awards": [{"id": "w", "suppliers": [{"name": "T", "contactPoint": {"email": "t@x.org"}}]}]},
        |   {"ocid": "ocds-a", "id": "a2", "date": "2020-01-02T00:00:00Z",
        |    "tag": ["tenderUpdate"], "initiationType": "tender"}
        | ]}""".stripMargin)
    dir
  }

  private def run(args: String*): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
      Cli.main(args.toArray)
    }
    out.toString("UTF-8")
  }

  test("load → status → addchecks ×2 → metadata → notes → GC → delete") {
    s.sparkContext.setLogLevel("WARN") // make sure the session exists first
    val input = inputTree().toString
    val lake = Files.createTempDirectory("graft-cli-lake").toString

    val loadOut = run("load", input, lake, "--upgrade")
    assert(loadOut.contains("collection=1 upgraded=2 compiled=3"))
    assert(loadOut.contains("items=2"))
    assert(Files.exists(java.nio.file.Paths.get(s"$lake/_control.json")))

    val status = run("collectionstatus", lake, "1")
    assert(status.contains("collection 1"))
    assert(status.contains("collection 2 (upgrade-1-0-to-1-1)"))
    assert(status.contains("collection 3 (compile-releases)"))
    assert(status.contains("compilation_started:  true"))

    // first run checks everything; the second finds nothing unchecked
    assert(run("addchecks", lake, "1").contains("checked=2 failed=0"))
    assert(run("addchecks", lake, "1").contains("checked=0"))
    // the UPGRADED collection resolves package metadata via its root parent
    // — failed=0 proves the envelope was rebuilt (a missing package_data
    // would fail every row on required uri/publisher/publishedDate)
    assert(run("addchecks", lake, "2").contains("checked=2 failed=0"))

    val md = run("metadata", lake, "3")
    assert(md.contains("ocid_prefix: ocds-a"))
    assert(md.contains("license: https://creativecommons.org/publicdomain/zero/1.0/"))

    val notes = run("notes", lake, "1")
    assert(notes.contains("WARNING:"))
    assert(notes.contains("differs")) // the upgrade differs-warning

    // everything referenced → GC removes nothing; after the tree delete the
    // store rows are orphaned and the GC clears them
    assert(run("deleteorphan", lake).contains("removed 0"))
    assert(run("deletecollection", lake, "1").contains("deleted collections 1, 2, 3"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$lake/release/collection_id=1")))
    assert(run("deleteorphan", lake).contains("removed 2"))
  }

  test("load --note/--sample persist; addfiles registers against an open root") {
    val input = inputTree()
    val lake = Files.createTempDirectory("graft-cli-lake2").toString

    run("load", input.toString, lake, "--note", "initial import", "--sample")
    // --note → an INFO collection_note row, readable via the notes command
    val notes = run("notes", lake, "1", "INFO")
    assert(notes.contains("INFO:"))
    assert(notes.contains("initial import"))
    // --sample survives the plane round-trip
    val plane = graft.control.PlaneJson.fromJson(
      Files.readString(java.nio.file.Paths.get(s"$lake/_control.json")))
    assert(plane.collections(1L).sample)
    assert(!plane.collections(2L).sample)

    // addfiles against an OPEN root: registrations are recorded as files +
    // LOAD steps, not executed (the async contract). The closed/non-root
    // rejections call sys.exit, so they stay out of this in-JVM test.
    val more = Files.createTempDirectory("graft-cli-more")
    Files.writeString(more.resolve("b.json"), """{"releases": []}""")

    // an open root: create by hand in the plane (registration-only path)
    val p2 = plane.copy(collections = plane.collections +
      (50L -> graft.control.Control.Collection(50L, "manual", "2020-01-01 00:00:00")))
    Files.writeString(java.nio.file.Paths.get(s"$lake/_control.json"),
      graft.control.PlaneJson.toJson(p2))
    val out = run("addfiles", lake, "50", more.toString)
    assert(out.contains("registered 1 files"))
    val after = graft.control.PlaneJson.fromJson(
      Files.readString(java.nio.file.Paths.get(s"$lake/_control.json")))
    assert(after.files.exists(f => f.collectionId == 50L && f.filename.endsWith("b.json")))
    assert(after.steps.exists(s => s.collectionId == 50L && s.name == "LOAD"))
    // idempotent: replaying the same registration adds nothing (T1)
    assert(run("addfiles", lake, "50", more.toString).contains("registered 0 files"))
  }
}
