package graft.control

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.control.Control._

/** The plane's two-file persistence: atomic document replace + append-only
  * file-registry journal (VERDICT r7: a torn `_control.json` broke
  * exactly-once recovery at its root, and each micro-batch serialized the
  * whole registry — O(total files) per trigger). */
class PlaneStoreSpec extends AnyFunSuite {

  private def lake(): String =
    Files.createTempDirectory("graft-plane").toString

  private def basePlane = Plane(Map(
    1L -> Collection(1, "src", "2020-01-01 00:00:00"),
    2L -> Collection(2, "src", "2020-01-01 00:00:00", parent = Some(1),
      transformType = Some(Transform.Upgrade1011))))

  test("round-trip: files live in the journal, not the document") {
    val l = lake()
    var p = basePlane
    p = registerFile(p, 1, "a.json")
    p = registerFile(p, 1, "b.json")
    p = markFileCompiled(p, 1, "a.json")
    val drained = PlaneStore.save(l, p)
    assert(drained.pendingFileEvents.isEmpty)
    assert(drained.files === p.files)
    // document carries no registry (the filenames it does contain are the
    // in-flight LOAD steps); journal carries 2 regs + 1 comp
    assert(!Files.readString(Paths.get(PlaneStore.path(l))).contains("\"files\""))
    val journal = Files.readAllLines(Paths.get(PlaneStore.journalPath(l)))
    assert(journal.size === 3)
    val back = PlaneStore.load(l)
    assert(back.filesOf(1L) === Seq(
      CollectionFile(1, "a.json", compilationStarted = true),
      CollectionFile(1, "b.json")))
    assert(back.pendingFileEvents.isEmpty)
  }

  test("saves append O(delta): an unchanged registry appends nothing") {
    val l = lake()
    var p = PlaneStore.save(l, registerFile(basePlane, 1, "a.json"))
    val len0 = Files.size(Paths.get(PlaneStore.journalPath(l)))
    // collection-state-only mutation: no registry delta, no journal growth
    p = PlaneStore.save(l, Control.cancel(p, 2, "2020-02-02 00:00:00"))
    assert(Files.size(Paths.get(PlaneStore.journalPath(l))) === len0)
    // one more file: exactly one appended line
    p = PlaneStore.save(l, registerFile(p, 1, "b.json"))
    val lines = Files.readAllLines(Paths.get(PlaneStore.journalPath(l)))
    assert(lines.size === 2)
  }

  test("a torn trailing journal line is dropped, not fatal") {
    val l = lake()
    PlaneStore.save(l, registerFile(basePlane, 1, "a.json"))
    Files.writeString(Paths.get(PlaneStore.journalPath(l)),
      """{"collection_id":1,"event":"reg","filena""",
      java.nio.file.StandardOpenOption.APPEND)
    val back = PlaneStore.load(l)
    assert(back.filesOf(1L).map(_.filename) === Seq("a.json"))
  }

  test("replayed journal events are idempotent and drop unknown collections") {
    val l = lake()
    PlaneStore.save(l, registerFile(basePlane, 1, "a.json"))
    // duplicate reg + comp for a file of a collection the doc doesn't know
    Files.writeString(Paths.get(PlaneStore.journalPath(l)),
      PlaneJson.eventToJson(FileEvent.Reg(1, "a.json")) + "\n" +
        PlaneJson.eventToJson(FileEvent.Reg(99, "ghost.json")) + "\n",
      java.nio.file.StandardOpenOption.APPEND)
    val back = PlaneStore.load(l)
    assert(back.filesOf(1L).map(_.filename) === Seq("a.json"))
    assert(back.fileCount(99L) === 0)
  }

  test("legacy document with embedded files migrates into the journal") {
    val l = lake()
    // a pre-append-log _control.json as the old serializer wrote it
    Files.writeString(Paths.get(PlaneStore.path(l)),
      """{"collections":[{"compilation_enqueued":false,"compilation_started":false,""" +
        """"data_version":"2020-01-01 00:00:00","id":1,"source_id":"src","steps":[]}],""" +
        """"files":[{"collection_id":1,"compilation_started":true,"filename":"old.json"}],""" +
        """"steps":[]}""")
    val loaded = PlaneStore.load(l)
    assert(loaded.filesOf(1L) ===
      Seq(CollectionFile(1, "old.json", compilationStarted = true)))
    // the legacy rows surface as pending events; saving moves them over
    assert(loaded.pendingFileEvents.nonEmpty)
    PlaneStore.save(l, loaded)
    assert(!Files.readString(Paths.get(PlaneStore.path(l))).contains("old.json"))
    assert(PlaneStore.load(l).filesOf(1L) ===
      Seq(CollectionFile(1, "old.json", compilationStarted = true)))
  }

  test("compactJournal drops only the WIPED ids; a logical cancel keeps its registry") {
    val l = lake()
    var p = basePlane
    p = registerFile(p, 1, "a.json")
    p = registerFile(p, 2, "u.json")
    p = markFileCompiled(p, 2, "u.json")
    p = PlaneStore.save(l, p)
    assert(Files.readAllLines(Paths.get(PlaneStore.journalPath(l))).size === 3)

    // a logical CANCEL keeps the file registry — the lake rows still
    // exist and the reference never deletes collection_file on cancel
    p = PlaneStore.save(l, Control.cancel(p, 1, "2020-02-02 00:00:00"))
    assert(PlaneStore.load(l).filesOf(1L).map(_.filename) === Seq("a.json"))

    // a WIPE compacts its tree's events out of the journal; live (and
    // cancelled-but-not-wiped) collections' lines survive the rewrite
    PlaneStore.compactJournal(l, Set(2L))
    val lines = Files.readAllLines(Paths.get(PlaneStore.journalPath(l)))
    assert(lines.size === 1)
    assert(lines.get(0).contains("a.json"))
    val back = PlaneStore.load(l)
    assert(back.filesOf(1L).map(_.filename) === Seq("a.json"))
    assert(back.fileCount(2L) === 0)
  }

  test("document writes leave no temp file and replace atomically") {
    val l = lake()
    PlaneStore.save(l, basePlane)
    PlaneStore.save(l, Control.cancel(basePlane, 1, "2020-02-02 00:00:00"))
    assert(!Files.exists(Paths.get(PlaneStore.path(l) + ".tmp")))
    assert(PlaneStore.load(l).collection(1L).deletedAt.nonEmpty)
  }
}
