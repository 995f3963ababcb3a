package graft.control

import org.scalatest.funsuite.AnyFunSuite

import graft.control.Control._

/** State-machine goldens mirroring the reference's gating tests
  * (`tests/processors/test_compilable.py`, `test_completable.py`,
  * `test_completable_record_packages.py:36-103`) over the same
  * original → upgraded → compiled fixture chain. */
class ControlSpec extends AnyFunSuite {

  // the complete_db fixture shape: 1 original, 2 upgraded, 3 compiled
  private val original = Collection(
    1, "portugal", "2020-01-01 00:00:00", steps = Set("upgrade"),
    dataTypeFormat = Some(Format.ReleasePackage), storeEndAt = Some("t1"))
  private val upgraded = Collection(
    2, "portugal", "2020-01-01 00:00:00", parent = Some(1),
    transformType = Some(Transform.Upgrade1011), steps = Set("compile"),
    dataTypeFormat = Some(Format.ReleasePackage), storeEndAt = Some("t1"))
  private val compiled = Collection(
    3, "portugal", "2020-01-01 00:00:00", parent = Some(2),
    transformType = Some(Transform.CompileReleases))
  private def fileMap(fs: CollectionFile*) =
    fs.foldLeft(Map.empty[Long, scala.collection.immutable.VectorMap[String, Boolean]]) {
      (m, f) =>
        m.updated(f.collectionId,
          m.getOrElse(f.collectionId,
            scala.collection.immutable.VectorMap.empty[String, Boolean])
            .updated(f.filename, f.compilationStarted))
    }

  private val plane = Plane(
    Map(1L -> original, 2L -> upgraded, 3L -> compiled),
    files = fileMap(CollectionFile(1, "f1.json"), CollectionFile(2, "f1.json")))

  private def withC(p: Plane, c: Collection): Plane =
    p.copy(collections = p.collections.updated(c.id, c))

  // ---- compilable (test_compilable.py) -----------------------------------

  test("compilable: happy day") {
    assert(compilable(plane, upgraded))
  }

  test("compilable: already compiled (compiled child started)") {
    val p = withC(plane, compiled.copy(compilationStarted = true))
    assert(!compilable(p, upgraded))
  }

  test("compilable: LOAD step remaining on the root parent") {
    val p = plane.copy(steps = Seq(Step(StepName.Load, 1, Some("f1.json"))))
    assert(!compilable(p, upgraded))
  }

  test("compilable: load incomplete (no store_end_at)") {
    assert(!compilable(plane, upgraded.copy(storeEndAt = None)))
  }

  test("compilable: no compile step planned") {
    assert(!compilable(plane, upgraded.copy(steps = Set.empty)))
  }

  test("compilable: closed before any file arrived (no data_type)") {
    assert(!compilable(plane, upgraded.copy(dataTypeFormat = None)))
  }

  test("compilable: record packages compile before load completes (T4 exception)") {
    val c = upgraded.copy(dataTypeFormat = Some(Format.RecordPackage), storeEndAt = None)
    assert(compilable(plane, c))
  }

  test("compilable: closed-empty collection is trivially compilable") {
    val c = Collection(9, "s", "v", steps = Set("compile"), expectedFilesCount = Some(0))
    assert(compilable(withC(plane, c), c))
  }

  test("compilable: expected files not yet arrived") {
    assert(!compilable(plane, upgraded.copy(expectedFilesCount = Some(2))))
    assert(compilable(plane, upgraded.copy(expectedFilesCount = Some(1))))
  }

  // ---- completable (test_completable.py) ---------------------------------

  test("completable: already completed") {
    assert(!completable(plane, upgraded.copy(completedAt = Some("now"))))
  }

  test("completable: steps remaining") {
    val p = plane.copy(steps = Seq(Step(StepName.Load, 2, Some("f1.json"))))
    assert(!completable(p, upgraded))
  }

  test("completable: load incomplete") {
    assert(!completable(plane, upgraded.copy(storeEndAt = None)))
  }

  test("completable: happy day compiled (started + enqueued)") {
    val c = compiled.copy(compilationStarted = true, compilationEnqueued = true)
    assert(completable(withC(plane, c), c))
  }

  test("completable: compilation not enqueued (release packages)") {
    val c = compiled.copy(compilationStarted = true, compilationEnqueued = false)
    assert(!completable(withC(plane, c), c))
  }

  test("completable: compile steps not created yet") {
    assert(!completable(plane, compiled))
  }

  test("completable: a parent missing from the plane gates false, never throws") {
    val orphanChild = compiled.copy(parent = Some(77), compilationStarted = true)
    assert(!completable(withC(plane, orphanChild), orphanChild))
  }

  test("completable: record packages wait for per-file compilation_started") {
    // parent (upgraded) is a record-package collection with two files —
    // the upgrade-chain shape of test_completable_record_packages.py:54-103
    val up = upgraded.copy(dataTypeFormat = Some(Format.RecordPackage))
    val c = compiled.copy(compilationStarted = true)
    val base = withC(withC(plane, up), c).copy(files = fileMap(
      CollectionFile(1, "original_file_1.json"),
      CollectionFile(1, "original_file_2.json"),
      CollectionFile(2, "upgraded_file_1.json", compilationStarted = true),
      CollectionFile(2, "upgraded_file_2.json")))
    assert(!completable(base, c))
    val done = markFileCompiled(base, 2, "upgraded_file_2.json")
    assert(completable(done, c))
  }

  test("completable: expected files not yet arrived") {
    assert(!completable(plane, upgraded.copy(expectedFilesCount = Some(2))))
  }

  // ---- optimistic transitions (T5) ---------------------------------------

  test("startCompilation is compare-and-set: second taker gets None") {
    val p1 = startCompilation(plane, 3)
    assert(p1.exists(_.collection(3).compilationStarted))
    assert(p1.flatMap(startCompilation(_, 3)).isEmpty)
  }

  test("complete sets completed_at + cached counts once, under the guard") {
    val c = compiled.copy(compilationStarted = true, compilationEnqueued = true)
    val p = withC(plane, c)
    val done = complete(p, 3, "now", 100, 0, 25)
    assert(done.exists { pl =>
      val k = pl.collection(3)
      k.completedAt.contains("now") && k.cachedCompiledReleasesCount.contains(25)
    })
    assert(done.flatMap(complete(_, 3, "later", 1, 1, 1)).isEmpty)
  }

  test("cancel is a logical delete") {
    assert(Control.cancel(plane, 2, "now").collection(2).deletedAt.contains("now"))
  }

  // ---- API file registration (S6, api_loader.py:28-50) -------------------

  test("registerFile records the file + LOAD step together") {
    val p = registerFile(plane, 1, "api/f9.json")
    assert(p.filesOf(1).exists(_.filename == "api/f9.json"))
    assert(p.stepsOf(1).exists(s => s.name == StepName.Load && s.filename.contains("api/f9.json")))
  }

  test("registerFile acks-and-skips unknown/deleted collections; replays are idempotent") {
    assert(registerFile(plane, 99, "x.json") === plane) // unknown
    val deleted = withC(plane, original.copy(deletedAt = Some("now")))
    assert(registerFile(deleted, 1, "x.json") === deleted) // deleted
    val once = registerFile(plane, 1, "x.json")
    assert(registerFile(once, 1, "x.json") === once) // duplicate message (T1)
  }

  // ---- transform-transition validation (V2, models.py:109-152) -----------

  test("validateNew: parent and transform must be paired") {
    assert(validateNew(plane, Collection(9, "s", "v", parent = Some(1)))
      === Seq("field_unpaired"))
    assert(validateNew(plane, Collection(9, "s", "v",
      transformType = Some(Transform.Upgrade1011))) === Seq("field_unpaired"))
  }

  test("validateNew: deleted parent rejected") {
    val p = withC(plane, original.copy(deletedAt = Some("now")))
    assert(validateNew(p, Collection(9, "s", "v", parent = Some(1),
      transformType = Some(Transform.CompileReleases))).contains("parent_deleted"))
  }

  test("validateNew: double transform of the same kind rejected") {
    assert(validateNew(plane, Collection(9, "s", "v", parent = Some(2),
      transformType = Some(Transform.Upgrade1011)))
      .contains("transform_duplicate_transition"))
  }

  test("validateNew: upgrading a compiled collection rejected") {
    assert(validateNew(plane, Collection(9, "s", "v", parent = Some(3),
      transformType = Some(Transform.Upgrade1011)))
      .contains("transform_invalid_transition"))
  }

  test("validateNew: duplicate sibling transform rejected") {
    assert(validateNew(plane, Collection(9, "s", "v", parent = Some(2),
      transformType = Some(Transform.CompileReleases)))
      .contains("transform_duplicated"))
  }

  test("validateNew: valid chains pass") {
    assert(validateNew(plane, Collection(9, "s", "v")) === Seq.empty)
    assert(validateNew(plane, Collection(9, "s", "v", parent = Some(1),
      transformType = Some(Transform.CompileReleases))) === Seq.empty)
  }
}
