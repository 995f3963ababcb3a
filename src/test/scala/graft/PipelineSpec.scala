package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.control.{Control, Wipe}
import graft.ingest.Sink

/** End-to-end §3.1: load → compile → check → finalize over real files,
  * then wipe the collection tree from the written lake. */
class PipelineSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def inputTree(): Path = {
    val dir = Files.createTempDirectory("graft-pipeline")
    Files.writeString(dir.resolve("a.json"),
      """{"uri": "http://x/a", "version": "1.1", "publisher": {"name": "A"},
        | "publishedDate": "2020-01-01T00:00:00Z",
        | "releases": [
        |   {"ocid": "ocds-a", "id": "a1", "date": "2020-01-01T00:00:00Z",
        |    "tag": ["planning"], "initiationType": "tender"},
        |   {"ocid": "ocds-a", "id": "a2", "date": "2020-01-02T00:00:00Z",
        |    "tag": ["tender"], "initiationType": "tender"}
        | ]}""".stripMargin)
    Files.writeString(dir.resolve("b.json"),
      """{"uri": "http://x/b", "version": "1.1", "publisher": {"name": "B"},
        | "publishedDate": "2020-01-02T00:00:00Z",
        | "releases": [
        |   {"ocid": "ocds-b", "id": "b1", "date": "2020-01-03T00:00:00Z",
        |    "tag": ["planning"]}
        | ]}""".stripMargin) // b1 misses required initiationType → 1 check failure
    dir
  }

  test("loadAndCompile runs §3.1 end-to-end and finalizes both collections") {
    val lake = Files.createTempDirectory("graft-lake").toString
    val report = Pipeline.loadAndCompile(s, inputTree().toString, lake, now = "2020-06-01 00:00:00")

    assert(report.files === 2)
    assert(report.items === 3)
    assert(report.distinctData === 3)
    assert(report.compiled === 2) // ocds-a merged from 2 releases, ocds-b from 1
    assert(report.checkFailures === 1) // b1's missing initiationType

    val orig = report.plane.collection(report.collectionId)
    val comp = report.plane.collection(report.compiledCollectionId)
    assert(orig.completedAt.contains("2020-06-01 00:00:00"))
    assert(orig.cachedReleasesCount.contains(3L))
    assert(comp.completedAt.nonEmpty && comp.compilationStarted)
    assert(comp.cachedCompiledReleasesCount.contains(2L))
    assert(report.plane.steps.isEmpty) // every LOAD step consumed (T2)

    // the lake is queryable: compiled ocds-a took last-write-wins tag path
    import org.apache.spark.sql.functions.col
    val compiled = Sink.readFacts(s, s"$lake/compiled_release")
    assert(compiled.filter(col("ocid") === "ocds-a")
      .select("n_releases").collect().head.getLong(0) === 2L)

    // and the wipe removes the whole tree from the written layout
    import s.implicits._
    val colls = Seq(
      (report.collectionId, Option.empty[Long], Option.empty[String]),
      (report.compiledCollectionId, Some(report.collectionId), Some("compile-releases"))
    ).toDF("id", "parent", "transform_type")
    val survivors = Wipe.wipeTrees(
      Sink.readFacts(s, s"$lake/release")
        .unionByName(compiled.select("collection_id", "ocid"), allowMissingColumns = true),
      colls, Seq(report.collectionId))
    assert(survivors.count() === 0)
  }

  test("record-package input is rejected toward the streaming path") {
    val dir = Files.createTempDirectory("graft-rec")
    Files.writeString(dir.resolve("r.json"),
      """{"uri": "http://x/r", "version": "1.1", "publisher": {"name": "R"},
        | "records": [{"ocid": "ocds-r", "releases": []}]}""".stripMargin)
    val lake = Files.createTempDirectory("graft-lake3").toString
    val e = intercept[IllegalArgumentException](
      Pipeline.loadAndCompile(s, dir.toString, lake))
    assert(e.getMessage.contains("recordCompileStream"))
  }

  test("a second run on the same ids is rejected by the run-once gates") {
    val lake = Files.createTempDirectory("graft-lake2").toString
    val dir = inputTree().toString
    val r1 = Pipeline.loadAndCompile(s, dir, lake)
    // replaying against the FINALIZED plane: complete() must refuse
    assert(Control.complete(r1.plane, r1.collectionId, "later", 9, 9, 9).isEmpty)
    assert(Control.startCompilation(r1.plane, r1.compiledCollectionId).isEmpty)
  }
}
