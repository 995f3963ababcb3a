package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.check.Checker
import graft.control.Control
import graft.ingest.{Ingest, Sink}
import graft.ocds.Compile

/** The `manage.py load … --compile` flow (SURVEY.md §3.1) as ONE batch
  * pipeline — the entry point a user of the reference would reach for:
  * walk → register → detect → stream-load → dedup-store → persist →
  * close → gate → compile → check → finalize, with the control plane
  * threaded through as an immutable value.
  *
  * The reference runs this as seven RabbitMQ workers against PostgreSQL;
  * here steps 1-2 are driver control-plane transitions, steps 3-5 are one
  * Spark job writing the partitioned lake, step 6 is the compile job (one
  * shuffle on ocid), and completion is a pure gate + CAS transition. The
  * only cross-node movement is Spark shuffles.
  */
object Pipeline {

  /** What the run did, plus the final control plane. */
  final case class LoadReport(
      collectionId: Long,
      compiledCollectionId: Long,
      dataVersion: String,
      files: Int,
      items: Long,
      distinctData: Long,
      compiled: Long,
      checkFailures: Long,
      plane: Control.Plane)

  /** Load every file under `inputDir` into collection `collectionId`,
    * compile it into the derived collection, structurally check the loaded
    * rows, and finalize both collections. `now` is the caller's clock
    * (kept pure for testability, like the control plane). */
  def loadAndCompile(
      spark: SparkSession,
      inputDir: String,
      lakeDir: String,
      collectionId: Long = 1L,
      now: String = "1970-01-01 00:00:00"): LoadReport = {

    // §3.1 steps 1-2: create the original + compiled collections (the DAG
    // the loader builds, `processors/loader.py:42-105`), validating the
    // transform transition like clean_fields (V2)
    val paths = Ingest.walk(spark, Seq(inputDir))
    require(paths.nonEmpty, s"no input files under $inputDir")
    val dataVersion = Ingest.dataVersion(spark, paths)
    val compiledId = collectionId + 1
    val original = Control.Collection(
      collectionId, sourceId = inputDir, dataVersion = dataVersion,
      steps = Set("compile"))
    var plane = Control.Plane(Map(collectionId -> original))
    val child = Control.Collection(
      compiledId, sourceId = inputDir, dataVersion = dataVersion,
      parent = Some(collectionId),
      transformType = Some(Control.Transform.CompileReleases))
    val errs = Control.validateNew(plane, child)
    require(errs.isEmpty, s"invalid transform: $errs")
    plane = plane.copy(collections = plane.collections.updated(compiledId, child))

    // step 3: register each file with its LOAD step (the api_loader path)
    plane = paths.foldLeft(plane)(Control.registerFile(_, collectionId, _))

    // step 4: detect once, stream-load on the executors, dedup, persist.
    // This batch entry point handles release packages (the load --compile
    // case); record packages compile incrementally per file instead —
    // that's graft.streaming.Streaming.recordCompileStream (T4).
    val dt = Ingest.detectDataType(spark, paths.head)
    require(dt.format == graft.ingest.FormatDetect.Format.ReleasePackage,
      s"loadAndCompile handles release packages; got '${dt.format}' " +
        "(record packages: use streaming.recordCompileStream)")
    plane = plane.copy(collections = plane.collections.updated(collectionId,
      plane.collection(collectionId).copy(dataTypeFormat = Some(dt.format))))
    // persisted: the fact write and the dedup-store write both consume it —
    // without the persist each would re-open and re-parse every input file
    val items = Ingest.loadItems(spark, paths, dt).toDF()
      .withColumn("collection_id", lit(collectionId))
      .persist()
    Sink.writeFacts(items, s"$lakeDir/release")
    Sink.writeDedupStore(Ingest.dedupData(items), s"$lakeDir/data")
    items.unpersist()
    val pkgs = Ingest.loadPackageData(spark, paths, dt).toDF()
    plane = paths.foldLeft(plane)((p, f) =>
      Control.completeStep(p, collectionId, Control.StepName.Load, Some(f)))
    plane = Control.closeCollection(plane, collectionId, now, paths.size)

    // steps 5-6: compile gate (T4), run-once flip on the compiled
    // collection (T5, `compiler.py:59-62`), the compile job, then the
    // enqueued latch (`compiler.py:106-108`)
    require(Control.compilable(plane, plane.collection(collectionId)),
      "collection failed the compile gate")
    plane = Control.startCompilation(plane, compiledId)
      .getOrElse(throw new IllegalStateException("compilation already started"))
    val facts = Sink.readFacts(spark, s"$lakeDir/release")
      .filter(col("collection_id") === collectionId)
    val compiled = Compile.summaries(
      facts.select(col("ocid"), col("release_date").as("date"),
        col("release_id").as("tiebreak"), col("data").as("release")), spark)
      .toDF()
      .withColumn("collection_id", lit(compiledId))
    Sink.writeFacts(compiled, s"$lakeDir/compiled_release")
    plane = plane.copy(collections = plane.collections.updated(compiledId,
      plane.collection(compiledId).copy(compilationEnqueued = true)))

    // V1 structural checks: rebuild each item's envelope from ITS file's
    // package metadata (checker.py:101-108) and validate
    val checkFailures = Checker.checkItems(
      facts.join(pkgs, Seq("filename"), "left")
        .select(monotonically_increasing_id().as("id"), col("data"), col("package_data")),
      "release", spark)
      .filter(!col("ok")).count()

    // step 7: completion gates + cached counts under the optimistic guard
    val nItems = facts.count()
    val nCompiled = Sink.readFacts(spark, s"$lakeDir/compiled_release")
      .filter(col("collection_id") === compiledId).count()
    val nData = Sink.readDedupStore(spark, s"$lakeDir/data").count()
    plane = Control.complete(plane, compiledId, now, 0L, 0L, nCompiled)
      .getOrElse(throw new IllegalStateException("compiled collection not completable"))
    plane = Control.complete(plane, collectionId, now, nItems, 0L, 0L)
      .getOrElse(throw new IllegalStateException("collection not completable"))

    LoadReport(collectionId, compiledId, dataVersion, paths.size, nItems,
      nData, nCompiled, checkFailures, plane)
  }
}
