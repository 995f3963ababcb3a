package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.check.Checker
import graft.control.{Control, Notes}
import graft.ingest.{Ingest, Sink}
import graft.ocds.{Compile, Upgrade}

/** The `manage.py load … [--upgrade] --compile` flow (SURVEY.md §3.1) as ONE
  * batch pipeline — the entry point a user of the reference would reach for:
  * walk → register → detect → stream-load → [upgrade] → dedup-store →
  * persist → close → gate → compile (+notes) → check → finalize, with the
  * control plane threaded through as an immutable value.
  *
  * The collection DAG matches the loader's (`processors/loader.py:42-105`):
  * original → compiled, or original → upgraded → compiled when the upgrade
  * step is planned; the upgrade itself runs during load as a narrow map
  * over the loaded items (`file_worker.py:330-335`), its differs-warnings
  * persisted as WARNING collection notes (`create_logger_note`), and merge
  * warnings/failures as WARNING/ERROR notes (`compiler.py:75-84`) — all in
  * the `collection_note` lake table.
  *
  * The reference runs this as seven RabbitMQ workers against PostgreSQL;
  * here steps 1-2 are driver control-plane transitions, the load (and
  * optional upgrade) is one Spark job writing the partitioned lake, the
  * compile is one job with a single shuffle on ocid emitting compiled rows
  * AND notes from the same merge pass, and completion is a pure gate + CAS
  * transition. The only cross-node movement is Spark shuffles.
  */
object Pipeline {

  /** What the run did, plus the final control plane. */
  final case class LoadReport(
      collectionId: Long,
      upgradedCollectionId: Option[Long],
      compiledCollectionId: Long,
      dataVersion: String,
      files: Int,
      items: Long,
      distinctData: Long,
      compiled: Long,
      checkFailures: Long,
      notes: Long,
      plane: Control.Plane)

  /** Load every file under `inputDir` into collection `collectionId`,
    * optionally upgrade 1.0→1.1 into a derived collection, compile into the
    * final derived collection, structurally check the loaded rows, and
    * finalize the whole tree. `now` is the caller's clock (kept pure for
    * testability, like the control plane). */
  def loadAndCompile(
      spark: SparkSession,
      inputDir: String,
      lakeDir: String,
      collectionId: Long = 1L,
      now: String = "1970-01-01 00:00:00",
      upgrade: Boolean = false): LoadReport = {

    // §3.1 steps 1-2: create the collection DAG the loader builds
    // (`loader.py:42-105`) — original [→ upgraded] → compiled — validating
    // each transform transition like clean_fields (V2)
    val paths = Ingest.walk(spark, Seq(inputDir))
    require(paths.nonEmpty, s"no input files under $inputDir")
    val dataVersion = Ingest.dataVersion(spark, paths)
    val upgradedId = if (upgrade) Some(collectionId + 1) else None
    val compiledId = collectionId + (if (upgrade) 2 else 1)
    val original = Control.Collection(
      collectionId, sourceId = inputDir, dataVersion = dataVersion,
      steps = if (upgrade) Set("upgrade") else Set("compile"))
    var plane = Control.Plane(Map(collectionId -> original))
    def addChild(c: Control.Collection): Unit = {
      val errs = Control.validateNew(plane, c)
      require(errs.isEmpty, s"invalid transform: $errs")
      plane = plane.copy(collections = plane.collections.updated(c.id, c))
    }
    upgradedId.foreach { uid =>
      addChild(Control.Collection(
        uid, sourceId = inputDir, dataVersion = dataVersion,
        parent = Some(collectionId), steps = Set("compile"),
        transformType = Some(Control.Transform.Upgrade1011)))
    }
    addChild(Control.Collection(
      compiledId, sourceId = inputDir, dataVersion = dataVersion,
      parent = Some(upgradedId.getOrElse(collectionId)),
      transformType = Some(Control.Transform.CompileReleases)))

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
    def setFormat(id: Long): Unit =
      plane = plane.copy(collections = plane.collections.updated(id,
        plane.collection(id).copy(dataTypeFormat = Some(dt.format))))
    setFormat(collectionId)
    // persisted: the fact write and the dedup-store write both consume it —
    // without the persist each would re-open and re-parse every input file
    val items = Ingest.loadItems(spark, paths, dt).toDF()
      .withColumn("collection_id", lit(collectionId))
      .persist()
    Sink.writeFacts(items, s"$lakeDir/release")
    Sink.writeDedupStore(Ingest.dedupData(items), s"$lakeDir/data")
    val pkgs = Ingest.loadPackageData(spark, paths, dt).toDF()
    // persisted so later jobs (addchecks, metadata) can rebuild envelopes
    // without re-reading the source files
    Sink.writeByCollection(
      pkgs.withColumn("collection_id", lit(collectionId)), s"$lakeDir/package_data")

    // optional upgrade step, applied during load like `file_worker.py:
    // 330-335`: a narrow map re-content-addressing each item; the upgraded
    // collection gets its own file/step lifecycle rows, and the
    // differs-warnings become WARNING notes on it
    // NOTE: `up` (and therefore `items`) must stay persisted until the
    // notes frame derived from it is materialized below — unpersisting here
    // would silently re-run the whole load+upgrade from the source files
    // when the collection_note write finally evaluates
    val upgradeState: Option[(DataFrame, DataFrame)] = upgradedId.map { uid =>
      val up = Upgrade.upgradeItems(items, spark).toDF().persist()
      Sink.writeFacts(
        up.drop("upgrade_warnings").withColumn("collection_id", lit(uid)),
        s"$lakeDir/release")
      val notes = Notes.fromUpgradeWarnings(up, uid)
      plane = paths.foldLeft(plane)(Control.registerFile(_, uid, _))
      plane = paths.foldLeft(plane)((p, f) =>
        Control.completeStep(p, uid, Control.StepName.Load, Some(f)))
      setFormat(uid)
      (notes, up)
    }
    val upgradeNotes = upgradeState.map(_._1)
    // no-upgrade path: nothing downstream reads items — release the cache
    // before the compile shuffle competes for storage memory
    if (upgradeState.isEmpty) items.unpersist()
    plane = paths.foldLeft(plane)((p, f) =>
      Control.completeStep(p, collectionId, Control.StepName.Load, Some(f)))
    plane = Control.closeCollection(plane, collectionId, now, paths.size)
    upgradedId.foreach { uid =>
      plane = Control.closeCollection(plane, uid, now, paths.size)
    }

    // steps 5-6: compile gate (T4) on the collection that PLANS compile
    // (the upgraded one when present), run-once flip on the compiled
    // collection (T5, `compiler.py:59-62`), then ONE merge pass emitting
    // compiled rows and notes together, then the enqueued latch
    // (`compiler.py:106-108`)
    val compileBaseId = upgradedId.getOrElse(collectionId)
    require(Control.compilable(plane, plane.collection(compileBaseId)),
      "collection failed the compile gate")
    plane = Control.startCompilation(plane, compiledId)
      .getOrElse(throw new IllegalStateException("compilation already started"))
    val baseFacts = Sink.readFacts(spark, s"$lakeDir/release")
      .filter(col("collection_id") === compileBaseId)
    val compileOut = Compile.summariesAndWarnings(
      baseFacts.select(col("ocid"), col("release_date").as("date"),
        col("release_id").as("tiebreak"), col("data").as("release")), spark)
      .toDF()
      .persist()
    val compiled = compileOut.filter(col("summary").isNotNull)
      .select(col("summary.*"))
      .withColumn("collection_id", lit(compiledId))
    Sink.writeFacts(compiled, s"$lakeDir/compiled_release")
    val compileNotes = Notes.fromCompileWarnings(
      compileOut.filter(col("warning").isNotNull).select(col("warning.*")), compiledId)
    val allNotes = upgradeNotes.fold(compileNotes)(_.unionByName(compileNotes)).persist()
    Sink.writeByCollection(allNotes, s"$lakeDir/collection_note")
    // counted from the in-flight frame: an all-clean run writes an EMPTY
    // note table, which parquet cannot re-read (no footers to infer from)
    val nNotes = allNotes.count()
    allNotes.unpersist()
    compileOut.unpersist()
    upgradeState.foreach { case (_, up) => up.unpersist(); items.unpersist() }
    plane = plane.copy(collections = plane.collections.updated(compiledId,
      plane.collection(compiledId).copy(compilationEnqueued = true)))

    // V1 structural checks on the ORIGINAL rows: rebuild each item's
    // envelope from ITS file's package metadata (checker.py:101-108) and
    // validate. The check row's id is the fact row's stable content key —
    // deterministic across runs and partitionings (the reference keys
    // release_check on the release row's PK), unlike
    // monotonically_increasing_id.
    val facts = Sink.readFacts(spark, s"$lakeDir/release")
      .filter(col("collection_id") === collectionId)
    val checkFailures = Checker.checkItems(
      facts.select("filename", "ocid", "release_id", "hash_md5", "data")
        .join(pkgs.select("filename", "package_data"), Seq("filename"), "left")
        .select(Checker.checkId.as("id"), col("data"), col("package_data")),
      "release", spark)
      .filter(!col("ok")).count()

    // step 7: completion gates + cached counts under the optimistic guard,
    // leaf-first: compiled → upgraded → original
    val nItems = facts.count()
    val nCompiled = Sink.readFacts(spark, s"$lakeDir/compiled_release")
      .filter(col("collection_id") === compiledId).count()
    val nData = Sink.readDedupStore(spark, s"$lakeDir/data").count()
    plane = Control.complete(plane, compiledId, now, 0L, 0L, nCompiled)
      .getOrElse(throw new IllegalStateException("compiled collection not completable"))
    upgradedId.foreach { uid =>
      plane = Control.complete(plane, uid, now, nItems, 0L, 0L)
        .getOrElse(throw new IllegalStateException("upgraded collection not completable"))
    }
    plane = Control.complete(plane, collectionId, now, nItems, 0L, 0L)
      .getOrElse(throw new IllegalStateException("collection not completable"))

    LoadReport(collectionId, upgradedId, compiledId, dataVersion, paths.size,
      nItems, nData, nCompiled, checkFailures, nNotes, plane)
  }
}
