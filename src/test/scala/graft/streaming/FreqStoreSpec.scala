package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The persistent term-frequency sketch: batch-fold correctness in the
  * exact regime, MG bounds in the lossy regime (driver fold vs a
  * brute-force truth over the union stream), replayed-batch idempotence,
  * capacity mismatch rejection, atomic save round-trip, and a real
  * foreachBatch MemoryStream end-to-end. */
class FreqStoreSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def tmpDir(): String =
    Files.createTempDirectory("graft-freqstore").toString

  private def docs(texts: String*): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    texts.toDF("text")
  }

  test("two batches fold to the exact union counts (exact regime), replay is a no-op") {
    val dir = tmpDir()
    val s1 = FreqStore.appendBatch(dir, docs("a a b", "c a"), "text", batchId = 0L, capacity = 64)
    assert(s1.items === Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    assert(s1.dropped === 0L)
    val s2 = FreqStore.appendBatch(dir, docs("b b d"), "text", batchId = 1L, capacity = 64)
    assert(s2.items === Map("a" -> 3L, "b" -> 3L, "c" -> 1L, "d" -> 1L))
    // replay of batch 1 (recovery re-delivery): counts must not double
    val s3 = FreqStore.appendBatch(dir, docs("b b d"), "text", batchId = 1L, capacity = 64)
    assert(s3.items === s2.items && s3.dropped === s2.dropped)
    // and the stored file round-trips exactly
    assert(FreqStore.load(dir).get === s3)
  }

  test("capacity mismatch with an existing store is rejected loudly") {
    val dir = tmpDir()
    FreqStore.appendBatch(dir, docs("a"), "text", batchId = 0L, capacity = 32)
    val e = intercept[IllegalArgumentException] {
      FreqStore.appendBatch(dir, docs("b"), "text", batchId = 1L, capacity = 64)
    }
    assert(e.getMessage.contains("capacity"))
  }

  test("lossy regime: folded sketch keeps MG bounds against the union-stream truth") {
    val rnd = new scala.util.Random(13)
    def batchTexts(n: Int): Seq[String] = Seq.fill(n) {
      Seq.fill(20) {
        val r = rnd.nextDouble()
        if (r < 0.4) s"hot${rnd.nextInt(5)}"
        else s"cold${rnd.nextInt(3000)}"
      }.mkString(" ")
    }
    val b0 = batchTexts(60)
    val b1 = batchTexts(60)
    val dir = tmpDir()
    FreqStore.appendBatch(dir, docs(b0: _*), "text", batchId = 0L, capacity = 48)
    val sk = FreqStore.appendBatch(dir, docs(b1: _*), "text", batchId = 1L, capacity = 48)
    val truth = (b0 ++ b1).flatMap(_.split(" ")).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    assert(sk.items.size <= 48)
    assert(sk.dropped > 0L) // cardinality >> capacity: the bound is live
    sk.items.foreach { case (k, est) =>
      val t = truth.getOrElse(k, 0L)
      assert(est <= t, s"$k: est $est > true $t")
      assert(t <= est + sk.dropped, s"$k: true $t > est+dropped ${est + sk.dropped}")
    }
    // detection: anything truly heavier than the dropped mass is present
    truth.foreach { case (k, t) =>
      if (t > sk.dropped) assert(sk.items.contains(k), s"lost $k (true $t > dropped ${sk.dropped})")
    }
  }

  test("all-purged batch edge: an all-distinct over-capacity batch still folds a sound bound") {
    // > capacity distinct singleton tokens: every partial counter ties
    // at est=1, the final merge's shrink subtracts 1 and removes ALL
    // counters — the batch sketch is an EMPTY array whose dropped mass
    // has no row to ride on. Reading it as 0 would understate the
    // stored bound (r12 review); the fold substitutes the batch token
    // total, a sound over-bound.
    val dir = tmpDir()
    val toks = (1 to 40).map(i => s"u$i").mkString(" ")
    val sk = FreqStore.appendBatch(dir, docs(toks), "text", batchId = 0L, capacity = 8)
    // whatever survived, every bound must hold vs the truth (each tok once)
    sk.items.foreach { case (k, est) =>
      assert(est <= 1L && 1L <= est + sk.dropped, s"$k bounds")
    }
    // the sound over-bound: any untracked token's true count (1) must be
    // <= dropped, so dropped >= 1 — and with the empty-sketch fallback it
    // is the batch token total when everything purged
    assert(sk.dropped >= 1L, s"dropped ${sk.dropped} understates the subtracted mass")
  }

  test("lineage reset: a new lineage's batch 0 folds instead of being dropped as a replay") {
    // the r12-advice scenario in unit form: lineage "run-a" advances the
    // watermark to 1; a checkpoint reset restarts batch ids at 0 under a
    // NEW lineage — the old guard (batchId <= lastBatchId) would silently
    // drop the fresh batch
    val dir = tmpDir()
    FreqStore.appendBatch(dir, docs("a a"), "text", batchId = 0L, capacity = 64, lineage = "run-a")
    FreqStore.appendBatch(dir, docs("b"), "text", batchId = 1L, capacity = 64, lineage = "run-a")
    val sk = FreqStore.appendBatch(dir, docs("c c"), "text", batchId = 0L, capacity = 64, lineage = "run-b")
    assert(sk.items === Map("a" -> 2L, "b" -> 1L, "c" -> 2L))
    assert(sk.lineage === Some("run-b") && sk.lastBatchId === 0L)
    // and the guard re-arms within the NEW lineage: replaying ITS batch 0
    // is a no-op again
    val sk2 = FreqStore.appendBatch(dir, docs("c c"), "text", batchId = 0L, capacity = 64, lineage = "run-b")
    assert(sk2.items === sk.items && sk2.dropped === sk.dropped)
  }

  test("checkpoint reset + genuinely new file: the stream counts it (not a silent drop)") {
    // end-to-end form of the same advice: after sk2 the checkpoint dir is
    // deleted AND a new file lands; the restarted stream delivers it as
    // batch 0 — under the lineage-scoped guard its tokens must fold
    val baseDir = Files.createTempDirectory("graft-freqlineage")
    val landing = Files.createDirectories(baseDir.resolve("landing"))
    val lake = Files.createDirectories(baseDir.resolve("lake")).toString
    val ckpt = baseDir.resolve("ckpt").toString
    val plane = new java.util.concurrent.atomic.AtomicReference(
      graft.control.Control.Plane(Map(
        72L -> graft.control.Control.Collection(72L, "api", "2020-01-01 00:00:00"))))
    def pkg(rid: String, desc: String): String =
      s"""{"uri": "http://x/$rid", "version": "1.1", "publisher": {"name": "P"},
         | "publishedDate": "2020-01-01T00:00:00Z",
         | "releases": [{"ocid": "ocds-ft2", "id": "$rid",
         |   "date": "2020-01-01T00:00:00Z", "tag": ["tender"],
         |   "initiationType": "tender", "description": "$desc"}]}""".stripMargin
    def runOnce(): Unit =
      Streaming.releaseLoadStream(s, landing.toString, lake, 72L, None, plane,
        ckpt, trendingTerms = true).awaitTermination()

    Files.writeString(landing.resolve("a.json"), pkg("r1", "delta delta"))
    runOnce()
    assert(FreqStore.load(s"$lake/freq_sketch").get.items.get("delta").contains(2L))
    // reset the checkpoint, land a NEW file: it arrives as batch 0 again
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    Files.writeString(landing.resolve("b.json"), pkg("r2", "epsilon"))
    runOnce()
    val sk = FreqStore.load(s"$lake/freq_sketch").get
    assert(sk.items.get("delta").contains(2L), sk.items)
    assert(sk.items.get("epsilon").contains(1L),
      s"new-lineage batch silently dropped: ${sk.items}")
  }

  test("foreachBatch end-to-end: a MemoryStream keeps the sketch current across micro-batches") {
    import s.implicits._
    val dir = tmpDir()
    val input = MemoryStream[String](s)
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        FreqStore.appendBatch(dir, batch.withColumnRenamed("value", "text"), "text", id)
        ()
      }
      .start()
    try {
      input.addData("x y x")
      q.processAllAvailable()
      assert(FreqStore.load(dir).get.items === Map("x" -> 2L, "y" -> 1L))
      input.addData("y z")
      q.processAllAvailable()
      val sk = FreqStore.load(dir).get
      assert(sk.items === Map("x" -> 2L, "y" -> 2L, "z" -> 1L))
      assert(sk.lastBatchId === 1L)
    } finally q.stop()
  }

  test("releaseLoadStream with trendingTerms keeps <lake>/freq_sketch current and replay-safe") {
    val baseDir = Files.createTempDirectory("graft-freqstream")
    val landing = Files.createDirectories(baseDir.resolve("landing"))
    val lake = Files.createDirectories(baseDir.resolve("lake")).toString
    val ckpt = baseDir.resolve("ckpt").toString
    val plane = new java.util.concurrent.atomic.AtomicReference(
      graft.control.Control.Plane(Map(
        71L -> graft.control.Control.Collection(71L, "api", "2020-01-01 00:00:00"))))
    def pkg(rid: String, desc: String): String =
      s"""{"uri": "http://x/$rid", "version": "1.1", "publisher": {"name": "P"},
         | "publishedDate": "2020-01-01T00:00:00Z",
         | "releases": [{"ocid": "ocds-ft1", "id": "$rid",
         |   "date": "2020-01-01T00:00:00Z", "tag": ["tender"],
         |   "initiationType": "tender", "description": "$desc"}]}""".stripMargin
    def runOnce(): Unit =
      Streaming.releaseLoadStream(s, landing.toString, lake, 71L, None, plane,
        ckpt, trendingTerms = true).awaitTermination()

    Files.writeString(landing.resolve("a.json"), pkg("r1", "alpha beta alpha"))
    runOnce()
    val sk1 = FreqStore.load(s"$lake/freq_sketch").get
    // the doc text is the whole canonicalized package — pin the marker
    // terms rather than the envelope noise
    assert(sk1.items.get("alpha").contains(2L) && sk1.items.get("beta").contains(1L), sk1.items)
    Files.writeString(landing.resolve("b.json"), pkg("r2", "beta gamma"))
    runOnce()
    val sk2 = FreqStore.load(s"$lake/freq_sketch").get
    assert(sk2.items.get("alpha").contains(2L), sk2.items)
    assert(sk2.items.get("beta").contains(2L), sk2.items)
    assert(sk2.items.get("gamma").contains(1L), sk2.items)
    // lost-checkpoint replay: files already registered → fresh is empty,
    // the sketch must not double-count
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    runOnce()
    assert(FreqStore.load(s"$lake/freq_sketch").get.items === sk2.items)
  }

  test("driver fold equals the aggregate's own merge in the exact regime") {
    // the parity referee for the shared MisraGries math: running the
    // DISTRIBUTED aggregate over the union must equal folding the two
    // per-batch sketches on the driver, whenever capacity covers the
    // stream (both are then exact count maps)
    import s.implicits._
    graft.functions.GraftExtensions.ensureRegistered(s)
    val rnd = new scala.util.Random(5)
    val a = Seq.fill(800)(s"t${rnd.nextInt(60)}")
    val b = Seq.fill(800)(s"t${rnd.nextInt(60)}")
    def sketchOf(xs: Seq[String]): Seq[(String, Long)] =
      xs.toDF("t").repartition(4)
        .selectExpr("freq_items(t, 128) AS hh")
        .selectExpr("explode(hh) AS e").selectExpr("e.item", "e.est")
        .as[(String, Long)].collect().toSeq
    val unionSketch = sketchOf(a ++ b).toMap
    val folded = FreqStore.fold(
      FreqStore.Sketch(128, 0L, -1L, sketchOf(a).toMap), sketchOf(b), 0L)
    assert(folded.items === unionSketch)
    assert(folded.dropped === 0L)
  }
}
