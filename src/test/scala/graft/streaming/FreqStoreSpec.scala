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
