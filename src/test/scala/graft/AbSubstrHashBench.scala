package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B harness for the pre-hashed-gram ExactSubstr shuffle mode (VERDICT
  * r11 Next #2): the engine's one wide exchange carries the shingle
  * stream, and the mode's whole claim is a SHUFFLE-BYTE reduction —
  * 8-byte xxhash64 keys vs W-token gram strings — so this harness
  * measures exactly that, per variant, via a stage-metrics listener
  * (shuffle bytes WRITTEN summed over the query's stages), alongside
  * min-of-N interleaved wall times (Bench.scala's noise discipline).
  *
  * Output parity between the modes is pinned separately by
  * SubstrHashParitySpec at sf0.01; this harness is measurement only.
  *
  * Test-scoped on purpose: a measurement harness, not library surface.
  * Run against any SF dir or a ScaleGen replica:
  *   sbt "Test/runMain graft.AbSubstrHashBench /root/testdata/sf0.1"
  */
object AbSubstrHashBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).flatMap(_.toIntOption).getOrElse(4)
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftExtensions.install)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage-completion listener: sums shuffle bytes written across every
    // stage that ran while a measurement window was open. The listener
    // bus is async, so each window closes with a bounded drain wait.
    val bytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def measured(df: => DataFrame): (Double, Long) = {
      Thread.sleep(300) // drain events from any previous window
      bytes.set(0)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the async bus deliver this run's stages
      (secs, bytes.get())
    }

    val docs = Tables.fanOut(Tables.documents(spark, sfDir))
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "dedup_string" -> (() => TextQueries.substrDedupOf(docs)),
      "dedup_hashed" -> (() => TextQueries.substrDedupOf(docs, hashedShuffleKeys = true)),
      "scrub_string" -> (() => TextQueries.substrScrubOf(docs)),
      "scrub_hashed" -> (() => TextQueries.substrScrubOf(docs, hashedShuffleKeys = true)))
    val bestT = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val shufB = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    for (pass <- 0 to passes; (name, thunk) <- variants) {
      val (t, b) = measured(thunk())
      if (pass > 0) {
        bestT(name) = math.min(bestT.getOrElse(name, Double.MaxValue), t)
        // shuffle bytes are deterministic per plan; keep the min to shed
        // any spillover from a late-draining previous window
        shufB(name) = math.min(shufB.getOrElse(name, Long.MaxValue), b)
      }
    }
    for ((k, v) <- bestT)
      println(f"ABSUBSTR $k%-13s ${v}%7.3f s  shuffle=${shufB(k) / 1048576.0}%9.1f MiB")
    for (q <- Seq("dedup", "scrub")) {
      println(f"ABSUBSTR $q hashed/string time  = ${bestT(s"${q}_hashed") / bestT(s"${q}_string")}%.3f")
      println(f"ABSUBSTR $q hashed/string bytes = ${shufB(s"${q}_hashed").toDouble / shufB(s"${q}_string")}%.3f")
    }
    spark.stop()
  }
}
