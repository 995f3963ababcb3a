package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A/B harness for q_mix_epoch's per-source rank stage:
  *
  *   distributed   the LIVE engine (TextQueries.mixEpochOf) — rank within
  *                 (source, bucket) windows + broadcast prefix offsets
  *                 from the sources × buckets count frame (the
  *                 zipWithIndex idiom); window parallelism =
  *                 sources × buckets;
  *   global        the naive spelling — ONE row_number window per source
  *                 (PARTITION BY source ORDER BY bucket, h, doc_id), the
  *                 same total order in one shot. Correct, and simpler,
  *                 but every source is a single window partition: a
  *                 dominant source serializes onto one task, and at
  *                 100 TB a 90%-of-corpus source becomes one partition
  *                 holding 90 TB — the exact bottleneck mixScheduleOf's
  *                 scaladoc warns about.
  *
  * Parity is asserted first (identical epoch rows from both spellings —
  * the offsets math must reproduce the global rank exactly), then
  * interleaved min-of-N timing (the Bench noise discipline). Numbers
  * recorded in mixEpochOf's scaladoc.
  *
  * Test-scoped measurement harness, not library surface. Run:
  *   sbt "Test/runMain graft.AbEpochRankBench /root/testdata/sf0.1 [passes] [budget]"
  */
object AbEpochRankBench {

  // the LIVE spelling, shared with the QueryDef so the A/B measures what
  // ships (the AbAsofBench precedent)
  private def epochDistributed(docs: DataFrame, budget: Long, nShards: Int): DataFrame =
    TextQueries.mixEpochOf(docs, budget, nShards)

  /** The naive rank: independently re-derived (hash, targets, repetition)
    * so parity is a real cross-check, with the rank coming from one
    * global per-source window. */
  private def epochGlobalWindow(docs: DataFrame, budget: Long, nShards: Int): DataFrame = {
    val Dec = DecimalType(38, 18)
    def h(id: org.apache.spark.sql.Column, tag: String) =
      conv(substring(md5(concat(id.cast(StringType), lit(tag))), 1, 15), 16, 10)
        .cast(LongType)
    val toks = split(col("text"), " ")
    val per = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks).cast(LongType)).as("n_tokens"))
      .withColumn("w_dec", sqrt(col("n_tokens").cast(DoubleType)).cast(Dec))
    val tot = per.agg(sum(col("w_dec")).cast(Dec).as("w_tot"))
    val share = round(
      col("w_dec").cast(DoubleType) / col("w_tot").cast(DoubleType), 9)
    val targets = per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        floor(lit(budget.toDouble) * share).cast(LongType).as("n_target"))
    val based = docs.select(col("source"), col("doc_id"),
        h(col("doc_id"), ":epoch:0").as("h"))
      .withColumn("bucket", pmod(col("h"), lit(nShards.toLong)))
    // THE variant: one window partition per source — same total order
    val wGlobal = Window.partitionBy(col("source"))
      .orderBy(col("bucket"), col("h"), col("doc_id"))
    val emitted = based
      .withColumn("r", row_number().over(wGlobal).cast(LongType))
      .join(broadcast(targets), Seq("source"))
      .withColumn("reps",
        expr("CASE WHEN r <= n_target THEN (n_target - r) div n_docs + 1 " +
          "ELSE CAST(0 AS BIGINT) END"))
      .filter(col("reps") > 0)
      .select(col("source"), col("doc_id"), col("n_docs"), col("n_target"),
        col("r"), explode(expr("sequence(CAST(0 AS BIGINT), reps - 1)")).as("j"))
      .withColumn("k", col("r") - 1 + col("j") * col("n_docs"))
    val sharded = emitted.withColumn("h2",
        h(concat_ws(":", col("doc_id"), col("k")), ":epoch-shard:0"))
      .withColumn("shard", pmod(col("h2"), lit(nShards.toLong)))
    val w2 = Window.partitionBy(col("shard"), col("source"))
      .orderBy(col("h2"), col("doc_id"), col("k"))
    sharded
      .withColumn("rn2", row_number().over(w2).cast(LongType))
      .select(col("shard"),
        ((col("rn2") * 2 - 1).cast(DoubleType)
          / (col("n_target") * 2).cast(DoubleType)).as("vtime"),
        col("source"), col("doc_id"), col("k"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).flatMap(_.toIntOption).getOrElse(5)
    val budget = args.lift(2).flatMap(_.toLongOption).getOrElse(100000L)
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftExtensions.install)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val docs = Tables.documents(spark, sfDir)
    val nShards = 4
    // parity first: the offsets math must reproduce the global rank's
    // epoch EXACTLY (same rows, same vtimes)
    def rows(df: DataFrame) = df
      .select(col("shard"), round(col("vtime"), 9).as("v"), col("source"),
        col("doc_id"), col("k"))
      .collect().map(_.toSeq).toSet
    val a = rows(epochDistributed(docs, budget, nShards))
    val b = rows(epochGlobalWindow(docs, budget, nShards))
    require(a == b, s"spellings disagree: ${(a diff b).take(2)} vs ${(b diff a).take(2)}")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "epoch_distributed" -> (() => epochDistributed(docs, budget, nShards)),
      "epoch_global_window" -> (() => epochGlobalWindow(docs, budget, nShards)))
    val best = collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    for (p <- 1 to passes; (name, mk) <- variants) {
      val t = once(mk())
      best(name) = math.min(best(name), t)
      println(f"pass $p $name%-20s $t%7.3f s (best ${best(name)}%7.3f)")
    }
    println(best.toSeq.sortBy(_._1).map { case (n, t) => f"$n=$t%.3f" }
      .mkString("RESULT ", " ", s" sf=$sfDir budget=$budget"))
    spark.stop()
  }
}
