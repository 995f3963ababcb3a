package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A/B harness for q_line_dedup's first-occurrence election, spelled
  * three ways over the identical keyed-line stream:
  *
  *   window   min(struct(doc_id, line_idx)) over (partition by lkey) —
  *            one exchange, the line stream derives ONCE (the LIVE
  *            engine);
  *   join     groupBy(lkey).min + co-keyed SHUFFLE_HASH join-back — the
  *            r16 first cut, argued from AQE skew-splittability; in
  *            practice the agg's exchange carries partial-min rows so
  *            the two lkey exchanges can never be one ReuseExchange and
  *            the whole derivation (page split, regex normalization,
  *            md5) runs TWICE;
  *   repart   the join with an explicit shared repartition(lkey) meant
  *            to force exchange reuse — it does not (the repartition
  *            subtree still plans separately under agg and join) and
  *            adds a third shuffle.
  *
  * Measured on the 10× replica (full pipeline through the per-source
  * rollup, interleaved min-of-3, r16 session): window 0.7 s, join
  * 20.8 s, repart 20.9 s — the ~30× gap is why the engine switched
  * spellings. Recorded here so
  * the join respelling is not retried; the hot-key escape hatch at
  * 10^8-repetition skew is a salted two-level election, not the join.
  *
  * Test-scoped measurement harness, not library surface. Run:
  *   sbt "Test/runMain graft.AbLineDedupBench /tmp/graft_sf1"
  */
object AbLineDedupBench {

  private def pageDocs(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(coalesce(col("text"), lit("")), " ")
    val nLines = ((size(toks) + lit(2)) / lit(3)).cast(IntegerType)
    val page = array_join(transform(sequence(lit(0), nLines - 1),
      i => array_join(slice(toks, i * 3 + 1, lit(3)), " ")), "\n")
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("doc_id"), page.as("text"))
  }

  private def keyed(docs: DataFrame): DataFrame =
    TextQueries.keyedLinesOf(docs)

  private def occ = struct(col("doc_id"), col("line_idx"))

  private def windowElect(k: DataFrame): DataFrame =
    k.withColumn("keep", occ === min(occ).over(Window.partitionBy("lkey")))

  private def joinElect(k: DataFrame): DataFrame =
    k.join(
        k.groupBy(col("lkey")).agg(min(occ).as("fo")).hint("SHUFFLE_HASH"),
        Seq("lkey"))
      .withColumn("keep", occ === col("fo"))

  private def repartElect(k0: DataFrame): DataFrame = {
    val k = k0.repartition(col("lkey"))
    k.join(
        k.groupBy(col("lkey")).agg(min(occ).as("fo")).hint("SHUFFLE_HASH"),
        Seq("lkey"))
      .withColumn("keep", occ === col("fo"))
  }

  private def drain(flagged: DataFrame): Long =
    TextQueries.reassembleLines(
      flagged.select(col("source"), col("doc_id"), col("line_idx"),
        col("line"), col("keep")))
      .groupBy("source")
      .agg(sum(col("n_lines")), sum(col("n_dup")), sum(length(col("clean_text"))))
      .count()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = pageDocs(spark, dir)
    val engines: Seq[(String, () => Long)] = Seq(
      "window" -> (() => drain(windowElect(keyed(docs)))),
      "join" -> (() => drain(joinElect(keyed(docs)))),
      "repart" -> (() => drain(repartElect(keyed(docs)))))
    // interleaved min-of-3 (the Bench noise discipline)
    val times = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(Double.MaxValue)
    for (_ <- 1 to 3; (name, run) <- engines) {
      val t0 = System.nanoTime
      run()
      val s = (System.nanoTime - t0) / 1e9
      times(name) = math.min(times(name), s)
    }
    engines.foreach { case (n, _) => println(f"[ab-linededup] $n ${times(n)}%.2f s") }
  }
}
