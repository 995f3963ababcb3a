package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B harness for q_knn_join's nominate stage: per-query top-R candidate
  * selection over the (corpus × queries) scored stream, spelled two ways:
  *
  *   window  row_number() over (partition by qid order by dscore desc, id)
  *           then filter rn <= R — declarative, but EVERY scored row
  *           shuffles to its query's window partition before truncation;
  *   topk    groupBy(qid) + the native bounded topk_pairs aggregate —
  *           map-side partials of R entries per (partition, query), so the
  *           shuffle carries only partials (the LIVE engine).
  *
  * Same scored-frame definition feeds both; interleaved min-of-N passes
  * (Bench.scala's noise discipline). The embeddings payload rides both
  * engines (the window spelling carries it as a projected column), so the
  * comparison is shuffle-shape-only. Numbers recorded in the q_knn_join
  * QueryDef scaladoc.
  *
  * Test-scoped measurement harness, not library surface. Run:
  *   sbt "Test/runMain graft.AbKnnBench /root/testdata/sf0.1"
  */
object AbKnnBench {
  private val R = 20
  private val QMod = 25

  private def scoredOf(emb: DataFrame): DataFrame = {
    val q = emb.filter(pmod(col("vec_id"), lit(QMod)) === 0)
      .filter(call_function("dot_double", col("embedding"), col("embedding")) > 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    emb.filter(pmod(col("vec_id"), lit(QMod)) =!= 0)
      .filter(call_function("dot_double", col("embedding"), col("embedding")) > 0)
      .crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"), col("embedding"),
        (call_function("dot_double", col("embedding"), col("qe")) /
          (sqrt(call_function("dot_double", col("embedding"), col("embedding"))) *
            sqrt(call_function("dot_double", col("qe"), col("qe"))))).as("dscore"))
  }

  private def nomWindow(scored: DataFrame): DataFrame =
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("dscore").desc, col("vec_id"))))
      .filter(col("rn") <= R)
      .select("qid", "vec_id", "embedding")

  private def nomTopk(scored: DataFrame): DataFrame =
    scored.groupBy("qid")
      .agg(call_function("topk_pairs",
        col("dscore"), col("vec_id"), col("embedding"), lit(R)).as("cand"))
      .select(col("qid"), explode(col("cand")).as("c"))
      .select(col("qid"), col("c.id").as("vec_id"), col("c.payload").as("embedding"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).flatMap(_.toIntOption).getOrElse(5)
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
    val emb = Tables.embeddings(spark, sfDir)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "nom_window" -> (() => nomWindow(scoredOf(emb))),
      "nom_topk" -> (() => nomTopk(scoredOf(emb))))
    val best = collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    for (p <- 1 to passes; (name, mk) <- variants) {
      val t = once(mk())
      best(name) = math.min(best(name), t)
      println(f"pass $p $name%-12s $t%7.3f s (best ${best(name)}%7.3f)")
    }
    println(best.toSeq.sortBy(_._1).map { case (n, t) => f"$n=$t%.3f" }.mkString("RESULT ", " ", s" sf=$sfDir"))
    spark.stop()
  }
}
