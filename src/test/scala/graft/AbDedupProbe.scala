package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** r21 measurement probe for the MinHash/CC dedup family (VERDICT r20
  * Next #1): times each leg (signatures, candidates, verify, CC) with the
  * noop sink and prints the FINAL adaptive plan's ReusedExchange count —
  * the static plan shows the signature pipeline and the docsH verify frame
  * as duplicated subtrees, and whether AQE's runtime stage cache actually
  * dedupes them decides where the optimization budget goes.
  *
  * Test-scoped measurement harness, not library surface. Run:
  *   sbt "Test/runMain graft.AbDedupProbe /root/testdata/sf0.1"
  */
object AbDedupProbe {
  @volatile private var lastQe: QueryExecution = _

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftExtensions.install)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        lastQe = qe
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    def time(label: String, showPlan: Boolean = false)(mk: => DataFrame): Unit = {
      // min of 3 after 1 warm-up, Bench's discipline
      var best = Double.MaxValue
      noop(mk)
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        noop(mk)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      Thread.sleep(200) // let the QueryExecutionListener drain
      val planStr = Option(lastQe).map(_.executedPlan.toString).getOrElse("")
      def n(m: String): Int = planStr.linesIterator.count(_.contains(m))
      println(f"PROBE $label%-28s ${best}%7.3f s  reusedExch=${n("ReusedExchange")}  exch=${n("Exchange")}  aqeRead=${n("AQEShuffleRead")}")
      if (showPlan && sys.env.contains("GRAFT_PROBE_PLAN")) println(planStr)
    }

    val docs = Tables.documents(spark, sfDir)

    time("sig")(TextQueries.minhashBandSigsOf(docs))
    time("docsH")(TextQueries.tokenHashFrameOf(docs))
    time("cand") {
      BucketPairs.pairs(
          TextQueries.minhashBandSigsOf(docs),
          Seq("source", "band_id", "band_hash"), "doc_id", Seq.empty)
        .select(org.apache.spark.sql.functions.col("a").as("doc_a"),
          org.apache.spark.sql.functions.col("b").as("doc_b"))
        .distinct()
    }
    time("pairs(whole)", showPlan = true)(TextQueries.minhashJaccardPairsOf(docs))
    // CC legs: edges is an eager localCheckpoint, so time it as a unit
    time("cc(clusters)") {
      TextQueries.connectedComponents(TextQueries.neardupEdgesOf(docs))
    }

    // per-phase CC breakdown (the live loop, re-spelled with timers)
    {
      import org.apache.spark.sql.functions._
      def t[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"CCPHASE $label%-16s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        r
      }
      val edges = t("edges_ckpt")(TextQueries.neardupEdgesOf(docs))
      val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val adj = t("adj_ckpt")(edges
        .select(col("doc_a").as("doc_id"), col("doc_b").as("nbr"))
        .unionByName(edges.select(col("doc_b").as("doc_id"), col("doc_a").as("nbr")))
        .repartition(n, col("doc_id")).localCheckpoint())
      var labels = t("init_ckpt")(adj
        .groupBy("doc_id")
        .agg(min(least(col("nbr"), col("doc_id"))).as("lbl")).localCheckpoint())
      var changed = 1L
      var round = 0
      while (changed > 0) {
        round += 1
        val prop = adj.join(labels.hint("shuffle_hash"), "doc_id")
          .select(col("nbr").as("doc_id"), col("lbl"))
        val next = t(s"round$round" + "_ckpt")(
          labels.withColumn("old_lbl", col("lbl"))
            .unionByName(prop.withColumn("old_lbl", lit(Long.MaxValue)))
            .repartition(n, col("doc_id"))
            .groupBy("doc_id").agg(min("lbl").as("lbl"), min("old_lbl").as("old_lbl"))
            .localCheckpoint())
        changed = t(s"round$round" + "_count")(
          next.filter(col("lbl") < col("old_lbl")).count())
        println(s"CCPHASE round$round changed=$changed")
        labels = next.select("doc_id", "lbl")
      }
    }
    spark.stop()
  }
}
