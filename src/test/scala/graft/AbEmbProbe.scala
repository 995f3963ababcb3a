package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21 phase probe for q_neardup_embedding (VERDICT r20 Next #7: 12.1 s
  * at sf1, ~6x super-linear at 10x data): times the signature map, the
  * bucket-pair generation, and the verify join separately, min-of-3
  * noop-sink, plus candidate/output counts so the volume attribution is
  * direct. Test-scoped measurement harness. Run:
  *   sbt "Test/runMain graft.AbEmbProbe /root/testdata/sf0.1"
  *   sbt "Test/runMain graft.AbEmbProbe /tmp/graft_sf1"
  */
object AbEmbProbe {
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

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      var best = Double.MaxValue
      for (r <- 0 to reps) {
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        if (r > 0) best = math.min(best, dt)
      }
      println(f"EMBPROBE $label%-22s $best%7.3f s")
    }

    val emb = Tables.embeddings(spark, sfDir)
    println(s"EMBPROBE rows=${emb.count()}")

    val sig = VectorQueries.signatures(emb, Seq("label"))
    time("sig")(noop(sig))

    val cand = VectorQueries.bucketPairs(sig, Seq("label"))
    println(s"EMBPROBE candidates=${cand.count()}")
    time("sig+cand")(noop(cand))

    // verify split: joins + double prune only (no decimal) vs the full
    // decimal-scored verify — attributes the verify stage's cost between
    // shuffle/prune and the exact-decimal survivor scoring
    def dd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("dot_double", a, b)
    val n = emb.select(col("vec_id"), col("embedding"),
      sqrt(dd(col("embedding"), col("embedding"))).as("len_d"))
    val pruned = cand
      .join(n.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
        col("len_d").as("len_a")).hint("shuffle_hash"), Seq("vec_a"))
      .join(n.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
        col("len_d").as("len_b")).hint("shuffle_hash"), Seq("vec_b"))
      .filter(dd(col("emb_a"), col("emb_b")) / (col("len_a") * col("len_b"))
        >= 0.3 - 1e-6)
    println(s"EMBPROBE pruned_survivors=${pruned.count()}")
    time("sig+cand+prune")(noop(pruned.select("label", "vec_a", "vec_b")))

    val out = VectorQueries.verifyPairs(cand, emb, 0.3)
      .select(col("label"), col("vec_a"), col("vec_b"), col("cosine"))
    println(s"EMBPROBE out_rows=${out.count()}")
    time("whole")(noop(out.orderBy("label", "vec_a", "vec_b")))

    spark.stop()
  }
}
