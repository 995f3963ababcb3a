package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CandVol {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftExtensions.install)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    val sig = TextQueries.minhashBandSigsOf(docs)
    println("CANDVOL sig_rows=" + sig.count())
    val buckets = sig.groupBy("source", "band_id", "band_hash").count()
    buckets.filter(col("count") > 1)
      .groupBy().agg(count(lit(1)).as("n_buckets"), sum(col("count")).as("members"),
        max(col("count")).as("max_bucket"),
        sum(col("count") * (col("count") - 1) / 2).as("raw_pairs")).show(false)
    // histogram of bucket sizes
    buckets.filter(col("count") > 1)
      .withColumn("bsz", pow(lit(2), ceil(log2(col("count")))).cast("long"))
      .groupBy("bsz").agg(count(lit(1)).as("n"), sum(col("count")*(col("count")-1)/2).as("pairs"))
      .orderBy("bsz").show(30, false)
    val cand = BucketPairs.pairs(sig, Seq("source", "band_id", "band_hash"), "doc_id", Seq.empty)
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
    println("CANDVOL raw_emitted=" + cand.count())
    println("CANDVOL distinct=" + cand.distinct().count())
    spark.stop()
  }
}
