package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for q_check_incremental's anti-join spelling (SURVEY §6.1
  * r14 note — the one re-pinned query whose cross-session move exceeded
  * the ambient drift):
  *
  *   shuffle   the LIVE engine — checkUnchecked's SHUFFLE_HASH anti-join:
  *             the payload-carrying rows (full package JSON) hash-shuffle
  *             once so the join cannot degrade to SortMergeJoin at scale;
  *   bloom     a FIXED-size `bloom_agg` prefilter on the existing ids
  *             (the q_decontaminate_bloom machinery): rows whose id is
  *             definitely-absent bypass the join with NO payload shuffle;
  *             only the might-contain fraction (truly-existing + false
  *             positives) goes through the exact anti-join. Output is
  *             EXACT regardless of FP rate — bloom bits only choose a
  *             row's ROUTE, never its fate — and the filter blob is
  *             bounded by construction (m_bits is a parameter), so the
  *             broadcast is scale-safe where broadcasting the id SET is
  *             not. The cost: the union's two branches re-derive the
  *             payload projection (or re-scan, once the id filter pushes
  *             down), so the win depends on the already-checked fraction.
  *
  * Interleaved min-of-N passes (the Bench noise discipline) so ambient
  * load cancels. Verdict recorded in SURVEY §6.1 / the QueryDef scaladoc.
  *
  * Test-scoped measurement harness, not library surface. Run:
  *   sbt "Test/runMain graft.AbCheckBloomBench <sfDir> [passes]"
  */
object AbCheckBloomBench {

  private def existingOf(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).filter(col("event_id") % 3 === 0)
      .select(col("event_id").as("id"))

  private def summarize(rows: DataFrame): DataFrame =
    rows.agg(
      count(lit(1)).as("n_checked"),
      sum(when(col("ok"), 0L).otherwise(1L)).as("n_failed"),
      sum(col("n_errors")).as("n_errors"))

  // the LIVE spelling — via the same entry points the QueryDef uses
  private def shuffleVariant(s: SparkSession, d: String): DataFrame =
    summarize(graft.check.Checker
      .checkUnchecked(CheckQueries.defectRows(s, d), existingOf(s, d), "release", s)
      .toDF())

  private def bloomVariant(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(s)
    val existing = existingOf(s, d)
    val rows = CheckQueries.defectRows(s, d)
    // 1 MiB blob, k=5 — at 150k existing ids (sf0.1) FP ~ 4e-6; the knob
    // trades broadcast bytes vs shuffled fraction, worst case = the live
    // plan (everything routes to the exact join)
    val bloom = existing.agg(
      call_function("bloom_agg", xxhash64(col("id")), lit(1 << 23), lit(5)).as("bf"))
    val tagged = rows.crossJoin(broadcast(bloom))
    // coalesce: an EMPTY existing side aggregates to a null blob, and a
    // null probe must read "definitely absent", not drop the row from
    // both branches
    val mh = coalesce(
      call_function("bloom_contains", col("bf"), xxhash64(col("id"))), lit(false))
    val fast = tagged.filter(!mh).drop("bf")
    val slow = tagged.filter(mh).drop("bf")
      .join(existing.hint("SHUFFLE_HASH"), Seq("id"), "left_anti")
    summarize(graft.check.Checker
      .checkItems(fast.unionByName(slow), "release", s).toDF())
  }

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
    // parity first: the single summary row must be identical
    val a = shuffleVariant(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = bloomVariant(spark, sfDir).collect().map(_.toSeq).toSeq
    require(a == b, s"spellings disagree: $a vs $b")
    println(s"parity ok: $a")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "chk_shuffle" -> (() => shuffleVariant(spark, sfDir)),
      "chk_bloom" -> (() => bloomVariant(spark, sfDir)))
    val best = collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    for (p <- 1 to passes; (name, mk) <- variants) {
      val t = once(mk())
      best(name) = math.min(best(name), t)
      println(f"pass $p $name%-12s $t%7.3f s (best ${best(name)}%7.3f)")
    }
    println(best.toSeq.sortBy(_._1).map { case (n, t) => f"$n=$t%.3f" }
      .mkString("RESULT ", " ", s" sf=$sfDir"))
    spark.stop()
  }
}
