package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B harness for q_asof_join's two possible spellings:
  *
  *   window   the LIVE engine — union the roles in one scan, ONE
  *            user-keyed shuffle, ignoreNulls last() over a rows
  *            (unbounded, -1) frame, filter to purchases;
  *   join     the naive as-of: purchases equi-joined to clicks on
  *            user_id with the band predicate (click.ts < purchase.ts)
  *            as a residual condition, then a per-purchase argmax
  *            (max_by over the click (ts, id)) — the spelling every SQL
  *            engine without ASOF support reaches for. The join emits
  *            one row per (purchase, EVERY prior click) before the
  *            argmax collapses it: O(clicks × purchases) per user where
  *            the window is O(events) per user.
  *
  * Interleaved min-of-N passes (the Bench noise discipline) so ambient
  * load cancels. Numbers recorded in the q_asof_join QueryDef scaladoc.
  *
  * Test-scoped measurement harness, not library surface. Run:
  *   sbt "Test/runMain graft.AbAsofBench /root/testdata/sf0.1 [passes]"
  */
object AbAsofBench {

  // the LIVE spelling, shared with the QueryDef so the A/B always
  // measures what ships (review r13: an inline copy here could silently
  // drift from the engine)
  private def asofWindow(ev: DataFrame): DataFrame =
    EventQueries.asofWindowOf(ev)
      .select(col("purchase_id"), col("user_id"), col("click_event_id"))

  private def asofJoin(ev: DataFrame): DataFrame = {
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cuid"),
        col("ts_us").as("cts"))
    // band predicate in the JOIN condition so click-less (or only-later-
    // click) purchases keep their LEFT row with a null attribution —
    // the same contract the window spelling gives for free
    p.join(c.hint("shuffle_hash"),
        col("user_id") === col("cuid") && col("cts") < col("pts"), "left")
      .groupBy(col("purchase_id"), col("user_id"))
      .agg(max_by(col("cid"), struct(col("cts"), col("cid"))).as("click_event_id"))
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
    val ev = Tables.events(spark, sfDir)
    // parity first: same attribution from both spellings (nulls included)
    val w = asofWindow(ev).select("purchase_id", "click_event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val j = asofJoin(ev).select("purchase_id", "click_event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    require(w == j, s"spellings disagree: ${(w diff j).take(3)} vs ${(j diff w).take(3)}")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "asof_window" -> (() => asofWindow(ev)),
      "asof_join" -> (() => asofJoin(ev)))
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
