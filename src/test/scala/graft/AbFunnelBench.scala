package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for q_funnel's two possible spellings:
  *
  *   window   the LIVE engine — the dependent-stage recurrence
  *            t_{k+1} = min stage-(k+1) event with ts > t_k as CHAINED
  *            unordered per-user window minimums, all riding ONE
  *            user_id exchange;
  *   join     the per-stage self-join every SQL engine without window
  *            chaining reaches for: stage 1 aggregates min(ts) per
  *            user, each later stage joins the previous stage's frame
  *            back to the events and re-aggregates — k−1 joins of a
  *            user-keyed frame against the full event table, so the
  *            corpus is re-scanned per stage and each stage adds a
  *            join + agg exchange pair.
  *
  * Interleaved min-of-N passes (the Bench noise discipline) so ambient
  * load cancels. Numbers recorded in the q_funnel QueryDef scaladoc.
  *
  * Test-scoped measurement harness, not library surface. Run:
  *   sbt "Test/runMain graft.AbFunnelBench /root/testdata/sf0.1 [passes]"
  */
object AbFunnelBench {

  private val Stages = Seq("signup", "click", "purchase")

  // the LIVE spelling, shared with the QueryDef so the A/B always
  // measures what ships
  private def funnelWindow(ev: DataFrame): DataFrame =
    EventQueries.funnelOf(ev, Stages)

  private def funnelJoin(ev: DataFrame): DataFrame = {
    val base = ev.select(col("user_id"), col("ts_us"), col("event_type"))
    // stage 1: min signup ts per user
    var cur = base.filter(col("event_type") === Stages.head)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t"))
    val counts = collection.mutable.ArrayBuffer[DataFrame](
      cur.agg(count(lit(1)).as("n")))
    for (stage <- Stages.tail) {
      cur = base.filter(col("event_type") === stage)
        .join(cur.hint("shuffle_hash"), Seq("user_id"))
        .filter(col("ts_us") > col("t"))
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("t"))
      counts += cur.agg(count(lit(1)).as("n"))
    }
    counts.reduce(_.unionAll(_))
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
    // parity first: identical per-stage user counts from both spellings
    val w = funnelWindow(ev).select("stage", "n_users")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val j = funnelJoin(ev).collect().map(_.getLong(0)).toSeq
    val jm = j.zipWithIndex.map { case (n, i) => (i + 1L, n) }.toMap
    require(w == jm, s"spellings disagree: $w vs $jm")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "funnel_window" -> (() => funnelWindow(ev)),
      "funnel_join" -> (() => funnelJoin(ev)))
    val best = collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
    for (p <- 1 to passes; (name, mk) <- variants) {
      val t = once(mk())
      best(name) = math.min(best(name), t)
      println(f"pass $p $name%-14s $t%7.3f s (best ${best(name)}%7.3f)")
    }
    println(best.toSeq.sortBy(_._1).map { case (n, t) => f"$n=$t%.3f" }
      .mkString("RESULT ", " ", s" sf=$sfDir"))
    spark.stop()
  }
}
