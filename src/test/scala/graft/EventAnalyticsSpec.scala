package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent referees for the funnel/retention analytics beyond their
  * DuckDB oracles: the sf0.01 table converts every user at every stage
  * (150 users × ~67 events each — the degenerate case), so the ORDER
  * constraint the funnel exists for is only exercised by fixtures where
  * stages arrive out of order. */
class EventAnalyticsSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def eventsDF(rows: (Long, Long, String)*) = {
    import s.implicits._
    rows.toSeq.toDF("user_id", "ts_us", "event_type")
  }

  test("funnel: a stage reached BEFORE its predecessor does not count") {
    // A completes in order; B's purchase precedes signup (stage 3 must
    // not count, stage 2 does — click follows signup); C clicks with no
    // signup at all (no stage counts past 0)
    val ev = eventsDF(
      (1L, 10L, "signup"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "purchase"), (2L, 20L, "signup"), (2L, 30L, "click"),
      (3L, 10L, "click"), (3L, 20L, "view"))
    val got = EventQueries.funnelOf(ev).collect()
      .map(r => (r.getAs[Long]("stage"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_users"), r.getAs[Long]("conv_ppm"))).toSeq
    assert(got === Seq(
      (1L, "signup", 2L, 1000000L),
      (2L, "click", 2L, 1000000L),
      (3L, "purchase", 1L, 500000L)))
  }

  test("funnel: same-µs ties are NOT in order (strict > at µs resolution)") {
    val ev = eventsDF(
      (1L, 10L, "signup"), (1L, 10L, "click"), (1L, 20L, "purchase"))
    val got = EventQueries.funnelOf(ev).collect()
      .map(r => (r.getAs[Long]("stage"), r.getAs[Long]("n_users"))).toSeq
    // the click shares the signup's µs → not strictly after → stage 2
    // (and therefore 3) unreached
    assert(got === Seq((1L, 1L), (2L, 0L), (3L, 0L)))
  }

  test("funnel: empty input yields zero stages, ppm guard avoids 0/0") {
    val got = EventQueries.funnelOf(eventsDF()).collect()
      .map(r => (r.getAs[Long]("n_users"), r.getAs[Long]("conv_ppm"))).toSeq
    assert(got === Seq((0L, 0L), (0L, 0L), (0L, 0L)))
  }

  test("funnel: parameterized stage lists — 4 stages and a single stage") {
    val ev = eventsDF(
      (1L, 10L, "view"), (1L, 20L, "signup"), (1L, 30L, "click"),
      (1L, 40L, "purchase"),
      (2L, 10L, "view"), (2L, 20L, "signup"))
    val four = EventQueries
      .funnelOf(ev, Seq("view", "signup", "click", "purchase")).collect()
      .map(r => (r.getAs[Long]("stage"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_users"))).toSeq
    assert(four === Seq((1L, "view", 2L), (2L, "signup", 2L),
      (3L, "click", 1L), (4L, "purchase", 1L)))
    val one = EventQueries.funnelOf(ev, Seq("signup")).collect()
      .map(r => (r.getAs[Long]("n_users"), r.getAs[Long]("conv_ppm"))).toSeq
    assert(one === Seq((2L, 1000000L)))
  }

  test("retention: cohort = first day, offsets count distinct return days") {
    val us = 86400000000L // one day of µs
    val ev = eventsDF(
      (1L, 0L, "view"), (1L, 5L, "view"),        // day 0 twice → one row
      (1L, 2 * us, "click"),                      // day 2
      (2L, us, "view"))                           // cohort day 1
    val got = EventQueries.retentionOf(ev).collect()
      .map(r => (r.getAs[String]("cohort_day"), r.getAs[Long]("day_offset"),
        r.getAs[Long]("n_users"))).toSeq
    assert(got === Seq(
      ("1970-01-01", 0L, 1L), ("1970-01-01", 2L, 1L),
      ("1970-01-02", 0L, 1L)))
  }
}
