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

  test("windowed funnel: the gap boundary is inclusive; outside the window never counts") {
    // W = 100 µs. A: click at exactly t1 + W (= 110) — ON the fence,
    // counts; purchase at t2 + W (= 210) — counts too. B: click at
    // t1 + W + 1 — one µs past the fence, must NOT count (and so no
    // stage-3 either, even though a purchase follows). C: the CLOSEST
    // in-window click wins as t2 even when an earlier out-of-window
    // click exists (min over in-window candidates only).
    val ev = eventsDF(
      (1L, 10L, "signup"), (1L, 110L, "click"), (1L, 210L, "purchase"),
      (2L, 10L, "signup"), (2L, 111L, "click"), (2L, 120L, "purchase"),
      (3L, 500L, "signup"), (3L, 490L, "click"), (3L, 550L, "click"),
      (3L, 560L, "purchase"))
    val got = EventQueries.funnelOf(ev, maxGapUs = Some(100L)).collect()
      .map(r => (r.getAs[Long]("stage"), r.getAs[Long]("n_users"))).toSeq
    assert(got === Seq((1L, 3L), (2L, 2L), (3L, 2L)))
    // the same stream UNwindowed converts everyone — the bound is the
    // only thing cutting B
    val un = EventQueries.funnelOf(ev).collect()
      .map(r => (r.getAs[Long]("stage"), r.getAs[Long]("n_users"))).toSeq
    assert(un === Seq((1L, 3L), (2L, 3L), (3L, 3L)))
    // the window measures from t_k, not from the stage-1 anchor: a
    // purchase within W of the CLICK but > W after signup still counts
    val chain = eventsDF(
      (9L, 0L, "signup"), (9L, 90L, "click"), (9L, 170L, "purchase"))
    val g2 = EventQueries.funnelOf(chain, maxGapUs = Some(100L)).collect()
      .map(r => (r.getAs[Long]("stage"), r.getAs[Long]("n_users"))).toSeq
    assert(g2 === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
    // degenerate gap refused
    intercept[IllegalArgumentException] {
      EventQueries.funnelOf(chain, maxGapUs = Some(0L))
    }
  }

  test("weekly retention: Monday-start cohorts, whole-week offsets, distinct return weeks") {
    // 2024-01-01 is a Monday. u1's first activity is Wed Jan 3 → cohort
    // week 2024-01-01; returns twice in the week of Jan 8 (one distinct
    // return week) and once Jan 18 (week of Jan 15). u2 starts Jan 9 →
    // cohort 2024-01-08, never returns.
    def us(day: Int, hour: Int = 12): Long =
      (java.time.LocalDateTime.of(2024, 1, day, hour, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC)) * 1000000L
    val ev = eventsDF(
      (1L, us(3), "view"), (1L, us(8), "view"), (1L, us(10), "view"),
      (1L, us(18), "view"),
      (2L, us(9), "view"))
    val got = EventQueries.retentionOf(ev, weekly = true).collect()
      .map(r => (r.getAs[String]("cohort_week"), r.getAs[Long]("week_offset"),
        r.getAs[Long]("n_users"))).toSeq
    assert(got === Seq(
      ("2024-01-01", 0L, 1L),
      ("2024-01-01", 1L, 1L),
      ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L)))
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
