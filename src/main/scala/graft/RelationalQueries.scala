package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational operator surface (SURVEY.md §2.1–§2.7).
  *
  * Mirrors the reference's scans / projections / filters / joins /
  * aggregations / sorts / set-ops (`docs/querying-data.rst`,
  * `process/processors/compiler.py`, the management commands)
  * re-expressed as declarative Spark plans so Catalyst gets pushdown,
  * pruning, join selection and AQE for free.
  *
  * Numeric policy (oracle parity at any scale): aggregations sum DECIMAL —
  * exact and addition-order-insensitive, so the result is identical no
  * matter how Spark partitions the data — and only the final value is cast
  * to DOUBLE. Per-row double arithmetic (e.g. price*(1-discount)) is IEEE
  * bit-deterministic in both Spark and DuckDB.
  */
object RelationalQueries {

  /** q_fuzzy_join's operational bound on the token-df model broadcast:
    * a df table beyond this many distinct tokens is no longer a "name
    * vocabulary" (the operator's declared domain) and the model join
    * respells SHUFFLE_HASH. 4M 2-long rows ≈ tens of MB broadcast —
    * comfortably executor-resident; real entity lexicons sit far
    * below it. */
  private val FuzzyDfBroadcastCap = 4L * 1024 * 1024

  /** Exact decimal sum of a per-row double expression, surfaced as double. */
  private def dsum(e: Column, scale: Int): Column =
    sum(e.cast(DecimalType(18, scale))).cast(DoubleType)

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_scan_filter_project", Seq("S1", "P1", "P2"),
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .orderBy("l_orderkey", "l_partkey", "l_quantity"),
      Some("""SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
              WHERE l_quantity > 45
              ORDER BY l_orderkey, l_partkey, l_quantity"""),
      "Projection + pushed filter (reference: values_list/filter, compiler.py:42-59)"),

    QueryDef(
      "q_filter_in_range", Seq("P2", "P4"),
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("F", "P") && col("o_totalprice") < 5000)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
              WHERE o_orderstatus IN ('F','P') AND o_totalprice < 5000
              ORDER BY o_orderkey"""),
      "Membership + range predicates (reference: filter(ocid__in=...), compiler.py:56)"),

    QueryDef(
      "q_join_fk", Seq("J1"),
      // SHUFFLE_HASH-pinned: both sides are fact-sized at 100 TB, so the
      // small-SF auto-broadcast is estimate-dependent and would silently
      // degrade to a SortMergeJoin at scale (the r11 q_collection_notes
      // class); the hash build side is the selectively-filtered orders leg
      (s, d) => Tables.orders(s, d)
        .filter(col("o_totalprice") > 450000)
        .hint("SHUFFLE_HASH")
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_totalprice, c_name
              FROM orders JOIN customer ON o_custkey = c_custkey
              WHERE o_totalprice > 450000
              ORDER BY o_orderkey"""),
      "Fact→dim FK equi-join (reference: select_related('data'), record_compiler.py:59)"),

    QueryDef(
      "q_join_broadcast_dims", Seq("J2"),
      (s, d) => Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"), col("r_name"))
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, s_name, n_name, r_name
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
                            JOIN region ON n_regionkey = r_regionkey
              ORDER BY s_suppkey"""),
      "Small-dimension broadcast joins (reference: select_related('collection'))"),

    QueryDef(
      "q_antijoin", Seq("J3", "P3"),
      // anti-join build side = the filtered orders leg, SHUFFLE_HASH-pinned
      // (fact-sized at scale: estimate-based broadcast would degrade to SMJ)
      (s, d) => Tables.customer(s, d)
        .join(
          Tables.orders(s, d).filter(col("o_orderstatus") === "F")
            .hint("SHUFFLE_HASH"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders
                                WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
              ORDER BY c_custkey"""),
      "Anti-join / unchecked-items pattern (reference: addchecks.py:38-45 LEFT JOIN IS NULL)"),

    QueryDef(
      "q_semijoin", Seq("J5"),
      // semi-join build side = the filtered lineitem leg, SHUFFLE_HASH-pinned
      (s, d) => Tables.orders(s, d)
        .join(
          Tables.lineitem(s, d).filter(col("l_quantity") >= 50)
            .hint("SHUFFLE_HASH"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              WHERE EXISTS (SELECT 1 FROM lineitem
                            WHERE l_orderkey = o_orderkey AND l_quantity >= 50)
              ORDER BY o_orderkey"""),
      "Semi-join (reference: wiper.py IN (SELECT ...) deletes)"),

    QueryDef(
      "q_distinct_pairs", Seq("A2"),
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
              ORDER BY l_returnflag, l_linestatus"""),
      "DISTINCT projection (reference: values('ocid').distinct(), compiler.py:90)"),

    QueryDef(
      "q_count_distinct", Seq("A1", "A2"),
      (s, d) => Tables.orders(s, d)
        .agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders")),
      Some("""SELECT count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
              FROM orders"""),
      "Exact COUNT DISTINCT (reference: cached counts, finisher.py:100-108)"),

    QueryDef(
      "q_agg_sum_groupby", Seq("A1", "A4", "F3", "O1"),
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"),
          (sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType)
            / count(lit(1))).as("avg_price"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
                     CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
              FROM lineitem GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus"""),
      "SUM..GROUP BY with exact decimal accumulation (reference: querying-data.rst:64-77)"),

    QueryDef(
      "q_minmax_substr", Seq("A3", "F4", "J2"),
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"),
          substring(min(col("c_name")), 1, 11).as("name_prefix"),
          count(lit(1)).as("n_cust"))
        .orderBy("n_name"),
      Some("""SELECT n_name, min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
                     substr(min(c_name), 1, 11) AS name_prefix, count(*) AS n_cust
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name"""),
      "MIN/MAX + LEFT(.,11) metadata aggregates (reference: views.py:183-199 ocid_prefix)"),

    QueryDef(
      "q_topk_revenue", Seq("A5", "O5"),
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
        .orderBy(col("revenue").desc, col("l_partkey"))
        .limit(10),
      Some("""SELECT l_partkey,
                     CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
              FROM lineitem GROUP BY l_partkey
              ORDER BY revenue DESC, l_partkey LIMIT 10"""),
      "Top-k: explode→group→sort→limit plans as TakeOrderedAndProject (reference: querying-data.rst:102-121)"),

    QueryDef(
      "q_sort_limit", Seq("O3", "O4"),
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(5),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 5"""),
      "ORDER BY .. LIMIT (reference: querying-data.rst:14-24,39-49)"),

    QueryDef(
      "q_union_distinct", Seq("U1"),
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey"),
      Some("""SELECT c_nationkey AS nationkey FROM customer
              UNION
              SELECT s_nationkey FROM supplier
              ORDER BY nationkey"""),
      "UNION-dedup (reference: wiper.py:55-66 data_id union)"),

    QueryDef(
      "q_except", Seq("U3"),
      // EXCEPT spelled as distinct + anti-join so the join strategy can be
      // pinned (right-side distinctness is irrelevant under left_anti).
      // The join key is NULL-SAFE (<=>): EXCEPT removes a NULL left key
      // when the right side contains NULL, which a plain '=' anti-join
      // would keep (r14 review — moot on TPC-H's non-null partkeys, but
      // the oracle declares EXCEPT, so the spellings must agree on any
      // data). The .except() operator plans the same shape but leaves the
      // join estimate-dependent — it broadcast at small SF and degraded
      // to SortMergeJoin once estimates were gone.
      (s, d) => Tables.lineitem(s, d).select(col("l_partkey").as("partkey"))
        .distinct()
        .join(
          Tables.part(s, d).filter(col("p_size") > 25)
            .select(col("p_partkey").as("rhs_partkey")).hint("SHUFFLE_HASH"),
          col("partkey") <=> col("rhs_partkey"), "left_anti")
        // NULLS LAST pins the ordering contract next to the null-safe
        // membership: Spark's default ASC is NULLS FIRST, DuckDB's is
        // NULLS LAST, so on a nullable key the hash-ordered compare
        // would diverge even with set membership agreeing (r14 ADVICE;
        // moot on TPC-H's non-null partkeys, pinned for any data)
        .orderBy(col("partkey").asc_nulls_last),
      Some("""SELECT DISTINCT l_partkey AS partkey FROM lineitem
              EXCEPT
              SELECT p_partkey AS partkey FROM part WHERE p_size > 25
              ORDER BY partkey"""),
      "Set-difference (reference: already_exists filter, compiler.py:42-53)"),

    QueryDef(
      "q_window_rownum", Seq("W2"),
      (s, d) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_shipdate"), col("l_linenumber"))
        Tables.lineitem(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(
            col("l_orderkey"),
            col("l_linenumber").as("first_linenumber"),
            col("l_shipdate").cast(DateType).as("first_shipdate"))
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey, first_linenumber, first_shipdate FROM (
                SELECT l_orderkey, l_linenumber AS first_linenumber,
                       CAST(l_shipdate AS DATE) AS first_shipdate,
                       row_number() OVER (PARTITION BY l_orderkey
                                          ORDER BY l_shipdate, l_linenumber) AS rn
                FROM lineitem) WHERE rn = 1
              ORDER BY l_orderkey"""),
      "First-row-wins per key (reference: record_compiler.py:58-75 duplicate-OCID rule)"),

    QueryDef(
      "q_window_running", Seq("W1", "O1"),
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .withColumn(
            "run_total",
            sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast(DoubleType))
          .select(col("o_custkey"), col("o_orderkey"), col("run_total"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                       AS run_total
              FROM orders ORDER BY o_custkey, o_orderkey"""),
      "Ordered per-key accumulation (reference: ORDER BY ocid, release_date scan, compiler.py:56-58)"),

    QueryDef(
      "q_join_salted", Seq("J1", "A4"),
      (s, d) => {
        // SKEW-SAFE salted join (the manual technique for when AQE's
        // skew-join split can't apply — e.g. the build side must
        // co-group, or the skew is in an aggregation feeding the join):
        // the fact side gets a deterministic salt, the dim side is
        // replicated once per salt value, and the join key becomes
        // (key, salt) — a hot customer's rows spread over `Salts`
        // partitions instead of one straggler. Semantically IDENTICAL to
        // the plain join, which is exactly what the oracle checks.
        val Salts = 8
        val fact = Tables.orders(s, d)
          .withColumn("salt", pmod(col("o_orderkey"), lit(Salts)))
        // shuffle_hash hint: at test SF the dim fits a broadcast, which
        // would make the salt moot (broadcast joins don't shuffle the hot
        // key anywhere); the hint forces the shuffled plan the technique
        // exists for, so the demonstrated physical shape is the real one
        val dim = Tables.customer(s, d)
          .withColumn("salt", explode(array((0 until Salts).map(lit): _*)))
          .hint("shuffle_hash")
        fact
          .join(dim, col("o_custkey") === col("c_custkey") && fact("salt") === dim("salt"))
          .groupBy(col("c_nationkey"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType).as("revenue"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, count(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_nationkey ORDER BY c_nationkey"""),
      "Skew-safe salted join: deterministic fact-side salt + dim replicated per salt, " +
        "join on (key, salt) — hot keys spread across partitions; oracle is the PLAIN " +
        "join, proving the salting is semantics-preserving"),

    QueryDef(
      "q_profile_orders", Seq("A1", "A2", "A3"),
      (s, d) => {
        // one-pass column profiling — the data-quality readout analysts
        // run before trusting a table (the `summarize`/DESCRIBE surface,
        // next to field_counts' JSON-path version): per column, null
        // count, exact distinct count, numeric min/max (timestamps as
        // epoch micros so every numeric column shares one DOUBLE slot),
        // string min/max for text columns. ONE aggregation over one scan
        // (the countDistincts expand the input internally — the exact
        // per-column distinct a profiler reports; at 100 TB the same
        // query runs with approx_count_distinct and loses the oracle,
        // a documented swap, not a different plan shape), then a stack()
        // unpivot of the single stats row — no shuffle beyond the agg.
        // fanOut BELOW the projection (r20): the 6-way countDistinct
        // expand multiplies the scan's per-row work ~6× (measured
        // 3.7 s pinned on ONE task above the single-row-group file —
        // ~25 µs per input row, far past the ~50 ns plain-agg bar the
        // fanOut contract sets), so the narrow 6-column frame round-
        // robins once and the expand+partial agg runs on every core.
        val o = Tables.fanOut(Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderstatus"), col("o_orderpriority")))
        def numProfile(c: String, v: Column) = Seq(
          count(when(col(c).isNull, 1)).as(s"${c}_nulls"),
          countDistinct(col(c)).as(s"${c}_dist"),
          min(v).cast(DoubleType).as(s"${c}_min"),
          max(v).cast(DoubleType).as(s"${c}_max"))
        def strProfile(c: String) = Seq(
          count(when(col(c).isNull, 1)).as(s"${c}_nulls"),
          countDistinct(col(c)).as(s"${c}_dist"),
          min(col(c)).as(s"${c}_smin"),
          max(col(c)).as(s"${c}_smax"))
        val aggs = Seq(count(lit(1)).as("n_rows")) ++
          numProfile("o_orderkey", col("o_orderkey")) ++
          numProfile("o_custkey", col("o_custkey")) ++
          numProfile("o_totalprice", col("o_totalprice")) ++
          // the scan yields TIMESTAMP_NTZ; the explicit TimestampType cast
          // under the pinned UTC session is the identity mapping that makes
          // unix_micros == DuckDB's epoch_us (the Tables.events pattern)
          numProfile("o_orderdate",
            unix_micros(col("o_orderdate").cast(TimestampType))) ++
          strProfile("o_orderstatus") ++ strProfile("o_orderpriority")
        val one = o.agg(aggs.head, aggs.tail: _*)
        def numRow(c: String) =
          s"'$c', ${c}_nulls, ${c}_dist, ${c}_min, ${c}_max, " +
            "CAST(NULL AS STRING), CAST(NULL AS STRING)"
        def strRow(c: String) =
          s"'$c', ${c}_nulls, ${c}_dist, CAST(NULL AS DOUBLE), " +
            s"CAST(NULL AS DOUBLE), ${c}_smin, ${c}_smax"
        one.select(col("n_rows"), expr(
          s"""stack(6,
              ${numRow("o_orderkey")},
              ${numRow("o_custkey")},
              ${numRow("o_totalprice")},
              ${numRow("o_orderdate")},
              ${strRow("o_orderstatus")},
              ${strRow("o_orderpriority")})
             AS (column, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"""))
          .select(col("column"), col("n_rows"), col("n_nulls"), col("n_distinct"),
            col("min_num"), col("max_num"), col("min_str"), col("max_str"))
          .orderBy("column")
      },
      Some("""WITH a AS (
                SELECT count(*) AS n_rows,
                       count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS k_nulls,
                       count(DISTINCT o_orderkey) AS k_dist,
                       CAST(min(o_orderkey) AS DOUBLE) AS k_min,
                       CAST(max(o_orderkey) AS DOUBLE) AS k_max,
                       count(CASE WHEN o_custkey IS NULL THEN 1 END) AS c_nulls,
                       count(DISTINCT o_custkey) AS c_dist,
                       CAST(min(o_custkey) AS DOUBLE) AS c_min,
                       CAST(max(o_custkey) AS DOUBLE) AS c_max,
                       count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS p_nulls,
                       count(DISTINCT o_totalprice) AS p_dist,
                       CAST(min(o_totalprice) AS DOUBLE) AS p_min,
                       CAST(max(o_totalprice) AS DOUBLE) AS p_max,
                       count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS d_nulls,
                       count(DISTINCT o_orderdate) AS d_dist,
                       CAST(min(epoch_us(o_orderdate)) AS DOUBLE) AS d_min,
                       CAST(max(epoch_us(o_orderdate)) AS DOUBLE) AS d_max,
                       count(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS s_nulls,
                       count(DISTINCT o_orderstatus) AS s_dist,
                       min(o_orderstatus) AS s_min, max(o_orderstatus) AS s_max,
                       count(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS pr_nulls,
                       count(DISTINCT o_orderpriority) AS pr_dist,
                       min(o_orderpriority) AS pr_min, max(o_orderpriority) AS pr_max
                FROM orders)
              SELECT * FROM (
                SELECT 'o_orderkey' AS "column", n_rows, k_nulls AS n_nulls,
                       k_dist AS n_distinct, k_min AS min_num, k_max AS max_num,
                       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
                FROM a
                UNION ALL SELECT 'o_custkey', n_rows, c_nulls, c_dist, c_min, c_max,
                       NULL, NULL FROM a
                UNION ALL SELECT 'o_totalprice', n_rows, p_nulls, p_dist, p_min, p_max,
                       NULL, NULL FROM a
                UNION ALL SELECT 'o_orderdate', n_rows, d_nulls, d_dist, d_min, d_max,
                       NULL, NULL FROM a
                UNION ALL SELECT 'o_orderstatus', n_rows, s_nulls, s_dist,
                       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), s_min, s_max FROM a
                UNION ALL SELECT 'o_orderpriority', n_rows, pr_nulls, pr_dist,
                       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), pr_min, pr_max FROM a)
              ORDER BY "column" """),
      "One-pass column profiler over orders (the summarize/DESCRIBE data-quality " +
        "readout): per-column null count, exact distinct count, numeric min/max " +
        "(timestamps as epoch micros), string min/max — one aggregation, one " +
        "stack() unpivot"),

    QueryDef(
      "q_rollup_agg", Seq("A1", "A4", "O1"),
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("l_quantity"), 2).as("sum_qty"),
          grouping(col("l_returnflag")).as("g_rf"),
          grouping(col("l_linestatus")).as("g_ls"))
        .select(
          when(col("g_rf") === 1, lit("ALL")).otherwise(col("l_returnflag")).as("returnflag"),
          when(col("g_ls") === 1, lit("ALL")).otherwise(col("l_linestatus")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("returnflag", "linestatus"),
      Some("""SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
                     CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
                     count(*) AS n,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
              FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
              ORDER BY returnflag, linestatus"""),
      "Multi-level subtotals in ONE pass (ROLLUP): detail + per-flag + grand-total " +
        "rows from a single Expand + hash aggregation — per-level summaries without " +
        "re-scanning per level (at 100 TB: one shuffle instead of one per level); " +
        "rolled-out keys labeled via GROUPING so the total ORDER BY stays null-free"),

    QueryDef(
      "q_cube_agg", Seq("A1", "A4", "O1"),
      (s, d) => Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("o_totalprice"), 2).as("sum_price"),
          grouping(col("o_orderstatus")).as("g_st"),
          grouping(col("o_orderpriority")).as("g_pr"))
        .select(
          when(col("g_st") === 1, lit("ALL")).otherwise(col("o_orderstatus")).as("status"),
          when(col("g_pr") === 1, lit("ALL")).otherwise(col("o_orderpriority")).as("priority"),
          col("n"), col("sum_price"))
        .orderBy("status", "priority"),
      Some("""SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
                     CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
                     count(*) AS n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
              FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
              ORDER BY status, priority"""),
      "All 2^2 grouping combinations in ONE pass (CUBE): the status x priority " +
        "dashboard matrix with both one-dimension margins and the grand total from " +
        "a single Expand + hash aggregation"),

    QueryDef(
      "q_pivot_status", Seq("A4", "P1", "O1"),
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("rev"))
        .select(
          col("o_orderpriority"),
          coalesce(col("F_n"), lit(0L)).as("f_n"), col("F_rev").as("f_rev"),
          coalesce(col("O_n"), lit(0L)).as("o_n"), col("O_rev").as("o_rev"),
          coalesce(col("P_n"), lit(0L)).as("p_n"), col("P_rev").as("p_rev"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
                     count(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_rev,
                     count(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS o_rev,
                     count(*) FILTER (WHERE o_orderstatus = 'P') AS p_n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS p_rev
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority"""),
      "Long-to-wide PIVOT with a PINNED value list (never the value-discovery scan " +
        "Spark would otherwise run first): per-priority order counts + exact " +
        "decimal revenue per status column; absent cells 0 for counts, NULL for " +
        "sums, matching SQL FILTER semantics on both sides"),

    QueryDef(
      "q_zorder_layout", Seq("S7", "P2", "O1"),
      (s, d) => {
        // Multi-dimensional data skipping via a Z-ORDER (Morton) layout —
        // the storage-side pruning mechanism for 2-D box scans
        // (date x customer here) that one-dimensional sorting cannot
        // serve: sorted by date alone, a customer predicate touches
        // EVERY file; sorted by the bit-interleaved key, every file
        // covers a compact rectangle of (day, custkey) space, so parquet
        // row-group min/max stats stay tight on BOTH columns and the
        // scan's pushed filters skip every file whose rectangle misses
        // the box (ZorderLayoutSpec measures scanner-emitted rows,
        // z-order vs linear, same data + query). The layout is built
        // once per JVM: one range-repartition by the key (boundaries
        // come from Spark's sampling, so file SPLITS may vary across
        // runs — the query result is layout-invariant, which is exactly
        // what the raw-table oracle checks) + an in-partition sort. At
        // 100 TB this is the write-once clustering choice of a lakehouse
        // table: one shuffle at ingest, amortized over every box scan
        // after it. The box itself is DATA-RELATIVE — a min/max-bounds
        // job (parquet footer stats, 4 longs to the driver — the k-row
        // pre-aggregated-fetch allowance, like centroid training) turns
        // the 50-75% day x 25-50% custkey window into LITERAL predicates
        // the reader can skip on; hardcoded day constants went stale the
        // first time the generator's date span moved. A balanced
        // quarter-by-quarter box is also the honest demonstration: a
        // 1-D sort serves an extremely tight predicate on its own column
        // better, z-order wins when BOTH dimensions select.
        val bounds = zorderBounds(s, d)
        val (dLo, dHi, cLo, cHi) = zorderBox(bounds)
        val z = Tables.materializeLayout("orders_zorder", d,
          Tables.orders(s, d)
            .withColumn("o_us", unix_micros(col("o_orderdate").cast(TimestampType)))
            .withColumn("day", expr("o_us DIV 86400000000"))
            .drop("o_us")
            .withColumn("zkey", zorderNormKey(col("day"), col("o_custkey"), bounds))
            .repartitionByRange(64, col("zkey"))
            .sortWithinPartitions("zkey"))
        z.filter(col("day").between(dLo, dHi) &&
            col("o_custkey").between(cLo, cHi))
          .select(col("o_orderkey"), col("o_custkey"), col("day"),
            col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""WITH d AS (SELECT o_orderkey, o_custkey,
                     epoch_us(o_orderdate) // 86400000000 AS day,
                     o_totalprice
              FROM orders),
              b AS (SELECT min(day) AS mnd, max(day) AS mxd,
                           min(o_custkey) AS mnc, max(o_custkey) AS mxc
                    FROM d)
              SELECT o_orderkey, o_custkey, day, o_totalprice
              FROM d, b
              WHERE day BETWEEN mnd + (mxd - mnd) * 50 // 100
                            AND mnd + (mxd - mnd) * 75 // 100
                AND o_custkey BETWEEN mnc + (mxc - mnc) * 25 // 100
                                  AND mnc + (mxc - mnc) * 50 // 100
              ORDER BY o_orderkey"""),
      "Z-order clustered layout: bit-interleaved (day, custkey) sort key makes " +
        "parquet min/max stats tight on BOTH dimensions, so a 2-D box scan " +
        "row-group-skips nearly everything (measured in ZorderLayoutSpec); the " +
        "result is layout-invariant — the oracle runs the same box on the raw " +
        "table"),

    QueryDef(
      "q_fuzzy_join", Seq("J1", "A4", "F4"),
      (s, d) => {
        // STRING-SIMILARITY SELF-JOIN (entity resolution): part-name
        // pairs within edit distance 4 — the Ed-Join/prefix-filtering
        // shape (Xiao et al., WWW 2008) re-expressed Spark-first. The
        // naive spelling is the all-pairs cross join; the published fix
        // bounds candidates by a CONTENT key: two names can only be
        // candidates when they share their RAREST token (the prefix
        // filter at prefix length 1 — a declared semantic of this
        // operator, like LSH banding for q_neardup_lsh: a pair differing
        // in its rare token is out of contract) and pass the |len
        // difference| ≤ τ band (a true edit-distance bound). Production
        // discipline at 100 TB: fuzzy-join the DISTINCT-name space, not
        // the row space — exact duplicates collapse in one hash agg
        // first (64 names carry 2000 rows here; a crawl's top name can
        // carry 10⁸), so the quadratic verify runs on name-vocabulary
        // buckets, never row buckets. Plan: one distinct-name agg, a
        // vocab-bounded broadcast df model, a per-name rarest-token
        // window over ≤|name| tokens, the SHUFFLE_HASH-pinned key-token
        // self-join (both sides the name space — an estimate-based
        // broadcast would regress at scale), codegen'd levenshtein
        // verify.
        val tau = 4
        val names = Tables.part(s, d)
          .groupBy(col("p_name").as("name"))
          .agg(count(lit(1)).as("n_rows"))
        val toks = names.select(col("name"), col("n_rows"),
          explode(array_distinct(split(col("name"), " "))).as("tok"))
        // CONTRACT (VERDICT r17 #6): the token-df model broadcast is
        // bounded by the NAME-TOKEN VOCABULARY — the operator's declared
        // entity-resolution domain (names/brands/addresses: a bounded
        // lexicon even at 10⁹ rows, unlike the enum/model broadcasts
        // elsewhere this is a DOMAIN bound, not a structural one). A
        // FREE-TEXT input breaks it, so the bound is enforced
        // operationally: the vocab-sized df table materializes once
        // (localCheckpoint — its count is then a driver read, and both
        // the guard and the join read the same bytes), and a table
        // crossing the guard respells the model join SHUFFLE_HASH
        // instead of shipping an unbounded broadcast.
        val dfT = toks.groupBy("tok").agg(count(lit(1)).as("df"))
          .localCheckpoint()
        val withDf =
          if (dfT.count() <= FuzzyDfBroadcastCap)
            toks.join(broadcast(dfT), Seq("tok"))
          else toks.join(dfT.hint("shuffle_hash"), Seq("tok"))
        // materialized once (localCheckpoint): both join sides read the
        // keyed name space instead of re-deriving the agg + df + window
        // chain per side (Spark shares no common subplan across a
        // self-join without materialization — measured 22 exchange plan
        // lines un-checkpointed vs 6 after; the frame is
        // distinct-name-sized, the same bound the join itself carries)
        val keyed = withDf
          .withColumn("rn", row_number().over(
            Window.partitionBy("name").orderBy(col("df"), col("tok"))))
          .filter(col("rn") === 1)
          .select(col("tok").as("ktok"), col("name"), col("n_rows"))
          .localCheckpoint()
        val a = keyed.select(col("ktok"), col("name").as("name_a"),
          col("n_rows").as("n_a"))
        val b = keyed.select(col("ktok"), col("name").as("name_b"),
          col("n_rows").as("n_b"))
        a.join(b.hint("shuffle_hash"), Seq("ktok"))
          .filter(col("name_a") < col("name_b"))
          .filter(abs(length(col("name_a")) - length(col("name_b"))) <= tau)
          .withColumn("dist",
            levenshtein(col("name_a"), col("name_b")).cast(LongType))
          .filter(col("dist") <= tau)
          .select(col("name_a"), col("name_b"), col("dist"),
            col("n_a"), col("n_b"))
          .orderBy("name_a", "name_b")
      },
      Some("""WITH n AS (
                SELECT p_name AS name, count(*) AS n_rows FROM part GROUP BY 1),
              t AS (
                SELECT DISTINCT name, unnest(string_split(name, ' ')) AS tok
                FROM n),
              df AS (SELECT tok, count(*) AS df FROM t GROUP BY 1),
              keyed AS (
                SELECT name, tok AS ktok FROM (
                  SELECT t.name, t.tok,
                         row_number() OVER (PARTITION BY t.name
                           ORDER BY df.df, t.tok) AS rn
                  FROM t JOIN df ON df.tok = t.tok) r
                WHERE rn = 1),
              cand AS (
                SELECT a.name AS name_a, b.name AS name_b
                FROM keyed a JOIN keyed b
                  ON a.ktok = b.ktok AND a.name < b.name
                WHERE abs(len(a.name) - len(b.name)) <= 4),
              v AS (
                SELECT name_a, name_b,
                       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
                FROM cand)
              SELECT v.name_a, v.name_b, v.dist,
                     na.n_rows AS n_a, nb.n_rows AS n_b
              FROM v
              JOIN n na ON na.name = v.name_a
              JOIN n nb ON nb.name = v.name_b
              WHERE v.dist <= 4
              ORDER BY name_a, name_b"""),
      "String-similarity self-join (Ed-Join prefix filtering, Xiao et al. 2008): " +
        "distinct part names within edit distance 4, candidates bounded to pairs " +
        "sharing their rarest token + the length band — exact duplicates collapse " +
        "BEFORE the quadratic verify, so buckets are name-vocabulary-sized at any " +
        "row count; codegen'd levenshtein verify, SHUFFLE_HASH-pinned key join")
  )

  /** Morton/Z-order bit-spread: the 32 low bits of `x` spread to even bit
    * positions of a 64-bit value (the classic mask-shift ladder, 5
    * steps). Pure codegen'd integer ops — ~6 bitwise instructions per
    * step, composed from built-ins (the brief's option (a)): no UDF, no
    * custom Expression, and short enough to stay far from the JIT
    * huge-method cliff the flat 64-term dot-product chain hit (r5). */
  private def zSpread(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFFFFFL))
    v = (v.bitwiseOR(shiftleft(v, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x3333333333333333L))
    (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Z-order (Morton) key of two 32-bit dimensions: bits interleave
    * (`a` on even positions, `b` on odd), so points close in BOTH
    * dimensions are close on the key and a sort by it clusters every
    * output file around a compact 2-D rectangle. */
  private[graft] def zorderKey(a: Column, b: Column): Column =
    zSpread(a).bitwiseOR(shiftleft(zSpread(b), 1))

  /** (min day, max day, min custkey, max custkey) of orders — one
    * min/max footer-stats job, 4 longs to the driver (the k-row
    * pre-aggregated-fetch allowance, like centroid training). Feeds both
    * the normalized z-key and the data-relative box as LITERALS. */
  private[graft] def zorderBounds(s: SparkSession, d: String): (Long, Long, Long, Long) = {
    val b = Tables.orders(s, d)
      .select(
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("day"),
        col("o_custkey"))
      .agg(min("day"), max("day"), min("o_custkey"), max("o_custkey"))
      .head()
    (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
  }

  /** The z-key actually laid down: each dimension first normalized to a
    * 10-bit [0, 1024) position within its own min..max span, THEN
    * interleaved. Raw interleaving is a trap whenever the dimensions'
    * magnitudes differ — here day carries constant high bits (~2^13)
    * and a ~2^11 span while custkey spans ~2^10, so the raw key's top
    * varying bits alternate unevenly and equal-frequency file boundaries
    * land mid-cell, inflating every file's (day, custkey) bounding box
    * (measured: raw-key layout emitted 4237 rows on the spec's box where
    * the normalized key emits ~1700). Normalizing makes both dimensions
    * uniform 10-bit ranks, so the interleaved key's bit ladder splits
    * the space into balanced alternating slabs — the same move
    * production z-order writers make (range-partition ids per column,
    * e.g. Delta OPTIMIZE ZORDER BY) expressed as two literal-bound
    * affine maps (equal-width, which on near-uniform columns equals the
    * rank map without the extra per-column sort). */
  private[graft] def zorderNormKey(day: Column, ck: Column,
      bounds: (Long, Long, Long, Long)): Column = {
    val (mnd, mxd, mnc, mxc) = bounds
    val dayN = (day - lit(mnd)) * lit(1024L) / lit(mxd - mnd + 1)
    val ckN = (ck - lit(mnc)) * lit(1024L) / lit(mxc - mnc + 1)
    zorderKey(dayN.cast(LongType), ckN.cast(LongType))
  }

  /** The data-relative 2-D box q_zorder_layout scans: the 50-75% window
    * of the day span x the 25-50% window of the custkey span — balanced
    * quarter-ish selectivity on BOTH dimensions, the regime where
    * multi-dimensional clustering beats any 1-D sort. Pure integer
    * arithmetic on non-negative spans, so DuckDB's `//` (floor) and JVM
    * `/` (truncate) agree and the oracle re-derives the identical box
    * from the same table. */
  private[graft] def zorderBox(bounds: (Long, Long, Long, Long)): (Long, Long, Long, Long) = {
    val (mnd, mxd, mnc, mxc) = bounds
    (mnd + (mxd - mnd) * 50 / 100, mnd + (mxd - mnd) * 75 / 100,
      mnc + (mxc - mnc) * 25 / 100, mnc + (mxc - mnc) * 50 / 100)
  }
}
