package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** q_zorder_layout — the multi-dimensional data-skipping claim, measured.
  * Same data, same 2-D box query, two layouts: sorted by one dimension
  * (the best a linear sort can do) vs sorted by the interleaved Z-order
  * key. The z-ordered scan must emit far fewer rows from the parquet
  * reader (row-group min/max skipping on BOTH columns) while producing
  * the identical result — plus unit pins of the Morton key itself. */
class ZorderLayoutSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark
  private val dir = "/root/testdata/sf0.01"

  test("morton key interleaves bits (known values)") {
    import s.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (7L, 7L))
      .toDF("a", "b")
      .select(RelationalQueries.zorderKey(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave(a even bits, b odd bits): (3,5) = 0b100111 = 39,
    // (7,7) = 0b111111 = 63
    assert(rows === Seq(0L, 1L, 2L, 39L, 63L))
  }

  test("z-order clusters both dimensions: box scan row-group-skips vs a linear sort") {
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val orders = Tables.orders(s, dir)
      .withColumn("day", expr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000"))
    val nFiles = 128
    val bounds = RelationalQueries.zorderBounds(s, dir)
    orders.withColumn("zkey",
        RelationalQueries.zorderNormKey(col("day"), col("o_custkey"), bounds))
      .repartitionByRange(nFiles, col("zkey")).sortWithinPartitions("zkey")
      .write.parquet(s"$base/zorder")
    orders // the strongest 1-D alternative: sorted by one of the box dims
      .repartitionByRange(nFiles, col("day")).sortWithinPartitions("day")
      .write.parquet(s"$base/linear_day")

    // the query's own data-relative balanced box (~25% of each dimension)
    val (dLo, dHi, cLo, cHi) = RelationalQueries.zorderBox(bounds)

    def boxScan(path: String): (Seq[(Long, Long)], Long) = {
      val df = s.read.parquet(path)
        .filter(col("day").between(dLo, dHi) &&
          col("o_custkey").between(cLo, cHi))
        .select(col("o_orderkey").cast(LongType), col("o_custkey").cast(LongType))
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val scan = PlanWalk.fileScans(df.queryExecution.executedPlan).head
      assert(scan.dataFilters.nonEmpty, s"no data filters pushed into:\n$scan")
      (rows, scan.metrics("numOutputRows").value)
    }

    val (zRows, zEmitted) = boxScan(s"$base/zorder")
    val (lRows, lEmitted) = boxScan(s"$base/linear_day")
    assert(zRows === lRows, "layout changed the answer")
    assert(zRows.nonEmpty, "degenerate box: nothing selected")
    info(s"scanner-emitted rows: zorder=$zEmitted linear(day)=$lEmitted")
    // the linear layout only skips on `day`: every file surviving the
    // 25%-of-days box spans the full custkey range, so its reader emits
    // the whole day slice (~26% of the table). the z-ordered files are
    // compact rectangles in (day, custkey) space, so stats prune on BOTH
    // predicates and the reader emits only the box's cells plus the
    // boundary straddle from equal-frequency file cuts (measured 1759 vs
    // 3867 at 128 files — 0.45x the best 1-D sort; the margin grows with
    // file count as straddle amortizes, which is the production regime).
    // 0.6 leaves slack for repartitionByRange's sampled boundaries.
    assert(zEmitted < lEmitted,
      s"z-order layout emitted no fewer rows ($zEmitted vs $lEmitted)")
    assert(zEmitted.toDouble < 0.6 * lEmitted.toDouble,
      s"z-order skipping too weak: $zEmitted vs $lEmitted")
  }

  test("declared query result is layout-invariant (matches a raw-table run)") {
    val (dLo, dHi, cLo, cHi) =
      RelationalQueries.zorderBox(RelationalQueries.zorderBounds(s, dir))
    val viaLayout = Queries.byName("q_zorder_layout").run(s, dir).collect().toSeq
    val raw = Tables.orders(s, dir)
      .withColumn("day", expr(
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000"))
      .filter(col("day").between(dLo, dHi) && col("o_custkey").between(cLo, cHi))
      .select(col("o_orderkey"), col("o_custkey"), col("day"), col("o_totalprice"))
      .orderBy("o_orderkey").collect().toSeq
    assert(viaLayout === raw)
    assert(raw.nonEmpty, "degenerate box: nothing selected")
  }
}
