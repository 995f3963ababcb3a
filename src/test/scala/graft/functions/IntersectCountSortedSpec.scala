package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** intersect_count_sorted vs size(array_intersect) on distinct-element
  * arrays — including the codegen path (DataFrame eval) and the edge
  * cases the merge walk must get right. */
class IntersectCountSortedSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def count(a: Seq[Long], b: Seq[Long]): Int = {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    Seq((a, b)).toDF("a", "b")
      .select(call_function("intersect_count_sorted", col("a"), col("b")).as("c"))
      .collect()(0).getInt(0)
  }

  test("matches array_intersect on sorted distinct arrays") {
    assert(count(Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)) === 2)
    assert(count(Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L)) === 3)
    assert(count(Seq(1L, 2L), Seq(3L, 4L)) === 0)
    assert(count(Seq.empty, Seq(1L)) === 0)
  }

  test("agrees with array_intersect on random sorted sets (both eval paths)") {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200) {
      (Seq.fill(rnd.nextInt(50))(rnd.nextInt(80).toLong).distinct.sorted,
        Seq.fill(rnd.nextInt(50))(rnd.nextInt(80).toLong).distinct.sorted)
    }
    val diff = rows.toDF("a", "b")
      .select(
        call_function("intersect_count_sorted", col("a"), col("b")).as("merge"),
        size(array_intersect(col("a"), col("b"))).as("hash"))
      .filter(col("merge") =!= col("hash"))
      .count()
    assert(diff === 0)
  }

  test("null array yields null") {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val r = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(call_function("intersect_count_sorted", col("a"), col("b")).as("c"))
      .collect()(0)
    assert(r.isNullAt(0))
  }
}
