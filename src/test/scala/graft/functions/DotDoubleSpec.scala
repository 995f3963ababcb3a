package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.{aggregate, col, expr, lit, zip_with}

import graft.SparkSuite

/** The native dot_double expression: value parity with the declarative
  * `aggregate(zip_with(...))` spelling it replaces, NULL conventions
  * (zip_with semantics), mixed float/double element types, and the
  * whole-stage-codegen path. */
class DotDoubleSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  test("registered via SparkSessionExtensions") {
    assert(GraftExtensions.installed(s))
  }

  test("matches the aggregate(zip_with(...)) fold bit-for-bit on float arrays") {
    import s.implicits._
    val rows = Seq(
      (Array(1.5f, -2.25f, 3f), Array(0.5f, 4f, -1.125f)),
      (Array(0f, 0f, 0f), Array(1f, 2f, 3f)),
      (Array(1e30f, 1f, -1e30f), Array(1f, 1f, 1f))) // order-sensitive case
    val df = rows.toDF("a", "b")
    val fold = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, x) => acc + x)
    val got = df.select(expr("dot_double(a, b)"), fold).collect()
    got.foreach { r =>
      // both are left-to-right double sums, so equality is exact
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) === 0)
    }
  }

  test("double-element arrays and mixed float/double work") {
    import s.implicits._
    val got = Seq((Array(1.5f, 2f), Array(2.0d, -0.5d)))
      .toDF("a", "b")
      .selectExpr("dot_double(a, b)", "dot_double(b, b)")
      .collect()
      .head
    assert(got.getDouble(0) === 1.5 * 2.0 + 2.0 * -0.5)
    assert(got.getDouble(1) === 4.0 + 0.25)
  }

  test("NULL array, NULL element, and length mismatch yield NULL (zip_with semantics)") {
    import s.implicits._
    val rows = Seq(
      (null.asInstanceOf[Array[java.lang.Float]], Array[java.lang.Float](1f)),
      (Array[java.lang.Float](1f, null), Array[java.lang.Float](1f, 2f)),
      (Array[java.lang.Float](1f), Array[java.lang.Float](1f, 2f)))
    val got = rows.toDF("a", "b").selectExpr("dot_double(a, b)").collect()
    got.foreach(r => assert(r.isNullAt(0), s"expected NULL, got $r"))
  }

  test("computes inside whole-stage codegen (non-foldable input)") {
    import s.implicits._
    // range() makes the projection non-foldable, exercising doGenCode
    val got = s.range(3)
      .selectExpr("CAST(array(id, id + 1) AS array<double>) AS a")
      .selectExpr("dot_double(a, a) AS d")
      .as[Double]
      .collect()
    assert(got.toSeq === Seq(0.0 * 0 + 1 * 1, 1.0 * 1 + 2 * 2, 2.0 * 2 + 3 * 3))
  }
}
