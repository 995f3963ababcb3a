package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The native drop_positions expression: two-pointer parity with the HOF
  * filter form it replaced, plus the edge cases the merge walk must
  * absorb (duplicate / out-of-range positions, empty sides). */
class DropPositionsSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def drop(text: String, pos: Seq[Int]): Seq[String] = {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    Seq((text, pos)).toDF("t", "p")
      .selectExpr("drop_positions(split(t, ' '), p) AS k")
      .as[Seq[String]].collect().head
  }

  test("removes the 1-based positions, keeps order") {
    assert(drop("a b c d e", Seq(2, 4)) === Seq("a", "c", "e"))
    assert(drop("a b c", Seq(1, 2, 3)) === Seq.empty)
    assert(drop("a b c", Seq.empty) === Seq("a", "b", "c"))
  }

  test("duplicate and out-of-range positions are absorbed") {
    assert(drop("a b c", Seq(2, 2, 2)) === Seq("a", "c"))
    assert(drop("a b c", Seq(0, 4, 99)) === Seq("a", "b", "c"))
    assert(drop("a b c", Seq(-5, 1, 7)) === Seq("b", "c"))
  }

  test("null elements pass through as null, not garbage (ADVICE r11)") {
    // split() output is containsNull=false, but drop_positions is a
    // registered SQL function accepting ANY array<string> — a null token
    // in a kept slot must come back null, and a null position slot must
    // match nothing.
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    val out = s.sql(
      "SELECT drop_positions(array('a', CAST(NULL AS STRING), 'c'), array(1)) AS k")
      .as[Seq[String]].collect().head
    assert(out === Seq(null, "c"))
    val out2 = s.sql(
      "SELECT drop_positions(array('a', 'b'), array(CAST(NULL AS INT), 2)) AS k")
      .as[Seq[String]].collect().head
    assert(out2 === Seq("a"))
  }

  test("matches the HOF filter form on a real scrub-shaped input") {
    import s.implicits._
    import org.apache.spark.sql.functions._
    GraftExtensions.ensureRegistered(s)
    val df = Seq(("x y z x y z x", Seq(1, 2, 3, 5))).toDF("t", "p")
      .select(split(col("t"), " ").as("toks"), col("p"))
    val native = df.select(call_function("drop_positions", col("toks"), col("p")))
      .as[Seq[String]].collect().head
    val hof = df.select(filter(col("toks"), (t, i) => !array_contains(col("p"), i + 1)))
      .as[Seq[String]].collect().head
    assert(native === hof)
  }
}
