package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The native token_grams expression: parity with the interpreted HOF
  * form it replaced, edge widths, and null conventions. */
class TokenGramsSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def grams(text: String, w: Int): Seq[String] = {
    import s.implicits._
    GraftExtensions.ensureRegistered(s)
    Seq(text).toDF("t")
      .selectExpr(s"token_grams(split(t, ' '), $w) AS g")
      .as[Seq[String]].collect().head
  }

  test("W-token shingles match the HOF transform form") {
    assert(grams("a b c d", 2) === Seq("a b", "b c", "c d"))
    assert(grams("a b c d", 3) === Seq("a b c", "b c d"))
    assert(grams("a b c d", 4) === Seq("a b c d"))
  }

  test("W=1 is the token stream; fewer than W tokens is an EMPTY array") {
    assert(grams("x y", 1) === Seq("x", "y"))
    assert(grams("x y", 3) === Seq.empty)
  }

  test("empty-string tokens from repeated separators are preserved") {
    // split('a  b') -> ["a", "", "b"]: grams re-join what split produced,
    // exactly like the oracle's array_to_string slices
    assert(grams("a  b", 2) === Seq("a ", " b"))
  }

  test("NULL input is NULL; non-literal width is rejected at plan time") {
    import s.implicits._
    val r = Seq(Option.empty[String]).toDF("t")
      .selectExpr("token_grams(split(t, ' '), 2) AS g").collect().head
    assert(r.isNullAt(0))
    val e = intercept[Exception] {
      Seq(("a b", 2)).toDF("t", "w").selectExpr("token_grams(split(t, ' '), w)").collect()
    }
    assert(e.getMessage.contains("foldable"))
  }

  test("foldable integral widths of any type work; bad widths are analysis errors (ADVICE r11)") {
    import org.apache.spark.sql.AnalysisException
    // BIGINT / TINYINT literals are legitimate widths
    assert(s.sql("SELECT token_grams(array('a','b','c'), CAST(2 AS BIGINT)) AS g")
      .collect().head.getSeq[String](0) === Seq("a b", "b c"))
    assert(s.sql("SELECT token_grams(array('a','b','c'), CAST(2 AS TINYINT)) AS g")
      .collect().head.getSeq[String](0) === Seq("a b", "b c"))
    // null, zero, out-of-int-range, and non-integral widths all surface as
    // AnalysisException — not a raw IllegalArgumentException
    for (bad <- Seq("CAST(NULL AS INT)", "0", "CAST(3000000000 AS BIGINT)", "2.5")) {
      val e = intercept[AnalysisException] {
        s.sql(s"SELECT token_grams(array('a'), $bad)").collect()
      }
      assert(e.getMessage.toLowerCase.contains("token_grams width"),
        s"width $bad: ${e.getMessage}")
    }
  }
}
