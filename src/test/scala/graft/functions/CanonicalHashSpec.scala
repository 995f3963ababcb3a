package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.ocds.Canonical

/** The native canonical_hash expression: registration, canonicalization
  * parity with the engine's serializer, null conventions, and presence
  * inside the codegen'd plan (no UDF fallback boundary). */
class CanonicalHashSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  test("registered via SparkSessionExtensions") {
    assert(GraftExtensions.installed(s))
  }

  test("hashes match the engine's canonical md5 (keys sorted, decimals exact)") {
    import s.implicits._
    val docs = Seq(
      """{"b": 1.10, "a": {"y": null, "x": [1, 2]}}""",
      """{"z": "é", "a": 1E+2}""")
    val got = docs.toDF("j").selectExpr("canonical_hash(j)").as[String].collect()
    val want = docs.map(d => Canonical.md5hex(Canonical.canonicalize(Canonical.parse(d))))
    assert(got.toSeq === want)
  }

  test("malformed JSON and NULL input hash to NULL (try_ convention)") {
    import s.implicits._
    val got = Seq("{bad", null).toDF("j")
      .selectExpr("canonical_hash(j)").as[String].collect()
    assert(got.toSeq === Seq(null, null))
  }

  test("malformed JSON hashes to NULL through WHOLE-STAGE CODEGEN too") {
    import s.implicits._
    // range() is non-foldable, so this exercises the generated code path —
    // the r4 defineCodeGen version NPE'd here (review finding)
    val got = s.range(2)
      .selectExpr("""canonical_hash(CASE WHEN id = 0 THEN '{bad' ELSE '{"a":1}' END) AS h""")
      .as[String].collect()
    assert(got(0) === null)
    assert(got(1) === Canonical.md5hex("""{"a":1}"""))
  }

  test("wrong arity is rejected at analysis, not silently truncated") {
    intercept[Exception](s.range(1).selectExpr("canonical_hash('{}', '{}')").collect())
    intercept[Exception](s.range(1).selectExpr("canonical_hash()").collect())
  }

  test("ensureRegistered is idempotent and works on an already-built session") {
    graft.functions.GraftExtensions.ensureRegistered(s)
    graft.functions.GraftExtensions.ensureRegistered(s)
    assert(GraftExtensions.installed(s))
  }

  test("key order does not change the hash; values do") {
    import s.implicits._
    val got = Seq("""{"a":1,"b":2}""", """{"b":2,"a":1}""", """{"a":1,"b":3}""")
      .toDF("j").selectExpr("canonical_hash(j)").as[String].collect()
    assert(got(0) === got(1))
    assert(got(0) !== got(2))
  }

  test("the expression sits inside whole-stage codegen (no UDF boundary)") {
    import s.implicits._
    // non-literal input (literals constant-fold at plan time — itself proof
    // the interpreted eval path works)
    val df = s.range(3)
      .selectExpr("""canonical_hash(concat('{"b":', id, ',"a":1}')) AS h""")
    assert(df.as[String].collect().distinct.length === 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("canonical_hash"))
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(")) // codegen span
    assert(!plan.contains("ScalaUDF"))
  }
}
