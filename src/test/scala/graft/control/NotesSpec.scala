package graft.control

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** collection_note builders + the bounded notes read endpoint. */
class NotesSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark

  private def notesDf(rows: (Long, String, String)*) = {
    import s.implicits._
    rows.toDF("collection_id", "code", "note")
      .withColumn("data", org.apache.spark.sql.functions.lit("{}"))
  }

  test("fromCompileWarnings: (non-object) becomes an ERROR note, paths become WARNINGs") {
    import s.implicits._
    val w = Seq(("ocds-a", "(non-object)"), ("ocds-b", "parties"))
      .toDF("ocid", "path")
    val out = Notes.fromCompileWarnings(w, 7L).collect().map(r =>
      (r.getAs[Long]("collection_id"), r.getAs[String]("code"), r.getAs[String]("note")))
    assert(out.toSet === Set(
      (7L, "ERROR", "OCID ocds-a could not be compiled."),
      (7L, "WARNING", "OCID ocds-b: merge warning at parties")))
  }

  test("forTree bounds notes per code but reports the full count") {
    val many = (1 to 25).map(i => (1L, "WARNING", f"note-$i%03d"))
    val out = Notes.forTree(notesDf(many: _*), Seq(1L), maxPerCode = 10).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("n_total") === 25L)
    val shown = r.getSeq[Row](r.fieldIndex("notes")).map(_.getString(0))
    assert(shown.size === 10)
    // the bound keeps the FIRST page in sorted order
    assert(shown === (1 to 10).map(i => f"note-$i%03d"))
  }

  test("forTree filters to the requested tree ids and levels") {
    val df = notesDf(
      (1L, "INFO", "keep-info"), (1L, "ERROR", "keep-error"),
      (2L, "INFO", "other-collection"), (1L, "WARNING", "filtered-level"))
    val out = Notes.forTree(df, Seq(1L), levels = Seq("INFO", "ERROR")).collect()
    assert(out.map(_.getAs[String]("code")).toSeq === Seq("ERROR", "INFO"))
    assert(out.forall(_.getAs[Long]("n_total") === 1L))
  }
}
