package graft.control

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** S9/S10 semantics over a small multi-collection layout: wiping a
  * collection tree removes the derived collections' rows too, and the
  * orphan GC then collects content rows no fact references (`wiper.py`,
  * `deleteorphan.py`). */
class WipeSpec extends AnyFunSuite {

  private lazy val s = SparkSuite.spark
  import org.apache.spark.sql.functions.col

  // forest: 1 -> 2 (upgraded) -> 3 (compiled); 4 standalone
  private lazy val collections = {
    import s.implicits._
    Seq(
      (1L, Option.empty[Long], Option.empty[String]),
      (2L, Some(1L), Some("upgrade-1-0-to-1-1")),
      (3L, Some(2L), Some("compile-releases")),
      (4L, None, None)
    ).toDF("id", "parent", "transform_type")
  }

  // fact rows across collections, each referencing a data row
  private lazy val facts = {
    import s.implicits._
    Seq(
      (1L, 10L, 100L), (1L, 11L, 101L), (2L, 12L, 100L),
      (3L, 13L, 102L), (4L, 14L, 103L), (4L, 15L, 101L)
    ).toDF("collection_id", "fact_id", "data_id")
  }

  private lazy val data = {
    import s.implicits._
    Seq(100L, 101L, 102L, 103L, 104L).toDF("id")
  }

  test("wipeTrees removes the whole derived chain, keeps other collections") {
    val survivors = Wipe.wipeTrees(facts, collections, Seq(1L))
    import s.implicits._
    assert(survivors.select("fact_id").as[Long].collect().sorted === Array(14L, 15L))
  }

  test("wipeTrees with no roots is a no-op") {
    assert(Wipe.wipeTrees(facts, collections, Seq(99L)).count() === facts.count())
  }

  test("orphan GC collects rows unreferenced after a wipe (deleteorphan.py)") {
    import s.implicits._
    val survivors = Wipe.wipeTrees(facts, collections, Seq(1L))
    val orphans = Wipe.orphans(
      data, "id", Seq(survivors.select(col("data_id"))))
    // 103 + 101 still referenced by collection 4; 104 was always orphaned
    assert(orphans.as[Long].collect().sorted === Array(100L, 102L, 104L))
  }

  test("orphans with several ref tables = referenced by NONE (NOT EXISTS x3)") {
    import s.implicits._
    val r1 = Seq(100L).toDF("data_id")
    val r2 = Seq(101L).toDF("package_data_id")
    val r3 = Seq(102L, 103L).toDF("data_id")
    assert(Wipe.orphans(data, "id", Seq(r1, r2, r3)).as[Long].collect().sorted
      === Array(104L))
  }
}
