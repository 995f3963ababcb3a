package graft.control

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Collection-DAG closure (SURVEY.md §2 J6/O6; reference recursive-CTE
  * `tree` endpoint, `process/views.py:288-323`).
  *
  * The reference's collection forest is produced by its transform chain
  * (original → upgraded → compiled, reference `process/processors`), so its depth is
  * bounded by the number of transform kinds: ≤ 3 levels. The closure is
  * therefore a STATICALLY UNROLLED chain of self-joins — fully declarative,
  * zero driver actions, every join broadcast (the dimension is control-plane
  * sized). An earlier rendering looped `count()`-per-level on the driver;
  * the per-level job overhead dominated at toy scale (BENCH r5 regression
  * q_wipe_survivors 1.7→3.0 s) and bought nothing: termination is already
  * guaranteed by the model's depth bound, not by observing an empty level.
  */
object Dag {

  /** All (root, id, deep) rows of the forest closure. `collections` needs
    * (id, parent) columns; roots are rows with NULL parent. `maxDepth` is
    * the model's depth bound (reference transform chain: 3); levels beyond
    * it cannot exist under the parent-FK construction, and a caller with a
    * deeper model passes its own bound.
    */
  def tree(collections: DataFrame, maxDepth: Int = 3): DataFrame = {
    val base = collections.select(col("id").cast(LongType).as("id"),
      col("parent").cast(LongType).as("parent"))
    val roots = base.filter(col("parent").isNull)
      .select(col("id").as("root"), col("id"), lit(1L).as("deep"))
    var level = roots
    var acc = roots
    for (_ <- 2 to maxDepth) {
      level = base.alias("c")
        .join(broadcast(level.alias("t")), col("c.parent") === col("t.id"))
        .select(col("t.root").as("root"), col("c.id").as("id"),
          (col("t.deep") + 1L).as("deep"))
      acc = acc.union(level)
    }
    acc
  }
}
