package graft.control

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Collection-DAG closure (SURVEY.md §2 J6/O6; reference recursive-CTE
  * `tree` endpoint, `process/views.py:288-323`).
  *
  * The collection dimension is control-plane-sized (thousands of rows, depth
  * ≤ 3: original → upgraded → compiled), so the closure is an iterative
  * self-join UNION loop to fixpoint — the standard Spark rendering of a
  * recursive CTE. The per-level `count()` driver action is deliberate and
  * safe at this cardinality; it terminates after max-depth iterations
  * regardless of data (cycles excluded by the parent-FK construction).
  */
object Dag {

  /** All (root, id, deep) rows of the forest closure. `collections` needs
    * (id, parent) columns; roots are rows with NULL parent. */
  def tree(collections: DataFrame): DataFrame = {
    val base = collections.select(col("id").cast(LongType).as("id"),
      col("parent").cast(LongType).as("parent"))
    var level = base.filter(col("parent").isNull)
      .select(col("id").as("root"), col("id"), lit(1L).as("deep"))
    var acc = level
    var levelCount = level.count()
    while (levelCount > 0) {
      val next = base.alias("c")
        .join(level.alias("t"), col("c.parent") === col("t.id"))
        .select(col("t.root").as("root"), col("c.id").as("id"),
          (col("t.deep") + 1L).as("deep"))
      levelCount = next.count()
      if (levelCount > 0) acc = acc.union(next)
      level = next
    }
    acc
  }
}
