package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.control.Dag

/** Collection-DAG query surface (SURVEY.md §2 J6/O6/U2; reference
  * `process/views.py:157-331`).
  *
  * The driver tables carry no collection dimension, so one is SYNTHESIZED
  * from `nation` (a true small-dim source): every nation is an original
  * collection; even keys add an upgraded child; keys divisible by 3 add a
  * compiled child under the deepest existing node — producing chains of
  * depth 1, 2 and 3, the same shape as the reference's
  * original → upgraded → compiled forest.
  */
object DagQueries {

  /** The synthesized collection dimension: (id, parent, transform_type).
    * Shared with [[WipeQueries]]. */
  private[graft] def collections(s: SparkSession, d: String): DataFrame = {
    val nk = col("n_nationkey").cast(LongType)
    val n = Tables.nation(s, d)
    val original = n.select(
      (nk * 10).as("id"),
      lit(null).cast(LongType).as("parent"),
      lit(null).cast(StringType).as("transform_type"))
    val upgraded = n.filter(nk % 2 === 0).select(
      (nk * 10 + 1).as("id"),
      (nk * 10).as("parent"),
      lit("upgrade-1-0-to-1-1").as("transform_type"))
    val compiled = n.filter(nk % 3 === 0).select(
      (nk * 10 + 2).as("id"),
      when(nk % 2 === 0, nk * 10 + 1).otherwise(nk * 10).as("parent"),
      lit("compile-releases").as("transform_type"))
    original.unionByName(upgraded).unionByName(compiled)
  }

  private[graft] val OracleColls =
    """colls AS (
         SELECT CAST(n_nationkey AS BIGINT) * 10 AS id,
                CAST(NULL AS BIGINT) AS parent,
                CAST(NULL AS VARCHAR) AS transform_type
         FROM nation
         UNION ALL
         SELECT CAST(n_nationkey AS BIGINT) * 10 + 1,
                CAST(n_nationkey AS BIGINT) * 10,
                'upgrade-1-0-to-1-1'
         FROM nation WHERE n_nationkey % 2 = 0
         UNION ALL
         SELECT CAST(n_nationkey AS BIGINT) * 10 + 2,
                CASE WHEN n_nationkey % 2 = 0
                     THEN CAST(n_nationkey AS BIGINT) * 10 + 1
                     ELSE CAST(n_nationkey AS BIGINT) * 10 END,
                'compile-releases'
         FROM nation WHERE n_nationkey % 3 = 0)"""

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_tree", Seq("J6", "O6"),
      (s, d) => {
        val colls = collections(s, d)
        Dag.tree(colls)
          // explicit broadcast: the collection registry is control-plane-
          // bounded (thousands of rows at any corpus size) — without the
          // hint the join is estimate-dependent and degrades to a
          // SortMergeJoin once small-SF size estimates are gone
          .join(broadcast(colls.select(col("id"), col("transform_type"))), Seq("id"))
          .select(col("root"), col("id"), col("deep"), col("transform_type"))
          .orderBy("root", "deep", "id")
      },
      Some(s"""WITH RECURSIVE $OracleColls,
               tree AS (
                 SELECT id, parent, id AS root, CAST(1 AS BIGINT) AS deep
                 FROM colls WHERE parent IS NULL
                 UNION ALL
                 SELECT c.id, c.parent, t.root, t.deep + 1
                 FROM colls c JOIN tree t ON c.parent = t.id)
               SELECT t.root, t.id, t.deep, c.transform_type
               FROM tree t JOIN colls c ON t.id = c.id
               ORDER BY t.root, t.deep, t.id"""),
      "Collection-tree closure (J6): iterative self-join union to fixpoint over the " +
        "synthesized original->upgraded->compiled forest, ORDER BY deep (O6); the oracle " +
        "is the reference's own recursive CTE (views.py:288-323)"),

    QueryDef(
      "q_pkg_union_samples", Seq("U2", "O4", "F1"),
      (s, d) => {
        // the metadata endpoint's license/publicationPolicy lookup: one
        // sample package from the record side UNION ALL one from the release
        // side (views.py:209-228), LIMIT 1 made deterministic by id order
        val pkg = Tables.events(s, d).select(
          col("event_id"), col("user_id"),
          concat(lit("{\"license\":\"L"), col("user_id") % 7,
            lit("\",\"publicationPolicy\":\"P"), col("user_id") % 3, lit("\"}")).as("data"))
        def side(name: String, filter: org.apache.spark.sql.Column): DataFrame =
          pkg.filter(filter).orderBy("event_id").limit(1)
            .select(
              lit(name).as("side"),
              get_json_object(col("data"), "$.license").as("license"),
              get_json_object(col("data"), "$.publicationPolicy").as("publication_policy"))
        side("record", col("user_id") % 2 === 0)
          .unionByName(side("release", col("user_id") % 2 === 1))
          .orderBy("side")
      },
      Some("""WITH pkg AS (
                SELECT event_id, user_id,
                       '{"license":"L' || CAST(user_id % 7 AS VARCHAR)
                         || '","publicationPolicy":"P' || CAST(user_id % 3 AS VARCHAR)
                         || '"}' AS data
                FROM events)
              SELECT side, data->>'$.license' AS license,
                     data->>'$.publicationPolicy' AS publication_policy
              FROM (
                (SELECT 'record' AS side, data FROM pkg WHERE user_id % 2 = 0
                 ORDER BY event_id LIMIT 1)
                UNION ALL
                (SELECT 'release' AS side, data FROM pkg WHERE user_id % 2 = 1
                 ORDER BY event_id LIMIT 1))
              ORDER BY side"""),
      "Two deterministic LIMIT-1 package samples combined with UNION ALL (U2/O4) and " +
        "JSON-extracted license/publicationPolicy (F1) — the metadata endpoint's lookup shape")
  )
}
