package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.control.Wipe

/** Delete-side query surface (SURVEY.md §2 S9/S10/J4/J5; reference
  * wiper.py / deleteorphan.py). Fact/content tables are SYNTHESIZED from
  * `events`; the oracles spell the reference's own SQL shapes (NOT EXISTS
  * ×3 for the GC, recursive-tree anti-join for the wipe) so a green hash
  * checks the anti-join plumbing end to end.
  */
object WipeQueries {

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_orphan_gc", Seq("S10", "J4"),
      (s, d) => {
        val ev = Tables.events(s, d)
        val k = get_json_object(col("props"), "$.k").cast(LongType)
        val data = ev.select(col("event_id").as("id"))
        val releaseRefs = ev.filter(col("user_id") % 2 === 0).select(col("event_id").as("data_id"))
        val recordRefs = ev.filter(k % 3 === 0).select(col("event_id").as("data_id"))
        val compiledRefs = ev.filter(k % 5 === 0).select(col("event_id").as("data_id"))
        Wipe.orphans(data, "id", Seq(releaseRefs, recordRefs, compiledRefs))
          .orderBy("id")
      },
      Some("""SELECT event_id AS id FROM events e
              WHERE NOT EXISTS (
                      SELECT 1 FROM events r WHERE r.user_id % 2 = 0
                        AND r.event_id = e.event_id)
                AND NOT EXISTS (
                      SELECT 1 FROM events r
                      WHERE CAST(r.props->>'$.k' AS BIGINT) % 3 = 0
                        AND r.event_id = e.event_id)
                AND NOT EXISTS (
                      SELECT 1 FROM events r
                      WHERE CAST(r.props->>'$.k' AS BIGINT) % 5 = 0
                        AND r.event_id = e.event_id)
              ORDER BY id"""),
      "Orphan GC (S10): content rows referenced by none of the three fact FK " +
        "projections, as chained left-anti joins; oracle is the reference's NOT EXISTS x3"),

    QueryDef(
      "q_wipe_survivors", Seq("S9", "J5", "A1"),
      (s, d) => {
        // facts assigned to the nation-derived collection DAG; wiping the
        // trees rooted at 0 and 30 must also remove their derived
        // (upgraded/compiled) collections' rows
        val ev = Tables.events(s, d)
        val k = get_json_object(col("props"), "$.k").cast(LongType)
        val nk = col("user_id") % 25
        val cid = nk * 10 +
          when(nk % 2 === 0 && k % 2 === 0, 1)
            .when(nk % 3 === 0 && k % 5 === 0, 2)
            .otherwise(0)
        val facts = ev.select(cid.cast(LongType).as("collection_id"), col("event_id"))
        Wipe.wipeTrees(facts, DagQueries.collections(s, d), Seq(0L, 30L))
          .groupBy("collection_id")
          .agg(count(lit(1)).as("n"))
          .orderBy("collection_id")
      },
      Some(s"""WITH RECURSIVE ${DagQueries.OracleColls},
               tree AS (
                 SELECT id, parent, id AS root, 1 AS deep
                 FROM colls WHERE parent IS NULL
                 UNION ALL
                 SELECT c.id, c.parent, t.root, t.deep + 1
                 FROM colls c JOIN tree t ON c.parent = t.id),
               doomed AS (SELECT id FROM tree WHERE root IN (0, 30)),
               facts AS (
                 SELECT CAST((user_id % 25) * 10 +
                        CASE WHEN (user_id % 25) % 2 = 0
                                  AND CAST(props->>'$$.k' AS BIGINT) % 2 = 0 THEN 1
                             WHEN (user_id % 25) % 3 = 0
                                  AND CAST(props->>'$$.k' AS BIGINT) % 5 = 0 THEN 2
                             ELSE 0 END AS BIGINT) AS collection_id,
                        event_id
                 FROM events)
               SELECT collection_id, count(*) AS n
               FROM facts f
               WHERE NOT EXISTS (SELECT 1 FROM doomed x WHERE x.id = f.collection_id)
               GROUP BY collection_id ORDER BY collection_id"""),
      "Cascading wipe (S9): facts surviving deletion of two collection trees " +
        "(closure includes derived collections), via broadcast left-anti on the DAG closure")
  )
}
