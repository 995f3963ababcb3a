package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim).
  *
  * Numeric design: dot products / squared norms are per-element double
  * products (IEEE-deterministic) cast to DECIMAL(38,18) and folded with
  * `aggregate` — decimal addition is exact and order-insensitive, so
  * results are identical across Spark partitionings AND identical to the
  * DuckDB oracle. Only the final cosine = dot / (||a||·||b||) is double.
  *
  * Physical plan: the fold happens *inside the row* (one codegen'd
  * projection), so a pair join computes its dot product with zero shuffle —
  * the round-1 explode(64 terms)→groupBy formulation shuffled 64× the pair
  * count into a wide-key aggregation, which is exactly the shape that dies
  * at 100 TB. Pair generation is blocked on a key (`label` here; an LSH
  * bucket id in the scale path) so the join never goes quadratic in the
  * table size.
  */
object VectorQueries {

  private val Dim = 64
  private val Dec = DecimalType(38, 18)

  /** Exact decimal dot product of two float vectors, folded in-row:
    * sum_i cast(double(a_i)*double(b_i) as decimal(38,18)). */
  private def dotDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast(DoubleType) * y.cast(DoubleType)).cast(Dec)),
      lit(0).cast(Dec),
      // Spark types DECIMAL(38,18)+DECIMAL(38,18) as DECIMAL(38,17); the
      // re-cast keeps the accumulator at the zero's type so the lambda
      // typechecks (round-2 DATATYPE_MISMATCH). Values are unaffected: each
      // term is ~1e0, so 38-digit precision never saturates.
      (acc, x) => (acc + x).cast(Dec))

  /** Final cosine. The decimal sums are exact in both engines, but
    * DECIMAL→DOUBLE conversion can differ by 1 ulp between Spark (string
    * round-trip, correctly rounded) and DuckDB (int128 scale-divide), so the
    * result is rounded to 9 decimals — also used for ordering/thresholding,
    * keeping both engines' row sets and sort orders identical. */
  private def cosineCol(dot: Column, na: Column, nb: Column): Column =
    round(dot.cast(DoubleType) / (sqrt(na.cast(DoubleType)) * sqrt(nb.cast(DoubleType))), 9)

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_ann_bruteforce", Seq("A5", "O5", "J2"),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        // query vector = embedding of vec 0, broadcast to every partition;
        // dot + norm are in-row folds, so the scan is one codegen stage
        // feeding straight into TakeOrderedAndProject — the shape that
        // scales to any table size with a constant-size driver result
        val q = emb.filter(col("vec_id") === 0)
          .select(col("embedding").as("qe"), dotDec(col("embedding"), col("embedding")).as("qnorm_dec"))
        emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(
            col("vec_id"),
            cosineCol(
              dotDec(col("embedding"), col("qe")),
              dotDec(col("embedding"), col("embedding")),
              col("qnorm_dec")).as("cosine"))
          .orderBy(col("cosine").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
               sums AS (
                 SELECT e.vec_id,
                        SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)
                                 AS DECIMAL(38,18))) AS dot_dec,
                        SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
                                 AS DECIMAL(38,18))) AS norm_dec
                 FROM embeddings e, q, generate_series(1, $Dim) t(i)
                 GROUP BY e.vec_id),
               qn AS (SELECT norm_dec AS qnorm_dec FROM sums WHERE vec_id = 0)
               SELECT sums.vec_id,
                      round(CAST(dot_dec AS DOUBLE)
                        / (sqrt(CAST(norm_dec AS DOUBLE)) * sqrt(CAST(qnorm_dec AS DOUBLE))), 9)
                        AS cosine
               FROM sums, qn WHERE sums.vec_id <> 0
               ORDER BY cosine DESC, vec_id LIMIT 10"""),
      "Brute-force cosine top-k vs query vector (vec 0) — exact-decimal in-row fold, no shuffle"),

    QueryDef(
      "q_neardup_embedding", Seq("J1", "A5"),
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("label"), col("vec_id"), col("embedding"),
            dotDec(col("embedding"), col("embedding")).as("norm_dec"))
        val a = emb.select(
          col("label"), col("vec_id").as("vec_a"),
          col("embedding").as("emb_a"), col("norm_dec").as("norm_a"))
        val b = emb.select(
          col("label").as("label_b"), col("vec_id").as("vec_b"),
          col("embedding").as("emb_b"), col("norm_dec").as("norm_b"))
        a.join(b, col("label") === col("label_b") && col("vec_a") < col("vec_b"))
          .withColumn("cosine", cosineCol(dotDec(col("emb_a"), col("emb_b")), col("norm_a"), col("norm_b")))
          .filter(col("cosine") >= 0.3)
          .select(col("label"), col("vec_a"), col("vec_b"), col("cosine"))
          .orderBy("label", "vec_a", "vec_b")
      },
      Some(s"""WITH n AS (
                 SELECT e.vec_id, e.label, e.embedding,
                        SUM(CAST(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
                                 AS DECIMAL(38,18))) AS norm_dec
                 FROM embeddings e, generate_series(1, $Dim) t(i)
                 GROUP BY e.vec_id, e.label, e.embedding),
               pairs AS (
                 SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
                        a.norm_dec AS norm_a, b.norm_dec AS norm_b,
                        SUM(CAST(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)
                                 AS DECIMAL(38,18))) AS dot_dec
                 FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id,
                      generate_series(1, $Dim) t(i)
                 GROUP BY 1, 2, 3, 4, 5)
               SELECT label, vec_a, vec_b,
                      round(CAST(dot_dec AS DOUBLE)
                        / (sqrt(CAST(norm_a AS DOUBLE)) * sqrt(CAST(norm_b AS DOUBLE))), 9) AS cosine
               FROM pairs
               WHERE round(CAST(dot_dec AS DOUBLE)
                       / (sqrt(CAST(norm_a AS DOUBLE)) * sqrt(CAST(norm_b AS DOUBLE))), 9) >= 0.3
               ORDER BY label, vec_a, vec_b"""),
      "Embedding-cosine near-dup pairs, blocked by label (blocking key = the LSH-bucket scale pattern)")
  )
}
