package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent cell-partitioned vector store — the streaming leg of the
  * semantic-curation family, composing three proven pieces: the trained
  * k-means quantizer (VectorQueries.trainCentroids), the cell=N
  * partition layout (q_ann_cell_layout), and NeardupStore's
  * probe-before-append streaming contract.
  *
  * One lake table, `vectors` (vec_id, embedding; partitioned by `cell`),
  * plus the quantizer persisted beside it (`centroids`) — assignments
  * must be STABLE across stream restarts, so the quantizer is trained
  * once (first append) and every later batch loads the stored copy; a
  * re-trained quantizer would silently re-shard the space and break
  * probe pruning against history.
  *
  * Per-batch flow (probe BEFORE append, so a vector never matches
  * itself): batch vectors → cell assignment via the stored centroids →
  * store scan PRUNED to the batch's touched cells (driver-side isin over
  * the ≤ k cell domain — static partition pruning, never a full-store
  * scan) → within-cell cosine ≥ τ flags (the SemDeDup contract: the
  * quadratic similarity search bounded by the Voronoi partition; a
  * near-dup pair straddling a cell boundary is invisible BY DESIGN, the
  * same recall trade the batch q_semantic_dedup documents) → then the
  * batch appends partition-wise.
  *
  * Join strategy and cosine arithmetic follow the streaming house rules:
  * shuffle_hash (the store side grows with the corpus — never an
  * estimate-dependent broadcast), and the flag cosine is the per-row
  * fixed-order double dot (deterministic per pair; the streaming flags
  * are operational signals, not oracle-hashed outputs — NeardupStore's
  * jaccard makes the same call). Duplicate rows from the at-least-once
  * replay window are harmless to the probe (flags are DISTINCT per
  * pair) and fold away in [[compact]]. */
object VectorStore {

  def vecPath(lake: String): String = s"$lake/vectors"
  def centroidPath(lake: String): String = s"$lake/vector_centroids"

  /** Load the stored quantizer, or train it from `vecs` and persist it
    * (first call). Training delegates to the deterministic
    * fixed-point-exact trainer the batch ANN family uses. */
  def centroidsOf(spark: SparkSession, lake: String, vecs: DataFrame): Array[Array[Double]] = {
    import spark.implicits._
    graft.ingest.Sink.readOrEmpty(spark, centroidPath(lake)) match {
      case Some(df) =>
        df.select(col("cell"), col("c")).as[(Long, Seq[Double])].collect()
          .sortBy(_._1).map(_._2.toArray)
      case None =>
        val cs = graft.VectorQueries.trainCentroids(vecs, spark)
        cs.zipWithIndex.toSeq.map { case (c, i) => (i.toLong, c.toSeq) }
          .toDF("cell", "c")
          .coalesce(1).write.mode("overwrite").parquet(centroidPath(lake))
        cs
    }
  }

  private def assigned(
      spark: SparkSession, vecs: DataFrame, cs: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cs)
    vecs.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val c = bc.value
        it.map { case (id, v) =>
          (id, v, graft.VectorQueries.probeCellsOf(c, v, 1).head)
        }
      }
      .toDF("vec_id", "embedding", "cell")
  }

  /** Append a batch ((vec_id, embedding)) to the store, assigning cells
    * with the stored quantizer (trained on this batch if absent). One
    * narrow shuffle: repartition on cell keeps files-per-batch = touched
    * cells, not tasks × cells. */
  def append(spark: SparkSession, lake: String, vecs: DataFrame): Unit = {
    val cs = centroidsOf(spark, lake, vecs)
    assigned(spark, vecs, cs)
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(vecPath(lake))
  }

  /** Probe a batch against the store: (vec_id, dup_of, cosine) for each
    * batch vector within cosine ≥ tau of an ALREADY-STORED vector in its
    * own cell (min dup_of on ties — one deterministic flag per batch
    * vector). Empty frame when the store doesn't exist yet. */
  def probeBatch(
      spark: SparkSession, lake: String, vecs: DataFrame, tau: Double): DataFrame = {
    import spark.implicits._
    graft.functions.GraftExtensions.ensureRegistered(spark)
    val empty = Seq.empty[(Long, Long, Double)].toDF("vec_id", "dup_of", "cosine")
    val store = graft.ingest.Sink.readOrEmpty(spark, vecPath(lake))
      .getOrElse(return empty)
    val cs = centroidsOf(spark, lake, vecs)
    val batch = assigned(spark, vecs, cs).localCheckpoint()
    // bounded by the quantizer's cell domain (k values), not batch size —
    // the driver-side list is what turns the store scan into static
    // partition pruning
    val touched = batch.select("cell").distinct().as[Long].collect()
    if (touched.isEmpty) return empty
    def dd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("dot_double", a, b)
    store.filter(col("cell").isin(touched: _*))
      .select(col("cell"), col("vec_id").as("dup_of"), col("embedding").as("se"))
      .join(batch.hint("shuffle_hash"), Seq("cell"))
      .filter(col("vec_id") =!= col("dup_of"))
      .withColumn("cosine",
        dd(col("embedding"), col("se")) /
          (sqrt(dd(col("embedding"), col("embedding"))) * sqrt(dd(col("se"), col("se")))))
      .filter(col("cosine") >= tau)
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("dup_of"), col("cosine")), col("dup_of")).as("m"))
      .select(col("vec_id"), col("m.dup_of").as("dup_of"), col("m.cosine").as("cosine"))
  }

  /** Small-file + duplicate-row maintenance; same commit protocol and
    * terminated-stream contract as [[NeardupStore.compact]]. */
  def compact(spark: SparkSession, lake: String): Long =
    NeardupStore.compactTable(spark, vecPath(lake), "cell")
}
