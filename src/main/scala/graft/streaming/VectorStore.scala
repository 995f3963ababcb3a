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
  def codebookPath(lake: String): String = s"$lake/vector_codebooks"

  /** Load the stored quantizer, or train it from `vecs` and persist it
    * (first call). Training delegates to the deterministic
    * fixed-point-exact trainer the batch ANN family uses. */
  def centroidsOf(spark: SparkSession, lake: String, vecs: => DataFrame): Array[Array[Double]] = {
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

  /** Load the stored residual PQ codebooks, or train them from `vecs`
    * over the stored/trained coarse quantizer and persist them (first
    * call) — the centroid stability contract extended to the fine
    * quantizer: codes written by later batches MUST come from the same
    * codebooks or the persisted index silently mixes codebook epochs.
    * Returns the full [[graft.VectorQueries.AdcKit]] (ONE spelling of
    * encode/score, shared with the batch q_ann_ivfadc). */
  def kitOf(spark: SparkSession, lake: String, vecs: => DataFrame): graft.VectorQueries.AdcKit = {
    import spark.implicits._
    val cs = centroidsOf(spark, lake, vecs)
    val cbs = graft.ingest.Sink.readOrEmpty(spark, codebookPath(lake)) match {
      case Some(df) =>
        val rows = df.select(col("m"), col("cell"), col("c"))
          .as[(Long, Long, Seq[Double])].collect()
        rows.groupBy(_._1).toArray.sortBy(_._1)
          .map(_._2.sortBy(_._2).map(_._3.toArray))
      case None =>
        val trained = graft.VectorQueries.trainPqCodebooks(vecs, spark, res = cs)
        (for { m <- trained.indices; j <- trained(m).indices }
          yield (m.toLong, j.toLong, trained(m)(j).toSeq))
          .toDF("m", "cell", "c")
          .coalesce(1).write.mode("overwrite").parquet(codebookPath(lake))
        trained
    }
    graft.VectorQueries.AdcKit(cs, cbs)
  }

  /** The stored kit for SERVING — load-only, never train (ADVICE r17):
    * [[kitOf]]'s load-or-train fallback is correct at APPEND time (the
    * first batch trains the store's permanent quantizers) but lethal at
    * probe time — a store whose codebook artifact vanished (partial
    * store copy, deleted dir) while its coded rows survived would
    * silently retrain NEW codebooks and score the OLD persisted code
    * bytes against them, serving mixed-epoch ADC scores with no error.
    * Serving requires both trained artifacts to already exist and fails
    * with the rebuild instruction otherwise. */
  def servingKitOf(spark: SparkSession, lake: String): graft.VectorQueries.AdcKit = {
    def missing(what: String) =
      s"vector store at $lake has coded rows but no persisted $what — " +
        "retraining at serve time would score the stored codes against " +
        "a different quantizer epoch; rebuild the store (re-append the " +
        "corpus to a fresh store, or Cli vector-index) before serving " +
        "ADC probes"
    require(graft.ingest.Sink.readOrEmpty(spark, centroidPath(lake)).isDefined,
      missing("coarse quantizer (vector_centroids)"))
    require(graft.ingest.Sink.readOrEmpty(spark, codebookPath(lake)).isDefined,
      missing("PQ codebooks (vector_codebooks)"))
    kitOf(spark, lake,
      sys.error("unreachable: servingKitOf verified both artifacts exist"))
  }

  private def assigned(
      spark: SparkSession, vecs: DataFrame,
      kit: graft.VectorQueries.AdcKit): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(kit)
    vecs.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val k = bc.value
        it.map { case (id, v) =>
          val u = k.unitOf(v)
          val cell = k.cellOf(u)
          (id, v, cell.toLong, k.codesOf(u, cell).toSeq)
        }
      }
      .toDF("vec_id", "embedding", "cell", "codes")
  }

  /** Cell assignment WITHOUT codes — the dedup probe's path (r17
    * review: the probe only joins on the cell, so encoding 8 residual
    * codes per probe-batch row was pure waste, and worse, a probe on a
    * lake whose codebooks don't exist yet would have TRAINED them from
    * the arbitrary probe batch and persisted that accident as the
    * store's permanent fine quantizer). Centroids only. */
  private def cellAssigned(
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
    * AND residual PQ codes with the stored quantizers (trained on this
    * batch if absent) — every appended row is already indexed, so the
    * store doubles as an incrementally-maintained IVFADC index
    * ([[adcProbe]] serves queries from the codes alone). One narrow
    * shuffle: repartition on cell keeps files-per-batch = touched
    * cells, not tasks × cells. */
  def append(spark: SparkSession, lake: String, vecs: DataFrame): Unit = {
    assigned(spark, vecs, kitOf(spark, lake, vecs))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(vecPath(lake))
  }

  /** Serve an ANN query FROM THE STORE's persisted codes — the dense
    * twin of [[PostingsStore.probe]] (the serving composition eats its
    * own index): compile the query against the stored kit (probe set,
    * decimal LUT, per-cell constants), statically prune the scan to the
    * probed `cell=` partitions, fold replay duplicates, and ADC-score
    * the 8 stored code bytes per row — the embedding column is never
    * read. Byte-identical to the batch q_ann_ivfadc on the same rows
    * (same kit arithmetic by construction; VectorStoreSpec pins it).
    * At 100 TB the probe reads probes/k of the code column only. */
  def adcProbe(
      spark: SparkSession, lake: String, qv: Seq[Float],
      probes: Int, k: Int, exclude: Set[Long] = Set.empty): DataFrame = {
    import spark.implicits._
    val store = graft.ingest.Sink.readOrEmpty(spark, vecPath(lake))
      .getOrElse(return Seq.empty[(Long, Double)].toDF("vec_id", "adc"))
    // a lake written before the coded-index layout has no codes column
    // (or null codes on its old rows after a mixed append): serving it
    // silently would drop stored vectors from every answer, so fail
    // LOUDLY with the rebuild instruction instead (r17 review)
    require(store.columns.contains("codes"),
      s"vector store at $lake predates the coded IVFADC layout — " +
        "rebuild it (re-append the corpus to a fresh store, or Cli " +
        "vector-index) before serving ADC probes")
    val kit = servingKitOf(spark, lake)
    val q = kit.query(qv, probes)
    val cells = q.probeSet.map(_.toLong).toSeq
    val bcQ = spark.sparkContext.broadcast(q)
    val pruned = store.filter(col("cell").isin(cells: _*))
    val nUncoded = pruned.filter(col("codes").isNull).count()
    require(nUncoded == 0L,
      s"$nUncoded stored vectors in the probed cells have no codes " +
        s"(pre-layout rows mixed into $lake) — rebuild the store before " +
        "serving ADC probes")
    pruned
      .filter(if (exclude.isEmpty) lit(true)
              else !col("vec_id").isin(exclude.toSeq: _*))
      // at-least-once replay rows are byte-identical (same kit, same
      // vector) — one survives, whichever
      .dropDuplicates("vec_id")
      .select(col("vec_id"), col("cell"), col("codes"))
      .as[(Long, Long, Seq[Int])]
      .mapPartitions { it =>
        val qq = bcQ.value
        it.map { case (id, cell, codes) =>
          (id, qq.scoreDec(cell.toInt, codes.toArray).doubleValue)
        }
      }
      .toDF("vec_id", "adc")
      .select(col("vec_id"), round(col("adc"), 9).as("adc"))
      .orderBy(col("adc").desc, col("vec_id"))
      .limit(k)
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
    val batch =
      cellAssigned(spark, vecs, centroidsOf(spark, lake, vecs)).localCheckpoint()
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
