package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All reads go through here so scan-level concerns live in one place:
  *  - `events.parquet` stores `ts` as parquet INT64 TIMESTAMP(NANOS) which
  *    Spark rejects by default; `spark.sql.legacy.parquet.nanosAsLong=true`
  *    reads it as LongType (nanoseconds since epoch). Queries convert to
  *    microseconds with integer division (never double division — an
  *    epoch-nanos value exceeds 2^53 and would lose precision).
  *  - At cluster scale these would be partitioned tables; in this harness
  *    each is a single parquet file, and Catalyst still gets filter
  *    pushdown + column pruning from the declarative plans built on top.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Session-level (dynamic) conf; required before touching events, harmless
    // for the rest. Set unconditionally so any entry point works.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Data-parallel fan-out for COMPUTE-bound stages (the JSON engines:
    * upgrade, merge, check, canonical-hash — ~5-20 µs/row of CPU).
    *
    * Spark sizes scan partitions by BYTES (`maxPartitionBytes`), which is
    * the wrong unit when per-row CPU dominates: this harness's tables are
    * single-row-group parquet files, so every scan is ONE task and a heavy
    * per-row engine would run on one core of 32 (r5 profiling:
    * q_upgrade_parties spent 2.6 s of its 3.3 s single-threaded). A
    * round-robin repartition costs one small shuffle (the rows are JSON
    * strings, MBs at test SF) and buys full-cluster parallelism for the
    * engine map above it. At production scale the same holds whenever
    * row-group granularity under-splits a CPU-heavy stage; the shuffle
    * stays proportional to input bytes while the win is proportional to
    * per-row CPU × rows. */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  private lazy val matBase: String =
    java.nio.file.Files.createTempDirectory("graft-mat").toString
  private val matCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Materialize a deterministic synthesized frame as real multi-file
    * parquet, once per JVM per (key, source dir).
    *
    * The reference's `data`/`release` tables are PERSISTENT storage; this
    * harness synthesizes them from `events` per query, which distorts two
    * things: the generator expression tree is re-executed (and re-pushed
    * into every consumer plan, so a predicate pushdown lands on the
    * synthesis instead of a scan), and the single-row-group source pins
    * scan-side work to one task. Writing the synthesized frame with
    * `defaultParallelism` partitions gives consumers what production would
    * have — a many-file parquet scan with real filter pushdown and
    * per-file parallelism — and keeps the generator's cost out of every
    * query but the first (per JVM). */
  def materialize(key: String, dir: String, df: => DataFrame): DataFrame = {
    val s = SparkSession.active
    val path = matCache.computeIfAbsent(s"$key-${dir.hashCode.toHexString}", { k =>
      val p = s"$matBase/$k"
      df.repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** [[materialize]] that preserves the CALLER's partitioning and in-
    * partition order — the seam for clustered layouts (Z-order, sorted
    * buckets) where the whole point is the row arrangement: `materialize`
    * would destroy it with its own round-robin repartition. The frame is
    * written exactly as given, so each output file's parquet min/max
    * stats reflect the caller's clustering and consumers get the
    * row-group skipping the layout was built for (q_zorder_layout,
    * ZorderLayoutSpec). */
  def materializeLayout(key: String, dir: String, df: => DataFrame): DataFrame = {
    val s = SparkSession.active
    val path = matCache.computeIfAbsent(s"$key-layout-${dir.hashCode.toHexString}", { k =>
      val p = s"$matBase/$k"
      df.write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** Materialize a SIDE-EFFECT-built directory (a lake-style store, not a
    * single frame), once per JVM per (key, source dir) — the seam for
    * declared queries that demonstrate a persisted-store probe
    * (q_bm25_indexed builds its postings store through the real
    * [[graft.streaming.PostingsStore.appendBatch]] write path here).
    * `build` receives the fresh directory path; the returned path is the
    * built store. */
  def materializeDir(key: String, dir: String)(build: String => Unit): String =
    matCache.computeIfAbsent(s"$key-dir-${dir.hashCode.toHexString}", { k =>
      val p = s"$matBase/$k"
      build(p)
      p
    })

  /** [[materialize]] with a Hive-style partition layout: the frame is
    * written `partitionBy(col)` so consumers that filter on `col` read
    * ONLY the matching directories (PartitionFilters in the scan — the
    * physical pruning mechanism the 100 TB layouts rely on). The
    * partition column comes back via directory-name inference, so its
    * type may widen (e.g. LONG → INT); join/filter comparisons coerce. */
  def materializePartitioned(
      key: String, dir: String, partCol: String, df: => DataFrame): DataFrame = {
    val s = SparkSession.active
    // partCol is part of the identity: the same (key, dir) materialized
    // under a different partition column is a DIFFERENT layout, and a
    // cache hit across them would silently hand a consumer a table whose
    // partition filter can't prune (r12 review)
    val path = matCache.computeIfAbsent(s"$key-part-$partCol-${dir.hashCode.toHexString}", { k =>
      val p = s"$matBase/$k"
      df.write.mode("overwrite").partitionBy(partCol).parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** events with `ts_us`: microseconds since epoch as BIGINT.
    *
    * The generator has shipped `ts` under two physical encodings across
    * rounds — INT64 TIMESTAMP(NANOS) (read as LongType via `nanosAsLong`)
    * and TIMESTAMP(MICROS) with isAdjustedToUTC=false (read as
    * TIMESTAMP_NTZ) — so the loader adapts to the scanned type instead of
    * assuming one. Both normalize to the same BIGINT microseconds DuckDB's
    * `epoch_us(ts)` produces: integer `DIV 1000` truncates nanos toward
    * zero, exactly like DuckDB's nanos→micros truncation (for a negative
    * pre-1970 epoch this is NOT floor, but both engines truncate the same
    * way, so the comparison stays exact either way; the generated data is
    * all post-1970). The NTZ leg casts to the session-zoned TIMESTAMP type
    * — via the explicit `TimestampType` object, NOT the string "timestamp",
    * which would resolve through `spark.sql.timestampType` and become a
    * no-op if that conf were ever NTZ — under the pinned UTC zone (every
    * entry point sets `spark.sql.session.timeZone=UTC`), which is the
    * identity mapping and matches DuckDB treating the naive value as-is. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = load(s, d, "events")
    val tsUs = df.schema("ts").dataType match {
      case LongType         => expr("ts DIV 1000")
      case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
      case _                => unix_micros(col("ts"))
    }
    df.withColumn("ts_us", tsUs)
  }
}
