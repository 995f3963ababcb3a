package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType, StructField, StructType}

/** The aggregation buffer: a value → count map. In the EXACT regime the
  * keys are the raw non-negative values themselves (at most `capacity`
  * distinct); past the bound the keys become log-bucket indices (see
  * [[QSketch.bucketOf]]) whose count is bounded by the value domain's
  * dynamic range (≤ ~2900 buckets across all of [1, 2^63) at γ ≈ 1%),
  * plus the dedicated zero slot. `dense` marks the regime. */
final class QBuffer(
    val counts: java.util.HashMap[java.lang.Long, Array[Long]],
    var dense: Boolean)

/** Buffer operations of the two-regime quantile sketch, factored out of
  * the Catalyst aggregate (the [[MisraGries]]/[[Hll]] precedent) so
  * driver-side consumers can fold stored sketches with identical math.
  *
  * Regime conversion is LOSSLESS at the bucket level — every exact value
  * maps to its bucket and counts add — so the dense-bucket contents equal
  * what direct bucketing of the whole stream would produce regardless of
  * WHEN each buffer converted: output is bit-identical for any
  * partitioning and merge order, in both regimes. */
private[graft] object QSketch {

  /** Base^(1/2) of the geometric buckets: γ = sqrt(Base) - 1 ≈ 1% bounds
    * the relative value error of any reported quantile in the dense
    * regime (the DDSketch guarantee, Masson et al. 2019 — chosen over
    * KLL/random-compaction sketches because those flip coins: a
    * deterministic engine cannot ship an aggregate whose output depends
    * on an RNG draw). */
  val Base = 1.02
  private val LnBase = math.log(Base)

  /** Bucket index of a POSITIVE value; bucket i covers [Base^i,
    * Base^(i+1)). Deterministic per value (one double log, the same code
    * path on every partition). */
  def bucketOf(v: Long): Long = math.floor(math.log(v.toDouble) / LnBase).toLong

  /** Integer representative of bucket i — the rounded geometric midpoint
    * Base^(i+1/2), within γ of every value the bucket covers. */
  def repOf(i: Long): Long = math.rint(math.exp((i + 0.5) * LnBase)).toLong

  def add(buf: QBuffer, v: Long, weight: Long, capacity: Int): Unit = {
    val key: java.lang.Long =
      if (!buf.dense) v
      else if (v == 0L) Long.MinValue // the zero slot (log has no bucket for it)
      else bucketOf(v)
    val c = buf.counts.get(key)
    if (c != null) c(0) += weight
    else {
      buf.counts.put(key, Array(weight))
      if (!buf.dense && buf.counts.size > capacity) toDense(buf)
    }
  }

  def toDense(buf: QBuffer): Unit = {
    val entries = buf.counts.entrySet().toArray(
      new Array[java.util.Map.Entry[java.lang.Long, Array[Long]]](buf.counts.size))
    buf.counts.clear()
    buf.dense = true
    entries.foreach { e =>
      val v = e.getKey.longValue()
      val key: java.lang.Long = if (v == 0L) Long.MinValue else bucketOf(v)
      val c = buf.counts.get(key)
      if (c != null) c(0) += e.getValue()(0)
      else buf.counts.put(key, Array(e.getValue()(0)))
    }
  }

  /** Fold `other` into `buf`; `other` is consumed. */
  def merge(buf: QBuffer, other: QBuffer, capacity: Int): QBuffer = {
    if (other.dense && !buf.dense) toDense(buf)
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (other.dense) {
        // both dense now: bucket keys add directly
        val c = buf.counts.get(e.getKey)
        if (c != null) c(0) += e.getValue()(0)
        else buf.counts.put(e.getKey, e.getValue)
      } else add(buf, e.getKey.longValue(), e.getValue()(0), capacity)
    }
    buf
  }

  /** The PUBLIC sketch-as-bytes format (`quantile_sketch_bin` output and
    * the persistent stats store's on-disk form): [dense byte][count int]
    * [key long, count long]…. Hand-rolled ByteBuffer — thread-safe,
    * stable across Spark versions. Keys are written in ascending order
    * so the blob itself is deterministic for a given buffer. */
  def toBytes(buf: QBuffer): Array[Byte] = {
    val entries = buf.counts.entrySet().toArray(
      new Array[java.util.Map.Entry[java.lang.Long, Array[Long]]](buf.counts.size))
    java.util.Arrays.sort(entries,
      (a: java.util.Map.Entry[java.lang.Long, Array[Long]],
       b: java.util.Map.Entry[java.lang.Long, Array[Long]]) =>
        java.lang.Long.compare(a.getKey, b.getKey))
    val bb = java.nio.ByteBuffer.allocate(5 + 16 * entries.length)
    bb.put(if (buf.dense) 1: Byte else 0: Byte).putInt(entries.length)
    entries.foreach(e => bb.putLong(e.getKey.longValue()).putLong(e.getValue()(0)))
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): QBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val dense = bb.get() == 1
    val n = bb.getInt()
    val buf = new QBuffer(new java.util.HashMap[java.lang.Long, Array[Long]](n * 2), dense)
    var i = 0
    while (i < n) { buf.counts.put(bb.getLong(), Array(bb.getLong())); i += 1 }
    buf
  }

  /** The house integer-arithmetic percentile rank: 1-indexed
    * ceil(n·p/100) = (n·p + 99) div 100 — the exact formula
    * q_length_quantiles pins, no interpolation. Returns the value (exact
    * regime) or the bucket representative (dense) at ranks p50/p90/p99,
    * plus max and n. */
  def quantiles(buf: QBuffer): (Long, Long, Long, Long, Long) = {
    val entries = buf.counts.entrySet().toArray(
      new Array[java.util.Map.Entry[java.lang.Long, Array[Long]]](buf.counts.size))
    java.util.Arrays.sort(entries,
      (a: java.util.Map.Entry[java.lang.Long, Array[Long]],
       b: java.util.Map.Entry[java.lang.Long, Array[Long]]) =>
        java.lang.Long.compare(a.getKey, b.getKey)) // zero slot MinValue sorts first
    var n = 0L
    entries.foreach(e => n += e.getValue()(0))
    def valueAt(rank: Long): Long = {
      var cum = 0L
      var i = 0
      while (i < entries.length) {
        cum += entries(i).getValue()(0)
        if (cum >= rank) {
          val k = entries(i).getKey.longValue()
          return if (!buf.dense) k
          else if (k == Long.MinValue) 0L
          else repOf(k)
        }
        i += 1
      }
      0L
    }
    if (n == 0L) (0L, 0L, 0L, 0L, 0L)
    else (n,
      valueAt((n * 50 + 99) / 100),
      valueAt((n * 90 + 99) / 100),
      valueAt((n * 99 + 99) / 100),
      valueAt(n))
  }
}

/** `quantile_sketch(x, capacity)` — mergeable bounded-memory rank
  * quantiles over a non-negative BIGINT stream: result
  * `struct<n, p50, p90, p99, max, exact>`.
  *
  * This makes REAL the second swap the exact queries document for 100 TB
  * ("approx_percentile/KLL at scale", q_length_quantiles): the exact
  * per-source rank sort shuffles every row to its group; this aggregate
  * map-side-combines value→count maps whose size is bounded by
  * min(distinct values, capacity) in the exact regime and by the value
  * domain's dynamic range (≤ ~2900 geometric buckets over [1, 2^63) at
  * γ ≈ 1%, plus a zero slot) in the dense regime — so the shuffle
  * carries bounded partials, never the stream.
  *
  * Two self-describing regimes, the freq_items/distinct_sketch
  * discipline: while every buffer's distinct-value count stays ≤
  * capacity, the map IS an exact histogram — the reported quantiles
  * equal the house integer-rank percentiles bit-for-bit (`exact = true`,
  * and the declared q_length_sketch query hash-matches
  * q_length_quantiles' DuckDB oracle). Past the bound, values collapse
  * into geometric buckets of relative width γ = √1.02 − 1 ≈ 1% and each
  * reported quantile is its bucket's rounded geometric midpoint — within
  * γ of the true order statistic's value (`exact = false`; the DDSketch
  * relative-accuracy contract, Masson et al. 2019, referee-bounded in
  * QuantileSketchSpec).
  *
  * Why not KLL (the textbook mergeable rank sketch): KLL's compactors
  * keep odd or even survivors by a COIN FLIP — the unbiasedness argument
  * needs the randomness — so two runs of the same query could report
  * different quantiles. This engine's contract is bit-identical output
  * across runs, partitionings and merge orders; the deterministic
  * relative-accuracy bucket design gives that for free: counts add
  * (commutative/associative), regime conversion is lossless at the
  * bucket level, and the final map depends only on the multiset of
  * values (QuantileSketchSpec pins invariance). Rank error is zero in
  * both regimes — the dense regime's error is in the reported VALUE
  * (≤ γ relative), the right trade for size/latency metrics where 1% of
  * the value is noise but a wrong rank is a wrong SLO.
  *
  * Negative input is a loud error (rank statistics over the engine's
  * count/size columns have no negative domain; a silent bucket for
  * negatives would mask upstream bugs). Nulls are skipped. */
case class QuantileSketch(
    child: Expression,
    capacity: Int,
    /** true = the `quantile_sketch_bin` form: eval returns the PUBLIC
      * [[QSketch.toBytes]] blob instead of the quantile struct (the
      * stored-sketch-column pattern; see [[DistinctSketch.emitBinary]]). */
    emitBinary: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QBuffer] with UnaryLike[Expression] {

  require(capacity >= 1, s"quantile_sketch capacity must be >= 1, got $capacity")

  override def createAggregationBuffer(): QBuffer =
    new QBuffer(new java.util.HashMap[java.lang.Long, Array[Long]](), false)

  override def update(buf: QBuffer, input: InternalRow): QBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      if (x < 0)
        throw new IllegalArgumentException(
          s"quantile_sketch input must be >= 0, got $x")
      QSketch.add(buf, x, 1L, capacity)
    }
    buf
  }

  override def merge(buf: QBuffer, other: QBuffer): QBuffer =
    QSketch.merge(buf, other, capacity)

  override def eval(buf: QBuffer): Any =
    if (emitBinary) QSketch.toBytes(buf)
    else {
      val (n, p50, p90, p99, mx) = QSketch.quantiles(buf)
      InternalRow(n, p50, p90, p99, mx, !buf.dense)
    }

  // buffer rides the shuffle as one unsafe row: (keys, counts, dense)
  @transient private lazy val bufProjection =
    UnsafeProjection.create(Array[DataType](
      ArrayType(LongType, containsNull = false),
      ArrayType(LongType, containsNull = false), BooleanType))
  override def serialize(buf: QBuffer): Array[Byte] = {
    val n = buf.counts.size
    val keys = new Array[Any](n)
    val cnts = new Array[Any](n)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey.longValue()
      cnts(i) = e.getValue()(0)
      i += 1
    }
    bufProjection.apply(InternalRow(
      new GenericArrayData(keys), new GenericArrayData(cnts), buf.dense)).getBytes
  }
  override def deserialize(bytes: Array[Byte]): QBuffer = {
    val row = new UnsafeRow(3)
    row.pointTo(bytes, bytes.length)
    val keys = row.getArray(0)
    val cnts = row.getArray(1)
    val buf = new QBuffer(
      new java.util.HashMap[java.lang.Long, Array[Long]](keys.numElements() * 2),
      row.getBoolean(2))
    var i = 0
    while (i < keys.numElements()) {
      buf.counts.put(keys.getLong(i), Array(cnts.getLong(i)))
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    if (emitBinary) org.apache.spark.sql.types.BinaryType
    else StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("p50", LongType, nullable = false),
      StructField("p90", LongType, nullable = false),
      StructField("p99", LongType, nullable = false),
      StructField("max", LongType, nullable = false),
      StructField("exact", BooleanType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String =
    if (emitBinary) "quantile_sketch_bin" else "quantile_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"quantile_sketch input must be BIGINT, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketch =
    copy(child = newChild)
}
