package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The aggregation buffer: EXACT sparse set of 64-bit item hashes until
  * the set outgrows m/4 entries, then dense HyperLogLog registers (m =
  * 2^precision bytes, fixed forever after). `regs == null` ⇔ sparse. */
final class HllBuffer(
    var sparse: java.util.HashSet[java.lang.Long],
    var regs: Array[Byte])

/** The buffer operations of the two-regime distinct sketch, factored out
  * of the Catalyst aggregate ([[FreqItems]]/[[MisraGries]] precedent) so a
  * driver-side consumer folding per-batch sketches runs the identical
  * math. All operations are order- and partitioning-insensitive: set
  * union and register-wise max are commutative/associative/idempotent, so
  * the final buffer — not just the estimate — is bit-identical for ANY
  * partitioning of the same multiset (HllSpec pins it). */
private[graft] object Hll {

  /** XXH64 (seed 42, Spark's own implementation) of the item's UTF-8
    * bytes — the same stable 64-bit hash family the engine's xxhash64
    * exposes, giving the uniform bit-distribution HLL's rank statistics
    * assume. */
  def hash(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  def sparseLimit(p: Int): Int = (1 << p) / 4

  /** Fold one hashed observation in, converting sparse → dense when the
    * exact set outgrows its bound. */
  def add(buf: HllBuffer, h: Long, p: Int): Unit =
    if (buf.regs == null) {
      buf.sparse.add(h)
      if (buf.sparse.size > sparseLimit(p)) toDense(buf, p)
    } else addDense(buf.regs, h, p)

  private def addDense(regs: Array[Byte], h: Long, p: Int): Unit = {
    val idx = (h >>> (64 - p)).toInt
    // rank = leading zeros of the remaining 64-p bits, + 1; a value whose
    // suffix is all zeros caps at 64-p+1 (the standard convention)
    val rest = h << p
    val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def toDense(buf: HllBuffer, p: Int): Unit = {
    val regs = new Array[Byte](1 << p)
    val it = buf.sparse.iterator()
    while (it.hasNext) addDense(regs, it.next(), p)
    buf.regs = regs
    buf.sparse = null
  }

  /** Fold `other` into `buf`. `other` is consumed. */
  def merge(buf: HllBuffer, other: HllBuffer, p: Int): HllBuffer = {
    if (other.regs == null) {
      // a sparse side folds hash-by-hash through add(), which handles
      // both of buf's regimes and the mid-merge sparse→dense conversion
      val it = other.sparse.iterator()
      while (it.hasNext) add(buf, it.next().longValue(), p)
    } else if (buf.regs == null) {
      // adopt the dense side, fold our sparse hashes in
      val mine = buf.sparse
      buf.regs = other.regs
      buf.sparse = null
      val it = mine.iterator()
      while (it.hasNext) addDense(buf.regs, it.next(), p)
    } else {
      var i = 0
      val m = 1 << p
      while (i < m) {
        if (other.regs(i) > buf.regs(i)) buf.regs(i) = other.regs(i)
        i += 1
      }
    }
    buf
  }

  /** The PUBLIC sketch-as-bytes format (`distinct_sketch_bin` output and
    * the persistent stats store's on-disk form — distinct from the
    * aggregate's internal shuffle row): [mode byte 0|1][count int][sparse
    * longs… | register bytes…]. Hand-rolled ByteBuffer so it is
    * thread-safe and stable across Spark versions. */
  def toBytes(buf: HllBuffer): Array[Byte] =
    if (buf.regs == null) {
      val bb = java.nio.ByteBuffer.allocate(5 + 8 * buf.sparse.size)
      bb.put(0: Byte).putInt(buf.sparse.size)
      val it = buf.sparse.iterator()
      while (it.hasNext) bb.putLong(it.next().longValue())
      bb.array()
    } else {
      val bb = java.nio.ByteBuffer.allocate(5 + buf.regs.length)
      bb.put(1: Byte).putInt(buf.regs.length)
      bb.put(buf.regs)
      bb.array()
    }

  def fromBytes(bytes: Array[Byte]): HllBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val mode = bb.get()
    val n = bb.getInt()
    if (mode == 0) {
      val set = new java.util.HashSet[java.lang.Long](n * 2)
      var i = 0
      while (i < n) { set.add(bb.getLong()); i += 1 }
      new HllBuffer(set, null)
    } else {
      val regs = new Array[Byte](n)
      bb.get(regs)
      new HllBuffer(null, regs)
    }
  }

  /** The HLL estimate over dense registers (Flajolet et al. 2007): the
    * bias-corrected harmonic mean, with linear counting below 2.5·m when
    * empty registers remain. Fixed register-order summation → the double
    * arithmetic is deterministic for given registers (and the registers
    * themselves are partitioning-invariant). 64-bit hashes make the
    * large-range collision correction irrelevant at any feasible
    * cardinality. */
  def estimate(regs: Array[Byte], p: Int): Long = {
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += 1.0 / (1L << regs(i)).toDouble
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.rint(est).toLong
  }
}

/** `distinct_sketch(item, precision)` — mergeable bounded-memory distinct
  * count over a STRING stream: result `struct<est BIGINT, exact BOOLEAN>`.
  *
  * This makes REAL the swap the exact-distinct queries document for
  * 100 TB ("approx_count_distinct at scale", q_profile_orders /
  * q_count_distinct): a per-group COUNT(DISTINCT x) shuffles the full
  * distinct cardinality per group; this aggregate's buffer is bounded by
  * 2^precision bytes (plus the transient sparse set, itself bounded by
  * m/4 hashes) no matter the stream, its map-side partials combine by
  * register-wise max, and the shuffle carries partitions × 2^precision
  * bytes — the HyperLogLog contract (Flajolet et al. 2007), with the
  * sparse exact regime of HLL++ (Heule et al. 2013) below m/4 distincts.
  *
  * The two regimes are SELF-DESCRIBING, the freq_items discipline: while
  * every buffer stayed sparse, `est` is the exact distinct count and
  * `exact = true` — which is why the declared q_distinct_sketch query is
  * hash-checkable against a plain COUNT(DISTINCT) DuckDB oracle at
  * verify scale, while the SAME plan degrades to an estimate
  * (`exact = false`, relative error ~1.04/√m, referee-bounded in
  * HllSpec) past the threshold at 100 TB.
  *
  * Determinism: the sparse set is an exact hash set (order-free); dense
  * registers combine by max (commutative, associative, idempotent); the
  * estimate is computed once from the final registers with a fixed
  * summation order — so output is bit-identical across partitionings and
  * merge orders in BOTH regimes, unlike sampling-based estimators
  * (HllSpec pins invariance under repartition). Hash collisions in the
  * sparse regime (two items, one XXH64 value) would undercount by the
  * collision count — ~n²/2^65, zero for any feasible exact-regime n.
  * Null items are skipped (the COUNT convention). Like every
  * TypedImperativeAggregate this evaluates row-based outside whole-stage
  * codegen and pays buffer ser/de at the shuffle — bounded by 2^precision
  * bytes, which is the point. */
case class DistinctSketch(
    child: Expression,
    precision: Int,
    /** true = the `distinct_sketch_bin` form: eval returns the PUBLIC
      * [[Hll.toBytes]] blob instead of the (est, exact) struct — the
      * "sketch as a stored column" pattern, consumed by driver-side
      * folds ([[graft.streaming.StatsStore]]) and re-mergeable later
      * without re-touching the stream. */
    emitBinary: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllBuffer] with UnaryLike[Expression] {

  require(precision >= 4 && precision <= 16,
    s"distinct_sketch precision must be in [4, 16], got $precision")

  override def createAggregationBuffer(): HllBuffer =
    new HllBuffer(new java.util.HashSet[java.lang.Long](), null)

  override def update(buf: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) Hll.add(buf, Hll.hash(v.asInstanceOf[UTF8String]), precision)
    buf
  }

  override def merge(buf: HllBuffer, other: HllBuffer): HllBuffer =
    Hll.merge(buf, other, precision)

  override def eval(buf: HllBuffer): Any =
    if (emitBinary) Hll.toBytes(buf)
    else if (buf.regs == null) InternalRow(buf.sparse.size.toLong, true)
    else InternalRow(Hll.estimate(buf.regs, precision), false)

  // buffer rides the shuffle as one unsafe row: (array<long> | null, regs | null)
  @transient private lazy val bufProjection =
    UnsafeProjection.create(Array[DataType](
      ArrayType(LongType, containsNull = false), BinaryType))
  override def serialize(buf: HllBuffer): Array[Byte] = {
    val sparse =
      if (buf.regs != null) null
      else {
        val arr = new Array[Any](buf.sparse.size)
        val it = buf.sparse.iterator()
        var i = 0
        while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
        new GenericArrayData(arr)
      }
    bufProjection.apply(InternalRow(sparse, buf.regs)).getBytes
  }
  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    if (row.isNullAt(0)) new HllBuffer(null, row.getBinary(1))
    else {
      val arr = row.getArray(0)
      val set = new java.util.HashSet[java.lang.Long](arr.numElements() * 2)
      var i = 0
      while (i < arr.numElements()) { set.add(arr.getLong(i)); i += 1 }
      new HllBuffer(set, null)
    }
  }

  override def dataType: DataType =
    if (emitBinary) BinaryType
    else StructType(Seq(
      StructField("est", LongType, nullable = false),
      StructField("exact", BooleanType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String =
    if (emitBinary) "distinct_sketch_bin" else "distinct_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"distinct_sketch item must be STRING, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def withNewMutableAggBufferOffset(newOffset: Int): DistinctSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DistinctSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DistinctSketch =
    copy(child = newChild)
}
