package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The aggregation buffer: the k smallest DISTINCT hash values seen, kept
  * in a sorted set so duplicates vanish on insert and eviction is one
  * `last()`. NEVER holds more than k elements — map-side partials are
  * constant-size regardless of group cardinality. */
final class BottomKBuffer(val set: java.util.TreeSet[java.lang.Long])

/** `bottomk(hash, k)` — the k smallest DISTINCT BIGINT hash values per
  * group, ascending, as `array<bigint>`: a KMV (k-minimum-values) sketch
  * (Bar-Yossef et al. 2002; Beyer et al. 2007 "Distinct-Value Synopses")
  * expressed as one bounded mergeable aggregate.
  *
  * One bounded summary, two readouts:
  *  - DISTINCT-COUNT: with hashes uniform on [0, H), the k-th smallest
  *    distinct hash h_k estimates the group's distinct cardinality as
  *    (k-1) · H / h_k; while fewer than k distinct hashes exist the array
  *    IS the distinct hash set and the count is exact — the engine's
  *    self-describing two-regime discipline (freq_items / distinct_sketch
  *    precedent), so a declared query hash-matches a plain SQL oracle at
  *    verify scale and the SAME plan estimates past the bound.
  *  - SAMPLE: the k minima of a uniform content-stable hash are a uniform
  *    size-k sample of the group's distinct values, reproducible across
  *    reruns, partitionings and engines — the deterministic complement of
  *    reservoir sampling, whose RNG draws are unshippable in a
  *    bit-deterministic engine (the KLL-rejection rationale).
  *
  * Scale contract: a per-group bottom-k through a window or ORDER BY
  * shuffles the group's ENTIRE distinct stream to its sort; this
  * aggregate's partial buffers cap at k longs per (partition, group), so
  * the shuffle carries partitions × groups × k × 8 bytes at any corpus
  * size. Unlike [[DistinctSketch]] (register-max combine, estimate-only
  * dense regime) the kept state here is VALUES, so the same sketch that
  * counts also samples and unions: merging two groups' sketches = merging
  * the sets and re-trimming to k (commutative, associative, idempotent —
  * partitioning-invariant by construction, BottomKSpec pins it).
  *
  * Determinism: the kept set is defined purely by the total order of the
  * hash values — no heap arrival-order effects, no RNG. Null hashes are
  * skipped (the COUNT convention). Like every TypedImperativeAggregate
  * this evaluates row-based outside whole-stage codegen and pays buffer
  * ser/de at the shuffle — k longs, which is the point. */
case class BottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKBuffer] with UnaryLike[Expression] {

  require(k >= 1 && k <= (1 << 20), s"bottomk k must be in [1, 2^20], got $k")

  override def createAggregationBuffer(): BottomKBuffer =
    new BottomKBuffer(new java.util.TreeSet[java.lang.Long]())

  private def offer(buf: BottomKBuffer, h: Long): Unit = {
    val s = buf.set
    if (s.size < k) { s.add(h); () }
    else if (h < s.last()) {
      // TreeSet.add dedups: only evict when the candidate actually entered
      if (s.add(h)) { s.remove(s.last()); () }
    }
  }

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) offer(buf, it.next().longValue())
    buf
  }

  override def eval(buf: BottomKBuffer): Any = {
    val arr = new Array[Any](buf.set.size)
    val it = buf.set.iterator() // ascending — the output contract
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  // buffer rides the shuffle as one unsafe row of the result array type
  // (≤ k elements by construction)
  @transient private lazy val bufProjection =
    UnsafeProjection.create(Array[DataType](dataType))
  override def serialize(buf: BottomKBuffer): Array[Byte] =
    bufProjection.apply(InternalRow(eval(buf))).getBytes
  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) { offer(buf, arr.getLong(i)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottomk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bottomk hash must be BIGINT, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomK =
    copy(child = newChild)
}
