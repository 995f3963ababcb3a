package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** The aggregation buffer: a distinct-set capped at cap+1 elements plus
  * the EXACT running min and row count (tracked outside the set, so they
  * stay exact after the set saturates). */
final class CappedSetBuffer(
    val set: mutable.HashSet[Any],
    var mn: Any,
    var cnt: Long)

/** `collect_capped(expr, cap)` — bucket stats in ONE aggregate whose
  * buffer NEVER exceeds cap+1 elements. Result struct, per group:
  *   ids  sorted distinct values, exactly `sort_array(collect_set(expr))`
  *        — or NULL once the group has more than `cap` distinct values
  *        (insertion stops at cap+1 already-distinct elements, so the
  *        marker is exact: no under- or over-counting is possible);
  *   mn   exact minimum over ALL rows (tracked beside the set);
  *   cnt  exact row count.
  *
  * TEST-SCOPE ONLY: a measured-and-rejected candidate engine for
  * [[graft.BucketPairs]], kept runnable beside [[graft.AbLshBench]] so
  * the round-10 three-way A/B stays reproducible. The r8 LSH engine's
  * plain `collect_set` held one buffer element per bucket member (a
  * 10⁵-doc template bucket = a 10⁵-element buffer); collect_capped
  * restores that one-ObjectHashAggregate plan shape — map-side partials,
  * no window sort — with the bound moved INTO the buffer, and lets AQE
  * empty-relation-prune the star branch when nothing overflows. It
  * LOST the A/B anyway: a TypedImperativeAggregate is row-based (no
  * whole-stage codegen) and pays per-group buffer ser/de at the
  * shuffle, measuring worse than the window engine at sf0.1 and 1.25×
  * worse at sf1 (candidate stage 1.56× vs 1.25× over the unbounded r8
  * floor), diverging as data grows — see BucketPairs' scaladoc for the
  * full adjudication.
  * Everything (ids, min, count) rides in a SINGLE aggregate function on
  * purpose: the engine's two consumers (all-pairs branch needs ids; the
  * star branch needs mn/cnt of oversized buckets) would otherwise be
  * column-pruned into two DIFFERENT aggregates over the same input, and
  * the signature pipeline would compute twice — one function means one
  * canonical aggregate subtree, so exchange reuse shares the map side
  * across both branches (verified in the executed plan: one sig
  * pipeline, ReusedExchange on the second consumer).
  *
  * Element type: any orderable type (longs here; the SimHash path
  * aggregates (doc_id, simhash) structs); sorting and `mn` use the
  * type's interpreted ordering, matching `sort_array`/`min`. Null
  * inputs are skipped like collect_set; unorderable types are rejected
  * at analysis. */
case class CollectCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedSetBuffer] with UnaryLike[Expression] {

  require(cap >= 1, s"collect_capped cap must be >= 1, got $cap")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): CappedSetBuffer =
    new CappedSetBuffer(mutable.HashSet.empty, null, 0L)

  override def update(buffer: CappedSetBuffer, input: InternalRow): CappedSetBuffer = {
    val value = child.eval(input)
    if (value != null) {
      buffer.cnt += 1
      if (buffer.mn == null || ordering.lt(value, buffer.mn))
        buffer.mn = InternalRow.copyValue(value)
      // size can reach cap+1 (the overflow marker) and never grows past
      // it; the HashSet dedups, so only NEW distinct elements advance it
      if (buffer.set.size <= cap) buffer.set += InternalRow.copyValue(value)
    }
    buffer
  }

  override def merge(buffer: CappedSetBuffer, other: CappedSetBuffer): CappedSetBuffer = {
    buffer.cnt += other.cnt
    if (other.mn != null && (buffer.mn == null || ordering.lt(other.mn, buffer.mn)))
      buffer.mn = other.mn
    val it = other.set.iterator
    while (buffer.set.size <= cap && it.hasNext) buffer.set += it.next()
    buffer
  }

  override def eval(buffer: CappedSetBuffer): Any = {
    val ids =
      if (buffer.set.size > cap) null
      else new GenericArrayData(buffer.set.toArray.sorted(ordering))
    InternalRow(ids, buffer.mn, buffer.cnt)
  }

  // serialize the buffer as one unsafe row of the result-struct schema
  // (ids may carry cap+1 elements mid-flight — the schema doesn't mind)
  @transient private lazy val bufProjection =
    UnsafeProjection.create(Array[DataType](dataType))
  override def serialize(buffer: CappedSetBuffer): Array[Byte] = {
    val ids = new GenericArrayData(buffer.set.toArray)
    bufProjection.apply(InternalRow(InternalRow(ids, buffer.mn, buffer.cnt)))
      .getBytes
  }
  override def deserialize(bytes: Array[Byte]): CappedSetBuffer = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val s = row.getStruct(0, 3)
    val arr = s.getArray(0)
    val set = mutable.HashSet.empty[Any]
    var i = 0
    while (i < arr.numElements()) {
      set += InternalRow.copyValue(arr.get(i, child.dataType))
      i += 1
    }
    val mn = if (s.isNullAt(1)) null
      else InternalRow.copyValue(s.get(1, child.dataType))
    new CappedSetBuffer(set, mn, s.getLong(2))
  }

  override def dataType: DataType = StructType(Seq(
    StructField("ids", ArrayType(child.dataType, containsNull = false), nullable = true),
    StructField("mn", child.dataType, nullable = true),
    StructField("cnt", LongType, nullable = false)))
  override def nullable: Boolean = false // the struct itself; ids/mn may be null
  override def prettyName: String = "collect_capped"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCapped =
    copy(child = newChild)
}
