package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** One buffered candidate. `payload` is an already-copied catalyst value. */
private[functions] final class TopKEntry(val score: Double, val id: Long, val payload: Any)

/** The aggregation buffer: a bounded min-heap of the best k entries seen,
  * ordered worst-first so the displacement test is one peek. NEVER holds
  * more than k elements — the property that makes the aggregate's partial
  * (map-side) buffers constant-size regardless of group cardinality. */
final class TopKBuffer(val heap: java.util.PriorityQueue[TopKEntry])

/** `topk_pairs(score, id, payload, k)` — bounded per-group top-k with
  * map-side combine: the k best (score DOUBLE, id BIGINT) pairs by
  * (score DESC, id ASC), each carrying an arbitrary `payload` column,
  * returned as `array<struct<score, id, payload>>` in that order.
  *
  * This is the aggregate a k-NN JOIN needs (see VectorQueries
  * q_knn_join): ranking n scored rows per query through a window
  * function shuffles ALL n×q scored rows; this aggregate's partial
  * buffers cap at k entries per (partition, group), so the shuffle
  * carries at most partitions × groups × k rows' worth of state — at
  * 100 TB the difference between shuffling the corpus and shuffling
  * kilobytes. The payload slot lets the caller carry the row data the
  * next stage needs (e.g. the candidate's embedding for exact
  * re-ranking) through the aggregation, avoiding a second corpus scan
  * to re-fetch it by id.
  *
  * Determinism: the kept SET is defined purely by the total order
  * (score DESC, id ASC) — a bounded heap keeps exactly that set
  * regardless of input order or partitioning, so results are identical
  * across partitionings whenever ids are distinct within a group (the
  * caller's contract; with duplicate (score, id) pairs the surviving
  * payload would be arrival-ordered). Score comparison uses
  * `java.lang.Double.compare` — the same total order Spark sorts
  * doubles with (NaN greatest, -0.0 < 0.0) — so a NaN score, if a
  * caller lets one through, ranks like it would in an ORDER BY instead
  * of poisoning the heap's invariant. Null score or null id skips the
  * row (the collect_set convention); a null payload is carried.
  *
  * Like every TypedImperativeAggregate this evaluates row-based (no
  * whole-stage codegen) and pays buffer ser/de at the shuffle — the
  * measured trade that LOST the LSH-candidate A/B (see CollectCapped)
  * where group count ~ corpus size. Here group count = the bounded
  * query-set size, so the aggregate sees the full corpus stream but
  * ships only q × k state (the A/B against the window spelling is
  * recorded in VectorQueries' q_knn_join scaladoc). */
case class TopKPairs(
    first: Expression, // score
    second: Expression, // id
    third: Expression, // payload
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with TernaryLike[Expression] {

  require(k >= 1, s"topk_pairs k must be >= 1, got $k")

  /** worst-first: a is ordered BEFORE b when a loses to b under
    * (score DESC, id ASC) — i.e. lower score, or same score + higher id. */
  private object WorstFirst extends java.util.Comparator[TopKEntry] {
    override def compare(a: TopKEntry, b: TopKEntry): Int = {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.id, a.id)
    }
  }

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(new java.util.PriorityQueue[TopKEntry](k, WorstFirst))

  private def offer(buf: TopKBuffer, score: Double, id: Long, payload: Any): Unit = {
    val h = buf.heap
    if (h.size < k) {
      h.add(new TopKEntry(score, id, payload))
    } else {
      val worst = h.peek()
      val c = java.lang.Double.compare(score, worst.score)
      if (c > 0 || (c == 0 && id < worst.id)) {
        h.poll()
        h.add(new TopKEntry(score, id, payload))
      }
    }
  }

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = first.eval(input)
    val i = second.eval(input)
    if (s != null && i != null) {
      val score = s.asInstanceOf[Double]
      val id = i.asInstanceOf[Long]
      // acceptance test BEFORE touching the payload: on the hot path the
      // full heap rejects almost every row (only ~k of each group's
      // stream ever inserts), and evaluating + deep-copying a payload
      // (e.g. a 64-float embedding) per rejected row would cost an
      // allocation per corpus×query pair — the exact overhead this
      // bounded aggregate exists to avoid
      val h = buffer.heap
      val accepts = h.size < k || {
        val worst = h.peek()
        val c = java.lang.Double.compare(score, worst.score)
        c > 0 || (c == 0 && id < worst.id)
      }
      if (accepts) {
        val p = third.eval(input)
        offer(buffer, score, id,
          if (p == null) null else InternalRow.copyValue(p))
      }
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(buffer, e.score, e.id, e.payload) // payloads already copied
    }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val arr = buffer.heap.toArray(new Array[TopKEntry](buffer.heap.size))
    // best-first output: exactly the reverse total order of the heap's
    java.util.Arrays.sort(arr, WorstFirst.reversed())
    new GenericArrayData(arr.map(e => InternalRow(e.score, e.id, e.payload)))
  }

  // buffer rides the shuffle as one unsafe row of the result array type
  // (≤ k elements by construction)
  @transient private lazy val bufProjection =
    UnsafeProjection.create(Array[DataType](dataType))
  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val arr = buffer.heap.toArray(new Array[TopKEntry](buffer.heap.size))
    bufProjection.apply(InternalRow(new GenericArrayData(
      arr.map(e => InternalRow(e.score, e.id, e.payload))))).getBytes
  }
  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getStruct(i, 3)
      offer(buf, s.getDouble(0), s.getLong(1),
        if (s.isNullAt(2)) null
        else InternalRow.copyValue(s.get(2, third.dataType)))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("payload", third.dataType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs score must be DOUBLE, got ${first.dataType.sql}")
    else if (second.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs id must be BIGINT, got ${second.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKPairs =
    copy(first = newFirst, second = newSecond, third = newThird)
}
