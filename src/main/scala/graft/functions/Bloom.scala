package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Shared bit math for the graft bloom filter pair (`bloom_agg` builds,
  * `bloom_contains` probes). The filter is a SELF-DESCRIBING byte blob:
  * an 8-byte header (m_bits int, k int, big-endian) followed by the bit
  * array packed into longs — a probe needs no out-of-band parameters, so
  * the blob can travel through a broadcast join like any column value.
  *
  * Hashing: the caller supplies ONE 64-bit hash per element (xxhash64 of
  * the value — computed with Spark's codegen'd built-in, outside this
  * pair), expanded to k probe positions by Kirsch-Mitzenmacher double
  * hashing: bit_i = (h1 + i·h2) mod m with h2 odd-mixed so strides hit
  * every bit. Deterministic everywhere — bit-identical filters across
  * partitionings (OR is commutative) and across engines. */
// public object: whole-stage-generated Java calls BloomBits.contains
object BloomBits {
  val HeaderBytes = 8

  def mix(h: Long): Long = {
    // the SplitMix64 finalizer — decorrelates h2 from h1
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def setBits(words: Array[Long], mBits: Int, k: Int, h: Long): Unit = {
    val h2 = mix(h) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h + i * h2, mBits).toInt
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  /** Probe a packed blob (header + words). Static so generated code can
    * call it — the expression stays inside whole-stage codegen. */
  def contains(blob: Array[Byte], h: Long): Boolean = {
    val mBits = ((blob(0) & 0xFF) << 24) | ((blob(1) & 0xFF) << 16) |
      ((blob(2) & 0xFF) << 8) | (blob(3) & 0xFF)
    val k = ((blob(4) & 0xFF) << 24) | ((blob(5) & 0xFF) << 16) |
      ((blob(6) & 0xFF) << 8) | (blob(7) & 0xFF)
    val h2 = mix(h) | 1L
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h + i * h2, mBits).toInt
      val b = blob(HeaderBytes + (bit >>> 3))
      if ((b & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }

  def pack(words: Array[Long], mBits: Int, k: Int): Array[Byte] = {
    val out = new Array[Byte](HeaderBytes + words.length * 8)
    out(0) = (mBits >>> 24).toByte; out(1) = (mBits >>> 16).toByte
    out(2) = (mBits >>> 8).toByte; out(3) = mBits.toByte
    out(4) = (k >>> 24).toByte; out(5) = (k >>> 16).toByte
    out(6) = (k >>> 8).toByte; out(7) = k.toByte
    var w = 0
    while (w < words.length) {
      val v = words(w)
      var b = 0
      while (b < 8) {
        // little-endian within the word so bit index maps to (byte, bit)
        // the same way contains() reads it
        out(HeaderBytes + w * 8 + b) = (v >>> (b * 8)).toByte
        b += 1
      }
      w += 1
    }
    out
  }

  def unpackWords(blob: Array[Byte]): Array[Long] = {
    val words = new Array[Long]((blob.length - HeaderBytes) / 8)
    var w = 0
    while (w < words.length) {
      var v = 0L
      var b = 0
      while (b < 8) {
        v |= (blob(HeaderBytes + w * 8 + b) & 0xFFL) << (b * 8)
        b += 1
      }
      words(w) = v
      w += 1
    }
    words
  }
}

final class BloomBuffer(val words: Array[Long])

/** `bloom_agg(hash64, m_bits, k)` — build a bloom filter over a stream of
  * 64-bit element hashes, as ONE distributive aggregate: per-partition
  * bit arrays OR together, so the full pass is map-side combined and the
  * shuffle carries m_bits/8 bytes per partition regardless of input rows.
  *
  * The 100 TB membership-prefilter shape (see q_decontaminate_bloom): a
  * reference set too large to broadcast as a distinct-key join build side
  * compresses to a fixed-size filter (1% FP at ~10 bits/element) that
  * broadcasts anywhere; probe-side rows that miss are discarded BEFORE
  * the exact verify join, so the shuffle downstream carries only true
  * hits + the FP sliver. False negatives are impossible by construction
  * (BloomSpec pins the property), so a downstream EXACT verify keeps
  * end-to-end results identical to the unfiltered plan.
  *
  * Null hashes are skipped (the collect_set convention). m_bits and k
  * are foldable integral literals; m_bits is rounded up to a multiple of
  * 64 so the word array packs exactly. */
case class BloomAgg(
    child: Expression,
    mBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomBuffer] with UnaryLike[Expression] {

  require(mBits >= 64 && mBits % 64 == 0,
    s"bloom_agg m_bits must be a positive multiple of 64, got $mBits")
  require(k >= 1 && k <= 16, s"bloom_agg k must be in [1, 16], got $k")

  override def createAggregationBuffer(): BloomBuffer =
    new BloomBuffer(new Array[Long](mBits / 64))

  override def update(buffer: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) BloomBits.setBits(buffer.words, mBits, k, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    var i = 0
    while (i < buffer.words.length) { buffer.words(i) |= other.words(i); i += 1 }
    buffer
  }

  override def eval(buffer: BloomBuffer): Any =
    BloomBits.pack(buffer.words, mBits, k)

  override def serialize(buffer: BloomBuffer): Array[Byte] =
    BloomBits.pack(buffer.words, mBits, k)
  override def deserialize(bytes: Array[Byte]): BloomBuffer =
    new BloomBuffer(BloomBits.unpackWords(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_agg element hash must be BIGINT, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `bloom_contains(bloom, hash64)` — probe a [[BloomAgg]] blob. Codegen'd
  * (one static call, stays inside the whole-stage span) so the prefilter
  * adds a branch per row, not a UDF boundary, on the probe-side scan. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains filter must be BINARY, got ${left.dataType.sql}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_contains hash must be BIGINT, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(blob: Any, h: Any): Any =
    BloomBits.contains(blob.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.BloomBits.contains($b, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
