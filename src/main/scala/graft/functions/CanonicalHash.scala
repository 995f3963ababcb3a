package graft.functions

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ocds.Canonical

/** `canonical_hash(json_text)` — the content-addressed identity of S8
  * (`process/util.py:93-110`: md5 over key-sorted, compact, decimal-exact
  * JSON) as a NATIVE Catalyst expression with code generation.
  *
  * This is the (b) tier of the custom-operator ladder (SURVEY §7.3): a
  * scalar that built-ins can't express (`to_json` doesn't sort keys or
  * preserve decimal text) implemented as a codegen'd `UnaryExpression` —
  * the generated code calls one static method, so the expression sits
  * INSIDE the whole-stage-codegen span instead of forcing a UDF fallback
  * boundary like `udf()` would. Registered under the name
  * `canonical_hash` via [[GraftExtensions]].
  *
  * Malformed JSON hashes to NULL (the `try_`-function convention) so one
  * bad document can't kill a scan — in BOTH evaluation paths: the
  * expression is `nullable` and the generated code re-checks the computed
  * value for null (r4 review: `defineCodeGen` alone propagated the null
  * into an NPE under whole-stage codegen). */
case class CanonicalHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql]; the inferred Seq[StringType.type] conforms
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // NULL input OR malformed JSON
  override def prettyName: String = "canonical_hash"

  override def nullSafeEval(input: Any): Any =
    CanonicalHashFns.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.CanonicalHashFns.compute($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): CanonicalHash =
    copy(child = newChild)
}

/** Static target for both the interpreted and the generated path (Scala
  * object methods get static forwarders, so generated Java calls this
  * directly). */
object CanonicalHashFns {
  def compute(s: UTF8String): UTF8String =
    try UTF8String.fromString(Canonical.contentHash(s.toString))
    catch { case NonFatal(_) => null } // malformed → NULL; never swallow
    // interrupts/fatal errors (task cancellation must propagate)
}

/** Session-extension hook: `builder.withExtensions(GraftExtensions.install)`
  * (SparkSessionExtensions is the public registration surface; all of this
  * library's mains and test sessions install it). Queries that need the
  * function in a CALLER-OWNED session (the external driver builds its own)
  * call [[ensureRegistered]] first — registration is idempotent. */
object GraftExtensions {
  /** Foldable integral literal in [lo, hi], surfaced through the
    * analysis-time error channel — the ONE copy of the argument contract
    * token_grams / bloom_agg / topk_pairs share (r12 review: three
    * inlined copies of this block had already started drifting). */
  private def intLit(
      e: Expression, fn: String, what: String, lo: Long, hi: Long,
      range: String): Int = {
    import org.apache.spark.sql.types._
    def fail(why: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" ->
          s"$fn $what must be $why, got ${e.sql}"))
    if (!e.foldable) fail("a foldable integral literal")
    val v: Long = (e.dataType, e.eval()) match {
      case (_, null)        => fail("a non-null integral literal")
      case (ByteType, x)    => x.asInstanceOf[Byte].toLong
      case (ShortType, x)   => x.asInstanceOf[Short].toLong
      case (IntegerType, x) => x.asInstanceOf[Int].toLong
      case (LongType, x)    => x.asInstanceOf[Long]
      case _                => fail("an integral literal")
    }
    if (v < lo || v > hi) fail(s"an integral literal in $range")
    v.toInt
  }

  private val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("canonical_hash"),
      new ExpressionInfo(classOf[CanonicalHash].getName, "canonical_hash"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"canonical_hash expects exactly 1 argument, got ${children.size}")
        CanonicalHash(children.head)
      }),
    (
      FunctionIdentifier("dot_double"),
      new ExpressionInfo(classOf[DotDouble].getName, "dot_double"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"dot_double expects exactly 2 arguments, got ${children.size}")
        DotDouble(children.head, children(1))
      }),
    (
      FunctionIdentifier("intersect_count_sorted"),
      new ExpressionInfo(classOf[IntersectCountSorted].getName, "intersect_count_sorted"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"intersect_count_sorted expects exactly 2 arguments, got ${children.size}")
        IntersectCountSorted(children.head, children(1))
      }),
    (
      FunctionIdentifier("token_grams"),
      new ExpressionInfo(classOf[TokenGrams].getName, "token_grams"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"token_grams expects exactly 2 arguments, got ${children.size}")
        // any foldable integral literal works (INT is what SQL users
        // write, but CAST(2 AS BIGINT) / TINYINT literals are equally
        // legitimate); bad widths surface as AnalysisException via the
        // shared intLit contract
        TokenGrams(children.head,
          intLit(children(1), "token_grams", "width", 1, Int.MaxValue, "[1, 2^31)"))
      }),
    (
      FunctionIdentifier("drop_positions"),
      new ExpressionInfo(classOf[DropPositions].getName, "drop_positions"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"drop_positions expects exactly 2 arguments, got ${children.size}")
        DropPositions(children.head, children(1))
      }),
    (
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomAgg].getName, "bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"bloom_agg expects exactly 3 arguments (hash64, m_bits, k), got ${children.size}")
        // m_bits capped at 2^30 (128 MiB of filter) and REJECTED loudly
        // past it — a silent cap would build an undersized filter whose
        // false-positive rate quietly exceeds the caller's design (r12
        // review); rounded UP to a whole word so the bit array packs
        val m = intLit(children(1), "bloom_agg", "m_bits", 1, 1L << 30, "[1, 2^30]")
        val k = intLit(children(2), "bloom_agg", "k", 1, 16, "[1, 16]")
        BloomAgg(children.head, ((m + 63L) / 64L * 64L).toInt, k)
      }),
    (
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"bloom_contains expects exactly 2 arguments, got ${children.size}")
        BloomContains(children.head, children(1))
      }),
    (
      FunctionIdentifier("topk_pairs"),
      new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs"),
      (children: Seq[Expression]) => {
        require(children.size == 4,
          s"topk_pairs expects exactly 4 arguments (score, id, payload, k), got ${children.size}")
        TopKPairs(children.head, children(1), children(2),
          intLit(children(3), "topk_pairs", "k", 1, 1000000, "[1, 1e6]"))
      }),
    (
      FunctionIdentifier("freq_items"),
      new ExpressionInfo(classOf[FreqItems].getName, "freq_items"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"freq_items expects exactly 2 arguments (item, capacity), got ${children.size}")
        FreqItems(children.head,
          org.apache.spark.sql.catalyst.expressions.Literal(1L),
          intLit(children(1), "freq_items", "capacity", 1, 1 << 22, "[1, 2^22]"))
      }),
    (
      FunctionIdentifier("freq_items_w"),
      new ExpressionInfo(classOf[FreqItems].getName, "freq_items_w"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          s"freq_items_w expects exactly 3 arguments (item, weight, capacity), got ${children.size}")
        // widen smaller integral weights to BIGINT here (the natural SQL
        // spelling types a literal 2 as INT); anything non-integral is
        // left as-is for checkInputDataTypes to reject loudly
        import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
        val weight = children(1).dataType match {
          case ByteType | ShortType | IntegerType =>
            org.apache.spark.sql.catalyst.expressions.Cast(
              children(1), org.apache.spark.sql.types.LongType)
          case _ => children(1)
        }
        FreqItems(children.head, weight,
          intLit(children(2), "freq_items_w", "capacity", 1, 1 << 22, "[1, 2^22]"))
      }),
    (
      FunctionIdentifier("distinct_sketch"),
      new ExpressionInfo(classOf[DistinctSketch].getName, "distinct_sketch"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"distinct_sketch expects exactly 2 arguments (item, precision), got ${children.size}")
        DistinctSketch(children.head,
          intLit(children(1), "distinct_sketch", "precision", 4, 16, "[4, 16]"))
      }),
    (
      FunctionIdentifier("distinct_sketch_bin"),
      new ExpressionInfo(classOf[DistinctSketch].getName, "distinct_sketch_bin"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"distinct_sketch_bin expects exactly 2 arguments (item, precision), got ${children.size}")
        DistinctSketch(children.head,
          intLit(children(1), "distinct_sketch_bin", "precision", 4, 16, "[4, 16]"),
          emitBinary = true)
      }),
    (
      FunctionIdentifier("quantile_sketch_bin"),
      new ExpressionInfo(classOf[QuantileSketch].getName, "quantile_sketch_bin"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"quantile_sketch_bin expects exactly 2 arguments (x, capacity), got ${children.size}")
        QuantileSketch(children.head,
          intLit(children(1), "quantile_sketch_bin", "capacity", 1, 1 << 22, "[1, 2^22]"),
          emitBinary = true)
      }),
    (
      FunctionIdentifier("quantile_sketch"),
      new ExpressionInfo(classOf[QuantileSketch].getName, "quantile_sketch"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"quantile_sketch expects exactly 2 arguments (x, capacity), got ${children.size}")
        QuantileSketch(children.head,
          intLit(children(1), "quantile_sketch", "capacity", 1, 1 << 22, "[1, 2^22]"))
      }),
    (
      FunctionIdentifier("bottomk"),
      new ExpressionInfo(classOf[BottomK].getName, "bottomk"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"bottomk expects exactly 2 arguments (hash, k), got ${children.size}")
        BottomK(children.head,
          intLit(children(1), "bottomk", "k", 1, 1 << 20, "[1, 2^20]"))
      }),
    (
      FunctionIdentifier("bpe_tokens"),
      new ExpressionInfo(classOf[BpeTokens].getName, "bpe_tokens"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          s"bpe_tokens expects 1 or 2 arguments (text[, mergesPath]), " +
            s"got ${children.size}")
        if (children.size == 1) BpeTokens(children.head)
        else {
          // the merges source is a MODEL PATH, one table per plan — a
          // static foldable string, never a per-row column (a per-row
          // path would re-parse the artifact per value and break the
          // per-source rank cache's once-per-executor contract)
          val src = children(1)
          require(src.foldable && src.dataType == StringType,
            "bpe_tokens mergesPath must be a string literal")
          val v = src.eval()
          require(v != null, "bpe_tokens mergesPath must not be null")
          BpeTokens(children.head, v.toString)
        }
      }))

  val install: org.apache.spark.sql.SparkSessionExtensions => Unit =
    ext => descriptions.foreach(ext.injectFunction)

  /** Idempotently register into an already-built session (extensions only
    * apply at build time; `getOrCreate` ignores them on an existing
    * session). */
  def ensureRegistered(spark: SparkSession): Unit =
    descriptions.foreach { d =>
      if (!spark.catalog.functionExists(d._1.funcName))
        spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }

  /** True when every graft function is available in this session. */
  def installed(spark: SparkSession): Boolean =
    descriptions.forall(d => spark.catalog.functionExists(d._1.funcName))
}
