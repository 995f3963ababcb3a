package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `token_grams(tokens, W)` — all W-token shingles of a token array as
  * space-joined strings, as a NATIVE codegen'd Catalyst expression (the
  * (b)-tier rung beside [[IntersectCountSorted]]).
  *
  * Why not `transform(sequence(1, n-W+1), i -> concat_ws(' ',
  * element_at(toks, i), ...))`: higher-order functions evaluate
  * INTERPRETED — per gram that is one lambda-variable rebind plus W
  * interpreted `element_at` dispatches, and the shingle stream evaluates
  * it over every token of the corpus. Building q_substr_dedup's 6-gram
  * stream at sf0.1 (246k grams) cost ~4.3 s through the HOF path vs
  * ~0.6 s through this one compiled loop (r11 A/B, forced-materialization
  * probe); the semantics are identical, so the DuckDB oracle
  * (`array_to_string(t[i:i+W-1], ' ')`) is unchanged.
  *
  * Returns an empty array when the input has fewer than W tokens (callers
  * filter those rows on both engines); NULL input → NULL. Token elements
  * must be non-null (`split()` output always is). W is required to be a
  * foldable positive integer at plan time. */
case class TokenGrams(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "token_grams"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if w >= 1 => TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName width must be >= 1, got $w")
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TokenGramsFns.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.TokenGramsFns.compute($c, $w);
    """)

  override protected def withNewChildInternal(newChild: Expression): TokenGrams =
    copy(child = newChild)
}

/** Static target for both evaluation paths (object methods get static
  * forwarders, so generated Java calls this directly). */
object TokenGramsFns {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    // one pass to pull the UTF8String tokens; each gram is one concatWs
    // over a reused window buffer — no per-gram lambda dispatch
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](n - w + 1)
    val win = new Array[UTF8String](w)
    var p = 0
    while (p <= n - w) {
      var j = 0
      while (j < w) { win(j) = toks(p + j); j += 1 }
      out(p) = UTF8String.concatWs(Space, win: _*)
      p += 1
    }
    new GenericArrayData(out)
  }
}
