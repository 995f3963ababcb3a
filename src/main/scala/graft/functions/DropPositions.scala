package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** `drop_positions(tokens, positions)` — the token array with the given
  * 1-BASED positions removed, as a native codegen'd expression.
  *
  * `positions` MUST be sorted ascending (the callers build it with
  * `array_sort`; duplicates are harmless). The walk is a two-pointer
  * merge — O(tokens + positions) — where the HOF form it replaced
  * (`filter(toks, (t, i) => !array_contains(cov, i + 1))`) re-scans the
  * position array per element: O(tokens × positions), quadratic on a
  * long document that is mostly duplicated — exactly the worst case a
  * span-level dedup pass hits on boilerplate-heavy corpora. At bench
  * scale both shapes measure alike; the complexity class is the 100 TB
  * argument.
  *
  * NULL on either side → NULL (callers coalesce the no-dup case to an
  * empty position array). Kept elements pass through verbatim, so the
  * output's containsNull mirrors the input's — declaring `false`
  * unconditionally would let downstream codegen skip null checks on a
  * null element this walk faithfully preserved. */
case class DropPositions(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = left.dataType match {
    case ArrayType(_, cn) => ArrayType(StringType, containsNull = cn)
    case _ => ArrayType(StringType, containsNull = true)
  }
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "drop_positions"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<string>, array<int>), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(toks: Any, pos: Any): Any =
    DropPositionsFns.compute(
      toks.asInstanceOf[ArrayData], pos.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) => s"""
      ${ev.value} = graft.functions.DropPositionsFns.compute($t, $p);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DropPositions =
    copy(left = newLeft, right = newRight)
}

/** Static target for both evaluation paths. */
object DropPositionsFns {
  def compute(toks: ArrayData, pos: ArrayData): ArrayData = {
    val n = toks.numElements()
    val m = pos.numElements()
    val out = new Array[Any](n)
    var i = 0  // 0-based token index
    var j = 0  // pointer into the sorted 1-based drop positions
    var k = 0  // kept count
    while (i < n) {
      // advance past positions before i+1 (handles duplicates/out-of-range;
      // a null position slot matches nothing)
      while (j < m && (pos.isNullAt(j) || pos.getInt(j) < i + 1)) j += 1
      if (j < m && pos.getInt(j) == i + 1) { i += 1 } // dropped
      else {
        out(k) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
        k += 1; i += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], k))
  }
}
