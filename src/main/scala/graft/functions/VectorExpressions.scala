package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `dot_double(a, b)` — double-precision dot product of two numeric arrays
  * as a NATIVE codegen'd Catalyst expression (the (b) tier of the
  * custom-operator ladder, like [[CanonicalHash]]).
  *
  * Why an expression and not `aggregate(zip_with(...))` or a flat
  * `reduce(_ + _)` term chain (r5 profiling on the 451k-pair LSH verify
  * stream):
  *  - the flat 64-term expression generates a method past the JVM JIT's
  *    huge-method bailout (8000 bytecodes under DontCompileHugeMethods),
  *    so it executes as interpreted BYTECODE — ~12 µs/row;
  *  - the HOF fold is a per-element interpreted `Expression.eval` walk,
  *    ~2 µs/row;
  *  - this expression is one tight `for` loop the JIT compiles to scalar
  *    fused multiply-adds, and it sits inside the whole-stage span.
  *
  * Semantics match `aggregate(zip_with(a, b, (x, y) -> double(x) *
  * double(y)), 0d, +)`: NULL input array, length mismatch (zip_with pads
  * with NULL), or any NULL element yields NULL. Double addition is
  * order-sensitive, so results are never compared across engines — callers
  * use it for pruning/blocking only (oracle-visible values go through the
  * exact decimal folds). */
case class DotDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_double"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects two array<float|double> arguments, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = xa.numElements()
    if (n != xb.numElements()) return null
    val (la, lb) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var s = 0d
    var i = 0
    while (i < n) {
      if (xa.isNullAt(i) || xb.isNullAt(i)) return null
      val va = if (la) xa.getFloat(i).toDouble else xa.getDouble(i)
      val vb = if (lb) xb.getFloat(i).toDouble else xb.getDouble(i)
      s += va * vb
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, i: String, dt: DataType): String = dt match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
      int $n = $a.numElements();
      if ($n != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          $s += ${get(a, i, elemType(left))} * ${get(b, i, elemType(right))};
        }
        if (!${ev.isNull}) { ${ev.value} = $s; }
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotDouble =
    copy(left = newLeft, right = newRight)
}
