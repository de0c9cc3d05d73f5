package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two float arrays, accumulated in double,
  * left-to-right — result-identical to the portable
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`
  * fold (float×float products are exact in double), but ~100× faster:
  * the interpreted higher-order path costs ~3 µs per element versus a
  * JIT-compiled loop here. This is the hot kernel of c3/c7 pair scans.
  *
  * Null/ragged semantics MATCH the portable form too: zip_with pads a
  * shorter array with nulls and a null product nulls the whole sum, so
  * mismatched lengths or a null element yield NULL — not a silently
  * truncated partial dot (this expression is registered session-wide,
  * so arbitrary caller data must degrade loudly, not wrongly). The
  * equal-length non-null hot path is unchanged: one bit-test per slot.
  */
case class DotF32(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f32"

  /** Strict array<float> only: getFloat over e.g. an array<double>'s
    * 8-byte slots would stride wrong and return silently garbage
    * values — reject at analysis, don't read.
    */
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_f32 requires two array<float> arguments, got ${l.catalogString} and ${r.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultCode = nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
        int $n = $a.numElements();
        if ($b.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })
    resultCode
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)
}
