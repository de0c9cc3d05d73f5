package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Expression, ExpressionInfo, Literal, RegExpExtract, TryEval}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.FloatType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.ExtractNumeric

/** Engine extensions, installed with
  * `--conf spark.sql.extensions=graft.GraftExtensions`:
  *
  *  1. the `extract_numeric` scalar function (native codegen'd form of
  *     the reference's A6 rewrite);
  *  2. an optimizer rule that transparently replaces the portable
  *     `try_cast(regexp_extract(x, '(\d+\.\d+|\d+)', 1) as float)`
  *     idiom with the single-pass native expression, so existing
  *     pipelines speed up without a code change.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("extract_numeric"),
      new ExpressionInfo(classOf[ExtractNumeric].getName, "extract_numeric"),
      graft.functions.GraftFunctions.unary("extract_numeric", ExtractNumeric.apply)))
    ext.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[graft.functions.DotF32].getName, "dot_f32"),
      graft.functions.GraftFunctions.binary("dot_f32", graft.functions.DotF32.apply)))
    ext.injectOptimizerRule(_ => ExtractNumericRewrite)
  }
}

/** Rewrite rule: recognize the regexp-extract-then-cast idiom and
  * substitute the fused native expression (same null semantics: no
  * match → empty string → cast null ≡ native null).
  *
  * Equivalence is gated on the Cast's OWN evalMode, not the session
  * conf: `try_cast` lowers to Cast(evalMode=TRY) (null on error — safe)
  * and a pre-ANSI cast is Cast(evalMode=LEGACY) (empty string → null —
  * safe), but Cast(evalMode=ANSI) THROWS on the no-match empty string
  * where the native expression returns null, so an ANSI cast is left
  * untouched and user-visible error behavior never changes. TryEval
  * wrapping is matched too for plans built from older-style try_eval
  * composition.
  */
object ExtractNumericRewrite extends Rule[LogicalPlan] {
  private val NumRegex = UTF8String.fromString("(\\d+\\.\\d+|\\d+)")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case TryEval(Cast(RegExpExtract(subject, Literal(NumRegex, _), Literal(1, _)), FloatType, _, _)) =>
        ExtractNumeric(subject)
      case Cast(RegExpExtract(subject, Literal(NumRegex, _), Literal(1, _)), FloatType, _, mode)
          if mode != EvalMode.ANSI =>
        ExtractNumeric(subject)
    }
}
