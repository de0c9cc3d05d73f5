package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's numeric extraction
  * (first match of `(\d+\.\d+|\d+)` parsed as float — ConsumerMultiThread
  * .java:121-126), with whole-stage codegen via [[doGenCode]].
  *
  * Semantically identical to
  * `regexp_extract(col, "(\\d+\\.\\d+|\\d+)", 1).try_cast("float")`
  * (the portable form used by the t2-gated queries) but in one pass:
  * no intermediate string allocation, no second regex for the cast,
  * and a pre-compiled shared pattern. The optimizer rule in
  * [[graft.GraftExtensions]] substitutes it automatically.
  */
case class ExtractNumeric(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"extract_numeric expects STRING, got ${child.dataType.sql}")

  override def dataType: DataType = FloatType
  override def nullable: Boolean = true
  override def prettyName: String = "extract_numeric"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else ExtractNumeric.extract(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val helper = ExtractNumeric.getClass.getName.stripSuffix("$")
    // fresh name: two extract_numeric calls in one codegen'd method must
    // not collide on the local holding the boxed result
    val r = ctx.freshName("extracted")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        float ${ev.value} = 0.0f;
        if (!${childGen.isNull}) {
          java.lang.Float $r = $helper.extract(${childGen.value});
          if ($r != null) {
            ${ev.isNull} = false;
            ${ev.value} = $r.floatValue();
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): ExtractNumeric =
    copy(child = newChild)
}

object ExtractNumeric {
  private val pattern = Pattern.compile("(\\d+\\.\\d+|\\d+)")

  /** Called from both interpreted eval and generated code. */
  def extract(s: UTF8String): java.lang.Float = {
    val m = pattern.matcher(s.toString)
    if (m.find()) {
      try java.lang.Float.valueOf(m.group(1))
      catch { case _: NumberFormatException => null }
    } else null
  }

  /** Register `extract_numeric(col)` on an already-running session
    * (the extensions class covers sessions created with
    * `spark.sql.extensions=graft.GraftExtensions`).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "extract_numeric", GraftFunctions.unary("extract_numeric", ExtractNumeric.apply),
      "built-in")
}

/** Runtime registration of all graft native functions on any session —
  * used by queries so they work under the driver's plain session as
  * well as extension-configured ones.
  */
object GraftFunctions {

  /** Arity-checked builders: the raw `children.head` / `children(1)`
    * forms silently DROP extra arguments (wrong results, no
    * diagnostic) or die in analysis with a bare
    * IndexOutOfBoundsException; a wrong call must fail with the
    * expected-arity message instead.
    */
  def unary(name: String, f: Expression => Expression): Seq[Expression] => Expression = {
    case Seq(a) => f(a)
    case args => throw new IllegalArgumentException(
      s"$name expects exactly 1 argument, got ${args.length}")
  }

  def binary(name: String, f: (Expression, Expression) => Expression): Seq[Expression] => Expression = {
    case Seq(a, b) => f(a, b)
    case args => throw new IllegalArgumentException(
      s"$name expects exactly 2 arguments, got ${args.length}")
  }

  def register(spark: SparkSession): Unit = {
    ExtractNumeric.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f32", binary("dot_f32", DotF32.apply),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "encoding_census", unary("encoding_census", EncodingCensus.apply),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_count", unary("bpe_count", BpeCount.apply),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_fold", unary("shingle_fold", e => ShingleFold(e, 3)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_count_simple", unary("bpe_count_simple", BpeCountSimple.apply),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_census", unary("gram_census", GramCensus.apply),
      "built-in")
  }
}
