package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, LongType}

/** Count-min sketch over BIGINT key hashes: `depth` rows of `width`
  * counters; add increments one counter per row, estimate takes the
  * min — an OVERESTIMATE, never an under, which is the property the
  * heavy-hitter pruning in ops.TextOps.c19 relies on (no false
  * negatives; the exact re-count absorbs false positives, exactly
  * b27's sketch-then-verify contract).
  *
  * Shares [[Bloom]]'s double-hashing streams so one mix implementation
  * serves both sketches; row r probes counter (h1 + r·h2) mod width of
  * its own row.
  */
object CountMin {
  val Depth = 4
  val Width = 8192

  @inline private def slot(a: Long, b: Long, r: Int, width: Int): Int =
    r * width + java.lang.Long.remainderUnsigned(a + r * b, width).toInt

  def add(counts: Array[Long], width: Int, depth: Int, h: Long): Unit = {
    val a = Bloom.h1(h); val b = Bloom.h2(h)
    var r = 0
    while (r < depth) { counts(slot(a, b, r, width)) += 1; r += 1 }
  }

  def estimate(counts: Array[Long], width: Int, depth: Int, h: Long): Long = {
    val a = Bloom.h1(h); val b = Bloom.h2(h)
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counts(slot(a, b, r, width))
      if (c < min) min = c
      r += 1
    }
    min
  }
}

/** Distributed count-min build: per-partition sketches merged by
  * element-wise ADD (associative + commutative ⇒ map-side combine; the
  * shuffle moves one depth×width buffer per partition, never the
  * keys). Same shape as [[BloomBuildAgg]] with OR swapped for ADD.
  */
class CmsBuildAgg(width: Int, depth: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(width >= 1 && depth >= 1)

  override def zero: Array[Long] = new Array[Long](width * depth)

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    CountMin.add(b, width, depth, h); b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Scan-side frequency estimate of a BIGINT hash against a collected
  * sketch (plan reference object, codegen'd — the TopCells pattern).
  * NULL hashes estimate 0 (a null token can't be a heavy hitter; it
  * never entered the sketch).
  */
case class CmsEstimate(child: Expression, counts: Array[Long], width: Int, depth: Int)
    extends UnaryExpression {
  require(counts.length == width * depth)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate requires a bigint argument, got ${t.catalogString}")
  }

  def est(h: Long): Long = CountMin.estimate(counts, width, depth, h)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else est(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimate", this, classOf[CmsEstimate].getName)
    val c = child.genCode(ctx)
    val result = ctx.freshName("cmsResult")
    ev.copy(
      code = code"""
        ${c.code}
        long $result = ${c.isNull} ? 0L : $ref.est(${c.value});
      """,
      value = JavaCode.variable(result, dataType),
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}
