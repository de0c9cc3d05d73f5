package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** c8's document fingerprint folds as ONE native expression: tokenize
  * on single spaces, hash every K-token gram under the cross-engine
  * 60-bit md5 contract ([[CrossEngineHash]] — same digest-slice trick
  * as [[WinnowFps]], whose gram shape this shares exactly), and return
  * `array<bigint>` [min, xor-fold] over ALL gram hashes — the
  * whole-document min-hash + order-independent xor c8 computes through
  * the portable transform/md5/conv/array_min/aggregate HOF pipeline
  * (which stays as the scalatest cross-check twin; the DuckDB oracle
  * keeps mirroring it). NULL text or fewer than K tokens yields NULL,
  * matching the portable CASE's missing-shingle posture.
  *
  * Why native: the portable form allocates a concat string, an md5 hex
  * string and a conv() re-parse PER SHINGLE — the same
  * allocation-bound class WinnowFps measured at 4.6× and the dominant
  * term of c8's 212 s decade cost (BENCH_NOTES (bb)). Here each gram
  * is one `MessageDigest.update` over a byte slice of the original
  * text, and min/xor accumulate in two locals — no arrays, no strings.
  */
case class ShingleFold(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "shingle_fold: gram size must be ≥ 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_fold"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_fold requires a string argument, got ${t.catalogString}")
  }

  /** shared by interpreted eval and generated code (one body) */
  def compute(s: UTF8String): ArrayData = {
    if (s == null) return null
    val bytes = s.getBytes
    var n = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) n += 1; i += 1 }
    if (n < k) return null
    val starts = new Array[Int](n + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(n) = bytes.length + 1
    val md = WinnowFps.digest.get()
    val d = WinnowFps.digestBuf.get()
    var mn = Long.MaxValue
    var xr = 0L
    var g = 0
    val ng = n - k + 1
    while (g < ng) {
      val off = starts(g)
      val len = starts(g + k) - 1 - off
      md.update(bytes, off, len)
      md.digest(d, 0, 16)
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      val h = (v << 4) | ((d(7) & 0xffL) >>> 4)
      if (h < mn) mn = h
      xr ^= h
      g += 1
    }
    new GenericArrayData(Array(mn, xr))
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleFold", this, classOf[ShingleFold].getName)
    val c = child.genCode(ctx)
    val result = ctx.freshName("shingleResult")
    val isNull = ctx.freshName("shingleIsNull")
    ev.copy(
      code = code"""
        ${c.code}
        ArrayData $result = $ref.compute(${c.isNull} ? null : ${c.value});
        boolean $isNull = $result == null;
      """,
      value = JavaCode.variable(result, dataType),
      isNull = JavaCode.isNullVariable(isNull))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleFold =
    copy(child = newChild)
}

/** Piece count for [[graft.ops.TextQuality]]'s simpler pre-tokenizer
  * pattern `[a-z]+|[0-9]+|[^a-z0-9 ]`: lowercase and digit RUNS are one
  * piece, every other non-space CODE POINT is its own piece (no `+` on
  * the third alternative — "AB" is TWO pieces here, unlike
  * [[BpeCount]]'s run-merging pattern), spaces match nothing.
  * Result-identical to `size(regexp_extract_all(text, pat))` on valid
  * UTF-8 (equality pinned in scalatest); one byte walk, lead bytes
  * count the multi-byte code points.
  */
case class BpeCountSimple(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_count_simple"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_count_simple requires a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nb = s.numBytes()
    def at(i: Int): Int = s.getByte(i) & 0xFF
    var count = 0L
    var i = 0
    while (i < nb) {
      val v = at(i)
      if (v == ' ') i += 1
      else if (v >= 'a' && v <= 'z') {
        count += 1; i += 1
        while (i < nb && { val x = at(i); x >= 'a' && x <= 'z' }) i += 1
      } else if (v >= '0' && v <= '9') {
        count += 1; i += 1
        while (i < nb && { val x = at(i); x >= '0' && x <= '9' }) i += 1
      } else if (v < 0x80 || v >= 0xC0) { // ASCII symbol/upper, or a lead byte
        count += 1; i += 1
        while (i < nb && at(i) >= 0x80 && at(i) < 0xC0) i += 1 // skip continuations
      } else { // stray continuation byte: degrade as one piece
        count += 1; i += 1
      }
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCountSimple", this, classOf[BpeCountSimple].getName)
    nullSafeCodeGen(ctx, ev,
      s => s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($s)).longValue();")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountSimple =
    copy(child = newChild)
}
