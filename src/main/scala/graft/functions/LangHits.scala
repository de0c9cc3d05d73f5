package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** c23's marker counting as ONE native expression: tokenize on single
  * spaces and return `array<bigint>` [n_tok, hits(profile 1), …] — one
  * entry per marker set, in the caller-supplied profile order. This is
  * the per-token work of the language classifier fused into a byte
  * walk; the e6 scoring, argmax, and tie-break stay in the projection
  * (five-column integer arithmetic, already cheap). Exactness: a token
  * equals a marker iff their bytes are equal — the kernel compares the
  * token's byte slice against each marker (length gate + first-byte
  * gate, then memcmp), so the hit counts equal the portable
  * `filter(tk, x -> x IN (markers))` sizes by construction. NULL text
  * returns all zeros, matching the null→`array()` tokenizer posture.
  */
case class LangHits(child: Expression, profiles: Seq[Seq[String]]) extends UnaryExpression {

  require(profiles.nonEmpty, "lang_hits: at least one marker set")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "lang_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_hits requires a string argument, got ${t.catalogString}")
  }

  // markers as UTF-8 byte arrays, tagged with their profile index
  @transient private lazy val markerBytes: Array[(Array[Byte], Int)] =
    profiles.zipWithIndex.flatMap { case (ms, p) =>
      ms.map(m => m.getBytes(java.nio.charset.StandardCharsets.UTF_8) -> p)
    }.toArray

  /** shared by interpreted eval and generated code (one body) */
  def compute(s: UTF8String): ArrayData = {
    val out = new Array[Long](profiles.size + 1)
    if (s == null) return new GenericArrayData(out)
    val bytes = s.getBytes
    val mks = markerBytes
    var nTok = 0L
    var tokStart = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        nTok += 1
        val len = i - tokStart
        var m = 0
        while (m < mks.length) {
          val mk = mks(m)._1
          if (mk.length == len) {
            var x = 0
            while (x < len && mk(x) == bytes(tokStart + x)) x += 1
            if (x == len) out(1 + mks(m)._2) += 1
          }
          m += 1
        }
        tokStart = i + 1
      }
      i += 1
    }
    out(0) = nTok
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langHits", this, classOf[LangHits].getName)
    val c = child.genCode(ctx)
    val result = ctx.freshName("langHitsResult")
    ev.copy(
      code = code"""
        ${c.code}
        ArrayData $result = $ref.compute(${c.isNull} ? null : ${c.value});
      """,
      value = JavaCode.variable(result, dataType),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangHits =
    copy(child = newChild)
}
