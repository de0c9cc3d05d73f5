package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The duplicate-n-gram census (c29/c30's repetition signals) as ONE
  * native expression: tokenize on single spaces and return
  * `array<bigint>` [n_tok, g2, d2, g3, d3, g4, d4] — the whitespace
  * token count plus the total and DISTINCT 2-/3-/4-gram counts the portable
  * `transform(sequence…, concat_ws)` + `array_distinct` pipelines
  * compute (those stay as the scalatest cross-check twin; the DuckDB
  * oracles keep mirroring them). NULL text returns all zeros, matching
  * the null→`array()` posture of the portable tokenizer.
  *
  * Exactness: distinct is decided by comparing the grams' actual BYTES
  * — each n-gram is a contiguous slice of the original text (the
  * WinnowFps observation: single-space joins make `concat_ws(' ', …)`
  * the identity on slices) and the per-row open-addressing table
  * verifies every hash-bucket hit with a full slice compare, so the
  * result is equal-by-construction to `array_distinct` on the joined
  * strings — no collision caveat anywhere.
  *
  * Why native: the portable form materializes every gram STRING and
  * then array_distinct's pairwise machinery; this walk allocates two
  * int arrays per row and nothing per gram — the last HOF hotspot of
  * the per-row text tier (BENCH_NOTES (bc); c29/c30/c32/s11/s13 all
  * share it through the verdict projection).
  */
case class GramCensus(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false // null text maps to zeros
  override def prettyName: String = "gram_census"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_census requires a string argument, got ${t.catalogString}")
  }

  private val Zeros = Array(0L, 0L, 0L, 0L, 0L, 0L, 0L)

  /** shared by interpreted eval and generated code (one body) */
  def compute(s: UTF8String): ArrayData = {
    if (s == null) return new GenericArrayData(Zeros.clone())
    val bytes = s.getBytes
    var n = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) n += 1; i += 1 }
    val starts = new Array[Int](n + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(n) = bytes.length + 1
    val out = new Array[Long](7)
    out(0) = n.toLong
    var g = 2
    while (g <= 4) {
      val ng = n - g + 1
      if (ng > 0) {
        out(1 + (g - 2) * 2) = ng.toLong
        // open-addressing table of gram indices; power-of-two ≥ 2·ng.
        // Guarded: at ng ≥ 2^29 the Int doubling would overflow and
        // loop forever (round-14 ADVICE) — unreachable for any sane
        // document (≥ half a billion tokens in ONE row), but an
        // unguarded infinite loop is the one failure mode worse than
        // an error, so say it plainly instead.
        require(ng < (1 << 29),
          s"gram_census: document has $ng $g-grams (≥ 2^29) — not a sane single document")
        var cap = 4
        while (cap < ng * 2) cap <<= 1
        val mask = cap - 1
        val table = new Array[Int](cap)
        java.util.Arrays.fill(table, -1)
        var distinct = 0L
        var j = 0
        while (j < ng) {
          val off = starts(j)
          val len = starts(j + g) - 1 - off
          // FNV-1a over the slice — verified below, never trusted alone
          var h = 0xcbf29ce484222325L
          var b = off
          while (b < off + len) { h ^= bytes(b) & 0xffL; h *= 0x100000001b3L; b += 1 }
          var slot = (h.toInt ^ (h >>> 32).toInt) & mask
          var placed = false
          while (!placed) {
            val o = table(slot)
            if (o == -1) { table(slot) = j; distinct += 1; placed = true }
            else {
              // exact slice compare: same length then same bytes
              val oOff = starts(o)
              val oLen = starts(o + g) - 1 - oOff
              if (oLen == len) {
                var x = 0
                while (x < len && bytes(oOff + x) == bytes(off + x)) x += 1
                if (x == len) placed = true // duplicate gram
                else slot = (slot + 1) & mask
              } else slot = (slot + 1) & mask
            }
          }
          j += 1
        }
        out(2 + (g - 2) * 2) = distinct
      }
      g += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramCensus", this, classOf[GramCensus].getName)
    val c = child.genCode(ctx)
    val result = ctx.freshName("gramResult")
    ev.copy(
      code = code"""
        ${c.code}
        ArrayData $result = $ref.compute(${c.isNull} ? null : ${c.value});
      """,
      value = JavaCode.variable(result, dataType),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): GramCensus =
    copy(child = newChild)
}
