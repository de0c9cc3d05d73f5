package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass encoding census over a string: one UTF-8 byte walk
  * returns `array<bigint>` [n_char, n_nonascii, n_ctrl, n_replacement] —
  * result-identical on valid UTF-8 to the portable four-pass form
  * (`length` + three `regexp_count`s over `[^\x00-\x7F]`,
  * `[\x00-\x08\x0B\x0C\x0E-\x1F]`, and the U+FFFD literal; equality
  * pinned in scalatest on crafted and randomized unicode), but one scan
  * instead of four and no regex machinery — the c34 hot path, the
  * WinnowFps precedent applied to the encoding gate (BENCH_NOTES (ay):
  * the character-class regexes cannot fail fast, so at 18 GB the
  * portable form pays three full sweeps).
  *
  * Byte-walk contract: an ASCII byte is one code point (C0 controls
  * counted, tab/LF/CR excluded); a lead byte (≥ 0xC0) is one non-ASCII
  * code point and skips its continuation bytes (U+FFFD's EF BF BD
  * sequence also bumps the replacement count); a stray continuation
  * byte — invalid UTF-8, which Spark's UTF8String never produces from
  * decoded parquet — degrades as one non-ASCII code point rather than
  * derailing the walk (totality).
  */
case class EncodingCensus(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "encoding_census"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"encoding_census requires a string argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nb = s.numBytes()
    var chars = 0L; var nonascii = 0L; var ctrl = 0L; var repl = 0L
    var i = 0
    while (i < nb) {
      val v = s.getByte(i) & 0xFF
      if (v < 0x80) {
        chars += 1
        if (v <= 0x08 || v == 0x0B || v == 0x0C || (v >= 0x0E && v <= 0x1F)) ctrl += 1
        i += 1
      } else if (v >= 0xC0) {
        chars += 1; nonascii += 1
        if (v == 0xEF && i + 2 < nb &&
          (s.getByte(i + 1) & 0xFF) == 0xBF && (s.getByte(i + 2) & 0xFF) == 0xBD)
          repl += 1
        i += (if (v >= 0xF0) 4 else if (v >= 0xE0) 3 else 2)
      } else { // stray continuation byte: degrade, don't derail
        chars += 1; nonascii += 1
        i += 1
      }
    }
    new GenericArrayData(Array(chars, nonascii, ctrl, repl))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val chars = ctx.freshName("chars")
      val nonascii = ctx.freshName("nonascii")
      val ctrl = ctx.freshName("ctrl")
      val repl = ctx.freshName("repl")
      s"""
        int $nb = $s.numBytes();
        long $chars = 0L, $nonascii = 0L, $ctrl = 0L, $repl = 0L;
        int $i = 0;
        while ($i < $nb) {
          int $v = $s.getByte($i) & 0xFF;
          if ($v < 0x80) {
            $chars++;
            if ($v <= 0x08 || $v == 0x0B || $v == 0x0C || ($v >= 0x0E && $v <= 0x1F)) $ctrl++;
            $i++;
          } else if ($v >= 0xC0) {
            $chars++; $nonascii++;
            if ($v == 0xEF && $i + 2 < $nb &&
                ($s.getByte($i + 1) & 0xFF) == 0xBF && ($s.getByte($i + 2) & 0xFF) == 0xBD) $repl++;
            $i += ($v >= 0xF0 ? 4 : ($v >= 0xE0 ? 3 : 2));
          } else {
            $chars++; $nonascii++;
            $i++;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          new long[]{$chars, $nonascii, $ctrl, $repl});
      """
    })

  override protected def withNewChildInternal(newChild: Expression): EncodingCensus =
    copy(child = newChild)
}
