package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native piece COUNT for the BPE-ish pre-tokenizer pattern
  * `'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^ 'a-z0-9]+` ([[graft.ops.TextOps.BpePattern]]):
  * one UTF-8 byte walk replicating the regex engine's leftmost-first,
  * greedy alternation — result-identical to
  * `size(regexp_extract_all(text, BpePattern))` (equality pinned in
  * scalatest on the crafted piece-generator corpus and randomized
  * strings; the DuckDB oracles keep mirroring the regex form), but one
  * branchy loop instead of a backtracking matcher. This is c28's
  * sizing hot path — the regex count was the measured floor both c26
  * and c28 shared at the decade scale (BENCH_NOTES (at): the piece
  * count alone was ~97 s of c28's x1000 time).
  *
  * Walk contract (mirrors the alternation order at each scan position,
  * bumping one byte on no-match exactly like the engine bumps one
  * position): an apostrophe followed by a lowercase run is one piece
  * (`'s`); an optional single leading space fuses into a following
  * lowercase run, digit run, or other-class run; lowercase and digit
  * runs are maximal; everything outside ` 'a-z0-9` — uppercase,
  * punctuation, and EVERY non-ASCII byte (continuation bytes included,
  * so a multi-byte run counts once, exactly like the codepoint class) —
  * merges into maximal other-class runs; unmatched bytes (lone
  * apostrophes, stranded spaces) are skipped uncounted.
  */
case class BpeCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bpe_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_count requires a string argument, got ${t.catalogString}")
  }

  @inline private def isLower(v: Int): Boolean = v >= 'a' && v <= 'z'
  @inline private def isDigit(v: Int): Boolean = v >= '0' && v <= '9'
  @inline private def isOther(v: Int): Boolean =
    v != ' ' && v != '\'' && !isLower(v) && !isDigit(v)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nb = s.numBytes()
    def at(i: Int): Int = s.getByte(i) & 0xFF
    var count = 0L
    var i = 0
    while (i < nb) {
      val v = at(i)
      if (v == '\'') {
        if (i + 1 < nb && isLower(at(i + 1))) {
          count += 1; i += 2
          while (i < nb && isLower(at(i))) i += 1
        } else i += 1
      } else if (v == ' ') {
        if (i + 1 < nb) {
          val c = at(i + 1)
          if (isLower(c)) {
            count += 1; i += 2
            while (i < nb && isLower(at(i))) i += 1
          } else if (isDigit(c)) {
            count += 1; i += 2
            while (i < nb && isDigit(at(i))) i += 1
          } else if (isOther(c)) {
            count += 1; i += 2
            while (i < nb && isOther(at(i))) i += 1
          } else i += 1 // double space or space-apostrophe: bump one
        } else i += 1 // trailing space
      } else if (isLower(v)) {
        count += 1; i += 1
        while (i < nb && isLower(at(i))) i += 1
      } else if (isDigit(v)) {
        count += 1; i += 1
        while (i < nb && isDigit(at(i))) i += 1
      } else { // other-class run (uppercase, punctuation, all non-ASCII bytes)
        count += 1; i += 1
        while (i < nb && isOther(at(i))) i += 1
      }
    }
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val c = ctx.freshName("c")
      val count = ctx.freshName("count")
      // the class predicates, inlined as macros over an int byte
      def lower(x: String) = s"($x >= 'a' && $x <= 'z')"
      def digit(x: String) = s"($x >= '0' && $x <= '9')"
      def other(x: String) =
        s"($x != ' ' && $x != '\\'' && !${lower(x)} && !${digit(x)})"
      s"""
        int $nb = $s.numBytes();
        long $count = 0L;
        int $i = 0;
        while ($i < $nb) {
          int $v = $s.getByte($i) & 0xFF;
          if ($v == '\\'') {
            if ($i + 1 < $nb) {
              int $c = $s.getByte($i + 1) & 0xFF;
              if (${lower(c)}) {
                $count++; $i += 2;
                while ($i < $nb && ${lower(s"($s.getByte($i) & 0xFF)")}) $i++;
              } else $i++;
            } else $i++;
          } else if ($v == ' ') {
            if ($i + 1 < $nb) {
              int $c = $s.getByte($i + 1) & 0xFF;
              if (${lower(c)}) {
                $count++; $i += 2;
                while ($i < $nb && ${lower(s"($s.getByte($i) & 0xFF)")}) $i++;
              } else if (${digit(c)}) {
                $count++; $i += 2;
                while ($i < $nb && ${digit(s"($s.getByte($i) & 0xFF)")}) $i++;
              } else if (${other(c)}) {
                $count++; $i += 2;
                while ($i < $nb && ${other(s"($s.getByte($i) & 0xFF)")}) $i++;
              } else $i++;
            } else $i++;
          } else if (${lower(v)}) {
            $count++; $i++;
            while ($i < $nb && ${lower(s"($s.getByte($i) & 0xFF)")}) $i++;
          } else if (${digit(v)}) {
            $count++; $i++;
            while ($i < $nb && ${digit(s"($s.getByte($i) & 0xFF)")}) $i++;
          } else {
            $count++; $i++;
            while ($i < $nb && ${other(s"($s.getByte($i) & 0xFF)")}) $i++;
          }
        }
        ${ev.value} = $count;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}
