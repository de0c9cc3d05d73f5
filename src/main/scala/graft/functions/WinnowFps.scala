package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The winnowing fingerprint kernel (Schleimer/Wilkerson/Aiken SIGMOD
  * 2003) as ONE native expression: tokenize on single spaces, hash
  * every K-token gram with the cross-engine 60-bit md5 contract
  * ([[CrossEngineHash]]: first 15 hex chars of md5, i.e. the digest's
  * top 60 bits), take the minimum hash of each window of W consecutive
  * grams, and emit the distinct minima in first-occurrence order —
  * exactly the portable split→transform→array_min→array_distinct
  * higher-order-function pipeline the DuckDB oracle mirrors, fused.
  *
  * Why native (the [[PqAssign]]/[[TopCells]] idiom): the portable form
  * is correct but allocation-bound — per gram it materializes a
  * concat_ws string, an md5 hex STRING, and a conv() base-16 re-parse.
  * This kernel exploits the contract's structure instead: tokens are
  * single-space-joined, so every gram's md5 INPUT is a contiguous byte
  * slice of the original text (UTF-8 guarantees 0x20 never occurs
  * inside a multi-byte sequence, so byte-scanning for spaces IS the
  * codepoint split) — one `MessageDigest.update(bytes, off, len)` per
  * gram, no string building anywhere, and the 60-bit value is read
  * straight out of the digest bytes instead of through hex text.
  *
  * Null semantics: NULL text, or fewer than K tokens (no gram exists),
  * yields NULL — the caller filters, mirroring the portable form's
  * pre-filter. Documents with fewer than W grams emit the min over all
  * their grams (the paper's short-document degenerate).
  */
case class WinnowFps(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k >= 1 && w >= 1, "winnow_fps: gram size and window must be ≥ 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires a string argument, got ${t.catalogString}")
  }

  /** The whole kernel, shared by interpreted eval and the generated
    * code (reference-object call — one body cannot drift into two).
    */
  def compute(s: UTF8String): ArrayData = {
    if (s == null) return null
    val bytes = s.getBytes
    // token start offsets: 0 and every byte after a 0x20
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
    starts(n) = bytes.length + 1 // sentinel: "space" one past the end
    val ng = n - k + 1
    val hashes = new Array[Long](ng)
    val md = WinnowFps.digest.get()
    // digest into the per-thread buffer: md.digest() would allocate a
    // fresh 16-byte array PER GRAM (round-13 ADVICE) — corpus-scale
    // garbage for a value read and discarded immediately. digest(buf)
    // also resets the engine, so no explicit reset() per gram either.
    val d = WinnowFps.digestBuf.get()
    var g = 0
    while (g < ng) {
      // gram g = tokens [g, g+k-1] single-space-joined = the original
      // byte slice [starts(g), starts(g+k) - 1)
      val off = starts(g)
      val len = starts(g + k) - 1 - off
      md.update(bytes, off, len)
      md.digest(d, 0, 16)
      // first 15 hex chars = 7 full bytes + the high nibble of byte 7
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      hashes(g) = (v << 4) | ((d(7) & 0xffL) >>> 4)
      g += 1
    }
    val nWin = math.max(ng - w + 1, 1)
    // distinct window minima in first-occurrence order (array_distinct
    // semantics, so the fused and portable forms are byte-identical)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new Array[Long](nWin)
    var m = 0
    var j = 0
    while (j < nWin) {
      var mn = hashes(j)
      var x = j + 1
      val lim = math.min(j + w, ng)
      while (x < lim) { if (hashes(x) < mn) mn = hashes(x); x += 1 }
      if (seen.add(mn)) { out(m) = mn; m += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFps", this, classOf[WinnowFps].getName)
    val c = child.genCode(ctx)
    val result = ctx.freshName("winnowResult")
    val isNull = ctx.freshName("winnowIsNull")
    ev.copy(
      code = code"""
        ${c.code}
        ArrayData $result = $ref.compute(${c.isNull} ? null : ${c.value});
        boolean $isNull = $result == null;
      """,
      value = JavaCode.variable(result, dataType),
      isNull = JavaCode.isNullVariable(isNull))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  /** MessageDigest is stateful and not thread-safe; one per task thread,
    * reset per gram — the allocation the portable form pays per gram,
    * paid once per executor thread instead.
    */
  private[functions] val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Per-thread 16-byte output buffer for `digest(buf, 0, 16)` — the
    * companion of [[digest]]; without it every gram allocates a fresh
    * digest array (see the call site).
    */
  private[functions] val digestBuf: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](16))
}
