package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Product-quantization kernel as ONE native expression: the input
  * float vector is split into M contiguous subvectors of `subDim`
  * components; subvector m is assigned the L2-nearest codeword of
  * `codebooks(m)` (tie → the LOWER codeword id, deterministic), and
  * the expression emits either
  *  - the M codeword ids (`emitCodes = true`, `array<int>`) — the
  *    8-bytes-per-vector PQ CODES an index stores (k ≤ 256 ⇒ each id
  *    fits one byte; int here is the Spark-typed carrier), or
  *  - the reconstruction x̂ (`emitCodes = false`, `array<float>`): the
  *    M chosen codewords concatenated — the decoded form an
  *    asymmetric-distance search scores against.
  *
  * Fusing assign+decode into one reference-object expression keeps
  * both the training assignment and the search-side decode a PURE MAP
  * over the corpus — the [[TopCells]] idiom: the M×k×subDim codebook
  * rides the plan as one flattened float array (model state, like
  * MLlib predictor weights), the generated source is a fixed short
  * loop independent of M and k (Janino compiles it once; codegen cache
  * hits across Lloyd iterations), and no join, shuffle, or literal
  * blow-up touches the hot path.
  *
  * Argmin is exact L2 over doubles (float subtraction then double
  * multiply — each step IEEE-exact, left-to-right accumulation), so
  * assignment is bit-deterministic across executors and reruns.
  *
  * Null/ragged semantics mirror [[DotF32]]: a NULL vector, a length ≠
  * M·subDim vector, or any null slot yields NULL (the row leaves the
  * similarity domain at the consumer's finiteNorm gate) — degrade
  * loudly, never quantize garbage.
  */
case class PqAssign(child: Expression, codebooks: Array[Array[Array[Float]]],
    emitCodes: Boolean) extends UnaryExpression {

  require(codebooks.nonEmpty, "pq_assign: no subspace codebooks")
  require(codebooks.forall(cb => cb != null && cb.length == codebooks(0).length &&
    cb.nonEmpty), "pq_assign: subspace codebooks must share one size k ≥ 1")
  require(codebooks.forall(_.forall(c => c != null &&
    c.length == codebooks(0)(0).length && c.length >= 1)),
    "pq_assign: codewords must share one subspace dimensionality ≥ 1")

  private val subspaces = codebooks.length
  private val k = codebooks(0).length
  private val subDim = codebooks(0)(0).length
  private val dims = subspaces * subDim

  /** Row-major contiguous copy, [m][code][component] flattened —
    * rebuilt lazily per JVM after deserialization; never mutated.
    */
  @transient private lazy val flat: Array[Float] = {
    val f = new Array[Float](subspaces * k * subDim)
    var m = 0
    while (m < subspaces) {
      var c = 0
      while (c < k) {
        System.arraycopy(codebooks(m)(c), 0, f, (m * k + c) * subDim, subDim)
        c += 1
      }
      m += 1
    }
    f
  }

  override def dataType: DataType =
    if (emitCodes) ArrayType(IntegerType, containsNull = false)
    else ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = if (emitCodes) "pq_codes" else "pq_reconstruct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_assign requires an array<float> argument, got ${t.catalogString}")
  }

  /** The whole kernel, shared verbatim by interpreted eval and the
    * generated code (called through a plan reference — JIT-compiled
    * either way; one body cannot drift into two).
    */
  def compute(a: ArrayData): ArrayData = {
    var valid = a != null && a.numElements() == dims
    if (valid) {
      var j = 0
      while (valid && j < dims) {
        if (a.isNullAt(j)) valid = false
        j += 1
      }
    }
    if (!valid) return null
    val codes = new Array[Int](subspaces)
    var m = 0
    while (m < subspaces) {
      val off = m * subDim
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val base = (m * k + c) * subDim
        var acc = 0.0
        var j = 0
        while (j < subDim) {
          // float subtraction is exact-in-double after widening; the
          // squared term and left-to-right sum fix the IEEE op order
          val dlt = (a.getFloat(off + j) - flat(base + j)).toDouble
          acc += dlt * dlt
          j += 1
        }
        // strict < keeps the LOWER code on ties; a NaN component makes
        // every acc NaN, all comparisons false, and code 0 wins —
        // deterministic even off the happy path
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(m) = best
      m += 1
    }
    if (emitCodes) return new GenericArrayData(codes)
    val out = new Array[Float](dims)
    m = 0
    while (m < subspaces) {
      System.arraycopy(codebooks(m)(codes(m)), 0, out, m * subDim, subDim)
      m += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAssign", this, classOf[PqAssign].getName)
    val c = child.genCode(ctx)
    val result = ctx.freshName("pqResult")
    val isNull = ctx.freshName("pqIsNull")
    ev.copy(
      code = code"""
        ${c.code}
        ArrayData $result = $ref.compute(${c.isNull} ? null : ${c.value});
        boolean $isNull = $result == null;
      """,
      value = JavaCode.variable(result, dataType),
      isNull = JavaCode.isNullVariable(isNull))
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)
}
