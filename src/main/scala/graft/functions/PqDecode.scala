package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** PQ code DECODE as one native expression — the consumer half of
  * [[PqAssign]]: the input is the M stored codeword ids (the
  * `array<int>` a materialized index holds, one byte of information
  * per subspace), the output is the reconstruction x̂ — codebook
  * codewords concatenated in subspace order, exactly the array
  * `PqAssign(·, emitCodes = false)` emits for the vector the codes
  * were assigned from. That identity (decode ∘ codes ≡ reconstruct,
  * same codebook) is what lets an index CONSUMER score byte-equal to
  * the inline IVF-PQ query without ever touching the original floats —
  * pinned in scalatest.
  *
  * Same reference-object economics as PqAssign: the M×k×subDim
  * codebook rides the plan as a plan reference, the generated source
  * is fixed-size, decode is a pure map over the codes scan.
  *
  * Null/garbage posture: a NULL codes array, a length ≠ M array, any
  * null slot, or an out-of-range codeword id yields NULL (a corrupt
  * index row leaves the similarity domain at the consumer's
  * finiteNorm gate — degrade loudly, never fabricate a vector).
  */
case class PqDecode(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty, "pq_decode: no subspace codebooks")
  require(codebooks.forall(cb => cb != null && cb.length == codebooks(0).length &&
    cb.nonEmpty), "pq_decode: subspace codebooks must share one size k ≥ 1")
  require(codebooks.forall(_.forall(c => c != null &&
    c.length == codebooks(0)(0).length && c.length >= 1)),
    "pq_decode: codewords must share one subspace dimensionality ≥ 1")

  private val subspaces = codebooks.length
  private val k = codebooks(0).length
  private val subDim = codebooks(0)(0).length
  private val dims = subspaces * subDim

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_decode requires an array<int> argument, got ${t.catalogString}")
  }

  /** Shared by interpreted eval and generated code (one body, no drift). */
  def compute(a: ArrayData): ArrayData = {
    if (a == null || a.numElements() != subspaces) return null
    var m = 0
    while (m < subspaces) {
      if (a.isNullAt(m)) return null
      val c = a.getInt(m)
      if (c < 0 || c >= k) return null
      m += 1
    }
    val out = new Array[Float](dims)
    m = 0
    while (m < subspaces) {
      System.arraycopy(codebooks(m)(a.getInt(m)), 0, out, m * subDim, subDim)
      m += 1
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqDecode", this, classOf[PqDecode].getName)
    val c = child.genCode(ctx)
    val result = ctx.freshName("pqDecResult")
    val isNull = ctx.freshName("pqDecIsNull")
    ev.copy(
      code = code"""
        ${c.code}
        ArrayData $result = $ref.compute(${c.isNull} ? null : ${c.value});
        boolean $isNull = $result == null;
      """,
      value = JavaCode.variable(result, dataType),
      isNull = JavaCode.isNullVariable(isNull))
  }

  override protected def withNewChildInternal(newChild: Expression): PqDecode =
    copy(child = newChild)
}
