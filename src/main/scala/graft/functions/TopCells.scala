package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Nearest-centroid ranking as ONE native expression: for a float
  * vector, the `nprobe` cell ids of the unit-normalized `codebook`
  * with the highest dot products, best first.
  *
  * Result-identical to the portable per-cell-literal formulation used
  * as its oracle (TextVectorSpec):
  *
  * {{{ slice(reverse(array_sort(array(
  *       struct(dot_f32(v, c_0) AS s, 0 AS cell), ...))), 1, nprobe) }}}
  *
  * including every degenerate path: a NULL, ragged (length ≠ codebook
  * dim), or null-element vector gives every cell a NULL dot_f32 score,
  * and Spark's struct ordering (null-first ascending, then reversed)
  * resolves that uniform tie to descending cell ids; score ties break
  * to the HIGHER cell; NaN scores order greatest; -0.0 equals 0.0
  * ([[sparkCmp]] is SQLOrderingUtil.compareDoubles' exact form).
  *
  * Why an expression and not k inlined `dot_f32(v, array(...))` calls
  * (the form x_ann_ivf used through round 9): the codebook rides in
  * the plan as a REFERENCE OBJECT, not as k array literals, so
  *  - the generated code is one short loop whose SOURCE TEXT is
  *    independent of k — Janino compiles it once and the codegen
  *    cache hits on every later Lloyd iteration (the literal form
  *    recompiled per iteration because each codebook changed the
  *    source), and k=4096 cells at dim=1024 costs the same ~40 lines
  *    of generated Java as k=10 (the literal form's source grows
  *    O(k·dim) and stops whole-stage codegen well before that);
  *  - the flattened row-major codebook is scanned contiguously, vs k
  *    boxed array literals.
  * This is the standard Spark idiom for model-state-in-plan (MLlib
  * predictors ship weights the same way).
  *
  * Scale (100 TB): assignment stays a pure map over the corpus — zero
  * shuffle, zero driver round-trips beyond the k×dim codebook itself.
  */
case class TopCells(child: Expression, codebook: Array[Array[Float]], nprobe: Int)
    extends UnaryExpression {

  require(codebook.nonEmpty, "top_cells: empty codebook")
  require(codebook.forall(c => c != null && c.length == codebook(0).length),
    "top_cells: codebook rows must share one dimensionality")
  require(nprobe >= 1 && nprobe <= codebook.length,
    s"top_cells: nprobe $nprobe outside 1..${codebook.length}")

  private val cells = codebook.length
  private val dims = codebook(0).length

  /** Row-major contiguous copy — rebuilt lazily per JVM after
    * deserialization; never mutated, so sharing across tasks is safe.
    */
  @transient private lazy val flat: Array[Float] = {
    val f = new Array[Float](cells * dims)
    var i = 0
    while (i < cells) {
      System.arraycopy(codebook(i), 0, f, i * dims, dims)
      i += 1
    }
    f
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false // degenerate input labels, never nulls
  override def prettyName: String = "top_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_cells requires an array<float> argument, got ${t.catalogString}")
  }

  /** SQLOrderingUtil.compareDoubles verbatim: `==` first makes
    * -0.0 ≡ 0.0 and short-circuits equals; Double.compare then puts
    * NaN above everything (and NaN ≡ NaN).
    */
  @inline private def sparkCmp(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** Strict ranking: (s, cell) before (s2, c2) in the output order —
    * higher score first, equal scores resolve to the higher cell
    * (exactly `reverse(array_sort(...))` over (s ASC, cell ASC)).
    */
  @inline private def ranksAbove(s: Double, c: Int, s2: Double, c2: Int): Boolean = {
    val cmp = sparkCmp(s, s2)
    cmp > 0 || (cmp == 0 && c > c2)
  }

  /** The whole kernel, shared verbatim by interpreted eval and the
    * generated code (which calls it through a plan reference — the
    * method is JIT-compiled either way and allocates only the ≤nprobe
    * ranking buffers, so sharing one body beats maintaining twin
    * implementations that can drift).
    */
  def compute(a: ArrayData): ArrayData = {
    // dot_f32 nulls the score on a length mismatch or any null slot,
    // and a NULL vector nulls all k scores the same way — validity is
    // uniform across cells, so the null-score group IS the whole array
    var valid = a != null && a.numElements() == dims
    if (valid) {
      var j = 0
      while (valid && j < dims) {
        if (a.isNullAt(j)) valid = false
        j += 1
      }
    }
    val out = new Array[Int](nprobe)
    if (!valid) {
      // all-null scores: cell ASC under null-first ascending, reversed
      var i = 0
      while (i < nprobe) { out(i) = cells - 1 - i; i += 1 }
    } else {
      val bs = new Array[Double](nprobe)
      val bc = new Array[Int](nprobe)
      var m = 0
      var cell = 0
      while (cell < cells) {
        val base = cell * dims
        var acc = 0.0
        var j = 0
        while (j < dims) { // dot_f32's exact fold: double acc, left-to-right
          acc += a.getFloat(j).toDouble * flat(base + j).toDouble
          j += 1
        }
        if (m < nprobe || ranksAbove(acc, cell, bs(m - 1), bc(m - 1))) {
          var pos = if (m < nprobe) m else nprobe - 1
          while (pos > 0 && ranksAbove(acc, cell, bs(pos - 1), bc(pos - 1))) {
            bs(pos) = bs(pos - 1); bc(pos) = bc(pos - 1)
            pos -= 1
          }
          bs(pos) = acc; bc(pos) = cell
          if (m < nprobe) m += 1
        }
        cell += 1
      }
      var i = 0
      while (i < nprobe) { out(i) = bc(i); i += 1 }
    }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any =
    compute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topCells", this, classOf[TopCells].getName)
    val c = child.genCode(ctx)
    val result = ctx.freshName("topCellsResult")
    ev.copy(
      code = code"""
        ${c.code}
        ArrayData $result = $ref.compute(${c.isNull} ? null : ${c.value});
      """,
      value = JavaCode.variable(result, dataType),
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
}
