package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter sketch over BIGINT keys: the build/probe pair behind
  * semi-join scan pruning (ops.BloomJoin). One object owns the probe
  * math so the distributed build ([[BloomBuildAgg]]) and the scan-side
  * membership test ([[BloomMightContain]]) can never disagree on bit
  * positions.
  *
  * Probing is classic double hashing: two independent 64-bit mixes of
  * the key, probe i lands on bit (h1 + i·h2) mod m. The mixes are
  * splitmix64 finalizers — full-avalanche, cheap, and dependency-free.
  */
object Bloom {

  /** splitmix64 finalizer (public-domain constant set; the same mix
    * java.util.SplittableRandom applies).
    */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline def h1(key: Long): Long = mix64(key)
  /** Second stream: decorrelate by offsetting with the golden-gamma
    * increment before mixing; force odd so it is a unit mod 2^64 and
    * probes never collapse onto one bit.
    */
  @inline def h2(key: Long): Long = mix64(key + 0x9e3779b97f4a7c15L) | 1L

  /** Set key's k probe bits in `words` (mutates; build side). */
  def set(words: Array[Long], k: Int, key: Long): Unit = {
    val m = words.length.toLong * 64
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(a + i * b, m)
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  /** All k probe bits of key set in `words`? (probe side) */
  def contains(words: Array[Long], k: Int, key: Long): Boolean = {
    val m = words.length.toLong * 64
    val a = h1(key); val b = h2(key)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(a + i * b, m)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Standard sizing: ~12 bits/key ⇒ fpp ≈ 0.3% at k=8 probes. */
  val BitsPerKey = 12
  val NumHashes = 8

  /** Word count for n expected keys (≥16 words so degenerate inputs
    * still build a usable — if saturated — sketch).
    */
  def wordsFor(n: Long): Int =
    math.max(16L, (n * BitsPerKey + 63) / 64).toInt
}

/** Distributed Bloom build as a typed Aggregator: per-partition bitsets
  * OR-merged — associative and commutative, so Spark combines map-side
  * and the shuffle moves one `words`-long buffer per partition, never
  * the keys. The finished Array[Long] is the sketch; the caller ships
  * it back into the plan as [[BloomMightContain]]'s reference object
  * (the TopCells codebook pattern).
  */
class BloomBuildAgg(words: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(words >= 1 && k >= 1)

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(b: Array[Long], key: Long): Array[Long] = {
    Bloom.set(b, k, key); b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Scan-side membership probe: true iff every probe bit of the BIGINT
  * child is set in `bits`. NULL keys return false — a null key cannot
  * survive the equi-join this filter fronts, so pruning it is exact.
  *
  * The bitset rides as a plan REFERENCE OBJECT: generated source is a
  * fixed two-line call independent of sketch size (Janino's cache hits
  * across plans; a literal array would re-compile per sketch), and the
  * expression stays inside whole-stage codegen.
  */
case class BloomMightContain(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression {
  require(bits.nonEmpty && k >= 1)

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint argument, got ${t.catalogString}")
  }

  def contains(key: Long): Boolean = Bloom.contains(bits, k, key)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && contains(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomCheck", this, classOf[BloomMightContain].getName)
    val c = child.genCode(ctx)
    val result = ctx.freshName("bloomResult")
    ev.copy(
      code = code"""
        ${c.code}
        boolean $result = !${c.isNull} && $ref.contains(${c.value});
      """,
      value = JavaCode.variable(result, dataType),
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
