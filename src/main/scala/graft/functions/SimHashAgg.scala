package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator computing a 60-bit SimHash signature from per-token
  * 60-bit hashes (one input row per token OCCURRENCE; summing ±1 per
  * occurrence equals the classic cnt-weighted ±cnt per distinct term,
  * so the result is bit-identical to the brute-force oracle in
  * graft.ops.Simhash).
  *
  * Why an Aggregator and not 60 `sum(CASE ...)` columns: the
  * declarative 60-aggregate form generates a whole-stage-codegen class
  * so large that Janino takes ~10 s to compile it — paid on first
  * execution AND again whenever the 100-entry codegen cache evicts it
  * (which the full bench suite does every repetition, making c6 look
  * 5× its true cost). The typed buffer keeps the generated surface
  * tiny (one opaque agg call), the per-row work is a 60-iteration
  * primitive loop, and merge is associative so partial aggregation
  * still happens map-side — the shuffle carries one 480-byte buffer
  * per (partition, doc) instead of token rows. That map-side combine
  * is exactly what makes the shape hold at 100 TB.
  */
object SimHashAgg extends Aggregator[Long, Array[Long], Long] {

  val Bits = 60

  override def zero: Array[Long] = new Array[Long](Bits)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var b = 0
    while (b < Bits) {
      buf(b) += (((h >>> b) & 1L) * 2L) - 1L // +1 if bit set, else -1
      b += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var b = 0
    while (b < Bits) { x(b) += y(b); b += 1 }
    x
  }

  /** Signature bit b is set iff the weight sum is >= 0 — the same
    * convention as the oracle's CASE WHEN w >= 0 THEN '1'.
    */
  override def finish(buf: Array[Long]): Long = {
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (buf(b) >= 0L) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
