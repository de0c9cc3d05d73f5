package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: element-wise centroid of embedding vectors
  * (SURVEY.md §2B UDAF surface). Buffer is a mutable running sum +
  * count; merge is associative, so Spark applies it map-side first —
  * the shuffle carries one 64-double buffer per (partition, group)
  * instead of the raw vectors.
  */
object VectorCentroid extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  /** Null/empty vectors contribute nothing (so an empty buffer always
    * means count 0, which keeps merge's empty-buffer shortcut sound);
    * a DIMENSION MISMATCH fails loudly — sizing off the first vector
    * and silently zero-padding (or crashing partition-order-dependently
    * on the longer-first case) would corrupt the centroid.
    */
  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    if (v == null || v.isEmpty) return b
    val acc = if (b._1.isEmpty) Array.fill(v.length)(0.0) else b._1
    require(acc.length == v.length,
      s"VectorCentroid: mixed embedding dims in one group (${acc.length} vs ${v.length})")
    var i = 0
    while (i < v.length) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      require(x._1.length == y._1.length,
        s"VectorCentroid: mixed embedding dims across partitions (${x._1.length} vs ${y._1.length})")
      var i = 0
      while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] =
    if (b._2 == 0) Seq.empty else b._1.map(_ / b._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)

  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}

/** The one Column-level handle for [[VectorCentroid]] — both consumers
  * (x_label_centroids, IVF training) must agree on the input encoder,
  * so it is constructed exactly once here.
  */
object VectorCentroidUdaf {
  lazy val column: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(VectorCentroid, ExpressionEncoder[Seq[Float]]())
}
