package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator`: element-wise mean of float vectors (the IVF
  * coarse-quantizer / centroid-training primitive).
  *
  * Scale rationale: the pure-SQL formulation explodes every vector into
  * `dim` rows before aggregating — a dim× row blowup through the shuffle.
  * This aggregator keeps one `Array[Double]` buffer per group per
  * partition, merges buffers on the reduce side, and ships dim doubles per
  * partition per group instead of dim rows per vector.
  */
final case class VecMeanBuf(sums: Array[Double], n: Long)

class VectorMean(dim: Int) extends Aggregator[Array[Float], VecMeanBuf, Array[Double]] {

  override def zero: VecMeanBuf = VecMeanBuf(new Array[Double](dim), 0L)

  override def reduce(b: VecMeanBuf, a: Array[Float]): VecMeanBuf = {
    if (a == null) return b
    require(a.length == dim, s"expected dim $dim, got ${a.length}")
    var i = 0
    while (i < dim) { b.sums(i) += a(i); i += 1 }
    VecMeanBuf(b.sums, b.n + 1)
  }

  override def merge(x: VecMeanBuf, y: VecMeanBuf): VecMeanBuf = {
    var i = 0
    while (i < dim) { x.sums(i) += y.sums(i); i += 1 }
    VecMeanBuf(x.sums, x.n + y.n)
  }

  override def finish(b: VecMeanBuf): Array[Double] =
    if (b.n == 0) null else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[VecMeanBuf] = ExpressionEncoder[VecMeanBuf]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

object VectorMean {
  /** Column form: `vecMean(64)(col("embedding"))`. */
  def apply(dim: Int): Column => Column = {
    val fn = udaf(new VectorMean(dim), ExpressionEncoder[Array[Float]]())
    c => fn(c)
  }
}
