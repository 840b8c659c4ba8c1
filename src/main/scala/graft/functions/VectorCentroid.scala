package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY §2.C UDF/UDAF row): element-wise mean of float
  * vectors via Aggregator[IN, BUF, OUT] — partial sums merge
  * associatively, so the shuffle carries one (sum-vector, count) per
  * group regardless of group size. Used as the IVF coarse-quantizer
  * trainer in [[graft.operators.Ivf]].
  */
object VectorCentroid extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    require(acc.length == v.length,
      s"VectorCentroid: mixed dimensions in one group (${acc.length} vs ${v.length})")
    var i = 0
    while (i < v.length) { acc(i) += v(i); i += 1 }
    (acc, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      require(a._1.length == b._1.length,
        s"VectorCentroid: mixed dimensions across partitions (${a._1.length} vs ${b._1.length})")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Double], Long)): Array[Float] =
    if (r._2 == 0) Array.empty[Float]
    else r._1.map(x => (x / r._2).toFloat)

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
}
