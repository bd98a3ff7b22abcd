package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation via the Aggregator API (SURVEY.md §7.3's
  * third extension mechanism, next to the two codegen Expressions):
  * weight-averaged value with an explicit two-field buffer. Partial
  * buffers merge associatively, so Spark runs it with map-side combine
  * like any built-in aggregate.
  */
final case class WAvgBuf(var wsum: Double, var wxsum: Double)

object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
  type Buf = WAvgBuf

  override def zero: Buf = WAvgBuf(0.0, 0.0)

  override def reduce(b: Buf, a: (Double, Double)): Buf = {
    b.wsum += a._2
    b.wxsum += a._1 * a._2
    b
  }

  override def merge(x: Buf, y: Buf): Buf = {
    x.wsum += y.wsum
    x.wxsum += y.wxsum
    x
  }

  override def finish(b: Buf): Double =
    if (b.wsum == 0.0) Double.NaN else b.wxsum / b.wsum

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
