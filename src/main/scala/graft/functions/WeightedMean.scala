package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed UDAF (the engine's Aggregator surface, complementing the
  * built-in aggregates): weighted arithmetic mean Σ(x·w)/Σw.
  *
  * Implemented as an `Aggregator` so it runs as a real partial/final
  * aggregate — map-side combine on each partition, one (sum, wsum) pair
  * per group through the shuffle — exactly the scale shape of the built-in
  * `avg`. A naive collect-and-divide or a window formulation would shuffle
  * every row.
  */
case class WPoint(x: Double, w: Double)
case class WBuf(var sum: Double, var wsum: Double)

object WeightedMean extends Aggregator[WPoint, WBuf, Double] {
  override def zero: WBuf = WBuf(0.0, 0.0)
  override def reduce(b: WBuf, p: WPoint): WBuf = {
    b.sum += p.x * p.w; b.wsum += p.w; b
  }
  override def merge(a: WBuf, b: WBuf): WBuf = {
    a.sum += b.sum; a.wsum += b.wsum; a
  }
  override def finish(b: WBuf): Double =
    if (b.wsum == 0.0) Double.NaN else b.sum / b.wsum
  override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: `weightedMean($"x", $"w")`. */
  def apply(x: Column, w: Column): Column = udaf(this).apply(x, w)
}
