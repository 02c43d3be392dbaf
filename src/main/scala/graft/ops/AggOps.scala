package graft.ops

import graft.core.Exact
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Exact-weighted-mean accumulator: integer fixed-point numerator so
  * the result is order-independent (see [[graft.core.Exact]]).
  */
case class WSum(num: Long, den: Long)

/** Typed UDAF (SURVEY §2.9 — the reference defines no custom
  * aggregates; this is the engine's `Aggregator[IN, BUF, OUT]`
  * extension point, exercised end-to-end):
  * weighted mean of a fixed-decimal double with LONG weights, computed
  * on exact integers and converted to double once at the end — the
  * same overflow/exactness contract as Exact.avgFixed, and therefore
  * mirrorable in ANSI SQL: see [[ExactWeightedMean.sql]].
  */
class ExactWeightedMean(scale: Int)
    extends Aggregator[(Double, Long), WSum, Double] {
  private val p = math.pow(10, scale).toLong

  override def zero: WSum = WSum(0L, 0L)

  override def reduce(b: WSum, a: (Double, Long)): WSum =
    WSum(b.num + math.round(a._1 * p) * a._2, b.den + a._2)

  override def merge(x: WSum, y: WSum): WSum =
    WSum(x.num + y.num, x.den + y.den)

  override def finish(b: WSum): Double =
    if (b.den == 0L) Double.NaN
    else b.num.toDouble / p / b.den.toDouble

  override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object ExactWeightedMean {
  /** ANSI SQL mirror with the same expression structure. */
  def sql(x: String, w: String, scale: Int): String = {
    val pOf = math.pow(10, scale).toLong
    s"""CAST(SUM(${Exact.fixedSql(x, scale)} * ($w)) AS DOUBLE)
        / $pOf / CAST(SUM($w) AS DOUBLE)"""
  }
}
