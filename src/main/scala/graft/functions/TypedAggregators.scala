package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators — the `Aggregator[IN, BUF, OUT]` surface
  * (SURVEY.md §2.3 UDF/UDAF row). The reference's only custom-aggregation
  * path is "buffer dicts in module globals"; here it's a first-class,
  * partial+final-merged, codegen-integrated aggregate.
  */
object TypedAggregators {

  /** Weighted mean with exact decimal accumulation: both running sums are
    * scaled-long decimals (scale 6), so the result is order-independent and
    * bit-reproducible against a SQL oracle — the same discipline as
    * OracleSafe.dsum, but inside a custom Aggregator.
    */
  object WeightedMean extends Aggregator[(Double, Double), (Long, Long), Double] {
    private val Scale = 1000000L // decimal scale 6, as scaled longs

    private def toScaled(d: Double): Long =
      new java.math.BigDecimal(d).setScale(6, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()

    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (Double, Double)): (Long, Long) =
      (b._1 + toScaled(a._1 * a._2), b._2 + toScaled(a._2))
    override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(b: (Long, Long)): Double =
      if (b._2 == 0L) Double.NaN
      // two correctly-rounded casts then one division — the exact sequence
      // the oracle's CAST(decimal AS DOUBLE)/CAST(decimal AS DOUBLE) performs
      else (b._1.toDouble / Scale.toDouble) / (b._2.toDouble / Scale.toDouble)
    override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
