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

  case class LineRank(price: Double, okey: Long, lnum: Int)

  /** Bounded top-k per group as a typed Aggregator: the buffer never holds
    * more than k rows, partials merge as sorted-list merges — the constant-
    * memory formulation of "top-k per key" for groups too large to
    * collect_list and too numerous for a global sort. Ordering matches q08:
    * price DESC, then okey ASC, lnum ASC.
    */
  class TopKLines(k: Int) extends Aggregator[LineRank, Seq[LineRank], Seq[LineRank]] {
    private val ord: Ordering[LineRank] =
      Ordering.by((r: LineRank) => (-r.price, r.okey, r.lnum))

    override def zero: Seq[LineRank] = Vector.empty
    override def reduce(b: Seq[LineRank], a: LineRank): Seq[LineRank] =
      if (b.size == k && ord.lteq(b.last, a)) b // below the cut: O(1) reject
      else ((b :+ a).sorted(ord)).take(k)
    override def merge(b1: Seq[LineRank], b2: Seq[LineRank]): Seq[LineRank] =
      (b1 ++ b2).sorted(ord).take(k)
    override def finish(b: Seq[LineRank]): Seq[LineRank] = b
    override def bufferEncoder: Encoder[Seq[LineRank]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[LineRank]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
