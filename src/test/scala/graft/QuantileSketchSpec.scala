package graft

import org.apache.spark.sql.functions._

/** q107 has no cross-engine oracle (GK summaries are engine-specific), so
  * the estimates are pinned here against exact percentiles: with accuracy
  * a, the rank error is bounded by n/a, which at a=10000 and these group
  * sizes means the estimate must land within a small value-rank window.
  */
class QuantileSketchSpec extends SparkSpec {

  test("approx_percentile lands within the GK rank-error bound of exact percentiles") {
    val dir = "/root/testdata/sf0.01"
    val approx = graft.queries.AdvancedQueries.defs
      .find(_.name == "q107_quantile_sketch").get.fn(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val li = graft.sources.Tables.lineitem(spark, dir)
    li.select("l_returnflag", "l_extendedprice").collect()
      .groupBy(_.getString(0)).foreach { case (flag, rows) =>
        val sorted = rows.map(_.getDouble(1)).sorted
        val n = sorted.length
        val rankTol = math.max(1, n / 10000) + 1
        Seq(0.25 -> approx(flag)._1, 0.5 -> approx(flag)._2, 0.75 -> approx(flag)._3)
          .foreach { case (p, est) =>
            val target = (p * (n - 1)).toInt
            val lo = sorted(math.max(0, target - rankTol))
            val hi = sorted(math.min(n - 1, target + rankTol + 1))
            assert(est >= lo && est <= hi, s"$flag p$p: $est outside [$lo, $hi]")
          }
      }
  }
}
