package graft

import org.apache.spark.sql.functions._

/** Golden tests for the sixth round-6 batch (SLA percentiles, correlation
  * matrix, LTV curve).
  */
class Round6FSpec extends SparkSpec {
  import spark.implicits._

  test("SLA percentiles interpolate exactly on 1..100") {
    val df = (1 to 100).map(_.toDouble).toDF("value")
    val r = df.agg(
      expr("percentile(value, array(0.50, 0.90, 0.99))").as("ps"))
      .select(element_at(col("ps"), 1), element_at(col("ps"), 2),
        element_at(col("ps"), 3)).head()
    assert(r.getDouble(0) == 50.5)
    assert(math.abs(r.getDouble(1) - 90.1) < 1e-9)
    assert(math.abs(r.getDouble(2) - 99.01) < 1e-9)
  }

  test("correlation matrix recovers planted ±1 correlations") {
    val df = (1 to 50).map(i => (i.toDouble, 2.0 * i, -3.0 * i))
      .toDF("x", "y", "z")
    val m = df.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
      sum(col("x") * col("x")).as("qx"), sum(col("y") * col("y")).as("qy"),
      sum(col("z") * col("z")).as("qz"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("z")).as("sxz"))
    def corr(n: Double, sxy: Double, sx: Double, sy: Double,
             qx: Double, qy: Double) =
      (n * sxy - sx * sy) /
        (math.sqrt(n * qx - sx * sx) * math.sqrt(n * qy - sy * sy))
    val r = m.head()
    val n = r.getLong(0).toDouble
    val cxy = corr(n, r.getDouble(7), r.getDouble(1), r.getDouble(2),
      r.getDouble(4), r.getDouble(5))
    val cxz = corr(n, r.getDouble(8), r.getDouble(1), r.getDouble(3),
      r.getDouble(4), r.getDouble(6))
    assert(math.abs(cxy - 1.0) < 1e-12 && math.abs(cxz + 1.0) < 1e-12)
    // and the registered query's values are all in [-1, 1]
    val row = SparkEntry.queries("q193_corr_matrix")(
      spark, "/root/testdata/sf0.001").head()
    (0 until row.length).foreach { i =>
      assert(math.abs(row.getDouble(i)) <= 1.0)
    }
  }

  test("LTV curve accumulates weekly revenue and normalizes by cohort") {
    val rows = SparkEntry.queries("q194_ltv_curve")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // cum_ltv is non-decreasing along each cohort's weeks
    rows.groupBy(_.getTimestamp(0)).values.foreach { cohort =>
      val curve = cohort.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a })
    }
    // buyers never exceed the cohort size
    assert(rows.forall(r => r.getLong(2) <= r.getLong(3)))
  }
}
