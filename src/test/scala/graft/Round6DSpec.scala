package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden tests for the fourth round-6 batch (idempotent sink, last-touch
  * attribution, PSI drift).
  */
class Round6DSpec extends SparkSpec {
  import spark.implicits._

  test("idempotent sink: double delivery does not double the data") {
    val out = graft.streaming.Streams.idempotentParquetSink(spark,
      "/root/testdata/sf0.001",
      s"${sys.props("java.io.tmpdir")}/graft_q187_spec")
    val expected = graft.sources.Tables
      .events(spark, "/root/testdata/sf0.001").count()
    assert(out.count() == expected) // ran twice; an append sink would 2×
  }

  test("last-touch attribution credits the preceding channel within 1h") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(min: Long) = new java.sql.Timestamp(ts0.getTime + min * 60000L)
    val e = Seq(
      (1L, t(0), 1L, "view", 0d),      // touch
      (1L, t(30), 2L, "purchase", 10d), // within 1h of view → credited
      (1L, t(200), 3L, "purchase", 5d), // >1h since view → dropped
      (2L, t(0), 4L, "purchase", 7d)    // no preceding touch → dropped
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = e.select(col("user_id"), col("ts"), col("event_type"),
        col("value"),
        last(when(col("event_type") =!= "purchase", col("ts")),
          ignoreNulls = true).over(w).as("lt_ts"),
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w).as("lt_type"))
      .filter(col("event_type") === "purchase" && col("lt_ts").isNotNull
        && unix_micros(col("ts")) - unix_micros(col("lt_ts"))
          <= 3600000000L)
      .collect()
    assert(out.length == 1)
    assert(out.head.getString(5) == "view" && out.head.getDouble(3) == 10d)
  }

  test("PSI is near zero for identical windows, large for a planted shift") {
    def psi(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.length
      val sortedA = a.sorted
      val edges = (1 to 9).map(i => sortedA(i * n / 10 - 1))
      def binCounts(xs: Seq[Double]) =
        xs.groupBy(v => edges.count(v > _)).view.mapValues(_.size).toMap
      val (ca, cb) = (binCounts(a), binCounts(b))
      val (na, nb) = (a.length, b.length)
      (0 to 9).map { bin =>
        val pa = (ca.getOrElse(bin, 0) + 0.5) / (na + 5)
        val pb = (cb.getOrElse(bin, 0) + 0.5) / (nb + 5)
        (pa - pb) * math.log(pa / pb)
      }.sum
    }
    val base = (1 to 1000).map(_.toDouble)
    assert(math.abs(psi(base, base)) < 1e-12)
    assert(psi(base, base.map(_ + 500)) > 0.5) // strong drift
    // and the registered query's contributions sum to a small PSI on the
    // (stationary) synthetic corpus
    val rows = SparkEntry.queries("q189_psi_drift")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 10)
    val total = rows.map(_.getDouble(3)).sum
    assert(total >= 0 && total < 0.25)
  }
}
