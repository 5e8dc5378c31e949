package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden tests for the seventh round-6 batch (time-weighted average,
  * incremental rollup maintenance).
  */
class Round6GSpec extends SparkSpec {
  import spark.implicits._

  test("time-weighted average weights by holding duration") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(sec: Long) = new java.sql.Timestamp(ts0.getTime + sec * 1000L)
    // value 10 held 1s, value 20 held 9s → TWA = (10 + 180) / 10 = 19
    val e = Seq((1L, t(0), 1L, 10d), (1L, t(1), 2L, 20d),
        (1L, t(10), 3L, 0d))
      .toDF("user_id", "ts", "event_id", "value")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val twa = e.select(col("user_id"), col("value"),
        ((unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
          / lit(1000000d)).as("dur_s"))
      .filter(col("dur_s").isNotNull)
      .groupBy("user_id")
      .agg((sum(col("value") * col("dur_s")) / sum(col("dur_s"))).as("twa"))
      .head().getDouble(1)
    assert(twa == 19d)
    // and a plain mean would be (10+20+0)/3 = 10 — different by design
  }

  test("incremental rollup: merged partials equal the direct aggregate") {
    val direct = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        graft.util.OracleSafe.dsum(col("value")).as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val merged = SparkEntry.queries("q196_incremental_rollup")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(merged == direct) // bit-exact, not approximately equal
  }
}
