package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{TimeSeriesOps, ZOrder}

/** Golden tests for the time-series filter family on tiny hand-checked
  * series (the oracle gate covers the corpus; these pin the semantics).
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  // one series (key=1): values 10, 20, 30 at t=0,60,120; key=2 single row
  private def series = Seq(
    (1L, 1L, ts(0), 10.0), (1L, 2L, ts(60), 20.0), (1L, 3L, ts(120), 30.0),
    (2L, 4L, ts(0), 5.0)
  ).toDF("user_id", "event_id", "ts", "value")

  test("ewma seeds with the first value and applies the recurrence in ts order") {
    val out = TimeSeriesOps.ewma(series, "user_id", "event_id", "ts", "value", 0.25)
      .orderBy("user_id", "event_id").collect()
    val e2 = 0.25 * 20.0 + 0.75 * 10.0            // 12.5
    val e3 = 0.25 * 30.0 + 0.75 * e2              // 16.875
    assert(out.map(_.getDouble(3)).toSeq == Seq(10.0, e2, e3, 5.0))
  }

  test("deadband emits first row and only >tolerance moves vs last EMITTED") {
    // tol=12: 10 emits; 20 (|20-10|=10) suppressed; 30 (|30-10|=20) emits —
    // the comparison is against the last EMITTED (10), not the last row (20)
    val out = TimeSeriesOps.deadband(series, "user_id", "event_id", "ts", "value", 12.0)
      .orderBy("user_id", "event_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 4L))
  }

  test("rate of change: Δv/Δs, NULL on first row and on negative delta") {
    val df = Seq(
      (1L, 1L, ts(0), 10.0), (1L, 2L, ts(10), 15.0), (1L, 3L, ts(20), 12.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = TimeSeriesOps.rateOfChange(df, "user_id", "event_id", "ts", "value")
      .orderBy("event_id").select("rate_per_s").collect()
    assert(out(0).isNullAt(0))                     // no predecessor
    assert(out(1).getDouble(0) == 0.5)             // +5 over 10s
    assert(out(2).isNullAt(0))                     // counter reset (negative)
  }

  test("gap fill: missing 15-min slots appear forward-filled and flagged") {
    // rows in slot 0 and slot 2 (t=0 and t=1800s); slot 1 (t=900) is a gap
    val df = Seq(
      (7L, 1L, ts(0), 10.0), (7L, 2L, ts(1800), 30.0)
    ).toDF("key", "event_id", "ts", "value")
    val out = TimeSeriesOps.gapFillForward(df, "key", "ts", "value")
      .orderBy("slot").collect()
    assert(out.length == 3)
    assert(out(1).getTimestamp(1) == ts(900))
    assert(out(1).getDouble(2) == 10.0 && out(1).getBoolean(3))   // filled, gap
    assert(out(2).getDouble(2) == 30.0 && !out(2).getBoolean(3))
  }

  test("ohlc: open/close follow (ts, id) order, high/low are extremes") {
    val out = TimeSeriesOps.ohlc(series.filter($"user_id" === 1),
        "user_id", "event_id", "ts", "value")
      .select("open", "high", "low", "close", "n").collect()
    assert(out.toSeq.map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getLong(4))) == Seq((10.0, 30.0, 10.0, 30.0, 3L)))
  }

  test("throttle keeps the first reading per 15-min slot and counts suppressed") {
    val df = Seq(
      (1L, 1L, ts(0), 10.0), (1L, 2L, ts(60), 20.0),   // same slot: keep id 1
      (1L, 3L, ts(900), 30.0)                          // next slot: keep id 3
    ).toDF("user_id", "event_id", "ts", "value")
    val out = TimeSeriesOps.throttleFirstPerSlot(df, "user_id", "event_id", "ts", "value")
      .orderBy("slot").collect()
    assert(out.map(r => (r.getLong(2), r.getLong(4))).toSeq == Seq((1L, 1L), (3L, 0L)))
  }

  test("hysteresis alarm raises above hi, holds between, clears below lo") {
    // 5→60 (raise), 30 (hold: between lo and hi), 5 (clear), 70 (raise)
    val df = Seq(
      (1L, 1L, ts(0), 5.0), (1L, 2L, ts(1), 60.0), (1L, 3L, ts(2), 30.0),
      (1L, 4L, ts(3), 5.0), (1L, 5L, ts(4), 70.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = TimeSeriesOps.hysteresisAlarms(df, "user_id", "event_id", "ts", "value",
        lo = 10.0, hi = 50.0)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(1), r.getBoolean(3)))
    assert(out.toSeq == Seq((2L, true), (4L, false), (5L, true)))
  }

  test("zorder interleave16 is the Morton code; quantize16 clamps") {
    val r = spark.range(1).select(
      ZOrder.interleave16(lit(3L), lit(1L)).as("z"),   // x=0b11,y=0b1 → 0b111
      ZOrder.quantize16(lit(-5.0), 0.0, 1.0).as("lo"),
      ZOrder.quantize16(lit(99.0), 0.0, 1.0).as("hi")).head()
    assert(r.getLong(0) == 7L)
    assert(r.getLong(1) == 0L && r.getLong(2) == 65535L)
  }

  test("cusum accumulates positive drift, fires at threshold, then resets") {
    // drift = target+slack = 10; values 15,18,9,30: s = 5, 13 → fires (>12),
    // reset; 9 → s=0 (max with 0); 30 → s=20 → fires
    val df = Seq(
      (1L, 1L, ts(0), 15.0), (1L, 2L, ts(60), 18.0),
      (1L, 3L, ts(120), 9.0), (1L, 4L, ts(180), 30.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = TimeSeriesOps.cusum(df, "user_id", "event_id", "ts", "value",
        target = 8.0, slack = 2.0, threshold = 12.0)
      .orderBy("event_id").collect()
    assert(out.map(r => (r.getLong(1), r.getDouble(3))).toSeq ==
      Seq((2L, 13.0), (4L, 20.0)))
  }

  test("cusum never fires when values stay at the drift line") {
    val df = Seq((1L, 1L, ts(0), 10.0), (1L, 2L, ts(60), 10.0))
      .toDF("user_id", "event_id", "ts", "value")
    assert(TimeSeriesOps.cusum(df, "user_id", "event_id", "ts", "value",
      8.0, 2.0, 5.0).isEmpty)
  }

  test("lttb keeps endpoints and the max-triangle point per bucket") {
    // n=5, m=3 → one interior bucket (indices 2..4 1-based); centroid of
    // "next" = last point. Spike at t=120 dominates any triangle with the
    // flat first/last points, so the kept set is first, spike, last.
    val df = Seq(
      (1L, 1L, ts(0), 10.0), (1L, 2L, ts(60), 10.0), (1L, 3L, ts(120), 99.0),
      (1L, 4L, ts(180), 10.0), (1L, 5L, ts(240), 10.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = TimeSeriesOps.lttb(df, "user_id", "event_id", "ts", "value", 3)
      .orderBy("event_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 5L))
  }

  test("lttb passes short series (n <= m) through unchanged") {
    val df = Seq((1L, 1L, ts(0), 1.0), (1L, 2L, ts(60), 2.0))
      .toDF("user_id", "event_id", "ts", "value")
    assert(TimeSeriesOps.lttb(df, "user_id", "event_id", "ts", "value", 8)
      .count() == 2)
  }

  test("mad outliers: robust z flags the spike the mean-based z would dilute") {
    // q126 shape inline: median 10, MAD small → 1000 flags as outlier
    val df = Seq.tabulate(9)(i => ("a", 10.0 + (i % 3))) :+ (("a", 1000.0))
    val events = df.toDF("event_type", "value")
    val med = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val mad = events.join(med, "event_type").groupBy("event_type")
      .agg(first(col("med")).as("med"),
        expr("percentile(abs(value - med), 0.5)").as("mad"))
    val flagged = events.join(mad, "event_type")
      .filter(col("mad") > 0 &&
        abs(col("value") - col("med")) * 0.6745 / col("mad") > 3.5)
    assert(flagged.select("value").as[Double].collect().toSeq == Seq(1000.0))
  }
}
