package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.TimeSeriesOps
import graft.sources.Tables
import graft.util.OracleSafe._

/** Time-series filter queries over the events table (user_id = series key,
  * ts/event_id = version order) — the FogLAMP-ecosystem computations users
  * run through the reference's script surface (SURVEY.md §2.2/§2.3),
  * Spark-native. Sequential per-key recurrences (EWMA, deadband) are
  * oracle-checked against DuckDB RECURSIVE CTEs computing the identical
  * IEEE double sequence.
  */
object TimeSeriesQueries {

  // shared oracle scaffold: per-user rows numbered in (ts, event_id) order —
  // the same total order the Scala recurrences sort each group by
  private val numberedBase =
    """base AS (
      |  SELECT user_id, event_id, value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- per-key exponential smoothing (sequential recurrence) ----
    // alpha = 0.25: the complement 0.75 is exact in binary, so Spark's
    // sequential doubles and the recursive CTE's are bit-identical.
    QueryDef("q85_ewma_smoothing",
      (s, dir) => TimeSeriesOps.ewma(Tables.events(s, dir),
          "user_id", "event_id", "ts", "value", alpha = 0.25)
        .orderBy("user_id", "event_id"),
      Some(s"""WITH RECURSIVE $numberedBase,
        |r AS (
        |  SELECT user_id, event_id, value, rn, value AS ewma FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.event_id, b.value, b.rn,
        |         CAST(0.25 AS DOUBLE) * b.value + CAST(0.75 AS DOUBLE) * r.ewma
        |  FROM base b JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1)
        |SELECT user_id, event_id, value, ewma FROM r
        |ORDER BY user_id, event_id""".stripMargin)),

    // ---- deadband (delta) compression (sequential recurrence) ----
    // emit iff |value - last EMITTED| > 200; first row per key always emits
    QueryDef("q86_deadband_compression",
      (s, dir) => TimeSeriesOps.deadband(Tables.events(s, dir),
          "user_id", "event_id", "ts", "value", tolerance = 200.0)
        .orderBy("user_id", "event_id"),
      Some(s"""WITH RECURSIVE $numberedBase,
        |r AS (
        |  SELECT user_id, event_id, value, rn, TRUE AS emitted, value AS last_emit
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.event_id, b.value, b.rn,
        |         abs(b.value - r.last_emit) > CAST(200 AS DOUBLE) AS emitted,
        |         CASE WHEN abs(b.value - r.last_emit) > CAST(200 AS DOUBLE)
        |              THEN b.value ELSE r.last_emit END AS last_emit
        |  FROM base b JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1)
        |SELECT user_id, event_id, value FROM r WHERE emitted
        |ORDER BY user_id, event_id""".stripMargin)),

    // ---- RMS + peak-to-peak hourly downsample ----
    QueryDef("q87_rms_downsample",
      (s, dir) => TimeSeriesOps.rmsDownsample(Tables.events(s, dir),
          "event_type", "ts", "value")
        .orderBy("event_type", "hour"),
      Some(s"""SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
        |  sqrt(${sqlDsum("value * value")} / COUNT(*)) AS rms,
        |  max(value) - min(value) AS peak_to_peak
        |FROM events
        |GROUP BY event_type, hour
        |ORDER BY event_type, hour""".stripMargin)),

    // ---- rate of change with counter-reset semantics ----
    QueryDef("q88_rate_of_change",
      (s, dir) => TimeSeriesOps.rateOfChange(Tables.events(s, dir),
          "user_id", "event_id", "ts", "value")
        .orderBy("user_id", "event_id"),
      Some("""SELECT user_id, event_id, ts, value,
        |  CASE WHEN dt_us > 0 AND dv >= 0
        |       THEN round(dv / (dt_us / CAST(1000000 AS DOUBLE)), 6) END AS rate_per_s
        |FROM (
        |  SELECT user_id, event_id, ts, value,
        |         value - lag(value) OVER w AS dv,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS dt_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |ORDER BY user_id, event_id""".stripMargin)),

    // ---- gap-fill to a 15-minute grid with forward fill ----
    QueryDef("q89_gapfill_forward",
      (s, dir) => TimeSeriesOps.gapFillForward(Tables.events(s, dir)
            .filter(col("event_type") === "purchase"),
          "event_type", "ts", "value")
        .withColumn("is_gap", col("is_gap").cast("int"))
        .orderBy("event_type", "slot"),
      Some("""WITH b AS (
        |  SELECT event_type, time_bucket(INTERVAL '15 minutes', ts) AS slot,
        |         round(CAST(SUM(CAST((value) AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), 6) AS v
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY event_type, slot),
        |g AS (
        |  SELECT event_type,
        |         unnest(generate_series(mn, mx, INTERVAL '15 minutes')) AS slot
        |  FROM (SELECT event_type, min(slot) AS mn, max(slot) AS mx
        |        FROM b GROUP BY event_type))
        |SELECT g.event_type, g.slot,
        |  last_value(b.v IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.slot
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
        |  CAST(b.v IS NULL AS INTEGER) AS is_gap
        |FROM g LEFT JOIN b ON g.event_type = b.event_type AND g.slot = b.slot
        |ORDER BY g.event_type, g.slot""".stripMargin)),

    // ---- OHLC hourly compaction ----
    QueryDef("q90_ohlc_hourly",
      (s, dir) => TimeSeriesOps.ohlc(Tables.events(s, dir),
          "event_type", "event_id", "ts", "value")
        .orderBy("event_type", "hour"),
      Some("""WITH w AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, value,
        |    first_value(value) OVER ohlc AS o,
        |    last_value(value)  OVER ohlc AS c
        |  FROM events
        |  WINDOW ohlc AS (PARTITION BY event_type, date_trunc('hour', ts)
        |                  ORDER BY ts, event_id
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT event_type, hour, min(o) AS open, max(value) AS high,
        |       min(value) AS low, min(c) AS close, COUNT(*) AS n
        |FROM w
        |GROUP BY event_type, hour
        |ORDER BY event_type, hour""".stripMargin)),

    // ---- gap-fill with linear interpolation ----
    QueryDef("q111_gapfill_linear",
      (s, dir) => TimeSeriesOps.gapFillLinear(Tables.events(s, dir)
            .filter(col("event_type") === "purchase"),
          "event_type", "ts", "value")
        .orderBy("event_type", "slot"),
      Some("""WITH b AS (
        |  SELECT event_type, time_bucket(INTERVAL '15 minutes', ts) AS slot,
        |         CAST(SUM(CAST((value) AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS v
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY event_type, slot),
        |g AS (
        |  SELECT event_type,
        |         unnest(generate_series(mn, mx, INTERVAL '15 minutes')) AS slot
        |  FROM (SELECT event_type, min(slot) AS mn, max(slot) AS mx
        |        FROM b GROUP BY event_type)),
        |j AS (
        |  SELECT g.event_type, g.slot, b.v,
        |    last_value(b.v IGNORE NULLS) OVER back AS pv,
        |    last_value(CASE WHEN b.v IS NOT NULL THEN epoch(g.slot) END IGNORE NULLS) OVER back AS pt,
        |    first_value(b.v IGNORE NULLS) OVER fwd AS nv,
        |    first_value(CASE WHEN b.v IS NOT NULL THEN epoch(g.slot) END IGNORE NULLS) OVER fwd AS nt
        |  FROM g LEFT JOIN b ON g.event_type = b.event_type AND g.slot = b.slot
        |  WINDOW back AS (PARTITION BY g.event_type ORDER BY g.slot
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         fwd AS (PARTITION BY g.event_type ORDER BY g.slot
        |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, slot,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |             WHEN pv IS NULL THEN nv
        |             WHEN nv IS NULL THEN pv
        |             ELSE pv + (nv - pv) * (epoch(slot) - pt) / (nt - pt)
        |        END, 6) AS value_interp,
        |  CAST(v IS NULL AS INTEGER) AS is_gap
        |FROM j
        |ORDER BY event_type, slot""".stripMargin)),

    // ---- counter increase (positive-delta reconstruction across resets) ----
    QueryDef("q112_counter_increase",
      (s, dir) => TimeSeriesOps.counterIncrease(Tables.events(s, dir),
          "user_id", "event_id", "ts", "value")
        .orderBy("user_id", "hour"),
      Some(s"""WITH d AS (
        |  SELECT user_id, ts,
        |         value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dv
        |  FROM events)
        |SELECT user_id, date_trunc('hour', ts) AS hour,
        |  ${sqlDsum("CASE WHEN dv > 0 THEN dv ELSE 0 END")} AS increase,
        |  COUNT(dv) AS n_deltas
        |FROM d
        |GROUP BY user_id, hour
        |ORDER BY user_id, hour""".stripMargin)),

    // ---- throttle: at most one reading per user per 15-minute slot ----
    QueryDef("q115_throttle_rate_limit",
      (s, dir) => TimeSeriesOps.throttleFirstPerSlot(Tables.events(s, dir),
          "user_id", "event_id", "ts", "value")
        .orderBy("user_id", "slot"),
      Some("""SELECT user_id, slot, event_id, value, n_suppressed FROM (
        |  SELECT user_id, time_bucket(INTERVAL '15 minutes', ts) AS slot,
        |    event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, time_bucket(INTERVAL '15 minutes', ts)
        |                       ORDER BY ts, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id, time_bucket(INTERVAL '15 minutes', ts)) - 1
        |      AS n_suppressed
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, slot""".stripMargin)),

    // ---- hysteresis threshold alarm (two-level state machine) ----
    // ON above 150, OFF below 20 — emits only the transitions (thresholds
    // sit in the fat part of the right-skewed value distribution)
    QueryDef("q116_hysteresis_alarm",
      (s, dir) => TimeSeriesOps.hysteresisAlarms(Tables.events(s, dir),
          "user_id", "event_id", "ts", "value", lo = 20.0, hi = 150.0)
        .withColumn("alarm", col("alarm").cast("int"))
        .orderBy("user_id", "event_id"),
      Some(s"""WITH RECURSIVE $numberedBase,
        |r AS (
        |  SELECT user_id, event_id, value, rn,
        |         value > CAST(150 AS DOUBLE) AS alarm,
        |         value > CAST(150 AS DOUBLE) AS transition
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.event_id, b.value, b.rn,
        |         CASE WHEN r.alarm THEN NOT (b.value < CAST(20 AS DOUBLE))
        |              ELSE b.value > CAST(150 AS DOUBLE) END AS alarm,
        |         (CASE WHEN r.alarm THEN NOT (b.value < CAST(20 AS DOUBLE))
        |               ELSE b.value > CAST(150 AS DOUBLE) END) <> r.alarm AS transition
        |  FROM base b JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1)
        |SELECT user_id, event_id, value, CAST(alarm AS INTEGER) AS alarm
        |FROM r WHERE transition
        |ORDER BY user_id, event_id""".stripMargin)),

    // ---- sliding-window pattern match (subsequence similarity search) ----
    // best-3 windows per key closest to a fixed "spike" motif
    QueryDef("q114_pattern_match",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val pattern = Seq(100.0, 150.0, 200.0, 250.0, 300.0, 250.0, 200.0, 150.0)
        val rk = Window.partitionBy("event_type")
          .orderBy(col("d2").asc, col("event_id").asc)
        TimeSeriesOps.patternDistance(Tables.events(s, dir),
            "event_type", "event_id", "ts", "value", pattern)
          .withColumn("rk", row_number().over(rk)).filter(col("rk") <= 3)
          .select(col("event_type"), col("rk"), col("event_id"), col("d2"))
          .orderBy("event_type", "rk")
      },
      Some {
        val terms = Seq(100, 150, 200, 250, 300, 250, 200, 150).zipWithIndex
          .map { case (p, j) => s"(l$j - CAST($p AS DOUBLE)) * (l$j - CAST($p AS DOUBLE))" }
          .mkString(" + ")
        val leads = (0 until 8)
          .map(j => s"lead(value, $j) OVER w AS l$j").mkString(", ")
        s"""WITH l AS (
          |  SELECT event_type, event_id, $leads
          |  FROM events
          |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
          |d AS (
          |  SELECT event_type, event_id, round($terms, 6) AS d2
          |  FROM l),
          |r AS (
          |  SELECT event_type, event_id, d2,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
          |                            ORDER BY d2 ASC, event_id ASC) AS INTEGER) AS rk
          |  FROM d WHERE d2 IS NOT NULL)
          |SELECT event_type, rk, event_id, d2
          |FROM r WHERE rk <= 3
          |ORDER BY event_type, rk""".stripMargin
      }),

    // ---- 8-point DFT power spectrum (FFT-filter capability) ----
    QueryDef("q119_dft_power",
      (s, dir) => TimeSeriesOps.dft8Power(Tables.events(s, dir),
          "user_id", "event_id", "ts", "value")
        .orderBy("user_id", "event_id"),
      Some {
        val sq = math.sqrt(0.5)
        def wsum(ws: Seq[Double]) = ws.zipWithIndex
          .map { case (c, j) => s"(l$j * CAST($c AS DOUBLE))" }.mkString(" + ")
        val re1 = wsum(Seq(1.0, sq, 0.0, -sq, -1.0, -sq, 0.0, sq))
        val im1 = wsum(Seq(0.0, -sq, -1.0, -sq, 0.0, sq, 1.0, sq))
        val re2 = wsum(Seq(1.0, 0.0, -1.0, 0.0, 1.0, 0.0, -1.0, 0.0))
        val im2 = wsum(Seq(0.0, -1.0, 0.0, 1.0, 0.0, -1.0, 0.0, 1.0))
        val leads = (0 until 8).map(j => s"lead(value, $j) OVER w AS l$j").mkString(", ")
        s"""WITH l AS (
          |  SELECT user_id, event_id, $leads,
          |         ROW_NUMBER() OVER w AS rn
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |p AS (
          |  SELECT user_id, event_id,
          |    round(($re1) * ($re1) + ($im1) * ($im1), 6) AS p1,
          |    round(($re2) * ($re2) + ($im2) * ($im2), 6) AS p2
          |  FROM l WHERE rn % 8 = 1)
          |SELECT user_id, event_id, p1, p2
          |FROM p
          |WHERE p1 IS NOT NULL
          |ORDER BY user_id, event_id""".stripMargin
      }),

    // ---- z-score anomaly counts from exact decimal moments ----
    QueryDef("q91_zscore_anomalies",
      (s, dir) => TimeSeriesOps.zscoreAnomalies(Tables.events(s, dir),
          "event_type", "value", zCut = 2.5)
        .orderBy("event_type"),
      Some(s"""WITH s AS (
        |  SELECT event_type, COUNT(*) AS n,
        |         ${sqlDsum("value")} AS s1, ${sqlDsum("value * value")} AS s2
        |  FROM events GROUP BY event_type),
        |st AS (
        |  SELECT event_type, n, s1 / n AS mean,
        |         sqrt((s2 - s1 * s1 / n) / (n - 1)) AS std
        |  FROM s)
        |SELECT e.event_type, min(st.n) AS n,
        |  CAST(SUM(CASE WHEN st.std > 0
        |                 AND abs(e.value - st.mean) / st.std > CAST(2.5 AS DOUBLE)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
        |  round(min(st.mean), 6) AS mean, round(min(st.std), 6) AS std
        |FROM events e JOIN st ON e.event_type = st.event_type
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin))
  )
}
