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

  /** Shared machinery for the lagged-Pearson queries (q121 ACF, q140 CCF):
    * for each lag label, the six masked component aggregates
    * (n/Σx/Σy/Σx²/Σy²/Σxy over rows where BOTH x and y are non-null — one
    * pair set for every component) and the guarded correlation struct
    * `(lag, n, r)`. One aggregate pass computes all lags; the struct
    * formula casts components to double uniformly, so callers pick the
    * accumulator (decimal [[dsum]] for double inputs, plain `sum` for
    * exact integer inputs) without changing the formula.
    */
  private def pearsonLagMachinery(labels: Range,
      x: Int => org.apache.spark.sql.Column,
      y: Int => org.apache.spark.sql.Column,
      sumF: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      outName: String,
      idx: Int => String = _.toString)
    : (Seq[org.apache.spark.sql.Column], Seq[org.apache.spark.sql.Column]) = {
    val aggCols = labels.toSeq.flatMap { k =>
      val i = idx(k)
      val (xc, yc) = (x(k), y(k))
      val m = (e: org.apache.spark.sql.Column) =>
        when(xc.isNotNull && yc.isNotNull, e)
      Seq(count(m(lit(1))).as(s"n$i"),
        sumF(m(xc)).as(s"sx$i"), sumF(m(yc)).as(s"sy$i"),
        sumF(m(xc * xc)).as(s"sxx$i"), sumF(m(yc * yc)).as(s"syy$i"),
        sumF(m(xc * yc)).as(s"sxy$i"))
    }
    val structs = labels.toSeq.map { k =>
      val i = idx(k)
      val n = col(s"n$i").cast("double")
      val (sx, sy, sxx, syy, sxy) =
        (col(s"sx$i").cast("double"), col(s"sy$i").cast("double"),
         col(s"sxx$i").cast("double"), col(s"syy$i").cast("double"),
         col(s"sxy$i").cast("double"))
      struct(lit(k).as("lag"), col(s"n$i").as("n"),
        round(when(col(s"n$i") > 1
            && (sxx - sx * sx / n) > 0 && (syy - sy * sy / n) > 0,
          (sxy - sx * sy / n)
            / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))), 6)
          .as(outName))
    }
    (aggCols, structs)
  }

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
    // best-3 windows per key closest to a fixed "spike" motif. The ranking
    // is a bounded top-k AGGREGATE (k best (d2, id) pairs per key, O(k)
    // partials, map-side merge), not a row_number window: partitionBy on a
    // ~5-value key would sort every scored row through 5 tasks at any
    // cluster size. (The lead-window inside patternDistance still keys on
    // event_type — its ceiling is documented there; the q102 bucket-stitch
    // generalizes to forward frames when a corpus needs it.)
    QueryDef("q114_pattern_match",
      (s, dir) => {
        val pattern = Seq(100.0, 150.0, 200.0, 250.0, 300.0, 250.0, 200.0, 150.0)
        TimeSeriesOps.patternDistance(Tables.events(s, dir),
            "event_type", "event_id", "ts", "value", pattern)
          .groupBy("event_type")
          // top-k orders (cos DESC, nid ASC); negate d2 for (d2 ASC, id ASC)
          .agg(graft.functions.TopKNeighborsAgg
            .topkNeighbors(-col("d2"), col("event_id"), 3).as("top"))
          .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "nb")))
          .select(col("event_type"), (col("pos") + 1).cast("int").as("rk"),
            col("nb.nid").as("event_id"), (-col("nb.cos")).as("d2"))
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
        |ORDER BY e.event_type""".stripMargin)),

    // ---- MAD-based robust outlier detection ----
    // median / median-absolute-deviation replace mean/std (q91): immune to
    // the very outliers being flagged. Two exact-percentile aggregates
    // (median, then median of |x − med|) + a broadcast join of the tiny
    // per-type stats; the modified z-score uses the standard 0.6745
    // consistency constant. Exact interpolated medians match DuckDB's
    // quantile_cont on both engines (same lower + (upper−lower)·frac).
    QueryDef("q126_mad_outliers",
      (s, dir) => {
        val med = Tables.events(s, dir).groupBy("event_type")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val mad = Tables.events(s, dir).join(broadcast(med), "event_type")
          .groupBy("event_type")
          .agg(first(col("med")).as("med"),
            expr("percentile(abs(value - med), 0.5)").as("mad"))
        Tables.events(s, dir).join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("mad") > 0
                && abs(col("value") - col("med")) * 0.6745 / col("mad") > 3.5,
              1L).otherwise(0L)).as("n_outliers"),
            round(first(col("med")), 6).as("med"),
            round(first(col("mad")), 6).as("mad"))
          .orderBy("event_type")
      },
      Some("""WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |mad AS (
        |  SELECT e.event_type, min(m.med) AS med,
        |         quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN med m ON e.event_type = m.event_type
        |  GROUP BY e.event_type)
        |SELECT e.event_type, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN m.mad > 0
        |            AND abs(e.value - m.med) * 0.6745 / m.mad > 3.5
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(min(m.med), 6) AS med, round(min(m.mad), 6) AS mad
        |FROM events e JOIN mad m ON e.event_type = m.event_type
        |GROUP BY e.event_type
        |ORDER BY e.event_type""".stripMargin)),

    // ---- CUSUM change-point detection (Page's cumulative-sum chart) ----
    // drift = target 50 + slack 10; integral constants keep the sequential
    // recurrence bit-identical between the flatMapGroups pass and the
    // recursive CTE (same IEEE ops in the same order).
    QueryDef("q120_cusum_changepoint",
      (s, dir) => TimeSeriesOps.cusum(Tables.events(s, dir),
          "user_id", "event_id", "ts", "value",
          target = 50.0, slack = 10.0, threshold = 300.0)
        .orderBy("user_id", "event_id"),
      Some(s"""WITH RECURSIVE $numberedBase,
        |r AS (
        |  SELECT user_id, event_id, value, rn,
        |         greatest(CAST(0 AS DOUBLE), value - 60) AS sraw,
        |         CASE WHEN greatest(CAST(0 AS DOUBLE), value - 60) > 300
        |              THEN CAST(0 AS DOUBLE)
        |              ELSE greatest(CAST(0 AS DOUBLE), value - 60) END AS s
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.event_id, b.value, b.rn,
        |         greatest(CAST(0 AS DOUBLE), r.s + (b.value - 60)) AS sraw,
        |         CASE WHEN greatest(CAST(0 AS DOUBLE), r.s + (b.value - 60)) > 300
        |              THEN CAST(0 AS DOUBLE)
        |              ELSE greatest(CAST(0 AS DOUBLE), r.s + (b.value - 60)) END AS s
        |  FROM base b JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1)
        |SELECT user_id, event_id, value, sraw AS cusum FROM r
        |WHERE sraw > 300
        |ORDER BY user_id, event_id""".stripMargin)),

    // ---- autocorrelation function (ACF) at lags 1..3 per series ----
    // Pearson correlation of the series against its own lag, from exact
    // decimal component sums (q58 recipe): both engines assemble the same
    // doubles through the same formula, so the rounded output is identical.
    // The lead alignment is one keyed window; the per-(key, lag) components
    // partially aggregate map-side — no self-join of the series.
    QueryDef("q121_autocorrelation",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val lagged = Tables.events(s, dir)
          .select(Seq(col("user_id"), col("value")) ++
            (1 to 3).map(k => lead("value", k).over(w).as(s"l$k")): _*)
        // ONE window pass + ONE aggregate for all three lags (a per-lag
        // union would re-execute the window and its shuffle 3×): each
        // lag's components are null-masked inside the same hash aggregate,
        // then the per-lag rows come out of a single generate. Sparse keys
        // (fewer rows than the lag) yield n = 0 pairs and are dropped, as
        // the oracle's pre-aggregate filter does.
        val (aggCols, structs) = pearsonLagMachinery(
          labels = 1 to 3, x = _ => col("value"), y = k => col(s"l$k"),
          sumF = graft.util.OracleSafe.dsum, outName = "acf")
        lagged.groupBy("user_id").agg(aggCols.head, aggCols.tail: _*)
          .select(col("user_id"), explode(array(structs: _*)).as("e"))
          .select(col("user_id"), col("e.lag"), col("e.n"), col("e.acf"))
          .filter(col("n") > 0)
          .orderBy("user_id", "lag")
      },
      Some {
        val lagSel = (k: Int) =>
          s"""SELECT user_id, $k AS lag, n,
            |  round(CASE WHEN n > 1
            |     AND (sxx - sx * sx / n) > 0 AND (syy - sy * sy / n) > 0
            |    THEN (sxy - sx * sy / n)
            |         / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) END, 6) AS acf
            |FROM (
            |  SELECT user_id, COUNT(*) AS n,
            |    ${sqlDsum("value")} AS sx, ${sqlDsum(s"l$k")} AS sy,
            |    ${sqlDsum("value * value")} AS sxx, ${sqlDsum(s"l$k * l$k")} AS syy,
            |    ${sqlDsum(s"value * l$k")} AS sxy
            |  FROM lagged WHERE l$k IS NOT NULL AND value IS NOT NULL
            |  GROUP BY user_id)""".stripMargin
        s"""WITH lagged AS (
          |  SELECT user_id, value,
          |    LEAD(value, 1) OVER w AS l1, LEAD(value, 2) OVER w AS l2,
          |    LEAD(value, 3) OVER w AS l3
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          |${lagSel(1)}
          |UNION ALL ${lagSel(2)}
          |UNION ALL ${lagSel(3)}
          |ORDER BY user_id, lag""".stripMargin
      }),

    // ---- per-series OLS linear trend (exact component sums) ----
    // slope/intercept of value over elapsed HOURS since the series start:
    // hour-scaled x keeps Σx² < 2^53 so the decimal components cast back
    // to doubles exactly (raw epoch-seconds x would overflow that bound
    // and engines disagree on int128→double rounding); x = Δt/3600 has a
    // factor-3 denominator, so products never land on decimal midpoints.
    // One window (series start) + one aggregate — the trend-detection
    // filter of the reference ecosystem, exact on any layout.
    QueryDef("q135_linear_trend",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val t = expr("unix_micros(ts) div 1000000")
        val t0 = min(t).over(Window.partitionBy("user_id"))
        val base = Tables.events(s, dir)
          .select(col("user_id"), col("value").as("y"),
            ((t - t0) / 3600.0).as("x"))
        base.groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
            dsum(col("x") * col("x")).as("sxx"),
            dsum(col("x") * col("y")).as("sxy"))
          .select(col("user_id"), col("n"),
            round(when(col("n") * col("sxx") - col("sx") * col("sx") =!= 0,
              (col("n") * col("sxy") - col("sx") * col("sy"))
                / (col("n") * col("sxx") - col("sx") * col("sx"))), 6)
              .as("slope_per_hour"),
            round((col("sy") - when(col("n") * col("sxx") - col("sx") * col("sx") =!= 0,
              (col("n") * col("sxy") - col("sx") * col("sy"))
                / (col("n") * col("sxx") - col("sx") * col("sx")))
              .otherwise(lit(0.0)) * col("sx")) / col("n"), 6).as("intercept"))
          .orderBy("user_id")
      },
      Some(s"""WITH base AS (
        |  SELECT user_id, value AS y,
        |    (epoch_us(ts)//1000000
        |     - MIN(epoch_us(ts)//1000000) OVER (PARTITION BY user_id)) / 3600.0 AS x
        |  FROM events),
        |comp AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    ${sqlDsum("x")} AS sx, ${sqlDsum("y")} AS sy,
        |    ${sqlDsum("x * x")} AS sxx, ${sqlDsum("x * y")} AS sxy
        |  FROM base GROUP BY user_id)
        |SELECT user_id, n,
        |  round(CASE WHEN n * sxx - sx * sx <> 0
        |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6) AS slope_per_hour,
        |  round((sy - (CASE WHEN n * sxx - sx * sx <> 0
        |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) ELSE CAST(0 AS DOUBLE) END)
        |    * sx) / n, 6) AS intercept
        |FROM comp
        |ORDER BY user_id""".stripMargin)),

    // ---- Theil–Sen robust trend (median of pairwise slopes) ----
    // The outlier-immune slope estimator: median over all pairwise
    // (Δy/Δx) on a deterministic 1-in-8 decimation of each series (pair
    // count is quadratic per key — the decimation bounds it, and at scale
    // the same shape runs on per-bucket means instead). Self-join per key
    // on the decimated rows; exact interpolated median as in q126.
    QueryDef("q138_theil_sen",
      (s, dir) => {
        val dec = Tables.events(s, dir)
          .filter(col("event_id") % 8 === 0)
          .select(col("user_id"),
            (expr("unix_micros(ts) div 1000000")).as("t"),
            col("value").as("y"))
        val a = dec.select(col("user_id"), col("t").as("ta"), col("y").as("ya"))
        val b = dec.select(col("user_id").as("ub"), col("t").as("tb"), col("y").as("yb"))
        a.join(b, col("user_id") === col("ub") && col("ta") < col("tb"))
          .select(col("user_id"),
            ((col("yb") - col("ya")) / ((col("tb") - col("ta")) / 3600.0)).as("slope"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_pairs"),
            round(expr("percentile(slope, 0.5)"), 6).as("theil_sen_slope"))
          .orderBy("user_id")
      },
      Some("""WITH dec AS (
        |  SELECT user_id, epoch_us(ts)//1000000 AS t, value AS y
        |  FROM events WHERE event_id % 8 = 0),
        |slopes AS (
        |  SELECT a.user_id, (b.y - a.y) / ((b.t - a.t) / 3600.0) AS slope
        |  FROM dec a JOIN dec b ON a.user_id = b.user_id AND a.t < b.t)
        |SELECT user_id, COUNT(*) AS n_pairs,
        |  round(quantile_cont(slope, 0.5), 6) AS theil_sen_slope
        |FROM slopes
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin)),

    // ---- cross-correlation between two event-type series (CCF) ----
    // Lead/lag correlation between the hourly 'view' and 'purchase'
    // count series at lags −2..+2 — does one series anticipate the other?
    // Counts are INTEGERS, so every component sum is exact in plain longs
    // (no decimal recipe needed); only the final Pearson formula touches
    // doubles, identically on both engines. One hour-spine join + one
    // window + one aggregate per lag set.
    QueryDef("q140_cross_correlation",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
        val hourly = ev.filter(col("event_type").isin("view", "purchase"))
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val spine = ev.agg(min(date_trunc("hour", col("ts"))).as("mn"),
            max(date_trunc("hour", col("ts"))).as("mx"))
          .select(explode(sequence(col("mn"), col("mx"),
            expr("interval 1 hour"))).as("h"))
        val wide = spine
          .join(hourly.filter(col("event_type") === "view")
            .select(col("h"), col("n").as("v")), Seq("h"), "left")
          .join(hourly.filter(col("event_type") === "purchase")
            .select(col("h"), col("n").as("p")), Seq("h"), "left")
          .select(col("h"), coalesce(col("v"), lit(0L)).as("v"),
            coalesce(col("p"), lit(0L)).as("p"))
        // both series shift FORWARD: x = v two hours ahead, y = p at
        // (2 + k) hours ahead, so the pair is (v_t, p_{t+k}) and label k
        // really is p's offset relative to v — negative k means p leads.
        // (A one-sided shift of p alone mislabels every lag by +2.)
        val w = Window.orderBy("h")
        val lagged = wide.select(Seq(lead("v", 2).over(w).as("x")) ++
          (-2 to 2).map(k => lead("p", k + 2).over(w).as(s"p${k + 2}")): _*)
        val (aggCols, structs) = pearsonLagMachinery(
          labels = -2 to 2, x = _ => col("x"), y = k => col(s"p${k + 2}"),
          sumF = sum, outName = "ccf", idx = k => (k + 2).toString)
        lagged.groupBy().agg(aggCols.head, aggCols.tail: _*)
          .select(explode(array(structs: _*)).as("e"))
          .select(col("e.lag"), col("e.n"), col("e.ccf"))
          .filter(col("n") > 0)
          .orderBy("lag")
      },
      Some {
        val lagSel = (k: Int) => {
          val i = k + 2
          s"""SELECT $k AS lag, n,
            |  round(CASE WHEN n > 1 AND (sxx - sx * sx / n) > 0
            |              AND (syy - sy * sy / n) > 0
            |    THEN (sxy - sx * sy / n)
            |      / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) END, 6) AS ccf
            |FROM (
            |  SELECT COUNT(CASE WHEN x IS NOT NULL AND p$i IS NOT NULL THEN 1 END) AS n,
            |    CAST(SUM(CASE WHEN x IS NOT NULL AND p$i IS NOT NULL THEN x END) AS DOUBLE) AS sx,
            |    CAST(SUM(CASE WHEN x IS NOT NULL AND p$i IS NOT NULL THEN p$i END) AS DOUBLE) AS sy,
            |    CAST(SUM(CASE WHEN x IS NOT NULL AND p$i IS NOT NULL THEN x * x END) AS DOUBLE) AS sxx,
            |    CAST(SUM(CASE WHEN x IS NOT NULL AND p$i IS NOT NULL THEN p$i * p$i END) AS DOUBLE) AS syy,
            |    CAST(SUM(CASE WHEN x IS NOT NULL AND p$i IS NOT NULL THEN x * p$i END) AS DOUBLE) AS sxy
            |  FROM lagged) WHERE n > 0""".stripMargin
        }
        s"""WITH hourly AS (
          |  SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
          |  FROM events WHERE event_type IN ('view', 'purchase')
          |  GROUP BY 1, 2),
          |spine AS (
          |  SELECT unnest(generate_series(min(date_trunc('hour', ts)),
          |    max(date_trunc('hour', ts)), INTERVAL 1 HOUR)) AS h FROM events),
          |wide AS (
          |  SELECT s.h, COALESCE(v.n, 0) AS v, COALESCE(p.n, 0) AS p
          |  FROM spine s
          |  LEFT JOIN hourly v ON v.h = s.h AND v.event_type = 'view'
          |  LEFT JOIN hourly p ON p.h = s.h AND p.event_type = 'purchase'),
          |lagged AS (
          |  SELECT LEAD(v, 2) OVER (ORDER BY h) AS x, ${(-2 to 2).map(k =>
              s"LEAD(p, ${k + 2}) OVER (ORDER BY h) AS p${k + 2}").mkString(", ")}
          |  FROM wide)
          |${(-2 to 2).map(lagSel).mkString("\nUNION ALL ")}
          |ORDER BY lag""".stripMargin
      }),

    // ---- LTTB downsampling (largest-triangle-three-buckets) ----
    // m = 8 kept points per series; the oracle is the SAME algorithm
    // unrolled as 6 chained window/aggregate steps (anchors are sequential,
    // but the step count is a constant, so plain SQL expresses it exactly).
    QueryDef("q132_lttb_downsample",
      (s, dir) => TimeSeriesOps.lttb(Tables.events(s, dir),
          "user_id", "event_id", "ts", "value", m = 8)
        .orderBy("user_id", "event_id"),
      Some(lttbOracle(8))),

    // ---- Holt linear (double-exponential) smoothing ----
    // alpha = 0.5, beta = 0.25: all four coefficients (0.5/0.5, 0.25/0.75)
    // are exact in binary, so the per-key double sequence is bit-identical
    // to the recursive CTE's (emitted UNROUNDED, the q85 discipline). The
    // CTE repeats the new-level expression inside the trend term — SQL
    // cannot reference a same-SELECT alias — which is the identical IEEE
    // op sequence the Scala pass executes.
    QueryDef("q150_holt_smoothing",
      (s, dir) => TimeSeriesOps.holt(Tables.events(s, dir),
          "user_id", "event_id", "ts", "value", alpha = 0.5, beta = 0.25)
        .orderBy("user_id", "event_id"),
      Some(s"""WITH RECURSIVE $numberedBase,
        |r AS (
        |  SELECT user_id, event_id, value, rn,
        |         value AS level, CAST(0 AS DOUBLE) AS trend
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.user_id, b.event_id, b.value, b.rn,
        |    CAST(0.5 AS DOUBLE) * b.value
        |      + CAST(0.5 AS DOUBLE) * (r.level + r.trend) AS level,
        |    CAST(0.25 AS DOUBLE) * ((CAST(0.5 AS DOUBLE) * b.value
        |        + CAST(0.5 AS DOUBLE) * (r.level + r.trend)) - r.level)
        |      + CAST(0.75 AS DOUBLE) * r.trend AS trend
        |  FROM base b JOIN r ON b.user_id = r.user_id AND b.rn = r.rn + 1)
        |SELECT user_id, event_id, value, level, trend FROM r
        |ORDER BY user_id, event_id""".stripMargin)),

    // ---- seasonal (hour-of-day) profile + deviation ----
    // Per (user, hour-of-day): visit count, hourly mean, and the hour's
    // deviation from the user's overall mean — the additive seasonal
    // decomposition a fleet-monitoring deployment runs before anomaly
    // thresholds. ONE scan: the overall mean is recovered from the hourly
    // partials by window sums — and those re-sums stay in EXACT DECIMAL
    // (dsumDec), cast to double only at the end: re-summing cast doubles
    // would be order-dependent across engines. The final divisions and
    // subtraction are single IEEE ops on identical inputs → raw doubles.
    QueryDef("q151_seasonal_profile",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val u = Window.partitionBy("user_id")
        Tables.events(s, dir)
          .groupBy(col("user_id"), hour(col("ts")).as("hr"))
          .agg(count(lit(1)).as("n"),
            graft.util.OracleSafe.dsumDec(col("value")).as("svd"))
          .select(col("user_id"), col("hr"), col("n"),
            (col("svd").cast("double") / col("n")).as("hr_mean"),
            (col("svd").cast("double") / col("n")
              - sum(col("svd")).over(u).cast("double")
                / sum(col("n")).over(u).cast("double")).as("dev"))
          .orderBy("user_id", "hr")
      },
      Some("""WITH hourly AS (
        |  SELECT user_id, CAST(hour(ts) AS INTEGER) AS hr, COUNT(*) AS n,
        |         SUM(CAST(value AS DECIMAL(27,6))) AS svd
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, hr, n, CAST(svd AS DOUBLE) / n AS hr_mean,
        |  CAST(svd AS DOUBLE) / n
        |    - CAST(SUM(svd) OVER (PARTITION BY user_id) AS DOUBLE)
        |      / CAST(SUM(n) OVER (PARTITION BY user_id) AS DOUBLE) AS dev
        |FROM hourly
        |ORDER BY user_id, hr""".stripMargin)),

    // ---- Bollinger-band breakouts (rolling 20-point mean ± 2σ) ----
    // The rolling volatility envelope per series: exact decimal window
    // sums for Σx and Σx² (order-independent at any parallelism), the
    // textbook sample-variance identity evaluated in one fixed IEEE
    // sequence, and the breakout flags compared on the UNROUNDED band
    // edges so the kept set is engine-independent. The trailing frame
    // runs through the TWO-LEVEL bucket-stitched window
    // (TimeSeriesOps.bucketedRollingWindow, as in q102): event_type has
    // ~5 values, so the single-level window would cap at 5-way
    // parallelism; daily buckets scale it with the corpus span, and the
    // hash-check against the single-window oracle proves the stitching.
    QueryDef("q180_bollinger_breakouts",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val dec = DecimalType(27, 6)
        val w = TimeSeriesOps.bucketedRollingWindow(
            Tables.events(s, dir), "event_type", "ts", "event_id", "value",
            frameRows = 19, bucketWidthMicros = 86400000000L,
            rollingAgg = (v, win) => struct(
              count(lit(1)).over(win).as("n20"),
              sum(col(v).cast(dec)).over(win).as("s"),
              sum((col(v) * col(v)).cast(dec)).over(win).as("ssq")),
            outName = "roll")
          .select(col("event_id"), col("event_type"), col("value"),
            col("roll.n20").as("n20"), col("roll.s").as("s"),
            col("roll.ssq").as("ssq"))
        val m = w.filter(col("n20") === 20)
          .select(col("event_id"), col("event_type"), col("value"),
            (col("s").cast("double") / col("n20")).as("mean"),
            sqrt(greatest((col("ssq").cast("double")
              - col("s").cast("double") * col("s").cast("double")
                / col("n20")) / (col("n20") - 1), lit(0d))).as("sd"))
        m.withColumn("band",
            when(col("value") > col("mean") + lit(2d) * col("sd"), "upper")
              .when(col("value") < col("mean") - lit(2d) * col("sd"), "lower"))
          .filter(col("band").isNotNull)
          .select(col("event_id"), col("event_type"), col("value"),
            round(col("mean"), 6).as("mean"), round(col("sd"), 6).as("sd"),
            col("band"))
          .orderBy("event_id")
      },
      Some("""WITH w AS (
        |  SELECT event_id, event_type, value,
        |    COUNT(*) OVER win AS n20,
        |    SUM(CAST(value AS DECIMAL(27,6))) OVER win AS s,
        |    SUM(CAST(value * value AS DECIMAL(27,6))) OVER win AS ssq
        |  FROM events
        |  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
        |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |m AS (
        |  SELECT event_id, event_type, value,
        |    CAST(s AS DOUBLE) / n20 AS mean,
        |    sqrt(greatest((CAST(ssq AS DOUBLE)
        |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n20) / (n20 - 1),
        |      CAST(0 AS DOUBLE))) AS sd
        |  FROM w WHERE n20 = 20)
        |SELECT event_id, event_type, value,
        |  round(mean, 6) AS mean, round(sd, 6) AS sd,
        |  CASE WHEN value > mean + 2 * sd THEN 'upper'
        |       ELSE 'lower' END AS band
        |FROM m
        |WHERE value > mean + 2 * sd OR value < mean - 2 * sd
        |ORDER BY event_id""".stripMargin)),

    // ---- time-weighted average (irregular-sample mean) ----
    // THE industrial-historian aggregate: with irregular sampling, the
    // plain mean over-weights bursts; each reading instead holds its
    // value until the next one, so the mean weights by holding duration
    // (Σ vᵢ·Δtᵢ / ΣΔtᵢ). Durations come from one keyed LEAD window in
    // exact epoch MICROS and values in exact CENTS, so both sums are
    // pure int64 (≤1.5e17 at any tested SF — 60× below 2^63) — the
    // decimal-cast route was tried first and hit the scale-6 midpoint
    // trap (cents × 6-decimal seconds = an exactly-8-decimal product,
    // which Spark and DuckDB round apart; 64/150 rows flipped). The
    // final division is fixed IEEE ops on identical operands — raw-
    // double parity, no rounding. One shuffle on the series key.
    QueryDef("q195_time_weighted_avg",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val seg = Tables.events(s, dir).select(col("user_id"),
          floor(col("value") * 100d + 0.5d).cast("long").as("cents"),
          (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
            .as("dur_us"))
        seg.filter(col("dur_us").isNotNull)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum(col("cents") * col("dur_us")).as("wsum"),
            sum(col("dur_us")).as("wtot"))
          .select(col("user_id"), col("n"),
            (col("wsum").cast("double")
              / (col("wtot").cast("double") * 100d)).as("twa"))
          .orderBy("user_id")
      },
      Some("""WITH seg AS (
        |  SELECT user_id,
        |    CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |      AS cents,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) - epoch_us(ts) AS dur_us
        |  FROM events),
        |agg AS (
        |  SELECT user_id, COUNT(*) AS n,
        |    CAST(SUM(cents * dur_us) AS BIGINT) AS wsum,
        |    CAST(SUM(dur_us) AS BIGINT) AS wtot
        |  FROM seg WHERE dur_us IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n,
        |  CAST(wsum AS DOUBLE) / (CAST(wtot AS DOUBLE) * 100) AS twa
        |FROM agg
        |ORDER BY user_id""".stripMargin))
  )

  /** Unrolled-SQL twin of [[TimeSeriesOps.lttb]] for `m` total buckets:
    * anchor steps are data-independent in COUNT (m − 2 of them), so the
    * sequential selection chain becomes m − 2 chained CTEs, each a windowed
    * argmax over one bucket joined to the previous anchor. Series with
    * n ≤ m pass through whole (the operator's short-series branch) via the
    * `n <= m` union arm; the anchor chain is restricted to `n > m` so a
    * single-row series is never emitted twice.
    */
  private def lttbOracle(m: Int): String = {
    val nb = m - 2
    val step = (t: Int) => {
      val cent =
        if (t + 1 < nb) s"JOIN cent c ON c.user_id = b.user_id AND c.bk = ${t + 1}"
        else "JOIN lastp c ON c.user_id = b.user_id"
      s"""s$t AS (SELECT user_id, rn FROM (
        |    SELECT b.user_id, b.rn,
        |      ROW_NUMBER() OVER (PARTITION BY b.user_id
        |        ORDER BY ABS((a.ax-c.cx)*(b.value-a.ay) - (a.ax-b.x)*(c.cy-a.ay)) DESC,
        |                 b.rn ASC) AS cr
        |    FROM b JOIN a$t a ON a.user_id = b.user_id $cent
        |    WHERE b.bk = $t) WHERE cr = 1),
        |a${t + 1} AS (SELECT b.user_id, b.rn, b.x AS ax, b.value AS ay
        |  FROM b JOIN s$t s ON s.user_id = b.user_id AND s.rn = b.rn)""".stripMargin
    }
    val steps = (0 until nb).map(step).mkString(",\n")
    val unions = (0 until nb)
      .map(t => s"UNION ALL SELECT user_id, rn FROM a${t + 1}").mkString(" ")
    s"""WITH base AS (SELECT user_id, event_id, value,
      |    CAST(epoch_us(ts)//1000000 AS DOUBLE) AS x,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events),
      |b AS (SELECT *, CASE WHEN n > $m AND rn > 1 AND rn < n
      |    THEN CAST(((rn-2)*$nb) // (n-2) AS INTEGER) END AS bk FROM base),
      |cent AS (SELECT user_id, bk,
      |    CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)/COUNT(*) AS cx,
      |    CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE)/COUNT(*) AS cy
      |  FROM b WHERE bk IS NOT NULL GROUP BY 1,2),
      |lastp AS (SELECT user_id, x AS cx, value AS cy FROM b WHERE rn = n AND n > $m),
      |a0 AS (SELECT user_id, rn, x AS ax, value AS ay FROM b WHERE rn = 1 AND n > $m),
      |$steps,
      |sel AS (SELECT user_id AS su, rn AS srn FROM a0
      |  $unions
      |  UNION ALL SELECT user_id, rn FROM b WHERE rn = n AND n > $m
      |  UNION ALL SELECT user_id, rn FROM b WHERE n <= $m)
      |SELECT b.user_id, b.event_id, b.value
      |FROM b JOIN sel ON sel.su = b.user_id AND sel.srn = b.rn
      |ORDER BY user_id, event_id""".stripMargin
  }
}
