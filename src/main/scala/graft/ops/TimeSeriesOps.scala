package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.OracleSafe._

/** Time-series filter operators — the computations FogLAMP deployments run
  * through the reference plugin's user-script surface (the reference's O5
  * operator hosts arbitrary per-batch Python, `/root/reference/plugin.cpp:
  * 285-287`, and its sibling filter plugins — ewma, delta, rms, rate,
  * expression — are the canonical scripts users deploy on reading streams).
  * Re-expressed Spark-first:
  *
  *  - Frame-free per-key recurrences (EWMA, Holt, deadband, hysteresis,
  *    CUSUM) run as a STREAMING secondary sort ([[foldSortedSeries]]):
  *    one hash shuffle on the series key, a within-partition
  *    (key, ts, id) sort, and a single mapPartitions pass that carries
  *    O(1) recurrence state across rows and resets it at each key
  *    boundary — a series never has to fit in a task's heap (r20; the
  *    earlier `flatMapGroups` + per-group `toArray` capped a series at
  *    task memory, the same hazard class the r19 verdict flagged on the
  *    pack stage). Imperative only where the recurrence is genuinely
  *    sequential — the honest analog of the reference's stateful script.
  *  - Everything else (RMS downsample, rate-of-change, gap-fill, OHLC,
  *    z-score) is declarative windows/aggregates that Catalyst plans with
  *    partial aggregation and whole-stage codegen.
  *  - The one intentional exception: [[lttb]] buffers each series as an
  *    array — its index-equal bucket boundaries are a function of the
  *    series LENGTH, unknowable in one streaming pass, and the anchor
  *    chain looks one bucket ahead; O(rows-per-key) state is inherent to
  *    the algorithm, not an implementation shortcut.
  */
object TimeSeriesOps {

  case class TsRow(key: Long, id: Long, tsMicros: Long, value: Double)
  case class SmoothedRow(user_id: Long, event_id: Long, value: Double, ewma: Double)
  case class KeptRow(user_id: Long, event_id: Long, value: Double)

  private def asTsRows(df: DataFrame, keyCol: String, idCol: String,
                       tsCol: String, valueCol: String) = {
    val s = df.sparkSession
    import s.implicits._
    df.select(col(keyCol).as("key"), col(idCol).as("id"),
        unix_micros(col(tsCol)).as("tsMicros"), col(valueCol).as("value"))
      .as[TsRow]
  }

  /** Per-series ordered STREAMING fold — the scale shape of every
    * sequential recurrence here: hash-shuffle on the series key, sort
    * WITHIN partitions by (key, tsMicros, id), then one pass that hands
    * `f` each series as a lazily-grouped iterator in time order. Task
    * memory is O(1) plus whatever state `f` keeps (all callers keep a
    * couple of doubles) — no per-series array. A partition holds many
    * series; the (key, ts, id) sort makes each a contiguous run, and a
    * series `f` abandons early is drained before the next one starts so
    * a half-consumed group can never masquerade as a new series.
    */
  private def foldSortedSeries[O](ds: org.apache.spark.sql.Dataset[TsRow])(
      f: (Long, Iterator[TsRow]) => Iterator[O])(
      implicit enc: org.apache.spark.sql.Encoder[O])
      : org.apache.spark.sql.Dataset[O] =
    ds.repartition(col("key"))
      .sortWithinPartitions("key", "tsMicros", "id")
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[O] {
          private var cur: Iterator[O] = Iterator.empty
          private var group: Iterator[TsRow] = Iterator.empty
          @annotation.tailrec
          private def advance(): Unit =
            if (!cur.hasNext) {
              while (group.hasNext) group.next() // finish the prior series
              if (buf.hasNext) {
                val k = buf.head.key
                group = new Iterator[TsRow] {
                  def hasNext: Boolean = buf.hasNext && buf.head.key == k
                  // guard, don't delegate: a bare buf.next() past the
                  // series boundary would silently hand the NEXT series'
                  // first row to this fold (r20 review) — the exact
                  // cross-series corruption this helper exists to prevent
                  def next(): TsRow =
                    if (hasNext) buf.next()
                    else throw new NoSuchElementException(
                      s"series $k exhausted")
                }
                cur = f(k, group)
                advance() // f may emit nothing for this series
              }
            }
          def hasNext: Boolean = { advance(); cur.hasNext }
          def next(): O = {
            advance()
            if (!cur.hasNext) throw new NoSuchElementException
            cur.next()
          }
        }
      }

  /** Per-key exponential moving average, seeded with the first value:
    * e_1 = x_1; e_t = alpha*x_t + (1-alpha)*e_t. The recurrence is
    * inherently sequential per key, so it runs as one pass over each
    * sorted group. Use an alpha whose complement is exact in binary
    * (0.25, 0.5, 0.125…) when cross-engine bit-parity matters.
    */
  def ewma(df: DataFrame, keyCol: String, idCol: String, tsCol: String,
           valueCol: String, alpha: Double): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val beta = 1.0 - alpha
    foldSortedSeries(asTsRows(df, keyCol, idCol, tsCol, valueCol)) {
        (k: Long, rows: Iterator[TsRow]) =>
        var e = 0.0
        var first = true
        rows.map { r =>
          e = if (first) { first = false; r.value } else alpha * r.value + beta * e
          SmoothedRow(k, r.id, r.value, e)
        }
      }.toDF(keyCol, idCol, valueCol, "ewma")
  }

  case class HoltRow(user_id: Long, event_id: Long, value: Double,
                     level: Double, trend: Double)

  /** Holt linear (double-exponential) smoothing — the trend-aware upgrade
    * of [[ewma]] the reference ecosystem scripts as a forecasting filter:
    * l_1 = x_1, b_1 = 0; then
    * l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1}),
    * b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}.
    * Same sequential-per-key shape as [[ewma]]; emits UNROUNDED doubles —
    * with binary-exact alpha/beta complements both engines execute the
    * identical IEEE op sequence, so the oracle recursive CTE is
    * bit-identical (the q85 discipline).
    */
  def holt(df: DataFrame, keyCol: String, idCol: String, tsCol: String,
           valueCol: String, alpha: Double, beta: Double): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val (ca, cb) = (1.0 - alpha, 1.0 - beta)
    foldSortedSeries(asTsRows(df, keyCol, idCol, tsCol, valueCol)) {
        (k: Long, rows: Iterator[TsRow]) =>
        var l = 0.0; var b = 0.0
        var first = true
        rows.map { r =>
          if (first) { first = false; l = r.value; b = 0.0 }
          else {
            val lNew = alpha * r.value + ca * (l + b)
            b = beta * (lNew - l) + cb * b
            l = lNew
          }
          HoltRow(k, r.id, r.value, l, b)
        }
      }.toDF(keyCol, idCol, valueCol, "level", "trend")
  }

  /** Deadband (delta) compression: emit a row only when |value − last
    * EMITTED value| exceeds the tolerance; the first row per key always
    * emits. This is the reference ecosystem's delta filter — the kept set
    * depends on previously kept rows, so like [[ewma]] it is a sequential
    * per-key pass, not a lag window.
    */
  def deadband(df: DataFrame, keyCol: String, idCol: String, tsCol: String,
               valueCol: String, tolerance: Double): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    foldSortedSeries(asTsRows(df, keyCol, idCol, tsCol, valueCol)) {
        (k: Long, rows: Iterator[TsRow]) =>
        // explicit first-row flag, NOT a NaN sentinel: a NaN sentinel would
        // conflate "nothing emitted yet" with "last emitted value was NaN"
        // and re-emit every row after a NaN reading (the SQL oracle's
        // NaN-comparison semantics emit nothing after one — an explicit
        // flag keeps |x - NaN| > tol falsy on both sides)
        var first = true
        var lastEmitted = 0.0
        rows.flatMap { r =>
          val emit = first || math.abs(r.value - lastEmitted) > tolerance
          first = false
          if (emit) { lastEmitted = r.value; Some(KeptRow(k, r.id, r.value)) }
          else None
        }
      }.toDF(keyCol, idCol, valueCol)
  }

  case class AlarmRow(user_id: Long, event_id: Long, value: Double, alarm: Boolean)

  /** Throttle (rate-limit) filter: forward at most ONE reading per key per
    * 15-minute slot — the first in (ts, id) order. A `min_by` hash
    * aggregate on the version tuple: one partial-aggregated shuffle, no
    * window sort (the FogLAMP-ecosystem rate filter shape).
    */
  def throttleFirstPerSlot(df: DataFrame, keyCol: String, idCol: String,
                           tsCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol), slot15(tsCol).as("slot"))
      .agg(min_by(col(idCol), struct(col(tsCol), col(idCol))).as(idCol),
           min_by(col(valueCol), struct(col(tsCol), col(idCol))).as(valueCol),
           count(lit(1)).as("n_suppressed"))
      .withColumn("n_suppressed", col("n_suppressed") - 1)

  /** Hysteresis threshold alarm: alarm turns ON when the value exceeds
    * `hi`, OFF when it drops below `lo`, holds otherwise — the two-level
    * state machine that de-chatters threshold alerts. Sequential per key
    * (state depends on history), so a [[ewma]]-style sorted group pass;
    * emits only the TRANSITIONS (alarm raised / cleared).
    */
  def hysteresisAlarms(df: DataFrame, keyCol: String, idCol: String,
                       tsCol: String, valueCol: String,
                       lo: Double, hi: Double): DataFrame = {
    require(lo <= hi, s"hysteresis needs lo <= hi (got lo=$lo, hi=$hi)")
    val s = df.sparkSession
    import s.implicits._
    foldSortedSeries(asTsRows(df, keyCol, idCol, tsCol, valueCol)) {
        (k: Long, rows: Iterator[TsRow]) =>
        var alarm = false
        rows.flatMap { r =>
          val next = if (alarm) !(r.value < lo) else r.value > hi
          val transition = next != alarm
          alarm = next
          if (transition) Some(AlarmRow(k, r.id, r.value, next)) else None
        }
      }.toDF(keyCol, idCol, valueCol, "alarm")
  }

  /** RMS downsample: per key per time bucket, root-mean-square + peak-to-peak
    * + count. One partial-aggregated shuffle; the mean-of-squares accumulates
    * through an exact decimal (order-independent), so the result is
    * deterministic on any cluster layout.
    */
  def rmsDownsample(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String): DataFrame =
    df.groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"),
           sqrt(dsum(col(valueCol) * col(valueCol)) / count(lit(1))).as("rms"),
           (max(col(valueCol)) - min(col(valueCol))).as("peak_to_peak"))

  /** Rate of change per key: Δvalue/Δseconds between consecutive readings,
    * with monotonic-counter semantics — a negative delta is a counter reset
    * and yields NULL (as does a zero time step). One keyed window, no
    * self-join.
    */
  def rateOfChange(df: DataFrame, keyCol: String, idCol: String, tsCol: String,
                   valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val dv = col(valueCol) - lag(col(valueCol), 1).over(w)
    val dtUs = unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w)
    df.select(col(keyCol), col(idCol), col(tsCol), col(valueCol))
      .withColumn("rate_per_s",
        when(dtUs > 0 && dv >= 0, round(dv / (dtUs / lit(1e6)), 6)))
  }

  /** Floor a timestamp to its 15-minute grid slot in exact long space
    * (micros since epoch exceed 2^53, so double division would round).
    * pmod-subtract, not `div`: `div` truncates toward zero, which for
    * pre-epoch (negative-micros) timestamps rounds UP to the wrong slot,
    * while pmod is always non-negative so the subtraction FLOORS — the
    * same grid DuckDB's time_bucket produces (its 2000-01-01 origin is
    * itself a multiple of 900 s).
    */
  private def slot15(tsCol: String): Column = {
    val us = unix_micros(col(tsCol))
    timestamp_micros(us - pmod(us, lit(900000000L)))
  }

  /** Gap-fill to a regular 15-minute grid with forward fill: per-key grid
    * from first to last observed slot, bucketed means joined on, missing
    * slots carry the last observed value (`last` with ignoreNulls) and an
    * `is_gap` flag. The grid explode is per key (bounded by the key's time
    * span), the fill is one keyed window — no driver loops.
    */
  def gapFillForward(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String): DataFrame = {
    val slot = slot15(tsCol)
    val bucketed = df
      .groupBy(col(keyCol), slot.as("slot"))
      .agg(round(davg(col(valueCol)), 6).as("v"))
    val grid = bucketed.groupBy(col(keyCol))
      .agg(min(col("slot")).as("mn"), max(col("slot")).as("mx"))
      .select(col(keyCol),
        explode(sequence(col("mn"), col("mx"), expr("interval 15 minutes"))).as("slot"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, Seq(keyCol, "slot"), "left")
      .select(col(keyCol), col("slot"),
        last(col("v"), ignoreNulls = true).over(w).as("value_filled"),
        col("v").isNull.as("is_gap"))
  }

  /** Linear-interpolation gap fill: like [[gapFillForward]] but missing
    * slots take the straight line between the PREVIOUS and NEXT observed
    * bucket means (endpoints and trailing gaps fall back to the nearest
    * observed value). Two keyed windows (backward carry + forward carry),
    * no self-joins.
    */
  def gapFillLinear(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String): DataFrame = {
    val slot = slot15(tsCol)
    // bucket means stay UNROUNDED through the interpolation: interpolating
    // two 6-dp-rounded endpoints at fraction 1/2 lands exactly on 7th-
    // decimal midpoints, where Spark (rounds the shortest decimal repr)
    // and other engines (round the exact binary expansion) disagree —
    // round once, at the output
    val bucketed = df
      .groupBy(col(keyCol), slot.as("slot"))
      .agg(davg(col(valueCol)).as("v"))
    val grid = bucketed.groupBy(col(keyCol))
      .agg(min(col("slot")).as("mn"), max(col("slot")).as("mx"))
      .select(col(keyCol),
        explode(sequence(col("mn"), col("mx"), expr("interval 15 minutes"))).as("slot"))
    val back = Window.partitionBy(col(keyCol)).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col("slot"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val sec = unix_micros(col("slot")) / lit(1e6)
    grid.join(bucketed, Seq(keyCol, "slot"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("pt", last(when(col("v").isNotNull, sec), ignoreNulls = true).over(back))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("nt", first(when(col("v").isNotNull, sec), ignoreNulls = true).over(fwd))
      .select(col(keyCol), col("slot"),
        round(when(col("v").isNotNull, col("v"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv"))
            * (sec - col("pt")) / (col("nt") - col("pt"))), 6)
          .as("value_interp"),
        col("v").isNull.cast("int").as("is_gap"))
  }

  /** Counter increase per key per hour: the sum of POSITIVE deltas between
    * consecutive readings landing in the bucket — reconstructs monotonic
    * counter growth across resets (a negative delta contributes nothing).
    * One keyed lag window + one bucketed aggregate.
    */
  def counterIncrease(df: DataFrame, keyCol: String, idCol: String,
                      tsCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val dv = col(valueCol) - lag(col(valueCol), 1).over(w)
    df.select(col(keyCol), col(idCol), col(tsCol), col(valueCol))
      .withColumn("dv", dv)
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(dsum(when(col("dv") > 0, col("dv")).otherwise(lit(0.0))).as("increase"),
           count(col("dv")).as("n_deltas"))
  }

  /** OHLC compaction: per key per hour, open/high/low/close + count — the
    * classic lossless-enough series summary. open/close are `min_by`/
    * `max_by` on the (ts, id) version tuple: one hash aggregate, no window
    * sort over the full series (same pattern as last-state compaction).
    */
  def ohlc(df: DataFrame, keyCol: String, idCol: String, tsCol: String,
           valueCol: String): DataFrame =
    df.groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(min_by(col(valueCol), struct(col(tsCol), col(idCol))).as("open"),
           max(col(valueCol)).as("high"),
           min(col(valueCol)).as("low"),
           max_by(col(valueCol), struct(col(tsCol), col(idCol))).as("close"),
           count(lit(1)).as("n"))

  /** Sliding-window pattern (motif) distance: squared Euclidean distance
    * between each length-|pattern| window of the series and a fixed query
    * pattern, as a SUM OF LEADS — pure window functions, no array
    * materialization, no self-join (the time-series subsequence-search
    * shape; windows shorter than the pattern, at each key's tail, yield
    * NULL and are dropped). The explicit left-to-right term sum keeps the
    * result bit-identical across engines.
    */
  def patternDistance(df: DataFrame, keyCol: String, idCol: String,
                      tsCol: String, valueCol: String,
                      pattern: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val leads = pattern.indices.map(j => lead(col(valueCol), j).over(w))
    val d2 = pattern.zip(leads).map { case (p, lj) =>
      (lj - lit(p)) * (lj - lit(p))
    }.reduce(_ + _)
    df.select(col(keyCol), col(idCol), col(tsCol), col(valueCol))
      .withColumn("d2", round(d2, 6))
      .filter(col("d2").isNotNull)
      .drop(valueCol)
  }

  /** 8-point DFT power spectrum over tumbling (non-overlapping) windows per
    * key — the spectral-analysis (FFT-filter) capability, sized so every
    * twiddle factor is an EXACT double (cos/sin of multiples of π/4 are
    * 0, ±1, ±√2/2 with √2/2 = sqrt(0.5), correctly rounded on any IEEE
    * engine): the whole computation is a fixed weighted sum of 8 leads,
    * pure window functions, bit-identical cross-engine. Emits the power at
    * bins k=1 and k=2 for each full window.
    */
  def dft8Power(df: DataFrame, keyCol: String, idCol: String, tsCol: String,
                valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    // materialize leads + filter to window starts FIRST: the spectral
    // arithmetic then runs on 1/8 of the rows instead of being computed
    // and discarded for the other 7
    val starts = df.select(
        Seq(col(keyCol), col(idCol), row_number().over(w).as("rn")) ++
          (0 until 8).map(j => lead(col(valueCol), j).over(w).as(s"l$j")): _*)
      .filter(col("rn") % 8 === 1 &&
        (0 until 8).map(j => col(s"l$j").isNotNull).reduce(_ && _))
    val s = math.sqrt(0.5)
    def wsum(ws: Seq[Double]) = ws.zipWithIndex
      .map { case (c, j) => col(s"l$j") * lit(c) }.reduce(_ + _)
    val re1 = wsum(Seq(1.0, s, 0.0, -s, -1.0, -s, 0.0, s))
    val im1 = wsum(Seq(0.0, -s, -1.0, -s, 0.0, s, 1.0, s))
    val re2 = wsum(Seq(1.0, 0.0, -1.0, 0.0, 1.0, 0.0, -1.0, 0.0))
    val im2 = wsum(Seq(0.0, -1.0, 0.0, 1.0, 0.0, -1.0, 0.0, 1.0))
    starts.select(col(keyCol), col(idCol),
      round(re1 * re1 + im1 * im1, 6).as("p1"),
      round(re2 * re2 + im2 * im2, 6).as("p2"))
  }

  case class CusumRow(user_id: Long, event_id: Long, value: Double, cusum: Double)

  /** One-sided CUSUM change-point detector (Page's cumulative-sum chart):
    * per key in (ts, id) order, `s ← max(0, s + (value − target − slack))`;
    * when `s` crosses `threshold` the row is flagged as a change point and
    * the statistic resets — the classic drift detector deployed as an edge
    * filter script in the reference ecosystem (the O5 surface hosts exactly
    * this kind of stateful per-reading recurrence,
    * `/root/reference/plugin.cpp:113-117, 285-287`). Sequential per key like
    * [[ewma]]: one shuffle on the series key, one sorted pass per group.
    * All constants integral so every step is the same correctly-rounded
    * IEEE op on both engines → bit-exact against a recursive-CTE oracle.
    */
  def cusum(df: DataFrame, keyCol: String, idCol: String, tsCol: String,
            valueCol: String, target: Double, slack: Double,
            threshold: Double): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val drift = target + slack
    foldSortedSeries(asTsRows(df, keyCol, idCol, tsCol, valueCol)) {
        (k: Long, rows: Iterator[TsRow]) =>
        var st = 0.0
        rows.flatMap { r =>
          st = math.max(0.0, st + (r.value - drift))
          if (st > threshold) {
            val fired = st; st = 0.0
            Some(CusumRow(k, r.id, r.value, fired))
          } else None
        }
      }.toDF(keyCol, idCol, valueCol, "cusum")
  }

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) — the
    * standard visual-fidelity series decimator in the edge/IoT world the
    * reference ships into: keep first and last points, split the interior
    * into `m − 2` index-equal buckets, and left-to-right keep from each
    * bucket the point forming the largest triangle with the previously kept
    * point and the NEXT bucket's centroid. The anchor chain is inherently
    * sequential per key, so like [[ewma]] this is one shuffle on the series
    * key + one sorted pass per group with O(rows-per-key) state.
    *
    * Determinism contract (oracle = the same algorithm unrolled as chained
    * SQL aggregates): x is integral epoch-SECONDS (exact in a double; a
    * per-key micros sum would exceed 2^53 and engines round int128→double
    * differently), centroids average through a scale-6 decimal exactly like
    * [[graft.util.OracleSafe.dsum]], ties break to the lowest row number.
    */
  def lttb(df: DataFrame, keyCol: String, idCol: String, tsCol: String,
           valueCol: String, m: Int): DataFrame = {
    require(m >= 3, s"lttb needs m >= 3 buckets (got $m)")
    val s = df.sparkSession
    import s.implicits._
    asTsRows(df, keyCol, idCol, tsCol, valueCol)
      .groupByKey(_.key)
      .flatMapGroups { (k: Long, it: Iterator[TsRow]) =>
        val sorted = it.toArray.sortBy(r => (r.tsMicros, r.id))
        val n = sorted.length
        if (n <= m) sorted.iterator.map(r => KeptRow(k, r.id, r.value))
        else {
          val xs = sorted.map(r => (r.tsMicros / 1000000L).toDouble)
          val ys = sorted.map(_.value)
          // interior index i (0-based 1..n-2) → bucket (i-1)*(m-2) div (n-2)
          val nBuckets = m - 2
          val bucketOf = (i: Int) => ((i - 1).toLong * nBuckets / (n - 2)).toInt
          val starts = Array.fill(nBuckets + 1)(n - 1)
          var i = n - 2
          while (i >= 1) { starts(bucketOf(i)) = i; i -= 1 }
          starts(nBuckets) = n - 1
          // centroid of bucket b via scale-6 decimal sums (oracle parity)
          def centroid(b: Int): (Double, Double) = {
            var sx = java.math.BigDecimal.ZERO
            var sy = java.math.BigDecimal.ZERO
            var cnt = 0
            var j = starts(b)
            while (j < starts(b + 1)) {
              sx = sx.add(new java.math.BigDecimal(xs(j).toLong))
              // exact-binary decimal (NOT valueOf's shortest-repr, which
              // recovers rational midpoints and rounds opposite to
              // DuckDB's CAST(value AS DECIMAL) — the PageRank trap)
              sy = sy.add(new java.math.BigDecimal(ys(j))
                .setScale(6, java.math.RoundingMode.HALF_UP))
              cnt += 1; j += 1
            }
            (sx.doubleValue / cnt, sy.doubleValue / cnt)
          }
          val keep = Array.newBuilder[Int]
          keep += 0
          var aIdx = 0
          var b = 0
          while (b < nBuckets) {
            val (cx, cy) =
              if (b + 1 < nBuckets) centroid(b + 1) else (xs(n - 1), ys(n - 1))
            val ax = xs(aIdx); val ay = ys(aIdx)
            var best = -1; var bestArea = -1.0
            var j = starts(b)
            while (j < starts(b + 1)) {
              val area = math.abs((ax - cx) * (ys(j) - ay) - (ax - xs(j)) * (cy - ay))
              if (area > bestArea) { bestArea = area; best = j }
              j += 1
            }
            if (best >= 0) { keep += best; aIdx = best }
            b += 1
          }
          keep += (n - 1)
          keep.result().iterator.map(j => KeptRow(k, sorted(j).id, ys(j)))
        }
      }.toDF(keyCol, idCol, valueCol)
  }

  /** Two-level trailing-row window: the scale-out formulation of
    * `Window.partitionBy(key).orderBy(ts, id).rowsBetween(-frameRows, 0)`
    * for LOW-CARDINALITY keys. A single-level window on a 5-value key runs
    * at most 5-way parallel no matter how many executors exist; here each
    * key is range-split into time buckets and the frame is stitched across
    * the boundary, so parallelism = |keys| × |buckets| and grows with the
    * corpus time span (the bucket width is the knob).
    *
    * Exactness, for ANY bucket distribution (short buckets, empty buckets):
    *  1. per-(key, bucket) local row_number — parallel small windows;
    *  2. bucket row-counts prefix-summed into each bucket's global start
    *     offset (a window over the TINY per-bucket table);
    *  3. global index g = start + local rank reproduces the single-window
    *     total order;
    *  4. a row is COPIED into every later bucket whose first `frameRows`
    *     rows need it (g ∈ [start₂-frameRows+1, start₂]) via a broadcast
    *     range join against the bucket-boundary table — ≤ frameRows carry
    *     rows per bucket, wherever the frame's tail actually lives;
    *  5. the rolling aggregate runs per (key, bucket) ordered by g over
    *     natives ∪ carries; carry rows complete leading frames and are
    *     dropped from the output.
    *
    * `rollingAgg(valueName, w)` builds the frame aggregate (the value
    * column is exposed under `valueName` so SQL-string aggregates like
    * `percentile` compose).
    *
    * Memory note: the bucket-boundary table is eagerly localCheckpointed
    * (two lazy consumers — the global-index join and the broadcast carry
    * targets) and its blocks stay pinned until the SESSION ends: the
    * returned frame is lazy, so this operator cannot know when the last
    * consumer has run, and releasing a truncated checkpoint earlier would
    * break recomputation. The pin is |keys|×|buckets| rows — tiny by
    * construction. Library callers running many invocations in one
    * session should sweep `sparkContext.getPersistentRDDs` between
    * queries once results are materialized, as Bench/Verify do.
    */
  def bucketedRollingWindow(df: DataFrame, keyCol: String, tsCol: String,
                            idCol: String, valueCol: String, frameRows: Int,
                            bucketWidthMicros: Long,
                            rollingAgg: (String, org.apache.spark.sql.expressions.WindowSpec) => Column,
                            outName: String): DataFrame = {
    require(frameRows >= 1 && bucketWidthMicros >= 1)
    val base = df.select(col(keyCol).as("k"), col(tsCol).as("ts"),
      col(idCol).as("id"), col(valueCol).as("v"),
      floor(unix_micros(col(tsCol)) / bucketWidthMicros).cast("long").as("b"))
    val wLocal = Window.partitionBy("k", "b").orderBy(col("ts"), col("id"))
    val local = base.withColumn("rl", row_number().over(wLocal))
    // bucket boundary table: rows-before-bucket prefix sums. Tiny
    // (|keys|×|buckets|) but read by two consumers below — pin it
    val wBuckets = Window.partitionBy("k").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bounds = local.groupBy("k", "b").agg(count(lit(1)).as("cnt"))
      .withColumn("start", coalesce(sum(col("cnt")).over(wBuckets), lit(0L)))
      .select("k", "b", "start")
      .localCheckpoint(true)
    val glob = local.join(bounds, Seq("k", "b"))
      .withColumn("g", col("start") + col("rl"))
      .select(col("k"), col("b"), col("ts"), col("id"), col("v"), col("g"))
    val targets = bounds.select(col("k").as("k2"), col("b").as("b2"),
      col("start").as("start2"))
    val carries = glob.join(broadcast(targets),
        col("k") === col("k2") && col("b2") > col("b")
          && col("g") >= col("start2") - (frameRows - 1)
          && col("g") <= col("start2"))
      .select(col("k"), col("b2").as("b"), col("ts"), col("id"), col("v"),
        col("g"), lit(true).as("carry"))
    val wRoll = Window.partitionBy("k", "b").orderBy("g")
      .rowsBetween(-frameRows, 0)
    glob.withColumn("carry", lit(false))
      .unionByName(carries)
      .withColumn(outName, rollingAgg("v", wRoll))
      .filter(!col("carry"))
      .select(col("k").as(keyCol), col("ts").as(tsCol), col("id").as(idCol),
        col("v").as(valueCol), col(outName))
  }

  /** Per-key z-score anomaly counts against the key's GLOBAL mean/stddev,
    * both derived from exact decimal sums (Σx, Σx²) so every engine/layout
    * computes bit-identical statistics; the per-row flag then joins the
    * (tiny) stats back — broadcast at any scale.
    */
  def zscoreAnomalies(df: DataFrame, keyCol: String, valueCol: String,
                      zCut: Double): DataFrame = {
    val v = col(valueCol)
    val stats = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), dsum(v).as("s1"), dsum(v * v).as("s2"))
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("std",
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)))
    df.join(broadcast(stats), keyCol)
      .groupBy(col(keyCol))
      // std > 0 guard: a single-row or zero-variance key divides by zero,
      // where engines disagree (Spark non-ANSI → NULL, IEEE floats → inf);
      // pin the semantics to "no anomalies without spread" on both sides
      .agg(min(col("n")).as("n"),
           sum(when(col("std") > 0 && abs(v - col("mean")) / col("std") > zCut,
             1L).otherwise(0L)).as("n_anomalies"),
           round(min(col("mean")), 6).as("mean"),
           round(min(col("std")), 6).as("std"))
  }
}
