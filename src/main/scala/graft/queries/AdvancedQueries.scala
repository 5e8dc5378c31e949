package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.ops.AsOfJoin
import graft.util.OracleSafe._

/** Second-wave relational coverage: grouping sets, analytic window family,
  * exact percentiles, array-function family, native session windows,
  * tolerance as-of joins, sketch aggregates.
  */
object AdvancedQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- explicit grouping sets ----
    QueryDef("q44_grouping_sets",
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
        s.sql(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          |CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty
          |FROM lineitem_v
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
      },
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // ---- analytic window family ----
    QueryDef("q45_window_analytics",
      (s, dir) => {
        val w = Window.partitionBy("o_orderstatus")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        val rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"),
            lead("o_totalprice", 1).over(w).as("next_price"),
            first_value(col("o_orderkey")).over(rows).as("top_key"))
          .orderBy("o_orderstatus", "pct_rank", "o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
        |CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
        |PERCENT_RANK() OVER w AS pct_rank,
        |CUME_DIST() OVER w AS cume,
        |LEAD(o_totalprice, 1) OVER w AS next_price,
        |FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice DESC, o_orderkey ASC
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_orderstatus, pct_rank, o_orderkey""".stripMargin)),

    // ---- exact percentiles / median ----
    QueryDef("q46_percentiles",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        // p = 0.5/0.25/0.75 have exact-binary interpolation fractions, so
        // both engines emit identical doubles; 0.9 does NOT — DuckDB's
        // (1-f)·a + f·b carries fp noise even on tie groups (the measured
        // q158 10x trap), so the p90 is round-6 guarded on both sides
        // (discount is 2-decimal; the interpolated value has <= 3
        // decimals, so round 6 is lossless there)
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
             expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
             expr("percentile(l_extendedprice, 0.75)").as("p75_price"),
             round(expr("percentile(l_discount, 0.9)"), 6).as("p90_disc"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |quantile_cont(l_quantity, 0.5) AS median_qty,
        |quantile_cont(l_extendedprice, 0.25) AS p25_price,
        |quantile_cont(l_extendedprice, 0.75) AS p75_price,
        |round(quantile_cont(l_discount, 0.9), 6) AS p90_disc
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // ---- array function family (scalar outputs for oracle parity) ----
    QueryDef("q47_array_functions",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val uniq = array_sort(array_distinct(toks))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(uniq).as("n_uniq"),
            array_join(slice(uniq, 1, 3), ",").as("first3"),
            array_contains(toks, "the").as("has_the"),
            size(array_intersect(uniq, array(lit("the"), lit("a"), lit("key")))).as("n_stopish"),
            element_at(uniq, -1).as("last_uniq"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
        |CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq,
        |array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 3), ',') AS first3,
        |list_contains(string_split(text, ' '), 'the') AS has_the,
        |CAST(len(list_intersect(list_distinct(string_split(text, ' ')), ['the', 'a', 'key'])) AS INTEGER) AS n_stopish,
        |list_sort(list_distinct(string_split(text, ' ')))[-1] AS last_uniq
        |FROM documents
        |ORDER BY doc_id""".stripMargin)),

    // ---- native session windows (batch mode; streaming analog is q43) ----
    QueryDef("q48_session_window",
      (s, dir) => Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), davg(col("value")).as("avg_value"))
        .select(col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("user_id"), col("n_events"), col("avg_value"))
        .orderBy("user_id", "session_start"),
      Some(s"""WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN LAG(ts, 1) OVER w IS NULL
        |           OR epoch(ts) - epoch(LAG(ts, 1) OVER w) >= 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), sessions AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  user_id, COUNT(*) AS n_events, ${sqlDavg("value")} AS avg_value
        |FROM sessions
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin)),

    // ---- as-of join with lookback tolerance (pandas merge_asof semantics) ----
    QueryDef("q49_asof_tolerance",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
          .select(col("o_custkey").as("user_id"), col("o_orderdate"),
            col("o_orderkey"), col("o_totalprice"))
        val events = Tables.events(s, dir).select("user_id", "ts", "event_id")
        AsOfJoin.leftAsOf(events, orders, "user_id", "ts", "o_orderdate",
            payload = Seq("o_orderkey", "o_totalprice"), tieBreak = "o_orderkey",
            tolerance = Some(expr("INTERVAL 10000 DAYS")))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_o_orderkey").as("last_orderkey"),
            col("asof_o_totalprice").as("last_totalprice"))
          .orderBy("event_id")
      },
      Some("""WITH o AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |          ORDER BY o_orderkey DESC) AS rd FROM orders)
        |  WHERE rd = 1)
        |SELECT e.event_id, e.user_id, e.ts,
        |  CASE WHEN o.o_orderdate >= e.ts - INTERVAL 10000 DAY THEN o.o_orderkey END AS last_orderkey,
        |  CASE WHEN o.o_orderdate >= e.ts - INTERVAL 10000 DAY THEN o.o_totalprice END AS last_totalprice
        |FROM events e
        |ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY event_id""".stripMargin)),

    // ---- IVF coarse-quantized ANN (deterministic quantizer -> exact oracle) ----
    QueryDef("q51_ivf_ann_topk",
      (s, dir) => graft.ext.Similarity
        .ivfTopK(Tables.embeddings(s, dir), nCentroids = 8, k = 3,
          queryPred = col("vec_id") % 50 === 0)
        .orderBy("qid", "rn"),
      Some {
        val cos = (a: String, b: String) =>
          s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
          |assigned AS (
          |  SELECT vec_id, cid AS cell, v FROM (
          |    SELECT e.vec_id, c.cid, e.v,
          |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
          |        ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid ASC) AS crn
          |    FROM e CROSS JOIN c)
          |  WHERE crn = 1),
          |scored AS (
          |  SELECT q.vec_id AS qid, n.vec_id AS nid, ${cos("q.v", "n.v")} AS cos
          |  FROM assigned q JOIN assigned n ON q.cell = n.cell
          |  WHERE q.vec_id % 50 = 0 AND n.vec_id <> q.vec_id),
          |ranked AS (SELECT qid, nid, cos,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS INTEGER) AS rn
          |  FROM scored)
          |SELECT qid, rn, nid, cos FROM ranked WHERE rn <= 3
          |ORDER BY qid, rn""".stripMargin
      }),

    // ---- skew-safe salted aggregation (identical results to plain groupBy) ----
    QueryDef("q52_salted_agg",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val out = graft.ops.Salt.saltedAgg(Tables.events(s, dir), col("event_type"), buckets = 16,
          aggs = Seq(
            ("sum_dec", sum(col("value").cast(DecimalType(27, 6))), sum(col("sum_dec"))),
            ("n", count(lit(1)), sum(col("n"))),
            ("min_v", min(col("value")), min(col("min_v"))),
            ("max_v", max(col("value")), max(col("max_v")))))
        out.select(col("__k").as("event_type"),
            col("sum_dec").cast("double").as("sum_value"),
            col("n"), col("min_v"), col("max_v"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, ${sqlDsum("value")} AS sum_value,
        |COUNT(*) AS n, min(value) AS min_v, max(value) AS max_v
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // ---- typed Aggregator (custom UDAF surface), exact-decimal buffer ----
    QueryDef("q54_typed_aggregator",
      (s, dir) => {
        import s.implicits._
        val wm = udaf(graft.functions.TypedAggregators.WeightedMean)
        Tables.events(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("double") + 1.0)
          .groupBy("event_type")
          .agg(wm(col("value"), col("k")).as("weighted_mean_value"),
               count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
        |(CAST(SUM(CAST(value * (CAST(json_extract_string(props, '$.k') AS DOUBLE) + 1.0) AS DECIMAL(27,6))) AS DOUBLE)
        | / CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS DOUBLE) + 1.0 AS DECIMAL(27,6))) AS DOUBLE)) AS weighted_mean_value,
        |COUNT(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // ---- interval (range) join: orders within a lookback window per event ----
    // key equality blocks the pair space; the range predicate prunes within
    // the block -- the scalable shape for range joins (no cross product).
    QueryDef("q55_interval_join",
      (s, dir) => {
        val e = Tables.events(s, dir).select("event_id", "user_id", "ts")
        val o = Tables.orders(s, dir).select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        e.join(o, col("user_id") === col("o_custkey")
            && col("o_orderdate") >= col("ts") - expr("INTERVAL 10000 DAYS")
            && col("o_orderdate") <= col("ts"), "left")
          .groupBy("event_id", "user_id")
          .agg(count(col("o_orderdate")).as("n_orders"),
               dsum(coalesce(col("o_totalprice"), lit(0.0))).as("sum_spend"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id,
        |COUNT(o_orderdate) AS n_orders,
        |${sqlDsum("COALESCE(o_totalprice, 0.0)")} AS sum_spend
        |FROM events e LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey
        |  AND o.o_orderdate >= e.ts - INTERVAL 10000 DAY
        |  AND o.o_orderdate <= e.ts
        |GROUP BY event_id, user_id
        |ORDER BY event_id""".stripMargin)),

    // ---- distinct-count sketch: deterministic KMV (k minimum values) ----
    // The mergeable-sketch story at scale, now AS an aggregate: kmin_hashes
    // (functions/KMinHashAgg.scala) keeps the k smallest distinct stable
    // hashes per group in an O(k) partial and merges by re-min, so the only
    // shuffle is a hash-agg on l_returnflag carrying ≤k longs per group —
    // no global distinct, no window sort (the former row_number formulation
    // sorted every distinct hash through |groups| window partitions).
    // md5-derived 48-bit hashes are exactly reproducible in the DuckDB
    // oracle (which keeps the rank-≤-k relational phrasing), unlike engine-
    // specific HLL registers (approx_count_distinct stays spec-only).
    QueryDef("q50_sketches",
      (s, dir) => {
        val k = 64
        val h = graft.util.StableHash.h48(col("l_partkey"))
        val kmv = Tables.lineitem(s, dir)
          .select(col("l_returnflag"), h.as("h"))
          .groupBy("l_returnflag")
          .agg(graft.functions.KMinHashAgg.kminHashes(col("h"), k).as("ks"))
          .select(col("l_returnflag"),
            size(col("ks")).cast("long").as("kmv_k"),
            element_at(col("ks"), -1).as("kth"))
          .withColumn("kmv_est",
            when(col("kmv_k") < k, col("kmv_k").cast("double"))
              .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 48)) / col("kth").cast("double")))
        val exact = Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("n_exact"))
        exact.join(kmv, "l_returnflag")
          .select("l_returnflag", "n_exact", "kmv_k", "kmv_est")
          .orderBy("l_returnflag")
      },
      Some(s"""WITH h AS (
        |  SELECT DISTINCT l_returnflag,
        |    ${graft.util.StableHash.sql48("l_partkey")} AS h
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, h,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn FROM h),
        |kmv AS (
        |  SELECT l_returnflag, COUNT(*) AS kmv_k, MAX(h) AS kth
        |  FROM r WHERE rn <= 64 GROUP BY 1),
        |ex AS (
        |  SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_exact
        |  FROM lineitem GROUP BY 1)
        |SELECT ex.l_returnflag, n_exact, CAST(kmv_k AS BIGINT) AS kmv_k,
        |  CASE WHEN kmv_k < 64 THEN CAST(kmv_k AS DOUBLE)
        |       ELSE CAST(63 AS DOUBLE) * CAST(281474976710656 AS DOUBLE) / CAST(kth AS DOUBLE) END AS kmv_est
        |FROM ex JOIN kmv USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin)),

    // ---- rolling median (order statistic over a sliding row frame) ----
    // percentile() as a WINDOW aggregate: exact order statistics per
    // 10-row trailing frame, per key — the robust-smoothing counterpart of
    // the mean-based windows in q23/q45. The key has ~5 distinct values, so
    // a plain partitionBy(event_type) window caps parallelism at 5
    // regardless of cluster size; this runs the TWO-LEVEL formulation
    // (TimeSeriesOps.bucketedRollingWindow): daily time-buckets within each
    // key, frames stitched across bucket boundaries by carrying ≤9 rows —
    // hash-checked here against the oracle's single-window phrasing, so the
    // stitching is proven exact, not assumed.
    QueryDef("q102_rolling_median",
      (s, dir) => {
        graft.ops.TimeSeriesOps.bucketedRollingWindow(
            Tables.events(s, dir), "event_type", "ts", "event_id", "value",
            frameRows = 9, bucketWidthMicros = 86400000000L,
            rollingAgg = (v, w) =>
              round(expr(s"percentile($v, 0.5)").over(w), 6),
            outName = "rolling_median")
          .select("event_type", "event_id", "rolling_median")
          .orderBy("event_type", "event_id")
      },
      Some("""SELECT event_type, event_id,
        |  round(quantile_cont(value, 0.5) OVER (
        |    PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS rolling_median
        |FROM events
        |ORDER BY event_type, event_id""".stripMargin)),

    // ---- quantile sketch (approx_percentile, Greenwald-Khanna) ----
    // Completes the sketch family (KMV distinct q50, count-min q84, HLL
    // q98): bounded-memory quantiles with an explicit accuracy knob,
    // mergeable across partitions. GK summaries are engine-specific, so no
    // cross-engine oracle (rows-only check); QuantileSketchSpec pins the
    // estimates inside the 1/accuracy rank-error bound against exact
    // percentiles.
    QueryDef("q107_quantile_sketch",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
             expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 10000)")
               .as("approx_quartiles"))
        .select(col("l_returnflag"), col("n"),
          element_at(col("approx_quartiles"), 1).as("p25"),
          element_at(col("approx_quartiles"), 2).as("p50"),
          element_at(col("approx_quartiles"), 3).as("p75"))
        .orderBy("l_returnflag"),
      None),

    // ---- winsorization (percentile clamping) ----
    // The outlier-capping cleanup step: clamp each event's value to its
    // event-type's [p05, p95] band, then report how many rows hit each cap
    // and the winsorized mean. Bounds are NEAREST-RANK (type-1)
    // percentiles — the value at integer rank ceil(p·n), derived from a
    // per-type value census with pure-integer rank arithmetic
    // ((n+19) div 20 and (19n+19) div 20), so both engines pick an ACTUAL
    // data value and every clamp comparison is exact. Interpolated
    // quantile_cont bounds are a measured 10x trap: DuckDB evaluates
    // (1-f)·a + f·b, which carries fp noise even when a == b (observed
    // lo = 2.5200000000000005 against Spark's exact 2.52), silently
    // flipping every row that sits exactly at the bound — 50 rows at the
    // 10x corpus. Rank-based bounds make the whole query integer-decided;
    // the mean still goes through dsum. Scale shape: the census is one
    // hash-agg shuffle (bounded by the 2-decimal value domain), the
    // per-type window runs over census rows (not the corpus), and the
    // 5-row bounds broadcast back.
    QueryDef("q158_winsorized_stats",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir).select("event_type", "value")
        val census = ev.groupBy("event_type", "value")
          .agg(count(lit(1)).as("c"))
        val byType = Window.partitionBy("event_type")
        val cum = census
          .withColumn("cum", sum("c").over(byType.orderBy("value")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", sum("c").over(byType))
        val bounds = cum
          .withColumn("k_lo", expr("(n + 19) div 20"))      // ceil(0.05 n), int
          .withColumn("k_hi", expr("(n * 19 + 19) div 20")) // ceil(0.95 n), int
          .groupBy("event_type")
          .agg(min(when(col("cum") >= col("k_lo"), col("value"))).as("lo"),
               min(when(col("cum") >= col("k_hi"), col("value"))).as("hi"))
        ev.join(broadcast(bounds), "event_type")
          .select(col("event_type"),
            least(greatest(col("value"), col("lo")), col("hi")).as("wv"),
            (col("value") < col("lo")).cast("long").as("clip_lo"),
            (col("value") > col("hi")).cast("long").as("clip_hi"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum("clip_lo").as("n_clip_lo"), sum("clip_hi").as("n_clip_hi"),
            davg(col("wv")).as("winsorized_mean"))
          .orderBy("event_type")
      },
      Some(s"""WITH census AS (
        |  SELECT event_type, value, COUNT(*) AS c
        |  FROM events GROUP BY event_type, value),
        |cum AS (
        |  SELECT event_type, value,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(c) OVER (PARTITION BY event_type) AS n
        |  FROM census),
        |bounds AS (
        |  SELECT event_type,
        |    MIN(CASE WHEN cum >= (n + 19) // 20 THEN value END) AS lo,
        |    MIN(CASE WHEN cum >= (n * 19 + 19) // 20 THEN value END) AS hi
        |  FROM cum GROUP BY event_type),
        |w AS (
        |  SELECT e.event_type,
        |    least(greatest(e.value, b.lo), b.hi) AS wv,
        |    CASE WHEN e.value < b.lo THEN 1 ELSE 0 END AS clip_lo,
        |    CASE WHEN e.value > b.hi THEN 1 ELSE 0 END AS clip_hi
        |  FROM events e JOIN bounds b ON e.event_type = b.event_type)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(clip_lo) AS BIGINT) AS n_clip_lo,
        |  CAST(SUM(clip_hi) AS BIGINT) AS n_clip_hi,
        |  ${sqlDavg("wv")} AS winsorized_mean
        |FROM w
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // ---- weighted median per group (quantity-weighted price) ----
    // The robust mid-price where each row counts `l_quantity` times:
    // integer cumulative weights over the price-ordered partition, first
    // price where 2·cumw ≥ total weight. The crossing PRICE is tie-order
    // independent (all rows in a price tie share the value), so no
    // artificial tie-break is needed and the result is engine-exact —
    // every quantity is a whole number recovered as an exact integer.
    QueryDef("q184_weighted_median",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val x = Tables.lineitem(s, dir).select(
          col("l_returnflag").as("flag"),
          floor(col("l_extendedprice") * 100d + 0.5d).cast("long")
            .as("price_c"),
          floor(col("l_quantity") + 0.5d).cast("long").as("w"))
        val byFlag = Window.partitionBy("flag")
        val c = x.select(col("flag"), col("price_c"),
          sum("w").over(byFlag.orderBy("price_c")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("cumw"),
          sum("w").over(byFlag).as("totw"))
        c.groupBy("flag")
          .agg(max("totw").as("total_weight"),
            min(when(lit(2) * col("cumw") >= col("totw"), col("price_c")))
              .as("wmedian_c"))
          .orderBy("flag")
      },
      Some("""WITH x AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE))
        |      AS BIGINT) AS price_c,
        |    CAST(floor(l_quantity + CAST(0.5 AS DOUBLE)) AS BIGINT) AS w
        |  FROM lineitem),
        |c AS (
        |  SELECT flag, price_c,
        |    SUM(w) OVER (PARTITION BY flag ORDER BY price_c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    SUM(w) OVER (PARTITION BY flag) AS totw
        |  FROM x)
        |SELECT flag, CAST(MAX(totw) AS BIGINT) AS total_weight,
        |  MIN(CASE WHEN 2 * cumw >= totw THEN price_c END) AS wmedian_c
        |FROM c GROUP BY flag
        |ORDER BY flag""".stripMargin)),

    // ---- SLA percentile report (p50/p90/p99 per stream) ----
    // The latency-dashboard primitive: exact interpolated percentiles
    // per group from ONE percentile buffer per group (a single
    // array-argument aggregate, not three separate full-column
    // collects). Spark's percentile() and DuckDB's quantile_cont share
    // the linear-interpolation definition but NOT its fp evaluation
    // order (the measured q158 10x trap); round 6 absorbs that noise
    // losslessly here (2-decimal values → <= 3-decimal interpolations)
    // and nothing compares against the bound. At extreme group
    // cardinality the same report comes from mergeable quantile sketches
    // (q107's path) — this is the exact form.
    QueryDef("q192_sla_percentiles",
      (s, dir) => Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          expr("percentile(value, array(0.50, 0.90, 0.99))").as("ps"))
        .select(col("event_type"), col("n"),
          round(element_at(col("ps"), 1), 6).as("p50"),
          round(element_at(col("ps"), 2), 6).as("p90"),
          round(element_at(col("ps"), 3), 6).as("p99"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS n,
        |  round(quantile_cont(value, 0.50), 6) AS p50,
        |  round(quantile_cont(value, 0.90), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin))
  )
}
