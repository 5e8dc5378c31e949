package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.ops.{CoreOps, FilterConfig}
import graft.util.OracleSafe._

/** The events table is the reading-stream analog (FIXTURES.md §B):
  * event_type ≈ asset key, value ≈ datapoint, props ≈ JSON payload. These
  * queries re-express the reference's own computations (E1 scale/offset, E4
  * allowlist — SURVEY.md §2.2) plus the time-series surface the reference
  * leaves script-expressible: tumbling/sliding windows, sessionization,
  * as-of enrichment joins, JSON extraction.
  */
object EventQueries {

  private val cfg = FilterConfig() // reference defaults scale=5, offset=10
  private val allowedAssets = Seq("view", "click", "purchase")

  val defs: Seq[QueryDef] = Seq(

    // ---- flagship: E1 affine + E4 allowlist + tumbling 1h aggregate ----
    QueryDef("q18_scale_offset_hourly",
      (s, dir) => Tables.events(s, dir)
        .transform(CoreOps.guarded(cfg, df =>
          df.transform(CoreOps.scaleOffset(Seq("value"), cfg.scale, cfg.offset))
            .transform(CoreOps.assetFilter("event_type", allowedAssets))))
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(davg(col("value")).as("avg_scaled"),
             dsum(col("value")).as("sum_scaled"),
             count(lit(1)).as("n"))
        .orderBy("hour", "event_type"),
      Some(s"""SELECT date_trunc('hour', ts) AS hour, event_type,
        |${sqlDavg("value * 5.0 + 10.0")} AS avg_scaled,
        |${sqlDsum("value * 5.0 + 10.0")} AS sum_scaled,
        |COUNT(*) AS n
        |FROM events
        |WHERE event_type IN ('view', 'click', 'purchase')
        |GROUP BY 1, 2
        |ORDER BY hour, event_type""".stripMargin)),

    // ---- E2 add-constant + per-asset stats (readings35.py semantics) ----
    QueryDef("q19_add_constant_stats",
      (s, dir) => Tables.events(s, dir)
        .transform(CoreOps.addConstant(Seq("value"), cfg.addend))
        .groupBy("event_type")
        .agg(min(col("value")).as("min_v"), max(col("value")).as("max_v"),
             davg(col("value")).as("avg_v"), count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some(s"""SELECT event_type,
        |min(value + 100.0) AS min_v, max(value + 100.0) AS max_v,
        |${sqlDavg("value + 100.0")} AS avg_v, COUNT(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // ---- JSON datapoint extraction (props ≈ the reference's JSON config/payload) ----
    QueryDef("q20_json_extract_props",
      (s, dir) => Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), davg(col("k")).as("avg_k"),
             countDistinct(col("k")).as("n_distinct_k"), count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
        |CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |(CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(25,10))) AS DOUBLE) / COUNT(*)) AS avg_k,
        |COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k,
        |COUNT(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // ---- sessionization: 30-min-gap sessions via analytic windows ----
    QueryDef("q21_sessionize_users",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, dir)
          .withColumn("prev_ts", lag("ts", 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull
              || col("ts").cast("double") - col("prev_ts").cast("double") > 1800, 1).otherwise(0))
          .withColumn("session_id", sum("new_session").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
               min(col("ts")).as("session_start"),
               max(col("ts")).as("session_end"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN LAG(ts, 1) OVER w IS NULL
        |           OR epoch(ts) - epoch(LAG(ts, 1) OVER w) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), sessions AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin)),

    // ---- as-of join: latest order at or before each event, per user ----
    // Spark lacks a native as-of join; the scalable pattern is the
    // union-merge: tag both sides, one shuffle on the key, one ordered
    // window pass carrying the last order attributes forward
    // (no per-row subquery, no range explosion).
    QueryDef("q22_asof_join_last_order",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
          .select(col("o_custkey").as("user_id"), col("o_orderdate"),
            col("o_orderkey"), col("o_totalprice"))
        val events = Tables.events(s, dir).select("user_id", "ts", "event_id")
        graft.ops.AsOfJoin.leftAsOf(events, orders, "user_id", "ts", "o_orderdate",
            payload = Seq("o_orderkey", "o_totalprice"), tieBreak = "o_orderkey")
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
        |  o.o_orderkey AS last_orderkey, o.o_totalprice AS last_totalprice
        |FROM events e
        |ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY event_id""".stripMargin)),

    // ---- sliding windows (1h window, 30m slide), epoch-aligned like Spark's window() ----
    QueryDef("q23_sliding_window_value",
      (s, dir) => Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), davg(col("value")).as("avg_value"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("avg_value"))
        .orderBy("win_start", "event_type"),
      Some(s"""WITH slid AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS win_start, event_type, value FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type, value FROM events)
        |SELECT win_start, event_type, COUNT(*) AS n, ${sqlDavg("value")} AS avg_value
        |FROM slid
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin)),

    // ---- scalar subquery: events above the global mean value ----
    QueryDef("q24_above_global_mean",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val mean = e.agg(davg(col("value")).as("mean_v"))
        e.crossJoin(broadcast(mean))
          .filter(col("value") > col("mean_v"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_above"), max(col("value")).as("max_v"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, COUNT(*) AS n_above, max(value) AS max_v
        |FROM events
        |WHERE value > (SELECT ${sqlDavg("value")} FROM events)
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // ---- variant-map datapoint ops: drop / rename / add (map HOF family) ----
    // the reference's script dict surgery (delete a key, rename a key, add a
    // synthesized key — python35_filter.cpp:180-217) on the faithful dynamic
    // map: map_filter + transform_keys + map_concat, then exploded flat.
    QueryDef("q75_map_datapoint_ops",
      (s, dir) => {
        val readings = graft.model.Reading.fromEvents(Tables.events(s, dir)).toDF()
        val plusOne = struct(
          lit(null).cast("long").as("longV"),
          (element_at(col("reading"), "value").getField("doubleV") + 1.0).as("doubleV"),
          lit(null).cast("string").as("stringV"))
        readings
          .transform(CoreOps.addDatapointMap("val_plus", plusOne))
          .transform(CoreOps.dropDatapointMap("user_id"))
          .transform(CoreOps.renameDatapointMap("value", "val"))
          .select(col("id").as("event_id"),
            explode(col("reading")).as(Seq("dp_name", "dp_value")))
          .select(col("event_id"), col("dp_name"),
            coalesce(col("dp_value.doubleV"),
                     col("dp_value.longV").cast("double")).as("dp_num"))
          .orderBy("event_id", "dp_name")
      },
      Some("""WITH exploded AS (
        |  SELECT event_id, 'val' AS dp_name, value AS dp_num FROM events
        |  UNION ALL
        |  SELECT event_id, 'val_plus', value + 1.0 FROM events)
        |SELECT event_id, dp_name, dp_num
        |FROM exploded
        |ORDER BY event_id, dp_name""".stripMargin)),

    // ---- permissive decode: corrupt-record routing (O6 validation path) ----
    // The reference rejects a whole batch when one element is malformed
    // (python35_filter.cpp:142-173); the Spark-native analog is per-row
    // routing: from_json in PERMISSIVE mode lands bad rows in a corrupt-
    // record column instead of failing the batch — strictly finer-grained.
    // A deterministic 10% of payloads are mangled to exercise the path.
    QueryDef("q71_permissive_decode",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val raw = when(col("event_id") % 10 === 0,
          concat(substring(col("props"), 1, 3), lit("x"))).otherwise(col("props"))
        val schema = StructType(Seq(
          StructField("k", LongType), StructField("_corrupt", StringType)))
        // n_valid / n_corrupt count ONE shared predicate — "k extracted as a
        // BIGINT" — so engine and oracle agree for valid-JSON-but-missing-k
        // and malformed-k shapes that previously diverged (engine counted
        // parsed.k, oracle counted json_valid(raw)). Sole remaining edge:
        // a QUOTED number ("k":"7") — from_json is strict (corrupt) while
        // TRY_CAST coerces; the corpus's k is always a bare JSON number.
        Tables.events(s, dir)
          .withColumn("parsed",
            from_json(raw, schema, Map("columnNameOfCorruptRecord" -> "_corrupt")))
          .groupBy("event_type")
          .agg(sum(when(col("parsed.k").isNull, 1L).otherwise(0L)).as("n_corrupt"),
               count(col("parsed.k")).as("n_valid"),
               sum(col("parsed.k")).as("sum_k"))
          .orderBy("event_type")
      },
      Some("""WITH r AS (
        |  SELECT event_type,
        |    CASE WHEN json_valid(CASE WHEN event_id % 10 = 0
        |                         THEN substr(props, 1, 3) || 'x' ELSE props END)
        |         THEN TRY_CAST(json_extract_string(
        |                CASE WHEN event_id % 10 = 0
        |                THEN substr(props, 1, 3) || 'x' ELSE props END, '$.k') AS BIGINT)
        |    END AS k
        |  FROM events)
        |SELECT event_type,
        |  COUNT(CASE WHEN k IS NULL THEN 1 END) AS n_corrupt,
        |  COUNT(k) AS n_valid,
        |  CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM r
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // ---- variant-map Reading model round-trip: faithful mode transform ----
    // events → Dataset[Reading] (dynamic map) → scaleOffsetMap (E1 on every
    // numeric datapoint, transform_values) → explode back to rows.
    QueryDef("q25_reading_map_roundtrip",
      (s, dir) => {
        val readings = graft.model.Reading.fromEvents(Tables.events(s, dir)).toDF()
        readings
          .transform(CoreOps.scaleOffsetMap(cfg.scale, cfg.offset))
          .transform(CoreOps.dropEmptyReadings)
          .select(col("id").as("event_id"), col("assetCode").as("event_type"),
            explode(col("reading")).as(Seq("dp_name", "dp_value")))
          .select(col("event_id"), col("event_type"), col("dp_name"),
            coalesce(col("dp_value.doubleV"),
                     col("dp_value.longV").cast("double")).as("dp_num"))
          .orderBy("event_id", "dp_name")
      },
      Some("""WITH exploded AS (
        |  SELECT event_id, event_type, 'user_id' AS dp_name,
        |    CAST(CAST(user_id AS BIGINT) * 5 + 10 AS DOUBLE) AS dp_num FROM events
        |  UNION ALL
        |  SELECT event_id, event_type, 'value', value * 5.0 + 10.0 FROM events)
        |SELECT event_id, event_type, dp_name, dp_num
        |FROM exploded
        |ORDER BY event_id, dp_name""".stripMargin)),

    // ---- expression filter: config-supplied formula + predicate strings ----
    // The reference's script surface computes arbitrary per-reading formulas
    // (plugin.cpp:285-287); here the user's expression STRING compiles into
    // the Catalyst plan (codegen'd, optimizer-visible) instead of running
    // interpreted per row.
    QueryDef("q96_expression_filter",
      (s, dir) => Tables.events(s, dir)
        .transform(CoreOps.exprDatapoint("derived", "value * 2.5 + 10.0"))
        .transform(CoreOps.exprFilter("derived > 500.0 AND event_type <> 'error'"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), dsum(col("derived")).as("sum_derived"))
        .orderBy("event_type"),
      Some(s"""SELECT event_type, COUNT(*) AS n,
        |${sqlDsum("value * 2.5 + 10.0")} AS sum_derived
        |FROM events
        |WHERE value * 2.5 + 10.0 > 500.0 AND event_type <> 'error'
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // ---- asset rename + denylist (asset-filter ops on the stream key) ----
    QueryDef("q97_asset_rename",
      (s, dir) => Tables.events(s, dir)
        .transform(CoreOps.assetRename("event_type",
          Map("view" -> "pageview", "click" -> "tap")))
        .transform(CoreOps.assetExclude("event_type", Seq("error")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type"),
      Some("""SELECT CASE event_type WHEN 'view' THEN 'pageview'
        |                            WHEN 'click' THEN 'tap'
        |                            ELSE event_type END AS event_type,
        |  COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE event_type <> 'error'
        |GROUP BY 1
        |ORDER BY event_type""".stripMargin)),

    // ---- VARIANT-typed semi-structured payloads ----
    // The reference's `reading` dict is schemaless (SURVEY.md §1.2); besides
    // the map/struct encodings (q25) and from_json (q20/q71), Spark 4's
    // VARIANT type covers the same surface with a binary-encoded dynamic
    // value: parse once, extract typed paths lazily — no schema declared,
    // columnar-friendly at scale.
    QueryDef("q105_variant_props",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "long").as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k"),
             min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type"),
      Some("""WITH r AS (
        |  SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, COUNT(k) AS n_k, CAST(SUM(k) AS BIGINT) AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM r
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // ---- funnel conversion (view → click → purchase within 1 h each) ----
    // The product-analytics staged-conversion count: per user, the first
    // view, the first click within the HOUR after it, the first purchase
    // within the hour after that; users are bucketed by how deep they got.
    // Three conditional min-aggregates chained by broadcast-sized joins —
    // no window over the event log, and all comparisons are exact
    // timestamp ordering (no floats anywhere).
    QueryDef("q136_funnel",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val hour = expr("INTERVAL 1 HOUR")
        val v = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts")).as("vt"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, "user_id")
          .filter(col("ts") > col("vt") && col("ts") <= col("vt") + hour)
          .groupBy("user_id").agg(min(col("ts")).as("ct"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, "user_id")
          .filter(col("ts") > col("ct") && col("ts") <= col("ct") + hour)
          .groupBy("user_id").agg(min(col("ts")).as("pt"))
        val staged = ev.select("user_id").distinct()
          .join(v, Seq("user_id"), "left")
          .join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("pt").isNotNull, 3L).when(col("ct").isNotNull, 2L)
              .when(col("vt").isNotNull, 1L).otherwise(0L).as("stage"))
        staged.groupBy("stage").agg(count(lit(1)).as("n_users"))
          .orderBy("stage")
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS vt FROM events
        |       WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS ct
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.vt
        |        AND e.ts <= v.vt + INTERVAL 1 HOUR GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS pt
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.ct
        |        AND e.ts <= c.ct + INTERVAL 1 HOUR GROUP BY e.user_id),
        |staged AS (
        |  SELECT u.user_id,
        |    CASE WHEN p.pt IS NOT NULL THEN 3 WHEN c.ct IS NOT NULL THEN 2
        |         WHEN v.vt IS NOT NULL THEN 1 ELSE 0 END AS stage
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  LEFT JOIN v ON u.user_id = v.user_id
        |  LEFT JOIN c ON u.user_id = c.user_id
        |  LEFT JOIN p ON u.user_id = p.user_id)
        |SELECT CAST(stage AS BIGINT) AS stage, COUNT(*) AS n_users
        |FROM staged
        |GROUP BY stage
        |ORDER BY stage""".stripMargin)),

    // ---- Shannon entropy of the event-type mix per user ----
    // Behavioral-diversity scoring (a data-curation signal): H = ln n −
    // (Σ c·ln c)/n over the user's per-type counts — the count-based
    // rearrangement avoids forming p = c/n per term. Two hash aggregates;
    // the Σ c·ln c accumulates through the decimal recipe so layout never
    // changes the sum, and the one libm call per term is rounded away at
    // 6 dp on both engines.
    QueryDef("q137_type_entropy",
      (s, dir) => Tables.events(s, dir)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_types"),
          dsum(col("c") * log(col("c"))).as("slc"))
        .select(col("user_id"), col("n"), col("n_types"),
          round(log(col("n")) - col("slc") / col("n"), 6).as("entropy"))
        .orderBy("user_id"),
      Some(s"""WITH counts AS (
        |  SELECT user_id, event_type, COUNT(*) AS c
        |  FROM events GROUP BY user_id, event_type),
        |agg AS (
        |  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_types,
        |    ${sqlDsum("c * ln(c)")} AS slc
        |  FROM counts GROUP BY user_id)
        |SELECT user_id, n, n_types, round(ln(n) - slc / n, 6) AS entropy
        |FROM agg
        |ORDER BY user_id""".stripMargin)),

    // ---- first-order Markov transitions over the event-type sequence ----
    // Per-user behavioral model: P(next type | current type) from adjacent
    // pairs in (ts, event_id) order — one keyed window for the LEAD, one
    // hash aggregate for pair counts, row-count division for probabilities
    // (exact integers → identical doubles). The per-key sequencing never
    // materializes the |types|² matrix, only observed transitions.
    QueryDef("q142_markov_transitions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val pairs = Tables.events(s, dir)
          .select(col("user_id"), col("event_type").as("from_type"),
            lead("event_type", 1).over(w).as("to_type"))
          .filter(col("to_type").isNotNull)
        val counts = pairs.groupBy("from_type", "to_type")
          .agg(count(lit(1)).as("n"))
        counts
          .withColumn("from_total",
            sum(col("n")).over(Window.partitionBy("from_type")))
          .select(col("from_type"), col("to_type"), col("n"),
            round(col("n") / col("from_total"), 6).as("prob"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH pairs AS (
        |  SELECT user_id, event_type AS from_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n FROM pairs
        |      WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE)
        |        / SUM(n) OVER (PARTITION BY from_type), 6) AS prob
        |FROM c
        |ORDER BY from_type, to_type""".stripMargin)),

    // ---- interval-overlap join (sessions × busy hours, banded) ----
    // Which of each user's sessions overlap a "busy" hour (hourly event
    // count 20% above the corpus mean — the threshold is the exact integer
    // cross-multiply 5·n·n_hours > 6·total, so no float ever enters the
    // interval set)? The interval×interval join runs BANDED: each session
    // explodes into the hour grid it covers (bounded by session length)
    // and joins busy hours by EQUALITY — for hour-aligned right intervals
    // the equality on covered hours IS the overlap predicate, so the plan
    // is a plain hash join at any scale, never an |A|×|B| theta join. The
    // oracle states the same overlap as a direct interval predicate.
    QueryDef("q139_interval_overlap",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, dir)
        // sess feeds TWO plan branches (banded overlap + per-user session
        // count); materialize it once or the session-window merge aggregate
        // executes per branch (same discipline as Graph.pageRank's edges)
        val sess = ev
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
          .select(col("user_id"), col("st"), col("en"))
          .localCheckpoint(true)
        val hourly = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"))
        val stats = hourly.agg(count(lit(1)).as("n_hours"), sum(col("n")).as("total"))
        val busy = hourly.crossJoin(broadcast(stats))
          .filter(col("n") * col("n_hours") * 5 > col("total") * 6)
          .select(col("h"))
        val banded = sess.select(col("user_id"), col("st"), col("en"),
            explode(sequence(date_trunc("hour", col("st")),
              date_trunc("hour", col("en")), expr("interval 1 hour"))).as("h"))
          .join(busy, "h")
          .select("user_id", "st").distinct()
          .groupBy("user_id").agg(count(lit(1)).as("n_busy_sessions"))
        sess.groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
          .join(banded, Seq("user_id"), "left")
          .select(col("user_id"), col("n_sessions"),
            coalesce(col("n_busy_sessions"), lit(0L)).as("n_busy_sessions"))
          .orderBy("user_id")
      },
      Some("""WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN LAG(ts, 1) OVER w IS NULL
        |           OR epoch(ts) - epoch(LAG(ts, 1) OVER w) >= 1800 THEN 1 ELSE 0 END
        |      AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id, min(ts) AS st, max(ts) AS en FROM (
        |    SELECT user_id, ts,
        |      SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |    FROM flagged)
        |  GROUP BY user_id, sid),
        |hourly AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
        |           FROM events GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n_hours, CAST(SUM(n) AS BIGINT) AS total
        |          FROM hourly),
        |busy AS (SELECT h FROM hourly, stats WHERE n * n_hours * 5 > total * 6),
        |overl AS (
        |  SELECT DISTINCT s.user_id, s.st
        |  FROM sess s JOIN busy b
        |    ON s.st < b.h + INTERVAL 1 HOUR AND b.h <= s.en),
        |nb AS (SELECT user_id, COUNT(*) AS n_busy_sessions FROM overl GROUP BY user_id)
        |SELECT s.user_id, COUNT(*) AS n_sessions,
        |  COALESCE(min(nb.n_busy_sessions), 0) AS n_busy_sessions
        |FROM sess s LEFT JOIN nb ON s.user_id = nb.user_id
        |GROUP BY s.user_id
        |ORDER BY s.user_id""".stripMargin)),

    // ---- forward as-of join: NEXT order at-or-after each event ----
    // pandas merge_asof(direction='forward'); completes q22/q49's backward
    // pair. Same union-merge shape (one shuffle, one ordered window pass,
    // never a range-join explosion) with the carry window looking AHEAD.
    QueryDef("q144_asof_forward",
      (s, dir) => {
        val orders = Tables.orders(s, dir)
          .select(col("o_custkey").as("user_id"), col("o_orderdate"),
            col("o_orderkey"), col("o_totalprice"))
        val events = Tables.events(s, dir).select("user_id", "ts", "event_id")
        graft.ops.AsOfJoin.leftAsOfForward(events, orders, "user_id", "ts",
            "o_orderdate", payload = Seq("o_orderkey", "o_totalprice"),
            tieBreak = "o_orderkey")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_o_orderkey").as("next_orderkey"),
            col("asof_o_totalprice").as("next_totalprice"))
          .orderBy("event_id")
      },
      Some("""WITH o AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |          ORDER BY o_orderkey ASC) AS rd FROM orders)
        |  WHERE rd = 1)
        |SELECT e.event_id, e.user_id, e.ts,
        |  o.o_orderkey AS next_orderkey, o.o_totalprice AS next_totalprice
        |FROM events e
        |ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
        |ORDER BY event_id""".stripMargin)),

    // ---- retention cohorts (first-seen week x activity week) ----
    // The product-analytics staple: cohort users by their first active
    // week, then for every later week report how many of the cohort were
    // active and the retention fraction. Two aggregates: per-user first
    // week (one shuffle on user), then distinct users per (cohort, week);
    // the cohort size is recovered from the week-0 diagonal by a window
    // max — n_active at wk = cohort_week IS the cohort size, so no third
    // scan. The fraction is one IEEE division of exact integers.
    QueryDef("q159_retention_cohorts",
      (s, dir) => {
        // ONE event-log pass: the distinct (user, week) table is the
        // aggregated intermediate both consumers need — a user's first
        // week is the min over their distinct weeks, so firstWk folds
        // from `active` instead of re-scanning and re-shuffling the log
        // (r20, guide §1.2; exchange reuse does not fire across the
        // branches). Swap checkpoint() for localCheckpoint at cluster
        // scale. Same values, bit-identical result.
        val active = Tables.events(s, dir)
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .distinct()
          .localCheckpoint(true)
        val firstWk = active
          .groupBy("user_id")
          .agg(min(col("wk")).as("cohort_wk"))
        val grid = active.join(firstWk, "user_id")
          .groupBy("cohort_wk", "wk")
          .agg(countDistinct("user_id").as("n_active"))
        val w = Window.partitionBy("cohort_wk")
        grid
          .withColumn("cohort_size",
            max(when(col("wk") === col("cohort_wk"), col("n_active")))
              .over(w))
          .select(col("cohort_wk"), col("wk"), col("n_active"),
            col("cohort_size"),
            (col("n_active").cast("double") / col("cohort_size"))
              .as("retention"))
          .orderBy("cohort_wk", "wk")
      },
      Some("""WITH first_wk AS (
        |  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_wk
        |  FROM events GROUP BY user_id),
        |active AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |grid AS (
        |  SELECT f.cohort_wk, a.wk, COUNT(DISTINCT a.user_id) AS n_active
        |  FROM active a JOIN first_wk f ON a.user_id = f.user_id
        |  GROUP BY 1, 2),
        |sized AS (
        |  SELECT *, MAX(CASE WHEN wk = cohort_wk THEN n_active END)
        |    OVER (PARTITION BY cohort_wk) AS cohort_size
        |  FROM grid)
        |SELECT CAST(cohort_wk AS TIMESTAMP) AS cohort_wk,
        |  CAST(wk AS TIMESTAMP) AS wk, n_active, cohort_size,
        |  CAST(n_active AS DOUBLE) / cohort_size AS retention
        |FROM sized
        |ORDER BY cohort_wk, wk""".stripMargin)),

    // ---- longest consecutive-day activity streak per user ----
    // Gaps-and-islands: distinct (user, day) → the classic date − rank
    // island key (consecutive days share it) → per-island lengths → max.
    // One shuffle on user_id shared by the window and both aggregates;
    // the island key is computed inside the partition, so the plan is a
    // single exchange at any scale.
    QueryDef("q166_longest_streak",
      (s, dir) => {
        val d = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
        val w = Window.partitionBy("user_id").orderBy("d")
        d.withColumn("grp", date_sub(col("d"), row_number().over(w)))
          .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(max("len").as("longest_streak"),
            sum("len").as("n_active_days"))
          .orderBy("user_id")
      },
      Some("""WITH d AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |g AS (
        |  SELECT user_id, d,
        |    d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
        |      AS INTEGER) AS grp
        |  FROM d),
        |s AS (SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, MAX(len) AS longest_streak,
        |  CAST(SUM(len) AS BIGINT) AS n_active_days
        |FROM s GROUP BY user_id
        |ORDER BY user_id""".stripMargin)),

    // ---- data-freshness audit (per-stream lag vs corpus watermark) ----
    // The ops check a streaming pipeline runs per batch: each series'
    // last event time, its lag behind the global watermark in whole
    // seconds (exact integer math on epoch seconds), and a staleness
    // flag. One aggregate + a broadcast scalar — no window, no sort.
    QueryDef("q177_freshness_audit",
      (s, dir) => {
        val g = Tables.events(s, dir).agg(max("ts").as("global_max"))
        Tables.events(s, dir).groupBy("event_type")
          .agg(count(lit(1)).as("n"), max("ts").as("last_ts"))
          .crossJoin(broadcast(g))
          .select(col("event_type"), col("n"), col("last_ts"),
            (unix_timestamp(col("global_max"))
              - unix_timestamp(col("last_ts"))).as("lag_sec"),
            (unix_timestamp(col("global_max"))
              - unix_timestamp(col("last_ts")) > 1800).as("stale"))
          .orderBy("event_type")
      },
      Some("""WITH g AS (SELECT MAX(ts) AS global_max FROM events)
        |SELECT event_type, COUNT(*) AS n, MAX(ts) AS last_ts,
        |  date_diff('second', MAX(ts), (SELECT global_max FROM g))
        |    AS lag_sec,
        |  date_diff('second', MAX(ts), (SELECT global_max FROM g)) > 1800
        |    AS stale
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin)),

    // ---- two-proportion z-test (A/B experiment readout) ----
    // The experimentation primitive: users split into variants by the
    // deterministic user_id parity, per-user conversion (purchase share
    // above threshold), pooled-proportion z-statistic. Every input to
    // the statistic is an exact integer; the z expression is one fixed
    // IEEE sequence (divisions + one correctly-rounded sqrt), so the raw
    // double matches the oracle bit-for-bit before the display rounding.
    QueryDef("q179_ab_ztest",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(((sum(when(col("event_type") === "purchase", 1).otherwise(0))
            .cast("double") / count(lit(1))) > 0.21).cast("int")
            .as("converted"))
          .withColumn("variant", (col("user_id") % 2).cast("int"))
        val v = u.groupBy("variant")
          .agg(count(lit(1)).as("n"), sum("converted").as("conv"))
        val p = (col("c0") + col("c1")).cast("double") /
          (col("n0") + col("n1"))
        v.agg(
            max(when(col("variant") === 0, col("n"))).as("n0"),
            max(when(col("variant") === 1, col("n"))).as("n1"),
            max(when(col("variant") === 0, col("conv"))).as("c0"),
            max(when(col("variant") === 1, col("conv"))).as("c1"))
          .select(col("n0"), col("n1"), col("c0"), col("c1"),
            round(col("c0").cast("double") / col("n0"), 6).as("p0"),
            round(col("c1").cast("double") / col("n1"), 6).as("p1"),
            round((col("c0").cast("double") / col("n0")
              - col("c1").cast("double") / col("n1"))
              / sqrt((p * (lit(1d) - p))
                * (lit(1d) / col("n0") + lit(1d) / col("n1"))), 6).as("z"))
      },
      Some("""WITH u AS (
        |  SELECT user_id, CAST(user_id % 2 AS INTEGER) AS variant,
        |    CASE WHEN CAST(SUM(CASE WHEN event_type = 'purchase'
        |        THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
        |        > CAST(0.21 AS DOUBLE)
        |      THEN 1 ELSE 0 END AS converted
        |  FROM events GROUP BY 1),
        |v AS (SELECT variant, COUNT(*) AS n,
        |        CAST(SUM(converted) AS BIGINT) AS conv FROM u GROUP BY 1),
        |w AS (SELECT
        |  MAX(CASE WHEN variant = 0 THEN n END) AS n0,
        |  MAX(CASE WHEN variant = 1 THEN n END) AS n1,
        |  MAX(CASE WHEN variant = 0 THEN conv END) AS c0,
        |  MAX(CASE WHEN variant = 1 THEN conv END) AS c1
        |  FROM v)
        |SELECT n0, n1, c0, c1,
        |  round(CAST(c0 AS DOUBLE) / n0, 6) AS p0,
        |  round(CAST(c1 AS DOUBLE) / n1, 6) AS p1,
        |  round((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
        |    / sqrt(((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
        |        * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)))
        |      * (CAST(1 AS DOUBLE) / n0 + CAST(1 AS DOUBLE) / n1)), 6) AS z
        |FROM w""".stripMargin)),

    // ---- run-length encoding census of event-type runs ----
    // The repetition profile of each behavior stream: consecutive equal
    // event types collapse to runs (the rank-difference island key again,
    // keyed by value this time), then the bounded (type, run-length)
    // histogram. Two windows over ONE keyed shuffle (both partition by
    // user) + a small aggregate; run detection never leaves the
    // partition.
    QueryDef("q186_run_length",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy("ts", "event_id")
        val byUserType = Window.partitionBy("user_id", "event_type")
          .orderBy("ts", "event_id")
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"),
            (row_number().over(byUser) - row_number().over(byUserType))
              .as("grp"))
          .groupBy("user_id", "event_type", "grp")
          .agg(count(lit(1)).as("run_len"))
          .groupBy(col("event_type"), col("run_len").cast("int").as("run_len"))
          .agg(count(lit(1)).as("n_runs"))
          .orderBy("event_type", "run_len")
      },
      Some("""WITH o AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS rn2
        |  FROM events),
        |runs AS (
        |  SELECT user_id, event_type, rn - rn2 AS grp, COUNT(*) AS run_len
        |  FROM o GROUP BY 1, 2, 3)
        |SELECT event_type, CAST(run_len AS INTEGER) AS run_len,
        |  COUNT(*) AS n_runs
        |FROM runs GROUP BY 1, 2
        |ORDER BY event_type, run_len""".stripMargin)),

    // ---- last-touch attribution (purchase → preceding channel) ----
    // Marketing attribution: every purchase credits the user's LAST
    // non-purchase event within the preceding hour. A single keyed
    // window (last-ignoring-nulls over an unbounded-to-previous frame)
    // carries the candidate touch; the one-hour cutoff compares exact
    // epoch microseconds. One shuffle on user_id, then a bounded
    // per-channel census of exact-decimal attributed value.
    QueryDef("q188_last_touch_attribution",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), col("value"),
            last(when(col("event_type") =!= "purchase", col("ts")),
              ignoreNulls = true).over(w).as("lt_ts"),
            last(when(col("event_type") =!= "purchase", col("event_type")),
              ignoreNulls = true).over(w).as("lt_type"))
          .filter(col("event_type") === "purchase"
            && col("lt_ts").isNotNull
            && unix_micros(col("ts")) - unix_micros(col("lt_ts"))
              <= 3600000000L)
          .groupBy(col("lt_type").as("channel"))
          .agg(count(lit(1)).as("n_purchases"),
            dsum(col("value")).as("attributed_value"))
          .orderBy("channel")
      },
      Some(s"""WITH w AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN ts END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS lt_ts,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type
        |        END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS lt_type
        |  FROM events)
        |SELECT lt_type AS channel, COUNT(*) AS n_purchases,
        |  ${sqlDsum("value")} AS attributed_value
        |FROM w
        |WHERE event_type = 'purchase' AND lt_ts IS NOT NULL
        |  AND epoch_us(ts) - epoch_us(lt_ts) <= 3600000000
        |GROUP BY 1
        |ORDER BY channel""".stripMargin)),

    // ---- cohort LTV curve (cumulative revenue per signup cohort) ----
    // q159's companion: purchase revenue per (cohort-week, weeks-since-
    // signup), accumulated along each cohort's timeline and normalized by
    // cohort size. Weekly revenue stays an EXACT DECIMAL through the
    // running-window re-aggregation (summing cast doubles would be
    // order-dependent — the dsumDec contract) and casts to double once.
    QueryDef("q194_ltv_curve",
      (s, dir) => {
        val u = Tables.events(s, dir).groupBy("user_id")
          .agg(min(date_trunc("week", col("ts"))).as("cw"))
        val rev = Tables.events(s, dir)
          .filter(col("event_type") === "purchase")
          .join(u, "user_id")
          .groupBy(col("cw"),
            expr("datediff(date_trunc('week', ts), cw) div 7").cast("int")
              .as("wk_n"))
          .agg(countDistinct("user_id").as("buyers"),
            dsumDec(col("value")).as("rev_w"))
        val sized = u.groupBy("cw").agg(count(lit(1)).as("cohort_size"))
        val w = Window.partitionBy("cw").orderBy("wk_n")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        rev.join(sized, "cw")
          .select(col("cw").as("cohort_wk"), col("wk_n"), col("buyers"),
            col("cohort_size"),
            (sum(col("rev_w")).over(w).cast("double")
              / col("cohort_size")).as("cum_ltv"))
          .orderBy("cohort_wk", "wk_n")
      },
      Some("""WITH u AS (
        |  SELECT user_id, MIN(date_trunc('week', ts)) AS cw
        |  FROM events GROUP BY 1),
        |rev AS (
        |  SELECT u.cw,
        |    CAST(date_diff('day', CAST(u.cw AS DATE),
        |      CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INTEGER)
        |      AS wk_n,
        |    COUNT(DISTINCT e.user_id) AS buyers,
        |    SUM(CAST(value AS DECIMAL(27,6))) AS rev_w
        |  FROM events e JOIN u ON e.user_id = u.user_id
        |  WHERE event_type = 'purchase'
        |  GROUP BY 1, 2),
        |sized AS (SELECT cw, COUNT(*) AS cohort_size FROM u GROUP BY 1)
        |SELECT CAST(r.cw AS TIMESTAMP) AS cohort_wk, wk_n, buyers,
        |  cohort_size,
        |  CAST(SUM(rev_w) OVER (PARTITION BY r.cw ORDER BY wk_n
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / cohort_size AS cum_ltv
        |FROM rev r JOIN sized s ON r.cw = s.cw
        |ORDER BY cohort_wk, wk_n""".stripMargin)),

    // ---- temporal episode counting (A followed by B within 5 min) ----
    // Sequence mining beyond adjacent transitions (q142): every ordered
    // event pair of one user within a 5-minute horizon, counted per
    // type pair. The engine side never builds the per-user cross
    // product: left rows fan out to their own and the next 5-minute
    // bucket, the join is EQUI on (user, bucket), and the exact time
    // predicate is a residual — the q139 banding pattern, so candidate
    // pairs are O(events·window-density) at any scale. The oracle is
    // the plain theta join (same result, viable only at oracle scale).
    QueryDef("q197_temporal_pairs",
      (s, dir) => {
        val winUs = 300000000L
        val e = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
        val left = e.select(col("user_id").as("u"), col("ts").as("ts1"),
          col("event_id").as("id1"), col("event_type").as("type_a"),
          explode(array(expr(s"unix_micros(ts) div $winUs"),
            expr(s"unix_micros(ts) div $winUs") + 1)).as("bkt"))
        val right = e.select(col("user_id").as("u2"), col("ts").as("ts2"),
          col("event_id").as("id2"), col("event_type").as("type_b"),
          expr(s"unix_micros(ts) div $winUs").as("bkt2"))
        left.join(right, col("u") === col("u2")
            && col("bkt") === col("bkt2")
            && (col("ts2") > col("ts1")
              || (col("ts2") === col("ts1") && col("id2") > col("id1")))
            && unix_micros(col("ts2")) - unix_micros(col("ts1")) <= winUs)
          .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_pairs"))
          .orderBy("type_a", "type_b")
      },
      Some("""SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  COUNT(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        |  AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
        |  AND epoch_us(b.ts) - epoch_us(a.ts) <= 300000000
        |GROUP BY 1, 2
        |ORDER BY type_a, type_b""".stripMargin)),

    // ---- session journey paths (ordered event-type sequences) ----
    // The user-journey census: 30-minute-gap sessionization (q21's
    // island key), each session's event types concatenated IN EVENT
    // ORDER into a path string, frequent paths reported. Ordering
    // inside the aggregate is made deterministic by sorting the
    // collected (ts, event_id, type) structs — collect_list alone has
    // no order contract across partitions — mirroring DuckDB's
    // list(... ORDER BY). One keyed shuffle for sessionization, one
    // aggregate per session, one bounded path census.
    QueryDef("q202_session_paths",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val o = Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"),
            when(lag(col("ts"), 1).over(w).isNull
              || unix_micros(col("ts"))
                - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L,
              1).otherwise(0).as("brk"))
        val sess = o.withColumn("sid", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        sess.groupBy("user_id", "sid")
          .agg(expr("array_join(transform(array_sort(" +
            "collect_list(struct(ts, event_id, event_type)))," +
            " x -> x.event_type), '>')").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_sessions"))
          .filter(col("n_sessions") >= 3)
          .orderBy(col("n_sessions").desc, col("path").asc)
      },
      Some("""WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o),
        |p AS (
        |  SELECT user_id, sid,
        |    array_to_string(list(event_type ORDER BY ts, event_id), '>')
        |      AS path
        |  FROM s GROUP BY 1, 2)
        |SELECT path, COUNT(*) AS n_sessions
        |FROM p GROUP BY path HAVING COUNT(*) >= 3
        |ORDER BY n_sessions DESC, path ASC""".stripMargin))
  )
}
