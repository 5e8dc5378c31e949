package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.util.OracleSafe._

/** Third-wave relational coverage: pivot/unpivot reshaping, moment
  * statistics (variance/correlation from exact component sums), correlated
  * EXISTS/IN subqueries, lateral explode, and RANGE-interval window frames.
  *
  * Scale notes: pivot compiles to a single hash aggregate (one shuffle);
  * unpivot is a generate (no shuffle); the moment statistics reduce to one
  * partial+final aggregate over decimal accumulators (order-independent at
  * any parallelism); the range-frame query shuffles once on the partition
  * key and sorts within partitions — the same plan shape a 1000-executor
  * cluster wants.
  */
object RelationalExtras {

  val defs: Seq[QueryDef] = Seq(

    // ---- pivot (long -> wide): quantity by returnflag x linestatus ----
    QueryDef("q56_pivot",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(27,6)) END) AS DOUBLE) AS qty_f,
        |CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(27,6)) END) AS DOUBLE) AS qty_o
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)),

    // ---- unpivot (wide -> long, a.k.a. melt) + per-metric profile ----
    QueryDef("q57_unpivot",
      (s, dir) => Tables.lineitem(s, dir)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "metric", "val")
        .groupBy("metric")
        .agg(count(lit(1)).as("n"), dsum(col("val")).as("sum_val"),
             min(col("val")).as("min_val"), max(col("val")).as("max_val"))
        .orderBy("metric"),
      Some(s"""WITH melted AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT metric, COUNT(*) AS n, ${sqlDsum("val")} AS sum_val,
        |  min(val) AS min_val, max(val) AS max_val
        |FROM melted
        |GROUP BY metric
        |ORDER BY metric""".stripMargin)),

    // ---- moment statistics from exact component sums ----
    // stddev/variance/correlation computed from decimal-exact (sum, sum of
    // squares, cross sum) components, then identical double expression trees
    // on both engines — deterministic at any parallelism, unlike the
    // built-in one-pass var_samp whose merge order varies run to run.
    QueryDef("q58_stats_moments",
      (s, dir) => {
        val x = col("l_quantity"); val y = col("l_discount")
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(count(lit(1)).cast("double").as("n"),
               dsum(x).as("sx"), dsum(x * x).as("sxx"),
               dsum(y).as("sy"), dsum(y * y).as("syy"),
               dsum(x * y).as("sxy"))
          .select(col("l_returnflag"),
            col("n").cast("long").as("n_rows"),
            (col("sx") / col("n")).as("mean_x"),
            ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1.0)).as("var_x"),
            sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1.0)).as("std_x"),
            ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1.0)).as("covar_xy"),
            (((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1.0))
              / (sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1.0))
                 * sqrt((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1.0)))).as("corr_xy"))
          .orderBy("l_returnflag")
      },
      Some {
        val sx = sqlDsum("l_quantity"); val sxx = sqlDsum("l_quantity * l_quantity")
        val sy = sqlDsum("l_discount"); val syy = sqlDsum("l_discount * l_discount")
        val sxy = sqlDsum("l_quantity * l_discount")
        s"""WITH comp AS (
          |  SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n,
          |    $sx AS sx, $sxx AS sxx, $sy AS sy, $syy AS syy, $sxy AS sxy
          |  FROM lineitem GROUP BY l_returnflag)
          |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
          |  (sx / n) AS mean_x,
          |  ((sxx - sx * sx / n) / (n - 1.0)) AS var_x,
          |  sqrt((sxx - sx * sx / n) / (n - 1.0)) AS std_x,
          |  ((sxy - sx * sy / n) / (n - 1.0)) AS covar_xy,
          |  (((sxy - sx * sy / n) / (n - 1.0))
          |    / (sqrt((sxx - sx * sx / n) / (n - 1.0))
          |       * sqrt((syy - sy * sy / n) / (n - 1.0)))) AS corr_xy
          |FROM comp
          |ORDER BY l_returnflag""".stripMargin
      }),

    // ---- correlated EXISTS / NOT EXISTS / IN subqueries ----
    // Catalyst rewrites these to semi/anti joins — no per-row subquery
    // execution, so the shape scales like any other join.
    QueryDef("q59_exists_subquery",
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer_v")
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        Tables.nation(s, dir).createOrReplaceTempView("nation_v")
        s.sql("""SELECT c_custkey, c_name, c_acctbal FROM customer_v c
          |WHERE EXISTS (SELECT 1 FROM orders_v o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
          |  AND NOT EXISTS (SELECT 1 FROM orders_v o2
          |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
          |  AND c_nationkey IN (SELECT n_nationkey FROM nation_v WHERE n_regionkey <= 3)
          |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        |  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 3)
        |ORDER BY c_custkey""".stripMargin)),

    // ---- lateral explode with position (UDTF-shaped row expansion) ----
    QueryDef("q60_lateral_explode",
      (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(slice(split(col("text"), " "), 1, 5)).as(Seq("pos", "token")))
        .orderBy("doc_id", "pos"),
      Some("""SELECT doc_id, CAST(r.range AS INTEGER) AS pos, w[r.range + 1] AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) d
        |CROSS JOIN range(5) r
        |WHERE r.range < len(w)
        |ORDER BY doc_id, pos""".stripMargin)),

    // ---- RANGE frame over event time: rolling 90-day spend per customer ----
    // RANGE (not ROWS) so duplicate order dates contribute symmetrically —
    // the frame is a time predicate, deterministic under any tie order.
    QueryDef("q61_range_frame",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderkey, o_custkey, o_orderdate,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
          |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate
          |          RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_90d,
          |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
          |          RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW) AS n_90d
          |FROM orders_v
          |ORDER BY o_orderkey""".stripMargin)
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |          RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_90d,
        |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |          RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW) AS n_90d
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin)),

    // ---- full outer join with per-side match accounting ----
    QueryDef("q72_full_outer_join",
      (s, dir) => {
        val bigOrders = Tables.orders(s, dir).filter(col("o_totalprice") > 150000)
        Tables.customer(s, dir)
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "full_outer")
          .groupBy(coalesce(col("c_mktsegment"), lit("NO_CUSTOMER")).as("segment"))
          .agg(count(lit(1)).as("n_rows"),
               count(when(col("o_orderkey").isNull, 1)).as("n_left_only"),
               count(when(col("c_custkey").isNull, 1)).as("n_right_only"),
               count(when(col("c_custkey").isNotNull && col("o_orderkey").isNotNull, 1))
                 .as("n_matched"))
          .orderBy("segment")
      },
      Some("""SELECT COALESCE(c_mktsegment, 'NO_CUSTOMER') AS segment,
        |  COUNT(*) AS n_rows,
        |  COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_left_only,
        |  COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS n_right_only,
        |  COUNT(CASE WHEN c_custkey IS NOT NULL AND o_orderkey IS NOT NULL THEN 1 END) AS n_matched
        |FROM customer FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 150000) o
        |  ON c_custkey = o_custkey
        |GROUP BY 1
        |ORDER BY segment""".stripMargin)),

    // ---- multiplicity-preserving set ops (EXCEPT ALL / INTERSECT ALL) ----
    QueryDef("q73_setops_all",
      (s, dir) => {
        // each side feeds THREE set ops — lazy that was 6 orders scans
        // (r20 plan dump; exchange reuse does not fire across branches).
        // Materialize the narrow key columns once; swap checkpoint() for
        // localCheckpoint at cluster scale.
        val a = Tables.orders(s, dir).filter(col("o_totalprice") > 100000)
          .select("o_custkey").localCheckpoint(true)
        val b = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
          .select("o_custkey").localCheckpoint(true)
        val ea = a.exceptAll(b).agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
        val ia = a.intersectAll(b).agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
        val ed = a.except(b).agg(count(lit(1)).as("n")).withColumn("op", lit("except_distinct"))
        ea.unionByName(ia).unionByName(ed).select("op", "n").orderBy("op")
      },
      Some("""WITH a AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000),
        |b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |counts AS (
        |  SELECT 'except_all' AS op, COUNT(*) AS n FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'intersect_all', COUNT(*) FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'except_distinct', COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
        |SELECT op, n FROM counts ORDER BY op""".stripMargin)),

    // ---- cartesian product + theta predicate (nested-loop join) ----
    // The one join shape with no equi-key: Catalyst plans a
    // BroadcastNestedLoopJoin. Legitimate ONLY when one side is tiny
    // (here: 5 regions broadcast); an unblocked big×big cross join has no
    // 100 TB-safe form — every other pair generator in this library blocks
    // on a key first (see Dedup/Similarity).
    QueryDef("q99_theta_cross_join",
      (s, dir) => Tables.supplier(s, dir)
        .crossJoin(Tables.region(s, dir))
        .filter(col("s_acctbal") > col("r_regionkey") * 1500.0)
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_pairs"), dsum(col("s_acctbal")).as("sum_bal"))
        .orderBy("r_name"),
      Some(s"""SELECT r_name, COUNT(*) AS n_pairs, ${sqlDsum("s_acctbal")} AS sum_bal
        |FROM supplier CROSS JOIN region
        |WHERE s_acctbal > r_regionkey * 1500.0
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin)),

    // ---- Spearman rank correlation (tie-aware average ranks) ----
    // rank-transform then Pearson-from-exact-components (q58 recipe):
    // average rank = RANK() + (ties − 1)/2 is a half-integer, so every
    // product of ranks is a quarter-integer — exact in both the decimal
    // accumulator and the final double. Two windows + one aggregate; the
    // windows shuffle once on the group key.
    QueryDef("q122_spearman",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val rk = (c: String) =>
          rank().over(Window.partitionBy("p_brand").orderBy(col(c)))
            .cast("double") +
            (count(lit(1)).over(Window.partitionBy("p_brand", c)) - 1) / 2.0
        val ranked = Tables.part(s, dir)
          .select(col("p_brand"), rk("p_size").as("rx"),
            rk("p_retailprice").as("ry"))
        ranked.groupBy("p_brand")
          .agg(count(lit(1)).as("n"),
            dsum(col("rx")).as("sx"), dsum(col("ry")).as("sy"),
            dsum(col("rx") * col("rx")).as("sxx"),
            dsum(col("ry") * col("ry")).as("syy"),
            dsum(col("rx") * col("ry")).as("sxy"))
          .select(col("p_brand"), col("n"),
            // degenerate guard (q121/q135 discipline): an all-tied variable
            // has zero rank variance, where the double components can round
            // a hair negative — sqrt would NaN here and ERROR in the oracle
            round(when(col("n") > 1
                && (col("sxx") - col("sx") * col("sx") / col("n")) > 0
                && (col("syy") - col("sy") * col("sy") / col("n")) > 0,
              (col("sxy") - col("sx") * col("sy") / col("n"))
                / (sqrt(col("sxx") - col("sx") * col("sx") / col("n"))
                   * sqrt(col("syy") - col("sy") * col("sy") / col("n")))), 6)
              .as("spearman"))
          .orderBy("p_brand")
      },
      Some(s"""WITH ranked AS (
        |  SELECT p_brand,
        |    CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS DOUBLE)
        |      + (COUNT(*) OVER (PARTITION BY p_brand, p_size) - 1) / 2.0 AS rx,
        |    CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice) AS DOUBLE)
        |      + (COUNT(*) OVER (PARTITION BY p_brand, p_retailprice) - 1) / 2.0 AS ry
        |  FROM part),
        |comp AS (
        |  SELECT p_brand, COUNT(*) AS n,
        |    ${sqlDsum("rx")} AS sx, ${sqlDsum("ry")} AS sy,
        |    ${sqlDsum("rx * rx")} AS sxx, ${sqlDsum("ry * ry")} AS syy,
        |    ${sqlDsum("rx * ry")} AS sxy
        |  FROM ranked GROUP BY p_brand)
        |SELECT p_brand, n,
        |  round(CASE WHEN n > 1 AND (sxx - sx * sx / n) > 0
        |              AND (syy - sy * sy / n) > 0
        |    THEN (sxy - sx * sy / n)
        |      / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) END, 6) AS spearman
        |FROM comp
        |ORDER BY p_brand""".stripMargin)),

    // ---- distribution-rank window family: ntile / percent_rank / cume_dist
    //      / nth_value over a deterministic total order ----
    // The windows are computed over the FULL partition, then the output is
    // decimated to every-100th order key — the window shuffle/sort happens
    // once on the partition key regardless of output size.
    // PARALLELISM-CEILING CONTRACT: l_returnflag has 3 values, so this
    // window runs ≤3-way parallel by design. Unlike the frame windows
    // (q102/q180, bucket-stitched via bucketedRollingWindow), the rank
    // family here is partition-GLOBAL (ntile/percent_rank need the total
    // order and tie-aware ranks, and the sort triple is not unique in
    // lineitem), so a two-level rewrite would have to reproduce Spark's
    // exact tie semantics from stitched global indexes — accepted ceiling;
    // at 100 TB run this per returnflag-partitioned shard instead.
    QueryDef("q123_rank_distribution",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("l_returnflag")
          .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"),
            nth_value(col("l_extendedprice"), 3).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("third_lowest"))
          .filter(col("l_orderkey") % 100 === 0)
          .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |  NTILE(4) OVER w AS quartile,
        |  round(PERCENT_RANK() OVER w, 6) AS pct_rank,
        |  round(CUME_DIST() OVER w, 6) AS cume,
        |  NTH_VALUE(l_extendedprice, 3) OVER
        |    (PARTITION BY l_returnflag
        |     ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_lowest
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag
        |             ORDER BY l_extendedprice, l_orderkey, l_linenumber)
        |QUALIFY l_orderkey % 100 = 0
        |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin)),

    // ---- Benford first-digit audit ----
    // Leading-significant-digit distribution of order totals vs Benford's
    // law — the classic fraud/data-quality screen. The digit comes from
    // the SHORTEST string repr of the double (identical on both engines),
    // never from log-floor arithmetic; expected shares log10(1+1/d) are
    // the same libm constants on both sides, rounded at 6 dp.
    QueryDef("q141_benford_digits",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        Tables.orders(s, dir)
          .select(regexp_extract(col("o_totalprice").cast("string"),
            "([1-9])", 1).as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
          .withColumn("share_obs",
            round(col("n") / sum(col("n")).over(Window.partitionBy()), 6))
          .withColumn("share_benford",
            round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6))
          .orderBy("digit")
      },
      Some("""WITH d AS (
        |  SELECT regexp_extract(CAST(o_totalprice AS VARCHAR), '([1-9])', 1)
        |    AS digit
        |  FROM orders),
        |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit)
        |SELECT digit, n,
        |  round(CAST(n AS DOUBLE) / (SELECT SUM(n) FROM c), 6) AS share_obs,
        |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS share_benford
        |FROM c
        |ORDER BY digit""".stripMargin)),

    // ---- recursive CTE (Spark 4 WITH RECURSIVE): monthly calendar spine ----
    // The spine is generated by recursion (UnionLoopExec), then left-joined
    // to per-month order counts — the gap-preserving calendar join that
    // window functions can't synthesize rows for. Both engines run the
    // textually-equivalent recursive SQL.
    QueryDef("q124_recursive_cte",
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("orders_v")
        s.sql("""WITH RECURSIVE months AS (
          |  SELECT DATE '1995-01-01' AS mo
          |  UNION ALL
          |  SELECT mo + INTERVAL '1' MONTH FROM months WHERE mo < DATE '2001-08-01')
          |SELECT CAST(m.mo AS TIMESTAMP) AS mo, COUNT(o.o_orderkey) AS n_orders
          |FROM months m LEFT JOIN orders_v o
          |  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m.mo
          |GROUP BY m.mo
          |ORDER BY mo""".stripMargin)
      },
      Some("""WITH RECURSIVE months AS (
        |  SELECT DATE '1995-01-01' AS mo
        |  UNION ALL
        |  SELECT mo + INTERVAL 1 MONTH FROM months WHERE mo < DATE '2001-08-01')
        |SELECT CAST(m.mo AS TIMESTAMP) AS mo, COUNT(o.o_orderkey) AS n_orders
        |FROM months m LEFT JOIN orders o
        |  ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = m.mo
        |GROUP BY m.mo
        |ORDER BY mo""".stripMargin)),

    // ---- Pareto frontier (skyline) per group ----
    // Parts that are non-dominated on (minimize retail price, maximize
    // size) within their brand: u dominates t iff u is <= on price, >= on
    // size, and strictly better on one. Expressed as a self anti-join
    // under the brand equi-key, so Catalyst plans a broadcast hash join
    // on p_brand with the dominance predicate as residual — candidate
    // pairs are per-brand, never the full cross product. (At extreme
    // per-group cardinality the same result comes from a sort-by-price /
    // running-max-size scan per group; the anti-join form is the general
    // multi-criteria one.)
    QueryDef("q155_pareto_frontier",
      (s, dir) => {
        val p = Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"),
            col("p_retailprice"), col("p_size"))
        val dom = p.select(col("p_brand").as("b"),
          col("p_retailprice").as("dp"), col("p_size").as("ds"))
        p.join(dom,
            col("p_brand") === col("b")
              && col("dp") <= col("p_retailprice")
              && col("ds") >= col("p_size")
              && (col("dp") < col("p_retailprice")
                  || col("ds") > col("p_size")),
            "left_anti")
          .orderBy("p_brand", "p_partkey")
      },
      Some("""SELECT p_partkey, p_brand, p_retailprice, p_size
        |FROM part t
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part u
        |  WHERE u.p_brand = t.p_brand
        |    AND u.p_retailprice <= t.p_retailprice
        |    AND u.p_size >= t.p_size
        |    AND (u.p_retailprice < t.p_retailprice
        |         OR u.p_size > t.p_size))
        |ORDER BY p_brand, p_partkey""".stripMargin)),

    // ---- chi-square independence screen (event_type x hour-of-day) ----
    // The contingency-table audit for "is activity mix time-dependent":
    // observed cell counts vs the independence expectation
    // row_total*col_total/N, with the per-cell chi-square contribution.
    // ONE aggregate over the fact table; the margins come from window sums
    // over the 120-cell result, not a second scan. All inputs are exact
    // integers, and expectation/contribution are single IEEE ops on
    // identical operands → raw doubles match the oracle bit-for-bit.
    QueryDef("q157_chi_square",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byType = Window.partitionBy("event_type")
        val byHr = Window.partitionBy("hr")
        val all = Window.partitionBy()
        Tables.events(s, dir)
          .groupBy(col("event_type"), hour(col("ts")).as("hr"))
          .agg(count(lit(1)).as("obs"))
          .select(col("event_type"), col("hr"), col("obs"),
            (sum("obs").over(byType).cast("double")
              * sum("obs").over(byHr).cast("double")
              / sum("obs").over(all).cast("double")).as("expected"))
          .withColumn("contrib",
            (col("obs") - col("expected")) * (col("obs") - col("expected"))
              / col("expected"))
          .orderBy("event_type", "hr")
      },
      Some("""WITH cell AS (
        |  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr,
        |         COUNT(*) AS obs
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, hr, obs,
        |    CAST(SUM(obs) OVER (PARTITION BY event_type) AS DOUBLE)
        |      * CAST(SUM(obs) OVER (PARTITION BY hr) AS DOUBLE)
        |      / CAST(SUM(obs) OVER () AS DOUBLE) AS expected
        |  FROM cell)
        |SELECT event_type, hr, obs, expected,
        |  (obs - expected) * (obs - expected) / expected AS contrib
        |FROM m
        |ORDER BY event_type, hr""".stripMargin)),

    // ---- mutual information between two categorical columns ----
    // MI(lang; source) from the contingency cells: per-cell pointwise MI
    // ln(c·N/(row·col)) and its probability-weighted contribution — the
    // feature-dependence screen run before stratifying or mixing a corpus.
    // Same one-aggregate + window-margins shape as q157; ln is libm →
    // round 6 on both engines, everything before it is exact-integer
    // ratios divided identically.
    QueryDef("q162_mutual_information",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byLang = Window.partitionBy("lang")
        val bySrc = Window.partitionBy("source")
        val all = Window.partitionBy()
        Tables.documents(s, dir)
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("n"))
          .select(col("lang"), col("source"), col("n"),
            sum("n").over(byLang).as("n_lang"),
            sum("n").over(bySrc).as("n_src"),
            sum("n").over(all).as("n_tot"))
          .select(col("lang"), col("source"), col("n"),
            round(log(col("n").cast("double") * col("n_tot")
              / (col("n_lang").cast("double") * col("n_src"))), 6)
              .as("pmi"),
            round((col("n").cast("double") / col("n_tot"))
              * log(col("n").cast("double") * col("n_tot")
                / (col("n_lang").cast("double") * col("n_src"))), 6)
              .as("mi_contrib"))
          .orderBy("lang", "source")
      },
      Some("""WITH cell AS (
        |  SELECT lang, source, COUNT(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |m AS (
        |  SELECT lang, source, n,
        |    SUM(n) OVER (PARTITION BY lang) AS n_lang,
        |    SUM(n) OVER (PARTITION BY source) AS n_src,
        |    SUM(n) OVER () AS n_tot
        |  FROM cell)
        |SELECT lang, source, n,
        |  round(ln(CAST(n AS DOUBLE) * n_tot
        |    / (CAST(n_lang AS DOUBLE) * n_src)), 6) AS pmi,
        |  round((CAST(n AS DOUBLE) / n_tot)
        |    * ln(CAST(n AS DOUBLE) * n_tot
        |      / (CAST(n_lang AS DOUBLE) * n_src)), 6) AS mi_contrib
        |FROM m
        |ORDER BY lang, source""".stripMargin)),

    // ---- market-basket association rules (pairwise co-occurrence) ----
    // Support / confidence / lift over part pairs bought in the same
    // order. Candidate pairs are generated per basket (self-join on the
    // order key with p1 < p2), never all-parts × all-parts: baskets
    // average ~4 items, so the pair stream is O(rows·k) and the only
    // shuffles are the basket key and the pair-count aggregate. Item
    // counts are a small dimension → broadcast; the order total is a
    // broadcast scalar. All ratios divide exact integer counts in the
    // same IEEE op sequence as the oracle.
    QueryDef("q163_market_basket",
      (s, dir) => {
        // the distinct basket table feeds FOUR consumers (order total, item
        // counts, both sides of the pair self-join); lazy it would re-scan
        // the fact table and re-pay the distinct shuffle per consumer (5
        // scans / 5 corpus-wide exchanges measured in the r20 plan dump —
        // exchange reuse does not fire across these branches). Materialize
        // the aggregated intermediate ONCE (r20, guide §1.2/§2.4); swap
        // checkpoint() for localCheckpoint at cluster scale, as in
        // connectedComponents. Same rows, bit-identical result.
        val b = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
          .localCheckpoint(true)
        val nOrders = b.agg(countDistinct(col("ok")).as("n_orders"))
        // item counts broadcast twice (c1, c2) — pin the one aggregation
        val ic = b.groupBy("pk").agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
        val pairs = b.toDF("ok", "p1")
          .join(b.toDF("ok2", "p2"),
            col("ok") === col("ok2") && col("p1") < col("p2"))
          .groupBy("p1", "p2").agg(count(lit(1)).as("pair_cnt"))
          .filter(col("pair_cnt") >= 2)
        pairs
          .join(broadcast(ic.toDF("p1", "c1")), Seq("p1"))
          .join(broadcast(ic.toDF("p2", "c2")), Seq("p2"))
          .crossJoin(broadcast(nOrders))
          .select(col("p1"), col("p2"), col("pair_cnt"),
            round(col("pair_cnt").cast("double") / col("n_orders"), 6)
              .as("support"),
            round(col("pair_cnt").cast("double") / col("c1"), 6)
              .as("conf_p1"),
            round(col("pair_cnt").cast("double") * col("n_orders")
              / (col("c1").cast("double") * col("c2")), 6).as("lift"))
          .orderBy("p1", "p2")
      },
      Some("""WITH b AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM b),
        |ic AS (SELECT pk, COUNT(*) AS cnt FROM b GROUP BY pk),
        |pair AS (
        |  SELECT b1.pk AS p1, b2.pk AS p2, COUNT(*) AS pair_cnt
        |  FROM b b1 JOIN b b2 ON b1.ok = b2.ok AND b1.pk < b2.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT p1, p2, pair_cnt,
        |  round(CAST(pair_cnt AS DOUBLE) / n_orders, 6) AS support,
        |  round(CAST(pair_cnt AS DOUBLE) / c1.cnt, 6) AS conf_p1,
        |  round(CAST(pair_cnt AS DOUBLE) * n_orders
        |    / (CAST(c1.cnt AS DOUBLE) * c2.cnt), 6) AS lift
        |FROM pair
        |JOIN ic c1 ON p1 = c1.pk
        |JOIN ic c2 ON p2 = c2.pk
        |CROSS JOIN n
        |ORDER BY p1, p2""".stripMargin)),

    // ---- RFM customer segmentation (quintile scoring) ----
    // Recency / frequency / monetary quintiles per market segment via
    // ntile(5) with a deterministic custkey tie-break; the monetary rank
    // orders on the exact decimal spend sum, so rank order is engine-
    // independent. Output is the bounded segment × (r,f,m) cell census.
    // Scale: the fact scan collapses to one row per customer first
    // (partial+final aggregate), and the three ntiles share one window
    // partitioning (the market segments); at extreme per-segment
    // cardinality the same scores come from pre-computed quantile
    // breakpoints instead of the in-partition sort.
    QueryDef("q164_rfm_segments",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // ONE orders pass: the corpus-max order date is the max of the
        // per-customer maxima, so it folds from the customer rollup
        // instead of a second fact scan (r20, guide §1.2; exchange reuse
        // does not fire across the branches). Swap checkpoint() for
        // localCheckpoint at cluster scale. Same values, bit-identical.
        val cust0 = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("custkey"))
          .agg(max(to_date(col("o_orderdate"))).as("last_d"),
            count(lit(1)).as("freq"),
            dsumDec(col("o_totalprice")).as("mon"))
          .localCheckpoint(true)
        val maxD = cust0.agg(max(col("last_d")).as("corpus_max"))
        val cust = cust0
          .crossJoin(broadcast(maxD))
          .select(col("custkey"),
            datediff(col("corpus_max"), col("last_d")).as("rec"),
            col("freq"), col("mon"))
        val seg = cust.join(
          Tables.customer(s, dir)
            .select(col("c_custkey"), col("c_mktsegment").as("segment")),
          col("custkey") === col("c_custkey"))
        val bySeg = Window.partitionBy("segment")
        seg.select(col("segment"),
            ntile(5).over(bySeg.orderBy(col("rec").asc, col("custkey").asc))
              .as("r"),
            ntile(5).over(bySeg.orderBy(col("freq").desc, col("custkey").asc))
              .as("f"),
            ntile(5).over(bySeg.orderBy(col("mon").desc, col("custkey").asc))
              .as("m"))
          .groupBy("segment", "r", "f", "m").agg(count(lit(1)).as("n"))
          .orderBy("segment", "r", "f", "m")
      },
      Some("""WITH maxd AS (
        |  SELECT CAST(MAX(o_orderdate) AS DATE) AS corpus_max FROM orders),
        |cust AS (
        |  SELECT o_custkey AS custkey,
        |    date_diff('day', CAST(MAX(o_orderdate) AS DATE),
        |      (SELECT corpus_max FROM maxd)) AS rec,
        |    COUNT(*) AS freq,
        |    SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS mon
        |  FROM orders GROUP BY 1),
        |seg AS (
        |  SELECT c.c_mktsegment AS segment, custkey, rec, freq, mon
        |  FROM cust JOIN customer c ON custkey = c.c_custkey),
        |t AS (
        |  SELECT segment,
        |    CAST(ntile(5) OVER (PARTITION BY segment
        |      ORDER BY rec ASC, custkey ASC) AS INTEGER) AS r,
        |    CAST(ntile(5) OVER (PARTITION BY segment
        |      ORDER BY freq DESC, custkey ASC) AS INTEGER) AS f,
        |    CAST(ntile(5) OVER (PARTITION BY segment
        |      ORDER BY mon DESC, custkey ASC) AS INTEGER) AS m
        |  FROM seg)
        |SELECT segment, r, f, m, COUNT(*) AS n
        |FROM t GROUP BY 1, 2, 3, 4
        |ORDER BY segment, r, f, m""".stripMargin)),

    // ---- Gini concentration of customer spend per market segment ----
    // The inequality audit run before choosing a partitioning key: exact
    // cent-integer spend totals, a deterministic (spend, custkey) rank,
    // and the closed-form Gini (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx). Σcents stays
    // in int64, but Σi·cents grows ~n²/2·avg_cents — quadratic in SF, it
    // would wrap int64 around SF≈15 (Spark wraps SILENTLY; DuckDB errors),
    // so the rank-weighted sum accumulates in DECIMAL(38,0) on BOTH
    // engines (cast before multiply — the q176/q198 overflow pattern) and
    // casts to double exactly once in the final expression.
    QueryDef("q169_gini_spend",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val spend = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("custkey"))
          .agg(sum(floor(col("o_totalprice") * 100d + 0.5d).cast("long"))
            .as("cents"))
        val seg = spend.join(
          Tables.customer(s, dir)
            .select(col("c_custkey"), col("c_mktsegment").as("segment")),
          col("custkey") === col("c_custkey"))
        val w = Window.partitionBy("segment")
          .orderBy(col("cents").asc, col("custkey").asc)
        seg.withColumn("i", row_number().over(w))
          .groupBy("segment")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("b"),
            sum(col("i").cast("decimal(38,0)") * col("cents")).as("a"))
          .select(col("segment"), col("n"), col("b"),
            round((lit(2d) * col("a").cast("double")
              - (col("n") + 1).cast("double") * col("b").cast("double"))
              / (col("n").cast("double") * col("b").cast("double")), 6)
              .as("gini"))
          .orderBy("segment")
      },
      Some("""WITH spend AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(SUM(CAST(floor(o_totalprice * 100 + CAST(0.5 AS DOUBLE))
        |      AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |seg AS (
        |  SELECT c.c_mktsegment AS segment, custkey, cents
        |  FROM spend JOIN customer c ON custkey = c.c_custkey),
        |r AS (
        |  SELECT segment, cents,
        |    row_number() OVER (PARTITION BY segment
        |      ORDER BY cents ASC, custkey ASC) AS i
        |  FROM seg),
        |g AS (
        |  SELECT segment, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS b,
        |    SUM(CAST(i AS DECIMAL(38,0)) * cents) AS a
        |  FROM r GROUP BY segment)
        |SELECT segment, n, b,
        |  round((2 * CAST(a AS DOUBLE)
        |    - CAST(n + 1 AS DOUBLE) * CAST(b AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(b AS DOUBLE)), 6) AS gini
        |FROM g
        |ORDER BY segment""".stripMargin)),

    // ---- rank movers (year-over-year leaderboard churn) ----
    // The trend screen over a revenue leaderboard: per-supplier revenue
    // in two adjacent years reduced to exact cent integers, ranked
    // independently per year with a deterministic tie-break, top-20 by
    // rank gain. Revenue ranks sort on exact integers, so the
    // leaderboard order is engine- and layout-independent. One fact join
    // + one aggregate; the ranking windows run over the supplier-sized
    // result, not the fact table.
    QueryDef("q174_rank_movers",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val c = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .filter(year(col("o_orderdate")).isin(1996, 1997))
          .groupBy(col("l_suppkey").as("sk"),
            year(col("o_orderdate")).as("yr"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1d) - col("l_discount"))
            * 100d + 0.5d).cast("long")).as("rev_c"))
        val r = c.withColumn("rk", row_number().over(
          Window.partitionBy("yr")
            .orderBy(col("rev_c").desc, col("sk").asc)))
        val a = r.filter(col("yr") === 1996)
          .select(col("sk"), col("rev_c").as("rev96"), col("rk").as("rk96"))
        val b = r.filter(col("yr") === 1997)
          .select(col("sk").as("sk2"), col("rev_c").as("rev97"),
            col("rk").as("rk97"))
        a.join(b, col("sk") === col("sk2"))
          .select(col("sk"), col("rev96"), col("rev97"),
            col("rk96"), col("rk97"),
            (col("rk96") - col("rk97")).as("rank_gain"))
          .orderBy(col("rank_gain").desc, col("sk").asc)
          .limit(20)
      },
      Some("""WITH c AS (
        |  SELECT l_suppkey AS sk, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |    CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100
        |      + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) IN (1996, 1997)
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT sk, yr, rev_c,
        |    CAST(row_number() OVER (PARTITION BY yr
        |      ORDER BY rev_c DESC, sk ASC) AS INTEGER) AS rk
        |  FROM c)
        |SELECT a.sk, a.rev_c AS rev96, b.rev_c AS rev97,
        |  a.rk AS rk96, b.rk AS rk97, a.rk - b.rk AS rank_gain
        |FROM r a JOIN r b ON a.sk = b.sk AND a.yr = 1996 AND b.yr = 1997
        |ORDER BY rank_gain DESC, a.sk ASC
        |LIMIT 20""".stripMargin)),

    // ---- Kaplan-Meier life table over customer order lifetimes ----
    // Survival analytics inputs: lifetime = months between a customer's
    // first and last order, deaths per month d_t, the at-risk
    // reverse-cumulative n_t, and the discrete hazard d_t/n_t. Lifetime
    // is the calendar-month index difference (exact integers); the
    // reverse cumsum runs over the bounded per-month table, not the
    // customer set.
    QueryDef("q178_life_table",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val life = Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(((year(max(col("o_orderdate"))) * 12
            + month(max(col("o_orderdate"))))
            - (year(min(col("o_orderdate"))) * 12
              + month(min(col("o_orderdate"))))).as("m"))
        life.groupBy("m").agg(count(lit(1)).as("churned"))
          .withColumn("n_at_risk", sum("churned").over(
            Window.orderBy(col("m").desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("m"), col("n_at_risk"), col("churned"),
            round(col("churned").cast("double") / col("n_at_risk"), 6)
              .as("hazard"))
          .orderBy("m")
      },
      Some("""WITH life AS (
        |  SELECT o_custkey,
        |    CAST((year(MAX(o_orderdate)) * 12 + month(MAX(o_orderdate)))
        |      - (year(MIN(o_orderdate)) * 12 + month(MIN(o_orderdate)))
        |      AS INTEGER) AS m
        |  FROM orders GROUP BY 1),
        |d AS (SELECT m, COUNT(*) AS churned FROM life GROUP BY m)
        |SELECT m,
        |  CAST(SUM(churned) OVER (ORDER BY m DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_at_risk,
        |  churned,
        |  round(CAST(churned AS DOUBLE)
        |    / CAST(SUM(churned) OVER (ORDER BY m DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT),
        |    6) AS hazard
        |FROM d
        |ORDER BY m""".stripMargin)),

    // ---- entity resolution: blocked candidate pairs + match scoring ----
    // Catalog MDM: find duplicate part listings by blocking on exact
    // (name, brand) — the candidate generator that keeps the pair space
    // O(block²·blocks), never |parts|² — then matching on price proximity
    // (±1%, evaluated in identical IEEE ops). The price delta is reported
    // in exact cents. At 100 TB the blocked self-join shuffles once on
    // the block key; skewed blocks would salt exactly like q77.
    QueryDef("q181_entity_resolution",
      (s, dir) => {
        val p = Tables.part(s, dir).select(col("p_partkey"), col("p_name"),
          col("p_brand"), col("p_retailprice"))
        val a = p.toDF("pk1", "name", "brand", "pr1")
        val b = p.toDF("pk2", "name2", "brand2", "pr2")
        a.join(b, col("name") === col("name2")
            && col("brand") === col("brand2") && col("pk1") < col("pk2"))
          .filter(col("pr2") >= col("pr1") * lit(0.99d)
            && col("pr2") <= col("pr1") * lit(1.01d))
          .select(col("pk1"), col("pk2"), col("name"), col("brand"),
            (floor(col("pr2") * 100d + 0.5d).cast("long")
              - floor(col("pr1") * 100d + 0.5d).cast("long"))
              .as("price_diff_c"))
          .orderBy("pk1", "pk2")
      },
      Some("""SELECT a.p_partkey AS pk1, b.p_partkey AS pk2,
        |  a.p_name AS name, a.p_brand AS brand,
        |  CAST(floor(b.p_retailprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)
        |    - CAST(floor(a.p_retailprice * 100 + CAST(0.5 AS DOUBLE))
        |        AS BIGINT) AS price_diff_c
        |FROM part a JOIN part b
        |  ON a.p_name = b.p_name AND a.p_brand = b.p_brand
        |  AND a.p_partkey < b.p_partkey
        |WHERE b.p_retailprice >= a.p_retailprice * CAST(0.99 AS DOUBLE)
        |  AND b.p_retailprice <= a.p_retailprice * CAST(1.01 AS DOUBLE)
        |ORDER BY pk1, pk2""".stripMargin)),

    // ---- pairwise correlation matrix (single-pass component sums) ----
    // All 6 Pearson correlations between the 4 numeric lineitem columns
    // from ONE aggregate: per-column Σx and Σx², per-pair Σxy, all
    // through exact decimal accumulators. Columns are pre-scaled by
    // fixed constants (correlation is scale-invariant; the scaling op is
    // the same IEEE division on both engines) so every accumulated sum
    // stays below 2^53 scaled units — above that the decimal→double
    // cast is not correctly rounded on all engines (OracleSafe contract).
    // The price divisor is 2^26, NOT a power of ten: price/1e5 has
    // exactly 7 decimal digits, parking ~10% of rows on DECIMAL(27,6)
    // rounding midpoints where Spark (shortest-repr) and DuckDB
    // (exact-binary) round apart — measured 21,560/583,090 divergent
    // casts at sf0.1. Dividing by a power of two is an EXACT binary op
    // whose results avoid scale-6 midpoints entirely: zero divergent
    // casts measured over every base value, square, and cross product.
    QueryDef("q193_corr_matrix",
      (s, dir) => {
        val scaled = Tables.lineitem(s, dir).select(
          (col("l_quantity") / lit(100d)).as("qty"),
          (col("l_extendedprice") / lit(67108864d)).as("price"),
          col("l_discount").as("disc"),
          col("l_tax").as("tax"))
        val cs = Seq("qty", "price", "disc", "tax")
        val prs = for {
          i <- cs.indices; j <- (i + 1) until cs.size
        } yield (cs(i), cs(j))
        val aggs = cs.flatMap(c => Seq(
          dsumDec(col(c)).as(s"s_$c"),
          dsumDec(col(c) * col(c)).as(s"q_$c"))) ++
          prs.map { case (a, b) =>
            dsumDec(col(a) * col(b)).as(s"s_${a}_$b") }
        val m = scaled.agg(count(lit(1)).as("n"), aggs: _*)
        m.select(prs.map { case (a, b) =>
          round((col("n") * col(s"s_${a}_$b").cast("double")
            - col(s"s_$a").cast("double") * col(s"s_$b").cast("double"))
            / (sqrt(col("n") * col(s"q_$a").cast("double")
                - col(s"s_$a").cast("double") * col(s"s_$a").cast("double"))
              * sqrt(col("n") * col(s"q_$b").cast("double")
                - col(s"s_$b").cast("double") * col(s"s_$b").cast("double"))),
            6).as(s"corr_${a}_$b")
        }: _*)
      },
      Some {
        val cs = Seq("qty" -> "l_quantity / CAST(100 AS DOUBLE)",
          "price" -> "l_extendedprice / CAST(67108864 AS DOUBLE)",
          "disc" -> "l_discount", "tax" -> "l_tax")
        val names = cs.map(_._1)
        val prs = for {
          i <- names.indices; j <- (i + 1) until names.size
        } yield (names(i), names(j))
        val dec = (e: String) => s"SUM(CAST(($e) AS DECIMAL(27,6)))"
        val base = (cs.flatMap { case (nm, e) =>
          Seq(s"${dec(e)} AS s_$nm", s"${dec(s"($e) * ($e)")} AS q_$nm")
        } ++ prs.map { case (a, b) =>
          val (ea, eb) = (cs.toMap.apply(a), cs.toMap.apply(b))
          s"${dec(s"($ea) * ($eb)")} AS s_${a}_$b"
        }).mkString(", ")
        val sel = prs.map { case (a, b) =>
          s"""round((n * CAST(s_${a}_$b AS DOUBLE)
             |    - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
             |  / (sqrt(n * CAST(q_$a AS DOUBLE)
             |      - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
             |    * sqrt(n * CAST(q_$b AS DOUBLE)
             |      - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE))), 6)
             |  AS corr_${a}_$b""".stripMargin
        }.mkString(",\n")
        s"""WITH m AS (SELECT COUNT(*) AS n, $base FROM lineitem)
           |SELECT
           |$sel
           |FROM m""".stripMargin
      })
  )
}
