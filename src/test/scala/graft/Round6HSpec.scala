package graft

import org.apache.spark.sql.functions._

/** Golden tests for the eighth round-6 batch (temporal episode pairs,
  * degree assortativity).
  */
class Round6HSpec extends SparkSpec {
  import spark.implicits._

  test("temporal pairs: banded join counts only pairs within the horizon") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(sec: Long) = new java.sql.Timestamp(ts0.getTime + sec * 1000L)
    val e = Seq(
      (1L, t(0), 1L, "A"),
      (1L, t(100), 2L, "B"), // within 300s of A → counted
      (1L, t(500), 3L, "C"), // 500s after A → not; 400s after B → not
      (2L, t(0), 4L, "A")    // other user — no pairing with user 1
    ).toDF("user_id", "ts", "event_id", "event_type")
    val winUs = 300000000L
    val left = e.select(col("user_id").as("u"), col("ts").as("ts1"),
      col("event_id").as("id1"), col("event_type").as("type_a"),
      explode(array(expr(s"unix_micros(ts) div $winUs"),
        expr(s"unix_micros(ts) div $winUs") + 1)).as("bkt"))
    val right = e.select(col("user_id").as("u2"), col("ts").as("ts2"),
      col("event_id").as("id2"), col("event_type").as("type_b"),
      expr(s"unix_micros(ts) div $winUs").as("bkt2"))
    val pairs = left.join(right, col("u") === col("u2")
        && col("bkt") === col("bkt2")
        && (col("ts2") > col("ts1")
          || (col("ts2") === col("ts1") && col("id2") > col("id1")))
        && unix_micros(col("ts2")) - unix_micros(col("ts1")) <= winUs)
      .select("type_a", "type_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(pairs.toSeq.sorted == Seq(("A", "B")))
  }

  test("degree assortativity of a star graph is -1") {
    // K1,3: hub degree 3, leaves degree 1 → perfectly disassortative
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("i", "j")
    val dirE = e.unionAll(e.select(col("j"), col("i"))).toDF("src", "dst")
    val deg = dirE.groupBy("src").agg(count(lit(1)).as("d"))
    val dd = dirE
      .join(deg.toDF("src", "x"), Seq("src"))
      .join(deg.toDF("dst", "y"), Seq("dst"))
    val m = dd.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum("y").as("sy"), sum(col("x") * col("x")).as("qx"),
      sum(col("y") * col("y")).as("qy"),
      sum(col("x") * col("y")).as("sxy")).head()
    val (n, sx, sy, qx, qy, sxy) = (m.getLong(0).toDouble, m.getLong(1),
      m.getLong(2), m.getLong(3), m.getLong(4), m.getLong(5))
    val r = (n * sxy - sx.toDouble * sy) /
      (math.sqrt(n * qx - sx.toDouble * sx) *
        math.sqrt(n * qy - sy.toDouble * sy))
    assert(math.abs(r + 1.0) < 1e-12)
  }

  test("zero-variance graph (triangle clique) yields NULL, not NaN") {
    // triangle: every node degree 2 → no degree variance
    val rows = {
      val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("i", "j")
      val dirE = e.unionAll(e.select(col("j"), col("i"))).toDF("src", "dst")
      val deg = dirE.groupBy("src").agg(count(lit(1)).as("d"))
      val dd = dirE.join(deg.toDF("src", "x"), Seq("src"))
        .join(deg.toDF("dst", "y"), Seq("dst"))
      val m = dd.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("x")).as("qx"),
        sum(col("y") * col("y")).as("qy"),
        sum(col("x") * col("y")).as("sxy"))
      m.select(when(col("n") * col("qx") - col("sx") * col("sx") > 0
          && col("n") * col("qy") - col("sy") * col("sy") > 0,
        lit(1d)).as("guarded")).collect()
    }
    assert(rows.length == 1 && rows.head.isNullAt(0))
  }

  test("session paths: sorted-struct collect preserves event order") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(min: Long) = new java.sql.Timestamp(ts0.getTime + min * 60000L)
    // one session (gaps < 30 min): A(0) C(5) B(10); then a new session D(60)
    val e = Seq((1L, t(0), 1L, "A"), (1L, t(5), 2L, "C"),
        (1L, t(10), 3L, "B"), (1L, t(60), 4L, "D"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val o = e.select(col("user_id"), col("ts"), col("event_id"),
      col("event_type"),
      when(lag(col("ts"), 1).over(w).isNull
        || unix_micros(col("ts"))
          - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L,
        1).otherwise(0).as("brk"))
    val paths = o.withColumn("sid", sum("brk").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
      .repartition(5) // order must survive any layout
      .groupBy("user_id", "sid")
      .agg(expr("array_join(transform(array_sort(" +
        "collect_list(struct(ts, event_id, event_type)))," +
        " x -> x.event_type), '>')").as("path"))
      .select("path").as[String].collect().sorted.toSeq
    assert(paths == Seq("A>C>B", "D"))
  }

  test("registered q197/q198/q202 run on the corpus with sane invariants") {
    // regression hooks on the PRODUCTION registrations (the golden tests
    // above pin semantics on private copies and would miss edits to the
    // registered query bodies)
    val dir = "/root/testdata/sf0.001"
    val pairs = SparkEntry.queries("q197_temporal_pairs")(spark, dir)
      .collect()
    assert(pairs.nonEmpty && pairs.forall(_.getLong(2) > 0))
    val assort = SparkEntry.queries("q198_degree_assortativity")(spark, dir)
      .head()
    if (!assort.isNullAt(1)) {
      val a = assort.getDouble(1)
      assert(a >= -1.0 && a <= 1.0)
    }
    val sessions = SparkEntry.queries("q202_session_paths")(spark, dir)
      .collect()
    assert(sessions.nonEmpty)
    assert(sessions.forall(_.getLong(1) >= 3)) // HAVING floor holds
  }
}
