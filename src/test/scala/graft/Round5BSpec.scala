package graft

import org.apache.spark.sql.functions._

/** Golden tests for the second round-5 batch (winsorize, retention,
  * triangles, BM25, mutual information) on hand-checked inputs.
  */
class Round5BSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize clamps to the interpolated p05/p95 band and counts clips") {
    // values 1..100: p05 = 5.95, p95 = 95.05 (linear interpolation)
    val df = (1 to 100).map(_.toDouble).toDF("value")
    val b = df.agg(expr("percentile(value, 0.05)").as("lo"),
      expr("percentile(value, 0.95)").as("hi")).head()
    assert(b.getDouble(0) == 5.95 && b.getDouble(1) == 95.05)
    val out = df.crossJoin(broadcast(df.agg(
        expr("percentile(value, 0.05)").as("lo"),
        expr("percentile(value, 0.95)").as("hi"))))
      .select(least(greatest(col("value"), col("lo")), col("hi")).as("wv"),
        (col("value") < col("lo")).cast("long").as("cl"),
        (col("value") > col("hi")).cast("long").as("ch"))
      .agg(sum("cl"), sum("ch"), min("wv"), max("wv")).head()
    assert(out.getLong(0) == 5 && out.getLong(1) == 5)       // 1..5, 96..100
    assert(out.getDouble(2) == 5.95 && out.getDouble(3) == 95.05)
  }

  test("triangle join counts each closed triple exactly once") {
    // graph: 1-2, 2-3, 1-3 (triangle) + 3-4 dangling
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("i", "j")
    val e2 = e.select(col("i").as("j2"), col("j").as("k"))
    val e3 = e.select(col("i").as("i3"), col("j").as("k3"))
    val tri = e.join(e2, col("j") === col("j2"))
      .join(e3, col("i") === col("i3") && col("k") === col("k3"))
      .select("i", "j", "k").collect()
    assert(tri.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 2L, 3L)))
  }

  test("retention diagonal is 1.0 and later weeks are cohort fractions") {
    val q = SparkEntry.queries("q159_retention_cohorts")
    val rows = q(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cw, wk) = (r.getTimestamp(0), r.getTimestamp(1))
      val ret = r.getDouble(4)
      if (cw == wk) assert(ret == 1.0)
      assert(ret > 0.0 && ret <= 1.0)
    }
  }

  test("BM25 is monotone in tf at equal doc length and query df") {
    val docs = Seq(
      (1L, "table table table pad1 pad2"),
      (2L, "table pad1 pad2 pad3 pad4"),
      (3L, "none of these words here!")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("bm25_docs")
    // same shape as q161 restricted to one term
    val w = docs.select(col("doc_id"), split(col("text"), " ", -1).as("w"))
    val dl = w.select(col("doc_id"), size(col("w")).as("dl"))
    val tf = w.select(col("doc_id"), explode(col("w")).as("t"))
      .filter(col("t") === "table")
      .groupBy("doc_id").agg(count(lit(1)).as("tf"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_len"))
    val scored = tf.join(dl, "doc_id").crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log((col("n_docs").cast("double") - lit(1) + 0.5)
            / (lit(1).cast("double") + 0.5) + 1.0)
          * (col("tf").cast("double") * 2.2)
          / (col("tf").cast("double")
             + lit(1.2) * (lit(0.25) + lit(0.75)
               * col("dl").cast("double")
               / (col("tot_len").cast("double") / col("n_docs")))))
          .as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) > scored(2L) && !scored.contains(3L))
  }

  test("mutual information contributions vanish for independent columns") {
    val df = Seq(
      ("en", "s0"), ("en", "s0"), ("en", "s1"), ("en", "s1"),
      ("fr", "s0"), ("fr", "s1")
    ).toDF("lang", "source")
    import org.apache.spark.sql.expressions.Window
    val byLang = Window.partitionBy("lang")
    val bySrc = Window.partitionBy("source")
    val all = Window.partitionBy()
    val out = df.groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .select((col("n").cast("double") * sum("n").over(all)
        / (sum("n").over(byLang).cast("double") * sum("n").over(bySrc)))
        .as("ratio"))
      .select(log(col("ratio"))).as[Double].collect()
    assert(out.forall(v => math.abs(v) < 1e-15))
  }
}
