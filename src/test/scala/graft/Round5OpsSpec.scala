package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.TimeSeriesOps

/** Golden tests for the round-5 operators on tiny hand-checked inputs
  * (the oracle gate covers the corpus; these pin the semantics).
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("holt: seeds (l=x1, b=0) and applies the level/trend recurrence") {
    val df = Seq(
      (1L, 1L, ts(0), 10.0), (1L, 2L, ts(60), 20.0), (1L, 3L, ts(120), 30.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = TimeSeriesOps.holt(df, "user_id", "event_id", "ts", "value",
        alpha = 0.5, beta = 0.25)
      .orderBy("event_id").select("level", "trend").collect()
    // t1: l=10, b=0
    // t2: l = .5*20 + .5*(10+0) = 15 ; b = .25*(15-10) + .75*0 = 1.25
    // t3: l = .5*30 + .5*(15+1.25) = 23.125 ; b = .25*8.125 + .75*1.25
    assert(out(0).getDouble(0) == 10.0 && out(0).getDouble(1) == 0.0)
    assert(out(1).getDouble(0) == 15.0 && out(1).getDouble(1) == 1.25)
    assert(out(2).getDouble(0) == 23.125 &&
      out(2).getDouble(1) == 0.25 * 8.125 + 0.75 * 1.25)
  }

  test("sequence packing: closes the bin exactly when the next doc overflows") {
    // cap is 512 in q148; exercise the same recurrence through the query
    // on a synthetic frame via the oracle shape: 300+200 fit (500), +100
    // overflows -> bin 1; an oversized doc (600) still lands alone
    val docs = Seq(
      ("s", 1L, "a " * 299 + "a"),       // 300 tokens
      ("s", 2L, "a " * 199 + "a"),       // 200 -> fill 500
      ("s", 3L, "a " * 99 + "a"),        // 100 -> overflow, bin 1
      ("s", 4L, ("a " * 599 + "a"))      // 600 > cap -> alone in bin 2
    ).toDF("source", "doc_id", "text")
    // drive q148's ACTUAL recurrence (the shared streamFirstFit op, r20)
    val out = graft.queries.PipelineQueries.streamFirstFit(
        docs.select(col("source"), col("doc_id"),
          size(split(col("text"), " ", -1)).as("n_tok")),
        Seq("source"), Seq("doc_id"), "n_tok", 512)
      .select("doc_id", "bin", "bin_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.map(p => (p._2, p._3)).toSeq ==
      Seq((0L, 0L), (0L, 300L), (1L, 0L), (2L, 0L)))
  }

  test("pareto frontier keeps non-dominated rows and all duplicates of them") {
    val parts = Seq(
      (1L, "B", 10.0, 5), (2L, "B", 10.0, 5),   // duplicates: both stay
      (3L, "B", 12.0, 5),                        // dominated by 1/2 (price)
      (4L, "B", 9.0, 3),                         // frontier (cheaper)
      (5L, "B", 8.0, 9),                         // dominates 1,2,4? size 9 >= all, price 8 <= all -> dominates all above
      (6L, "C", 100.0, 1)                        // other brand untouched
    ).toDF("p_partkey", "p_brand", "p_retailprice", "p_size")
    val dom = parts.select(col("p_brand").as("b"),
      col("p_retailprice").as("dp"), col("p_size").as("ds"))
    val kept = parts.join(dom,
        col("p_brand") === col("b")
          && col("dp") <= col("p_retailprice")
          && col("ds") >= col("p_size")
          && (col("dp") < col("p_retailprice") || col("ds") > col("p_size")),
        "left_anti")
      .select("p_partkey").as[Long].collect().sorted.toSeq
    assert(kept == Seq(5L, 6L))
  }

  test("chi-square contributions vanish on an independent contingency table") {
    // perfectly independent 2x2: obs = row*col/N exactly
    val ev = Seq(
      ("a", 0, 10L), ("a", 1, 30L), ("b", 0, 20L), ("b", 1, 60L)
    ).toDF("event_type", "hr", "obs")
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy("event_type")
    val byHr = Window.partitionBy("hr")
    val all = Window.partitionBy()
    val out = ev.select(col("obs"),
        (sum("obs").over(byType).cast("double")
          * sum("obs").over(byHr).cast("double")
          / sum("obs").over(all).cast("double")).as("expected"))
      .withColumn("contrib",
        (col("obs") - col("expected")) * (col("obs") - col("expected"))
          / col("expected"))
      .select("contrib").as[Double].collect()
    assert(out.forall(_ == 0.0))
  }

  test("AUC: perfect separation gives 1.0, reversed gives 0.0, ties 0.5") {
    def auc(rows: Seq[(Double, Boolean)]): Double = {
      import org.apache.spark.sql.expressions.Window
      val df = rows.toDF("score", "pos").withColumn("source", lit("s"))
      val bySrc = Window.partitionBy("source").orderBy("score")
      val byScore = Window.partitionBy("source", "score")
      df.withColumn("rk", rank().over(bySrc))
        .withColumn("cnt", count(lit(1)).over(byScore))
        .groupBy("source")
        .agg(sum(when(col("pos"), lit(1)).otherwise(lit(0))).as("p"),
          sum(when(!col("pos"), lit(1)).otherwise(lit(0))).as("n"),
          sum(when(col("pos"), col("rk") + (col("cnt") - 1) / 2.0)).as("s"))
        .select(((col("s") - col("p") * (col("p") + 1) / 2.0)
          / (col("p").cast("double") * col("n"))).as("auc"))
        .as[Double].head()
    }
    assert(auc(Seq((1.0, false), (2.0, false), (3.0, true), (4.0, true))) == 1.0)
    assert(auc(Seq((4.0, false), (3.0, false), (1.0, true), (2.0, true))) == 0.0)
    assert(auc(Seq((1.0, true), (1.0, false))) == 0.5)
  }

  test("embedding micro-quantization: floor(v*1e6 + 0.5) on negatives too") {
    val df = Seq(0.1234565f, -1.5f, 0.0f).toDF("v")
    val out = df.select(
        floor(col("v").cast("double") * 1000000d + 0.5d).cast("long"))
      .as[Long].collect().toSeq
    // 0.1234565f widens to 0.12345650047... -> 123457 (no shortest-repr
    // midpoint ambiguity: the quantizer sees the exact binary value);
    // -1.5f -> floor(-1500000 + 0.5) = -1500000 (round-half-UP, toward
    // +inf, also for negatives — the convention both engines share here)
    assert(out == Seq(123457L, -1500000L, 0L))
  }

  test("domain mixing thresholds are pure functions of the doc key") {
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("q149_domain_mixing")
    val a = q(spark, dir).collect().map(_.toSeq).toSeq
    val b = q(spark, dir).collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("contamination screen flags an exact benchmark duplicate at frac 1.0") {
    // doc 97 is benchmark (97 % 97 = 0); doc 1 duplicates it exactly
    val docs = Seq(
      (97L, "w1 w2 w3 w4 w5"),
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "x1 x2 x3 x4 x5")
    ).toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      graft.functions.TextExpressions.distinctShingles(col("text"), 3).as("ds"))
    val bench = sh.filter(col("doc_id") % 97 === 0)
      .select(explode(col("ds")).as("s")).distinct()
    val out = sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), size(col("ds")).as("ns"),
        explode(col("ds")).as("s"))
      .join(broadcast(bench), "s")
      .groupBy("doc_id")
      .agg(min("ns").as("n_shingles"), count(lit(1)).as("n_shared"))
      .collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L &&
      out(0).getInt(1) == 3 && out(0).getLong(2) == 3L)
  }
}
