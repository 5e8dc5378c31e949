package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden tests for the second round-6 batch (rank movers, join-cardinality
  * estimation, weighted sampling, freshness, life table, A/B z-test,
  * Bollinger bands) on hand-checked inputs.
  */
class Round6BSpec extends SparkSpec {
  import spark.implicits._

  test("histogram estimate is exact when a bucket holds one key") {
    // a: key 7 ×4; b: key 7 ×3 → one bucket, est = 4·3/1 = 12 = |a⋈b|
    val a = Seq.fill(4)(7L).toDF("k")
    val b = Seq.fill(3)(7L).toDF("k")
    def hist(df: org.apache.spark.sql.DataFrame) = df
      .groupBy((graft.util.StableHash.h48(col("k")) % 64).as("bkt"))
      .agg(count(lit(1)).as("c"), countDistinct(col("k")).as("d"))
    val est = hist(a).toDF("bkt", "ca", "da")
      .join(hist(b).toDF("bkt2", "cb", "db"), col("bkt") === col("bkt2"))
      .agg(sum((col("ca") * col("cb")).cast("double")
        / greatest(col("da"), col("db"))).as("est")).head().getDouble(0)
    val actual = a.join(b, Seq("k")).count()
    assert(est == 12d && actual == 12L)
  }

  test("weighted Bernoulli sample keeps max-weight rows and drops zero-weight") {
    val mx = 100L
    val df = Seq((1L, 100L), (2L, 0L), (3L, 100L), (4L, 0L))
      .toDF("doc_id", "w")
    val kept = df
      .filter(graft.util.StableHash.h48(col("doc_id")) * lit(mx)
        < col("w") * lit(1L << 48))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L)) // w = maxw always kept, w = 0 never
  }

  test("life table reverse-cumulative at-risk counts") {
    // lifetimes 0,0,1,2 → (m=0: n=4,d=2) (m=1: n=2,d=1) (m=2: n=1,d=1)
    val life = Seq(0, 0, 1, 2).toDF("m")
    val out = life.groupBy("m").agg(count(lit(1)).as("churned"))
      .withColumn("n_at_risk", sum("churned").over(
        Window.orderBy(col("m").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("m").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(1)))
    assert(out.toSeq == Seq((0, 4L, 2L), (1, 2L, 1L), (2, 1L, 1L)))
  }

  test("two-proportion z-test matches the hand-computed statistic") {
    val (n0, n1, c0, c1) = (75d, 75d, 25d, 34d)
    val p = (c0 + c1) / (n0 + n1)
    val z = (c0 / n0 - c1 / n1) /
      math.sqrt((p * (1 - p)) * (1 / n0 + 1 / n1))
    assert(math.abs(z - -1.504324) < 1e-6)
    val row = SparkEntry.queries("q179_ab_ztest")(
      spark, "/root/testdata/sf0.001").head()
    // z is finite and p0/p1 are genuine proportions
    assert(!row.getDouble(6).isNaN)
    assert(row.getDouble(4) > 0 && row.getDouble(4) < 1)
  }

  test("Bollinger flags the planted spike and nothing on a flat series") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def mk(vals: Seq[Double]) = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, "a", new java.sql.Timestamp(ts0.getTime + i * 1000L), v)
    }.toDF("event_id", "event_type", "ts", "value")
    val flat = mk(Seq.fill(25)(5.0))
    val spiked = mk(Seq.fill(24)(5.0) :+ 50.0)
    def breakouts(df: org.apache.spark.sql.DataFrame) = {
      val dec = org.apache.spark.sql.types.DecimalType(27, 6)
      val win = Window.partitionBy("event_type")
        .orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
      df.select(col("event_id"), col("value"),
          count(lit(1)).over(win).as("n20"),
          sum(col("value").cast(dec)).over(win).as("s"),
          sum((col("value") * col("value")).cast(dec)).over(win).as("ssq"))
        .filter(col("n20") === 20)
        .select(col("event_id"), col("value"),
          (col("s").cast("double") / col("n20")).as("mean"),
          sqrt(greatest((col("ssq").cast("double")
            - col("s").cast("double") * col("s").cast("double")
              / col("n20")) / (col("n20") - 1), lit(0d))).as("sd"))
        .filter(col("value") > col("mean") + lit(2d) * col("sd")
          || col("value") < col("mean") - lit(2d) * col("sd"))
        .collect()
    }
    assert(breakouts(flat).isEmpty)
    val hits = breakouts(spiked)
    assert(hits.length == 1 && hits.head.getLong(0) == 24L)
  }

  test("rank movers ranks on exact cents with supplier tie-break") {
    val out = SparkEntry.queries("q174_rank_movers")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length <= 20 && out.nonEmpty)
    // rank gains are non-increasing in the output order
    val gains = out.map(_.getInt(5)).toSeq
    assert(gains == gains.sorted.reverse)
  }

  test("freshness audit lag is zero for the globally-latest stream") {
    val out = SparkEntry.queries("q177_freshness_audit")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.map(_.getLong(3)).min == 0L) // some stream IS the watermark
    assert(out.forall(_.getLong(3) >= 0L))
  }
}
