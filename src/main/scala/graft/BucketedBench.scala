package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what bucketing buys the fact-fact join at a given corpus scale —
  * the b6 sweep's "bucketing is the remedy" claim as a number instead of an
  * argument. Three timed phases over lineitem ⋈ orders on the order key
  * (the q68 aggregate):
  *   1. shuffle_join_s   — the plain-parquet plan (both sides exchange);
  *   2. bucket_write_s   — one-time cost: both sides written bucketed
  *                         `SPARK_GRAFT_BUCKETS` (default 32) ways on the
  *                         join key, pre-repartitioned by bucket id so each
  *                         task writes one bucket file (q68's discipline);
  *   3. bucketed_join_s  — the same aggregate over the bucketed tables
  *                         (SortMergeJoin with NO exchange on either side).
  * The two join results are asserted row-identical, so the speedup is never
  * quoted off a wrong plan. Prints ONE JSON line. At 100 TB phase 2 is the
  * table's ingest-time layout choice amortized over every subsequent join;
  * phases 1 vs 3 are the recurring per-query cost being compared.
  */
object BucketedBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "32").toInt
    val wh = s"/tmp/graft_bucketed_bench_wh_$buckets"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$wh/cat")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def agg(li: DataFrame, ord: DataFrame): DataFrame =
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_lines"),
          graft.util.OracleSafe.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderstatus")

    def time[T](f: => T): (Double, T) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_orderstatus")
    // untimed warmup (JIT/codegen) on a slice
    agg(li.limit(10000), ord.limit(10000)).collect()

    val (tShuffle, shuffleRows) = time(agg(li, ord).collect())

    spark.sql("DROP TABLE IF EXISTS bb_li")
    spark.sql("DROP TABLE IF EXISTS bb_ord")
    def bucketId(c: org.apache.spark.sql.Column) = pmod(hash(c), lit(buckets))
    val (tWrite, _) = time {
      li.repartition(buckets, bucketId(col("l_orderkey")))
        .write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li").mode("overwrite").saveAsTable("bb_li")
      ord.repartition(buckets, bucketId(col("o_orderkey")))
        .write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/ord").mode("overwrite").saveAsTable("bb_ord")
    }

    val bucketedPlan = agg(spark.table("bb_li"), spark.table("bb_ord"))
    val (tBucketed, bucketedRows) = time(bucketedPlan.collect())
    // the speedup claim is only valid if the join inputs really read
    // pre-bucketed: after AQE settles, the ONLY hash exchange allowed is
    // the post-join groupBy's (PlanShapeSpec's q68 rule, re-asserted here
    // at sweep scale so a silent plan regression can't ship a fake ratio)
    val finalPlan = (bucketedPlan.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size

    val rowsMatch = shuffleRows.map(_.toString).sorted
      .sameElements(bucketedRows.map(_.toString).sorted)
    spark.sql("DROP TABLE IF EXISTS bb_li")
    spark.sql("DROP TABLE IF EXISTS bb_ord")

    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"bucketed_join_bench","shuffle_join_s":${f(tShuffle)},""" +
      s""""bucket_write_s":${f(tWrite)},"bucketed_join_s":${f(tBucketed)},""" +
      s""""buckets":$buckets,"join_exchanges":$exchanges,""" +
      s""""rows_match":$rowsMatch,"sf":"$sfDir"}""")
    spark.stop()
    if (!rowsMatch || exchanges > 1) {
      System.err.println(s"BUCKETED BENCH FAILED: rows_match=$rowsMatch " +
        s"hash_exchanges=$exchanges (expected <= 1: the post-join groupBy)")
      sys.exit(1)
    }
  }
}
