package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Build-vs-search split for the external-query ANN path (r11 verdict #4):
  * the bS sweep's q236 number times index BUILD + search together, but a
  * production retrieval user cares about per-query latency against a
  * PERSISTED index. Phases:
  *   1. build_s  — build the autoscaled two-level IVF-PQ index + its
  *      coarse/fine-routing state tables and PERSIST all three to parquet
  *      (q221's discipline, two-level) — the one-time cost;
  *   2. search_cold_s — route the 20 external queries
  *      (VectorQueries.externalQueries — the exact q236 query set) against
  *      the persisted tables and run ivfPqSearchQueries, first time in the
  *      session (pays the parquet cold read);
  *   3. search_warm_s — the same search again (the steady-state page-cache
  *      number a resident deployment sees; s_per_query = warm / 20).
  * Prints ONE JSON line.
  */
object AnnSearchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val state = java.nio.file.Files
      .createTempDirectory("graft_annsearch_state").toString

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val cells = math.max(8L, n / 100L).toInt
    val nCoarse = math.max(4, math.ceil(math.sqrt(cells.toDouble)).toInt)
    val np = graft.queries.VectorQueries.SemDedupProbes

    val (buildS, _) = time {
      val coarse = Similarity.ivfCoarseCentroids(emb, nCoarse)
      coarse.write.mode("overwrite").parquet(s"$state/coarse")
      Similarity
        .routeFineCentroids(Similarity.ivfCentroids(emb, cells), coarse)
        .write.mode("overwrite").parquet(s"$state/froute")
      Similarity.buildIvfPqIndexTwoLevel(emb, cells, np, nCoarse, 2)
        .write.mode("overwrite").parquet(s"$state/index")
    }

    spark.catalog.clearCache()
    val index = spark.read.parquet(s"$state/index")
    val coarse = spark.read.parquet(s"$state/coarse")
    val froute = spark.read.parquet(s"$state/froute")
    val xq = graft.queries.VectorQueries.externalQueries(spark, sfDir)

    def search(): Long = {
      val qcells = Similarity.assignProbesTwoLevelWith(
          xq.select(col("qid").as("vec_id"), col("qv").as("v")),
          coarse, froute, np, 2)
        .select(col("vec_id").as("qid"), explode(col("cells")).as("cell"))
      Similarity.ivfPqSearchQueries(index, xq, qcells, 5,
          graft.queries.VectorQueries.IvfPqRerank)
        .count()
    }

    val (coldS, rowsCold) = time(search())
    val (warmS, rowsWarm) = time(search())

    spark.stop()
    scala.util.Using.resource(
        java.nio.file.Files.walk(java.nio.file.Paths.get(state))) { w =>
      w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
    // gate BEFORE the metric line: a failed leg must never print timings a
    // sweep-table grep could quote (the BucketedBench failed_rc lesson,
    // ADVICE r12 — this binary had the trap the r11 runner patch fixed)
    if (rowsCold != rowsWarm || rowsWarm == 0) {
      System.err.println(s"ANN SEARCH BENCH FAILED: cold=$rowsCold " +
        s"warm=$rowsWarm (expected equal, nonzero)")
      sys.exit(1)
    }
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"ann_search_split","value":${f(warmS)},""" +
      s""""unit":"sec","build_s":${f(buildS)},"search_cold_s":${f(coldS)},""" +
      s""""search_warm_s":${f(warmS)},"s_per_query":${f(warmS / 20.0)},""" +
      s""""n_vectors":$n,"cells":$cells,"rows":$rowsWarm,"sf":"$sfDir"}""")
  }
}
