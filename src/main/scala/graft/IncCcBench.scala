package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Fixed-delta incremental-CC maintenance bench — the measurement q232's
  * scaladoc claim ("work per ingest scales with the delta, not the corpus")
  * actually needs: the bL sweep feeds q232 a delta that is 20% OF the
  * corpus at every scale, so its growth curve cannot distinguish the
  * claimed law from linear-in-corpus (r11 verdict #1). This bench holds
  * the ingest batch CONSTANT (replica-0 ids, doc_id < 10⁹ ∧ doc_id % 5 = 0
  * — the same ~1k-doc sf0.1 delta in every textsalt corpus, whose replicas
  * offset ids by k·10⁹) and scales only the corpus.
  *
  * Two timed phases:
  *   1. prep_s — the ONE-TIME corpus indexing a production deployment
  *      amortizes: the n-gram posting index (i, sk), per-doc set sizes,
  *      the CC label table, and the batch file itself, all written to
  *      parquet state (the ingest source delivers the batch as its own
  *      file — the step must not pay a corpus-table scan to find it).
  *   2. step_s — the per-ingest maintenance step against the PERSISTED
  *      state only: the pair delta (Dedup.incrementalCcPairs — batch
  *      postings broadcast, corpus postings STREAM map-side) and the
  *      changed ∪ fresh ∪ singles LABEL-UPDATE set
  *      (Dedup.incrementalCcLabelUpdates — labels stream against the
  *      broadcast delta, nothing corpus-sized crosses an exchange) — the
  *      delta-sized write a production step persists, NOT q232's
  *      corpus-sized relabel aggregate (which is an oracle-output shape).
  *      Both seams are spec-pinned against q232's oracle-verified full
  *      relabel (Round13Spec).
  *
  * The claim's prediction: step_s stays flat-to-sublinear across
  * 1×/10×/100× corpora at a fixed batch — the only corpus-linear terms
  * left are shuffle-free streamed scans of the posting/label state
  * (embarrassingly parallel at cluster width), and every shuffle-bearing
  * stage is delta-sized.
  *
  * Round 14 adds the step's BUCKET-PRUNED twin (step_pruned_s): prep also
  * persists the postings hive-partitioned by pmod(sk, nBuckets)
  * ([[graft.ext.Dedup.ngramPostingsBucketed]]; nBuckets auto-scales ∝
  * corpus postings, override SPARK_GRAFT_POSTING_BUCKETS), and the pruned
  * step probes only the batch's bucket set
  * ([[graft.ext.Dedup.pruneToBatchBuckets]]) — retiring the one remaining
  * corpus-linear term when |batch distinct sk| < nBuckets. The default
  * ~1k-doc batch carries ~23k distinct keys and SATURATES feasible bucket
  * counts (every bucket hit — the regime boundary, reported via
  * buckets_hit/n_buckets); run a second leg with SPARK_GRAFT_BATCH_CAP=250
  * (50 docs, ~1.4k keys) for the continuous-ingest regime where pruning
  * bites. step_bucketed_s (the bucketed layout probed WITHOUT pruning)
  * decomposes the twin into layout tax vs pruning benefit — see the
  * in-code comment. All three steps must produce identical updates
  * (checked in-run). Prints ONE JSON line.
  *
  * Round 15 adds the WIN-REGIME leg (r14 verdict #4): every r14-measured
  * leg had the compact scan winning because the whole posting state was
  * ~11M (i, sk) rows — under a second of scan — while the crossover
  * arithmetic (SCALING.md) says pruning wins once the state outgrows a
  * single scan. SPARK_GRAFT_POSTING_INFLATE=R appends R synthetic rows
  * per real posting with REHASHED keys (xxhash64(sk, r) — sharing no key
  * with any batch shingle, so the update set is provably unchanged; the
  * in-run checksum equality would fail loudly on the ~2⁻⁶⁴-probability
  * collision), persisted in BOTH layouts. Row count is the right
  * inflation axis — a fat payload column would be column-pruned away by
  * parquet and tax neither scan. The batch then probes a state whose
  * full scan costs real time while the pruned probe still reads only
  * its hit buckets.
  */
object IncCcBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val batchCap =
      sys.env.getOrElse("SPARK_GRAFT_BATCH_CAP", "1000000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val state = java.nio.file.Files
      .createTempDirectory("graft_inccc_state").toString

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    val isBatch = col("doc_id") < batchCap && col("doc_id") % 5 === 0
    val corpus = docs.filter(!isBatch)
    val corpusDocs = corpus.count()
    val batchDocs = docs.filter(isBatch).count()

    val inflate = sys.env.getOrElse("SPARK_GRAFT_POSTING_INFLATE", "0").toLong

    val (prepS, (nBuckets, nPostRows)) = time {
      Dedup.ngramPostings(corpus, "doc_id", "text", 3)
        .write.mode("overwrite").parquet(s"$state/postings_real")
      // win-regime inflation: R synthetic rows per real posting, keys
      // rehashed per replica — they join nothing (no batch key overlap),
      // they just make the state's PROBED columns big enough that a full
      // scan costs real time. 0 → the state IS the real postings.
      locally {
        val real = spark.read.parquet(s"$state/postings_real")
        val full = if (inflate <= 0) real else real.unionByName(
          real.crossJoin(spark.range(1, inflate + 1).toDF("r"))
            .select(col("i"), xxhash64(col("sk"), col("r")).as("sk")))
        full.write.mode("overwrite").parquet(s"$state/postings")
      }
      // sizes/labels derive from the REAL postings only (synthetic rows
      // are key-disjoint filler, not documents)
      Dedup.ngramPostingSizes(spark.read.parquet(s"$state/postings_real"))
        .write.mode("overwrite").parquet(s"$state/sizes")
      // labels rebuild from the just-persisted index, not by re-shingling
      // the corpus (ngramJaccardPairsFromPostings ≡ ngramJaccardPairs,
      // Round14Spec) — prep pays ONE shingle pass over the corpus text
      Dedup.connectedComponents(
          Dedup.ngramJaccardPairsFromPostings(
            spark.read.parquet(s"$state/postings_real"),
            spark.read.parquet(s"$state/sizes"), 0.5))
        .write.mode("overwrite").parquet(s"$state/labels")
      docs.filter(isBatch)
        .write.mode("overwrite").parquet(s"$state/batch")
      // the BUCKETED posting layout (r13 verdict #2): bucket count ∝
      // corpus postings (≈3k rows/bucket, clamped), so at any scale a
      // pruned probe reads O(|batch keys|) constant-size buckets. One
      // file per bucket dir via repartition on the partition column.
      val nPost = spark.read.parquet(s"$state/postings").count()
      val b = sys.env.get("SPARK_GRAFT_POSTING_BUCKETS").map(_.toInt)
        .getOrElse(math.min(16384L, math.max(64L, nPost / 3000L)).toInt)
      spark.read.parquet(s"$state/postings")
        .withColumn("bucket", Dedup.postingBucket(col("sk"), b))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$state/postings_bucketed")
      (b, nPost)
    }

    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))

    val postings = spark.read.parquet(s"$state/postings")
    val sizes = spark.read.parquet(s"$state/sizes")
    val labels = spark.read.parquet(s"$state/labels")

    def runStep(post: DataFrame => DataFrame): (Double, (Long, Long, Long)) =
      time {
        // the step IS the library seams Round13Spec pins against q232's
        // oracle-verified full relabel: pair delta against the persisted
        // postings, then the delta-sized changed ∪ fresh ∪ singles update
        // set
        val b = spark.read.parquet(s"$state/batch").localCheckpoint(true)
        val newPairs = Dedup.incrementalCcPairs(post(postings), sizes, b,
            "doc_id", "text", 3, 0.5)
          .localCheckpoint(true)
        val updates = Dedup.incrementalCcLabelUpdates(labels, newPairs,
          b.select(col("doc_id").as("id")))
        val r = updates.agg(count(lit(1)).as("n_updates"),
          sum(col("id") + col("label")).as("chk")).head()
        val nPairs = newPairs.count()
        (r.getLong(0), r.getLong(1), nPairs)
      }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    val (stepS, out) = runStep(identity)

    // the PRUNED step: identical seams, but the corpus posting probe is
    // the bucket-partitioned layout pruned to the batch's bucket set —
    // the r13 verdict-#2 fix for the measured per-ingest floor (the full
    // posting-state scan). Batch shingling here is delta-sized prep for
    // the prune, not corpus work.
    clear()
    val bucketed = spark.read.parquet(s"$state/postings_bucketed")
    var bucketsHit = 0
    val (stepPrunedS, outPruned) = runStep { _ =>
      val bPost = Dedup.ngramPostings(
          spark.read.parquet(s"$state/batch"), "doc_id", "text", 3)
        .localCheckpoint(true)
      bucketsHit = bPost.select(Dedup.postingBucket(col("sk"), nBuckets))
        .distinct().count().toInt
      Dedup.pruneToBatchBuckets(bucketed, bPost, nBuckets)
    }
    // a pruned probe that changes the answer is a broken index, not a
    // faster one — fail loudly before printing numbers
    require(out == outPruned,
      s"pruned step diverged from flat step: flat=$out pruned=$outPruned")

    // the bucketed layout probed WITHOUT pruning — the term that separates
    // LAYOUT TAX from PRUNING BENEFIT. step_pruned_s vs step_s conflates
    // two effects with opposite signs: reading fewer buckets (monotone
    // savings, same layout) and reading one-file-per-bucket instead of the
    // compact state (per-file open overhead — the tax the bucket sizing
    // law governs). With this term: tax = step_bucketed_s − step_s,
    // benefit = step_bucketed_s − step_pruned_s. At test scale ~25 KB
    // bucket files make the tax dominate; at production block sizes
    // (bucket ≈ 128 MB) the tax term vanishes and the benefit term is the
    // corpus-sized scan the prune avoids.
    clear()
    val (stepBucketedS, outBucketed) = runStep(_ => bucketed.drop("bucket"))
    require(out == outBucketed,
      s"bucketed full step diverged from flat step: " +
        s"flat=$out bucketed=$outBucketed")

    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"inc_cc_fixed_delta","value":${f(stepS)},""" +
      s""""unit":"sec","prep_s":${f(prepS)},"step_s":${f(stepS)},""" +
      s""""step_pruned_s":${f(stepPrunedS)},""" +
      s""""step_bucketed_s":${f(stepBucketedS)},"n_buckets":$nBuckets,""" +
      s""""buckets_hit":$bucketsHit,""" +
      s""""inflate":$inflate,"posting_rows":$nPostRows,""" +
      s""""corpus_docs":$corpusDocs,"batch_docs":$batchDocs,""" +
      s""""n_new_pairs":${out._3},"n_label_updates":${out._1},""" +
      s""""chk":${out._2},"sf":"$sfDir"}""")
    spark.stop()
    scala.util.Using.resource(
        java.nio.file.Files.walk(java.nio.file.Paths.get(state))) { w =>
      w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
