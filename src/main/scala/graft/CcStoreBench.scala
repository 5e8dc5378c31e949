package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Label-state write-cost bench: the v1 maintenance step
  * ([[graft.streaming.Streams.ccMaintenanceDiskStep]] — a FULL label
  * generation per epoch) vs the v2 store step
  * ([[graft.streaming.Streams.ccStoreStep]] — the delta-sized update set
  * is the ONLY per-epoch label write, labels served merge-on-read).
  *
  * The r15 verdict's #1 argument was structural ("a ~TB-class rewrite per
  * micro-batch at 100B docs"); this bench makes it a measured number at a
  * FIXED ingest delta and growing corpus — the IncCcBench discipline:
  * the delta is always replica-0's doc_id%5=0 docs split into 3 epochs,
  * the corpus is inflated SPARK_GRAFT_LABEL_REPL× by salted replicas
  * (ids offset r·10⁹, every token suffixed `_r`, so replicas share no
  * shingles and the label structure repeats — in-Scala textsalt,
  * tools/make_stress_corpus.py semantics). Prediction: v1's per-epoch
  * label write (rows AND bytes) grows linearly with the corpus while
  * v2's stays delta-sized; the one v2 write that IS corpus-sized — the
  * threshold FOLD — is timed separately, because its cost is amortized
  * over maxLabelDeltas epochs instead of paid every epoch.
  *
  * In-run exactness gate: after the 3 epochs the v1 label table and the
  * v2 merge-on-read view must agree row-for-row (count + id·label
  * checksum) — a cheaper v2 that drifted is a broken store, not a win.
  * Prints ONE JSON line.
  */
object CcStoreBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repl = sys.env.getOrElse("SPARK_GRAFT_LABEL_REPL", "1").toInt
    require(repl >= 1, s"SPARK_GRAFT_LABEL_REPL must be >= 1 (got $repl)")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.Streams

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def dirStats(dir: String): (Long, Long) = { // (rows, bytes) of parquet
      val p = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(p)) (0L, 0L)
      else {
        val bytes = scala.util.Using.resource(java.nio.file.Files.walk(p)) {
          w =>
            import scala.jdk.CollectionConverters._
            w.iterator().asScala
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .map(java.nio.file.Files.size).sum
        }
        (spark.read.parquet(dir).count(), bytes)
      }
    }
    def rmTree(root: String): Unit =
      scala.util.Using.resource(java.nio.file.Files
          .walk(java.nio.file.Paths.get(root))) { w =>
        w.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      }

    val docs0 = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    // salted replicas: replica 0 is the original corpus; replica r>0
    // offsets ids by r·10⁹ and suffixes every token with `_r`, so no
    // shingle crosses replicas — the pair/label structure repeats R×
    // (the textsalt law), which is exactly what a labels-table-size sweep
    // needs. Replicas materialize ONCE to parquet so neither leg pays
    // regeneration inside a timed step.
    val staged = java.nio.file.Files
      .createTempDirectory("graft_ccstore_bench").toString
    // try/finally so a failed step or a tripped exactness gate still sweeps
    // the staged corpus (up to 100x salted replicas under /tmp) and stops
    // the session (r16 ADVICE #4)
    try {
    val docs =
      if (repl == 1) docs0
      else docs0.crossJoin(spark.range(repl).toDF("r"))
        .select((col("doc_id") + col("r") * 1000000000L).as("doc_id"),
          when(col("r") === 0, col("text")).otherwise(array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("_"), col("r"))), " ")).as("text"))
    docs.write.mode("overwrite").parquet(s"$staged/docs")
    val all = spark.read.parquet(s"$staged/docs")
    val isBatch = col("doc_id") < 1000000000L && col("doc_id") % 5 === 0
    val corpus = all.filter(!isBatch)
    val corpusDocs = corpus.count()
    // the fixed 3-epoch delta: replica-0 %5=0 docs split by %15 (the q261
    // staging), persisted so each step reads its batch as a file
    val epochs = (0 until 3).map { e =>
      val p = s"$staged/batch$e"
      all.filter(isBatch && col("doc_id") % 15 === e * 5)
        .write.mode("overwrite").parquet(p)
      p
    }
    val batchDocs = epochs.map(p => spark.read.parquet(p).count())

    val v1Root = s"$staged/v1"
    val v2Root = s"$staged/v2"
    val (initV1S, _) = time(Streams.ccMaintenanceInit(corpus, v1Root))
    clear()
    val (initV2S, _) = time(Streams.ccStoreInit(corpus, v2Root))
    clear()

    // per-epoch LABEL-WRITE wall, timed in isolation (r16 verdict #6):
    // step wall at these corpus sizes is dominated by the probe/shingle
    // floor BOTH loops pay (~4-5 s, and the label table itself is
    // dup-cluster-bounded, not corpus-sized), so the v1-vs-v2 write cost
    // never surfaces in v1_step_s/v2_step_s. The onLabelWrite hooks time
    // the SAME semantic window in both loops — each epoch's complete
    // label-path writes: v1 = update-delta write + the full-table
    // applyCcLabelUpdates generation rewrite; v2 = the update-delta
    // write (+ _rows sidecar) alone. Both include the shared delta
    // write, so v1_labelwrite_s − v2_labelwrite_s isolates exactly the
    // rewrite the v2 store eliminates.
    val v1LabelWriteS = scala.collection.mutable.ArrayBuffer.empty[Double]
    val v2LabelWriteS = scala.collection.mutable.ArrayBuffer.empty[Double]
    // v1: full label generation per epoch
    val v1 = epochs.zipWithIndex.map { case (p, e) =>
      val b = spark.read.parquet(p)
      val (s, _) = time(
        Streams.ccMaintenanceDiskStep(v1Root, 3, 0.5,
          onLabelWrite = t => { v1LabelWriteS += t; () })(b, e.toLong))
      clear()
      val (rows, bytes) = dirStats(s"$v1Root/gens/labels/epoch=$e")
      (s, rows, bytes)
    }
    // v2: update delta only (folds disabled — the fold is timed once,
    // separately, below: its cost is amortized, not per-epoch)
    val v2 = epochs.zipWithIndex.map { case (p, e) =>
      val b = spark.read.parquet(p)
      val (s, _) = time(Streams.ccStoreStep(v2Root, 3, 0.5, 0,
        maxLabelDeltas = Int.MaxValue, maxPostingGens = Int.MaxValue,
        // row trigger off too: this leg times the PURE delta step; the
        // fold is timed once, separately, below
        maxLabelDeltaRows = Long.MaxValue,
        onLabelWrite = t => { v2LabelWriteS += t; () })(b, e.toLong))
      clear()
      val (rows, bytes) = dirStats(s"$v2Root/updates/batch=$e")
      (s, rows, bytes)
    }
    // the amortized corpus-sized write: ONE label fold after the 3 epochs
    // (threshold 0 forces it), folding all deltas into base g=2
    val (foldS, _) = time(Streams.ccStoreFoldIfNeeded(spark, v2Root,
      epoch = 3L, nBuckets = 0, maxLabelDeltas = 0,
      maxPostingGens = Int.MaxValue))
    val (foldRows, foldBytes) = dirStats(s"$v2Root/gens/label_base/g=2")

    // exactness gate: the v2 merge-on-read labels == the v1 full table.
    // Both factors reduced mod primes: replica ids/labels reach ~1e11 at
    // repl=100 and an unreduced id%p * label summed over 100k+ rows
    // overflows int64 (measured at repl=10 under ANSI mode).
    def chkOf(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(col("id") % 1000003L * (col("label") % 999983L))).head()
      (r.getLong(0), r.getLong(1))
    }
    val c1 = chkOf(Streams.ccMaintenanceLabels(spark, v1Root))
    val c2 = chkOf(Streams.ccStoreLabels(spark, v2Root))
    require(c1 == c2, s"v2 labels diverged from v1: v1=$c1 v2=$c2")

    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def arrD(xs: Seq[Double]) = xs.map(f).mkString("[", ",", "]")
    def arrL(xs: Seq[Long]) = xs.mkString("[", ",", "]")
    println(s"""{"metric":"cc_label_write_scale","repl":$repl,""" +
      s""""corpus_docs":$corpusDocs,"batch_docs":${arrL(batchDocs)},""" +
      s""""label_rows":${c1._1},"chk":${c1._2},""" +
      s""""init_v1_s":${f(initV1S)},"init_v2_s":${f(initV2S)},""" +
      s""""v1_step_s":${arrD(v1.map(_._1))},""" +
      s""""v1_labelwrite_s":${arrD(v1LabelWriteS.toSeq)},""" +
      s""""v1_label_rows":${arrL(v1.map(_._2))},""" +
      s""""v1_label_bytes":${arrL(v1.map(_._3))},""" +
      s""""v2_step_s":${arrD(v2.map(_._1))},""" +
      s""""v2_labelwrite_s":${arrD(v2LabelWriteS.toSeq)},""" +
      s""""v2_update_rows":${arrL(v2.map(_._2))},""" +
      s""""v2_update_bytes":${arrL(v2.map(_._3))},""" +
      s""""fold_s":${f(foldS)},"fold_rows":$foldRows,""" +
      s""""fold_bytes":$foldBytes,"sf":"$sfDir"}""")
    } finally {
      spark.stop()
      rmTree(staged)
    }
  }
}
