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
  *      state only: shingle the batch, within-batch pairs
  *      (Dedup.ngramJaccardPairs), cross corpus↔batch pairs via the
  *      persisted postings (Dedup.crossCorpusJaccardPairsIndexed — the
  *      batch postings broadcast, the corpus postings STREAM map-side),
  *      collapse endpoints through the persisted labels (endpoint set
  *      semi-joins the label table — labels stream, nothing corpus-sized
  *      crosses an exchange), CC on the collapsed delta, and the
  *      LABEL-UPDATE set (changed labels = label table inner-joined to
  *      the broadcast delta + fresh endpoints + batch singletons) — the
  *      delta-sized write a production step persists, NOT q232's
  *      corpus-sized relabel aggregate (which is an oracle-output shape).
  *
  * The claim's prediction: step_s stays flat-to-sublinear across
  * 1×/10×/100× corpora at a fixed batch — the only corpus-linear terms
  * left are shuffle-free streamed scans of the posting/label state
  * (embarrassingly parallel at cluster width), and every shuffle-bearing
  * stage is delta-sized. Prints ONE JSON line.
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

    val (prepS, _) = time {
      Dedup.ngramPostings(corpus, "doc_id", "text", 3)
        .write.mode("overwrite").parquet(s"$state/postings")
      Dedup.ngramPostingSizes(spark.read.parquet(s"$state/postings"))
        .write.mode("overwrite").parquet(s"$state/sizes")
      Dedup.connectedComponents(
          Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5))
        .write.mode("overwrite").parquet(s"$state/labels")
      docs.filter(isBatch)
        .write.mode("overwrite").parquet(s"$state/batch")
    }

    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))

    val postings = spark.read.parquet(s"$state/postings")
    val sizes = spark.read.parquet(s"$state/sizes")
    val labels = spark.read.parquet(s"$state/labels")

    val (stepS, out) = time {
      val b = spark.read.parquet(s"$state/batch").localCheckpoint(true)
      val within = Dedup.ngramJaccardPairs(b, "doc_id", "text", 3, 0.5)
        .select("i", "j")
      val cross = Dedup.crossCorpusJaccardPairsIndexed(postings, sizes, b,
          "doc_id", "text", 3, 0.5)
        .select("i", "j")
      val newPairs = within.unionByName(cross).localCheckpoint(true)
      // endpoint label lookup WITHOUT shuffling the label table: the
      // (delta-sized) endpoint set broadcasts into a semi join, labels
      // stream map-side (q232's plain left join would SMJ-shuffle the
      // corpus-sized label table — fine at oracle scale, not here)
      val ends = newPairs.select(col("i").as("id"))
        .unionAll(newPairs.select(col("j").as("id"))).distinct()
        .localCheckpoint(true)
      val endLabels = labels
        .join(broadcast(ends), Seq("id"), "left_semi")
        .localCheckpoint(true)
      val collapsed = newPairs
        .join(endLabels.select(col("id").as("i"), col("label").as("li")),
          Seq("i"), "left")
        .join(endLabels.select(col("id").as("j"), col("label").as("lj")),
          Seq("j"), "left")
        .select(coalesce(col("li"), col("i")).as("i"),
          coalesce(col("lj"), col("j")).as("j"))
      val delta = Dedup.connectedComponents(collapsed)
        .select(col("id").as("dl"), col("label").as("nlabel"))
        .localCheckpoint(true)
      // the persisted update set: members of merged components whose label
      // moves (labels stream against the broadcast delta), fresh endpoints,
      // and batch singletons (trivial inserts at their own id)
      val changed = labels.join(broadcast(delta), col("label") === col("dl"))
        .filter(col("nlabel") =!= col("label"))
        .select(col("id"), col("nlabel").as("label"))
      val fresh = ends
        .join(endLabels.select(col("id")), Seq("id"), "left_anti")
        .join(delta, col("id") === col("dl"), "left")
        .select(col("id"), coalesce(col("nlabel"), col("id")).as("label"))
      val singles = b.select(col("doc_id").as("id"))
        .join(ends, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("label"))
      val updates = changed.unionByName(fresh).unionByName(singles)
      val r = updates.agg(count(lit(1)).as("n_updates"),
        sum(col("id") + col("label")).as("chk")).head()
      val nPairs = newPairs.count()
      (r.getLong(0), r.getLong(1), nPairs)
    }

    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"inc_cc_fixed_delta","value":${f(stepS)},""" +
      s""""unit":"sec","prep_s":${f(prepS)},"step_s":${f(stepS)},""" +
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
