package graft

import org.apache.spark.sql.functions._

/** Round-17 invariants (the r16 verdict's #1/#2/#4): the merge-storm
  * valve on the v2 CC store — count-guarded label-view broadcast and the
  * ROW-based fold trigger — the shared [[graft.util.GenStore]] seam, and
  * the GC retention knob for standalone serving readers.
  */
class Round17Spec extends SparkSpec {

  private def rmTree(root: String): Unit =
    scala.util.Using.resource(java.nio.file.Files
        .walk(java.nio.file.Paths.get(root))) { w =>
      w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }

  private def exists(p: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(p))

  /** The adversarial corpus: two 30-doc components that share no
    * shingles, plus unrelated singletons. Component A carries min-id 0;
    * component B min-id 100 — so a batch doc bridging them rewrites
    * EVERY label of the losing (B) side: one epoch, component-sized
    * update delta.
    */
  private def stormCorpus = {
    import spark.implicits._
    val a = (0L until 30L).map(i => (i, "alpha beta gamma delta"))
    val b = (100L until 130L).map(i => (i, "omega psi chi phi"))
    val singles = (200L until 210L).map(i => (i, s"solo$i one two three"))
    (a ++ b ++ singles).toDF("doc_id", "text")
  }

  test("merge storm: one batch doc bridging two components makes a " +
      "component-sized update delta; the ROW-based fold trigger fires at " +
      "the very next step (epoch count alone never would), labels stay " +
      "exact vs the v1 full-rewrite loop, and GC retention keeps a " +
      "pre-fold reader's snapshot alive") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_r17_storm").toString
    val rootV1 = java.nio.file.Files
      .createTempDirectory("graft_r17_storm_v1").toString
    try {
      import graft.streaming.Streams
      // 3-shingle Jaccard(bridge, A-doc) = 2/6 — the bridge connects at
      // threshold 0.3 but A and B stay disjoint (Jaccard 0)
      val bridge = Seq((500L,
        "alpha beta gamma delta omega psi chi phi")).toDF("doc_id", "text")
      val quiet = Seq((600L, "zeta eta theta iota")).toDF("doc_id", "text")
      val step: (org.apache.spark.sql.DataFrame, Long) => Unit =
        Streams.ccStoreStep(s"$root/state", k = 3, threshold = 0.3,
          // epoch trigger OFF — only the row trigger can fold here
          maxLabelDeltas = Int.MaxValue, maxPostingGens = Int.MaxValue,
          maxLabelDeltaRows = 10L)
      Streams.ccStoreInit(stormCorpus, s"$root/state", k = 3,
        threshold = 0.3)
      step(bridge, 0L)

      // the storm landed: B's 30 labels move to A's canonical 0, plus the
      // bridge — a 31-row delta from ONE epoch (> maxLabelDeltaRows)
      val upd = spark.read.parquet(s"$root/state/updates/batch=0")
      assert(upd.count() == 31L &&
        upd.agg(countDistinct("label")).head().getLong(0) == 1L)
      // the `_rows` sidecar recorded it (driver-readable, no job)
      val sidecar = java.nio.file.Paths
        .get(s"$root/state/updates/batch=0/_rows")
      assert(java.nio.file.Files.exists(sidecar) &&
        new String(java.nio.file.Files.readAllBytes(sidecar)).trim == "31")
      // fold-lag rule: epoch 0's own step may only cover <= -1, which the
      // init base already does — no fold yet
      assert(!exists(s"$root/state/gens/label_base/g=0"))

      // a standalone serving reader resolves its view NOW (base -1 ∪
      // delta 0) — the snapshot GC retention must protect
      val preFoldExpected = Streams
        .ccStoreLabels(spark, s"$root/state")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val preFoldReader = Streams.ccStoreLabels(spark, s"$root/state")

      // next epoch: the row trigger (31 > 10) folds the storm into base
      // g=0 even though the EPOCH count (1) could never trip
      // maxLabelDeltas = Int.MaxValue
      step(quiet, 1L)
      assert(exists(s"$root/state/gens/label_base/g=0/_SUCCESS"),
        "the row-based fold trigger did not fire on the merge-storm delta")

      // retention = 2: the sweep keeps base -1 and delta 0 — the pre-fold
      // reader still reads a consistent snapshot
      Streams.ccStoreGc(s"$root/state", retainBases = 2)
      assert(exists(s"$root/state/gens/label_base/g=-1/_SUCCESS") &&
        exists(s"$root/state/updates/batch=0"))
      val preFoldRead = preFoldReader
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(preFoldRead == preFoldExpected,
        "a view resolved before the fold+GC read inconsistently under " +
          "retainBases = 2")

      // retention = 1 ≡ the original layout: superseded base and folded
      // deltas leave disk; a second sweep finds nothing
      assert(Streams.ccStoreGc(s"$root/state", retainBases = 1) > 0)
      assert(!exists(s"$root/state/gens/label_base/g=-1") &&
        !exists(s"$root/state/updates/batch=0"))
      assert(Streams.ccStoreGc(s"$root/state") == 0)

      // exactness: the v1 full-label-rewrite loop over the same epochs
      Streams.ccMaintenanceInit(stormCorpus, s"$rootV1/state", k = 3,
        threshold = 0.3)
      val v1Step: (org.apache.spark.sql.DataFrame, Long) => Unit =
        Streams.ccMaintenanceDiskStep(s"$rootV1/state", 3, 0.3)
      v1Step(bridge, 0L)
      v1Step(quiet, 1L)
      val v1 = Streams.ccMaintenanceLabels(spark, s"$rootV1/state")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val v2 = Streams.ccStoreLabels(spark, s"$root/state")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(v2.nonEmpty && v2 == v1,
        s"storm-folded v2 labels diverged from v1 (v2=${v2.size}, " +
          s"v1=${v1.size})")
      // and the merge really happened: every A/B/bridge doc labeled 0
      assert(v2.filter(t => t._1 < 130L || t._1 == 500L)
        .forall(_._2 == 0L))
    } finally { rmTree(root); rmTree(rootV1) }
  }

  test("label-view broadcast is count-guarded: past the row cap the " +
      "forced hint is dropped (planner fallback), under it the hint " +
      "stays — and both regimes serve identical labels") {
    import spark.implicits._
    def mkStore(root: String, deltaRows: Long): Unit = {
      // base: ids 0..99 labeled by themselves
      spark.range(100).select(col("id"), col("id").as("label"))
        .write.parquet(s"$root/gens/label_base/g=-1")
      // one update delta relabeling ids < deltaRows to 0 (ids past the
      // base range stand in for fresh docs, as in a real merge delta);
      // NO `_rows` sidecar — exercises GenStore.deltaRows' count fallback
      spark.range(deltaRows).select(col("id"), lit(0L).as("label"))
        .write.parquet(s"$root/updates/batch=0")
    }
    val big = java.nio.file.Files
      .createTempDirectory("graft_r17_guard_big").toString
    val small = java.nio.file.Files
      .createTempDirectory("graft_r17_guard_small").toString
    try {
      import graft.streaming.Streams
      // CcLabelBroadcastMaxRows = 32 MB / 48 B ≈ 699k — straddle it
      mkStore(big, 800000L)
      mkStore(small, 10L)
      val bigView = Streams.ccStoreLabels(spark, big)
      val smallView = Streams.ccStoreLabels(spark, small)
      def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.analyzed.toString.contains("ResolvedHint")
      assert(!hinted(bigView),
        "a component-sized update delta must NOT be force-broadcast " +
          "(driver OOM at 100B docs) — the count guard failed")
      assert(hinted(smallView),
        "a delta-sized update set should keep the broadcast hint (the " +
          "corpus-sized base must stream map-side)")
      // content identical either way: latest-wins over the base
      assert(bigView.filter(col("id") < 100).count() == 100L &&
        bigView.filter(col("id") < 100 && col("label") =!= 0L).count() == 0L)
      assert(bigView.count() == 800000L + 100L - 100L) // 100 base ids overlap
      val sm = smallView.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
      assert(sm.take(10).forall(_._2 == 0L) &&
        sm.drop(10).forall(t => t._2 == t._1))
    } finally { rmTree(big); rmTree(small) }
  }

  test("reduced-demo bench depth is a measurement choice, not a " +
      "semantic one: the one-trigger uninterrupted stream (BenchMode) " +
      "serves output identical to the full kill+restart demonstration, " +
      "on EVERY reduced-aware demo — v1 plain/bucketed (q242 q252 " +
      "q260), v2 text/media (q261 q262)") {
    val dir = "/root/testdata/sf0.001"
    // EXPECTED LOG NOISE: the full-depth runs below inject kills, so
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND traces from the killed sessions'
    // unusable localCheckpoint blocks are the intended outcome of a
    // green run (recovery is from disk) — see Round15Spec's note.
    def run(name: String): Seq[(Long, Long)] =
      SparkEntry.queries(name)(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (name <- Seq("q242_stream_cc_maintenance",
        "q252_stream_cc_restart_resume",
        "q260_stream_cc_bucketed_restart",
        "q261_stream_cc_store_fold_gc",
        "q262_stream_media_cc_maintenance")) {
      assert(!graft.util.BenchMode.reducedDemos)
      val full = run(name)
      sys.props(graft.util.BenchMode.ReducedDemosProp) = "1"
      val reduced =
        try run(name)
        finally { sys.props.remove(graft.util.BenchMode.ReducedDemosProp); () }
      assert(reduced.nonEmpty && reduced == full,
        s"$name: reduced-demo labels diverged from the full " +
          s"kill+restart run (${reduced.size} vs ${full.size} rows)")
    }
    // ...and the composed incremental-curation serve (q263): one-trigger
    // production-cadence depth must cut the identical training snapshot
    // the aggressive-fold 3-epoch depth cuts
    def runCur(): Seq[String] =
      SparkEntry.queries("q263_stream_incremental_curation")(spark, dir)
        .collect().map(_.mkString("|")).toSeq
    val fullCur = runCur()
    sys.props(graft.util.BenchMode.ReducedDemosProp) = "1"
    val reducedCur =
      try runCur()
      finally { sys.props.remove(graft.util.BenchMode.ReducedDemosProp); () }
    assert(reducedCur.nonEmpty && reducedCur == fullCur,
      s"q263: reduced-demo snapshot diverged from full depth " +
        s"(${reducedCur.size} vs ${fullCur.size} rows)")
  }

  test("vector-store GC retention: retainBases=2 keeps the superseded " +
      "generation and its live deltas for a pre-fold reader; " +
      "retainBases=1 reproduces the original sweep") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_r17_vecgc").toString
    try {
      import graft.ext.Similarity
      Seq((0L, 1)).toDF("vec_id", "x").write.parquet(s"$root/gens/g=-1")
      Seq((1L, 1)).toDF("vec_id", "x").write.parquet(s"$root/deltas/epoch=0")
      val preFold = Similarity.indexStoreView(spark, root) // g=-1 ∪ {0}
      Seq((0L, 1), (1L, 1)).toDF("vec_id", "x")
        .write.parquet(s"$root/gens/g=0") // the fold
      assert(Similarity.gcStore(root, retainBases = 2) == 0)
      assert(exists(s"$root/gens/g=-1") && exists(s"$root/deltas/epoch=0"))
      assert(preFold.collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(0L, 1L), "pre-fold reader broke under retainBases = 2")
      assert(Similarity.gcStore(root) == 2) // g=-1 + folded delta 0
      assert(!exists(s"$root/gens/g=-1") && !exists(s"$root/deltas/epoch=0"))
    } finally rmTree(root)
  }
}
