package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph
import graft.util.GenStore

/** Round-19 invariants: the bucket-count sidecar that makes a mismatched
  * probe modulus impossible (r18 ADVICE, medium), and the cross-process
  * serving proof extended from the label view to the GenStore seam
  * itself — q264's latest-wins coreness view and q263's union census /
  * scored stores (r18 verdict #5).
  */
class Round19Spec extends SparkSpec {

  private def rmTree(root: String): Unit = graft.util.Dirs.rmTree(root)
  private def exists(p: String) =
    java.nio.file.Files.exists(java.nio.file.Paths.get(p))

  test("bucket-count sidecar: corenessBucketed derives its probe modulus " +
      "from the layout (a mismatched caller modulus would silently drop " +
      "live frontier edges — r18 ADVICE), and a non-layout dir fails " +
      "loudly instead of converging to wrong coreness") {
    import spark.implicits._
    val edges = (0L until 39L).map(i => (i, i + 1)).toDF("src", "dst")
      .localCheckpoint(true)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r19_sidecar").toString
    try {
      Graph.writeBucketedEdges(edges, s"$dir/edges", 16)
      assert(Graph.readBucketCount(spark, s"$dir/edges") == 16)
      // overwrite with a different modulus: the sidecar follows the
      // layout, so the derived probe modulus can never drift from it
      Graph.writeBucketedEdges(edges, s"$dir/edges", 4)
      assert(Graph.readBucketCount(spark, s"$dir/edges") == 4)
      val out = Graph.corenessBucketed(spark, s"$dir/edges")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(out.nonEmpty && out.forall(_._2 == 1L),
        "a path graph is coreness-1 everywhere")
      // a parquet dir that is not a writeBucketedEdges layout must be
      // rejected at the API, not converge quietly with dropped edges
      edges.write.mode("overwrite").parquet(s"$dir/notalayout")
      val e = intercept[IllegalArgumentException] {
        Graph.corenessBucketed(spark, s"$dir/notalayout")
      }
      assert(e.getMessage.contains("_buckets"))
    } finally rmTree(dir)
  }

  test("mid-width within-file pruning (r18 verdict #2): on a BFS-numbered " +
      "tree peel whose frontier is a contiguous id-range, rounds that hit " +
      "EVERY bucket still read fewer rows than the full layout — the " +
      "pushed v-range prunes pages inside hit files — and the iterates " +
      "stay exactly equal to the in-memory path") {
    import spark.implicits._
    // complete binary tree, edge i -> (i-1)/2: the peel's frontier is the
    // leaf level [n/2, n), then [n/4, n/2), ... — contiguous ranges, the
    // shape parquet min-max stats on the v-sorted layout can prune.
    // n and B sized so bucket files span multiple 4096-row pages
    // (2*(n-1)/B = 16k rows/file = 4 pages) while the mid-peel frontier
    // (thousands of vertices) hits every bucket.
    val n = 32768L
    val nBuckets = 4
    val edges = spark.range(1, n)
      .select(col("id").as("src"),
        ((col("id") - 1) / 2).cast("long").as("dst"))
      .localCheckpoint(true)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r19_vrange").toString
    try {
      Graph.writeBucketedEdges(edges, s"$dir/edges", nBuckets)
      val scans = scala.collection.mutable
        .ArrayBuffer.empty[(Int, Long, Long, Long)]
      val bucketed = Graph.corenessBucketed(spark, s"$dir/edges",
          schedule = "delta",
          onRoundScan = (r, files, hit, rowsOut) => {
            scans += ((r, files, hit, rowsOut)); () })
        .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
      val inMemory = Graph.coreness(edges)
        .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
      assert(bucketed.nonEmpty && bucketed.sameElements(inMemory),
        "v-range-pruned coreness diverged from the in-memory path")
      val fullRows = 2L * (n - 1)
      // the claim: some frontier-local round hits EVERY bucket (so file
      // pruning recovers nothing) yet reads strictly less than the full
      // layout — only page/rowgroup stats on the sorted v can do that
      val midWidth = scans.filter(s => s._2 == nBuckets.toLong)
      assert(midWidth.nonEmpty, s"no all-buckets-hit round: $scans")
      assert(midWidth.exists(_._4 < fullRows),
        s"no within-file pruning in the mid-width regime " +
          s"(full=$fullRows): $scans")
      // and the pruning is sound: no round reads more than the layout
      assert(scans.forall(_._4 <= fullRows))
    } finally rmTree(dir)
  }

  /** Shared cross-process harness: spawn GenServeDriver on a staged
    * store, run `maintain` while the reader holds its resolved snapshot,
    * then release the reader and compare its rows to `expected`.
    */
  private def serveThrough(baseDir: String, deltaDir: String, mode: String,
      idCol: String, root: String, expected: Seq[String])(
      maintain: => Unit): Unit = {
    val ready = s"$root/ready_$mode"; val go = s"$root/go_$mode"
    val out = s"$root/served_$mode"
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(s"${System.getProperty("java.home")}/bin/java",
      "-cp", System.getProperty("java.class.path"), "-Xmx2g") ++ opens ++
      Seq("graft.GenServeDriver", baseDir, deltaDir, mode, idCol,
        ready, go, out)).toArray
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    // child output to a FILE, not a pipe (the Round18Spec deadlock fix)
    val childLog = java.nio.file.Paths.get(s"$root/child_$mode.log")
    pb.redirectOutput(childLog.toFile)
    val proc = pb.start()
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!exists(ready)) {
      assert(System.nanoTime() < deadline && proc.isAlive,
        "serving JVM died before resolving its view")
      Thread.sleep(50)
    }
    maintain
    java.nio.file.Files.write(java.nio.file.Paths.get(go),
      Array.emptyByteArray)
    val code = proc.waitFor()
    val log = new String(java.nio.file.Files.readAllBytes(childLog),
      "UTF-8")
    assert(code == 0, s"serving JVM exited $code:\n" +
      log.linesIterator.toSeq.takeRight(25).mkString("\n"))
    val served = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out)), "UTF-8").linesIterator.toSeq
    assert(served.nonEmpty && served == expected,
      s"[$mode] the concurrent serving read diverged from the pre-fold view")
  }

  test("cross-process retainBases on the LATEST-WINS GenStore (q264's " +
      "coreness view): a separate JVM's resolved snapshot survives a " +
      "fold+GC sweep that really deletes the superseded generation") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_r19_coreserve").toString
    try {
      val store = GenStore(s"$root/core_base", s"$root/core", "g=", "epoch=")
      def fold(bound: Long, foldPoint: Long): Unit =
        store.latestWinsView(spark, bound, "id").write.mode("overwrite")
          .parquet(store.basePath(foldPoint))
      // base g=-1 + delta 0, folded to base g=0; delta 1 live — the state
      // shape a reader meets mid-maintenance
      (0L until 6L).map(i => (i, 1L)).toDF("id", "coreness")
        .write.parquet(store.basePath(-1))
      Seq((1L, 2L), (2L, 2L), (10L, 1L)).toDF("id", "coreness")
        .write.parquet(store.deltaPath(0))
      fold(bound = 1, foldPoint = 0)
      Seq((2L, 3L), (3L, 2L), (11L, 1L)).toDF("id", "coreness")
        .write.parquet(store.deltaPath(1))
      // latest-epoch-wins must hold in the expectation itself: id 2 reads
      // its epoch-1 row (3), not the folded epoch-0 row (2)
      val expected = store.latestWinsView(spark, Long.MaxValue, "id")
        .collect().map(_.toSeq.mkString(",")).sorted.toSeq
      assert(expected.contains("2,3") && !expected.contains("2,2"))
      serveThrough(s"$root/core_base", s"$root/core", "latest", "id",
          root, expected) {
        // maintenance while the reader holds (base 0 ∪ delta 1): one more
        // epoch, fold to base g=1, sweep at retainBases=2 — base -1 and
        // delta 0 must really leave disk; the reader's snapshot survives
        Seq((1L, 3L), (12L, 1L)).toDF("id", "coreness")
          .write.parquet(store.deltaPath(2))
        fold(bound = 2, foldPoint = 1)
        assert(store.gc(retainBases = 2) > 0,
          "the sweep deleted nothing — fixture stages no supersession")
        assert(!exists(store.basePath(-1)) && !exists(store.deltaPath(0)),
          "the superseded generation survived the sweep")
        assert(exists(s"${store.basePath(0)}/_SUCCESS") &&
          exists(store.deltaPath(1)),
          "retainBases=2 failed to keep the serving reader's snapshot")
      }
    } finally rmTree(root)
  }

  test("cross-process retainBases on the UNION GenStore (q263's census / " +
      "scored stores): same harness, the plain-union merge") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_r19_censusserve").toString
    try {
      val store = GenStore(s"$root/cen_base", s"$root/cen", "g=", "epoch=")
      def fold(bound: Long, foldPoint: Long): Unit =
        store.unionView(spark, bound)
          .groupBy("source", "q_micro").agg(sum("c").as("c"))
          .write.mode("overwrite").parquet(store.basePath(foldPoint))
      Seq(("a", 10L, 3L), ("b", 20L, 2L)).toDF("source", "q_micro", "c")
        .write.parquet(store.basePath(-1))
      Seq(("a", 10L, 1L), ("a", 30L, 1L)).toDF("source", "q_micro", "c")
        .write.parquet(store.deltaPath(0))
      fold(bound = 1, foldPoint = 0) // grouped re-sum: ("a",10) -> 4
      Seq(("b", 20L, 5L)).toDF("source", "q_micro", "c")
        .write.parquet(store.deltaPath(1))
      val expected = store.unionView(spark)
        .collect().map(_.toSeq.mkString(",")).sorted.toSeq
      assert(expected.contains("a,10,4"), s"fold lost the re-sum: $expected")
      serveThrough(s"$root/cen_base", s"$root/cen", "union", "-",
          root, expected) {
        Seq(("c", 40L, 1L)).toDF("source", "q_micro", "c")
          .write.parquet(store.deltaPath(2))
        fold(bound = 2, foldPoint = 1)
        assert(store.gc(retainBases = 2) > 0,
          "the sweep deleted nothing — fixture stages no supersession")
        assert(!exists(store.basePath(-1)) && !exists(store.deltaPath(0)),
          "the superseded generation survived the sweep")
        assert(exists(s"${store.basePath(0)}/_SUCCESS") &&
          exists(store.deltaPath(1)),
          "retainBases=2 failed to keep the serving reader's snapshot")
      }
    } finally rmTree(root)
  }
}
