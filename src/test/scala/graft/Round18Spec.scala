package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph

/** Round-18 invariants (the r17 verdict's #1/#2): the bucketed edge
  * layout that makes small-frontier coreness rounds delta-READ-sized,
  * and the adaptive schedule that picks sync vs delta by measurement.
  */
class Round18Spec extends SparkSpec {

  private def rmTree(root: String): Unit =
    scala.util.Using.resource(java.nio.file.Files
        .walk(java.nio.file.Paths.get(root))) { w =>
      w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    }

  /** A path graph on n vertices: coreness 1 everywhere, and the h-index
    * fixpoint PEELS it one vertex per round from each end — many rounds
    * with a 2-4 vertex frontier, the exact shape bucket pruning exists
    * for (each late round hits ≤ 4 of the bucket dirs).
    */
  private def pathEdges(n: Int) = {
    import spark.implicits._
    (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("src", "dst")
  }

  /** Ring of 8-cliques: converges in ONE effective round with a
    * full-width changed set — the delta schedule's worst case and the
    * adaptive schedule's stay-sync case.
    */
  private def ringEdges(nCliques: Int) = {
    import spark.implicits._
    val intra = for {
      c <- 0L until nCliques.toLong
      i <- 0 until 8; j <- i + 1 until 8
    } yield (c * 8 + i, c * 8 + j)
    val ring = (0L until nCliques.toLong)
      .map(c => (c * 8, ((c + 1) % nCliques) * 8))
    (intra ++ ring).toDF("src", "dst")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("bucketed edge layout: corenessBucketed == coreness exactly, and " +
      "small-frontier rounds read ONLY hit-bucket files (numFiles via " +
      "onRoundScan — the Round14Spec:q244 pattern applied to edges)") {
    val n = 40
    val nBuckets = 16
    val edges = pathEdges(n).localCheckpoint(true)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r18_edges").toString
    try {
      Graph.writeBucketedEdges(edges, dir, nBuckets)
      // one file per bucket dir (the write contract the pruning math
      // assumes)
      val bucketDirs = scala.util.Using.resource(java.nio.file.Files
          .list(java.nio.file.Paths.get(dir))) { w =>
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("b=")).toSeq
      }
      assert(bucketDirs.size == nBuckets,
        s"expected $nBuckets bucket dirs, found ${bucketDirs.size}")
      val scans = scala.collection.mutable
        .ArrayBuffer.empty[(Int, Long, Long)]
      val bucketed = rows(Graph.corenessBucketed(spark, dir, nBuckets,
        onRoundScan = (r, files, hit) => { scans += ((r, files, hit)); () }))
      val inMemory = rows(Graph.coreness(edges))
      assert(bucketed.nonEmpty && bucketed == inMemory,
        "bucketed-layout coreness diverged from the in-memory path")
      assert(bucketed.forall(_._2 == 1L), "a path graph is coreness-1")
      // the peel gives many frontier-local rounds; each must have read
      // at most its hit-bucket file count, and strictly fewer files
      // than the full layout holds — the delta-READ-sized claim
      assert(scans.size >= 3,
        s"fixture produced only ${scans.size} frontier-local rounds")
      for ((r, files, hit) <- scans) {
        assert(files <= hit,
          s"round $r read $files files for $hit hit buckets — partition " +
            "pruning did not reach the scan")
        assert(files < nBuckets,
          s"round $r read the full layout ($files of $nBuckets files)")
      }
      // the path's frontier is 2-4 vertices a round — late rounds must
      // prune HARD, not just below the total
      assert(scans.map(_._2).min <= 4,
        s"no round was delta-READ-sized: files=${scans.map(_._2)}")
    } finally rmTree(dir)
  }

  test("adaptive schedule: auto == both fixed schedules exactly on both " +
      "shapes; on the ring it stays sync (same eval vector), on the " +
      "path it flips and evaluates strictly less than sync") {
    def evalsOf(run: ((Int, Long) => Unit) => org.apache.spark.sql.DataFrame)
        : (Seq[(Long, Long)], Seq[Long]) = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      val out = rows(run((_, n) => { buf += n; () }))
      (out, buf.toSeq)
    }
    for ((name, edges) <- Seq(
        ("ring", ringEdges(6).localCheckpoint(true)),
        ("path", pathEdges(40).localCheckpoint(true)))) {
      val (autoOut, autoEvals) = evalsOf(h =>
        Graph.corenessAdaptive(edges, onRoundStats = h))
      val (deltaOut, deltaEvals) = evalsOf(h =>
        Graph.coreness(edges, deltaSchedule = true, onRoundStats = h))
      val (syncOut, syncEvals) = evalsOf(h =>
        Graph.coreness(edges, deltaSchedule = false, onRoundStats = h))
      assert(autoOut.nonEmpty && autoOut == deltaOut && autoOut == syncOut,
        s"[$name] adaptive output diverged from a fixed schedule")
      if (name == "ring") {
        // ring of 8-cliques: round-1 changed set = the clique heads,
        // Σ deg(changed) = 9·nCliques ≥ |V|/2 = 4·nCliques → the flip
        // rule never fires; auto runs the sync schedule verbatim
        assert(autoEvals == syncEvals,
          s"[$name] auto should stay sync: auto=$autoEvals sync=$syncEvals")
      } else {
        // path: the peel's changed set collapses immediately
        // (Σ deg(changed)·2 < |V| after round 1) → auto flips and its
        // total evaluation work lands strictly under sync's
        assert(autoEvals.sum < syncEvals.sum,
          s"[$name] auto never flipped: auto=$autoEvals sync=$syncEvals")
        // pre-flip rounds are sync-width, post-flip rounds match the
        // delta schedule's frontier sizes from the same round index
        assert(autoEvals.head == syncEvals.head)
      }
      // the fixed delta schedule remains the lower envelope of work
      assert(deltaEvals.sum <= autoEvals.sum,
        s"[$name] delta did MORE work than auto: " +
          s"delta=$deltaEvals auto=$autoEvals")
    }
  }

  test("adaptive + bucketed compose: corenessBucketed(schedule=auto) " +
      "equals the fixed paths on the peeling fixture") {
    val edges = pathEdges(40).localCheckpoint(true)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_r18_edges_auto").toString
    try {
      Graph.writeBucketedEdges(edges, dir, 16)
      val auto = rows(Graph.corenessBucketed(spark, dir, 16,
        schedule = "auto"))
      val fixed = rows(Graph.coreness(edges))
      assert(auto.nonEmpty && auto == fixed)
    } finally rmTree(dir)
  }
}
