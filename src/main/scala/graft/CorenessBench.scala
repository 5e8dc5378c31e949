package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Graph}

/** Coreness (k-core) scale bench on the salted stress corpora.
  *
  * Two timed phases, split where production splits them:
  *   1. edge_s — building the Jaccard-0.3 near-dup edge list (the dedup
  *      ladder's posting self-join; q248 pays exactly this), and
  *   2. core_s — the h-index fixpoint itself ([[Graph.coreness]]):
  *      per round one broadcast join + per-vertex window over 2·|E|.
  *
  * The salted corpora (textsalt replicas, ids offset by k·10⁹, replicas
  * share no shingles) repeat the 1× corpus's local structure k times, so
  * two invariants double as cross-scale correctness checks, printed in
  * the JSON: the coreness HISTOGRAM must scale exactly linearly in k
  * (same buckets, k× the counts), and max_core must be scale-invariant
  * (coreness is structure-local — a bigger corpus of the same material
  * must not deepen any core). The interesting law is core_s vs |E|:
  * the fixpoint is edge-bound, not corpus-bound.
  */
object CorenessBench {
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

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // SYNTHETIC modes (r14 verdict #5's "a few million vertices" legs):
    // SPARK_GRAFT_SYNTH_CLIQUES=N builds a ring of N 8-cliques (8N
    // vertices, 28N intra + N ring edges) instead of the near-dup graph.
    // Its coreness is ANALYTIC — every vertex sits in an 8-clique
    // (coreness ≥ 7) and no 8-core exists (intra degree is 7) — so
    // coreness = 7 everywhere: hist must be exactly {7: 8N}, a
    // known-value check at any scale, asserted below.
    // SPARK_GRAFT_SYNTH_TREE=N builds the complete-ish binary tree on N
    // vertices (edge i → (i−1)/2): every tree is 1-degenerate, so
    // coreness = 1 everywhere (hist exactly {1: N}) — and unlike the
    // ring (which the h-index fixpoint finishes in ONE effective round),
    // the tree PEELS: the h-values collapse from the leaves inward over
    // ~depth/2 rounds with a geometrically shrinking frontier — the
    // graph shape the delta schedule exists for (r15 verdict #4's
    // "re-evaluate only neighbors of last round's changed set").
    val synthCliques = sys.env.get("SPARK_GRAFT_SYNTH_CLIQUES").map(_.toLong)
    val synthTree = sys.env.get("SPARK_GRAFT_SYNTH_TREE").map(_.toLong)
    require(synthCliques.isEmpty || synthTree.isEmpty,
      "SYNTH_CLIQUES and SYNTH_TREE are mutually exclusive")
    val (nDocs, (edgeS, edges)) = synthCliques match {
      case Some(n) =>
        require(n >= 2, "ring needs >= 2 cliques (n=1 would self-loop)")
        import spark.implicits._
        val pdf = (for { i <- 0 until 8; j <- i + 1 until 8 } yield (i, j))
          .toDF("pi", "pj")
        (8 * n, time {
          val intra = spark.range(n).toDF("c").crossJoin(broadcast(pdf))
            .select((col("c") * 8 + col("pi")).as("src"),
              (col("c") * 8 + col("pj")).as("dst"))
          val ring = spark.range(n).toDF("c")
            .select((col("c") * 8).as("src"),
              (((col("c") + 1) % n) * 8).as("dst"))
          val e = intra.unionByName(ring).localCheckpoint(true)
          e.count()
          e
        })
      case None => synthTree match {
        case Some(n) =>
          require(n >= 2, "tree needs >= 2 vertices")
          (n, time {
            val e = spark.range(1, n)
              .select(col("id").as("src"),
                ((col("id") - 1) / 2).cast("long").as("dst"))
              .localCheckpoint(true)
            e.count()
            e
          })
        case None =>
          val docs = graft.sources.Tables.documents(spark, sfDir)
          (docs.count(), time {
            val e = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.3)
              .select(col("i").as("src"), col("j").as("dst"))
              .localCheckpoint(true)
            e.count()
            e
          })
      }
    }
    val nEdges = edges.count()

    // size the fixpoint's shuffle width to the box (r15's legs held the
    // knob at 8 "for comparability" — at 8M synthetic vertices that left
    // 3/4 of the cores idle in every post-exchange stage; SCALING.md r15
    // already named `partitions` as the production lever). Override with
    // SPARK_GRAFT_CORE_PARTS=8 for a like-for-like rerun of the r15 rows.
    val coreParts = sys.env.get("SPARK_GRAFT_CORE_PARTS").map(_.toInt)
      .getOrElse(cpus.toInt)
    // UNTIMED warmup (r16): the first coreness call in a fresh JVM
    // absorbs the JIT/codegen compilation of the whole fixpoint chain —
    // measured as tens of seconds of "setup" at 8M vertices — so without
    // this, whichever timed leg runs FIRST loses the comparison to
    // whichever runs last. A tiny ring through BOTH schedules and BOTH
    // join paths compiles every code path the timed legs take.
    locally {
      import spark.implicits._
      val pdf = (for { i <- 0 until 8; j <- i + 1 until 8 } yield (i, j))
        .toDF("pi", "pj")
      val warm = spark.range(500).toDF("c").crossJoin(broadcast(pdf))
        .select((col("c") * 8 + col("pi")).as("src"),
          (col("c") * 8 + col("pj")).as("dst"))
        .unionByName(spark.range(500).toDF("c")
          .select((col("c") * 8).as("src"),
            (((col("c") + 1) % 500) * 8).as("dst")))
        .localCheckpoint(true)
      for (ceil <- Seq(10000000L, 0L); sch <- Seq("delta", "sync"))
        Graph.coreness(warm, partitions = coreParts,
          broadcastVertexCeiling = ceil, schedule = sch).count()
      // warm the optional legs' code paths too, so whichever leg runs
      // first doesn't absorb their JIT
      if (sys.env.get("SPARK_GRAFT_AUTO_COMPARE").contains("1"))
        Graph.corenessAdaptive(warm, partitions = coreParts).count()
      sys.env.get("SPARK_GRAFT_EDGE_BUCKETS").foreach { _ =>
        val d = java.nio.file.Files
          .createTempDirectory("graft_core_warm").toString
        try {
          Graph.writeBucketedEdges(warm, d, 8)
          // schedule=delta to match the timed bucketed leg: the default
          // (auto) never flips on this warm fixture, so the delta-only
          // machinery (advanceFrontier, the bucketed stats action, the
          // pruned-probe scan) would reach the timed leg cold (r19 review)
          Graph.corenessBucketed(spark, d,
            partitions = coreParts, schedule = "delta").count()
        } finally {
          graft.util.Dirs.rmTree(d)
        }
      }
    }
    // per-round vertex-evaluation counts — the DETERMINISTIC work
    // measure the schedules differ in (wall-clock on this box swings
    // 2-5x run-to-run at multi-minute leg sizes; these counts are exact
    // and reproducible)
    val evalsDelta = scala.collection.mutable.ArrayBuffer.empty[Long]
    val (coreS, core) = time {
      val c = Graph.coreness(edges, partitions = coreParts,
          schedule = "delta",
          onRoundStats = (_, n) => { evalsDelta += n; () })
        .localCheckpoint(true)
      c.count()
      c
    }
    val agg = core.agg(count(lit(1)), max(col("coreness")),
      sum(col("id") % 1000003L * col("coreness"))).head()
    val (nv, maxCore, chk) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    val hist = core.groupBy("coreness").agg(count(lit(1)).as("n"))
      .orderBy("coreness").collect()
      .map(r => s""""${r.getLong(0)}":${r.getLong(1)}""").mkString("{", ",", "}")

    // the ALL-SHUFFLE path at bench scale (r14 verdict #5): ceiling 0
    // forces EVERY per-round frame (value table AND the delta frontier
    // frames) through keyed shuffles on the same edges. The checksum must
    // match the default path's exactly (Round14Spec pins the 12-edge
    // fixture; this pins it on every measured graph). The default ceiling
    // stayed 10M vertices (the r16 2M-hybrid experiment was reverted —
    // SCALING.md), so at every leg size this file measures, core_s is the
    // FULL-BROADCAST path and core_shuffle_s the all-shuffle path —
    // broadcast vs shuffle, not hybrid vs shuffle.
    val (coreShufS, chkShuf) = time {
      val c = Graph.coreness(edges, partitions = coreParts,
        broadcastVertexCeiling = 0L, schedule = "delta")
      val a = c.agg(count(lit(1)),
        sum(col("id") % 1000003L * col("coreness"))).head()
      (a.getLong(0), a.getLong(1))
    }
    require(chkShuf == ((nv, chk)),
      s"shuffle-path coreness diverged: broadcast=($nv, $chk) " +
        s"shuffle=$chkShuf")
    synthCliques.foreach { n =>
      require(maxCore == 7L && nv == 8 * n &&
          hist == s"""{"7":${8 * n}}""",
        s"ring-of-8-cliques must be coreness-7 everywhere: nv=$nv " +
          s"max=$maxCore hist=$hist")
    }
    synthTree.foreach { n =>
      require(maxCore == 1L && nv == n && hist == s"""{"1":$n}""",
        s"a tree must be coreness-1 everywhere: nv=$nv max=$maxCore " +
          s"hist=$hist")
    }

    // the SYNCHRONOUS-schedule comparators (SPARK_GRAFT_SYNC_COMPARE=1):
    // the r15 behavior — every round re-evaluates every vertex — timed on
    // the same edges with the same knobs on BOTH join paths, so the
    // artifact carries the full schedule × join-path 2×2
    // (core_s / core_shuffle_s / core_sync_s / core_sync_shuffle_s),
    // all checksum-required equal. The delta schedule's value is read
    // within a column (same path, sync vs delta); the join-path finding
    // is read within a row.
    val evalsSync = scala.collection.mutable.ArrayBuffer.empty[Long]
    def syncLeg(ceiling: Long): Double = {
      evalsSync.clear()
      val (t, chkSync) = time {
        val c = Graph.coreness(edges, partitions = coreParts,
          broadcastVertexCeiling = ceiling, schedule = "sync",
          onRoundStats = (_, n) => { evalsSync += n; () })
        val a = c.agg(count(lit(1)),
          sum(col("id") % 1000003L * col("coreness"))).head()
        (a.getLong(0), a.getLong(1))
      }
      require(chkSync == ((nv, chk)),
        s"sync-schedule coreness (ceiling=$ceiling) diverged: " +
          s"delta=($nv, $chk) sync=$chkSync")
      t
    }
    val syncCompare = sys.env.get("SPARK_GRAFT_SYNC_COMPARE").contains("1")
    // 10M = the r15 DEFAULT config (always-broadcast at these scales), so
    // core_sync_s reproduces the r15 rows; core_sync_shuffle_s is its
    // all-shuffle twin
    val coreSyncS = if (syncCompare) Some(syncLeg(10000000L)) else None
    val coreSyncShufS = if (syncCompare) Some(syncLeg(0L)) else None

    // ADAPTIVE-schedule leg (r17 verdict #2, SPARK_GRAFT_AUTO_COMPARE=1):
    // one auto mode that starts sync and flips to delta when the
    // measured flip rule fires — must match the BETTER fixed schedule on
    // both shapes (tree: flips early, ≈ delta; ring: never flips before
    // convergence, ≈ sync). Checksum-required equal to both.
    val evalsAuto = scala.collection.mutable.ArrayBuffer.empty[Long]
    val coreAutoS =
      if (!sys.env.get("SPARK_GRAFT_AUTO_COMPARE").contains("1")) None
      else Some {
        val (t, chkAuto) = time {
          val c = Graph.corenessAdaptive(edges, partitions = coreParts,
            onRoundStats = (_, n) => { evalsAuto += n; () })
          val a = c.agg(count(lit(1)),
            sum(col("id") % 1000003L * col("coreness"))).head()
          (a.getLong(0), a.getLong(1))
        }
        require(chkAuto == ((nv, chk)),
          s"adaptive-schedule coreness diverged: fixed=($nv, $chk) " +
            s"auto=$chkAuto")
        t
      }

    // BUCKETED-edge leg (r17 verdict #1, SPARK_GRAFT_EDGE_BUCKETS=N):
    // the edge table persisted hive-partitioned by pmod(v, N); small-
    // frontier rounds prune the probe to hit buckets at the scan. The
    // leg times the layout write separately (production writes it once,
    // maintenance amortizes it), requires the checksum unchanged, and
    // reports per-frontier-local-round (files read, hit buckets) so the
    // delta-READ-sized claim is visible in the artifact.
    // each round: (round, files read, hit buckets, rows the scan output
    // after the pushed v-range pruned rowgroups/pages WITHIN hit files —
    // the r18-verdict-#2 mid-width measurement). The leg pins
    // schedule=delta so the scan telemetry covers every round from
    // round 1 (comparable with the r18 artifacts).
    val scanRounds = scala.collection.mutable
      .ArrayBuffer.empty[(Int, Long, Long, Long)]
    val bucketLeg = sys.env.get("SPARK_GRAFT_EDGE_BUCKETS").map(_.toInt)
      .map { nB =>
        val dir = java.nio.file.Files
          .createTempDirectory("graft_core_edges").toString
        try {
          val (wT, _) = time { Graph.writeBucketedEdges(edges, dir, nB) }
          val (t, chkB) = time {
            val c = Graph.corenessBucketed(spark, dir,
              partitions = coreParts, schedule = "delta",
              onRoundScan = (r, files, hit, rowsOut) => {
                scanRounds += ((r, files, hit, rowsOut)); () })
            val a = c.agg(count(lit(1)),
              sum(col("id") % 1000003L * col("coreness"))).head()
            (a.getLong(0), a.getLong(1))
          }
          require(chkB == ((nv, chk)),
            s"bucketed-edge coreness diverged: in-memory=($nv, $chk) " +
              s"bucketed=$chkB")
          (nB, wT, t)
        } finally {
          graft.util.Dirs.rmTree(dir)
        }
      }

    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"coreness_scale","docs":$nDocs,"edges":$nEdges,""" +
      s""""edge_s":${f(edgeS)},"core_s":${f(coreS)},""" +
      s""""core_shuffle_s":${f(coreShufS)},""" +
      coreSyncS.map(t => s""""core_sync_s":${f(t)},""").getOrElse("") +
      coreSyncShufS.map(t => s""""core_sync_shuffle_s":${f(t)},""")
        .getOrElse("") +
      coreAutoS.map(t => s""""core_auto_s":${f(t)},""" +
        s""""evals_auto":${evalsAuto.mkString("[", ",", "]")},""" +
        s""""evals_auto_total":${evalsAuto.sum},""").getOrElse("") +
      bucketLeg.map { case (nB, wT, t) =>
        s""""edge_buckets":$nB,"bucket_write_s":${f(wT)},""" +
        s""""core_bucketed_s":${f(t)},""" +
        s""""bucketed_scan_rounds":${scanRounds
          .map { case (r, fi, h, ro) => s"[$r,$fi,$h,$ro]" }
          .mkString("[", ",", "]")},"""
      }.getOrElse("") +
      s""""evals_delta":${evalsDelta.mkString("[", ",", "]")},""" +
      s""""evals_delta_total":${evalsDelta.sum},""" +
      (if (evalsSync.nonEmpty)
        s""""evals_sync":${evalsSync.mkString("[", ",", "]")},""" +
        s""""evals_sync_total":${evalsSync.sum},"""
      else "") +
      s""""nv":$nv,""" +
      s""""max_core":$maxCore,"hist":$hist,"checksum":$chk,"parts":$coreParts,"sf":"$sfDir"}""")
    spark.stop()
  }
}
