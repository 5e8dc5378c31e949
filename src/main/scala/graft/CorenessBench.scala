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

    // SYNTHETIC mode (r14 verdict #5's "a few million vertices" leg):
    // SPARK_GRAFT_SYNTH_CLIQUES=N builds a ring of N 8-cliques (8N
    // vertices, 28N intra + N ring edges) instead of the near-dup graph.
    // Its coreness is ANALYTIC — every vertex sits in an 8-clique
    // (coreness ≥ 7) and no 8-core exists (intra degree is 7) — so
    // coreness = 7 everywhere: hist must be exactly {7: 8N}, a
    // known-value check at any scale, asserted below.
    val synthCliques = sys.env.get("SPARK_GRAFT_SYNTH_CLIQUES").map(_.toLong)
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
    val nEdges = edges.count()

    // size the fixpoint's shuffle width to the box (r15's legs held the
    // knob at 8 "for comparability" — at 8M synthetic vertices that left
    // 3/4 of the cores idle in every post-exchange stage; SCALING.md r15
    // already named `partitions` as the production lever). Override with
    // SPARK_GRAFT_CORE_PARTS=8 for a like-for-like rerun of the r15 rows.
    val coreParts = sys.env.get("SPARK_GRAFT_CORE_PARTS").map(_.toInt)
      .getOrElse(cpus.toInt)
    val (coreS, core) = time {
      val c = Graph.coreness(edges, partitions = coreParts)
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

    // the ABOVE-CEILING degradation path at bench scale (r14 verdict #5):
    // ceiling 0 forces the value-table join through the keyed shuffle —
    // the path a >10M-vertex production graph takes — on the same edges.
    // The checksum must match the broadcast path's exactly (Round14Spec
    // pins the 12-edge fixture; this pins it on every measured graph).
    val (coreShufS, chkShuf) = time {
      val c = Graph.coreness(edges, partitions = coreParts,
        broadcastVertexCeiling = 0L)
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

    def f(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"coreness_scale","docs":$nDocs,"edges":$nEdges,""" +
      s""""edge_s":${f(edgeS)},"core_s":${f(coreS)},""" +
      s""""core_shuffle_s":${f(coreShufS)},"nv":$nv,""" +
      s""""max_core":$maxCore,"hist":$hist,"checksum":$chk,"parts":$coreParts,"sf":"$sfDir"}""")
    spark.stop()
  }
}
