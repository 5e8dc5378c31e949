package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge DataFrames — the iterative-dataflow family
  * (connected components lives in [[Dedup.connectedComponents]]; this hosts
  * the rank-propagation side). The reference has no graph surface at all;
  * these are the standard link-analysis steps a training-data pipeline runs
  * over citation/hyperlink graphs (the O5 script surface could only do this
  * single-node, `/root/reference/plugin.cpp:113-117`).
  */
object Graph {

  /** PageRank by fixed-iteration power method over an undirected edge list
    * `(src, dst)` (callers pass each edge once; both directions are walked,
    * so every node has out-degree ≥ 1 — no dangling-mass correction
    * needed). Ranks are N-scaled (init 1.0, update `0.15 + 0.85·Σ r/deg`),
    * the standard damping-0.85 form.
    *
    * Spark shape: the doubled edge list joins the (small) rank table on
    * `src` and hash-aggregates contributions on `dst` — one shuffle per
    * iteration, partial aggregation map-side. Each round references the
    * previous ranks exactly ONCE, so the logical plan grows linearly in
    * `iterations` (not the 2^k self-join blowup of
    * [[Dedup.connectedComponents]], which must checkpoint): for the fixed
    * small iteration counts of power-method PageRank that is cheap to
    * analyze and needs no per-round materialization. For a convergence
    * loop with large/unbounded rounds, add a periodic
    * `localCheckpoint`/`checkpoint` to bound planning cost, and at 10^9
    * nodes drop the broadcast hint so AQE picks the join side.
    *
    * Determinism: ranks live in FIXED-POINT micro-units (BIGINT, 10^-6) and
    * every step is integer arithmetic — per-edge contribution
    * `(r·17) div (20·deg)` (= r·0.85/deg floored to a micro-unit), summed
    * as BIGINT, update `150000 + Σ`. Floating-point propagation was tried
    * first and diverged from the oracle: rational contributions like
    * 0.85/32 = 17/640 have exact 7-decimal expansions ending in 5, and
    * Spark's double→decimal cast (rounds the SHORTEST decimal repr — which
    * recovers the rational midpoint) disagrees there with engines that
    * round the exact binary expansion (413 casts flipped at sf0.1,
    * iteration 1). Integer micro-units have no rounding AT ALL, on any
    * engine, at any parallelism — the oracle is the identical integer
    * recursion unrolled as chained CTEs. Quantization bias is one
    * micro-unit per edge per iteration — beneath any ranking use.
    */
  /** @param partitions parallelism for the propagation loop. The rank
    *   table is |V|, orders of magnitude smaller than the fact tables the
    *   edges derive from — the loop must not inherit a corpus-sized
    *   shuffle width (same sizing rule as
    *   [[Dedup.connectedComponents]]). Size to |E|; at billion-node scale
    *   raise it and drop the broadcast hint (AQE then picks the join side).
    */
  def pageRank(undirectedEdges: DataFrame, iterations: Int,
               partitions: Int = 8): DataFrame = {
    require(iterations >= 1, s"pageRank needs >= 1 iteration (got $iterations)")
    // the loop runs on a CHILD session with the narrow width pinned at
    // session scope (no set/restore race on the caller's conf); the edge
    // build itself executes in the caller's plan at full width via .rdd
    val caller = undirectedEdges.sparkSession
    val spark = caller.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    // AQE's stage-wise re-planning pays off on big shuffles, not on an
    // iterative chain of sub-second jobs whose shapes are already known —
    // off for the loop (session-scoped; the caller's conf is untouched)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sc = spark.sparkContext
    // checkpoint-generation tracking, same discipline as
    // [[Dedup.connectedComponents]]: every pinned block set is released as
    // soon as its successor is materialized, so the operator's resident
    // footprint is ONE edge copy during the loop and only the |V|-row final
    // ranks after it returns — not session-lifetime pins of 2|E| rows.
    // Ids come from the checkpointed frame's own (truncated) rdd lineage,
    // not a getPersistentRDDs diff — the registry is SparkContext-global,
    // so a diff could capture and wrongly release blocks pinned by a
    // concurrent query or streaming trigger during the window (shared
    // discipline: graft.util.CheckpointGen).
    def checkpointed(df: => DataFrame): (DataFrame, Set[Int]) = {
      val out = df
      (out, graft.util.CheckpointGen.pinnedIds(out))
    }
    def release(ids: Set[Int]): Unit =
      graft.util.CheckpointGen.release(sc, ids)
    val result = locally {
      // materialize the caller-built edge list ONCE before doubling it:
      // the two union branches below would otherwise each recompute the
      // full upstream build (exchange reuse does not cross union branches
      // here — measured as the dominant cost of the whole operator)
      val (pairs0, pairs0Ids) = checkpointed {
        spark.createDataFrame(
          undirectedEdges.select(col("src"), col("dst")).rdd,
          undirectedEdges.select(col("src"), col("dst")).schema)
          .localCheckpoint(true)
      }
      val both = pairs0.unionAll(
        pairs0.select(col("dst").as("src"), col("src").as("dst")))
      // the degree table is checkpointed EAGERLY (it is tiny — |V| rows)
      // so that (a) the aggregation over 2|E| runs once, reused by both
      // the edge join and the initial ranks (the lazy plan would compute
      // it twice), and (b) nothing downstream references pairs0 once
      // edgesW is live — releasing pairs0 early with a live lazy `deg`
      // would lose its checkpoint blocks mid-broadcast.
      val (deg, degIds) = checkpointed {
        both.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
      }
      val (edgesW, edgesWIds) = checkpointed {
        both.join(broadcast(deg), "src").localCheckpoint(true)
      }
      release(pairs0Ids) // edgesW is truncated — the raw pair copy is dead
      var ranks = deg.select(col("src").as("id"), lit(1000000L).as("r"))
      for (_ <- 1 to iterations) ranks = rankStep(edgesW, ranks)
      // materialize the final ranks (|V| rows) so the 2|E| weighted edge
      // list can be released NOW instead of staying pinned for the session,
      // and so downstream actions replay a table read, not the whole loop
      val out = ranks.select(col("id"), (col("r") / 1000000.0).as("rank"))
        .localCheckpoint(true)
      release(edgesWIds)
      release(degIds)
      out
    }
    // re-anchor on the caller's session so downstream ops do not silently
    // inherit the narrow loop width
    caller.createDataFrame(result.rdd, result.schema)
  }

  /** One propagation round over `(src, dst, deg)` edges and `(id, r)`
    * micro-unit ranks. Ranks broadcast per round — the 2|E| edge table is
    * never reshuffled; the logical plan nests one join+agg per round
    * (linear growth, see [[pageRank]]'s scaladoc). Package-visible so the
    * plan-shape suite can assert the broadcast on the real building block
    * (the public API hides the loop behind the session re-anchor).
    */
  private[graft] def rankStep(edgesW: DataFrame, ranks: DataFrame): DataFrame =
    edgesW.join(broadcast(ranks), edgesW("src") === ranks("id"))
      .groupBy(col("dst"))
      .agg(sum(expr("(r * 17) div (20 * deg)")).as("contrib"))
      .select(col("dst").as("id"), (lit(150000L) + col("contrib")).as("r"))

  /** Coreness (k-core number) of every vertex of an undirected edge list
    * `(src, dst)` (each edge once; isolated vertices are absent from the
    * edge list and so from the output). Returns `(id, coreness)` with
    * coreness BIGINT.
    *
    * Computed by neighborhood h-index iteration (Lü et al., "The H-index
    * of a network node and its relation to degree and coreness", Nature
    * Communications 7:10168, 2016 — public result): start from
    * c = degree and repeatedly replace each vertex's value with the
    * h-index of its neighbors' values (the largest h such that ≥ h
    * neighbors have value ≥ h); the fixpoint is exactly the coreness.
    * Unlike the sequential min-degree peel (inherently ordered, the
    * textbook O(E) algorithm), every h-index step is one relational
    * pass — join + window + aggregate — so the same plan runs identically
    * on `local[32]` or a 1000-executor cluster, and the oracle is the
    * identical integer recursion unrolled as chained CTEs.
    *
    * Spark shape per round: the doubled edge list joins the (|V|-row,
    * broadcast) value table on the NEIGHBOR end — the 2|E| edge table is
    * never reshuffled for the join — then a window partitioned by the
    * vertex ranks neighbor values descending and `max(least(rn, cu))`
    * per vertex is the h-index (the h = max_i min(i, v_i) identity over
    * the descending sort; ties are safe — permuting rows with equal
    * values cannot change the max). One shuffle of 2|E| rows on the
    * vertex key per round (window + groupBy share the exchange). Values
    * are BIGINT degrees throughout — no floating point anywhere.
    *
    * Termination: starting from degree the iteration is pointwise
    * monotone non-increasing (h-index ≤ neighbor count = degree; the
    * h-index operator is monotone in its inputs, so decrease propagates
    * by induction), hence Σc strictly decreases until the fixpoint and
    * the loop stops when the sum repeats — one |V|-row action per round
    * on a table the round already materialized. Rounds needed are small
    * (tight near-dup clusters converge in 1–2; bounded by a diameter-ish
    * quantity); each round localCheckpoints and releases its predecessor
    * (CheckpointGen), bounding resident state to one edge copy + two
    * |V|-row tables. Fails loudly if `maxRounds` is hit without
    * convergence rather than returning a non-fixpoint.
    *
    * @param partitions loop parallelism — |E|-sized, same rule as
    *   [[pageRank]]: the value table is orders of magnitude smaller than
    *   the corpus the edges derive from.
    * @param maxRounds convergence bound; also the spec's lever to PIN a
    *   convergence depth (calling with the oracle's unroll depth proves
    *   the unrolled oracle reached the fixpoint).
    * @param broadcastVertexCeiling largest |V| (measured per round, free
    *   — it rides the fixpoint aggregate) for which the value table is
    *   broadcast into the edge join; above it the join degrades to a
    *   keyed shuffle instead of failing on the broadcast size limit.
    *   Round14Spec pins path equivalence (ceiling 0 ≡ default).
    */
  def coreness(undirectedEdges: DataFrame, partitions: Int = 8,
               maxRounds: Int = 64,
               broadcastVertexCeiling: Long = 10000000L): DataFrame = {
    require(maxRounds >= 1, s"coreness needs maxRounds >= 1 (got $maxRounds)")
    val caller = undirectedEdges.sparkSession
    val spark = caller.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sc = spark.sparkContext
    def release(ids: Set[Int]): Unit =
      graft.util.CheckpointGen.release(sc, ids)
    val result = locally {
      // materialize the caller-built edges once before doubling (union
      // branches do not share exchanges — the pageRank lesson)
      val pairs0 = spark.createDataFrame(
          undirectedEdges.select(col("src"), col("dst")).rdd,
          undirectedEdges.select(col("src"), col("dst")).schema)
        .localCheckpoint(true)
      val pairs0Ids = graft.util.CheckpointGen.pinnedIds(pairs0)
      val both = pairs0.unionAll(
          pairs0.select(col("dst").as("src"), col("src").as("dst")))
        .select(col("src").as("v"), col("dst").as("u"))
        .localCheckpoint(true)
      val bothIds = graft.util.CheckpointGen.pinnedIds(both)
      release(pairs0Ids)
      var c = both.groupBy("v").agg(count(lit(1)).as("c"))
        .select(col("v").as("id"), col("c"))
        .localCheckpoint(true)
      var cIds = graft.util.CheckpointGen.pinnedIds(c)
      var prevSum = -1L
      // one action per round carries BOTH the fixpoint scalar (Σc) and
      // |V| — the vertex count picks the join strategy for free: the
      // value table broadcasts while it fits (the near-dup-graph norm,
      // |V| ≪ corpus) and degrades to a keyed shuffle join above the
      // ceiling instead of failing on the broadcast size limit.
      // coalesce the Σc to 0: on an EMPTY edge list (a corpus with no
      // near-dup pairs above threshold) sum() aggregates to null and a
      // bare getLong would NPE — the degenerate graph must yield the
      // empty (id, coreness) frame, not a crash.
      def sumAndCount(): (Long, Long) = {
        val r = c.agg(coalesce(org.apache.spark.sql.functions.sum(col("c")),
          lit(0L)), count(lit(1))).head
        (r.getLong(0), r.getLong(1))
      }
      var (sum, nVerts) = sumAndCount()
      var rounds = 0
      val byV = org.apache.spark.sql.expressions.Window
        .partitionBy("v").orderBy(col("cu").desc)
      while (sum != prevSum) {
        require(rounds < maxRounds,
          s"coreness did not converge within $maxRounds h-index rounds")
        val cSide = if (nVerts <= broadcastVertexCeiling) broadcast(c) else c
        val next = both.join(cSide, both("u") === cSide("id"))
          .select(col("v"), col("c").as("cu"))
          .withColumn("rn", row_number().over(byV).cast("long"))
          .groupBy("v").agg(max(least(col("rn"), col("cu"))).as("c"))
          .select(col("v").as("id"), col("c"))
          .localCheckpoint(true)
        val nextIds = graft.util.CheckpointGen.pinnedIds(next)
        release(cIds)
        c = next; cIds = nextIds
        prevSum = sum
        val sc2 = sumAndCount(); sum = sc2._1; nVerts = sc2._2
        rounds += 1
      }
      release(bothIds)
      c
    }
    caller.createDataFrame(result.rdd, result.schema)
      .select(col("id"), col("c").as("coreness"))
  }
}
