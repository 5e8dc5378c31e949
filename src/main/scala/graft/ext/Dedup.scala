package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines — exact, n-gram
  * Jaccard, MinHash+LSH, SimHash (SURVEY.md §2.3 north-star extensions).
  *
  * Scale design: no operator here ever builds an unblocked cross join. Pair
  * generation is always via an equi-join on a blocking key (shared shingle,
  * LSH band signature, SimHash band), so the shuffle is keyed and the pair
  * space stays proportional to true collisions, not |docs|².
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical key column. One
    * hash-aggregate shuffle on the key — the 100 TB-safe formulation of
    * `dropDuplicates` with a deterministic survivor.
    */
  def exactKeepMin(df: DataFrame, key: Column, idCol: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-k-shingle sets per document: (id, shingle_set, set_size). */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    docs.select(col(idCol).as("sid"),
        TextAnalysis.shingleSet(col(textCol), k).as("sh"))
      .withColumn("n_sh", size(col("sh")))
      .filter(col("n_sh") > 0)

  /** Exact n-gram Jaccard near-dup pairs (i < j, jaccard >= threshold).
    * Pairs are generated only for documents sharing at least one shingle
    * (equi-join on the shingle), then scored exactly from the intersection
    * count — the inverted-index formulation; never |docs|².
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, threshold: Double): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, k)
    // join on xxhash64 of the shingle, not the string: 8-byte shuffle keys
    // instead of ~20-char strings; collision odds (~pairs/2^64) are
    // negligible against set sizes in the hundreds
    // NOTE on a rejected "optimization": prefiltering postings to shingles
    // with document frequency > 1 (unique shingles can never pair) sounds
    // right for web corpora, but measured 50% SLOWER here — the extra
    // aggregate + filter join only pays when most shingles are unique,
    // which a low-entropy corpus (like this synthetic one) violates badly.
    // The unconditional self-join is the robust default; df-prefiltering
    // belongs behind corpus statistics, not hardcoded.
    //
    // The exploded postings carry ONLY (sid, sk) — 16 bytes/row through the
    // self-join shuffle; per-document set sizes rejoin onto the (tiny)
    // intersection-counted pair set afterwards.
    val ex = sets.select(col("sid"), explode(col("sh")).as("s"))
      .select(col("sid"), xxhash64(col("s")).as("sk"))
      .cache() // both sides of the self-join + the size aggregate read this
    // set size == postings count (shingles are distinct): derived from the
    // cached postings, not by re-extracting shingles
    val sizes = ex.groupBy("sid").agg(count(lit(1)).as("n_sh"))
    val a = ex.select(col("sid").as("i"), col("sk"))
    val b = ex.select(col("sid").as("j"), col("sk"))
    a.join(b, a("sk") === b("sk") && col("i") < col("j"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("inter"))
      // plain joins, no broadcast hint: sizes is O(|corpus|) rows, which must
      // never be forced driver-side; the pair side is tiny, so AQE broadcasts
      // whichever side actually fits at runtime
      .join(sizes.select(col("sid").as("i"), col("n_sh").as("na")), "i")
      .join(sizes.select(col("sid").as("j"), col("n_sh").as("nb")), "j")
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("i", "j", "jaccard")
  }

  /** Incremental dedup: exact Jaccard pairs BETWEEN two corpora (indexed
    * corpus × incoming batch), never within either side — the production
    * flow where new documents are screened against an existing index
    * without re-pairing the index against itself. Output one row per
    * (corpus i, incoming j) pair at or above the threshold.
    */
  def crossCorpusJaccardPairs(corpus: DataFrame, incoming: DataFrame,
                              idCol: String, textCol: String,
                              k: Int, threshold: Double): DataFrame = {
    // same narrow-postings discipline as ngramJaccardPairs: only (sid, sk)
    // rides the big shuffle; set sizes rejoin onto the counted pair set
    def postings(df: DataFrame, as: String) =
      shingleSets(df, idCol, textCol, k)
        .select(col("sid").as(as), explode(col("sh")).as("s"))
        .select(col(as), xxhash64(col("s")).as("sk"))
    val a = postings(corpus, "i").cache()
    val b = postings(incoming, "j").cache()
    val na = a.groupBy("i").agg(count(lit(1)).as("na"))
    val nb = b.groupBy("j").agg(count(lit(1)).as("nb"))
    a.join(b, "sk")
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("inter"))
      .join(na, "i").join(nb, "j")
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("i", "j", "jaccard")
  }

  // MinHash universe: Mersenne prime 2^31-1 keeps a*x+b within Long range.
  private val MinhashPrime = 2147483647L

  /** Deterministic affine hash family ((a*x + b) mod p), seeded. */
  private def hashFamily(n: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((rnd.nextInt(Int.MaxValue - 1).toLong + 1, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** 61-bit integer hash of a string via md5 (stable across engines/sessions,
    * unlike hashCode or xxhash seeds): first 15 hex chars parsed base-16.
    */
  def stableHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** MinHash signatures: for each doc, the min of each affine hash over its
    * shingle set — a single-pass native expression per row
    * ([[graft.functions.MinHashSignature]]): no explode, no aggregate
    * shuffle, embarrassingly parallel.
    */
  def minhashSignatures(sets: DataFrame, numHashes: Int, seed: Long): DataFrame = {
    val fams = hashFamily(numHashes, seed)
    val sig = graft.functions.HashExpressions
      .minhashSignature(col("sh"), fams.map(_._1), fams.map(_._2))
    sets.select(col("sid"), sig.as("sig"))
      .select(col("sid") +:
        (0 until numHashes).map(i => element_at(col("sig"), i + 1).as(s"m$i")): _*)
  }

  /** LSH candidate pairs from banded signatures: docs agreeing on ALL rows of
    * at least one band. Blocking key = (band index, band signature) — a plain
    * equi-join, skew-safe because a band bucket only holds near-identical
    * signatures.
    */
  def lshCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    // band key = xxhash64(band index, band rows): an 8-byte join key instead
    // of a concatenated string. A hash collision can only ADD a candidate
    // pair, and candidates are exactly verified downstream — so correctness
    // is unaffected while the banded shuffle carries fixed-width keys.
    val bandCols = (0 until bands).map { k =>
      val rows = (0 until rowsPerBand).map(r => col(s"m${k * rowsPerBand + r}"))
      xxhash64(lit(k) +: rows: _*)
    }
    val banded = sigs.select(col("sid"), explode(array(bandCols: _*)).as("bk"))
    val l = banded.select(col("sid").as("i"), col("bk"))
    val r = banded.select(col("sid").as("j"), col("bk"))
    l.join(r, l("bk") === r("bk") && col("i") < col("j"))
      .select("i", "j").distinct()
  }

  /** MinHash-LSH near-dup pairs with exact verification: LSH proposes, exact
    * Jaccard over the shingle sets disposes. Output identical to
    * [[ngramJaccardPairs]] whenever LSH recall holds (b/r chosen so the miss
    * probability at `threshold` is negligible: 32 bands × 2 rows ⇒
    * P(miss | s=0.5) = (1-0.25)^32 ≈ 1e-4, and ~0 for s ≥ 0.7).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String, k: Int,
                      threshold: Double, numHashes: Int = 64, bands: Int = 32,
                      seed: Long = 42L): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, k).cache()
    // cache: the banded self-join in lshCandidates reads signatures twice,
    // and the signature pipeline (explode + 64 min-aggs) is the expensive
    // part. At cluster scale this is a shuffle-materialized intermediate.
    val sigs = minhashSignatures(sets, numHashes, seed).cache()
    val cands = lshCandidates(sigs, bands, numHashes / bands)
    val ai = sets.select(col("sid").as("i"), col("sh").as("sh_i"), col("n_sh").as("na"))
    val bj = sets.select(col("sid").as("j"), col("sh").as("sh_j"), col("n_sh").as("nb"))
    cands.join(ai, "i").join(bj, "j")
      .withColumn("inter", size(array_intersect(col("sh_i"), col("sh_j"))))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("i", "j", "jaccard")
  }

  val SimhashBits = 60 // stableHash yields 60 usable bits (15 hex chars)

  /** Term-frequency-weighted SimHash (60-bit). Per token: ±count per bit
    * position of the token's stable hash; sign of each accumulated position
    * becomes the fingerprint bit. Single-pass native expression per row
    * ([[graft.functions.SimHash60]]) — no explode, no shuffle.
    */
  def simhashes(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("sid"),
      graft.functions.HashExpressions
        .simhash60(TextAnalysis.tokens(col(textCol))).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, found via
    * pigeonhole banding: split the fingerprint into (maxHamming+1) bands; any
    * pair within the distance budget must agree exactly on >= 1 band, so the
    * band equi-join has PERFECT recall (not probabilistic), then the full
    * Hamming check filters.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val nBands = maxHamming + 1
    val bandWidth = SimhashBits / nBands
    // cached: read twice by the band self-join below
    val sigs = simhashes(docs, idCol, textCol).cache()
    val bandCols = (0 until nBands).map { k =>
      val mask = ((1L << bandWidth) - 1) << (k * bandWidth)
      struct(lit(k).as("band"), col("simhash").bitwiseAND(mask).as("sig"))
    }
    val banded = sigs.select(col("sid"), col("simhash"), explode(array(bandCols: _*)).as("bk"))
    val l = banded.select(col("sid").as("i"), col("simhash").as("f_i"), col("bk"))
    val r = banded.select(col("sid").as("j"), col("simhash").as("f_j"), col("bk"))
    l.join(r, l("bk") === r("bk") && col("i") < col("j"))
      .select(col("i"), col("j"), bit_count(col("f_i").bitwiseXOR(col("f_j"))).as("hamming"))
      .filter(col("hamming") <= maxHamming) // cut before the dedup shuffle
      .distinct()
  }

  /** Connected components over near-dup pairs (i < j) by min-label
    * propagation: every node's label converges to the smallest id reachable
    * in its component, so each dup-cluster gets a canonical representative.
    *
    * `iterations` bounds the propagated distance; near-dup clusters have
    * tiny diameters (they are quasi-cliques from banding), so a fixed small
    * bound converges with room to spare while keeping the plan static —
    * no driver-side convergence loop over `count()`. At 100 TB the same
    * shape holds (keyed joins only); for adversarially long chains switch
    * to the large-star/small-star doubling variant (O(log n) rounds).
    */
  /** @param partitions parallelism for the propagation joins. The pair
    *   graph is orders of magnitude smaller than the corpus (that is the
    *   point of LSH blocking), so label propagation should NOT inherit the
    *   corpus-sized shuffle width — size it to the edge count.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50,
                          partitions: Int = 4): DataFrame = {
    // Run the propagation loop on a CHILD session (own conf, shared
    // SparkContext/cache) with the narrow shuffle width pinned at session
    // scope: no set/restore window on the caller's conf for concurrent
    // queries to race with. The pair graph crosses sessions via its RDD —
    // the localCheckpoint below materializes it anyway.
    val caller = pairs.sparkSession
    val spark = caller.newSession()
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    val result = locally {
      val edgesSrc = pairs.select(col("i").as("src"), col("j").as("dst"))
        .union(pairs.select(col("j").as("src"), col("i").as("dst")))
      val edges = spark.createDataFrame(edgesSrc.rdd, edgesSrc.schema)
        .repartition(partitions)
        .localCheckpoint(true) // computed once, re-read every iteration
      // one propagation round: neighbor hop (min label over incoming edges)
      // then pointer jump (label := label of label) — reach doubles per
      // round, so any diameter converges in O(log d) rounds. The plan stays
      // LAZY so two rounds fuse into a single materialization below.
      def oneRound(l: DataFrame): DataFrame = {
        val prop = edges.join(l, col("src") === col("id"))
          .groupBy(col("dst")).agg(min(col("label")).as("nlabel"))
        val p1 = l.join(prop, col("id") === col("dst"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        val byLabel = p1.select(col("id").as("jid"), col("label").as("jlabel"))
        p1.join(byLabel, col("label") === col("jid"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("jlabel"), col("label"))).as("label"))
      }
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id"))
        .localCheckpoint(true)
      var round = 0
      var converged = false
      while (!converged && round < maxRounds) {
        // TWO rounds per materialization (reach ×4), then ONE checkpoint:
        // the lineage must be truncated each outer iteration (the update
        // references its input twice → 2^k plan blowup measured at 132 s
        // vs ~2 s) but a bounded 2-round unroll is fine. On a cluster use
        // checkpoint() instead of localCheckpoint().
        labels = oneRound(oneRound(labels)).localCheckpoint(true)
        round += 2
        // fixpoint test with NO history: a labeling is converged iff every
        // edge has equal endpoint labels (labels are always component
        // member ids, so edge-uniformity implies label(label)=label too).
        // take(1)-style isEmpty, not a full count.
        val l1 = labels.select(col("id").as("sid"), col("label").as("slabel"))
        val l2 = labels.select(col("id").as("did"), col("label").as("dlabel"))
        converged = edges
          .join(l1, col("src") === col("sid")).join(l2, col("dst") === col("did"))
          .filter(col("slabel") =!= col("dlabel")).isEmpty
      }
      labels
    }
    // hand the (checkpointed, tiny) labels back on the CALLER's session:
    // returning the child-session DataFrame would silently run every
    // downstream join/aggregate chained onto it at the narrow pair-graph
    // width — exactly the corpus-scale-work-inherits-4-partitions hazard
    // this function's width isolation exists to prevent
    caller.createDataFrame(result.rdd, result.schema)
  }
}
