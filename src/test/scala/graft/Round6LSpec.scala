package graft

import org.apache.spark.sql.functions._

/** Golden tests for the round-6 pipeline additions: hybrid rank fusion
  * (q208), context chunking (q209), semantic dedup (q210), mixture
  * rebalance (q211), and the BPE pair census (q212).
  */
class Round6LSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q208: RRF scores recompute from the rank columns and rank densely") {
    val rows = SparkEntry.queries("q208_hybrid_rank_fusion")(spark, dir)
      .collect()
    assert(rows.length == 20)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 20))
    rows.foreach { r =>
      val (lex, sem, rrf) = (r.getInt(2), r.getInt(3), r.getDouble(4))
      val expect = (if (lex > 0) 1.0 / (60 + lex) else 0.0) +
        (if (sem > 0) 1.0 / (60 + sem) else 0.0)
      assert(rrf == expect, s"rrf $rrf != recomputed $expect")
      assert(lex > 0 || sem > 0, "fused doc must appear in >=1 rank list")
    }
    // fused order is (rrf desc, doc_id asc) with no inversions
    rows.sliding(2).foreach { p =>
      if (p.length == 2)
        assert(p(0).getDouble(4) > p(1).getDouble(4) ||
          (p(0).getDouble(4) == p(1).getDouble(4) &&
            p(0).getLong(1) < p(1).getLong(1)))
    }
  }

  test("q209: chunk grid tiles every document exactly (stride 24, window 32)") {
    import spark.implicits._
    val lens = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ", -1)).as("n"))
      .as[(Long, Int)].collect().toMap
    val chunks = SparkEntry.queries("q209_context_chunking")(spark, dir)
      .select("doc_id", "chunk_idx", "n_tok")
      .as[(Long, Int, Int)].collect()
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = lens(doc)
      assert(cs.length == (n - 1) / 24 + 1, s"doc $doc chunk count")
      cs.foreach { case (_, k, nt) =>
        assert(nt == math.min(32, n - k * 24), s"doc $doc chunk $k n_tok")
      }
    }
    assert(chunks.map(_._1).toSet == lens.keySet) // no document dropped
  }

  test("q209: training order is content-addressed (stable across re-runs)") {
    import spark.implicits._
    def order = SparkEntry.queries("q209_context_chunking")(spark, dir)
      .select("doc_id", "chunk_idx").as[(Long, Int)].collect().toSeq
    val o = order
    assert(o == order)
    // the shuffle actually permutes: not in (doc, chunk) order
    assert(o != o.sorted)
  }

  test("q210: dup flags match a brute-force multi-probe verdict") {
    import spark.implicits._
    val rows = SparkEntry.queries("q210_semantic_dedup")(spark, dir)
      .select("vec_id", "cell", "is_dup").as[(Long, Long, Int)].collect()
      .sortBy(_._1)
    assert(rows.length == 500)
    // rebuild the 32-cell / 4-probe assignment and the greedy verdict in
    // the driver (sequential-fold cosine, identical association to the
    // engine) and compare every flag — the full operator contract, not
    // just an invariant. Knobs mirror VectorQueries.SemDedup{Cells,
    // Probes,Tau}; drift fails the cell-column compare immediately.
    val (cells, probes, tau) = (32, 4, 0.3)
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val probeSets: Map[Long, Seq[Long]] = vecs.map { case (id, v) =>
      id -> (0L until cells.toLong)
        .map(cid => (cid, cos(v, vecs(cid))))
        .sortBy { case (cid, c) => (-c, cid) }.take(probes).map(_._1)
    }
    val ids = vecs.keys.toSeq.sorted
    val expectDup = ids.map { j =>
      j -> ids.exists(i => i < j &&
        probeSets(i).exists(probeSets(j).contains) &&
        cos(vecs(i), vecs(j)) >= tau)
    }.toMap
    rows.foreach { case (id, cell, isDup) =>
      assert(cell == probeSets(id).head, s"vec $id primary cell")
      assert(isDup == (if (expectDup(id)) 1 else 0), s"vec $id dup flag")
    }
    assert(rows.exists(_._3 == 1) && rows.exists(_._3 == 0),
      "corpus exercises both verdicts")
  }

  test("q211: planned docs decompose into floor-epochs plus hash extras") {
    import spark.implicits._
    val rows = SparkEntry.queries("q211_mixture_rebalance")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    val total = rows.map(_._3).sum
    val target = total / rows.length
    rows.foreach { case (src, nDocs, tokens, epochsMicro, nExtra, pDocs, _) =>
      assert(epochsMicro == target * 1000000L / tokens, s"$src epochs")
      assert(pDocs == nDocs * (epochsMicro / 1000000L) + nExtra, s"$src docs")
      if (tokens > target) assert(epochsMicro < 1000000L, s"$src downsamples")
      if (tokens < target) assert(epochsMicro > 1000000L, s"$src upsamples")
    }
  }

  test("q212: merge priorities match a brute-force pair count") {
    import spark.implicits._
    val texts = graft.sources.Tables.documents(spark, dir)
      .select("text").as[String].collect()
    val brute = texts.flatMap(_.split(" ", -1)).filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val top = SparkEntry.queries("q212_bpe_pair_census")(spark, dir)
      .select("pair", "cnt", "rn").as[(String, Long, Int)].collect()
    assert(top.length == 20)
    assert(top.map(_._3).toSeq == (1 to 20))
    top.foreach { case (pair, cnt, _) =>
      assert(brute(pair) == cnt, s"pair $pair count")
    }
    // rank 1 is the global argmax the next BPE merge would fuse
    val expected = brute.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    assert(top.map(t => (t._1, t._2)).toSeq == expected)
  }

  test("q209/q213 oracle scaffold: no document exceeds the 256-chunk cap") {
    // the DuckDB oracles tile chunks from a range(0, 256) scaffold; a
    // document longer than 6144 tokens would silently lose chunks on the
    // oracle side only. Guard the corpus assumption like Round6ESpec's
    // ASCII guard — at the oracle SF as well as the spec SF.
    import spark.implicits._
    for (d <- Seq(dir, "/root/testdata/sf0.01")) {
      val maxTok = graft.sources.Tables.documents(spark, d)
        .select(size(split(col("text"), " ", -1)).as("n"))
        .agg(max("n")).as[Int].head()
      assert(maxTok <= 6144, s"$d: $maxTok-token document overruns the cap")
    }
  }

  test("census scaffold: events.value is a 2-decimal bounded domain") {
    // q189's decile edges (and the census-decomposition pattern generally)
    // compress the corpus to its distinct-value domain; that is only a
    // compression if the domain is bounded. Pin the corpus fact the
    // formulation rides on: values are 2-decimal and range-bounded, so
    // |distinct| saturates while |rows| grows.
    for (d <- Seq(dir, "/root/testdata/sf0.01")) {
      val r = graft.sources.Tables.events(spark, d)
        .agg(max(abs(col("value") * 100 - round(col("value") * 100, 0)))
          .as("frac"), min("value").as("lo"), max("value").as("hi")).head()
      assert(r.getDouble(0) < 1e-6, s"$d: value is not 2-decimal")
      assert(r.getDouble(1) >= 0.0 && r.getDouble(2) <= 100000.0,
        s"$d: value domain outside [0, 1e5]")
    }
  }

  test("q214: found ⊆ true, and multi-probe recall holds ≥0.9 at both SFs") {
    // the round-6 single-probe config measured 0.54/0.85 — the multi-probe
    // pairing exists precisely to hold recall while the cell count scales,
    // so pin the measured floor at BOTH oracle scale factors
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val r = SparkEntry.queries("q214_semantic_dedup_recall")(spark, d)
        .collect().head
      // assert the truth sample is non-empty BEFORE touching the other
      // columns — on an empty-hits corpus they are NULL and getLong would
      // NPE past the diagnostic
      val nTrue = r.getLong(0)
      assert(nTrue > 0, s"$d: eval needs a non-empty truth sample")
      val (nFound, recall) = (r.getLong(1), r.getDouble(2))
      assert(nFound <= nTrue,
        s"$d: cell-bounded verdicts cannot exceed the truth")
      assert(recall >= 0.9, s"$d: multi-probe recall $recall below 0.9")
    }
  }

  test("q215: no near-dup pair straddles a split boundary (leakage-safe)") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, dir)
    val pairs = graft.ext.Dedup
      .ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("i", "j").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "corpus must contain near-dup pairs to test")
    // recompute the per-doc split exactly as q215 assigns it
    val labels = graft.ext.Dedup
      .connectedComponents(docs.sparkSession
        .createDataFrame(pairs).toDF("i", "j"))
      .as[(Long, Long)].collect().toMap
    def split(doc: Long): String = {
      val grp = labels.getOrElse(doc, doc)
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(grp.toString.getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md5.take(6).map("%02x".format(_)).mkString, 16)
      val b = h % 100
      if (b < 80) "train" else if (b < 90) "valid" else "test"
    }
    pairs.foreach { case (i, j) =>
      assert(split(i) == split(j),
        s"near-dup pair ($i, $j) split across ${split(i)}/${split(j)}")
    }
    // and the census the query emits covers every document exactly once
    val census = SparkEntry.queries("q215_leakage_safe_split")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(census.map(_._2).sum == docs.count())
  }

  test("q213: composed pipeline prunes at every stage and plans to target") {
    import spark.implicits._
    val rows = SparkEntry.queries("q213_chunk_mix_pipeline")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum
    val target = total / rows.length
    rows.foreach { case (src, nChunks, tokens, epochsMicro, pChunks, pTok) =>
      assert(epochsMicro == target * 1000000L / tokens, s"$src epochs")
      assert(pChunks >= nChunks * (epochsMicro / 1000000L), s"$src chunks")
      assert(pTok <= tokens * (epochsMicro / 1000000L + 1), s"$src tokens")
    }
    // the quality gate + the two dedup rungs actually prune: the scheduled
    // chunk census is strictly below the raw chunk grid of the corpus
    val rawChunks = graft.sources.Tables.documents(spark, dir)
      .select(size(split(col("text"), " ", -1)).as("n"))
      .as[Int].collect().map(n => (n - 1) / 24 + 1).map(_.toLong).sum
    assert(rows.map(_._2).sum < rawChunks,
      "pipeline must drop gated/duplicate chunks")
  }
}
