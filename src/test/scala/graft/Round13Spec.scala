package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity}

/** Round-13 invariants: the incremental-dedup state seams (persisted
  * postings probe + delta-sized label updates) pinned against their
  * oracle-verified full-recompute twins, and the external-query id
  * contract failing loudly instead of silently dropping candidates.
  */
class Round13Spec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.001"
  // the q232 / IncCcBench split: every 5th doc is the ingest batch
  private def split() = {
    val docs = graft.sources.Tables.documents(spark, Dir)
    val isBatch = col("doc_id") % 5 === 0
    (docs.filter(!isBatch), docs.filter(isBatch))
  }

  test("indexed cross-corpus pairs == the direct cross-corpus join " +
      "(Dedup.crossCorpusJaccardPairsIndexed vs crossCorpusJaccardPairs)") {
    val (corpus, batch) = split()
    val direct = Dedup
      .crossCorpusJaccardPairs(corpus, batch, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val postings = Dedup.ngramPostings(corpus, "doc_id", "text", 3)
      .localCheckpoint(true) // stands in for the persisted parquet state
    val indexed = Dedup
      .crossCorpusJaccardPairsIndexed(postings,
        Dedup.ngramPostingSizes(postings), batch, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(direct.nonEmpty, "fixture produced no cross-corpus pairs")
    assert(indexed.sameElements(direct))
  }

  test("incremental label updates applied to the persisted state == the " +
      "full CC rebuild (changed ∪ fresh ∪ singles vs q232's relabel)") {
    val (corpus, batch) = split()
    // prep (the persisted state a production deployment amortizes)
    val postings = Dedup.ngramPostings(corpus, "doc_id", "text", 3)
      .localCheckpoint(true)
    val sizes = Dedup.ngramPostingSizes(postings).localCheckpoint(true)
    val labels = Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5))
      .localCheckpoint(true)
    // the per-ingest step under test
    val newPairs = Dedup.incrementalCcPairs(postings, sizes, batch,
        "doc_id", "text", 3, 0.5)
      .localCheckpoint(true)
    assert(newPairs.count() > 0, "fixture produced no delta pairs")
    val updates = Dedup.incrementalCcLabelUpdates(labels, newPairs,
      batch.select(col("doc_id").as("id")))
    val applied = Dedup.applyCcLabelUpdates(labels, updates)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the oracle-shaped truth: full CC over corpus ∪ batch (q65/q232's
    // reachability-closure semantics, hash-verified in CORRECTNESS)
    val docs = graft.sources.Tables.documents(spark, Dir)
    val full = Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // (a) on every doc the rebuild labels, the applied state is EXACT
    val mismatched = full.filter { case (id, l) => applied.get(id) != Some(l) }
    assert(mismatched.isEmpty,
      s"applied state diverges from the full rebuild on ${mismatched.size} " +
        s"ids, e.g. ${mismatched.take(3)}")
    // (b) the only extra rows are explicit self-labels for batch docs the
    // rebuild leaves implicit (they pair with nothing, so the full pair
    // graph never sees them) — no corpus doc gains a phantom row
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val extras = applied.keySet -- full.keySet
    assert(extras.subsetOf(batchIds),
      s"non-batch ids inserted: ${(extras -- batchIds).take(3)}")
    assert(extras.forall(id => applied(id) == id))
    // (c) the update set did real work on this fixture: at least one doc
    // was labeled into an existing component or merged across one
    val nontrivial = updates.filter(col("label") =!= col("id")).count()
    assert(nontrivial > 0, "update set is all self-labels — fixture too weak")
  }

  test("a colliding external qid fails loudly under the debug gate " +
      "instead of silently dropping the corpus row") {
    val emb = graft.sources.Tables.embeddings(spark, Dir)
    val index = Similarity.buildIvfPqIndex(emb, 8, 2).localCheckpoint(true)
    def queriesFrom(offset: Long) = {
      val q = index.filter(col("vec_id") < 5)
      (q.select((col("vec_id") + offset).as("qid"), col("v").as("qv")),
        q.select((col("vec_id") + offset).as("qid"),
          explode(col("cells")).as("cell")))
    }
    spark.conf.set(Similarity.AssertQidDisjointConf, "true")
    try {
      // colliding qids (no offset): the gate must throw at call time
      val (badQ, badC) = queriesFrom(0L)
      val ex = intercept[IllegalArgumentException] {
        Similarity.ivfPqSearchQueries(index, badQ, badC, 3, 10)
      }
      assert(ex.getMessage.contains("ExternalQueryIdOffset"))
      // the sanctioned construction passes the gate and returns results
      val (goodQ, goodC) = queriesFrom(Similarity.ExternalQueryIdOffset)
      assert(Similarity.ivfPqSearchQueries(index, goodQ, goodC, 3, 10)
        .count() > 0)
      // and the self-query path is exempt by design (its qids ARE corpus
      // ids — the nid != qid guard is its self-match filter, not a bug)
      assert(Similarity.ivfPqSearchIndexed(index, 3, col("vec_id") < 5, 10)
        .count() > 0)
    } finally spark.conf.unset(Similarity.AssertQidDisjointConf)
  }
}
