package graft

import org.apache.spark.sql.functions._

/** Round-8 contracts: the IVF-PQ index-build API and the release of the
  * search-time corpus pin (VERDICT r7 next-round #7).
  */
class Round8Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private val searchOps: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
    "ivfPqTopK" -> (emb => graft.ext.Similarity.ivfPqTopK(
      emb, 32, 5, col("vec_id") % 50 === 0, 24, 480)),
    "ivfTopK" -> (emb => graft.ext.Similarity.ivfTopK(
      emb, 8, 3, col("vec_id") % 50 === 0)),
    "ivfProbeTopK" -> (emb => graft.ext.Similarity.ivfProbeTopK(
      emb, 8, 3, col("vec_id") % 50 === 0, 2))
  )

  for ((opName, op) <- searchOps)
    test(s"$opName releases all corpus-sized pins once results materialize") {
      val sc = spark.sparkContext
      // quiesce: drop anything earlier suites pinned so the delta is ours
      spark.catalog.clearCache()
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      val before = sc.getPersistentRDDs.keySet
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val res = op(emb)
      val nres = res.count()
      assert(nres > 0)
      val after = sc.getPersistentRDDs.filter { case (id, _) => !before(id) }
      // the ONLY surviving pin is the eager |queries|*k result checkpoint —
      // tiny by contract; anything corpus-sized here means the index pin
      // leaked back into session lifetime
      val corpus = emb.count()
      for ((_, rdd) <- after) {
        val n = rdd.count()
        assert(n <= nres,
          s"leaked pinned RDD with $n rows (result has $nres, corpus $corpus): " +
            s"$opName must unpersist its index before returning [${rdd.name}]")
      }
    }

  test("buildIvfPqIndex + ivfPqSearchIndexed == ivfPqTopK (same results)") {
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val pred = col("vec_id") % 50 === 0
    val viaWrapper = graft.ext.Similarity
      .ivfPqTopK(emb, 32, 5, pred, 24, 480)
      .select("qid", "rn", "nid").collect().map(_.toSeq).toSet
    val index = graft.ext.Similarity.buildIvfPqIndex(emb, 32, 24).persist()
    try {
      val viaIndex = graft.ext.Similarity
        .ivfPqSearchIndexed(index, 5, pred, 480)
        .select("qid", "rn", "nid").collect().map(_.toSeq).toSet
      assert(viaIndex == viaWrapper)
    } finally index.unpersist(blocking = false)
  }

  test("index schema: (vec_id, cells, v, pq_code), home cell = cells(0)") {
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val index = graft.ext.Similarity.buildIvfPqIndex(emb, 32, 4)
    assert(index.columns.toSeq == Seq("vec_id", "cells", "v", "pq_code"))
    assert(index.count() == emb.count())
    // cells(0) must equal the single-probe argmax assignment
    val home = index.select(col("vec_id"), col("cells").getItem(0).as("cell"))
    val argmax = graft.ext.Similarity.ivfAssignProbes(emb, 32, 1)
      .select(col("vec_id"), col("cells").getItem(0).as("cell"))
    assert(home.exceptAll(argmax).isEmpty && argmax.exceptAll(home).isEmpty)
  }
}
