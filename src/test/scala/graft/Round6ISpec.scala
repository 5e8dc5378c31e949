package graft

import org.apache.spark.sql.functions._

/** Golden tests for the closing round-6 batch (streaming top-k, composed
  * curation pipeline).
  */
class Round6ISpec extends SparkSpec {

  test("streaming top-k: at most 2 ranks per window, counts descending") {
    val rows = SparkEntry.queries("q199_stream_topk")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val byWindow = rows.groupBy(_.getTimestamp(0))
    byWindow.values.foreach { w =>
      val ranked = w.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to ranked.length))
      assert(ranked.length <= 2)
      // counts non-increasing with rank
      val ns = ranked.map(_.getLong(3))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    }
  }

  test("curation pipeline only ever removes documents, never invents them") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val total = docs.count()
    val perLangIn = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = SparkEntry.queries("q200_curation_pipeline")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    val kept = out.map(_.getLong(1)).sum
    assert(kept > 0 && kept <= total)
    out.foreach { r =>
      assert(r.getLong(1) <= perLangIn(r.getString(0)))
    }
    // chars-per-doc sanity: census totals are consistent
    out.foreach(r => assert(r.getLong(2) >= r.getLong(1))) // >=1 char/doc
  }

  test("curation pipeline equals its stages run separately") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    val ta = graft.ext.TextAnalysis
    val quality = docs.filter(ta.qualityScore(col("text")) >= 0.68)
    val keep1 = quality.withColumn("fp", ta.fingerprint(col("text")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("fp").orderBy("doc_id")))
      .filter(col("rn") === 1)
    val pairs = graft.ext.Dedup.ngramJaccardPairs(
      keep1.select("doc_id", "text"), "doc_id", "text", 3, 0.5)
    val comp = graft.ext.Dedup.connectedComponents(pairs)
    val nClustered = comp.count()
    val nClusters = comp.select("label").distinct().count()
    val expected = keep1.count() - nClustered + nClusters
    val out = SparkEntry.queries("q200_curation_pipeline")(spark, dir)
      .agg(sum("n_docs")).head().getLong(0)
    assert(out == expected)
  }

  test("ANN recall: bounded by 1, and brute force against itself is 1") {
    val rows = SparkEntry.queries("q201_ann_recall")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // schema: (method, qid, k, hits, recall)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2)) // hits <= k
      val rec = r.getDouble(4)
      assert(rec >= 0d && rec <= 1d)
    }
    // sanity of the metric itself: truth evaluated against truth is 1.0
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") % 50 === 0)
    val brute = graft.ext.Similarity.bruteForceTopK(q, emb, 5)
      .select(col("qid"), col("nid"))
    val self = brute.join(brute.toDF("qid2", "nid2"),
        col("qid") === col("qid2") && col("nid") === col("nid2"),
        "left_semi")
      .count()
    assert(self == brute.count())
  }

  test("negative sampling never collides with anchors or positives") {
    val dir = "/root/testdata/sf0.001"
    val negs = SparkEntry.queries("q203_negative_sampling")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(negs.nonEmpty)
    assert(negs.forall { case (i, _, neg) => neg != i })
    val pos = graft.ext.Dedup.ngramJaccardPairs(
        graft.sources.Tables.documents(spark, dir), "doc_id", "text", 3, 0.5)
      .select("i", "j").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0)))).toSet
    assert(negs.forall { case (i, _, neg) => !pos.contains((i, neg)) })
    // content-addressed: a second run produces the identical sample
    val again = SparkEntry.queries("q203_negative_sampling")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(negs.toSeq == again.toSeq)
  }

  test("calibration curve: balanced deciles, outcome rate within [0,1]") {
    val rows = SparkEntry.queries("q204_calibration_curve")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    // ntile balance: decile sizes differ by at most 1
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0d && r.getDouble(3) <= 1d)
    }
    // mean quality is non-decreasing across deciles by construction
    val mq = rows.sortBy(_.getInt(0)).map(_.getDouble(2))
    assert(mq.zip(mq.tail).forall { case (a, b) => b >= a })
  }
}
