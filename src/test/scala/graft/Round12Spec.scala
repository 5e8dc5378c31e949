package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Round-12 invariants: the seeded k-means++ init (the production centroid
  * derivation every first-n stand-in's scaladoc has named since round 8)
  * and the shared pair-join-shape helpers.
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  // three tight 2-D blobs with ADVERSARIAL id order: ids 0-7 all in blob 0,
  // 8-15 in blob 1, 16-23 in blob 2 — so the deterministic first-3 init
  // seeds every centroid inside blob 0 and Lloyd cannot recover (the
  // standard k-means caveat KMeansSpec's interleaved fixture dodges).
  // k-means++'s D²-weighted draws must spread the seeds across blobs.
  private def skewedBlobs = {
    val pts = for {
      (cx, cy, blob) <- Seq((0.0, 0.0, 0L), (10.0, 10.0, 1L), (20.0, 0.0, 2L))
      i <- 0 until 8
    } yield (blob * 8L + i,
      Array((cx + (i % 4) * 0.1).toFloat, (cy + (i / 4) * 0.1).toFloat))
    pts.toDF("vec_id", "embedding")
  }

  private def quantErr(pts: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame): Double =
    pts.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"),
        expr("aggregate(zip_with(v, cv, (a, b) -> (a - b) * (a - b)), " +
          "0D, (acc, x) -> acc + x)").as("d2"))
      .groupBy("vec_id").agg(min(col("d2")).as("best"))
      .agg(sum("best")).head().getDouble(0)

  test("k-means++ init recovers adversarially ordered blobs where the " +
      "first-n init cannot") {
    val firstN = Similarity.kmeansCentroids(skewedBlobs, 3, 5)
    val pp = Similarity.kmeansPlusPlusCentroids(skewedBlobs, 3, 5, seed = 42L)
    assert(pp.count() == 3)
    val (eFirst, ePp) = (quantErr(skewedBlobs, firstN), quantErr(skewedBlobs, pp))
    // first-3 seeds all sit in blob 0 → two blobs end up lumped under one
    // centroid (error dominated by a ~10-unit-radius merged cluster);
    // k-means++ seeds one per blob → per-point error is the within-blob
    // jitter. The gap is structural (orders of magnitude), so assert a
    // strict factor, not an epsilon.
    assert(ePp * 10 < eFirst,
      s"k-means++ ($ePp) should beat first-n ($eFirst) by >10x here")
    // and the ++-seeded clustering actually separates the blobs
    val assigned = skewedBlobs
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(pp))
      .select(col("vec_id"),
        expr("aggregate(zip_with(v, cv, (a, b) -> (a - b) * (a - b)), " +
          "0D, (acc, x) -> acc + x)").as("d2"), col("cid"))
      .groupBy("vec_id").agg(min_by(col("cid"), col("d2")).as("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byBlob = assigned.groupBy { case (id, _) => id / 8 }
      .map { case (b, rows) => b -> rows.map(_._2).distinct }
    assert(byBlob.values.forall(_.length == 1), s"blob split: $byBlob")
    assert(byBlob.values.flatten.toSeq.distinct.length == 3)
  }

  test("k-means++ is deterministic under a fixed seed; init picks corpus " +
      "points") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("cid")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    val a = rows(Similarity.kmeansPlusPlusCentroids(skewedBlobs, 3, 3, 7L))
    val b = rows(Similarity.kmeansPlusPlusCentroids(skewedBlobs, 3, 3, 7L))
    assert(a == b)
    // the raw init (before Lloyd) picks actual corpus vectors, k of them,
    // all distinct
    val init = rows(Similarity.kmeansPlusPlusInit(skewedBlobs, 3, 7L))
    assert(init.map(_._1) == Seq(0L, 1L, 2L))
    val corpus = skewedBlobs
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0)).toSet
    assert(init.map(_._2).forall(corpus.contains))
    assert(init.map(_._2).distinct.length == 3)
  }

  test("k-means++ centroid table drives the refresh path end-to-end") {
    // the production composition the init exists for: ++-derived fine
    // centroids feed buildIvfPqIndexWith; with every cell probed and
    // rerank >= corpus the search must degenerate to exact brute force
    // REGARDLESS of centroid quality (Round8Spec's degeneracy gate, now
    // over the seeded init).
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count().toInt
    val pred = col("vec_id") % 50 === 0
    val km = Similarity.kmeansPlusPlusCentroids(emb, 8, 2, seed = 1L)
    val index = Similarity.buildIvfPqIndexWith(emb, km, nprobe = 8).persist()
    try {
      val got = Similarity.ivfPqSearchIndexed(index, 5, pred, rerank = n)
        .select("qid", "rn", "nid").collect().map(_.toSeq).toSet
      val want = Similarity.bruteForceTopK(emb.filter(pred), emb, 5)
        .select("qid", "rn", "nid").collect().map(_.toSeq).toSet
      assert(got == want)
    } finally index.unpersist(blocking = false)
  }

  test("cellLocalDupIds == the inline score-then-distinct shape it replaced") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val assigned = Similarity.ivfAssignProbes(emb, 8, 4).localCheckpoint(true)
    val viaHelper = Similarity.cellLocalDupIds(assigned, 0.3)
      .collect().map(_.getLong(0)).sorted
    val probes = assigned.select(col("vec_id"),
      explode(col("cells")).as("cell"), col("v"))
    val inline = probes
      .select(col("cell"), col("vec_id").as("i"), col("v").as("vi"))
      .join(probes.select(col("cell"), col("vec_id").as("j"),
        col("v").as("vj")), "cell")
      .filter(col("i") < col("j"))
      .filter(Similarity.cosine(col("vi"), col("vj")) >= 0.3)
      .select(col("j")).distinct()
      .collect().map(_.getLong(0)).sorted
    assert(viaHelper.nonEmpty && viaHelper.sameElements(inline))
  }
}
