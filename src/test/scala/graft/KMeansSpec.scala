package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Iterative Lloyd k-means: separable blobs must be recovered exactly, and
  * repeated runs must be deterministic (init is vec_id-ordered, all
  * reductions are argmin/mean with full tie-breaks).
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // three tight 2-D blobs around (0,0), (10,10), (20,0); 8 points each.
  // ids interleave across blobs (id % 3 = blob) so the vec_id-ordered init
  // seeds one centroid per blob — Lloyd refines good seeds, it does not
  // recover from all-in-one-blob seeding (standard k-means caveat).
  private def blobs = {
    val pts = for {
      (cx, cy, blob) <- Seq((0.0, 0.0, 0L), (10.0, 10.0, 1L), (20.0, 0.0, 2L))
      i <- 0 until 8
    } yield (blob + 3L * i, Array((cx + (i % 4) * 0.1).toFloat, (cy + (i / 4) * 0.1).toFloat))
    pts.toDF("vec_id", "embedding")
  }

  test("kmeans recovers separable blobs and converges in few iterations") {
    val out = Similarity.kmeans(blobs, k = 3, iterations = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    val byBlob = out.groupBy { case (id, _) => id % 3 }
    // every blob lands in exactly one cluster, blobs in distinct clusters
    val clusterOf = byBlob.map { case (b, rows) =>
      val cs = rows.map(_._2._1).distinct
      assert(cs.length == 1, s"blob $b split across clusters $cs")
      b -> cs.head
    }
    assert(clusterOf.values.toSeq.distinct.length == 3)
    // distances to own centroid are tiny for tight blobs
    assert(out.forall { case (_, (_, d)) => d < 1.0 })
  }

  test("kmeans is deterministic across runs") {
    val a = Similarity.kmeans(blobs, 3, 3).orderBy("vec_id").collect().toSeq
    val b = Similarity.kmeans(blobs, 3, 3).orderBy("vec_id").collect().toSeq
    assert(a == b)
  }
}
