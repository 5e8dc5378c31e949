package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Lloyd E-step shape bench (r13 verdict #7): the crossJoin + min(struct)
  * E-step ([[graft.ext.Similarity]] `lloyd`) multiplies every vector ×k
  * through struct churn and a partial aggregate before the argmin
  * collapses it back to n rows; the codegen [[graft.functions.NearestInSet]]
  * projection computes the same argmin as one narrow map — no row
  * multiplication, no aggregate, no exchange. This measures the
  * per-iteration assignment cost of both shapes at k = 64 / 256 / 1024
  * (the autoscale law's production band is k ~ 10³–10⁴), median of 3,
  * plus their assignment agreement: the two differ only in float
  * association (v·v − 2v·c + c·c vs Σ(x−c)²), so ties at cluster
  * boundaries may flip a handful of vectors — the count is printed so the
  * swap's blast radius is a number, not a guess. Prints ONE JSON line.
  */
object KmEStepBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val e = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("v"))
      .localCheckpoint(true)
    val n = e.count()

    val legs = Seq(64, 256, 1024).filter(_ <= n).map { k =>
      // centroid set: the first k vectors, cids = vec_ids (sorted — the
      // argmin tie rules then coincide: lowest cid ≡ lowest index)
      val cents = e.filter(col("vec_id") < k)
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
        .sortBy(_._1)
      val dim = cents.head._2.length
      val flat = cents.flatMap(_._2).toArray
      val cidArr = cents.map(_._1)

      def crossJoinAssign(): DataFrame = {
        val cdf = broadcast(cents.toSeq.toDF("cid", "cv"))
        e.crossJoin(cdf)
          .withColumn("d2", Similarity.dot(col("v"), col("v"))
            - lit(2.0) * Similarity.dot(col("v"), col("cv"))
            + Similarity.dot(col("cv"), col("cv")))
          .groupBy("vec_id")
          .agg(min(struct(col("d2"), col("cid"))).as("best"))
          .select(col("vec_id"), col("best.cid").as("cluster"))
      }
      def nearestAssign(): DataFrame =
        e.select(col("vec_id"), graft.functions.VectorExpressions
            .nearestInSet(col("v"), flat, dim).as("best"))
          .select(col("vec_id"),
            element_at(lit(cidArr), col("best.cid") + 1).as("cluster"))
      // the DOT-FORM variant `lloyd` actually ships (bit-exact to the
      // crossJoin formula — PqExpressionsSpec) — n_diff vs crossJoin MUST
      // be 0 by construction; enforced below, not just reported
      def nearestDotAssign(): DataFrame =
        e.select(col("vec_id"), graft.functions.VectorExpressions
            .nearestInSetDot(col("v"), flat, dim).as("best"))
          .select(col("vec_id"),
            element_at(lit(cidArr), col("best.cid") + 1).as("cluster"))

      def run(df: => DataFrame): Double = median((1 to 3).map { _ =>
        time(df.agg(sum(col("cluster"))).head().getLong(0))._1
      })
      val crossS = run(crossJoinAssign())
      val nearS = run(nearestAssign())
      val nearDotS = run(nearestDotAssign())
      val nDiff = crossJoinAssign().as("a")
        .join(nearestAssign().as("b"), Seq("vec_id"))
        .filter(col("a.cluster") =!= col("b.cluster")).count()
      val nDiffDot = crossJoinAssign().as("a")
        .join(nearestDotAssign().as("b"), Seq("vec_id"))
        .filter(col("a.cluster") =!= col("b.cluster")).count()
      require(nDiffDot == 0,
        s"dot-form argmin diverged from the crossJoin E-step at k=$k " +
          s"($nDiffDot rows) — the bit-exactness contract is broken")
      (k, crossS, nearS, nearDotS, nDiff)
    }

    require(legs.nonEmpty && n > 0, "no embeddings — refusing to print")
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val legJson = legs.map { case (k, c, ne, nd, d) =>
      s""""k$k":{"cross_s":${f(c)},"nearest_s":${f(ne)},""" +
        s""""nearest_dot_s":${f(nd)},"n_diff":$d}"""
    }.mkString(",")
    println(s"""{"metric":"km_estep","value":${f(legs.last._2)},""" +
      s""""unit":"sec",$legJson,"n_vectors":$n,"sf":"$sfDir"}""")
    spark.stop()
  }
}
