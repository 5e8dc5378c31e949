package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Seeding-cost split for the two production k-means inits: k-means++
  * (k sequential one-aggregate rounds — [[Similarity.kmeansPlusPlusInit]])
  * vs k-means‖ (O(rounds) oversampled passes + driver recluster —
  * [[Similarity.kmeansParallelInit]]). The ‖ scaladoc claims the pass
  * structure is what makes large k affordable; this measures it at k=8
  * (where the two should be comparable) and k=64 (where ++ pays 64 jobs
  * and ‖ still pays ~5 passes), with the post-init quantization error
  * (integer micro-units, no Lloyd) so the speed is priced against seed
  * quality. Prints ONE JSON line; the row-count gate runs BEFORE the
  * print (a failed leg must never leave quotable timings).
  */
object KmInitBench {
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

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val n = emb.count()

    def errMicro(cents: DataFrame): Long =
      emb.select(Similarity.asDouble(col("embedding")).as("v"),
          col("vec_id"))
        .crossJoin(broadcast(cents))
        .select(col("vec_id"),
          greatest(Similarity.dot(col("v"), col("v"))
            - lit(2.0) * Similarity.dot(col("v"), col("cv"))
            + Similarity.dot(col("cv"), col("cv")), lit(0.0)).as("d2"))
        .groupBy("vec_id").agg(min(col("d2")).as("best"))
        .agg(sum(floor(col("best") * 1000000d + 0.5d).cast("long")).as("e"))
        .head().getLong(0)

    case class Leg(k: Int, ppS: Double, ppErr: Long, ppRows: Long,
                   parS: Double, parErr: Long, parRows: Long)
    val legs = Seq(8, 64).map { k =>
      val (ppS, pp) = time {
        Similarity.kmeansPlusPlusInit(emb, k, seed = 42L).localCheckpoint(true)
      }
      val (parS, par) = time {
        Similarity.kmeansParallelInit(emb, k, seed = 42L).localCheckpoint(true)
      }
      Leg(k, ppS, errMicro(pp), pp.count(), parS, errMicro(par), par.count())
    }

    spark.stop()
    val bad = legs.filter(l => l.ppRows != l.k || l.parRows != l.k)
    if (bad.nonEmpty) {
      System.err.println(s"KMEANS INIT BENCH FAILED: wrong centroid counts " +
        bad.map(l => s"k=${l.k} pp=${l.ppRows} par=${l.parRows}").mkString("; "))
      sys.exit(1)
    }
    def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val legJson = legs.map(l =>
      s""""k${l.k}":{"pp_s":${f(l.ppS)},"par_s":${f(l.parS)},""" +
      s""""pp_err_micro":${l.ppErr},"par_err_micro":${l.parErr}}""")
      .mkString(",")
    println(s"""{"metric":"kmeans_init_split","value":${f(legs.last.parS)},""" +
      s""""unit":"sec",$legJson,"n_vectors":$n,"sf":"$sfDir"}""")
  }
}
