package graft

import org.apache.spark.sql.functions._
import graft.functions.KMinHashAgg

/** Unit pins for the KMV k-smallest-distinct-hashes aggregate backing q50:
  * buffer semantics (dedupe, bound, ordering), merge associativity, and
  * end-to-end equivalence with the relational rank-≤-k formulation it
  * replaced.
  */
class KMinHashAggSpec extends SparkSpec {

  test("buffer keeps k smallest distinct values, ascending") {
    val b = new KMinHashAgg.Buffer(4)
    Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 9L, 0L).foreach(b.insert)
    assert(b.n == 4)
    assert(b.hs.take(4).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("buffer under capacity holds all distinct values") {
    val b = new KMinHashAgg.Buffer(10)
    Seq(5L, 5L, 2L, 2L, 8L).foreach(b.insert)
    assert(b.n == 3)
    assert(b.hs.take(3).toSeq == Seq(2L, 5L, 8L))
  }

  test("merge equals single-pass insert regardless of split") {
    val vals = (0 until 200).map(i => ((i * 2654435761L) % 1000))
    val whole = new KMinHashAgg.Buffer(16)
    vals.foreach(whole.insert)
    val (l, r) = vals.splitAt(73)
    val b1 = new KMinHashAgg.Buffer(16)
    val b2 = new KMinHashAgg.Buffer(16)
    l.foreach(b1.insert); r.foreach(b2.insert)
    b1.mergeFrom(b2)
    assert(b1.n == whole.n)
    assert(b1.hs.take(b1.n).toSeq == whole.hs.take(whole.n).toSeq)
  }

  test("aggregate matches the relational DISTINCT + rank-<=-k formulation") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq.tabulate(500)(i => (i % 3, (i * 48271L) % 211))
      .toDF("g", "h")
    val viaAgg = df.groupBy("g")
      .agg(KMinHashAgg.kminHashes(col("h"), 8).as("ks"))
      .select(col("g"), col("ks"))
      .as[(Int, Seq[Long])].collect().toMap
    val w = Window.partitionBy("g").orderBy("h")
    val viaRank = df.distinct()
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 8)
      .groupBy("g").agg(sort_array(collect_list("h")).as("ks"))
      .select(col("g"), col("ks"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(viaAgg == viaRank)
  }

  test("null hashes are skipped") {
    import spark.implicits._
    val df = Seq[(Int, Option[Long])]((1, Some(5L)), (1, None), (1, Some(2L)))
      .toDF("g", "h")
    val out = df.groupBy("g").agg(KMinHashAgg.kminHashes(col("h"), 4).as("ks"))
      .select("ks").as[Seq[Long]].head()
    assert(out == Seq(2L, 5L))
  }
}
