package graft

import org.apache.spark.sql.functions._

/** Golden tests for the round-6 vector additions: product quantization
  * (q206) and hard-negative mining (q207).
  */
class Round6KSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("PQ codes pack 8 nibbles and reconstruct a positive error") {
    val rows = SparkEntry.queries("q206_product_quantization")(spark, dir)
      .collect()
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    assert(rows.length == n) // one code per vector, none dropped
    rows.foreach { r =>
      val code = r.getLong(1)
      assert(code >= 0L && code < (1L << 32), s"code $code outside 8 nibbles")
      assert(r.getLong(2) > 0L, "quantization error must be positive")
    }
  }

  test("PQ assignment is deterministic (content-addressed codebook)") {
    val a = SparkEntry.queries("q206_product_quantization")(spark, dir).collect()
    val b = SparkEntry.queries("q206_product_quantization")(spark, dir).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("hard negatives never share the anchor's label") {
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"))
    val out = SparkEntry.queries("q207_hard_negatives")(spark, dir)
    val joined = out
      .join(emb.toDF("vec_id", "qlabel"), col("qid") === col("vec_id")).drop("vec_id")
      .join(emb.toDF("vec_id", "nlabel"), col("nid") === col("vec_id")).drop("vec_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("qlabel") === col("nlabel")).count() == 0)
  }

  test("hard negatives rank by cosine with full tie-break, rn dense from 1") {
    import spark.implicits._
    val rows = SparkEntry.queries("q207_hard_negatives")(spark, dir)
      .select("qid", "rn", "nid", "cos").as[(Long, Int, Long, Double)].collect()
    rows.groupBy(_._1).values.foreach { g =>
      val s = g.sortBy(_._2)
      assert(s.map(_._2).toSeq == (1 to s.length).toSeq)
      assert(s.forall(r => r._4 >= -1.0d && r._4 <= 1.0d))
      assert(s.sliding(2).forall(p => p.length < 2 || p(0)._4 > p(1)._4 ||
        (p(0)._4 == p(1)._4 && p(0)._3 < p(1)._3)))
    }
  }
}
