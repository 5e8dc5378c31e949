package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chain and separate pair collapse to min labels") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L)
    assert(labels(10L) == 10L && labels(11L) == 10L)
  }

  test("connectedComponents: 40-node chain converges (pointer jumping)") {
    // path graph 0-1-...-39: diameter 39 ≫ the 8 default rounds — covered
    // because each round also jumps label-of-label (doubling reach)
    val pairs = (0L until 39L).map(i => (i, i + 1)).toDF("i", "j")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(0L))
  }

  test("hash split is a pure function of the key: stable across recomputation") {
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
      .cast("long")
    val a = docs.select(col("doc_id"), (h % 10 < 8).as("train")).as[(Long, Boolean)].collect().toMap
    val b = docs.repartition(7).select(col("doc_id"), (h % 10 < 8).as("train"))
      .as[(Long, Boolean)].collect().toMap
    assert(a == b) // partition layout must not affect assignment
    val frac = a.values.count(identity).toDouble / a.size
    assert(frac > 0.6 && frac < 0.95) // ~80% expected
  }
}
