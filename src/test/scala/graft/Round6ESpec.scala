package graft

import org.apache.spark.sql.functions._

/** Golden tests for the multimodal dedup batch (q190/q191) on planted
  * duplicates — the corpus has few exact byte-dups at small SF, so the
  * semantics are pinned here.
  */
class Round6ESpec extends SparkSpec {
  import spark.implicits._

  test("payload dedup groups identical bytes and keeps the min id") {
    val docs = Seq(
      (1L, "same bytes"), (5L, "same bytes"), (3L, "same bytes"),
      (2L, "unique")
    ).toDF("doc_id", "text")
    val out = graft.ext.Multimodal.asMedia(docs).toDF()
      .select(col("media_id"), md5(col("payload")).as("m"))
      .groupBy("m")
      .agg(count(lit(1)).as("n"), min("media_id").as("keep"))
      .filter(col("n") > 1)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 3 && out.head.getLong(2) == 1L)
  }

  test("frame dedup finds the shared 64-byte block across media") {
    val block = "x" * 64
    val docs = Seq(
      (1L, block + "tail-one"),
      (2L, block + "different-tail"),
      (3L, "no shared prefix here at all")
    ).toDF("doc_id", "text")
    val out = graft.ext.Multimodal
      .frames(graft.ext.Multimodal.asMedia(docs), frameBytes = 64)
      .groupBy("frame_md5")
      .agg(countDistinct(col("media_id")).as("n_media"))
      .filter(col("n_media") >= 2)
      .collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L)
  }

  test("corpus is ASCII: byte semantics (engine) == char semantics (oracle)") {
    // q190/q191 operate on UTF-8 BYTES (octet_length, binary substr)
    // while their DuckDB oracles use CHARACTER functions (length,
    // substr) — equivalent only while every document is single-byte.
    // If the generator ever emits multibyte text, this fails loudly
    // instead of the oracle mysteriously hash-mismatching.
    val mixed = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .filter(octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(mixed == 0L,
      "non-ASCII documents found: q190/q191 oracles assume byte==char")
  }

  test("q191 on the corpus: every reported frame recurs in >= 2 media") {
    val rows = SparkEntry.queries("q191_frame_dedup")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= 2 && r.getLong(2) >= r.getLong(1)))
  }
}
