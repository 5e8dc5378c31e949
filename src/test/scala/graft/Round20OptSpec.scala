package graft

import org.apache.spark.sql.functions._

/** Round-20 optimization pins: the internals that changed for job-count
  * reasons must be bit-equal to the shapes they replaced.
  */
class Round20OptSpec extends SparkSpec {

  test("bpeTrain local fold == distributed loop on the same census") {
    import spark.implicits._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.sources.Tables.documents(spark, d)
      // public entry (census is driver-bounded here → local fold)
      val local = graft.ext.TextAnalysis.bpeTrain(docs, "text", 12)
        .as[(Int, String, String, String, Long)].collect().toSeq
      // the distributed loop the local fold replaced, on the same census
      val census = docs
        .select(explode(split(col("text"), " ", -1)).as("w"))
        .filter(length(col("w")) >= 1)
        .groupBy("w").agg(count(lit(1)).as("cnt"))
      val dist = graft.ext.TextAnalysis.bpeTrainDistributed(census, 12)
        .as[(Int, String, String, String, Long)].collect().toSeq
      assert(local == dist, s"$d: local/distributed BPE merge tables diverge" +
        s"\nlocal: ${local.take(15)}\ndist:  ${dist.take(15)}")
    }
  }

  test("WordGrams == the HOF transform/slice/array_join formulation") {
    import spark.implicits._
    // real corpus + the edge shapes the HOF guard handled (short docs,
    // exactly-8 tokens, empty text, repeated/empty tokens)
    val edge = Seq((900001L, "a b c d e f g h"), (900002L, "a b"),
      (900003L, ""), (900004L, "x x  x x x x x x x"),
      (900005L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = graft.sources.Tables.documents(spark, d)
        .select("doc_id", "text").unionByName(edge)
      val native = docs
        .select(col("doc_id"), posexplode(graft.functions.TextExpressions
          .wordGrams(col("text"), 8)).as(Seq("g0", "gram")))
        .select(col("doc_id"), (col("g0") + 1).as("i"), col("gram"))
        .as[(Long, Int, String)].collect().toSeq.sorted
      val hof = docs
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t)-7), i -> named_struct(" +
            "'i', i, 'gram', array_join(slice(t, i, 8), ' ')))")).as("sg"))
        .select(col("doc_id"), col("sg.i").as("i"), col("sg.gram").as("gram"))
        .as[(Long, Int, String)].collect().toSeq.sorted
      assert(native == hof,
        s"$d: WordGrams diverges from the HOF formulation " +
          s"(native ${native.size} rows, hof ${hof.size})")
    }
  }

  test("StagedIngest.stage: one file per epoch, content == per-epoch filters") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val rows = docs.filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_staged_ingest_spec").toString
    try {
      val schema = graft.util.StagedIngest.stage(spark, rows,
        expr("(doc_id % 15) div 5"), root)
      assert(schema.fieldNames.toSeq == Seq("doc_id", "text"),
        "partition column must not leak into the file schema")
      for (e <- 0 until 3) {
        val p = s"$root/in/e$e.parquet"
        assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
          s"missing staged epoch file $p")
        val got = spark.read.parquet(p)
          .as[(Long, String)].collect().toSet
        val want = rows.filter(col("doc_id") % 15 === e * 5)
          .as[(Long, String)].collect().toSet
        assert(got == want, s"epoch $e content diverges from the filter")
      }
    } finally graft.util.Dirs.rmTree(root)
  }
}
