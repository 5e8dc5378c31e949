package graft

import org.apache.spark.sql.functions._

/** q129's oracle-exactness rests on two corpus-dependent facts (ADVICE r4):
  * (1) vocabulary < maxItemsTracked=65536, so the approx_top_k sketch is
  * exact, and (2) distinct counts at the k=20 boundary, so the kept set is
  * the oracle's LIMIT 20 set. Neither is visible in the query text — if a
  * corpus/SF change breaks one, this fails loudly instead of surfacing as
  * a mysterious hash mismatch in the driver gate.
  */
class ApproxTopKGuardSpec extends SparkSpec {

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"q129 exactness preconditions hold at $sf") {
      val words = graft.sources.Tables
        .documents(spark, s"/root/testdata/$sf")
        .select(explode(split(col("text"), " ")).as("word"))

      val vocab = words.select(countDistinct("word")).head.getLong(0)
      assert(vocab < 65536,
        s"vocabulary $vocab >= sketch capacity 65536: q129 no longer exact")

      val boundary = words.groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(21).select("n").collect().map(_.getLong(0))
      assert(boundary.length > 20 && boundary(19) != boundary(20),
        s"count tie at the k=20 boundary (${boundary(19)}): " +
          "q129 kept set is no longer the oracle's LIMIT 20 set")
    }
  }
}
