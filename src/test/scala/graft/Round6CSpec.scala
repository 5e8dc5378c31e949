package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden tests for the third round-6 batch (entity resolution, source
  * overlap, log-odds, weighted median, quantile normalization, RLE).
  */
class Round6CSpec extends SparkSpec {
  import spark.implicits._

  test("entity resolution blocks on (name, brand) and matches within ±1%") {
    val p = Seq(
      (1L, "red bolt", "B1", 100.00), // pair with 2 (0.5% apart)
      (2L, "red bolt", "B1", 100.50),
      (3L, "red bolt", "B1", 103.00), // >1% from both → no pair
      (4L, "red bolt", "B2", 100.00), // different brand → no pair
      (5L, "blue gear", "B1", 100.00) // different name → no pair
    ).toDF("pk", "name", "brand", "pr")
    val a = p.toDF("pk1", "name", "brand", "pr1")
    val b = p.toDF("pk2", "name2", "brand2", "pr2")
    val pairs = a.join(b, col("name") === col("name2")
        && col("brand") === col("brand2") && col("pk1") < col("pk2"))
      .filter(col("pr2") >= col("pr1") * lit(0.99d)
        && col("pr2") <= col("pr1") * lit(1.01d))
      .select("pk1", "pk2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("source overlap counts shared fingerprints once per source pair") {
    val docs = Seq(
      ("sA", "b a a"), ("sB", "a b"), // same sorted-distinct tokens {a b}
      ("sA", "c d e"), ("sC", "x y z")
    ).toDF("source", "text")
    val fp = docs.select(
        graft.ext.TextAnalysis.fingerprint(col("text")).as("f"),
        col("source")).distinct()
    val out = fp.toDF("f", "sa").join(fp.toDF("f2", "sb"),
        col("f") === col("f2") && col("sa") < col("sb"))
      .groupBy("sa", "sb").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("sA", "sB") -> 1L))
  }

  test("log-odds is antisymmetric and signs follow the dominant corpus") {
    val (ca, cb, na, nb) = (10d, 0d, 100d, 100d)
    val lo = math.log((ca + 0.5) / (na - ca + 0.5)) -
      math.log((cb + 0.5) / (nb - cb + 0.5))
    assert(lo > 0) // token only in corpus A → positive
    val even = math.log((5 + 0.5) / (100 - 5 + 0.5)) -
      math.log((5 + 0.5) / (100 - 5 + 0.5))
    assert(even == 0d)
  }

  test("weighted median crosses at the first price with 2·cumw ≥ total") {
    // prices 1,2,3 weights 1,1,10 → total 12, crossing at price 3
    val x = Seq((1L, 1L), (2L, 1L), (3L, 10L)).toDF("price_c", "w")
      .withColumn("flag", lit("A"))
    val byFlag = Window.partitionBy("flag")
    val med = x.select(col("flag"), col("price_c"),
        sum("w").over(byFlag.orderBy("price_c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cumw"),
        sum("w").over(byFlag).as("totw"))
      .groupBy("flag")
      .agg(min(when(lit(2) * col("cumw") >= col("totw"), col("price_c")))
        .as("m")).head().getLong(1)
    assert(med == 3L)
    // even split 1,1 → lower median 1
    val y = Seq((1L, 1L), (2L, 1L)).toDF("price_c", "w")
      .withColumn("flag", lit("A"))
    val med2 = y.select(col("flag"), col("price_c"),
        sum("w").over(byFlag.orderBy("price_c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cumw"),
        sum("w").over(byFlag).as("totw"))
      .groupBy("flag")
      .agg(min(when(lit(2) * col("cumw") >= col("totw"), col("price_c")))
        .as("m")).head().getLong(1)
    assert(med2 == 1L)
  }

  test("quantile normalization maps per-source ranks onto the global curve") {
    val out = SparkEntry.queries("q185_quantile_normalize")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    // the top-ranked doc of any source maps to the global maximum
    val globalMax = out.map(_.getLong(2)).max
    val bySource = out.groupBy(_.getString(1))
    bySource.values.foreach { rows =>
      assert(rows.map(_.getLong(3)).max == globalMax)
    }
    // normalized values are drawn from the observed global value set
    val observed = out.map(_.getLong(2)).toSet
    assert(out.forall(r => observed.contains(r.getLong(3))))
  }

  test("run-length encoding splits AABBBA into runs 2, 3, 1") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val e = Seq("A", "A", "B", "B", "B", "A").zipWithIndex.map {
      case (t, i) =>
        (7L, t, new java.sql.Timestamp(ts0.getTime + i * 1000L), i.toLong)
    }.toDF("user_id", "event_type", "ts", "event_id")
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val byUserType = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    val runs = e.select(col("user_id"), col("event_type"),
        (row_number().over(byUser) - row_number().over(byUserType))
          .as("grp"))
      .groupBy("user_id", "event_type", "grp")
      .agg(count(lit(1)).as("run_len"))
      .collect().map(r => (r.getString(1), r.getLong(3)))
    assert(runs.sorted.toSeq == Seq(("A", 1L), ("A", 2L), ("B", 3L)))
  }
}
