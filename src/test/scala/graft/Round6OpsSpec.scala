package graft

import java.sql.Date

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden tests for the round-6 batch (market basket, RFM, point-in-time
  * SCD2, streaks, snapshot diff, referential integrity, Gini, skew
  * profile, span dedup, KL drift, centroid distances) on hand-checked
  * inputs.
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("market-basket lift is cooccurrence over independence") {
    // 4 baskets: {A,B} {A,B} {A,C} {B}; n=4, c(A)=3, c(B)=3, c(AB)=2
    val b = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B")).toDF("ok", "pk")
    val pairs = b.toDF("ok", "p1").join(b.toDF("ok2", "p2"),
        col("ok") === col("ok2") && col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs(("A", "B")) == 2 && pairs(("A", "C")) == 1)
    // lift(A,B) = 2*4 / (3*3)
    assert(math.abs(2d * 4 / (3 * 3) - 0.888888) < 1e-5)
  }

  test("gaps-and-islands streak splits on the missing day") {
    // days 1,2,3, skip 4, then 5,6 → longest streak 3, active 5
    val d = Seq("2024-01-01", "2024-01-02", "2024-01-03",
        "2024-01-05", "2024-01-06")
      .map(s => (7L, Date.valueOf(s))).toDF("user_id", "d")
    val w = Window.partitionBy("user_id").orderBy("d")
    val out = d.withColumn("grp", date_sub(col("d"), row_number().over(w)))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max("len").as("ls"), sum("len").as("ad")).head()
    assert(out.getLong(1) == 3 && out.getLong(2) == 5)
  }

  test("snapshot diff classifies added/removed/changed/same") {
    val a = Seq((1L, 10d), (2L, 20d), (3L, 30d)).toDF("k", "pa")
    val b = Seq((2L, 20d), (3L, 35d), (4L, 40d)).toDF("k2", "pb")
    val cls = a.join(b, col("k") === col("k2"), "full_outer")
      .select(when(col("k").isNull, "added")
        .when(col("k2").isNull, "removed")
        .when(col("pa") =!= col("pb"), "changed")
        .otherwise("same").as("c"))
      .groupBy("c").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cls == Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "same" -> 1L))
  }

  test("Gini is 0 for equal spend and (n-1)/n for a single holder") {
    def gini(cents: Seq[Long]): Double = {
      val df = cents.zipWithIndex.map { case (c, k) => (k.toLong, c) }
        .toDF("custkey", "cents")
      val w = Window.orderBy(col("cents").asc, col("custkey").asc)
      val r = df.withColumn("i", row_number().over(w))
        .agg(count(lit(1)).as("n"), sum("cents").as("b"),
          sum(col("i") * col("cents")).as("a")).head()
      val (n, b, a) = (r.getLong(0), r.getLong(1), r.getLong(2))
      (2d * a - (n + 1d) * b) / (n.toDouble * b)
    }
    assert(gini(Seq(100L, 100L, 100L, 100L)) == 0d)
    assert(math.abs(gini(Seq(0L, 0L, 0L, 1000L)) - 0.75) < 1e-12)
  }

  test("span dedup flags only the shared 8-token window") {
    val docs = Seq(
      (1L, "a b c d e f g h unique1 tail1"),
      (2L, "x a b c d e f g h tail2"),
      (3L, "totally different words here no match at all")
    ).toDF("doc_id", "text")
    val g = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(t)-7)," +
          " i -> array_join(slice(t, i, 8), ' '))")).as("gram"))
    val dup = g.groupBy("gram").agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("gram"), lit(1).as("is_dup"))
    val out = g.join(dup, Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ng"),
        sum(coalesce(col("is_dup"), lit(0))).as("nd"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc1: grams at offsets 1..3; only "a b c d e f g h" is shared
    assert(out(1L) == (3L, 1L) && out(2L) == (3L, 1L) && out(3L)._2 == 0L)
  }

  test("skew profile picks exact quantile positions") {
    // counts 1..10: p50 at rn=5 → 5, p90 at rn=9 → 9, max=10, total=55
    val c = (1 to 10).map(i => (i.toLong, i.toLong)).toDF("key", "cnt")
    val ranked = c.select(col("cnt"),
      row_number().over(Window.orderBy(col("cnt").asc, col("key").asc)).as("rn"),
      count(lit(1)).over(Window.partitionBy()).as("nk"))
    val r = ranked.agg(
      max(when(col("rn") === ceil(col("nk") * 0.5).cast("long"),
        col("cnt"))).as("p50"),
      max(when(col("rn") === ceil(col("nk") * 0.9).cast("long"),
        col("cnt"))).as("p90"),
      sum("cnt").as("tot"), max("cnt").as("mx")).head()
    assert(r.getLong(0) == 5 && r.getLong(1) == 9)
    assert(r.getLong(2) == 55 && r.getLong(3) == 10)
  }

  test("point-in-time SCD2 splits a changed key's history at the cutoff") {
    val out = SparkEntry.queries("q165_scd2_point_in_time")(
      spark, "/root/testdata/sf0.001")
    // PROMO revenue exists, and only in years >= 1998
    val promoYears = out.filter(col("segment") === "PROMO")
      .select("yr").collect().map(_.getInt(0))
    assert(promoYears.nonEmpty && promoYears.forall(_ >= 1998))
    // non-PROMO segments cover pre-cutoff years too
    val otherYears = out.filter(col("segment") =!= "PROMO")
      .select("yr").collect().map(_.getInt(0))
    assert(otherYears.exists(_ < 1998))
  }

  test("KL divergence vanishes when every source matches the corpus mix") {
    val docs = Seq(("s1", "a b"), ("s2", "a b")).toDF("source", "text")
    val c = docs.select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("n"))
    val m = c.select(col("source"), col("n"),
      sum("n").over(Window.partitionBy("source")).as("n_src"),
      sum("n").over(Window.partitionBy("tok")).as("n_tok"),
      sum("n").over(Window.partitionBy()).as("n_tot"))
    val kl = m.groupBy("source")
      .agg(sum((col("n").cast("double") / col("n_src"))
        * log((col("n").cast("double") / col("n_src"))
          / (col("n_tok").cast("double") / col("n_tot")))).as("kl"))
      .collect().map(_.getDouble(1))
    assert(kl.forall(_ == 0d))
  }

  test("centroid distance matrix recovers the planted gap") {
    // label 0 vectors ≈ (0,0), label 1 vectors ≈ (3,4) → d2 = 25
    val e = Seq((1L, Seq(0f, 0f), 0), (2L, Seq(0f, 0f), 0),
      (3L, Seq(3f, 4f), 1), (4L, Seq(3f, 4f), 1))
      .toDF("vec_id", "embedding", "label")
    val cent = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("v").cast("double") * 1000000d + 0.5d).cast("long")).as("sm"))
      .select(col("label"), col("pos"),
        (col("sm").cast("double") / (col("n").cast("double") * 1000000d)).as("mean"))
    val a = cent.toDF("la", "pa", "ma")
    val b = cent.toDF("lb", "pb", "mb")
    val d2 = a.join(b, col("pa") === col("pb") && col("la") < col("lb"))
      .groupBy("la", "lb")
      .agg(sum((col("ma") - col("mb")) * (col("ma") - col("mb"))).as("d2"))
      .head().getDouble(2)
    assert(d2 == 25d)
  }

  test("referential-integrity audit sees zero orphans on intact edges " +
      "and nonzero on the restricted catalog") {
    val out = SparkEntry.queries("q168_referential_integrity")(
      spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("lineitem_orders")._2 == 0L)
    assert(out("orders_customer")._2 == 0L)
    assert(out("lineitem_active_part")._2 > 0L)
  }

  test("RFM quintiles are balanced within a uniform segment") {
    // 10 customers, distinct rec/freq/mon → each ntile(5) bucket holds 2
    val seg = (1 to 10).map(i => ("S", i.toLong, i, i.toLong, i * 100L))
      .toDF("segment", "custkey", "rec", "freq", "mon")
    val bySeg = Window.partitionBy("segment")
    val counts = seg.select(
        ntile(5).over(bySeg.orderBy(col("rec").asc, col("custkey").asc)).as("r"))
      .groupBy("r").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(1 -> 2L, 2 -> 2L, 3 -> 2L, 4 -> 2L, 5 -> 2L))
  }
}
