package graft

import org.apache.spark.sql.functions._
import graft.ops.{CoreOps, FilterConfig}

/** Golden tests from the reference's own docstring examples — the only
  * concrete I/O contracts it ships (SURVEY.md §5).
  */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  test("E1 scale/offset golden: scale=5 offset=10 maps 5->35, 10->60 (scale35.py:85-89)") {
    val df = Seq(("lab1", 5.0), ("lab2", 10.0)).toDF("asset_code", "power_set1")
    val out = df.transform(CoreOps.scaleOffset(Seq("power_set1"), 5, 10))
      .orderBy("asset_code").select("power_set1").as[Double].collect()
    assert(out.toSeq == Seq(35.0, 60.0))
  }

  test("E2 add-constant golden: +100 on every datapoint (readings35.py:59-68)") {
    val df = Seq(1.0, 2.5, -3.0).toDF("v")
    val out = df.transform(CoreOps.addConstant(Seq("v"), 100)).as[Double].collect().sorted
    assert(out.toSeq == Seq(97.0, 101.0, 102.5))
  }

  test("E3 config contract: JSON overrides + defaults (scale35.py:50-72,100-108)") {
    val c = FilterConfig.fromJson("""{"scale": 2, "offset": 5}""")
    assert(c.scale == 2.0 && c.offset == 5.0 && c.enable)
    val d = FilterConfig.fromJson("""{}""")
    assert(d.scale == 5.0 && d.offset == 10.0) // reference defaults
    val e = FilterConfig.fromJson("""{"enable": false, "asset_code": ["lab1", "lab2"]}""")
    assert(!e.enable && e.assetAllowlist.contains(Seq("lab1", "lab2")))
  }

  test("E4 asset allowlist keeps only listed assets (readings35.py:54-57)") {
    val df = Seq(("lab1", 1.0), ("lab2", 2.0), ("lab3", 3.0)).toDF("asset_code", "v")
    val out = df.transform(CoreOps.assetFilter("asset_code", Seq("lab1", "lab3")))
      .select("asset_code").as[String].collect().sorted
    assert(out.toSeq == Seq("lab1", "lab3"))
  }

  test("O3 disable gate forwards input unchanged (plugin.cpp:232-242)") {
    val df = Seq(1.0).toDF("v")
    val out = CoreOps.guarded(FilterConfig(enable = false), _ => fail("must not run"))(df)
    assert(out.as[Double].collect().toSeq == Seq(1.0))
  }

  test("O7 error passthrough: failing pipeline yields original batch (plugin.cpp:295-310)") {
    val df = Seq(1.0, 2.0).toDF("v")
    val out = CoreOps.guarded(FilterConfig(), _ => throw new RuntimeException("boom"))(df)
    assert(out.as[Double].collect().sorted.toSeq == Seq(1.0, 2.0))
  }

  test("affine composition law: scale(a2,b2)∘scale(a1,b1) = scale(a2*a1, a2*b1+b2)") {
    val xs = Seq(-7.5, 0.0, 1.0, 42.0)
    val df = xs.toDF("v")
    val composed = df.transform(CoreOps.scaleOffset(Seq("v"), 3, 4))
      .transform(CoreOps.scaleOffset(Seq("v"), 2, 5))
      .as[Double].collect().toSeq
    val fused = df.transform(CoreOps.scaleOffset(Seq("v"), 6, 13)).as[Double].collect().toSeq
    assert(composed == fused)
  }

  test("expression filter compiles config formula/predicate strings into the plan") {
    val df = Seq(("a", 10.0), ("b", 30.0)).toDF("asset_code", "v")
    val out = df.transform(CoreOps.exprDatapoint("d", "v * 2.0 + 1.0"))
      .transform(CoreOps.exprFilter("d > 22.0"))
      .select("asset_code", "d").collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSeq == Seq(("b", 61.0)))
  }

  test("asset rename maps listed codes, passes others; exclude drops denylisted") {
    val df = Seq(("view", 1.0), ("click", 2.0), ("error", 3.0)).toDF("asset_code", "v")
    val out = df.transform(CoreOps.assetRename("asset_code", Map("view" -> "pageview")))
      .transform(CoreOps.assetExclude("asset_code", Seq("error")))
      .select("asset_code").as[String].collect().sorted
    assert(out.toSeq == Seq("click", "pageview"))
  }

  test("O10 lineage: observe delivers in/out row + asset counts (plugin.cpp:245-253)") {
    import graft.ops.Lineage
    val sink = scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
    val listener = Lineage.register(spark, sink)
    try {
      val df = Seq(("lab1", 1.0), ("lab2", 2.0), ("lab1", 3.0)).toDF("asset_code", "v")
      val staged = Lineage.observed(df, "in", "asset_code")
        .transform(CoreOps.assetFilter("asset_code", Seq("lab1")))
      Lineage.observed(staged, "out", "asset_code").collect()
      // listener delivery is async; poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while ((!sink.contains("in") || !sink.contains("out")) && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(sink("in") == ((3L, 2L)))
      assert(sink("out") == ((2L, 1L)))
    } finally spark.listenerManager.unregister(listener)
  }
}
