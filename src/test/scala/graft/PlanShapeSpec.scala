package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan shape assertions: the scale claims in the query docs
  * (broadcasts happen, bucketing removes exchanges, filters reach the scan)
  * are checked here, not just asserted in comments.
  *
  * Assertions run on the AQE-settled plan rendered as text — query-stage
  * wrappers don't expose their subtrees through `children`, so string
  * matching on the final plan is the robust way to see the whole tree.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def finalPlanString(df: DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
  }

  test("bucketed join: SMJ over bucketed scans, no shuffle on either input") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.queries.SourceQueries.bucketedJoin(spark, dir)
      val plan = finalPlanString(df)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
      // the one hash exchange belongs to the groupBy after the join; the
      // join inputs themselves read pre-bucketed (no exchange below the SMJ)
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(hashExchanges <= 1, s"join inputs re-shuffled:\n$plan")
    } finally {
      graft.queries.SourceQueries.dropBucketedTables(spark)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("star join broadcasts the dimension tables (no dimension shuffle)") {
    val df = graft.queries.CoreQueries.defs
      .find(_.name == "q06_star_join_region_revenue").get.fn(spark, dir)
    val plan = finalPlanString(df)
    assert(plan.contains("BroadcastHashJoin"), s"dimension joins should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no SMJ expected in the star join:\n$plan")
  }

  test("as-of join is a single keyed shuffle (union-merge, no range explosion)") {
    val df = graft.queries.EventQueries.defs
      .find(_.name == "q22_asof_join_last_order").get.fn(spark, dir)
    val plan = finalPlanString(df)
    // one hash exchange for the union-merge window; the trailing orderBy
    // adds a range exchange — anything more means the as-of degenerated
    // into a join + per-key re-shuffles
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1, s"as-of join should shuffle once:\n$plan")
  }

  test("filter + projection reach the parquet scan (pushdown/pruning)") {
    val df = graft.queries.CoreQueries.defs
      .find(_.name == "q02_filter_project").get.fn(spark, dir)
    val scans = df.queryExecution.executedPlan.collectLeaves()
    val scanStr = scans.mkString("\n")
    assert(scanStr.contains("PushedFilters: [") && !scanStr.contains("PushedFilters: []"),
      s"expected pushed filters in scan:\n$scanStr")
  }
}
