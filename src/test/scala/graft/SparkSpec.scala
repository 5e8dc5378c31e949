package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session: one per suite (lazy), UTC, small shuffle width. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Data files a plan's scans actually read (collect to settle AQE +
    * populate metrics, unwrap AdaptiveSparkPlanExec, sum the leaves'
    * numFiles) — the partition-pruning assertion shared by the q244 /
    * q254 / edge-bucket / pair-bucket specs (one implementation, r18
    * review: a Spark plan-shape change must be fixed in ONE place).
    */
  def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
        .AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, s"no FileSourceScan in:\n$plan")
    scans.map(_.metrics("numFiles").value).sum
  }
}
