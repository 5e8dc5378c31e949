package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** O10 — asset lineage tracking. The reference registers an
  * (asset, "Filter") tuple for every reading entering and leaving the stage
  * (`/root/reference/plugin.cpp:245-253, 325-333`). Natively that's an
  * `observe` node: metrics ride the existing job (no extra pass over the
  * data), delivered via QueryExecutionListener (batch) or
  * StreamingQueryListener (streams).
  */
object Lineage {

  /** Attach lineage metrics to a pipeline stage: row count + distinct assets
    * observed flowing through. Collect them with [[register]] or any
    * QueryExecutionListener reading `observedMetrics("graft_lineage_<stage>")`.
    */
  def observed(df: DataFrame, stage: String, assetCol: String): DataFrame =
    df.observe(s"graft_lineage_$stage",
      count(lit(1)).as("n_rows"),
      approx_count_distinct(col(assetCol)).as("n_assets"))

  /** Register a listener collecting lineage observations into `sink`
    * (stage -> (n_rows, n_assets)). Returns the listener for deregistration.
    */
  def register(spark: org.apache.spark.sql.SparkSession,
               sink: scala.collection.concurrent.Map[String, (Long, Long)])
      : org.apache.spark.sql.util.QueryExecutionListener = {
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.foreach {
          case (name, row: Row) if name.startsWith("graft_lineage_") =>
            sink.put(name.stripPrefix("graft_lineage_"),
              (row.getLong(0), row.getLong(1)))
          case _ =>
        }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    listener
  }
}
