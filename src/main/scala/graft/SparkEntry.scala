package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every registered capability (SURVEY.md §2), grouped by domain. */
  def allDefs: Seq[QueryDef] =
    CoreQueries.defs ++ EventQueries.defs ++ TextQueries.defs ++
      VectorQueries.defs ++ StreamQueries.defs ++ AdvancedQueries.defs ++
      RelationalExtras.defs ++ PipelineQueries.defs ++ SourceQueries.defs ++
      ScaleOpsQueries.defs ++ TimeSeriesQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * E1+E4 reference semantics over the events stream: affine scale/offset,
    * asset allowlist, hourly tumbling aggregate (EventQueries.q18).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q18_scale_offset_hourly")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
