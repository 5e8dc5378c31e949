package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation. A straight `groupBy(hotKey)` puts every
  * row of a hot key in one task; salting fans each key over `buckets`
  * partial groups (map-side + salted partials), then merges the partials —
  * the standard skew pattern at 1000-executor scale, expressed once here
  * instead of per query.
  *
  * Results are identical to the unsalted aggregate for any algebraic
  * aggregate decomposed into (partial, merge) pairs below.
  */
object Salt {

  /** Row-position-derived salt: spreads a hot key uniformly regardless of
    * row CONTENT — content hashing would land byte-identical duplicate rows
    * (the classic skew shape) in one bucket, and fails outright on MapType
    * columns (unhashable since Spark 3.0, e.g. the variant reading map).
    * Salt values vary with partition layout, which is fine: every salted
    * operator here is salt-agnostic in its results.
    */
  private def rowSalt(buckets: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(buckets))

  private def requireSaltable(df: DataFrame, buckets: Int): Unit = {
    require(buckets >= 1, s"salting requires buckets >= 1, got $buckets")
    require(!df.columns.contains("__salt"),
      "input already has a __salt column; rename it before salting")
  }

  /** Salted sum/count/min/max aggregation: `aggs` maps output name ->
    * (partial aggregate over raw rows, merge aggregate over partials).
    */
  def saltedAgg(df: DataFrame, key: Column, buckets: Int,
                aggs: Seq[(String, Column, Column)]): DataFrame = {
    requireSaltable(df, buckets)
    val salted = df.withColumn("__salt", rowSalt(buckets))
    val partial = salted.groupBy(key.as("__k"), col("__salt"))
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
           aggs.tail.map(a => a._2.as(s"__p_${a._1}")): _*)
    val renamed = aggs.foldLeft(partial) { (d, a) =>
      d.withColumnRenamed(s"__p_${a._1}", a._1)
    }
    renamed.groupBy(col("__k"))
      .agg(aggs.head._3.as(aggs.head._1), aggs.tail.map(a => a._3.as(a._1)): _*)
  }

  /** Skew-safe equi-join: salt the (large, skewed) left side into `buckets`
    * sub-keys and replicate every right-side row across all buckets, so a
    * hot join key fans over `buckets` tasks instead of one straggler.
    * Row-identical to `left.join(right, leftKey === rightKey, "inner")`.
    *
    * This is the manual form of what AQE's skew-join split does at runtime;
    * it exists for the cases AQE can't see (first shuffle of a stage,
    * pre-AQE plan reuse) and as the deterministic-plan variant. Replication
    * multiplies the right side by `buckets` — use only when right ≪ left.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: Column, rightKey: Column, buckets: Int): DataFrame = {
    requireSaltable(left, buckets)
    requireSaltable(right, buckets)
    val saltedLeft = left.withColumn("__salt", rowSalt(buckets))
    val replicated = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedLeft.join(replicated,
        leftKey === rightKey && saltedLeft("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
