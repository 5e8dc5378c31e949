package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic aggregation helpers.
  *
  * A plain `sum(double)` depends on partial-aggregation order, so Spark and a
  * DuckDB oracle can disagree in the last ulp. Summing through a fixed-scale
  * decimal is order-independent and exact; casting the exact decimal back to
  * double yields the identical IEEE value on both engines. Every aggregated
  * double that the oracle compares goes through these helpers, with the oracle
  * SQL written as `CAST(SUM(CAST(x AS DECIMAL(25,10))) AS DOUBLE)`.
  *
  * Scale 6 is deliberate: the summed value as a scaled integer stays below
  * 2^53 for this corpus, so the final decimal→double cast is exact (a single
  * correctly-rounded operation) on both engines — at scale 10 DuckDB's
  * int128→double conversion is not correctly rounded and drifts by one ulp.
  *
  * At scale this costs one decimal widening per row inside the partial
  * aggregate — still whole-stage-codegen'd, no extra shuffle.
  */
object OracleSafe {
  // Engine cast semantics (measured): Spark double→decimal rounds the
  // SHORTEST decimal representation of the double; DuckDB rounds the EXACT
  // binary expansion. At scale 6 both round to the same value unless the
  // double sits essentially on a scale-6 midpoint — avoid feeding dsum
  // expressions whose values are "decimal-nice" midpoints (decompose such
  // scores into midpoint-free components instead; see q26). Do NOT widen the
  // scale and rescale: DuckDB's decimal→decimal rescale TRUNCATES while
  // Spark rounds, and DuckDB's int128→double cast is not correctly rounded.
  private val Dec = DecimalType(27, 6)

  /** Order-independent double sum: exact decimal accumulate, then one cast
    * (exact below 2^53 scaled units on both engines).
    */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Deterministic mean over all rows (COUNT(*) denominator). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** [[dsum]] WITHOUT the final double cast: keeps the exact decimal so the
    * caller can re-aggregate it (e.g. window sum-of-sums) and cast once at
    * the end — re-summing the cast doubles would be order-dependent again.
    */
  def dsumDec(c: Column): Column = sum(c.cast(Dec))

  /** Oracle-side SQL fragments mirroring the helpers above. */
  def sqlDsum(expr: String): String = s"CAST(SUM(CAST(($expr) AS DECIMAL(27,6))) AS DOUBLE)"
  def sqlDavg(expr: String): String = s"(${sqlDsum(expr)} / COUNT(*))"
}
