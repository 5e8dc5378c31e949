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

  /** [[dsum]] for sums whose scaled magnitude can exceed 2^53: emit the
    * exact total as INT64 MICRO-UNITS (the q195 cents×micros discipline)
    * instead of casting the decimal to double. Above 2^53 scaled units
    * the decimal→double cast stops being exact and DuckDB's int128→double
    * conversion is not correctly rounded — MEASURED on the 10× stress
    * corpus: q01's sum_charge (~2.8e10, 17 significant digits) diverged
    * by one ulp. The decimal accumulate is unchanged (term rounding
    * semantics stay identical to [[dsum]]); only the output moves to the
    * integer domain, exact up to ±9.2e12 in unit terms. Corpus-wide money
    * totals are exactly the sums that cross 2^53 first; per-group and
    * windowed sums that provably stay below it keep the double cast.
    */
  def dsumMicro(c: Column): Column =
    (sum(c.cast(Dec)) * lit(1000000L)).cast("long")

  /** Oracle-side SQL fragments mirroring the helpers above. */
  def sqlDsum(expr: String): String = s"CAST(SUM(CAST(($expr) AS DECIMAL(27,6))) AS DOUBLE)"
  def sqlDavg(expr: String): String = s"(${sqlDsum(expr)} / COUNT(*))"
  def sqlDsumMicro(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(27,6))) * 1000000 AS BIGINT)"
}
