package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark query over the test corpus and,
  * when SQL-expressible, its DuckDB oracle twin. Column names and row
  * ordering must agree exactly between the two (the driver sorts columns by
  * name and hashes values — see the builder contract in SparkEntry).
  */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Measurement/eval-class query (recall evals, geometry sweeps) rather
      * than a pipeline: Bench times it ONCE instead of median-of-REPS so
      * the driver-contract total reflects pipeline cost, not repeated
      * benchmarking of the benchmarks themselves (round-9 verdict #6).
      * Correctness handling (Verify/oracle) is identical either way.
      */
    evalOnly: Boolean = false,
    /** Comparator/demonstration query whose MEASUREMENT duty a dedicated
      * bench harness already owns (q242: the v1 full-rewrite loop that
      * CcStoreBench grades v2 against): Bench's default tier skips it —
      * its ~9 s idle cost measures superseded-comparator scaffolding,
      * not engine capability — and stamps the skip into the JSON
      * (`bench_skipped`). GRAFT_BENCH_FULL_DEMOS=1 restores it.
      * Verify/CORRECTNESS and the ScalaTest suites always run it
      * (r17 verdict #6).
      */
    benchSkip: Boolean = false)
