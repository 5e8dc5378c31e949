package graft

/** Round-6 closing batch: q117's cross-engine determinism contract.
  *
  * Measured at a 10× documents corpus (50k docs): `round(exact_sum/count, 6)`
  * landed 4 docs on true decimal midpoints (2·sum ≡ n mod 2·n) where Spark and
  * DuckDB round the identical double differently. q117 therefore rounds the
  * mean in integer micro-unit arithmetic; these tests pin that contract.
  */
class Round6JSpec extends SparkSpec {

  test("q117 avg_logprob is an exact micro-unit value (integer-rounded mean)") {
    val rows = SparkEntry.queries("q117_bigram_logprob")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val v = r.getDouble(2)
      assert(n >= 1L)
      assert(v < 0.0, s"log-prob mean must be negative, got $v")
      val micro = v * 1e6
      assert(math.abs(micro - math.round(micro)) < 1e-3,
        s"avg_logprob $v is not an integer count of 1e-6 units")
    }
  }

  test("integer mean-rounding identity rounds true midpoints away from zero") {
    // p = magnitude of the micro-unit sum, n = count; the q117 formula
    // -floor((2p + n) / (2.0 n)) must take -7/2 -> -4 (half away), -5/2 -> -3.
    def meanMicro(s: Long, n: Long): Long =
      -math.floor((-2.0 * s + n) / (2.0 * n)).toLong
    assert(meanMicro(-7L, 2L) == -4L)
    assert(meanMicro(-5L, 2L) == -3L)
    assert(meanMicro(-6L, 2L) == -3L)   // exact value untouched
    assert(meanMicro(-9L, 3L) == -3L)
    assert(meanMicro(-10L, 4L) == -3L)  // -2.5 -> -3, away from zero
  }
}
