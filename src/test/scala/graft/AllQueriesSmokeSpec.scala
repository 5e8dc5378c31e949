package graft

/** Executes every registered query at the smallest scale factor: shapes the
  * oracle gate never sees (empty filter results, single-row groups, empty
  * grids) must still run — an operator that works at sf0.01 but throws on
  * degenerate inputs is a latent production bug.
  */
class AllQueriesSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  SparkEntry.allDefs.foreach { d =>
    test(s"${d.name} executes at sf0.001") {
      val n = d.fn(spark, dir).count()
      assert(n >= 0)
    }
  }
}
