package graft

import org.apache.spark.sql.SparkSession

/** Standalone SERVING-reader leg for the v2 store's GC retention (r17
  * verdict #4): Round17Spec proved a pre-fold reader survives fold+GC at
  * `retainBases = 2` IN-PROCESS; production's story is a separate
  * serving JVM whose SparkSession shares nothing with the maintenance
  * driver but the disk. This main resolves the merge-on-read label view
  * — the generation dir listing AND the parquet file lists bind at
  * resolution time, so the plan holds the concrete snapshot — signals
  * readiness via a marker file, waits for the maintenance side to fold +
  * GC, then executes the read and writes the sorted rows out. Exit 0
  * with consistent rows = the retention policy protected the snapshot; a
  * FileNotFoundException mid-collect (the retention failure mode this
  * exists to catch) exits nonzero. Round18Spec stages the store, spawns
  * this, folds + GCs with `retainBases = 2` while this JVM holds its
  * snapshot, verifies the sweep really deleted the superseded
  * generation, and compares the rows against the pre-fold expectation.
  *
  * args: stateRoot readyFile goFile outFile
  */
object CcServeDriver {
  def main(args: Array[String]): Unit = {
    val Array(root, ready, go, out) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val view = graft.streaming.Streams.ccStoreLabels(spark, root)
    java.nio.file.Files.write(java.nio.file.Paths.get(ready),
      Array.emptyByteArray)
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!java.nio.file.Files.exists(java.nio.file.Paths.get(go))) {
      require(System.nanoTime() < deadline,
        "serving reader timed out waiting for the go marker")
      Thread.sleep(50)
    }
    val rows = view.collect().map(r => s"${r.getLong(0)},${r.getLong(1)}")
      .sorted
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      rows.mkString("\n").getBytes("UTF-8"))
    spark.stop()
  }
}
