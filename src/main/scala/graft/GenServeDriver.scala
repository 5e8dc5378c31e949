package graft

import org.apache.spark.sql.SparkSession

/** Standalone SERVING-reader leg for the GenStore seam itself (r18
  * verdict #5): CcServeDriver proved the v2 LABEL view survives a
  * concurrent fold + GC at `retainBases = 2` from a separate JVM;
  * q264's coreness view (latest-epoch-wins per id) and q263's census /
  * scored stores (plain union) serve through the same
  * `GenStore.latestWinsView` / `unionView` seam with the same exposure —
  * this main is the generic reader for any such store. It resolves the
  * requested view — the generation dir listing and the parquet file
  * lists bind at resolution time, so the plan holds the concrete
  * snapshot — signals readiness via a marker file, waits for the
  * maintenance side to fold + GC, then executes the read and writes the
  * sorted rows out. Exit 0 with consistent rows = the retention policy
  * protected the snapshot; a FileNotFoundException mid-collect (the
  * retention failure mode this exists to catch) exits nonzero.
  *
  * args: baseDir deltaDir mode(latest|union) idCol readyFile goFile
  *       outFile   (idCol is ignored for mode=union — pass "-")
  */
object GenServeDriver {
  def main(args: Array[String]): Unit = {
    val Array(baseDir, deltaDir, mode, idCol, ready, go, out) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = graft.util.GenStore(baseDir, deltaDir, "g=", "epoch=")
    val view = mode match {
      case "latest" => store.latestWinsView(spark, Long.MaxValue, idCol)
      case "union"  => store.unionView(spark)
      case other    => sys.error(s"unknown GenServeDriver mode: $other")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(ready),
      Array.emptyByteArray)
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!java.nio.file.Files.exists(java.nio.file.Paths.get(go))) {
      require(System.nanoTime() < deadline,
        "serving reader timed out waiting for the go marker")
      Thread.sleep(50)
    }
    val rows = view.collect().map(_.toSeq.mkString(",")).sorted
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      rows.mkString("\n").getBytes("UTF-8"))
    spark.stop()
  }
}
