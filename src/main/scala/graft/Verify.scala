package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev loop: SPARK_GRAFT_ONLY=q120,q125 dumps a subset (shared rule:
    // graft.util.DevSubset); the driver never sets it, so the gate always
    // dumps everything. A stale var in a dev shell must never masquerade
    // as a full run: announce it loudly and drop a marker into outDir.
    if (graft.util.DevSubset.active) {
      val msg = s"DEV SUBSET ACTIVE (SPARK_GRAFT_ONLY=" +
        s"${sys.env.getOrElse("SPARK_GRAFT_ONLY", "")}) — PARTIAL DUMP, " +
        "NOT a full correctness run"
      System.err.println("=" * 72 + s"\n[verify] $msg\n" + "=" * 72)
      Files.writeString(Paths.get(s"$outDir/_DEV_SUBSET_PARTIAL"), msg)
    }
    SparkEntry.queries
      .filter { case (n, _) => graft.util.DevSubset.keep(n) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // drop cached plans and pinned checkpoint blocks between queries so a
      // 200-query dump's memory footprint stays flat (matters at sf1.0)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
