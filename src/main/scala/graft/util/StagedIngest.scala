package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Stage a demo ingest directory (`<root>/in/e0..e2.parquet`, one parquet
  * file per epoch so `maxFilesPerTrigger=1` delivers deterministic
  * micro-batches) in ONE pass over the source.
  *
  * The previous per-site shape ran THREE filtered `coalesce(1)` writes —
  * three full scans of the staged rows and three write jobs per bench rep
  * (guide §1.2: remove unnecessary passes before anything else). Here the
  * epoch id becomes a partition column: one scan, one shuffle keyed by
  * epoch (so each epoch's rows land in exactly one task → exactly one
  * file per epoch dir), one `partitionBy` write; the files are then moved
  * to the flat `in/e<K>.parquet` names the demos' readers expect. Epoch
  * file CONTENT is identical to the per-filter writes (same rows; the
  * epoch column never enters the file schema — partition columns are
  * directory-encoded), so batch boundaries and every downstream result
  * are unchanged.
  */
object StagedIngest {
  /** Writes the staged files and returns the ingest schema. `epochExpr`
    * must evaluate to 0..2 on every row of `rows`.
    */
  def stage(s: SparkSession, rows: DataFrame, epochExpr: Column,
      root: String): org.apache.spark.sql.types.StructType = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/in"))
    val scratch = s"$root/scratch"
    rows.withColumn("_stage_e", epochExpr.cast("int"))
      .repartition(col("_stage_e"))
      .write.mode("overwrite").partitionBy("_stage_e").parquet(scratch)
    for (e <- 0 until 3) {
      val dir = java.nio.file.Paths.get(s"$scratch/_stage_e=$e")
      require(java.nio.file.Files.isDirectory(dir),
        s"staged ingest epoch $e is empty under $scratch — the demo " +
          "fixture must deliver three non-empty micro-batches")
      scala.util.Using.resource(java.nio.file.Files.list(dir)) { w =>
        val part = w.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        java.nio.file.Files.move(part,
          java.nio.file.Paths.get(s"$root/in/e$e.parquet"))
      }
    }
    s.read.parquet(s"$root/in/e0.parquet").schema
  }
}
