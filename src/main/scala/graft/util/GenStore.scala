package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The generational on-disk store seam — ONE implementation of the layout
  * and crash semantics that three stores previously each carried a copy
  * of (r16 verdict #2): the vector index store
  * ([[graft.ext.Similarity.indexStoreView]]), the v1 CC maintenance
  * generations, and the v2 CC store ([[graft.streaming.Streams]]).
  *
  * Layout:
  *   `<baseDir>/<basePrefix><g>`   — base generations (_SUCCESS-gated)
  *   `<deltaDir>/<deltaPrefix><e>` — per-epoch delta dirs (_SUCCESS-gated,
  *                                   idempotent overwrites keyed by epoch)
  *
  * Crash semantics, once, for every store built on this seam:
  *   - Readers key on the LARGEST _SUCCESS-marked base below their bound;
  *     a torn base write (crash between dir creation and commit) is
  *     invisible — the reader falls back to the previous complete base,
  *     exactly what it read before the fold started.
  *   - Delta epochs are _SUCCESS-gated the same way: a crashed delta
  *     write leaves a partial epoch dir that no view serves; the
  *     restarted stream re-delivers that epoch and its idempotent
  *     overwrite re-marks it, at which point it re-enters the view
  *     complete.
  *   - A fold at epoch E may cover epochs <= E−1 ONLY (the fold-lag
  *     rule): under the in-order single-stream file-source contract every
  *     epoch < E is checkpoint-committed before E runs, so nothing at or
  *     below the fold point can ever re-deliver — a re-delivered E reads
  *     the folded base, which is content-identical to the pre-fold view
  *     it read on the first attempt.
  *   - [[gc]] deletes exactly what left every retained read path:
  *     superseded bases, _SUCCESS-less base stubs (crash leftovers — no
  *     fold is in flight under the run-from-the-step contract), and
  *     deltas at or below the OLDEST retained base. `retainBases` > 1
  *     keeps that many complete bases so a standalone serving reader that
  *     resolved a view just before a fold+GC sweep still holds a stable
  *     snapshot (r16 verdict #4); `retainBases = 1` reproduces the
  *     original keep-only-current layout exactly.
  */
final case class GenStore(baseDir: String, deltaDir: String,
    basePrefix: String = "g=", deltaPrefix: String = "epoch=") {

  /** The delta partition column name the parquet scan sees. */
  val deltaCol: String = deltaPrefix.stripSuffix("=")

  def basePath(g: Long): String = s"$baseDir/$basePrefix$g"
  def deltaPath(e: Long): String = s"$deltaDir/$deltaPrefix$e"

  private def listDirs(dir: String, prefix: String,
      requireSuccess: Boolean): Seq[Long] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) Seq.empty
    else scala.util.Using.resource(java.nio.file.Files.list(p)) { w =>
      import scala.jdk.CollectionConverters._
      w.iterator().asScala
        .filter(d => !requireSuccess || java.nio.file.Files
          .exists(d.resolve("_SUCCESS")))
        .flatMap(_.getFileName.toString.stripPrefix(prefix).toLongOption)
        .toSeq
    }
  }

  def listBases(requireSuccess: Boolean): Seq[Long] =
    listDirs(baseDir, basePrefix, requireSuccess)
  def listDeltas(requireSuccess: Boolean): Seq[Long] =
    listDirs(deltaDir, deltaPrefix, requireSuccess)

  /** Largest COMPLETE (_SUCCESS-marked) base generation strictly below
    * `bound` (driver-side dir listing — generation counts are
    * fold-cadence-bounded, never corpus-sized). Fails loudly when the
    * store was never initialized.
    */
  def latestCompleteBase(bound: Long = Long.MaxValue): Long = {
    val gens = listBases(requireSuccess = true).filter(_ < bound)
    require(gens.nonEmpty, s"no complete base generation below $bound " +
      s"under $baseDir — write the initial base before reading the store")
    gens.max
  }

  /** Complete (_SUCCESS-marked) delta epochs in (lo, hi), sorted. */
  def completeDeltaEpochs(lo: Long, hi: Long = Long.MaxValue): Seq[Long] =
    listDeltas(requireSuccess = true).filter(e => e > lo && e < hi).sorted

  /** The store's contents visible to epoch `bound` for APPEND-ONLY
    * content: latest complete base ∪ complete delta epochs past its fold
    * point, delta scan partition-pruned to the live epoch set at the
    * source. Stores whose merge is not a plain union (e.g. latest-wins
    * label reconciliation) compose [[latestCompleteBase]] /
    * [[completeDeltaEpochs]] themselves.
    */
  def unionView(s: SparkSession, bound: Long = Long.MaxValue): DataFrame = {
    val g = latestCompleteBase(bound)
    val base = s.read.parquet(basePath(g))
    val live = completeDeltaEpochs(g, bound)
    if (live.isEmpty) base
    else base.unionByName(s.read.parquet(deltaDir)
      .filter(col(deltaCol).isin(live: _*)).drop(deltaCol))
  }

  /** The store's contents visible to epoch `bound` for LATEST-WINS
    * content keyed by `idCol`: latest complete base ∪ live deltas
    * reconciled to each id's row from the LARGEST epoch that touched it
    * — provably the sequential apply-updates fold (each apply =
    * anti-join ∪ union; see [[graft.streaming.Streams.ccStoreLabelsView]],
    * whose merge this generalizes — one implementation, r18 review).
    * `hintProbe` decorates the delta id set before the base anti-join
    * (e.g. a count-guarded broadcast); default no hint.
    */
  def latestWinsView(s: SparkSession, bound: Long, idCol: String,
      hintProbe: DataFrame => DataFrame = identity): DataFrame = {
    import org.apache.spark.sql.functions.row_number
    val g = latestCompleteBase(bound)
    val base = s.read.parquet(basePath(g))
    val live = completeDeltaEpochs(g, bound)
    if (live.isEmpty) base
    else {
      val latest = s.read.parquet(deltaDir)
        .filter(col(deltaCol).isin(live: _*))
        .withColumn("rn", row_number().over(org.apache.spark.sql
          .expressions.Window.partitionBy(idCol)
          .orderBy(col(deltaCol).desc)))
        .filter(col("rn") === 1).drop("rn", deltaCol)
      base.join(hintProbe(latest.select(idCol)), Seq(idCol), "left_anti")
        .unionByName(latest)
    }
  }

  /** Data-file count of the CURRENT view (not the whole root — folded
    * deltas and superseded bases are out of the read path and must not
    * retrigger compaction). Driver-side walk; generation counts are
    * policy-bounded.
    */
  def viewFileCount: Long = {
    val g = latestCompleteBase()
    def files(dir: String): Long = {
      val p = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(p)) 0L
      else scala.util.Using.resource(java.nio.file.Files.walk(p)) { w =>
        w.filter(_.getFileName.toString.endsWith(".parquet")).count()
      }
    }
    files(basePath(g)) +
      completeDeltaEpochs(g).map(e => files(deltaPath(e))).sum
  }

  // ---- delta row-count sidecars ----
  // A `_rows` file inside a delta dir (underscore-prefixed — invisible to
  // the parquet reader, like _SUCCESS) records the delta's row count so
  // view/fold policies can reason about VOLUME without a Spark job: an
  // epoch-count bound says nothing about a merge-storm epoch whose single
  // delta is component-sized (r16 verdict #1). Written AFTER the parquet
  // commit; a crash in between leaves a complete delta without a sidecar,
  // which [[deltaRows]] heals by counting once (footer-cheap).

  def writeDeltaRowsSidecar(e: Long, rows: Long): Unit = {
    java.nio.file.Files.write(
      java.nio.file.Paths.get(deltaPath(e), "_rows"),
      rows.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }

  /** Row count of delta epoch `e`: the sidecar when present, else one
    * metadata-cheap count (pre-sidecar layouts, torn sidecar writes).
    */
  def deltaRows(s: SparkSession, e: Long): Long = {
    val p = java.nio.file.Paths.get(deltaPath(e), "_rows")
    val fromSidecar =
      if (!java.nio.file.Files.exists(p)) None
      else new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLongOption
    fromSidecar.getOrElse(s.read.parquet(deltaPath(e)).count())
  }

  // ---- GC ----

  private def rmTree(dir: String): Unit = Dirs.rmTree(dir)

  /** Delete what left every RETAINED read path: bases older than the
    * newest `retainBases` complete ones, _SUCCESS-less base stubs, and
    * deltas at or below the oldest retained base (a reader holding base b
    * needs only deltas > b). Returns directories removed.
    */
  def gc(retainBases: Int = 1): Int = {
    require(retainBases >= 1, s"retainBases must be >= 1 (got $retainBases)")
    val complete = listBases(requireSuccess = true)
    require(complete.nonEmpty, s"no complete base under $baseDir — " +
      "nothing to retain; initialize the store before GC")
    val oldestKept = complete.sorted.takeRight(retainBases).min
    val completeSet = complete.toSet
    var removed = 0
    listBases(requireSuccess = false)
      .filter(e => e < oldestKept || !completeSet(e)).foreach { e =>
        rmTree(basePath(e)); removed += 1
      }
    listDeltas(requireSuccess = false).filter(_ <= oldestKept).foreach { e =>
      rmTree(deltaPath(e)); removed += 1
    }
    removed
  }
}
