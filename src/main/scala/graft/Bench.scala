package graft

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.core.{Caches, Sessions}

/** Benchmark harness (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR and emits ONE machine-readable JSON line.
  *
  * Methodology (round-1 + round-3 review):
  *  - queries run in sorted-name order (no hash-map nondeterminism in who
  *    pays first-use costs);
  *  - one warm-up pass (JIT + parquet footer cache + silver persist), then
  *    `iters` measured passes per query, min taken — measures the query,
  *    not machine noise;
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
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val load0 = loadAvg()
    val spark = Sessions.local(Sessions.defaultCpus, "graft-bench")

    // Optional comma-separated filter for single-query profiling runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Caches.releaseScratch(spark)
      dt
    }

    // Warm-up: one full pass (also populates the persisted silver frame the
    // way a long-running session / materialized table would).
    names.foreach { n =>
      try runOnce(n)
      catch { case e: Throwable => errors(n) = Option(e.getMessage).getOrElse(e.getClass.getName) }
    }

    val iterTimes = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val gcTimes = scala.collection.mutable.LinkedHashMap[String, Long]()
    val results: Seq[(String, Double)] = names.map { n =>
      if (errors.contains(n)) n -> -1.0
      else {
        try {
          val gc0 = gcMillis()
          val ts = (1 to iters).map(_ => runOnce(n))
          gcTimes(n) = gcMillis() - gc0
          iterTimes(n) = ts
          n -> ts.min
        } catch {
          case e: Throwable =>
            errors(n) = Option(e.getMessage).getOrElse(e.getClass.getName)
            n -> -1.0
        }
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    // Locale.ROOT: the f-interpolator uses the default locale, which on a
    // comma-decimal JVM would emit invalid JSON numbers.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) => jstr(k) + ":" + num(v) }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v.take(200)) }.mkString("{", ",", "}")
    val itersJson = iterTimes
      .map { case (k, ts) => jstr(k) + ":" + ts.map(num).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val gcJson = gcTimes.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val wallSec = (System.nanoTime() - wall0) / 1e9
    val line =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","iters":$iters,""" +
        s""""iter_sec":$itersJson,"gc_ms":$gcJson,"loadavg_start":${num(load0)},"loadavg_end":${num(loadAvg())},""" +
        s""""rss_mib":${num(peakRssMib())},"wall_sec":${num(wallSec)}}"""

    println(line)
    try Files.writeString(Paths.get("BENCH.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
    if (errors.nonEmpty) System.err.println(s"[bench] ${errors.size} queries failed: ${errors.keys.mkString(", ")}")
  }
}
