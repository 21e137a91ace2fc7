package graft
import org.apache.spark.sql.SparkSession

/** Headline bench over the full battery — with SELF-ADJUDICATION.
  *
  * Rounds 12 and 13 both shipped a driver-host-contaminated official
  * number (r13: 1,717 s total vs 296 s on the same binary at quiet
  * load): timings taken while 32 other threads compete for the cores
  * measure the HOST, not the engine, and the record could only be
  * adjudicated after the fact with hand-run A/Bs. This main now
  * adjudicates itself:
  *
  *  - `/proc/loadavg` (1-min) is sampled at battery start/end and at
  *    EVERY query start → the JSON carries per-query `load` so any
  *    outlier can be read against the contention that produced it;
  *  - after the battery, the worst outliers — observed/budget ratio
  *    more than 3× the run's MEDIAN ratio, budgets from the committed
  *    per-query profile `tools/latency_budget_sf0.001.tsv` (the median
  *    normalizes machine speed + scale factor away, exactly like the
  *    QueryBatterySpec gate) — are RE-RUN sequentially, nothing else
  *    in flight, and both numbers are emitted (`queries` and `rerun`):
  *    a clean re-run adjudicates the first number as contention, a
  *    dirty one as a real regression. Re-runs are capped at the 10
  *    worst so the battery's runtime stays bounded.
  */
object Bench {

  private def load1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+")(0).toDouble
    catch {
      case e: Throwable =>
        System.err.println(s"[bench] /proc/loadavg unreadable: $e")
        -1.0
    }

  /** Parse the per-query budget TSV. EXPLICIT UTF-8 (Files.readAllLines):
    * round 14 shipped this on the JVM default charset (US-ASCII here), a
    * header em-dash threw MalformedInputException inside a swallow-all
    * catch, and the rerun pass silently never fired. Failures are loud.
    */
  def parseBudgets(path: String): Map[String, Double] =
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
        .asScala // UTF-8 by default
        .filterNot(_.startsWith("#")).flatMap { l =>
          // >= 2 columns: the observed profile the budget is regenerated
          // from now carries a third (per-query load) column — dropping
          // 3-column lines here would silently kill the budgets again
          l.split("\t") match {
            case a if a.length >= 2 => Some(a(0) -> a(1).toDouble)
            case _ => None
          }
        }.toMap
    } catch {
      case e: Throwable =>
        System.err.println(
          s"[bench] FAILED to read $path: ${e.getClass.getName}: " +
            s"${e.getMessage} — outlier adjudication DISABLED this run")
        Map.empty
    }

  /** Pick the queries whose observed/budget ratio exceeds 3x the run's
    * MEDIAN ratio (median normalizes machine speed + SF away), worst
    * first, capped at 10 so the battery's runtime stays bounded. Pure —
    * spec-tested with a synthetic outlier so this pass can never again
    * ship dead.
    */
  def pickOutliers(results: Seq[(String, Double)],
                   budgets: Map[String, Double],
                   minSample: Int = 8): Seq[String] = {
    val ratios = results.flatMap { case (n, t) =>
      budgets.get(n).filter(_ > 0).map(b => (n, t / b))
    }
    if (ratios.size < minSample) Seq.empty // tiny filtered run: no signal
    else {
      val sortedR = ratios.map(_._2).sorted
      val median = sortedR(sortedR.size / 2)
      ratios.filter(_._2 > 3.0 * median).sortBy(-_._2).take(10).map(_._1)
    }
  }

  def main(args: Array[String]): Unit = {
    val wallT0 = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to the machine's cores, NOT a fixed 4: the harness contract is
    // local[32] / shuffle.partitions=32, and the per-round driver does not
    // set SPARK_GRAFT_CPUS. Rounds 1-15 therefore benched on local[4] — the
    // round-14 driver record shows g10_triangle_cc at 259 s vs ~2 s on the
    // same code at local[32], a >100x gap no host load explains, and the
    // round-15 driver run timed out (rc=124) under the same 4-core default.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadStart = load1()
    // session warmup: pay scheduler/codegen/scan-init once, outside the
    // per-query timings (first query otherwise absorbs ~4s of JVM init)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case e: Throwable => // tolerated (warmup), never silent:
        // a missing table here means every query on it fails below
        System.err.println(s"[bench] warmup scan of $t failed: $e") }
    }
    try graft.Tables.events(spark, sfDir).count()
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup scan of events failed: $e") }
    // optional comma-separated filter for profiling single queries locally
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(kv => f(kv._1)))
    // one untimed warmup execution per query (JMH-style): single-shot cold
    // timings are dominated by whole-stage-codegen compilation + JIT, which
    // amortize to zero at scale — steady-state throughput is the honest
    // engine number. Disable with SPARK_GRAFT_WARMUP=0.
    val warmups = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1").toInt
    // clean-slate between executions: queries that materialize a stage
    // boundary (localCheckpoint) leave storage blocks behind, and the
    // ContextCleaner only frees them on a driver GC — which a large heap
    // may never run. Left in place, each battery pass accumulates blocks
    // that squeeze execution memory and skew later queries' timings.
    val baseline = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def cleanSlate(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!baseline(id)) rdd.unpersist(blocking = true)
      }
    }
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      cleanSlate()
      val t0 = System.nanoTime()
      // a failed query still reports its elapsed time (the battery keeps
      // going — correctness is Verify's job) but NEVER silently: a quiet
      // catch here is how r14's budget bug shipped unnoticed
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          System.err.println(s"[bench] query FAILED: ${e.getClass.getName}: " +
            s"${String.valueOf(e.getMessage).take(160)}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // Wall-clock DEADLINE (seconds from process start, warmups included):
    // the per-round driver runs this main under a hard `timeout`; round 15
    // blew it (BENCH_r15.json rc:124, parsed:null) and the round has NO
    // bench record at all. A truncated-but-parsed record beats a dead one,
    // so once the deadline passes the remaining queries are SKIPPED (named
    // in the JSON — never silently) and the summary still prints with rc 0.
    val deadlineSec =
      sys.env.getOrElse("SPARK_GRAFT_DEADLINE_SEC", "2100").toDouble
    def elapsedSec(): Double = (System.nanoTime() - wallT0) / 1e9
    val skipped = scala.collection.mutable.ArrayBuffer[String]()
    val loads = scala.collection.mutable.LinkedHashMap[String, Double]()
    // partial-progress journal: one line per finished query, flushed as we
    // go, so even a hard kill leaves a machine-readable record of how far
    // the battery got and what each finished query cost.
    val progressPath = java.nio.file.Paths.get("bench_progress.jsonl")
    try java.nio.file.Files.deleteIfExists(progressPath)
    catch { case _: java.io.IOException => }
    def journal(name: String, sec: Double, load: Double): Unit =
      try java.nio.file.Files.write(progressPath,
        (s"""{"q":"$name","sec":$sec,"load":$load,"elapsed":${elapsedSec()}}""" + "\n")
          .getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      catch { case e: Throwable =>
        System.err.println(s"[bench] journal write failed: $e") }
    val results = selected.flatMap { case (name, fn) =>
      if (elapsedSec() > deadlineSec) { skipped += name; None }
      else {
        (0 until warmups).foreach { _ =>
          cleanSlate()
          // tolerated (untimed warmup; the TIMED pass reports the same
          // failure loudly) — but still visible, not silent
          try { fn(spark, sfDir).count() } catch { case e: Throwable =>
            System.err.println(
              s"[bench] warmup of $name failed: ${e.getClass.getName}") }
        }
        loads(name) = load1()
        val t = timeOnce(fn)
        journal(name, t, loads(name))
        Some(name -> t)
      }
    }
    if (skipped.nonEmpty)
      System.err.println(s"[bench] DEADLINE ${deadlineSec}s passed — " +
        s"skipped ${skipped.size} queries: ${skipped.take(20).mkString(",")}")
    val loadEnd = load1()
    // ---- outlier adjudication: re-run the worst budget violators ----
    // SPARK_GRAFT_MIN_SAMPLE lowers the small-run floor so a filtered
    // smoke run can PROVE the pass fires (see BenchAdjudicationSpec + the
    // recorded injection run in BENCH.md).
    val budgetPath =
      sys.env.getOrElse("SPARK_GRAFT_BUDGETS", "tools/latency_budget_sf0.001.tsv")
    val budgets = parseBudgets(budgetPath)
    if (budgets.isEmpty)
      System.err.println(
        s"[bench] budgets EMPTY ($budgetPath) — rerun pass cannot fire")
    val minSample =
      sys.env.getOrElse("SPARK_GRAFT_MIN_SAMPLE", "8").toInt
    // the rerun pass also respects the deadline — adjudication is worth
    // ~10 queries of runtime, never worth losing the whole record
    val outliers =
      if (elapsedSec() > deadlineSec) {
        System.err.println("[bench] deadline passed — rerun pass skipped")
        Seq.empty
      } else pickOutliers(results.toSeq, budgets, minSample)
    val rerun: Map[String, Double] =
      outliers.map { n => n -> timeOnce(selected(n)) }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val loadJs = loads.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val rerunJs = rerun.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val hostJs = s"""{"load_start":$loadStart,"load_end":$loadEnd,""" +
      s""""cpus":${Runtime.getRuntime.availableProcessors()}}"""
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // "budgets" is a visible marker (count or "unavailable") so an empty
    // rerun is machine-distinguishable from a dead adjudication pass.
    val budgetsJs =
      if (budgets.isEmpty) "\"unavailable\"" else budgets.size.toString
    val skippedJs = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""load":$loadJs,"rerun":$rerunJs,"budgets":$budgetsJs,""" +
        s""""skipped":$skippedJs,"host":$hostJs,"sf":"$sfDir"}"""
    println(full)
    // The harness that records per-round numbers keeps only the LAST ~2 KB
    // of stdout: at 300+ queries the full JSON line is ~10 KB, so its tail
    // is an unparseable fragment. Persist the full line to a file and end
    // with a COMPACT summary line (slowest queries only, rounded) that fits
    // any tail window — the last line of output is always valid JSON.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not persist bench_full.json: $e") }
    val slow = results.toSeq.sortBy(-_._2).take(12)
      .map { case (k, v) => s"\"" + k + "\":" + math.round(v * 1000) / 1000.0 }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","nqueries":${results.size},"nskipped":${skipped.size},"queries":$slow,"rerun":$rerunJs,"budgets":$budgetsJs,"host":$hostJs,"sf":"$sfDir","full":"bench_full.json"}""")
    spark.stop()
  }
}
