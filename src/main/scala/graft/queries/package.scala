package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One driver-checkable query: Spark implementation + optional DuckDB
    * oracle SQL (same column names — the driver hash-compares after
    * sorting columns by name). `None` → rows-only check. */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def qNoOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** DuckDB expression replicating Spark's round(double, k) EXACTLY:
    * Spark rounds the shortest decimal string (BigDecimal HALF_UP), DuckDB
    * rounds the binary value — they disagree when the true value
    * terminates at k+1 decimals ending in 5. Routing the oracle through
    * VARCHAR→DECIMAL makes both engines round the same decimal number. */
  def rnd(e: String, k: Int): String =
    s"CAST(round(CAST(CAST(($e) AS VARCHAR) AS DECIMAL(38,18)), $k) AS DOUBLE)"

  /** FIXED per-query scratch dir under java.io.tmpdir, wiped at the start
    * of every execution: repeated battery/bench runs (each query runs
    * warmup + timed, every round re-runs the battery) reuse one path
    * instead of accumulating uniquely-named temp dirs — the disk-growth
    * pattern c9 was called out for in round 4. Streaming checkpoints under
    * the returned path are safe because the wipe precedes every run, so no
    * stale offset/state recovery can leak across executions. The dir is
    * NOT created: every consumer writes through Spark writers (which
    * mkdirs) or creates the subdirs it needs. */
  def freshScratch(tag: String): String = {
    val p = new java.io.File(sys.props("java.io.tmpdir"), s"graft_$tag")
    if (p.exists()) org.apache.commons.io.FileUtils.deleteDirectory(p)
    p.toString
  }

  /** Memory-sink name for a streaming replay. The suffix stays unique (a
    * crashed earlier run can leave an ACTIVE query holding the name, and
    * queryName collisions with a live query are an error), but any
    * finished sink from a PREVIOUS execution of the same query is dropped
    * first — each memory sink pins its full output in driver memory plus
    * a temp-view catalog entry, the same per-run accumulation pattern
    * `freshScratch` kills on disk. Safe under the battery's sequential
    * discipline: a query's previous result is fully consumed before the
    * query runs again. */
  def memorySinkName(s: SparkSession, prefix: String): String = {
    s.catalog.listTables().collect()
      .filter(t => t.isTemporary && t.name.startsWith(prefix))
      .foreach(t => s.catalog.dropTempView(t.name))
    // & Int.MaxValue, not math.abs: abs(Int.MinValue) is Int.MinValue,
    // which would put a '-' in the table identifier
    prefix + (java.util.UUID.randomUUID().hashCode() & Int.MaxValue)
  }

  /** `documents.doc_id` spread over defaultParallelism partitions. The sf
    * parquet inputs are single unsplittable row groups — one task per scan
    * — so per-row codec work (PNG/WAV encode+decode, pixel loops) placed
    * directly downstream of the scan runs SERIAL however many cores the
    * session has (measured: m10 3.1 s → 1.1 s at local[32] with this).
    * Repartition first (guide §2.5, input skew: "one huge unsplittable
    * file … repartition immediately after the read"); hash on doc_id keeps
    * the row→partition map deterministic under task retries. */
  def docIds(s: SparkSession, d: String): org.apache.spark.sql.Dataset[Long] = {
    import s.implicits._
    graft.Tables.documents(s, d)
      .select(org.apache.spark.sql.functions.col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism,
        org.apache.spark.sql.functions.col("doc_id"))
      .as[Long]
  }

  /** Run `body` with spark.sql.shuffle.partitions temporarily lowered —
    * streaming micro-batch replays pay per-partition state-store setup
    * on EVERY batch, so the tiny-data engine executions in the battery
    * use a handful of partitions instead of the session's 32 (the conf
    * is read at streaming-query start; state-store sizing at production
    * volume belongs to the deployment, not the operator). */
  def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }
}
