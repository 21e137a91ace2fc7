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
