package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CHECK-constraint gate for warehouse drains — the quality fence the
  * reference applies by hand-inspecting the sheet after each load (and
  * Delta/BigQuery enforce server-side): a drain whose staging rows
  * violate a declared predicate is REFUSED before anything is committed,
  * so bad batches never reach the warehouse and never cost a rollback.
  *
  * Violation semantics follow SQL CHECK: a row violates a constraint iff
  * the predicate evaluates to FALSE — UNKNOWN (null) passes, exactly as
  * in the standard (`coalesce(NOT pred, false)` on both engines).
  */
object Constraints {

  /** Per-constraint violation counts over `df`, computed in ONE aggregate
    * pass (k conditional sums folded into a single 1-row agg, then
    * unpivoted) — the report stays O(k) however large the staging is.
    * Constraint NAMES are data, never SQL: aggregates alias to positional
    * `__c<i>` and names enter only as literals in the unpivot structs, so
    * quotes/backticks/spaces/duplicates in a name can't break parsing
    * (the PREDICATES are SQL by contract — that's the API). */
  def violationReport(df: DataFrame,
      checks: Seq[(String, String)]): DataFrame = {
    require(checks.nonEmpty, "no constraints declared")
    val aggs = checks.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(!expr(pred), lit(false)), 1L).otherwise(0L)).as(s"__c$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val kv = explode(array(checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("constraint_name"),
        col(s"__c$i").as("n_violations"))
    }: _*))
    one.select(kv.as("kv")).select(col("kv.constraint_name"),
      col("kv.n_violations"))
  }

  /** [[AtomicWarehouse.drain]] gated on `checks`: any violation aborts
    * BEFORE the epoch is staged — the warehouse manifest, the epoch dirs
    * and the staging dir are all left untouched, and the error carries
    * the per-constraint counts. A clean batch drains normally.
    *
    * CHECK and DRAIN see one snapshot: the staging directory is read
    * ONCE (the DataFrame's parquet file listing is pinned at creation)
    * and that same DataFrame flows into
    * [[AtomicWarehouse.drainSnapshot]] — a concurrent staging writer
    * cannot slip unchecked files between the audit and the commit, and
    * the directory isn't listed twice per gated drain. `afterCheck` is a
    * test seam (fires between the audit and the commit) for pinning
    * exactly that property. */
  def drainChecked(spark: SparkSession, stagingDir: String, dir: String,
      seq: Long, checks: Seq[(String, String)],
      afterCheck: () => Unit = () => ()): Unit = {
    val staged = spark.read.parquet(stagingDir)
    val bad = violationReport(staged, checks)
      .where(col("n_violations") > 0)
      .collect()
    if (bad.nonEmpty)
      throw new ConstraintViolationException(
        bad.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(
          s"drain epoch $seq refused, constraint violations: ", ", ", ""))
    afterCheck()
    AtomicWarehouse.drainSnapshot(spark, staged, stagingDir, dir, seq)
  }
}

final class ConstraintViolationException(msg: String)
    extends RuntimeException(msg)
