package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed deduplication — the reference's two dedup flavors (SURVEY.md §2.6):
  *
  *  - W1 keep-last merge dedup (dataingestion1.py:166-168): pandas relies on
  *    implicit physical row order; Spark has none, so the caller supplies an
  *    EXPLICIT ordering (ingest_seq / event time) — the survivor is the row
  *    with the greatest ordering key.
  *  - W2 warehouse dedup (ingestdatainbigquery.py:84-96): the reference
  *    orders by CURRENT_TIMESTAMP() (constant ⇒ nondeterministic survivor);
  *    we substitute a deterministic key and document the divergence.
  *
  * Scale note: one shuffle on the key; at 100 TB this is a hash
  * repartition by key + per-partition top-1 (WindowExec with
  * row_number is planned as a single shuffle, no sort spill beyond the
  * per-key ordering). AQE handles skewed keys.
  */
object Dedup {

  /** Keep exactly one row per key: the one ranked first by `order`.
    * Ties must be broken by the caller (include a unique column last). */
  def keepFirstBy(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** W1 — keep-last: survivor has the greatest (seq, tiebreak...) value. */
  def keepLast(df: DataFrame, key: String, seq: Column, tiebreak: Column*): DataFrame =
    keepFirstBy(df, Seq(key), (seq +: tiebreak).map(_.desc))
}
