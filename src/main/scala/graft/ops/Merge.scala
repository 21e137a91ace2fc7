package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J5/K4 — keyed upsert-merge: the reference scatters per-video metric
  * updates into staging rows by positional index
  * (ref: Python-pipeline/dataprocessing.py:120-163). Spark-first this is a
  * left join on the key + per-column coalesce(new, old): staging rows
  * without metrics keep old values; metric rows absent from staging are
  * dropped (inner on the update side), exactly the reference semantics.
  *
  * Scale note: when `updates` is small (a batch epoch) Catalyst broadcasts
  * it — no shuffle of the big staging side. When both are large, AQE picks
  * a shuffle hash join on the key; pre-bucketing staging by the key makes
  * repeated epochs shuffle-free.
  */
object Merge {

  /** Merge `updates` into `base` on `key`. Columns shared (besides the key)
    * are overwritten where an update exists; base-only columns pass
    * through; update-only columns are appended (null where no update). */
  def upsertColumns(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val shared = updates.columns.filter(c => c != key && base.columns.contains(c))
    val updOnly = updates.columns.filter(c => c != key && !base.columns.contains(c))
    val u = updates.columns.foldLeft(updates)((d, c) =>
      if (c == key) d else d.withColumnRenamed(c, s"__u_$c"))
    val joined = base.join(u, Seq(key), "left")
    val outCols =
      col(key) +:
      (base.columns.filter(_ != key).map { c =>
        if (shared.contains(c)) coalesce(col(s"__u_$c"), col(c)).as(c) else col(c)
      } ++ updOnly.map(c => col(s"__u_$c").as(c)))
    joined.select(outCols: _*)
  }
}
