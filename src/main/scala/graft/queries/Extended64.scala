package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 widening, part 64: the warehouse's merge-on-read purge as a
  * battery entry — the deletion-vector counterpart of c48's copy-on-write
  * purge.
  */
object Extended64 {

  /** C53 — DELETION-VECTOR PURGE
    * ([[graft.sinks.AtomicWarehouse.purgeKeysDeferred]]): the
    * right-to-be-forgotten purge as ONE metadata commit — the purged keys
    * land as a `tombstone_*` entry and every epoch dir stays
    * byte-for-byte untouched (PurgeSpec pins the zero-rewrite layout);
    * reads apply the tombstone as a broadcast anti-join scoped by
    * manifest position, so a drain RE-ADDING a purged key after the
    * tombstone is new data and wins the merge — which this entry
    * exercises: epoch 3 re-adds HALF the purged keys and the hashed
    * result must show exactly those back at load_seq 3 while the other
    * half stays gone. The oracle replays the three epochs declaratively
    * with the tombstone as a filter on pre-tombstone versions.
    *
    * Scale: at 100 TB this is the purge that stays O(keys) — c48's CoW
    * rewrite touches every epoch a key ever landed in, this touches
    * none; compaction folds the tombstone into its rewrite later
    * (PurgeSpec), so read-side anti-join cost is bounded by compaction
    * cadence. The compliance pair becomes tombstone → compact → vacuum.
    *
    * ref: Python-pipeline/ingestdatainbigquery.py:84-96 (the reference's
    * delete-shaped rewrite runs server-side in BigQuery; this is the
    * metadata-only form BigQuery itself uses internally for DML). */
  val c53TombstonePurge = q("c53_tombstone_purge",
    """WITH e1 AS (
      |  SELECT CAST(p_partkey AS BIGINT) AS k, p_name,
      |         CAST(1 AS BIGINT) AS load_seq FROM part),
      |e2 AS (
      |  SELECT CAST(p_partkey AS BIGINT) AS k, 'REFETCHED' AS p_name,
      |         CAST(2 AS BIGINT) AS load_seq FROM part
      |  WHERE p_partkey % 3 = 0),
      |doomed AS (
      |  SELECT CAST(p_partkey AS BIGINT) AS k FROM part
      |  WHERE p_partkey % 89 = 7 AND p_partkey < 3000),
      |e3 AS (
      |  SELECT k, 'READDED' AS p_name, CAST(3 AS BIGINT) AS load_seq
      |  FROM doomed WHERE k % 2 = 1),
      |u AS (
      |  SELECT * FROM e1 WHERE k NOT IN (SELECT k FROM doomed)
      |  UNION ALL
      |  SELECT * FROM e2 WHERE k NOT IN (SELECT k FROM doomed)
      |  UNION ALL
      |  SELECT * FROM e3)
      |SELECT k, p_name, load_seq FROM (
      |  SELECT *, row_number() OVER (PARTITION BY k
      |                               ORDER BY load_seq DESC) AS rn
      |  FROM u) WHERE rn = 1""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val wh = freshScratch("c53") + "/wh"
    val base = Tables.part(s, d).select(
      col("p_partkey").cast("long").as("k"), col("p_name"))
    AtomicWarehouse.commitEpoch(s, wh,
      base.withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some("k"), bloomKey = Some("k"))
    AtomicWarehouse.commitEpoch(s, wh,
      base.where(col("k") % 3 === 0)
        .withColumn("p_name", lit("REFETCHED"))
        .withColumn("load_seq", lit(2L)), 2L,
      statsKey = Some("k"), bloomKey = Some("k"))
    // deterministic purge set, BOUNDED at every SF (same O(keys)
    // driver-list contract as c48)
    val doomed = base.where(col("k") % 89 === 7 && col("k") < 3000)
      .select("k").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq.sorted
    AtomicWarehouse.purgeKeysDeferred(s, wh, "k", doomed)
    // a post-tombstone drain re-adds HALF the purged keys: the
    // tombstone's manifest position must scope the suppression to
    // epochs 1-2 only
    import s.implicits._
    AtomicWarehouse.commitEpoch(s, wh,
      doomed.filter(_ % 2 == 1).toDF("k")
        .withColumn("p_name", lit("READDED"))
        .withColumn("load_seq", lit(3L)), 3L,
      statsKey = Some("k"), bloomKey = Some("k"))
    AtomicWarehouse.read(s, wh, "k").select("k", "p_name", "load_seq")
  }

  val all: Seq[Q] = Seq(c53TombstonePurge)
}
