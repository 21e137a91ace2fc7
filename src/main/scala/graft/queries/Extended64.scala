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

  /** C54 — SQL `MERGE INTO` through the catalog: the reference's K4
    * scatter-update (ref: Python-pipeline/dataprocessing.py:120-163,
    * fetched metrics written back into matched rows) issued the way an
    * operator actually writes it — `MERGE INTO wh.t USING updates ON
    * t.k = s.k WHEN MATCHED THEN UPDATE ... WHEN NOT MATCHED THEN
    * INSERT ...` resolves through [[graft.plans.RewriteWarehouseMerge]]
    * into ONE appended upsert epoch (merge-on-read: the new rows win
    * the keyed last-wins merge by load_seq; nothing is rewritten —
    * WarehouseCatalogSpec pins the epoch layout and the refusal
    * surface). This entry takes the GENERAL path: `p_brand` is not
    * assigned, so matched rows must keep their old brand (one
    * left-outer join against the merged snapshot supplies it) and
    * inserted rows take NULL. The oracle computes the post-merge state
    * declaratively.
    *
    * Scale: merge cost is O(|updates| + matched-key lookups), never a
    * table rewrite — the same reason the reference's scatter-update
    * stays cheap against its spreadsheet. */
  val c54SqlMergeUpsert = q("c54_sql_merge_upsert",
    """WITH base AS (
      |  SELECT CAST(p_partkey AS BIGINT) AS k, p_name, p_brand FROM part),
      |upd AS (SELECT k FROM base WHERE k % 7 = 0),
      |ins AS (SELECT k + 1000000 AS k FROM base WHERE k % 500 = 0)
      |SELECT k, p_name, p_brand, load_seq FROM (
      |  SELECT k, p_name, p_brand, CAST(1 AS BIGINT) AS load_seq
      |  FROM base WHERE k NOT IN (SELECT k FROM upd)
      |  UNION ALL
      |  SELECT k, 'MERGED', p_brand, CAST(2 AS BIGINT)
      |  FROM base WHERE k IN (SELECT k FROM upd)
      |  UNION ALL
      |  SELECT k, 'NEWPART', NULL, CAST(2 AS BIGINT) FROM ins)""".stripMargin
    ) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val root = freshScratch("c54")
    val base = Tables.part(s, d).select(
      col("p_partkey").cast("long").as("k"), col("p_name"), col("p_brand"))
    AtomicWarehouse.commitEpoch(s, s"$root/parts",
      base.withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some("k"), bloomKey = Some("k"))
    s.conf.set("spark.sql.catalog.whc54", "graft.sources.v2.WarehouseCatalog")
    s.conf.set("spark.sql.catalog.whc54.root", root)
    s.conf.set("spark.sql.catalog.whc54.mergeKey", "k")
    base.where(col("k") % 7 === 0)
      .select(col("k"), lit("MERGED").as("p_name"))
      .unionByName(base.where(col("k") % 500 === 0)
        .select((col("k") + 1000000L).as("k"), lit("NEWPART").as("p_name")))
      .createOrReplaceTempView("c54_updates")
    s.sql(
      """MERGE INTO whc54.parts t USING c54_updates s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET p_name = s.p_name
        |WHEN NOT MATCHED THEN INSERT (k, p_name) VALUES (s.k, s.p_name)
        |""".stripMargin)
    s.sql(
      """SELECT k, p_name, p_brand, load_seq FROM (
        |  SELECT k, p_name, p_brand, load_seq,
        |         row_number() OVER (PARTITION BY k
        |                            ORDER BY load_seq DESC) AS rn
        |  FROM whc54.parts) WHERE rn = 1""".stripMargin)
  }

  /** C55 — AGGREGATE PUSHDOWN on the warehouse connector: an unfiltered
    * global `COUNT(*) / MIN / MAX` over a warehouse table is answered
    * FROM THE MANIFEST ALONE — exact per-entry row counts (`#rows`,
    * recorded in the same commit-time aggregate as the zone maps) and
    * the entries' min/max stats, composed driver-side into one
    * pre-aggregated row; the scan opens ZERO data files (PlanAuditSpec
    * pins `PushedAggregates` + a single metadata partition; the refusal
    * surface — filters, tombstones, stat-less columns — is pinned in
    * WarehouseSourceSpec). Mirrors the video connector's COMPLETE
    * report pushdown, and what Delta answers `SELECT count(*)` with
    * from its transaction log. The oracle computes the same aggregates
    * by scanning the replayed union — metadata must equal data.
    *
    * Scale: `SELECT count(*) FROM wh.t` on a 100 TB store becomes an
    * O(entries) manifest read — the operator sanity-check loop stops
    * costing a full scan. */
  val c55AggPushdown = q("c55_warehouse_agg_pushdown",
    """WITH e1 AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS k, c_name FROM customer),
      |e2 AS (
      |  SELECT CAST(c_custkey AS BIGINT) + 1000000 AS k,
      |         'SHADOW-' || c_name AS c_name FROM customer
      |  WHERE c_custkey % 2 = 0),
      |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
      |SELECT count(*) AS n_rows, min(k) AS mn_k, max(k) AS mx_k,
      |       min(c_name) AS mn_name, max(c_name) AS mx_name
      |FROM u""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val wh = freshScratch("c55") + "/wh"
    val base = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("k"), col("c_name"))
    AtomicWarehouse.commitEpoch(s, wh,
      base.withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some("k"), statsCols = Seq("c_name"))
    AtomicWarehouse.commitEpoch(s, wh,
      base.where(col("k") % 2 === 0)
        .select((col("k") + 1000000L).as("k"),
          concat(lit("SHADOW-"), col("c_name")).as("c_name"),
          lit(2L).as("load_seq")), 2L,
      statsKey = Some("k"), statsCols = Seq("c_name"))
    s.read.format("graft-warehouse").option("path", wh).load()
      .agg(count(lit(1)).as("n_rows"),
        min("k").as("mn_k"), max("k").as("mx_k"),
        min("c_name").as("mn_name"), max("c_name").as("mx_name"))
  }

  /** C56 — Z-ORDERED epoch write + two-column pruned read:
    * `commitEpoch(..., zorderBy = (l_partkey, l_suppkey))` lays the
    * epoch on the Morton curve ([[graft.sinks.AtomicWarehouse
    * .zorderFrame]]: equal-width 12-bit buckets from one min/max job,
    * codegen interleave, range-partition + local sort), so parquet
    * row-group min/max are narrow in BOTH columns — and the read back
    * drives predicates on BOTH through the connector's row-group
    * pushdown, which single-key `clusterBy` (c49) can only serve for
    * its one sort chain (ZOrderSpec measures the per-column span
    * narrowing that funds this). The oracle filters the raw table —
    * layout must never change answers.
    *
    * Scale: the curve write costs one extra min/max job + the same
    * range shuffle clusterBy pays; the payoff is every analyst filter
    * on EITHER dimension of a 100 TB fact table skipping most row
    * groups. Compaction takes the same `zorderBy` — Delta's
    * OPTIMIZE ZORDER as a maintenance pass. */
  val c56ZorderWrite = q("c56_zorder_write",
    """SELECT CAST(l_partkey AS BIGINT) AS pk,
      |       CAST(l_suppkey AS BIGINT) AS sk,
      |       CAST(sum(l_quantity) AS DOUBLE) AS qty,
      |       count(*) AS n
      |FROM lineitem
      |WHERE l_partkey BETWEEN 10 AND 120
      |  AND l_suppkey BETWEEN 2 AND 8
      |GROUP BY 1, 2""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val wh = freshScratch("c56") + "/wh"
    AtomicWarehouse.commitEpoch(s, wh,
      Tables.lineitem(s, d).select(
        col("l_partkey").cast("long").as("pk"),
        col("l_suppkey").cast("long").as("sk"),
        col("l_quantity").cast("double").as("qty"),
        lit(1L).as("load_seq")),
      1L, statsKey = Some("pk"), statsCols = Seq("sk"),
      zorderBy = Seq("pk", "sk"))
    s.read.format("graft-warehouse").option("path", wh).load()
      .where(col("pk").between(10L, 120L) && col("sk").between(2L, 8L))
      .groupBy("pk", "sk")
      .agg(sum("qty").as("qty"), count(lit(1)).as("n"))
  }

  val all: Seq[Q] = Seq(c53TombstonePurge, c54SqlMergeUpsert, c55AggPushdown,
    c56ZorderWrite)
}
