package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-14 widening, part 80: the change feed's FULL Delta-CDF update
  * contract — `update_preimage` rows. The reference's metric write-back
  * (ref: Python-pipeline/dataprocessing.py:120-163) is an UPDATE of
  * matched staging rows; an auditor diffing what that mutation CHANGED
  * needs the pre-update row versions, which round 13's feed could only
  * reconstruct by a self-join against the prior snapshot. */
object Extended80 {

  /** C80 — SQL `UPDATE` records its matched winners' PRE-update
    * versions in a PREIMAGE LOG (`graft.update.logPreimages`,
    * [[graft.sinks.AtomicWarehouse.commitNamedEpochWithPreimage]] —
    * one manifest CAS commits preimage log + postimage epoch
    * together), and the row-level change feed serves them as
    * `_change_type='update_preimage'` rows behind
    * `.option("includePreimages", true)` — Delta CDF's full update
    * contract (pre AND post images, pre ordered first). The log rides
    * the `tombstone_noop_` namespace, so snapshot reads, drop lists,
    * metadata COUNT/MIN-MAX and maxLoadSeq skip it with zero new code
    * paths; feeds WITHOUT the option serve round-13 behavior
    * unchanged (pinned in-query), and last-wins consumers
    * ([[graft.ops.Merge.applyChangeFeed]]) ignore preimages (pinned:
    * applying the preimage-bearing feed still reproduces the engine's
    * snapshot).
    *
    * Scale: the preimage write is O(matched rows) — the same slice
    * the update already materialized, re-emitted verbatim; reads that
    * don't ask for preimages never open the log (entry classification
    * is by NAME at planning time, zero data I/O). */
  val c80UpdatePreimageFeed = q("c80_update_preimage_feed",
    """WITH src AS (
      |  SELECT CAST(s_suppkey AS BIGINT) AS k, s_name AS name
      |  FROM supplier)
      |SELECT k, name, load_seq, _change_type, _commit_version FROM (
      |  SELECT k, name, CAST(1 AS BIGINT) AS load_seq,
      |         'insert' AS _change_type,
      |         CAST(1 AS BIGINT) AS _commit_version
      |  FROM src
      |  UNION ALL
      |  SELECT k, name, CAST(1 AS BIGINT), 'update_preimage',
      |         CAST(2 AS BIGINT)
      |  FROM src WHERE k % 4 = 0
      |  UNION ALL
      |  SELECT k, 'U-' || name, CAST(2 AS BIGINT), 'update_postimage',
      |         CAST(2 AS BIGINT)
      |  FROM src WHERE k % 4 = 0)""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val root = freshScratch("c80")
    s.conf.set("spark.sql.catalog.whc80", "graft.sources.v2.WarehouseCatalog")
    s.conf.set("spark.sql.catalog.whc80.root", root)
    s.conf.set("spark.sql.catalog.whc80.mergeKey", "k")
    val dir = s"$root/sup"
    AtomicWarehouse.commitEpoch(s, dir,
      Tables.supplier(s, d).select(col("s_suppkey").cast("long").as("k"),
        col("s_name").as("name"), lit(1L).as("load_seq")), 1L,
      statsKey = Some("k"), bloomKey = Some("k")) // v1
    s.conf.set("graft.update.logPreimages", "true")
    try s.sql("UPDATE whc80.sup SET name = concat('U-', name) " +
      "WHERE k % 4 = 0") // v2: preimage log + update_v1_* epoch, one CAS
    finally s.conf.unset("graft.update.logPreimages")
    val names = AtomicWarehouse.committedEpochs(s, dir)
    require(names.exists(AtomicWarehouse.isPreimageLog),
      s"the UPDATE must have committed a preimage log: $names")
    // the log is invisible outside the CDF read: snapshot count intact
    require(AtomicWarehouse.read(s, dir, "k").count() ==
      Tables.supplier(s, d).count(), "snapshot must skip the preimage log")
    def feed(pre: Boolean) = {
      val b = s.read.format("graft-warehouse").option("path", dir)
        .option("startingVersion", "1").option("readChangeFeed", "true")
      (if (pre) b.option("includePreimages", "true") else b).load()
    }
    // round-13 default unchanged: no preimages without the option
    require(feed(false).where(col("_change_type") === "update_preimage")
      .isEmpty, "default CDF read must not serve preimages")
    val withPre = feed(true)
    // a last-wins consumer ignores preimages — applying the
    // preimage-bearing feed reproduces the snapshot exactly
    require(graft.ops.Merge.applyChangeFeed(
      withPre.select(col("*"), col("_pos")), "k").count() ==
      Tables.supplier(s, d).count(),
      "applyChangeFeed must ignore update_preimage rows")
    withPre.select(col("k"), col("name"), col("load_seq"),
      col("_change_type"), col("_commit_version"))
  }

  /** C82 — COMPOSITE MERGE KEYS (`mergeKey = "okey,line"`) through the
    * whole warehouse lattice: last-wins read merge on the multi-column
    * identity, SQL UPDATE, predicate DELETE (a deferred tombstone whose
    * key list stores the engine's null-propagating composite rendering
    * — [[graft.sinks.AtomicWarehouse.purgeCompositeKeysDeferred]]),
    * MERGE INTO with the `ON t.k1 = s.e1 AND t.k2 = s.e2` conjunction
    * (update + insert), and the row-level change feed (delete rows
    * carry EVERY key-part column populated;
    * [[graft.ops.Merge.applyChangeFeed]] merges on the parts). The
    * reference's key is single (`video_id`), but every warehouse this
    * engine imitates supports compound identities — (l_orderkey,
    * l_linenumber) is exactly the natural key the lineitem table needs.
    *
    * Scale: the rendering exists ONLY inside tombstone key lists
    * (O(purged keys)); data files never store it — reads partition the
    * merge window by the part columns, per-part zone maps + blooms
    * prune purge suppression exactly like single keys. */
  val c82CompositeMergeKey = q("c82_composite_merge_key",
    """WITH li AS (
      |  SELECT CAST(l_orderkey AS BIGINT) AS okey,
      |         CAST(l_linenumber AS BIGINT) AS line,
      |         MAX(CAST(l_quantity AS BIGINT)) AS qty
      |  FROM lineitem WHERE l_orderkey % 50 = 0
      |  GROUP BY 1, 2)
      |SELECT okey, line, qty FROM (
      |  SELECT okey, line,
      |         CASE WHEN line = 3 THEN CAST(-1 AS BIGINT)
      |              WHEN line = 1 THEN qty + 100
      |              ELSE qty END AS qty
      |  FROM li WHERE NOT (okey % 100 = 0 AND line = 2)
      |  UNION ALL
      |  SELECT DISTINCT okey + 10000000, CAST(0 AS BIGINT),
      |         CAST(555 AS BIGINT)
      |  FROM li WHERE line = 3)""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val root = freshScratch("c82")
    s.conf.set("spark.sql.catalog.whc82", "graft.sources.v2.WarehouseCatalog")
    s.conf.set("spark.sql.catalog.whc82.root", root)
    s.conf.set("spark.sql.catalog.whc82.mergeKey", "okey,line")
    val dir = s"$root/t"
    val key = "okey,line"
    val li = Tables.lineitem(s, d).where(col("l_orderkey") % 50 === 0)
      .groupBy(col("l_orderkey").cast("long").as("okey"),
        col("l_linenumber").cast("long").as("line"))
      .agg(max(col("l_quantity").cast("long")).as("qty"))
    AtomicWarehouse.commitEpoch(s, dir,
      li.withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some(key), bloomKey = Some(key)) // v1
    s.sql("UPDATE whc82.t SET qty = qty + 100 WHERE line = 1") // v2
    s.sql("DELETE FROM whc82.t WHERE okey % 100 = 0 AND line = 2") // v3
    require(AtomicWarehouse.committedEpochs(s, dir)
      .exists(AtomicWarehouse.isTombstone),
      "the composite predicate DELETE must commit a deferred tombstone")
    li.where(col("line") === 3)
      .select(col("okey").as("g"), col("line").as("i"))
      .withColumn("q", lit(-1L))
      .unionByName(li.where(col("line") === 3)
        .select((col("okey") + 10000000L).as("g"), lit(0L).as("i"),
          lit(555L).as("q")).distinct())
      .createOrReplaceTempView("c82_src")
    s.sql(
      """MERGE INTO whc82.t AS t USING c82_src AS s
        |ON t.okey = s.g AND t.line = s.i
        |WHEN MATCHED THEN UPDATE SET qty = s.q
        |WHEN NOT MATCHED THEN INSERT (okey, line, qty)
        |VALUES (s.g, s.i, s.q)""".stripMargin) // v4
    val merged = AtomicWarehouse.read(s, dir, key)
    // the composite feed round-trips: delete rows carry both key parts,
    // applyChangeFeed merges on them and reproduces the snapshot
    val feed = s.read.format("graft-warehouse").option("path", dir)
      .option("startingVersion", "1").option("readChangeFeed", "true")
      .load().select(col("*"), col("_pos"))
    val applied = graft.ops.Merge.applyChangeFeed(feed, key)
      .select("okey", "line", "qty")
    val engine = merged.select("okey", "line", "qty")
    require(applied.exceptAll(engine).isEmpty &&
      engine.exceptAll(applied).isEmpty,
      "composite applyChangeFeed must reproduce the engine snapshot")
    engine
  }

  /** C83 — RESTORE rides the change feed as EXPLICIT RETRACTIONS
    * behind `.option("restoreAsDeletes", true)`: each entry the
    * rollback removed is re-planned — its own files — as
    * `_change_type='delete'` rows at a position above the entry's
    * insert and below every survivor, so threshold suppression
    * (`__dpos > _pos`) retracts exactly the undone row versions while
    * older surviving versions FALL BACK, reproducing the engine's
    * restored snapshot (pinned in-query via
    * [[graft.ops.Merge.applyChangeFeed]]). Delta's CDF-by-file-diff
    * for RESTORE, on the log-structured manifest. The default remains
    * the loud ROLLBACK refusal (c79 pins it); restore-FORWARD re-adds,
    * undone retractions, and fold-sharing ranges still refuse — the
    * shapes where the position argument breaks.
    *
    * Scale: the retraction plans O(removed entries) file reads — the
    * rows being retracted, nothing else; zero driver-side key
    * collection, zero scans of surviving data. */
  val c83RestoreAsDeletes = q("c83_restore_as_deletes",
    """WITH src AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders
      |  WHERE o_orderkey % 2 = 0)
      |SELECT k, status, load_seq, _change_type, _commit_version FROM (
      |  SELECT k, 'A' AS status, CAST(1 AS BIGINT) AS load_seq,
      |         'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
      |  FROM src
      |  UNION ALL
      |  SELECT k, 'B', CAST(2 AS BIGINT), 'insert', CAST(2 AS BIGINT)
      |  FROM src WHERE k % 10 = 0
      |  UNION ALL
      |  SELECT k + 5000000, 'C', CAST(3 AS BIGINT), 'insert',
      |         CAST(3 AS BIGINT)
      |  FROM src
      |  UNION ALL
      |  SELECT k, 'B', CAST(2 AS BIGINT), 'delete', CAST(4 AS BIGINT)
      |  FROM src WHERE k % 10 = 0
      |  UNION ALL
      |  SELECT k + 5000000, 'C', CAST(3 AS BIGINT), 'delete',
      |         CAST(4 AS BIGINT)
      |  FROM src
      |  UNION ALL
      |  SELECT k, 'D', CAST(5 AS BIGINT), 'insert', CAST(5 AS BIGINT)
      |  FROM src WHERE k % 25 = 0)""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val root = freshScratch("c83")
    val dir = s"$root/t"
    val src = Tables.orders(s, d).where(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").cast("long").as("k"))
    def ep(rows: org.apache.spark.sql.DataFrame, st: String, seq: Long) =
      AtomicWarehouse.commitEpoch(s, dir,
        rows.withColumn("status", lit(st))
          .withColumn("load_seq", lit(seq)), seq,
        statsKey = Some("k"), bloomKey = Some("k"))
    ep(src, "A", 1L) // v1
    ep(src.where(col("k") % 10 === 0), "B", 2L) // v2
    ep(src.select((col("k") + 5000000L).as("k")), "C", 3L) // v3
    AtomicWarehouse.restore(s, dir, 1L) // v4: undoes epochs 2 and 3
    ep(src.where(col("k") % 25 === 0), "D", 5L) // v5
    val feed = s.read.format("graft-warehouse").option("path", dir)
      .option("startingVersion", "1").option("readChangeFeed", "true")
      .option("restoreAsDeletes", "true")
      .load().select(col("*"), col("_pos"))
    // threshold retraction + fallback: applying the feed reproduces the
    // restored-then-extended snapshot exactly
    val applied = graft.ops.Merge.applyChangeFeed(feed, "k")
      .select("k", "status", "load_seq")
    val engine = AtomicWarehouse.read(s, dir, "k")
      .select("k", "status", "load_seq")
    require(applied.exceptAll(engine).isEmpty &&
      engine.exceptAll(applied).isEmpty,
      "applied restoreAsDeletes feed must reproduce the engine snapshot")
    feed.select(col("k"), col("status"), col("load_seq"),
      col("_change_type"), col("_commit_version"))
  }

  /** C84 — the change feed TYPES a MERGE's branches apart
    * (`graft.merge.typedFeedEntries`): the matched branch's rows commit
    * as an `update_v*_m` epoch (feed-typed `'update_postimage'`), the
    * not-matched branch's as the plain merge epoch (`'insert'`), and —
    * with `graft.update.logPreimages` — the matched winners' pre-merge
    * versions ride a preimage log served as `'update_preimage'` rows;
    * all entries land in ONE manifest CAS
    * ([[graft.sinks.AtomicWarehouse.commitMergeTyped]]), so a torn
    * half-merge is unreachable. Delta CDF's per-row merge typing,
    * expressed as per-entry typing over disjoint key sets. Default
    * merges are unchanged (one untyped epoch); the opt-in costs one
    * extra target join for symmetric merges (the split needs it).
    *
    * Scale: same O(delta) merge — the split is a WHERE over the join
    * the general path already runs; the preimage write is O(matched). */
  val c84MergeTypedFeed = q("c84_merge_typed_feed",
    """WITH src AS (
      |  SELECT CAST(p_partkey AS BIGINT) AS k, p_name AS name FROM part)
      |SELECT k, name, load_seq, _change_type, _commit_version FROM (
      |  SELECT k, name, CAST(1 AS BIGINT) AS load_seq,
      |         'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
      |  FROM src
      |  UNION ALL
      |  SELECT k, name, CAST(1 AS BIGINT), 'update_preimage',
      |         CAST(2 AS BIGINT)
      |  FROM src WHERE k % 3 = 0
      |  UNION ALL
      |  SELECT k, 'M-' || name, CAST(2 AS BIGINT), 'update_postimage',
      |         CAST(2 AS BIGINT)
      |  FROM src WHERE k % 3 = 0
      |  UNION ALL
      |  SELECT k + 3000000, 'NEW', CAST(2 AS BIGINT), 'insert',
      |         CAST(2 AS BIGINT)
      |  FROM src WHERE k % 7 = 0)""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val root = freshScratch("c84")
    s.conf.set("spark.sql.catalog.whc84", "graft.sources.v2.WarehouseCatalog")
    s.conf.set("spark.sql.catalog.whc84.root", root)
    s.conf.set("spark.sql.catalog.whc84.mergeKey", "k")
    val dir = s"$root/t"
    val src = Tables.part(s, d).select(
      col("p_partkey").cast("long").as("k"), col("p_name").as("name"))
    AtomicWarehouse.commitEpoch(s, dir,
      src.withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some("k"), bloomKey = Some("k")) // v1
    src.where(col("k") % 3 === 0)
      .select(col("k").as("sk"), concat(lit("M-"), col("name")).as("sn"))
      .unionByName(src.where(col("k") % 7 === 0)
        .select((col("k") + 3000000L).as("sk"), lit("NEW").as("sn")))
      .createOrReplaceTempView("c84_src")
    s.conf.set("graft.merge.typedFeedEntries", "true")
    s.conf.set("graft.update.logPreimages", "true")
    try s.sql(
      """MERGE INTO whc84.t AS t USING c84_src AS s ON t.k = s.sk
        |WHEN MATCHED THEN UPDATE SET name = s.sn
        |WHEN NOT MATCHED THEN INSERT (k, name) VALUES (s.sk, s.sn)
        |""".stripMargin) // v2: preimage log + update epoch + insert epoch
    finally {
      s.conf.unset("graft.merge.typedFeedEntries")
      s.conf.unset("graft.update.logPreimages")
    }
    require(AtomicWarehouse.currentVersion(s, dir) == 2L,
      "typed merge commits ONE manifest version (torn halves unreachable)")
    val feed = s.read.format("graft-warehouse").option("path", dir)
      .option("startingVersion", "1").option("readChangeFeed", "true")
      .option("includePreimages", "true").load()
    // a last-wins consumer over the typed feed reproduces the snapshot
    require(graft.ops.Merge.applyChangeFeed(
      feed.select(col("*"), col("_pos")), "k").count() ==
      AtomicWarehouse.read(s, dir, "k").count(),
      "applyChangeFeed over the typed merge feed must match the snapshot")
    feed.select(col("k"), col("name"), col("load_seq"),
      col("_change_type"), col("_commit_version"))
  }

  val all: Seq[Q] = Seq(c80UpdatePreimageFeed, c82CompositeMergeKey,
    c83RestoreAsDeletes, c84MergeTypedFeed)
}
