package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-12 widening, part 69: the ROW-LEVEL change feed — retractions
  * as data. The reference's consumer loop deduplicates its warehouse by
  * re-reading everything (ref: Python-pipeline/ingestdatainbigquery.py:
  * 84-96, CREATE OR REPLACE over the full table); a Delta-CDF-shaped
  * feed lets the same loop apply O(delta) inserts AND deletes instead.
  */
object Extended69 {

  /** C69 — ROW-LEVEL CHANGE FEED (`readChangeFeed`): the batch feed of
    * c68 upgraded to Delta CDF's consumer contract — every fed row
    * carries `_change_type` ('insert' | 'delete') and `_commit_version`
    * (the manifest version whose commit produced it), and DEFERRED
    * PURGES are served as delete rows (key populated, other columns
    * null — the tombstone's key list IS the retraction, verbatim:
    * note the key below that matches no data row still rides the feed)
    * instead of failing the feed at the purge boundary.
    *
    * Pinned here: the full insert/delete history of a 4-version
    * warehouse (two appends, one deferred purge, one append) hash-
    * matches a DuckDB replay of the same history — the e11_cdc_apply
    * oracle pattern pointed at the engine's own manifest.
    *
    * Scale: planning stays O(versions in range) manifest reads; delete
    * rows are O(purged keys) synthesized driver-side from the key
    * lists already cached for scan-time drops — zero data files opened
    * for the retraction part of the feed. */
  val c69RowChangeFeed = q("c69_row_change_feed",
    """WITH src AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k,
      |         CAST(o_orderstatus AS VARCHAR) AS status FROM orders)
      |SELECT k, status, load_seq, _change_type, _commit_version FROM (
      |  SELECT k, status, CAST(1 AS BIGINT) AS load_seq,
      |         'insert' AS _change_type,
      |         CAST(1 AS BIGINT) AS _commit_version
      |  FROM src
      |  UNION ALL
      |  SELECT k, 'UPD-' || status, CAST(2 AS BIGINT), 'insert',
      |         CAST(2 AS BIGINT)
      |  FROM src WHERE k % 5 = 0
      |  UNION ALL
      |  SELECT CAST(t.k AS BIGINT), CAST(NULL AS VARCHAR),
      |         CAST(NULL AS BIGINT), 'delete', CAST(3 AS BIGINT)
      |  FROM (VALUES (2), (33), (998244353)) t(k)
      |  UNION ALL
      |  SELECT k + 9000000, status, CAST(4 AS BIGINT), 'insert',
      |         CAST(4 AS BIGINT)
      |  FROM src WHERE k % 11 = 0)""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val dir = s"${freshScratch("c69")}/wh"
    val src = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_orderstatus").cast("string").as("status"))
    AtomicWarehouse.commitEpoch(s, dir,
      src.withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some("k"), bloomKey = Some("k")) // v1
    AtomicWarehouse.commitEpoch(s, dir,
      src.where(col("k") % 5 === 0)
        .withColumn("status", concat(lit("UPD-"), col("status")))
        .withColumn("load_seq", lit(2L)), 2L,
      statsKey = Some("k"), bloomKey = Some("k")) // v2
    // deferred purge = tombstone commit; 998244353 matches NO data row —
    // the feed serves the key list verbatim, not a data join
    AtomicWarehouse.purgeKeysDeferred(s, dir, "k",
      Seq(33L, 2L, 998244353L)) // v3
    AtomicWarehouse.commitEpoch(s, dir,
      src.where(col("k") % 11 === 0)
        .withColumn("k", col("k") + 9000000L)
        .withColumn("load_seq", lit(4L)), 4L,
      statsKey = Some("k"), bloomKey = Some("k")) // v4
    s.read.format("graft-warehouse").option("path", dir)
      .option("startingVersion", "1") // inclusive: the whole history
      .option("readChangeFeed", "true").load()
      .select(col("k"), col("status"), col("load_seq"),
        col("_change_type"), col("_commit_version"))
  }

  /** C70 — metadata MIN/MAX that SURVIVES TOMBSTONES (c65's COUNT trade
    * extended to the other two manifest-answerable aggregates): with
    * deferred purges outstanding, the connector re-scans ONLY the
    * epochs whose zone maps/blooms say a purged key might live there —
    * with drops applied — and serves every other epoch from its
    * recorded stats; the result is still a COMPLETE pushdown (Spark
    * plans no aggregate of its own).
    *
    * Pinned in-query: the purge hits the CURRENT GLOBAL MINIMUM (keys
    * 1, 2), so serving stale zone maps would answer 1 — the pushed
    * answer must be the recomputed post-suppression extremum, and the
    * plan must still carry `PushedAggregates`.
    *
    * Scale: `MIN(col)` against a 100 TB store with a compliance purge
    * outstanding reads the manifest plus the few bloom-positive epochs
    * instead of every data file. */
  val c70MetaMinMaxSuppressed = q("c70_meta_minmax_suppressed",
    """WITH src AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
      |log AS (SELECT k FROM src UNION ALL SELECT k FROM src WHERE k % 4 = 0)
      |SELECT CAST(min(k) AS BIGINT) AS mn, CAST(max(k) AS BIGINT) AS mx
      |FROM log WHERE k NOT IN (1, 2)""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val dir = s"${freshScratch("c70")}/wh"
    val src = Tables.customer(s, d)
      .select(col("c_custkey").cast("long").as("k"), col("c_name"))
    AtomicWarehouse.commitEpoch(s, dir,
      src.withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some("k"), bloomKey = Some("k"))
    AtomicWarehouse.commitEpoch(s, dir,
      src.where(col("k") % 4 === 0)
        .withColumn("c_name", concat(lit("AUD-"), col("c_name")))
        .withColumn("load_seq", lit(2L)), 2L,
      statsKey = Some("k"), bloomKey = Some("k"))
    AtomicWarehouse.purgeKeysDeferred(s, dir, "k", Seq(1L, 2L))
    val agged = s.read.format("graft-warehouse").option("path", dir)
      .load().agg(min(col("k")).as("mn"), max(col("k")).as("mx"))
    require(agged.queryExecution.executedPlan.toString
      .contains("PushedAggregates"),
      "MIN/MAX must stay a manifest answer with tombstones outstanding")
    agged
  }

  /** C71 — the SQL FACE of the row-level feed:
    * `SELECT … FROM graft_table_changes('<dir>', start[, end])`, a
    * table-valued function (Delta's `table_changes`) resolving to the
    * same DSv2 relation the `readChangeFeed` option builds — a
    * distributed, prunable scan, not a driver-collected procedure
    * result. Same 4-version insert/delete history as c69, consumed
    * entirely through `spark.sql`; the oracle replays it identically.
    * Bounded-range semantics ride the third argument (inclusive, like
    * Delta): this query reads [2, 3] — the update epoch and the
    * tombstone — proving the SQL surface carries version bounds, not
    * just the full history. */
  val c71SqlTableChanges = q("c71_sql_table_changes",
    """WITH src AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k,
      |         CAST(o_orderstatus AS VARCHAR) AS status FROM orders)
      |SELECT k, status, load_seq, _change_type, _commit_version FROM (
      |  SELECT k, 'UPD-' || status AS status,
      |         CAST(2 AS BIGINT) AS load_seq, 'insert' AS _change_type,
      |         CAST(2 AS BIGINT) AS _commit_version
      |  FROM src WHERE k % 5 = 0
      |  UNION ALL
      |  SELECT CAST(t.k AS BIGINT), CAST(NULL AS VARCHAR),
      |         CAST(NULL AS BIGINT), 'delete', CAST(3 AS BIGINT)
      |  FROM (VALUES (2), (33), (998244353)) t(k))""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val dir = s"${freshScratch("c71")}/wh"
    val src = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_orderstatus").cast("string").as("status"))
    AtomicWarehouse.commitEpoch(s, dir,
      src.withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some("k"), bloomKey = Some("k")) // v1
    AtomicWarehouse.commitEpoch(s, dir,
      src.where(col("k") % 5 === 0)
        .withColumn("status", concat(lit("UPD-"), col("status")))
        .withColumn("load_seq", lit(2L)), 2L,
      statsKey = Some("k"), bloomKey = Some("k")) // v2
    AtomicWarehouse.purgeKeysDeferred(s, dir, "k",
      Seq(33L, 2L, 998244353L)) // v3
    AtomicWarehouse.commitEpoch(s, dir,
      src.where(col("k") % 11 === 0)
        .withColumn("k", col("k") + 9000000L)
        .withColumn("load_seq", lit(4L)), 4L,
      statsKey = Some("k"), bloomKey = Some("k")) // v4
    s.sql(
      s"""SELECT k, status, load_seq, _change_type, _commit_version
         |FROM graft_table_changes('$dir', 2, 3)""".stripMargin)
  }

  /** C72 — `CALL whc.system.history('t')`: Delta's `DESCRIBE HISTORY`
    * shape — one row per retained manifest version, newest first, with
    * the commit instant (manifest mtime, the `_commit_timestamp`
    * derivation), a classified operation, and the added entry names.
    * The operational companion of the change feed: a consumer picks
    * its `startingVersion` from exactly this report. Timestamps and
    * entry names are wall-clock/UUID-bearing, so the ORACLE covers the
    * deterministic columns (version, operation) and the in-query
    * requires pin the rest (non-null, non-decreasing instants; one
    * added entry per version here). */
  val c72SqlCallHistory = q("c72_sql_call_history",
    """SELECT version, operation FROM (VALUES
      |  (CAST(3 AS BIGINT), 'purge (deferred)'),
      |  (CAST(2 AS BIGINT), 'sql insert'),
      |  (CAST(1 AS BIGINT), 'sql insert')) t(version, operation)""".stripMargin
  ) { (s, d) =>
    val root = freshScratch("c72")
    s.conf.set("spark.sql.catalog.whc72", "graft.sources.v2.WarehouseCatalog")
    s.conf.set("spark.sql.catalog.whc72.root", root)
    s.sql(
      """CREATE TABLE whc72.parts (k BIGINT, name STRING, load_seq BIGINT)
        |USING `graft-warehouse`
        |TBLPROPERTIES ('mergeKey'='k', 'statsKey'='k', 'bloomKey'='k')
        |""".stripMargin)
    Tables.part(s, d).select(
        col("p_partkey").cast("long").as("k"), col("p_name"))
      .createOrReplaceTempView("c72_src")
    s.sql("""INSERT INTO whc72.parts
            |SELECT k, p_name, CAST(1 AS BIGINT) FROM c72_src""".stripMargin)
    s.sql("""INSERT INTO whc72.parts
            |SELECT k, 'B-' || p_name, CAST(2 AS BIGINT)
            |FROM c72_src WHERE k % 3 = 0""".stripMargin)
    s.sql("CALL whc72.system.purge('parts', array('2', '5'))")
    val hist = s.sql("CALL whc72.system.history('parts')").collect()
    require(hist.length == 3 &&
      hist.map(_.getLong(0)).toSeq == Seq(3L, 2L, 1L),
      s"newest-first retained versions expected: ${hist.mkString(";")}")
    val ts = hist.map(_.getTimestamp(1).getTime).toSeq
    require(ts.forall(_ > 0L) && ts.zip(ts.tail).forall(p => p._1 >= p._2),
      s"commit instants must be non-null and non-decreasing: $ts")
    require(hist.forall(_.getString(3).split(",").length == 1),
      "each version here added exactly one entry")
    s.sql("CALL whc72.system.history('parts')")
      .select(col("version"), col("operation"))
  }

  /** C73 — CDC APPLY: the consumer loop closed end-to-end.
    * [[graft.ops.Merge.applyChangeFeed]] reduces the row-level feed to
    * the live state with exactly the engine's merge discipline — a
    * delete suppresses only inserts committed BEFORE it (`_pos`
    * ordering: key 2 is purged at v3 and RE-ADDED at v4, and the
    * re-add must win), then keyed last-wins by
    * `(load_seq DESC, _pos DESC)`. The oracle replays drops-then-merge
    * over the same 4-version history; an in-query tripwire pins the
    * applied state's row count to the engine's own snapshot read —
    * the "incremental mirror ≡ fresh read" contract that lets a
    * downstream keep a 100 TB copy current from O(delta) IO (the
    * reference re-reads its whole warehouse instead — ref:
    * Python-pipeline/ingestdatainbigquery.py:84-99). */
  val c73CdcApply = q("c73_cdc_apply_feed",
    """WITH src AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k,
      |         CAST(o_orderstatus AS VARCHAR) AS status FROM orders),
      |log AS (
      |  SELECT k, status, CAST(1 AS BIGINT) AS load_seq, 0 AS pos FROM src
      |  UNION ALL
      |  SELECT k, 'UPD-' || status, CAST(2 AS BIGINT), 1
      |  FROM src WHERE k % 5 = 0
      |  UNION ALL
      |  SELECT k + 9000000, status, CAST(4 AS BIGINT), 3
      |  FROM src WHERE k % 11 = 0
      |  UNION ALL
      |  SELECT CAST(2 AS BIGINT), 'REBORN', CAST(4 AS BIGINT), 3),
      |alive AS (
      |  SELECT * FROM log
      |  WHERE NOT (k IN (2, 33, 998244353) AND pos < 2))
      |SELECT k, status, load_seq FROM (
      |  SELECT k, status, load_seq,
      |         row_number() OVER (PARTITION BY k
      |           ORDER BY load_seq DESC, pos DESC) AS rn
      |  FROM alive) WHERE rn = 1""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val dir = s"${freshScratch("c73")}/wh"
    val src = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_orderstatus").cast("string").as("status"))
    AtomicWarehouse.commitEpoch(s, dir,
      src.withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some("k"), bloomKey = Some("k")) // v1, pos 0
    AtomicWarehouse.commitEpoch(s, dir,
      src.where(col("k") % 5 === 0)
        .withColumn("status", concat(lit("UPD-"), col("status")))
        .withColumn("load_seq", lit(2L)), 2L,
      statsKey = Some("k"), bloomKey = Some("k")) // v2, pos 1
    AtomicWarehouse.purgeKeysDeferred(s, dir, "k",
      Seq(2L, 33L, 998244353L)) // v3, pos 2
    AtomicWarehouse.commitEpoch(s, dir,
      src.where(col("k") % 11 === 0)
        .withColumn("k", col("k") + 9000000L)
        .withColumn("load_seq", lit(4L))
        .unionByName(s.range(1).select(lit(2L).as("k"),
          lit("REBORN").as("status"), lit(4L).as("load_seq"))),
      4L, statsKey = Some("k"), bloomKey = Some("k")) // v4, pos 3
    val feed = s.read.format("graft-warehouse").option("path", dir)
      .option("startingVersion", "1").option("readChangeFeed", "true")
      .load().select(col("*"), col("_pos"))
    val applied = graft.ops.Merge.applyChangeFeed(feed, "k")
      .select("k", "status", "load_seq")
    // incremental mirror ≡ fresh engine read (count tripwire; the
    // oracle hash is the row-level gate)
    require(applied.count() ==
      AtomicWarehouse.read(s, dir, "k").count(),
      "applied feed must reproduce the engine's snapshot")
    applied
  }

  /** C74 — SQL `UPDATE` on a warehouse catalog table, the
    * merge-on-read way ([[graft.plans.RewriteWarehouseUpdate]]): the
    * matched CURRENT WINNERS re-commit as one appended epoch at
    * maxLoadSeq+1 — O(matched), no table rewrite, arbitrary
    * deterministic predicates (an update only appends newer versions,
    * so unlike DELETE it needs no key addressing). Two stacked UPDATEs
    * prove the second reads the first's winners; the final SELECT is
    * the engine's own last-wins read, and the oracle replays
    * insert → update → update over the same rows.
    *
    * Scale: `UPDATE t SET price = price * 1.1 WHERE category = 'x'`
    * against a 100 TB store reads the pruned matched slice and writes
    * O(matched) — the Delta/Iceberg UPDATE story on the epoch log. */
  val c74SqlUpdate = q("c74_sql_update",
    """WITH src AS (
      |  SELECT CAST(p_partkey AS BIGINT) AS k, p_name AS name FROM part),
      |u1 AS (
      |  SELECT k, CASE WHEN k % 3 = 0 THEN 'X-' || name ELSE name END
      |           AS name FROM src),
      |u2 AS (
      |  SELECT k, CASE WHEN k % 6 = 0 THEN name || '!' ELSE name END
      |           AS name FROM u1)
      |SELECT k, name FROM u2""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val root = freshScratch("c74")
    s.conf.set("spark.sql.catalog.whc74", "graft.sources.v2.WarehouseCatalog")
    s.conf.set("spark.sql.catalog.whc74.root", root)
    s.conf.set("spark.sql.catalog.whc74.mergeKey", "k")
    val dir = s"$root/parts"
    AtomicWarehouse.commitEpoch(s, dir,
      Tables.part(s, d).select(col("p_partkey").cast("long").as("k"),
        col("p_name").as("name"), lit(1L).as("load_seq")), 1L,
      statsKey = Some("k"), bloomKey = Some("k"))
    s.sql("UPDATE whc74.parts SET name = concat('X-', name) WHERE k % 3 = 0")
    // stacked: matches rows the FIRST update rewrote (X-... at k%6=0)
    s.sql("UPDATE whc74.parts SET name = concat(name, '!') WHERE k % 6 = 0")
    val names = AtomicWarehouse.committedEpochs(s, dir)
    require(names.size == 3 && names.tail.forall(_.startsWith("update_v")),
      s"each UPDATE must append exactly one epoch: $names")
    s.sql(
      """SELECT k, name FROM (
        |  SELECT k, name,
        |         row_number() OVER (PARTITION BY k
        |           ORDER BY load_seq DESC, _pos DESC) AS rn
        |  FROM whc74.parts) WHERE rn = 1""".stripMargin)
  }

  /** C75 — SQL `DELETE` with an ARBITRARY predicate
    * ([[graft.plans.RewriteWarehouseDelete]]): shapes the key-identity
    * `SupportsDelete` path refuses are served by collecting the matched
    * CURRENT WINNERS' keys (driver-bounded — the deferred-purge
    * contract) into ONE tombstone commit. The predicate materializes to
    * keys AS OF execution (SQL semantics: later drains re-adding a
    * matching row are not retroactively deleted — pinned in the spec),
    * and the read applies the tombstone as a scan-time drop — zero
    * epoch rewrites. The oracle replays the delete as an anti-filter
    * over the same last-wins state.
    *
    * Scale: `DELETE WHERE category = 'spam'` on a 100 TB store reads
    * the pruned matched slice once and writes O(matched keys) of
    * metadata; the mass-deletion path (beyond the key cap) refuses
    * loudly toward purge → compact → vacuum. */
  val c75SqlDeletePredicate = q("c75_sql_delete_predicate",
    """WITH src AS (
      |  SELECT CAST(s_suppkey AS BIGINT) AS k, s_name AS name,
      |         CAST(s_acctbal AS DOUBLE) AS bal FROM supplier)
      |SELECT k, name, bal FROM src
      |WHERE NOT (bal < 500.0 OR k % 13 = 0)""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val root = freshScratch("c75")
    s.conf.set("spark.sql.catalog.whc75", "graft.sources.v2.WarehouseCatalog")
    s.conf.set("spark.sql.catalog.whc75.root", root)
    s.conf.set("spark.sql.catalog.whc75.mergeKey", "k")
    val dir = s"$root/sup"
    AtomicWarehouse.commitEpoch(s, dir,
      Tables.supplier(s, d).select(col("s_suppkey").cast("long").as("k"),
        col("s_name").as("name"), col("s_acctbal").cast("double").as("bal"),
        lit(1L).as("load_seq")), 1L,
      statsKey = Some("k"), bloomKey = Some("k"))
    s.sql("DELETE FROM whc75.sup WHERE bal < 500.0 OR k % 13 = 0")
    val names = AtomicWarehouse.committedEpochs(s, dir)
    require(names.exists(AtomicWarehouse.isTombstone) &&
      !names.exists(AtomicWarehouse.isPurgeRewrite),
      s"predicate DELETE must tombstone, never rewrite: $names")
    s.sql("SELECT k, name, bal FROM whc75.sup")
  }

  val all: Seq[Q] = Seq(c69RowChangeFeed, c70MetaMinMaxSuppressed,
    c71SqlTableChanges, c72SqlCallHistory, c73CdcApply, c74SqlUpdate,
    c75SqlDeletePredicate)
}
