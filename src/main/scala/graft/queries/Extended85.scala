package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-15 widening, part 85: the change feed's FULL Delta-CDF DELETE
  * contract — full-row delete preimages. The reference drops staging
  * rows it has finished promoting (ref: Python-pipeline/
  * ingestdatainbigquery.py:84-96 re-loads the whole table instead); an
  * auditor of WHAT those deletions removed previously had to
  * time-travel to the pre-delete version and join the key list. */
object Extended85 {

  /** C86 — deferred purges record the victims' CURRENT WINNER rows in
    * a DELETE PREIMAGE LOG (`graft.delete.logPreimages`,
    * [[graft.sinks.AtomicWarehouse.purgeKeysDeferredTyped]] — one
    * manifest CAS commits preimage log + tombstone together), and the
    * row-level change feed serves them as FULL-PAYLOAD
    * `_change_type='delete'` rows behind
    * `.option("includePreimages", true)` — Delta CDF's full delete
    * contract. The served log REPLACES its tombstone's key-only rows
    * (serving both would double the deletes); feeds WITHOUT the option
    * serve the key-only rows unchanged (pinned in-query), and
    * [[graft.ops.Merge.applyChangeFeed]] suppresses by `_pos` exactly
    * as before — full-payload delete rows merge identically (pinned:
    * applying the preimage-bearing feed reproduces the snapshot). The
    * log rides the `tombstone_noop_` namespace, so snapshot reads,
    * drop lists, metadata COUNT/MIN-MAX and maxLoadSeq skip it with
    * zero new code paths.
    *
    * Scale: the preimage write is ONE bloom/zone-pruned merged read
    * over the purged keys — the same O(affected epochs) slice the
    * tombstone's suppression-count stat already scans; reads that
    * don't ask for preimages never open the log (classification is by
    * NAME at planning time, zero data I/O). */
  val c86DeletePreimageFeed = q("c86_delete_preimage_feed",
    """WITH src AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS name
      |  FROM customer)
      |SELECT k, name, load_seq, _change_type, _commit_version FROM (
      |  SELECT k, name, CAST(1 AS BIGINT) AS load_seq,
      |         'insert' AS _change_type,
      |         CAST(1 AS BIGINT) AS _commit_version
      |  FROM src
      |  UNION ALL
      |  SELECT k, 'U-' || name, CAST(2 AS BIGINT), 'insert',
      |         CAST(2 AS BIGINT)
      |  FROM src WHERE k % 3 = 0
      |  UNION ALL
      |  SELECT k,
      |         CASE WHEN k % 3 = 0 THEN 'U-' || name ELSE name END,
      |         CASE WHEN k % 3 = 0 THEN CAST(2 AS BIGINT)
      |              ELSE CAST(1 AS BIGINT) END,
      |         'delete', CAST(3 AS BIGINT)
      |  FROM src WHERE k % 5 = 0)""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val root = freshScratch("c86")
    s.conf.set("spark.sql.catalog.whc86", "graft.sources.v2.WarehouseCatalog")
    s.conf.set("spark.sql.catalog.whc86.root", root)
    s.conf.set("spark.sql.catalog.whc86.mergeKey", "k")
    val dir = s"$root/t"
    val src = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("k"), col("c_name").as("name"))
    AtomicWarehouse.commitEpoch(s, dir,
      src.withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some("k"), bloomKey = Some("k")) // v1
    AtomicWarehouse.commitEpoch(s, dir,
      src.where(col("k") % 3 === 0)
        .withColumn("name", concat(lit("U-"), col("name")))
        .withColumn("load_seq", lit(2L)), 2L,
      statsKey = Some("k"), bloomKey = Some("k")) // v2: some winners move
    s.conf.set("graft.delete.logPreimages", "true")
    try s.sql("DELETE FROM whc86.t WHERE k % 5 = 0") // v3: log + tombstone
    finally s.conf.unset("graft.delete.logPreimages")
    val names = AtomicWarehouse.committedEpochs(s, dir)
    require(names.exists(AtomicWarehouse.isDeletePreimageLog),
      s"the DELETE must have committed a delete preimage log: $names")
    // the log is invisible outside the CDF read: snapshot content intact
    require(AtomicWarehouse.read(s, dir, "k").count() ==
      src.where(col("k") % 5 =!= 0).count(),
      "snapshot must apply the tombstone and skip the preimage log")
    def feed(pre: Boolean) = {
      val b = s.read.format("graft-warehouse").option("path", dir)
        .option("startingVersion", "1").option("readChangeFeed", "true")
      (if (pre) b.option("includePreimages", "true") else b).load()
    }
    // default unchanged: key-only delete rows (payload columns null)
    val defDels = feed(false).where(col("_change_type") === "delete")
    require(defDels.where(col("name").isNotNull).isEmpty,
      "default CDF delete rows must stay key-only")
    // behind the option: full payloads, the tombstone's key rows replaced
    val withPre = feed(true)
    val fullDels = withPre.where(col("_change_type") === "delete")
    require(fullDels.count() == defDels.count() &&
      fullDels.where(col("name").isNull).isEmpty,
      "includePreimages must serve one FULL-payload row per deleted key")
    // a last-wins consumer over the full-payload feed reproduces the
    // engine's snapshot exactly (delete suppression is _pos-driven)
    require(graft.ops.Merge.applyChangeFeed(
      withPre.select(col("*"), col("_pos")), "k").count() ==
      src.where(col("k") % 5 =!= 0).count(),
      "applyChangeFeed over full-payload deletes must match the snapshot")
    withPre.select(col("k"), col("name"), col("load_seq"),
      col("_change_type"), col("_commit_version"))
  }

  /** C85 — COLUMN MAPPING: `ALTER TABLE ... RENAME COLUMN` / `DROP
    * COLUMN` with ZERO data rewrites. A directive commits as a
    * manifest-only `colmap_*` entry; reads resolve each epoch's
    * PHYSICAL columns through the directives committed after it —
    * pre-rename epochs serve their values under the new name, dropped
    * values stay masked even if a later epoch re-adds the name (column
    * identity is positional, Delta's id-mapping semantics on manifest
    * positions). Round 14 closed the silent rename FORK by refusing
    * add+drop commits; this round gives rename/drop a real story. The
    * reference's staging sheet is positional — header renames are
    * exactly what it cannot survive (ref: Python-pipeline/
    * ingestdatainbigquery.py:37-46 sanitizes names for the same
    * reason).
    *
    * Scale: DDL is one manifest CAS (no data I/O at any table size);
    * reads carry an O(directives) per-entry resolution; compaction
    * materializes the mapping and the directives fold away. Streams
    * pinned before a directive refuse loudly (Delta's own streaming
    * restriction); pushed filters on renamed columns row-group-filter
    * old files under their physical name. */
  val c85ColumnMapping = q("c85_column_mapping",
    """WITH src AS (
      |  SELECT CAST(p_partkey AS BIGINT) AS k, p_name AS name FROM part)
      |SELECT k,
      |       CASE WHEN k % 4 = 0 THEN 'T-' || name ELSE name END AS title,
      |       CASE WHEN k % 4 = 0 THEN CAST(2 AS BIGINT)
      |            ELSE CAST(1 AS BIGINT) END AS load_seq
      |FROM src""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val root = freshScratch("c85")
    s.conf.set("spark.sql.catalog.whc85", "graft.sources.v2.WarehouseCatalog")
    s.conf.set("spark.sql.catalog.whc85.root", root)
    s.conf.set("spark.sql.catalog.whc85.mergeKey", "k")
    val dir = s"$root/t"
    val src = Tables.part(s, d).select(
      col("p_partkey").cast("long").as("k"), col("p_name").as("name"),
      col("p_type").as("kind"))
    AtomicWarehouse.commitEpoch(s, dir,
      src.withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some("k"), bloomKey = Some("k")) // v1: (k, name, kind)
    s.sql("ALTER TABLE whc85.t RENAME COLUMN name TO title") // v2: directive
    // post-rename drain commits the NEW name; both generations one column
    AtomicWarehouse.commitEpoch(s, dir,
      src.where(col("k") % 4 === 0)
        .select(col("k"), concat(lit("T-"), col("name")).as("title"),
          col("kind"), lit(2L).as("load_seq")), 2L,
      statsKey = Some("k"), bloomKey = Some("k")) // v3
    s.sql("ALTER TABLE whc85.t DROP COLUMN kind") // v4: projection mask
    require(s.table("whc85.t").columns.sorted.toSeq ==
      Seq("k", "load_seq", "title"),
      s"mapped schema must be (k, title, load_seq): " +
        s"${s.table("whc85.t").columns.toSeq}")
    // the connector serves the LOG view (its documented contract); a SQL
    // consumer's own last-wins window over it — THROUGH the mapping —
    // must reproduce the engine's merged read exactly
    val out = s.sql(
      """SELECT k, title, load_seq FROM (
        |  SELECT k, title, load_seq,
        |         row_number() OVER (PARTITION BY k
        |                            ORDER BY load_seq DESC, _pos DESC) rn
        |  FROM whc85.t) WHERE rn = 1""".stripMargin)
    val engine = AtomicWarehouse.read(s, dir, "k")
      .select("k", "title", "load_seq")
    require(out.exceptAll(engine).isEmpty && engine.exceptAll(out).isEmpty,
      "connector log view + window must equal the engine's merged read")
    // a pushed filter on the RENAMED column reaches old parquet under
    // its physical name
    val probe = src.limit(1).collect().head
    require(s.sql(
      s"SELECT count(*) AS c FROM whc85.t WHERE title = '${
        probe.getString(1).replace("'", "''")}'").head.getLong(0) ==
      s.table("whc85.t").where(col("title") === probe.getString(1)).count(),
      "pushed filter on the renamed column must not change results")
    // time travel BEFORE the directives serves the original shape
    require(s.sql("SELECT * FROM whc85.t VERSION AS OF 1").columns
      .contains("name"), "v1 time travel must predate the rename")
    out
  }

  val all: Seq[Q] = Seq(c85ColumnMapping, c86DeletePreimageFeed)
}
