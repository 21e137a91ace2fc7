package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-16 widening, part 87: the two interaction surfaces round 15
  * left open — the change feed ACROSS a column-mapping directive (where
  * Delta's id-mapping has historically had bugs) and delete preimages
  * on the COPY-ON-WRITE purge path (c86 covered deferred tombstones
  * only). Reference tie: the staging sheet's positional headers (ref:
  * Python-pipeline/ingestdatainbigquery.py:37-46) are exactly what a
  * rename breaks there; here it is one metadata directive and every
  * consumer — snapshot, time travel, change feed — keeps working. */
object Extended87 {

  /** C87 — the row-level CHANGE FEED read ACROSS a rename directive:
    * epochs committed BEFORE `ALTER TABLE RENAME COLUMN` serve their
    * rows under the NEW logical name (per-file physical resolution, the
    * same id-mapping the snapshot read uses), epochs after serve
    * as-written, a post-rename SQL DELETE's key-only retraction rows
    * interleave with `_change_type`/`_commit_version` intact, and time
    * travel BEFORE the directive still serves the ORIGINAL shape. This
    * is the pin VERDICT r15 called out: a feed range mixing directive +
    * compaction REFUSES (folded-out entries would bypass the mapping),
    * but a plain directive inside the range must serve mapped — the
    * alternative is a feed whose column names depend on when the
    * consumer happened to start reading.
    *
    * Scale: the mapping rides the existing per-file (renames, masked)
    * resolution — O(directives) metadata per partition, zero data I/O
    * added to the feed. */
  val c87ColmapChangeFeed = q("c87_colmap_change_feed",
    """WITH src AS (
      |  SELECT CAST(s_suppkey AS BIGINT) AS k, s_name AS name
      |  FROM supplier)
      |SELECT k, label, load_seq, _change_type, _commit_version FROM (
      |  SELECT k, name AS label, CAST(1 AS BIGINT) AS load_seq,
      |         'insert' AS _change_type,
      |         CAST(1 AS BIGINT) AS _commit_version
      |  FROM src
      |  UNION ALL
      |  SELECT k, 'U-' || name, CAST(2 AS BIGINT), 'insert',
      |         CAST(3 AS BIGINT)
      |  FROM src WHERE k % 4 = 0
      |  UNION ALL
      |  SELECT k, CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
      |         'delete', CAST(4 AS BIGINT)
      |  FROM src WHERE k % 6 = 0)""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val root = freshScratch("c87")
    s.conf.set("spark.sql.catalog.whc87", "graft.sources.v2.WarehouseCatalog")
    s.conf.set("spark.sql.catalog.whc87.root", root)
    s.conf.set("spark.sql.catalog.whc87.mergeKey", "k")
    val dir = s"$root/t"
    val src = Tables.supplier(s, d).select(
      col("s_suppkey").cast("long").as("k"), col("s_name").as("name"))
    AtomicWarehouse.commitEpoch(s, dir,
      src.withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some("k"), bloomKey = Some("k")) // v1: (k, name)
    s.sql("ALTER TABLE whc87.t RENAME COLUMN name TO label") // v2
    AtomicWarehouse.commitEpoch(s, dir,
      src.where(col("k") % 4 === 0)
        .select(col("k"), concat(lit("U-"), col("name")).as("label"),
          lit(2L).as("load_seq")), 2L,
      statsKey = Some("k"), bloomKey = Some("k")) // v3: new name
    s.sql("DELETE FROM whc87.t WHERE k % 6 = 0") // v4: deferred tombstone
    val feed = s.read.format("graft-warehouse").option("path", dir)
      .option("startingVersion", "1").option("readChangeFeed", "true")
      .load()
    // the feed serves the END version's mapped schema — never the raw
    // physical 'name' a pre-directive consumer would have pinned
    require(feed.columns.contains("label") && !feed.columns.contains("name"),
      s"feed must serve the mapped schema: ${feed.columns.toSeq}")
    // pre-rename epochs' rows arrive under the NEW name with payloads
    require(feed.where(col("_commit_version") === 1 &&
        col("label").isNull).isEmpty,
      "v1 rows must serve their physical 'name' values as 'label'")
    // rename-then-time-travel: v1 predates the directive — original shape
    require(s.sql("SELECT * FROM whc87.t VERSION AS OF 1").columns
      .toSeq.contains("name"), "v1 time travel must serve the old name")
    require(s.sql("SELECT * FROM whc87.t VERSION AS OF 3").columns
      .toSeq.contains("label"), "v3 time travel must serve the new name")
    feed.select(col("k"), col("label"), col("load_seq"),
      col("_change_type"), col("_commit_version"))
  }

  /** C88 — DELETE PREIMAGES on the COPY-ON-WRITE purge path (closing
    * c86's explicitly-documented gap): behind the same
    * `graft.delete.logPreimages` opt-in, [[graft.sinks.AtomicWarehouse
    * .purgeKeysImpl]] publishes the victims' current winner rows as a
    * `tombstone_noop_delpre_*` log in the SAME manifest CAS as the
    * rewrites — read BEFORE the swap destroys them, re-computed if the
    * manifest moved between the victims read and the winning CAS (the
    * same basis check the deferred path got this round). The feed
    * behind `includePreimages` serves them as FULL-PAYLOAD
    * `_change_type='delete'` rows REPLACING the purge log's key-only
    * rows; without the option the key-only log serves unchanged
    * (pinned in-query), and snapshot reads never open either.
    *
    * Scale: one bloom/zone-pruned merged read over the purged keys at
    * purge time — against rewrites that already cost O(affected
    * epochs) data I/O, the preimage read is the cheap part. */
  val c88CowDeletePreimages = q("c88_cow_delete_preimages",
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
    val root = freshScratch("c88")
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
      statsKey = Some("k"), bloomKey = Some("k")) // v2: winners move
    val victims = src.where(col("k") % 5 === 0)
      .select("k").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq
    s.conf.set("graft.delete.logPreimages", "true")
    try AtomicWarehouse.purgeKeys(s, dir, "k", victims,
      statsKey = Some("k"), bloomKey = Some("k")) // v3: CoW rewrite
    finally s.conf.unset("graft.delete.logPreimages")
    val names = AtomicWarehouse.committedEpochs(s, dir)
    require(names.exists(AtomicWarehouse.isDeletePreimageLog),
      s"the CoW purge must have committed a delete preimage log: $names")
    require(names.exists(n => AtomicWarehouse.isPurgeRewrite(n)),
      s"this must be the REWRITE path, not a tombstone: $names")
    // snapshot unchanged: rewrites already removed the rows; neither
    // the purge log nor the preimage log leaks into it
    require(AtomicWarehouse.read(s, dir, "k").count() ==
      src.where(col("k") % 5 =!= 0).count(),
      "snapshot must reflect the rewrite and skip both logs")
    def feed(pre: Boolean) = {
      val b = s.read.format("graft-warehouse").option("path", dir)
        .option("startingVersion", "1").option("readChangeFeed", "true")
      (if (pre) b.option("includePreimages", "true") else b).load()
    }
    val defDels = feed(false).where(col("_change_type") === "delete")
    require(defDels.where(col("name").isNotNull).isEmpty,
      "default CDF delete rows must stay key-only")
    val withPre = feed(true)
    val fullDels = withPre.where(col("_change_type") === "delete")
    require(fullDels.count() == defDels.count() &&
      fullDels.where(col("name").isNull).isEmpty,
      "includePreimages must serve one FULL-payload row per purged key")
    // a last-wins consumer over the full feed reproduces the snapshot
    require(graft.ops.Merge.applyChangeFeed(
      withPre.select(col("*"), col("_pos")), "k").count() ==
      src.where(col("k") % 5 =!= 0).count(),
      "applyChangeFeed over full-payload deletes must match the snapshot")
    withPre.select(col("k"), col("name"), col("load_seq"),
      col("_change_type"), col("_commit_version"))
  }

  val all: Seq[Q] = Seq(c87ColmapChangeFeed, c88CowDeletePreimages)
}
