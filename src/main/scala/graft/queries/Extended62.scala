package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-6 widening, part 62: the warehouse becomes a first-class Spark
  * TABLE — the `graft-warehouse` DSv2 connector
  * ([[graft.sources.v2.WarehouseSource]]) serves the AtomicWarehouse
  * through `spark.read`/`spark.readStream`, so ordinary Catalyst
  * predicates drive the manifest's epoch pruning (zone maps, blooms,
  * hive partitions) instead of the explicit `readRange*` APIs — the
  * ergonomics the reference's warehouse gets from BigQuery server-side
  * (ref: Python-pipeline/ingestdatainbigquery.py:49-76: its WHERE
  * clauses prune without any API cooperation).
  */
object Extended62 {

  /** C40 — snapshot read THROUGH the connector + last-wins merge: two
    * epochs (full fetch, then a partial refetch of every 7th order)
    * committed with key zone maps, read back via
    * `spark.read.format("graft-warehouse")`, filtered by a PLAIN
    * `.where(k BETWEEN 100 AND 5000)` — which the connector absorbs for
    * epoch pruning while Spark keeps it residual row-level — then merged
    * by the usual last-wins window. The oracle replays both epochs
    * unpruned in DuckDB; any pruning unsoundness (a skipped epoch that
    * held an in-range version) would hash-mismatch.
    *
    * Scale: the filter reaches the MANIFEST before a single parquet
    * footer is opened — at 100 TB with time-windowed drains a key- or
    * date-windowed query opens O(window) epochs, and scan parallelism
    * stays file-granular (one InputPartition per parquet file), exactly
    * like the native source. */
  val c40ConnectorSnapshotMerge = q("c40_connector_snapshot_merge",
    """WITH e1 AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k,
      |         CAST(o_custkey AS BIGINT) AS cust,
      |         o_totalprice AS price, 'BASE' AS seg,
      |         CAST(1 AS BIGINT) AS load_seq
      |  FROM orders),
      |e2 AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k,
      |         CAST(o_custkey AS BIGINT) AS cust,
      |         o_totalprice AS price, 'REFETCH' AS seg,
      |         CAST(2 AS BIGINT) AS load_seq
      |  FROM orders WHERE o_orderkey % 7 = 0),
      |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
      |SELECT k, cust, price, seg, load_seq FROM (
      |  SELECT *, row_number() OVER (PARTITION BY k
      |                               ORDER BY load_seq DESC) AS rn
      |  FROM u) WHERE rn = 1 AND k BETWEEN 100 AND 5000""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val wh = freshScratch("c40") + "/wh"
    val base = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_custkey").cast("long").as("cust"),
      col("o_totalprice").as("price"))
    def ep(seq: Long, dfv: DataFrame, seg: String): Unit =
      AtomicWarehouse.commitEpoch(s, wh,
        dfv.withColumn("seg", lit(seg)).withColumn("load_seq", lit(seq)),
        seq, statsKey = Some("k"))
    ep(1L, base, "BASE")
    ep(2L, base.where(col("k") % 7 === 0), "REFETCH")
    val log = s.read.format("graft-warehouse").option("path", wh).load()
      .where(col("k").between(100, 5000))
    val w = Window.partitionBy(col("k")).orderBy(col("load_seq").desc)
    log.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .select("k", "cust", "price", "seg", "load_seq")
  }

  /** C41 — RUNTIME (join-driven) epoch pruning: the warehouse connector
    * sits on the probe side of a broadcast join against a small customer
    * dim; [[graft.sources.v2.WarehouseScan]] implements
    * SupportsRuntimeFiltering, so Spark's dynamic pruning can ship the
    * build side's key set into the scan AFTER planning and re-prune
    * epochs — Delta/Iceberg's dynamic file pruning at the epoch level
    * (WarehouseSourceSpec pins the filter()→plannedEpochs contract
    * directly). The hash-checked result is the join itself — correct
    * whether or not the optimizer chose to inject the runtime filter.
    *
    * Scale: at 100 TB this is the dimension-driven fact read — the
    * classic "orders of five customers" probe — touching only the epochs
    * whose zone map/bloom may hold those keys, with zero API
    * cooperation from the query author. */
  val c41ConnectorRuntimePrune = q("c41_connector_runtime_prune",
    """WITH fact AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k,
      |         CAST(o_custkey AS BIGINT) AS cust,
      |         o_totalprice AS price
      |  FROM orders),
      |dim AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS dk, c_name
      |  FROM customer WHERE c_custkey % 400 = 7)
      |SELECT k, cust, c_name, price
      |FROM fact JOIN dim ON cust = dk""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val wh = freshScratch("c41") + "/wh"
    val base = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_custkey").cast("long").as("cust"),
      col("o_totalprice").as("price"))
    // two key-ranged epochs so runtime IN-filters have something to skip
    AtomicWarehouse.commitEpoch(s, wh,
      base.where(col("k") % 2 === 0).withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some("cust"), bloomKey = Some("cust"))
    AtomicWarehouse.commitEpoch(s, wh,
      base.where(col("k") % 2 === 1).withColumn("load_seq", lit(2L)), 2L,
      statsKey = Some("cust"), bloomKey = Some("cust"))
    val fact = s.read.format("graft-warehouse").option("path", wh).load()
    val dim = Tables.customer(s, d)
      .where(col("c_custkey") % 400 === 7)
      .select(col("c_custkey").cast("long").as("dk"), col("c_name"))
    fact.join(broadcast(dim), fact("cust") === dim("dk"))
      .select("k", "cust", "c_name", "price")
  }

  /** C42 — the warehouse as a STREAMING SOURCE: `spark.readStream.format(
    * "graft-warehouse")` tails the manifest Delta-style — offsets are
    * manifest versions, batch 0 is the initial snapshot, each later
    * version's `epoch_*` additions become one micro-batch, and
    * compaction folds are SKIPPED (re-serving one would duplicate every
    * pre-fold row). The entry runs the full lifecycle: two drains →
    * AvailableNow tail into a parquet sink → compact + third drain →
    * RESUME from the same checkpoint → the sink holds each epoch's rows
    * exactly once (26 + 11 here, never the fold's re-served copies).
    * The oracle is the raw three-epoch log.
    *
    * Scale: the tail is the incremental-consumer contract a 100 TB
    * corpus store needs — downstream jobs see each drain once, with
    * exactly-once resume from the engine's checkpoint, and maintenance
    * compaction cannot double-feed them. Retention must exceed stream
    * lag ([[graft.sources.v2.WarehouseMicroBatchStream]]'s documented
    * contract). */
  val c42ConnectorManifestTail = q("c42_connector_manifest_tail",
    """WITH e AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k,
      |         CAST(o_custkey AS BIGINT) AS cust,
      |         CAST(1 + o_orderkey % 3 AS BIGINT) AS load_seq
      |  FROM orders WHERE o_orderkey BETWEEN 1 AND 2000)
      |SELECT k, cust, load_seq FROM e""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val root = freshScratch("c42")
    val (wh, out, ckpt) = (s"$root/wh", s"$root/out", s"$root/ck")
    val base = Tables.orders(s, d)
      .where(col("o_orderkey").between(1, 2000)).select(
        col("o_orderkey").cast("long").as("k"),
        col("o_custkey").cast("long").as("cust"))
    def ep(seq: Long): Unit = AtomicWarehouse.commitEpoch(s, wh,
      base.where(col("k") % 3 === (seq - 1))
        .withColumn("load_seq", lit(seq)), seq)
    def tailOnce(): Unit = {
      val q = s.readStream.format("graft-warehouse").option("path", wh)
        .load().select("k", "cust", "load_seq")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      require(!q.isActive, "warehouse tail did not drain in time")
    }
    ep(2L); ep(1L) // epoch seqs ≠ commit order: offsets are versions
    tailOnce()     // initial snapshot: epochs 2 and 1
    AtomicWarehouse.compact(s, wh, "k")
    ep(3L)
    tailOnce()     // resume: ONLY epoch_3 (the fold is skipped)
    s.read.parquet(out)
  }

  /** C43 — hive-partitioned epoch THROUGH the connector: an epoch
    * committed with `partitionBy("c_mktsegment")` keeps its hive layout;
    * the connector parses the `c_mktsegment=...` path segments, serves
    * the value back as a column, and a plain `.where` on it prunes at
    * the FILE level (only the matching subdir's files are planned —
    * WarehouseSourceSpec pins the planned-partition list). Two-level
    * pruning composes: the manifest skips epochs, the path skips files
    * inside surviving epochs.
    *
    * Scale: partition columns with bounded cardinality (segment, day
    * bucket) are exactly what a 100 TB warehouse partitions epochs by —
    * the predicate never lists, opens, or decodes the other 4/5 of the
    * epoch's files. */
  val c43ConnectorHivePartition = q("c43_connector_hive_partition",
    """SELECT CAST(c_custkey AS BIGINT) AS k, c_name, c_mktsegment,
      |       CAST(1 AS BIGINT) AS load_seq
      |FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val wh = freshScratch("c43") + "/wh"
    AtomicWarehouse.commitEpoch(s, wh,
      Tables.customer(s, d).select(
        col("c_custkey").cast("long").as("k"), col("c_name"),
        col("c_mktsegment"), lit(1L).as("load_seq")),
      1L, partitionBy = Seq("c_mktsegment"))
    s.read.format("graft-warehouse").option("path", wh).load()
      .where(col("c_mktsegment") === "BUILDING")
      .select("k", "c_name", "c_mktsegment", "load_seq")
  }

  /** C44 — SQL time travel through the CATALOG PLUGIN
    * ([[graft.sources.v2.WarehouseCatalog]]): the warehouse queried BY
    * NAME with Spark's own `VERSION AS OF` syntax — no paths, no format
    * strings, the exact ergonomics the reference's warehouse gets from
    * BigQuery (table-by-name + server-side time travel,
    * ingestdatainbigquery.py:49-76). The entry commits two epochs (the
    * second refetches every 5th customer), then one SQL statement joins
    * the CURRENT merged snapshot against `VERSION AS OF 1` per key —
    * the "what changed since the last load" audit a warehouse owner
    * actually runs. The oracle replays both versions in DuckDB.
    *
    * Scale: version resolution reads ONE manifest file; both sides of
    * the join ride the connector's pruning scan. Retention
    * ([[graft.sinks.AtomicWarehouse.vacuum]]) bounds travel depth. */
  val c44CatalogSqlTimeTravel = q("c44_catalog_sql_time_travel",
    """WITH v1 AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment AS seg
      |  FROM customer),
      |cur AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS k,
      |         CASE WHEN c_custkey % 5 = 0 THEN 'REFETCHED'
      |              ELSE c_mktsegment END AS seg
      |  FROM customer)
      |SELECT cur.k, cur.seg AS seg_now, v1.seg AS seg_v1,
      |       CAST(cur.seg <> v1.seg AS BOOLEAN) AS changed
      |FROM cur JOIN v1 ON cur.k = v1.k""".stripMargin) { (s, d) =>
    val root = freshScratch("c44")
    import graft.sinks.AtomicWarehouse
    val base = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("k"),
      col("c_mktsegment").as("seg"))
    AtomicWarehouse.commitEpoch(s, s"$root/cust",
      base.withColumn("load_seq", lit(1L)), 1L, statsKey = Some("k"))
    AtomicWarehouse.commitEpoch(s, s"$root/cust",
      base.where(col("k") % 5 === 0)
        .withColumn("seg", lit("REFETCHED"))
        .withColumn("load_seq", lit(2L)), 2L, statsKey = Some("k"))
    s.conf.set("spark.sql.catalog.whc44", "graft.sources.v2.WarehouseCatalog")
    s.conf.set("spark.sql.catalog.whc44.root", root)
    s.sql(
      """WITH cur AS (
        |  SELECT k, seg FROM (
        |    SELECT k, seg, row_number() OVER (PARTITION BY k
        |                     ORDER BY load_seq DESC) AS rn
        |    FROM whc44.cust) WHERE rn = 1),
        |v1 AS (SELECT k, seg FROM whc44.cust VERSION AS OF 1)
        |SELECT cur.k, cur.seg AS seg_now, v1.seg AS seg_v1,
        |       cur.seg <> v1.seg AS changed
        |FROM cur JOIN v1 ON cur.k = v1.k""".stripMargin)
  }

  /** C45 — the connector's WRITE half: two epochs drained through
    * `df.write.format("graft-warehouse")` — executor tasks stream
    * parquet parts into a hidden stage, the job commit drops
    * uncommitted-attempt leftovers, one dir rename + the manifest CAS
    * publish the epoch ([[graft.sources.v2.WarehouseSink]] /
    * [[graft.sinks.AtomicWarehouse.commitStagedEpoch]]) — then read
    * back MERGED through the same connector with a pruning filter. The
    * zone-map/bloom options ride the write (`statsKey`/`bloomKey`), so
    * connector-written epochs prune identically to commitEpoch's
    * (WarehouseSinkSpec pins the manifest stats; the abort/replay
    * crash matrix lives there too). The oracle replays both writes.
    *
    * Scale: the write IS the drain protocol — per-task streamed parts
    * (no partition buffering), O(1) renames, O(delta) stats — so
    * `df.write` from a 1000-executor job commits with the same atomic
    * all-or-nothing visibility as every other warehouse writer. */
  val c45ConnectorWrite = q("c45_connector_write",
    """WITH e1 AS (
      |  SELECT CAST(s_suppkey AS BIGINT) AS k, s_name,
      |         CAST(s_nationkey AS BIGINT) AS nat, 'BASE' AS src,
      |         CAST(1 AS BIGINT) AS load_seq
      |  FROM supplier),
      |e2 AS (
      |  SELECT CAST(s_suppkey AS BIGINT) AS k, s_name,
      |         CAST(s_nationkey AS BIGINT) AS nat, 'REFETCH' AS src,
      |         CAST(2 AS BIGINT) AS load_seq
      |  FROM supplier WHERE s_suppkey % 3 = 0),
      |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
      |SELECT k, s_name, nat, src, load_seq FROM (
      |  SELECT *, row_number() OVER (PARTITION BY k
      |                               ORDER BY load_seq DESC) AS rn
      |  FROM u) WHERE rn = 1 AND nat < 13""".stripMargin) { (s, d) =>
    val wh = freshScratch("c45") + "/wh"
    val base = Tables.supplier(s, d).select(
      col("s_suppkey").cast("long").as("k"), col("s_name"),
      col("s_nationkey").cast("long").as("nat"))
    def put(seq: Long, dfv: DataFrame, src: String): Unit =
      dfv.withColumn("src", lit(src)).withColumn("load_seq", lit(seq))
        .write.format("graft-warehouse")
        .option("path", wh).option("seq", seq.toString)
        .option("statsKey", "k").option("statsCols", "nat")
        .option("bloomKey", "k")
        .mode("append").save()
    put(1L, base, "BASE")
    put(2L, base.where(col("k") % 3 === 0), "REFETCH")
    val log = s.read.format("graft-warehouse").option("path", wh).load()
      .where(col("nat") < 13)
    val w = Window.partitionBy(col("k")).orderBy(col("load_seq").desc)
    log.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .select("k", "s_name", "nat", "src", "load_seq")
  }

  /** C46 — warehouse→warehouse INCREMENTAL REPLICATION, the connector
    * pieces composed into the cross-region pattern a 100 TB corpus
    * store actually runs: the connector STREAM tails the source
    * manifest one version per micro-batch (`maxVersionsPerBatch=1`),
    * and `foreachBatch` drains each batch into a TARGET warehouse
    * through the connector's WRITE half with `seq = batchId + 1` — the
    * batchId-keyed idempotence that makes a replayed batch converge on
    * the same epoch instead of double-loading (same contract as c19,
    * now through `df.write` instead of a hand-called sink API). The
    * hashed result is the target's log read back through the connector:
    * row-identical to the source's three epochs, whatever the batch
    * split did. The oracle replays the three drains.
    *
    * Scale: replication lag is bounded by drain cadence (one batch per
    * manifest version), each batch ships O(epoch delta), the target
    * commits with the same all-or-nothing visibility as any writer,
    * and a checkpoint-resumed replicator re-serves no epoch (c42's
    * exactly-once tail + this entry's idempotent write compose). */
  val c46WarehouseReplication = q("c46_warehouse_replication",
    """WITH e AS (
      |  SELECT CAST(p_partkey AS BIGINT) AS k, p_name,
      |         CAST(1 + p_partkey % 3 AS BIGINT) AS load_seq
      |  FROM part)
      |SELECT k, p_name, load_seq FROM e""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val root = freshScratch("c46")
    val (src, dst, ckpt) = (s"$root/src", s"$root/dst", s"$root/ck")
    val base = Tables.part(s, d).select(
      col("p_partkey").cast("long").as("k"), col("p_name"))
    for (seq <- 1L to 3L)
      AtomicWarehouse.commitEpoch(s, src,
        base.where(col("k") % 3 === (seq - 1))
          .withColumn("load_seq", lit(seq)), seq)
    val q = s.readStream.format("graft-warehouse").option("path", src)
      .option("maxVersionsPerBatch", "1")
      .load().select("k", "p_name", "load_seq")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.format("graft-warehouse")
          .option("path", dst).option("seq", (batchId + 1L).toString)
          .option("statsKey", "k")
          .mode("append").save()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    require(!q.isActive, "replication stream did not drain in time")
    s.read.format("graft-warehouse").option("path", dst).load()
      .select("k", "p_name", "load_seq")
  }

  /** C47 — `writeStream.format("graft-warehouse")` DIRECT: the engine's
    * own StreamingWrite path (no foreachBatch) commits ONE EPOCH PER
    * MICRO-BATCH at `seq = seqBase + epochId` — the replayable epochId
    * is the epoch identity, so a checkpoint-restarted batch converges
    * on its already-committed epoch (the same exactly-once contract as
    * c46, now with the ENGINE driving the two-phase commit: per-epoch
    * task staging, driver per-epoch publish). Source side tails a
    * warehouse one manifest version per batch; the hashed result is the
    * target's log — row-identical to the source's epochs regardless of
    * the batch split. Oracle replays the three drains.
    *
    * Scale: this is the zero-glue streaming drain — any Structured
    * Streaming pipeline ends in `.writeStream.format("graft-warehouse")`
    * and inherits atomic all-or-nothing epochs, idempotent restart, and
    * the manifest's pruning stats, with no sink code at all. */
  val c47StreamingWriteDirect = q("c47_streaming_write_direct",
    """WITH e AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS k, c_name,
      |         CAST(1 + c_custkey % 2 AS BIGINT) AS load_seq
      |  FROM customer)
      |SELECT k, c_name, load_seq FROM e""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val root = freshScratch("c47")
    val (src, dst, ckpt) = (s"$root/src", s"$root/dst", s"$root/ck")
    val base = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("k"), col("c_name"))
    for (seq <- 1L to 2L)
      AtomicWarehouse.commitEpoch(s, src,
        base.where(col("k") % 2 === (seq - 1))
          .withColumn("load_seq", lit(seq)), seq)
    val q = s.readStream.format("graft-warehouse").option("path", src)
      .option("maxVersionsPerBatch", "1")
      .load().select("k", "c_name", "load_seq")
      .writeStream.format("graft-warehouse")
      .option("path", dst).option("seqBase", "1")
      .option("statsKey", "k")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    require(!q.isActive, "streaming drain did not finish in time")
    s.read.format("graft-warehouse").option("path", dst).load()
      .select("k", "c_name", "load_seq")
  }

  /** C48 — ROW-LEVEL PURGE ([[graft.sinks.AtomicWarehouse.purgeKeys]]):
    * the right-to-be-forgotten / contaminated-document removal a
    * long-lived corpus store must run — every version of the purged
    * merge keys is removed by a SELECTIVE rewrite (only epochs whose
    * zone map/bloom may hold a key are rewritten, `<name>_p<V>` dirs)
    * swapped into the manifest by ONE CAS, so readers see the purge
    * all-or-nothing and untouched epochs keep their dirs byte-for-byte.
    * History still shows the rows until vacuum (purge + vacuum = the
    * compliance pair; PurgeSpec pins history, selectivity, null-key
    * safety and the stream-tail boundary contract). The hashed result
    * is the post-purge last-wins snapshot; the oracle replays both
    * epochs and filters the purged keys.
    *
    * Scale: purging k keys rewrites O(k) epochs out of thousands — the
    * same pruning stack reads use, pointed at the write side. Bloom
    * false positives cost a no-op rewrite (~1%), never a missed row. */
  val c48WarehousePurge = q("c48_warehouse_purge",
    """WITH e1 AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS k, c_name,
      |         c_mktsegment AS seg, CAST(1 AS BIGINT) AS load_seq
      |  FROM customer),
      |e2 AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS k, c_name,
      |         'REFETCHED' AS seg, CAST(2 AS BIGINT) AS load_seq
      |  FROM customer WHERE c_nationkey < 10),
      |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
      |SELECT k, c_name, seg, load_seq FROM (
      |  SELECT *, row_number() OVER (PARTITION BY k
      |                               ORDER BY load_seq DESC) AS rn
      |  FROM u) WHERE rn = 1
      |  AND NOT (k % 97 = 13 AND k < 3000)""".stripMargin) { (s, d) =>
    import graft.sinks.AtomicWarehouse
    val wh = freshScratch("c48") + "/wh"
    val base = Tables.customer(s, d).select(
      col("c_custkey").cast("long").as("k"), col("c_name"),
      col("c_mktsegment").as("seg"))
    AtomicWarehouse.commitEpoch(s, wh,
      base.withColumn("load_seq", lit(1L)), 1L,
      statsKey = Some("k"), bloomKey = Some("k"))
    val refetch = Tables.customer(s, d).where(col("c_nationkey") < 10)
      .select(col("c_custkey").cast("long").as("k"), col("c_name"),
        lit("REFETCHED").as("seg"), lit(2L).as("load_seq"))
    AtomicWarehouse.commitEpoch(s, wh, refetch, 2L,
      statsKey = Some("k"), bloomKey = Some("k"))
    // deterministic purge set, BOUNDED at every SF (k < 3000 caps the
    // driver-side key list — purgeKeys' contract is an O(keys) list,
    // the GDPR/decontamination shape, never a corpus-proportional one)
    val doomed = base.where(col("k") % 97 === 13 && col("k") < 3000)
      .select("k").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq
    AtomicWarehouse.purgeKeys(s, wh, "k", doomed,
      statsKey = Some("k"), bloomKey = Some("k"))
    AtomicWarehouse.read(s, wh, "k")
      .select("k", "c_name", "seg", "load_seq")
  }

  /** C49 — CLUSTERED epoch write + three-level pruned read: the sink
    * declares `RequiresDistributionAndOrdering` (Spark's own sorted-
    * table write API, what Iceberg's `SORTED BY` uses), so
    * `.option("clusterBy", "k")` makes the ENGINE range-partition and
    * sort the rows before the connector writes them — each part file
    * holds one tight key slice (WarehouseSinkSpec pins disjointness).
    * The read back drives all three pruning levels from one bare
    * predicate: manifest zone maps skip epochs, and inside the opened
    * files the pushed filter becomes a parquet row-group predicate
    * (FilterApi, approximation-downward translation) that skips
    * whole row groups — which the clustered layout makes maximally
    * effective (sorted file ⇒ disjoint row-group min/max). The oracle
    * replays the write declaratively; clustering must never change
    * membership, only layout.
    *
    * Scale: this is the write-side half of storage-level read
    * efficiency at 100 TB — clustered drains + stats manifests mean a
    * key/date-sliced query reads O(slice) row groups end-to-end, with
    * the sort paid once at ingest on the engine's shuffle, not per
    * query. */
  val c49ClusteredWrite = q("c49_clustered_write",
    """WITH e AS (
      |  SELECT CAST(o_orderkey AS BIGINT) AS k,
      |         CAST(o_custkey AS BIGINT) AS cust,
      |         o_totalprice AS price, CAST(1 AS BIGINT) AS load_seq
      |  FROM orders)
      |SELECT k, cust, price, load_seq FROM e
      |WHERE k BETWEEN 1000 AND 3000""".stripMargin) { (s, d) =>
    val wh = freshScratch("c49") + "/wh"
    Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_custkey").cast("long").as("cust"),
      col("o_totalprice").as("price"), lit(1L).as("load_seq"))
      .write.format("graft-warehouse")
      .option("path", wh).option("seq", "1")
      .option("clusterBy", "k").option("writePartitions", "8")
      .option("statsKey", "k")
      .mode("append").save()
    s.read.format("graft-warehouse").option("path", wh).load()
      .where(col("k").between(1000, 3000))
      .select("k", "cust", "price", "load_seq")
  }

  val all: Seq[Q] = Seq(c40ConnectorSnapshotMerge, c41ConnectorRuntimePrune,
    c42ConnectorManifestTail, c43ConnectorHivePartition,
    c44CatalogSqlTimeTravel, c45ConnectorWrite, c46WarehouseReplication,
    c47StreamingWriteDirect, c48WarehousePurge, c49ClusteredWrite)
}
