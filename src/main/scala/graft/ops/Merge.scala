package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** The CONSUMER side of the row-level change feed: reduce a
    * `readChangeFeed` DataFrame (insert rows + tombstone delete rows,
    * `_change_type`/`_pos`/`load_seq` aboard) to the LIVE state it
    * describes, with exactly the engine's merge discipline — a delete
    * suppresses every insert of its key committed BEFORE it
    * (`_pos` comparison, the manifest's tombstone ordering: a key
    * re-added after its purge survives), then keyed last-wins by
    * `(load_seq DESC, _pos DESC)`. Null keys never match a delete
    * (the engine's purge contract). Applying a feed this way yields
    * the same rows a fresh snapshot read serves — so an incremental
    * consumer can maintain a 100 TB mirror from O(delta) reads, the
    * loop the reference re-reads its whole warehouse for
    * (ref: Python-pipeline/ingestdatainbigquery.py:84-96).
    *
    * Scale shape: deletes are O(purged keys) (the purge contract) and
    * broadcast to the insert side — one anti-join, no shuffle of the
    * feed; the last-wins window shuffles once on the key, same as any
    * keyed merge. */
  def applyChangeFeed(feed: DataFrame, key: String): DataFrame = {
    require(Seq("_change_type", "_pos", "load_seq")
      .forall(feed.columns.contains),
      "applyChangeFeed needs _change_type, load_seq and the _pos " +
        "metadata column — select it on the feed read " +
        "(.select(col(\"*\"), col(\"_pos\")))")
    // 'update_postimage' (a SQL UPDATE's new row versions — Delta CDF's
    // typing) upserts exactly like an insert under last-wins: the
    // appended epoch IS the post-image. 'update_preimage' rows (served
    // behind includePreimages) are audit-only — a preimage is an OLD
    // version the feed also served as its original insert/postimage, so
    // merging it would be double-counting; ignored here (pinned).
    val inserts = feed.where(
      col("_change_type").isin("insert", "update_postimage"))
    // COMPOSITE key ("k1,k2"): delete rows carry every part column
    // populated; match on the engine's null-propagating rendering
    val parts = graft.sinks.AtomicWarehouse.keyParts(key)
    def keyExpr(d: org.apache.spark.sql.DataFrame) =
      if (parts.size == 1) d(key)
      else concat(parts.map(p => d(p).cast("string"))
        .flatMap(c => Seq(lit(graft.sinks.AtomicWarehouse.CompositeSep), c))
        .drop(1): _*)
    val dels = feed.where(col("_change_type") === "delete")
      .select(keyExpr(feed).as("__dk"), col("_pos").as("__dpos"))
    val alive = inserts.join(broadcast(dels),
      keyExpr(inserts) === col("__dk") && col("__dpos") > col("_pos"),
      "left_anti")
    val w = Window.partitionBy(parts.map(col): _*)
      .orderBy(col("load_seq").desc, col("_pos").desc)
    alive.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", "_change_type", "_commit_version", "_commit_timestamp",
        "_pos")
  }

  /** `foreachBatch` CONSUMER for a STREAMING change feed: apply one
    * micro-batch of CDC rows into a MIRROR warehouse so that the
    * mirror's merged read reproduces the source's snapshot —
    * warehouse→warehouse replication (Delta's "merge CDC into a
    * replica" pattern) as one call, the loop the reference re-reads
    * its whole warehouse for (ref: Python-pipeline/
    * ingestdatainbigquery.py:84-96) at O(delta) per trigger.
    *
    * Per batch: (1) the delete rows' keys purge the mirror as ONE
    * deferred tombstone — suppressing every mirror version from
    * EARLIER batches, which is exactly the source's contract (a delete
    * retracts only rows committed before it); (2) the batch's
    * surviving winners ([[applyChangeFeed]] — intra-batch delete →
    * re-add ordering resolved by `_pos`) commit as ONE epoch AFTER the
    * tombstone, so same-batch re-adds survive it. Rows keep their
    * SOURCE `load_seq`, so the mirror's (load_seq DESC, _pos DESC)
    * read ranks versions exactly as the source read does.
    *
    * EXACTLY-ONCE under foreachBatch retries: the epoch commits under
    * `cdc_b<batchId>` (name-converged replay), and a batch whose epoch
    * already exists returns BEFORE re-purging — re-purging after the
    * commit would order a fresh tombstone ABOVE the batch's re-adds
    * and wrongly retract them. The epoch commits UNCONDITIONALLY —
    * a delete-only batch commits a ZERO-ROW epoch (the read path
    * treats recorded-empty entries as no data files) — so EVERY
    * applied batch leaves its marker: without it, a delete-only batch
    * was fully re-applied on every replay, stacking redundant
    * tombstones (semantically no-op, manifest/compaction bloat)
    * whenever another commit landed between the attempts. A retry
    * that crashed between purge and commit re-purges (one redundant
    * tombstone of the same keys — a no-op on the merged read, and
    * name-converged when the mirror is otherwise quiet) and then
    * commits.
    *
    * Scale: delete keys are O(purged keys) by the purge contract —
    * driver-collected exactly like every tombstone key list, and
    * BOUNDED by the same `graft.delete.maxKeys` discipline as the
    * predicate-DELETE path (a micro-batch spanning many source
    * versions stacks several tombstones' keys, so the upstream
    * per-tombstone cap alone does not bound this collect); the
    * winners write is O(batch); NOTHING rescans the mirror. */
  def replicateChangeFeedBatch(batch: DataFrame, batchId: Long,
      mirrorDir: String, key: String): Unit = {
    import graft.sinks.AtomicWarehouse
    val spark = batch.sparkSession
    val epochName = s"cdc_b$batchId"
    if (AtomicWarehouse.currentVersion(spark, mirrorDir) > 0 &&
        AtomicWarehouse.committedEpochs(spark, mirrorDir)
          .contains(epochName)) return // replayed batch: fully applied
    val keyPartsSeq = graft.sinks.AtomicWarehouse.keyParts(key)
    def typOf(part: String) = batch.schema(part).dataType match {
      case org.apache.spark.sql.types.StringType => "string"
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => "long"
      case other => throw new UnsupportedOperationException(
        s"CDC mirror key part '$part' has unsupported type ${other.sql}: " +
          "tombstone key lists are typed integral-or-string (fractional " +
          "and complex keys have no canonical rendering for the purge " +
          "anti-join) — cast the key upstream")
    }
    // composite keys ("k1,k2") purge by the engine's null-propagating
    // string rendering; single keys by their column's type
    val keyTyp =
      if (keyPartsSeq.size > 1) { keyPartsSeq.foreach(typOf); "string" }
      else typOf(key)
    val delKeyExpr =
      if (keyPartsSeq.size == 1) col(key).cast("string")
      else concat(keyPartsSeq.map(p => col(p).cast("string"))
        .flatMap(c => Seq(lit(graft.sinks.AtomicWarehouse.CompositeSep), c))
        .drop(1): _*)
    val maxKeys = spark.conf.get("graft.delete.maxKeys", "100000").toInt
    val delKeys = batch.where(col("_change_type") === "delete")
      .select(delKeyExpr.as("__dk")).where(col("__dk").isNotNull)
      .distinct().limit(maxKeys + 1)
      .collect().map(_.getString(0)).toSeq
    if (delKeys.size > maxKeys)
      throw new IllegalStateException(
        s"CDC mirror batch $batchId carries more than $maxKeys delete " +
          "keys (graft.delete.maxKeys) — tombstone key lists are " +
          "driver-sized by the deferred-purge contract. Bound the " +
          "batch (.option(\"maxVersionsPerBatch\", n) on the feed) or " +
          "raise the cap if the driver can hold the list.")
    if (delKeys.nonEmpty &&
        AtomicWarehouse.currentVersion(spark, mirrorDir) > 0)
      AtomicWarehouse.purgeKeysDeferredTyped(spark, mirrorDir, key,
        keyTyp, delKeys)
    val winners = applyChangeFeed(batch, key)
    AtomicWarehouse.commitNamedEpoch(spark, mirrorDir, winners,
      epochName, batchId, statsKey = Some(key), bloomKey = Some(key))
  }
}
