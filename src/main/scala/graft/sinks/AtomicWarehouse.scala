package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Atomic-commit warehouse — the transactionality the reference's BigQuery
  * sink gets for free (ref: Python-pipeline/ingestdatainbigquery.py:49-99:
  * each load job + the CREATE OR REPLACE dedup is atomic server-side) and
  * plain parquet directories lack: `Warehouse.drain`'s append→dedup→
  * truncate sequence has crash windows where the warehouse holds a
  * half-appended epoch or a half-rewritten dedup copy.
  *
  * Design (log-structured, the public Delta/Iceberg idea at its minimum):
  *
  *  - each drain writes its epoch's rows to an immutable delta dir
  *    `epoch_<seq>/` — O(epoch delta) I/O, never a full-warehouse rewrite;
  *  - a version manifest `_manifest/v<N>.json` lists the committed epoch
  *    dirs; committing = writing the next manifest to a temp name and
  *    ATOMICALLY renaming it into place (single-file rename is atomic on
  *    HDFS/posix/ABFS — the one primitive object stores and filesystems
  *    agree on). Readers resolve max(v<N>) and see only listed epochs: a
  *    crash before the rename leaves a dangling data dir that no reader
  *    ever sees, and re-running the drain overwrites it and commits —
  *    recovery is "run the same drain again", no dedup crutch;
  *  - the read path unions the committed epochs and applies the keyed
  *    last-wins merge (W2's exact window) — the same one-shuffle dedup
  *    the reference re-runs after every load, paid on read instead of
  *    rewriting the warehouse on every write. `Warehouse.compact` folds
  *    old epochs when the manifest grows long (epoch count, not data
  *    size, is the read-planning cost).
  *
  * Scale: commit cost is O(delta) + one tiny rename regardless of
  * warehouse size (the K6 append path rewrote nothing either, but its
  * idempotence depended on the W2 rewrite); read cost is scan + one
  * key shuffle, and at 100 TB the merge window partitions by the same
  * key the epochs would be bucketed on.
  */
object AtomicWarehouse {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) = s"$dir/_manifest"

  /** Highest committed manifest version, 0 if none. */
  def currentVersion(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val md = new Path(manifestDir(dir))
    if (!f.exists(md)) 0L
    else f.listStatus(md).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .foldLeft(0L)(math.max)
  }

  /** Committed epoch dir names, in commit order. */
  def committedEpochs(spark: SparkSession, dir: String): Seq[String] =
    committedEpochsAt(spark, dir, currentVersion(spark, dir))

  /** Epoch list as of a PAST manifest version — the time-travel read.
    * Version manifests are immutable once renamed into place, so any
    * historical snapshot stays reconstructable until a retention pass
    * deletes old manifests; data dirs are never rewritten, so no copy is
    * needed (the log-structured layout gives time travel for free). */
  def committedEpochsAt(spark: SparkSession, dir: String, v: Long): Seq[String] = {
    if (v == 0L) Seq.empty
    else {
      val p = new Path(s"${manifestDir(dir)}/v$v.json")
      val in = fs(spark, dir).open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      // manifest body: one epoch dir name per line (a json array without
      // a parser dependency — names are [A-Za-z0-9_]+)
      body.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    }
  }

  /** Snapshot read: union of committed epochs + keyed last-wins merge
    * (W2). Uncommitted epoch dirs are invisible by construction. */
  def read(spark: SparkSession, dir: String, key: String): DataFrame =
    readVersion(spark, dir, key, currentVersion(spark, dir))

  /** Time-travel read: the warehouse exactly as of manifest `version`. */
  def readVersion(spark: SparkSession, dir: String, key: String,
      version: Long): DataFrame = {
    val epochs = committedEpochsAt(spark, dir, version)
    require(epochs.nonEmpty, s"no committed epochs at $dir v$version")
    val union = epochs.map(e => spark.read.parquet(s"$dir/$e"))
      .reduce(_.unionByName(_))
    val w = Window.partitionBy(col(key)).orderBy(col("load_seq").desc)
    union.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Stage `df` as epoch `seq` and commit it atomically. Overwriting the
    * epoch dir first makes a re-run of a crashed commit converge; the
    * rename is the commit point. Committing an already-committed epoch is
    * a no-op (idempotent replay, the reference's re-load case). */
  def commitEpoch(spark: SparkSession, dir: String, df: DataFrame,
      seq: Long): Unit = {
    val epoch = s"epoch_$seq"
    val existing = committedEpochs(spark, dir)
    if (!existing.contains(epoch)) {
      // a committed epoch is immutable — only uncommitted (crashed or new)
      // epoch dirs are (re)written, so replaying a completed drain whose
      // truncate already emptied the staging can never clobber the data
      df.write.mode(SaveMode.Overwrite).parquet(s"$dir/$epoch")
      val next = currentVersion(spark, dir) + 1
      val f = fs(spark, dir)
      f.mkdirs(new Path(manifestDir(dir)))
      val tmp = new Path(s"${manifestDir(dir)}/.tmp_v$next")
      val out = f.create(tmp, true)
      try out.write((existing :+ epoch).mkString("\n").getBytes("UTF-8"))
      finally out.close()
      if (!f.rename(tmp, new Path(s"${manifestDir(dir)}/v$next.json")))
        throw new java.io.IOException(
          s"manifest commit race at $dir v$next — concurrent writer?")
    }
  }

  /** Full drain epoch against the atomic warehouse: sanitize/all-string
    * staging (F19/F20) → atomic epoch commit → staging truncate (K7).
    * Crash anywhere and re-running the same call converges: before the
    * manifest rename the epoch is invisible; after it, the epoch replay
    * no-ops and only the truncate re-runs. */
  def drain(spark: SparkSession, stagingDir: String, dir: String,
      seq: Long): Unit = {
    val staged = Warehouse.allString(
        Warehouse.sanitizeColumns(spark.read.parquet(stagingDir)))
      .withColumn("load_seq", lit(seq))
    commitEpoch(spark, dir, staged, seq)
    Warehouse.truncate(spark, stagingDir)
  }
}
