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

  /** Publish `tmp` as `dst` iff `dst` does not exist — the CAS primitive
    * under the manifest commit. Two branches, both public-semantics:
    *
    *  - `file://`: POSIX hard-link (`link(2)`) fails atomically with
    *    EEXIST when the destination exists — a true kernel-level CAS,
    *    which Hadoop's local rename is NOT (java `renameTo` maps to
    *    `rename(2)`, which silently clobbers, so two racing local writers
    *    would both "succeed" and one manifest would vanish);
    *  - everything else (HDFS/ABFS/...): `FileSystem.rename`, whose
    *    contract fails when the destination exists (on HDFS this is a
    *    namenode-atomic check — the same primitive Delta/Iceberg commit
    *    on).
    *
    * Returns false on a lost race; `tmp` is removed either way. */
  private def casPublish(f: org.apache.hadoop.fs.FileSystem, tmp: Path,
      dst: Path): Boolean = {
    val won =
      if (f.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else !f.exists(dst) && f.rename(tmp, dst)
    if (f.getScheme == "file" || !won) f.delete(tmp, false)
    won
  }

  /** Move the staged epoch DIRECTORY to its final name iff absent.
    * `FileSystem.rename` is the wrong primitive here: when the
    * destination dir already exists, the local implementation falls back
    * to copying the source INTO it (nesting a stage dir inside the epoch)
    * and HDFS renames into it likewise — so both branches use an API
    * whose exists-check refuses instead: `java.nio.Files.move` without
    * REPLACE_EXISTING locally, `FileContext.rename` (Rename.NONE
    * semantics) elsewhere. Returns false on a lost race. */
  private def publishDir(f: org.apache.hadoop.fs.FileSystem, stage: Path,
      dst: Path): Boolean =
    if (f.getScheme == "file") {
      try {
        java.nio.file.Files.move(
          java.nio.file.Paths.get(stage.toUri.getPath),
          java.nio.file.Paths.get(dst.toUri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException |
            _: java.nio.file.DirectoryNotEmptyException => false
      }
    } else {
      try {
        org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, f.getConf)
          .rename(stage, dst) // no Rename.OVERWRITE: fails if dst exists
        true
      } catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
    }

  private val MaxCommitAttempts = 16

  /** Stage `df` as epoch `seq` and commit it atomically. Overwriting the
    * epoch dir first makes a re-run of a crashed commit converge; the
    * manifest publish is the commit point. Committing an already-committed
    * epoch is a no-op (idempotent replay, the reference's re-load case).
    *
    * CONCURRENT writers are fenced: each attempt re-reads the latest
    * manifest, appends this epoch, and publishes version N+1 via a
    * no-clobber CAS ([[casPublish]]). A writer that loses the race retries
    * against the winner's manifest — so simultaneous drains of DIFFERENT
    * epochs serialize into a linear manifest chain with both epochs
    * listed (the tolerance the reference's warehouse gets from BigQuery's
    * server-side load jobs, ref: Python-pipeline/ingestdatainbigquery.py:
    * 49-76), and simultaneous replays of the SAME epoch converge to one
    * listing (the loser observes the epoch already committed and no-ops).
    * Persistent contention past [[MaxCommitAttempts]] fails loudly rather
    * than spinning. */
  def commitEpoch(spark: SparkSession, dir: String, df: DataFrame,
      seq: Long): Unit = {
    val epoch = s"epoch_$seq"
    if (committedEpochs(spark, dir).contains(epoch)) return
    val f = fs(spark, dir)
    // a committed epoch is immutable — only uncommitted (crashed or new)
    // epochs are (re)written, so replaying a completed drain whose
    // truncate already emptied the staging can never clobber the data.
    // The data itself is STAGED to a unique dir and renamed into place:
    // concurrent same-epoch replays then never write the same path (the
    // overwrite-in-place they'd otherwise race on), and whichever rename
    // lands first wins — same seq means same logical content by the
    // replay contract, so the loser just adopts the winner's dir.
    val stage = new Path(s"$dir/.stage_${epoch}_${java.util.UUID.randomUUID}")
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    val epochPath = new Path(s"$dir/$epoch")
    if (f.exists(epochPath) && !committedEpochs(spark, dir).contains(epoch))
      f.delete(epochPath, true) // crashed earlier attempt: stale, invisible
    if (!publishDir(f, stage, epochPath)) {
      // lost the dir race to a concurrent same-epoch writer
      f.delete(stage, true)
      if (!f.exists(epochPath))
        throw new java.io.IOException(
          s"failed to publish $epochPath and no concurrent writer did either")
    }
    f.mkdirs(new Path(manifestDir(dir)))
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      val v = currentVersion(spark, dir)
      val existing = committedEpochsAt(spark, dir, v)
      if (existing.contains(epoch)) return // a concurrent replay won
      val next = v + 1
      val tmp = new Path(
        s"${manifestDir(dir)}/.tmp_v${next}_${java.util.UUID.randomUUID}")
      val out = f.create(tmp, true)
      try out.write((existing :+ epoch).mkString("\n").getBytes("UTF-8"))
      finally out.close()
      if (casPublish(f, tmp, new Path(s"${manifestDir(dir)}/v$next.json")))
        return
      attempt += 1
    }
    throw new java.io.IOException(
      s"manifest commit at $dir lost $MaxCommitAttempts consecutive races " +
        s"for epoch $epoch — concurrent-writer storm or a stuck manifest dir")
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
