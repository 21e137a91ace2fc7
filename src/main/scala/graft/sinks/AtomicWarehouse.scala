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
  *    rewriting the warehouse on every write. [[compact]] folds committed
  *    epochs into one pre-merged dir when the manifest grows long (epoch
  *    count, not data size, is the read-planning cost), [[vacuum]] is the
  *    retention pass that finally destroys unreferenced history, and
  *    manifest entries carry optional min/max key stats so [[readRange]]
  *    can skip whole epochs (zone maps at the epoch level).
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

  /** One committed data dir in a manifest: its name plus optional
    * min/max KEY statistics (the per-epoch zone map that lets the range
    * read skip whole epochs — the file-skipping idea of Parquet row-group
    * stats lifted to the epoch level, where it prunes I/O *and* merge
    * input). Serialized as `name` or `name\tmin\tmax` — one line per
    * entry, backwards-compatible with stat-less manifests. */
  final case class EpochEntry(name: String, stats: Option[(Long, Long)]) {
    def line: String = stats match {
      case Some((mn, mx)) => s"$name\t$mn\t$mx"
      case None => name
    }
  }

  private object EpochEntry {
    def parse(l: String): EpochEntry = l.split('\t') match {
      case Array(n, mn, mx) => EpochEntry(n, Some((mn.toLong, mx.toLong)))
      case Array(n) => EpochEntry(n, None)
      case _ => throw new IllegalStateException(s"bad manifest line: $l")
    }
  }

  /** Epoch list as of a PAST manifest version — the time-travel read.
    * Version manifests are immutable once renamed into place, so any
    * historical snapshot stays reconstructable until a retention pass
    * deletes old manifests; data dirs are never rewritten, so no copy is
    * needed (the log-structured layout gives time travel for free). */
  def committedEpochsAt(spark: SparkSession, dir: String, v: Long): Seq[String] =
    committedEntriesAt(spark, dir, v).map(_.name)

  /** Manifest entries (names + optional key stats) as of version `v`. */
  def committedEntriesAt(spark: SparkSession, dir: String,
      v: Long): Seq[EpochEntry] = {
    if (v == 0L) Seq.empty
    else {
      val p = new Path(s"${manifestDir(dir)}/v$v.json")
      val in = fs(spark, dir).open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      body.linesIterator.map(_.trim).filter(_.nonEmpty)
        .map(EpochEntry.parse).toSeq
    }
  }

  /** Snapshot read: union of committed epochs + keyed last-wins merge
    * (W2). Uncommitted epoch dirs are invisible by construction. */
  def read(spark: SparkSession, dir: String, key: String): DataFrame =
    readVersion(spark, dir, key, currentVersion(spark, dir))

  /** Time-travel read: the warehouse exactly as of manifest `version`.
    * Epoch schemas may EVOLVE additively across drains (the reference's
    * sheet grows columns over time, K5's header-ensure): columns missing
    * from an older epoch surface as nulls, so old epochs never need a
    * rewrite when the schema widens. */
  def readVersion(spark: SparkSession, dir: String, key: String,
      version: Long): DataFrame = {
    val epochs = committedEpochsAt(spark, dir, version)
    require(epochs.nonEmpty, s"no committed epochs at $dir v$version")
    val union = epochs.map(e => spark.read.parquet(s"$dir/$e"))
      .reduce(_.unionByName(_, allowMissingColumns = true))
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
      seq: Long, statsKey: Option[String] = None): Unit = {
    val epoch = s"epoch_$seq"
    if (committedEpochs(spark, dir).contains(epoch)) return
    publishData(spark, dir, df, epoch)
    val stats = statsKey.flatMap(k => keyStats(spark, s"$dir/$epoch", k))
    commitManifest(spark, dir, s"epoch $epoch") { entries =>
      if (entries.exists(_.name == epoch)) None // a concurrent replay won
      else Some(entries :+ EpochEntry(epoch, stats))
    }
  }

  /** Min/max of `key` (as long) over a published data dir — the zone-map
    * stats embedded in its manifest entry. None for an empty epoch. */
  private def keyStats(spark: SparkSession, path: String,
      key: String): Option[(Long, Long)] = {
    val r = spark.read.parquet(path)
      .agg(min(col(key).cast("long")), max(col(key).cast("long"))).head()
    if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1)))
  }

  /** Write `df` to a unique hidden stage dir and move it to `$dir/$name`
    * with a fail-if-exists publish. Concurrent same-name writers never
    * touch the same path; whichever publish lands first wins and the
    * loser ADOPTS it (same name means same logical content by the replay
    * contract). A visible dst is never deleted when it looks complete —
    * the write lands in a hidden stage and moves into place with ONE
    * atomic dir rename, so any complete-looking `$dir/$name` is a full
    * publish, possibly a concurrent writer's whose manifest commit is
    * about to land; deleting it (the pre-round-5 behavior) could strand a
    * just-committed manifest pointing at nothing. Only a dst MISSING its
    * `_SUCCESS` marker (e.g. a crashed vacuum's partial recursive delete)
    * is replaced. */
  private def publishData(spark: SparkSession, dir: String, df: DataFrame,
      name: String): Unit = {
    val f = fs(spark, dir)
    val stage = new Path(s"$dir/.stage_${name}_${java.util.UUID.randomUUID}")
    df.write.mode(SaveMode.Overwrite).parquet(stage.toString)
    val dst = new Path(s"$dir/$name")
    def complete = f.exists(new Path(dst, "_SUCCESS"))
    if (f.exists(dst)) {
      if (complete) { f.delete(stage, true); return } // adopt
      f.delete(dst, true) // torn leftover (crashed delete): replace
    }
    if (!publishDir(f, stage, dst)) {
      // lost the dir race to a concurrent same-name writer
      f.delete(stage, true)
      if (!f.exists(dst))
        throw new java.io.IOException(
          s"failed to publish $dst and no concurrent writer did either")
    }
  }

  /** The manifest CAS loop shared by epoch commits and compaction: each
    * attempt re-reads the latest entries, asks `compute` for the next
    * manifest (None = nothing left to do), and publishes it as version
    * N+1 via [[casPublish]]; a lost race retries against the winner's
    * manifest. Persistent contention past [[MaxCommitAttempts]] fails
    * loudly rather than spinning. */
  private def commitManifest(spark: SparkSession, dir: String, what: String)(
      compute: Seq[EpochEntry] => Option[Seq[EpochEntry]]): Unit = {
    val f = fs(spark, dir)
    f.mkdirs(new Path(manifestDir(dir)))
    var attempt = 0
    while (attempt < MaxCommitAttempts) {
      val v = currentVersion(spark, dir)
      compute(committedEntriesAt(spark, dir, v)) match {
        case None => return
        case Some(entries) =>
          val next = v + 1
          val tmp = new Path(
            s"${manifestDir(dir)}/.tmp_v${next}_${java.util.UUID.randomUUID}")
          val out = f.create(tmp, true)
          try out.write(entries.map(_.line).mkString("\n").getBytes("UTF-8"))
          finally out.close()
          if (casPublish(f, tmp, new Path(s"${manifestDir(dir)}/v$next.json")))
            return
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"manifest commit at $dir lost $MaxCommitAttempts consecutive races " +
        s"for $what — concurrent-writer storm or a stuck manifest dir")
  }

  /** Fold every epoch committed as of now into ONE pre-merged dir. The
    * snapshot keeps each surviving row's original `load_seq`, so drains
    * that land after (or even DURING) the compaction still win the keyed
    * merge exactly as before — compaction changes read cost, never
    * results. Epochs committed concurrently with the fold are carried
    * over unfolded (the CAS loop re-reads them each attempt); replaying
    * an identical compaction no-ops. Old manifests still reference the
    * old epoch dirs, so time travel keeps working until [[vacuum]].
    *
    * Scale: this is the maintenance pass that keeps read planning O(1) in
    * drain count — the union stays a handful of dirs no matter how many
    * epochs ever landed, and the fold itself is one merge + one write of
    * the LIVE rows only (dead versions drop out). */
  def compact(spark: SparkSession, dir: String, key: String,
      statsKey: Option[String] = None): Unit = {
    val baseV = currentVersion(spark, dir)
    if (baseV == 0L) return
    val base = committedEntriesAt(spark, dir, baseV)
    if (base.size <= 1) return // nothing to fold
    val name = s"compact_v$baseV"
    publishData(spark, dir, readVersion(spark, dir, key, baseV), name)
    val stats = statsKey.flatMap(k => keyStats(spark, s"$dir/$name", k))
    commitManifest(spark, dir, s"compaction $name") { entries =>
      if (entries.exists(_.name == name)) None // identical fold already won
      else if (!entries.map(_.name).startsWith(base.map(_.name)))
        throw new java.io.IOException(
          s"concurrent compaction at $dir: manifest no longer extends v$baseV")
      else Some(EpochEntry(name, stats) +: entries.drop(base.size))
    }
  }

  /** Retention pass: keep the latest `retainVersions` manifests, delete
    * older ones, then delete every data dir no retained manifest
    * references. This is the ONLY operation that destroys history — until
    * it runs, every version stays time-travelable. Returns (manifests,
    * data dirs) deleted. Single-maintainer by contract (like any vacuum).
    *
    * Concurrent DRAINS are protected by the `graceMs` age gate: a drain
    * publishes its (visible) epoch dir BEFORE its manifest commit lands,
    * so an unreferenced-right-now dir may be an in-flight commit, not
    * garbage. Dirs younger than `graceMs` are skipped — the same
    * modification-time guard Iceberg's remove-orphan-files ships with and
    * for the same reason. Pass 0 only where no drain can be in flight
    * (tests, single-process batteries). */
  def vacuum(spark: SparkSession, dir: String, retainVersions: Int,
      graceMs: Long = 60L * 60 * 1000): (Int, Int) = {
    require(retainVersions >= 1, "must retain at least the current version")
    val f = fs(spark, dir)
    val cur = currentVersion(spark, dir)
    val minKeep = math.max(1L, cur - retainVersions + 1)
    val referenced = (minKeep to cur)
      .flatMap(v => committedEpochsAt(spark, dir, v)).toSet
    val droppedManifests = (1L until minKeep).count { v =>
      f.delete(new Path(s"${manifestDir(dir)}/v$v.json"), false)
    }
    val cutoff = System.currentTimeMillis() - graceMs
    val droppedDirs = f.listStatus(new Path(dir))
      .filter(_.isDirectory)
      .filter { st =>
        val n = st.getPath.getName
        n != "_manifest" && !n.startsWith(".") && !referenced.contains(n) &&
          st.getModificationTime <= cutoff
      }
      .count(st => f.delete(st.getPath, true))
    (droppedManifests, droppedDirs)
  }

  /** Range read with EPOCH SKIPPING: epochs whose manifest [min,max] key
    * stats don't intersect [lo,hi] are never opened — pruning the scan,
    * the union, and the merge shuffle in one stroke. Sound precisely
    * because the stats column IS the merge key: any epoch holding a
    * version of an in-range key covers that key in its stats, so every
    * epoch that could change an in-range winner is scanned (filter-then-
    * merge == merge-then-filter on the merge key — NOT true for other
    * columns, which is why the API ties stats and merge to one column).
    * Stat-less entries are scanned conservatively. */
  def readRange(spark: SparkSession, dir: String, key: String, lo: Long,
      hi: Long): DataFrame = {
    val entries = committedEntriesAt(spark, dir, currentVersion(spark, dir))
    require(entries.nonEmpty, s"no committed epochs at $dir")
    val scanned = scanListForRange(entries, lo, hi)
    // an empty scan list still needs a schema — the SAME evolved schema a
    // non-empty scan would produce, so read 0 rows of EVERY epoch (footer
    // reads only; one epoch alone could predate an additive widening and
    // make the result schema depend on whether anything matched)
    val union = (if (scanned.isEmpty)
        entries.map(e => spark.read.parquet(s"$dir/${e.name}").limit(0))
      else scanned.map(e => spark.read.parquet(s"$dir/${e.name}")))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    val w = Window.partitionBy(col(key)).orderBy(col("load_seq").desc)
    union.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .where(col(key).cast("long").between(lo, hi))
  }

  /** The epochs [[readRange]] would open for [lo,hi] — exposed so tests
    * can pin that disjoint epochs are genuinely skipped. */
  def scanListForRange(entries: Seq[EpochEntry], lo: Long,
      hi: Long): Seq[EpochEntry] =
    entries.filter(_.stats.forall { case (mn, mx) => mx >= lo && mn <= hi })

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
