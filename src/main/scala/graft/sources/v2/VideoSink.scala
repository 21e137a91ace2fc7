package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** The WRITE half of the `graft-videos` DSv2 connector — the engine
  * artifact for the reference's append-to-sheet path (ref:
  * Python-pipeline/dataingestion1.py:185-204 appends fetched rows to the
  * staging sheet; ingestdatainbigquery.py:49-76 loads them to the
  * warehouse), expressed as Spark's two-phase task/job commit protocol
  * plus a MANIFEST commit point:
  *
  *  - each TASK writes its partition to a hidden `.task_…` JSONL temp
  *    file and reports it in its commit message — speculative or retried
  *    attempts write distinct temps and only the committed attempt's
  *    file survives;
  *  - the JOB commit (driver, after every task committed) first renames
  *    the temps to durable `part-<job>-NNNNN.json` files — still
  *    INVISIBLE, because readers resolve the part set from the
  *    `_parts/v<N>.list` manifest, not the directory listing — then
  *    publishes manifest version N+1 (prior parts ∪ this job's, or just
  *    this job's under truncate) via [[PartManifest]]'s no-clobber CAS.
  *    That single manifest publish IS the commit point: a driver crash
  *    anywhere before it leaves only unreferenced part files that no
  *    reader ever sees (the prefix-of-parts-visible window Hadoop's
  *    FileOutputCommitter job commit has, closed the same way
  *    [[graft.sinks.AtomicWarehouse]] closes it), and concurrent append
  *    jobs serialize through the CAS instead of clobbering. `abort()`
  *    deletes reported temps, so a FAILED job leaves the destination
  *    exactly as it was. Unreferenced parts from a crashed commit are
  *    garbage a retention pass may collect; they cost listing bytes,
  *    never correctness.
  *
  * The JSONL part-file layout is exactly what [[VideoCatalog.load]]
  * already reads (it resolves the manifest when present and falls back
  * to listing for hand-written fixture dirs), so a directory written
  * here round-trips through the read connector (pushdown and all). A
  * production impl swaps the file I/O for the batch-append API call and
  * keeps the commit protocol. */
class VideoWriteBuilder(path: String, schema: StructType,
    crashAfterMoves: Int = -1)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new VideoBatchWrite(path, schema, doTruncate, crashAfterMoves)
  }
}

/** The versioned visible-part-set manifest under `<dir>/_parts`: one
  * `v<N>.list` file per committed job, newline-separated part names.
  * Publishing uses the same POSIX `link(2)` CAS as
  * [[graft.sinks.AtomicWarehouse]] (this connector is explicitly a
  * local-file fixture; the production swap keeps the protocol against
  * whatever conditional-write primitive the real store offers). */
object PartManifest {
  import java.nio.file.{Files, Path, Paths, StandardOpenOption}
  import scala.jdk.CollectionConverters._

  private def manifestDir(dir: Path): Path = dir.resolve("_parts")

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".list"))
      name.stripPrefix("v").stripSuffix(".list").toLongOption
    else None

  def currentVersion(dir: Path): Long = {
    val md = manifestDir(dir)
    if (!Files.isDirectory(md)) 0L
    else {
      val listing = Files.list(md)
      try listing.iterator().asScala
        .flatMap(p => versionOf(p.getFileName.toString)).foldLeft(0L)(math.max)
      finally listing.close()
    }
  }

  /** The committed part names, or None when the dir predates the
    * manifest protocol (hand-written fixtures) — the reader then falls
    * back to a directory listing. An EXISTING manifest with an empty
    * list means "committed empty" (a truncate), not "no manifest". */
  def committedParts(dir: Path): Option[Seq[String]] = {
    val v = currentVersion(dir)
    if (v == 0L) None
    else Some(Files.readAllLines(manifestDir(dir).resolve(s"v$v.list"))
      .asScala.map(_.trim).filter(_.nonEmpty).toSeq)
  }

  private val MaxAttempts = 16

  /** CAS-publish the next manifest: re-reads the current part set each
    * attempt, applies `compute`, links version N+1 into place. */
  def publish(dir: Path, compute: Seq[String] => Seq[String]): Unit = {
    Files.createDirectories(manifestDir(dir))
    var attempt = 0
    while (attempt < MaxAttempts) {
      val v = currentVersion(dir)
      val next = compute(committedParts(dir).getOrElse(Seq.empty))
      val tmp = manifestDir(dir).resolve(
        s".tmp_v${v + 1}_${java.util.UUID.randomUUID}")
      Files.write(tmp, next.mkString("\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE_NEW)
      val won =
        try {
          Files.createLink(manifestDir(dir).resolve(s"v${v + 1}.list"), tmp)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      Files.deleteIfExists(tmp)
      if (won) return
      attempt += 1
    }
    throw new java.io.IOException(
      s"part-manifest publish at $dir lost $MaxAttempts consecutive races")
  }
}

final case class VideoCommitMessage(tempFile: String) extends WriterCommitMessage

class VideoBatchWrite(path: String, schema: StructType, truncate: Boolean,
    crashAfterMoves: Int = -1) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new VideoWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    // job-unique part names: a racy count of existing files would let two
    // concurrent append jobs pick the same part number and the second
    // ATOMIC_MOVE (rename(2)) would silently replace the first job's file
    val job = java.util.UUID.randomUUID.toString.take(8)
    val parts = messages.zipWithIndex.map { case (m, i) =>
      if (i == crashAfterMoves) // test seam: driver dies mid-phase-1
        throw new RuntimeException(s"simulated driver crash after $i moves")
      val tmp = java.nio.file.Paths.get(m.asInstanceOf[VideoCommitMessage].tempFile)
      val name = f"part-$job%s-$i%05d.json"
      java.nio.file.Files.move(tmp, dir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      name
    }
    // the commit point: one CAS manifest publish makes the whole job's
    // parts visible at once (or replaces the set entirely under truncate)
    PartManifest.publish(dir,
      prior => if (truncate) parts.toSeq else prior ++ parts)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // job failed: delete every temp any task reported; tasks that never
    // committed cleaned their own temp in DataWriter.abort. Temps already
    // moved by a crashed commit are unreferenced (no manifest lists them)
    // and therefore invisible — garbage, not a torn append.
    messages.filter(_ != null).foreach { m =>
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(m.asInstanceOf[VideoCommitMessage].tempFile))
    }
  }
}

class VideoWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new VideoDataWriter(path, schema, partitionId, taskId)
}

/** Per-task writer: serializes rows to a hidden temp JSONL file named by
  * (partition, task attempt) so concurrent attempts never collide; the
  * task-level `commit` hands the temp to the driver, `abort` removes it. */
class VideoDataWriter(path: String, schema: StructType, partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {
  private val dir = java.nio.file.Paths.get(path)
  java.nio.file.Files.createDirectories(dir)
  private val tmp = dir.resolve(f".task_$partitionId%05d_$taskId%d.jsonl")
  private val out = java.nio.file.Files.newBufferedWriter(tmp,
    java.nio.charset.StandardCharsets.UTF_8)
  private val fieldIdx = schema.fieldNames.zipWithIndex.toMap

  // RFC 8259-complete string escape: backslash, quote, and every control
  // char below 0x20 — a raw newline/tab in a title would otherwise split
  // the JSONL record across physical lines and break the line-oriented
  // reader ([[VideoCatalog.load]]) on the dangling fragment
  private def jsonStr(s: String): String =
    if (s == null) "null"
    else "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  override def write(row: InternalRow): Unit = {
    def str(name: String): String = fieldIdx.get(name) match {
      case Some(i) if !row.isNullAt(i) => row.getUTF8String(i).toString
      case _ => null
    }
    val seq = fieldIdx.get("ingest_seq") match {
      case Some(i) if !row.isNullAt(i) => row.getLong(i)
      case _ => 0L
    }
    out.write(s"""{"video_id":${jsonStr(str("video_id"))},""" +
      s""""video_title":${jsonStr(str("video_title"))},""" +
      s""""published_at":${jsonStr(str("published_at"))},""" +
      s""""channel_id":${jsonStr(str("channel_id"))},""" +
      s""""ingest_seq":$seq}""")
    out.newLine()
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    VideoCommitMessage(tmp.toString)
  }

  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(tmp)
  }

  override def close(): Unit = ()
}
