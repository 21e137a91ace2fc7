package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType

/** The WRITE half of the `graft-videos` DSv2 connector — the engine
  * artifact for the reference's append-to-sheet path (ref:
  * Python-pipeline/dataingestion1.py:185-204 appends fetched rows to the
  * staging sheet; ingestdatainbigquery.py:49-76 loads them to the
  * warehouse), expressed as Spark's two-phase task/job commit protocol:
  *
  *  - each TASK writes its partition to a hidden `.task_…` JSONL temp
  *    file and reports it in its commit message — speculative or retried
  *    attempts write distinct temps and only the committed attempt's
  *    file survives;
  *  - the JOB commit (driver, after every task committed) renames the
  *    temps to visible `part-<job>-NNNNN.json` files; the job token makes
  *    the names unique, so CONCURRENT append jobs never clobber each
  *    other's parts. `abort()` deletes any temps, so a FAILED job leaves
  *    the destination exactly as it was. The residual window is a driver
  *    crash mid-way through the commit loop itself, which can leave a
  *    prefix of one job's parts visible — the same window Hadoop's
  *    FileOutputCommitter job commit has; closing it takes a manifest
  *    (see [[graft.sinks.AtomicWarehouse]] for that design). Still
  *    strictly better than the reference's scripts, where a crashed
  *    append leaves half a sheet AND a retry duplicates rows.
  *
  * The JSONL part-file layout is exactly what [[VideoCatalog.load]]
  * already reads, so a directory written here round-trips through the
  * read connector (pushdown and all). A production impl swaps the file
  * I/O for the batch-append API call and keeps the commit protocol. */
class VideoWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new VideoBatchWrite(path, schema, doTruncate)
  }
}

final case class VideoCommitMessage(tempFile: String) extends WriterCommitMessage

class VideoBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new VideoWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    if (truncate) { // overwrite semantics: drop prior parts atomically-ish
      val old = dir.toFile.listFiles()
      if (old != null) old.filter(_.getName.startsWith("part-")).foreach(_.delete())
    }
    // job-unique part names: a racy count of existing files would let two
    // concurrent append jobs pick the same part number and the second
    // ATOMIC_MOVE (rename(2)) would silently replace the first job's file
    val job = java.util.UUID.randomUUID.toString.take(8)
    messages.zipWithIndex.foreach { case (m, i) =>
      val tmp = java.nio.file.Paths.get(m.asInstanceOf[VideoCommitMessage].tempFile)
      java.nio.file.Files.move(tmp,
        dir.resolve(f"part-$job%s-$i%05d.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // job failed: delete every temp any task reported; tasks that never
    // committed cleaned their own temp in DataWriter.abort
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
