package graft.sources.v2

import java.util.UUID
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import graft.sinks.AtomicWarehouse

/** The WRITE half of the `graft-warehouse` connector:
  *
  * {{{
  *   df.write.format("graft-warehouse")
  *     .option("path", whDir).option("seq", 7)
  *     .option("statsKey", "k").option("bloomKey", "k")
  *     .mode("append").save()
  * }}}
  *
  * drains `df` as epoch 7 through the SAME atomic commit protocol every
  * other writer uses ([[AtomicWarehouse.commitStagedEpoch]]): executor
  * tasks stream parquet parts into a hidden stage dir under the
  * warehouse, the job commit drops any uncommitted task attempt's
  * leftovers (only files named in task COMMIT messages survive — the
  * task-retry dedup the two-phase protocol exists for), moves the stage
  * into place with one atomic dir rename, and publishes the manifest via
  * the CAS loop. A crash anywhere before the manifest rename leaves the
  * warehouse exactly as it was; re-running the same write converges
  * (same-seq replay adopts the committed epoch and drops its stage).
  *
  * Zone-map/bloom options ride the write: `statsKey`/`statsCols`/
  * `bloomKey` feed the manifest entry exactly as commitEpoch's
  * parameters do, so epochs written through the connector prune
  * identically on read.
  *
  * Append-only by design: an epoch is an immutable delta, so
  * `mode("overwrite")` is refused by Spark itself (no SupportsTruncate)
  * — warehouse-wide rewrites are [[AtomicWarehouse.compact]]'s job, with
  * its own concurrency story.
  *
  * Executor-side encoding uses the public parquet-hadoop Group writer
  * (the mirror of [[WarehouseReaderFactory]]'s decoder): flat
  * long/int/string/double/float/boolean/date/timestamp(micros) columns,
  * refused loudly at PLANNING time otherwise. Scale: one part file per
  * task, streamed row-by-row (no buffering of the partition), stage →
  * epoch is one rename, manifest commit is O(delta stats); a production
  * deployment would swap the row writer for Spark's vectorized parquet
  * committer and keep the commit protocol unchanged. */
object WarehouseSink {

  /** Spark schema → parquet MessageType, the exact inverse of the read
    * side's decode table. */
  def messageType(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case LongType => Types.optional(INT64)
        case IntegerType => Types.optional(INT32)
        case StringType =>
          Types.optional(BINARY).as(LogicalTypeAnnotation.stringType())
        case DoubleType => Types.optional(DOUBLE)
        case FloatType => Types.optional(FLOAT)
        case BooleanType => Types.optional(BOOLEAN)
        case DateType =>
          Types.optional(INT32).as(LogicalTypeAnnotation.dateType())
        case TimestampType | TimestampNTZType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case other => throw new IllegalArgumentException(
          s"graft-warehouse cannot write column '${f.name}' of type $other" +
            " — warehouse epochs hold flat primitive columns only")
      }
      b.addField(t.named(f.name))
    }
    b.named("spark_schema")
  }
}

class WarehouseWriteBuilder(dir: String, info: LogicalWriteInfo)
    extends WriteBuilder {
  override def build(): Write = {
    val o = info.options()
    val seq = Option(o.get("seq")).flatMap(_.toLongOption).getOrElse(
      throw new IllegalArgumentException(
        "graft-warehouse writes require .option(\"seq\", <epoch number>) " +
          "— the epoch identity that makes replays idempotent"))
    WarehouseSink.messageType(info.schema()) // fail unsupported types NOW
    val statsCols = Option(o.get("statsCols")).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    new WarehouseWrite(dir, seq, info.schema(),
      Option(o.get("statsKey")), statsCols, Option(o.get("bloomKey")))
  }
}

class WarehouseWrite(dir: String, seq: Long, schema: StructType,
    statsKey: Option[String], statsCols: Seq[String],
    bloomKey: Option[String]) extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  private val stage = s"$dir/.stage_epoch_${seq}_${UUID.randomUUID}"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val spark = SparkSession.active
    val f = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new Path(stage))
    new WarehouseWriterFactory(stage, schema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val f = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val committed = messages.collect {
      case WhPartFile(Some(name)) => name
    }.toSet
    // drop failed/duplicate task attempts' parts: only files a task
    // COMMIT named are epoch data
    f.listStatus(new Path(stage)).foreach { st =>
      val n = st.getPath.getName
      if (!committed.contains(n) && n != "_SUCCESS")
        f.delete(st.getPath, false)
    }
    AtomicWarehouse.commitStagedEpoch(spark, dir, new Path(stage), seq,
      statsKey, statsCols, bloomKey)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(stage), true)
  }
}

final case class WhPartFile(name: Option[String]) extends WriterCommitMessage

class WarehouseWriterFactory(stage: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new WarehouseDataWriter(stage, schema, partitionId, taskId)
}

/** One parquet part per task, created LAZILY (an empty partition commits
  * no file) and named uniquely per attempt — a retried task's orphan is
  * dropped at job commit because only the committed attempt's name
  * reaches the driver. */
class WarehouseDataWriter(stage: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val fileName =
    f"part-$partitionId%05d-$taskId-${UUID.randomUUID}.parquet"
  private var writer: org.apache.parquet.hadoop.ParquetWriter[
    org.apache.parquet.example.data.Group] = _
  private var factory: SimpleGroupFactory = _

  private val appenders: Array[(org.apache.parquet.example.data.Group,
      InternalRow, Int) => Unit] =
    schema.fields.zipWithIndex.map { case (f, _) =>
      val n = f.name
      f.dataType match {
        case LongType | TimestampType | TimestampNTZType =>
          (g, r, i) => g.add(n, r.getLong(i))
        case IntegerType | DateType => (g, r, i) => g.add(n, r.getInt(i))
        case StringType => (g, r, i) =>
          g.add(n, Binary.fromConstantByteArray(r.getUTF8String(i).getBytes))
        case DoubleType => (g, r, i) => g.add(n, r.getDouble(i))
        case FloatType => (g, r, i) => g.add(n, r.getFloat(i))
        case BooleanType => (g, r, i) => g.add(n, r.getBoolean(i))
        case other => throw new IllegalStateException(
          s"unreachable: $other passed builder validation")
      }
    }

  private def open(): Unit = {
    val conf = new Configuration()
    val msg = WarehouseSink.messageType(schema)
    GroupWriteSupport.setSchema(msg, conf)
    factory = new SimpleGroupFactory(msg)
    writer = ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new Path(s"$stage/$fileName"), conf))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  override def write(row: InternalRow): Unit = {
    if (writer == null) open()
    val g = factory.newGroup()
    var i = 0
    while (i < appenders.length) {
      if (!row.isNullAt(i)) appenders(i)(g, row, i)
      i += 1
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    WhPartFile(if (writer == null) None else Some(fileName))
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    val conf = new Configuration()
    val p = new Path(s"$stage/$fileName")
    val f = p.getFileSystem(conf)
    if (f.exists(p)) f.delete(p, false)
  }

  override def close(): Unit = ()
}
