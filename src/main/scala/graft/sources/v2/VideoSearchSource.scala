package graft.sources.v2

import java.util.{Map => JMap}
import scala.collection.mutable.ArrayBuffer
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.pipeline.Schemas

/** DataSource V2 connector modeling the YouTube Search endpoint
  * (ref: Python-pipeline/dataingestion1.py:61-101). The reference pushes
  * its predicates into the API call (`publishedAfter/Before`,
  * `channelId`), requests only the needed part (`part="snippet"`), sorts
  * server-side (`order="date"`) and paginates 50/page — this connector
  * expresses exactly those as Catalyst-visible contracts:
  *
  *  - SupportsPushDownFilters: channel_id equality + published_at range
  *    become "API parameters" (applied source-side; Catalyst drops the
  *    residual Filter node for them);
  *  - SupportsPushDownRequiredColumns: column pruning = `part` selection;
  *  - one InputPartition per result PAGE (50 rows) = the pagination loop,
  *    giving scan parallelism a real API client would batch this way.
  *
  * Backing data is a JSON fixture (the hermetic stand-in for the HTTP
  * call); a production impl swaps `VideoCatalog.load` for the API client
  * and nothing else changes.
  */
class VideoSearchSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-videos"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.videoRaw
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft-videos requires .option(\"path\", <videos json>)")
    new VideoTable(path)
  }
}

final case class VideoRow(videoId: String, title: String, publishedAt: String,
    channelId: String, ingestSeq: Long)

/** The errors a real API client retries: HTTP 5xx / quota / socket — as
  * opposed to terminal ones (bad request, auth) that must fail the task. */
final class TransientApiError(msg: String) extends RuntimeException(msg)

/** Bounded retry with capped exponential backoff — the engine artifact
  * for the reference's sleep-and-refetch loop (ref: Python-pipeline/
  * dataprocessing.py:99-102 sleeps a fixed 100 s on quota errors and
  * refetches; Airflow adds `retries=1, retry_delay=5min` on top,
  * dags/Dashboard-pipeline.py:13-16). Living in the PARTITION READER —
  * executor-side, per page request — a transient failure costs one page
  * re-fetch, not a task (or whole-job) restart, and a persistent outage
  * surfaces as a normal task failure after `maxAttempts` so Spark's own
  * task-retry/alerting machinery takes over (the orchestration layer the
  * reference leaves to Airflow).
  *
  * Deterministic by design: attempts and delays are a pure function of
  * the attempt index (no jitter), so retried reads are reproducible —
  * jitter is the right production default but would make the fixture
  * tests timing-dependent; it belongs in config, not the algorithm. */
final case class RetryPolicy(maxAttempts: Int, backoffBaseMs: Long,
    backoffCapMs: Long) {
  require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")

  /** Delay before retry #`attempt` (0-based): base · 2^attempt, capped. */
  def delayMs(attempt: Int): Long =
    math.min(backoffCapMs, backoffBaseMs << math.min(attempt, 30))

  def run[T](what: String)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: TransientApiError =>
          attempt += 1
          if (attempt >= maxAttempts)
            throw new java.io.IOException(
              s"$what failed after $maxAttempts attempts: ${e.getMessage}", e)
          Thread.sleep(delayMs(attempt - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object RetryPolicy {
  val Default: RetryPolicy = RetryPolicy(4, 200L, 5000L)

  /** Read `retryMaxAttempts` / `retryBackoffMs` / `retryBackoffCapMs` +
    * the fault-injection knob `simulateTransientFailures` (first n page
    * fetches throw — the hermetic stand-in for a flaky endpoint). */
  def fromOptions(o: CaseInsensitiveStringMap): (RetryPolicy, Int) = (
    RetryPolicy(
      o.getInt("retryMaxAttempts", Default.maxAttempts),
      o.getLong("retryBackoffMs", Default.backoffBaseMs),
      o.getLong("retryBackoffCapMs", Default.backoffCapMs)),
    o.getInt("simulateTransientFailures", 0))
}

object VideoCatalog {
  /** Driver-side fixture load (the "HTTP call"). Accepts either a single
    * JSON-array file (hand-written spec fixtures) or a DIRECTORY of
    * JSON-Lines part files as produced executor-side by
    * `df.write.json(dir)` — the battery builds its corpus-sized fixtures
    * the latter way so no O(corpus) `collect()` ever reaches the driver. */
  def load(path: String): Seq[VideoRow] = {
    val f = new java.io.File(path)
    val files: Seq[java.io.File] =
      if (f.isDirectory)
        // a directory written through the DSv2 sink carries a _parts
        // manifest naming the COMMITTED part set — unreferenced parts
        // from a crashed job commit are invisible; fixture dirs without
        // a manifest fall back to the plain listing
        PartManifest.committedParts(f.toPath) match {
          case Some(parts) => parts.sorted.map(new java.io.File(f, _))
          case None =>
            f.listFiles().filter(_.getName.startsWith("part-"))
              .sortBy(_.getName).toSeq
        }
      else Seq(f)
    val mapper = new ObjectMapper()
    val out = ArrayBuffer.empty[VideoRow]
    def add(n: com.fasterxml.jackson.databind.JsonNode): Unit =
      out += VideoRow(
        n.path("video_id").asText(null),
        n.path("video_title").asText(null),
        n.path("published_at").asText(null),
        n.path("channel_id").asText(null),
        n.path("ingest_seq").asLong(0L))
    files.foreach { file =>
      val src = new String(
        java.nio.file.Files.readAllBytes(file.toPath), "UTF-8").trim
      if (src.isEmpty) ()
      else if (src.startsWith("[")) mapper.readTree(src).forEach(add(_))
      else src.linesIterator.map(_.trim).filter(_.nonEmpty)
        .foreach(l => add(mapper.readTree(l)))
    }
    out.toSeq
  }
}

class VideoTable(path: String) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-videos($path)"
  override def schema(): StructType = Schemas.videoRaw
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val (retry, simFailures) = RetryPolicy.fromOptions(options)
    new VideoScanBuilder(path, retry, simFailures,
      options.getInt("maxRowsPerBatch", 0))
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new VideoWriteBuilder(path, info.schema(),
      info.options().getInt("simulateCrashAfterMoves", -1))
}

class VideoScanBuilder(path: String, retry: RetryPolicy, simFailures: Int,
    maxRowsPerBatch: Int = 0)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownAggregates {
  import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder => V2SortOrder}
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = Schemas.videoRaw
  private var limit: Option[Int] = None
  private var topNDesc = false
  private var agg: Option[(Seq[String], Seq[String])] = None // (group cols, agg tags)

  /** COUNT(*) / MIN(published_at) / MAX(published_at), optionally grouped
    * by channel_id — the stats the "API" can answer without shipping rows
    * (the analytics-report shape of dataprocessing.py:87-97). Complete
    * pushdown: Spark plans NO aggregate of its own on top. */
  private def translate(a: Aggregation): Option[(Seq[String], Seq[String])] = {
    val groups = a.groupByExpressions.toSeq.map {
      case nr: NamedReference if nr.fieldNames.sameElements(Array("channel_id")) =>
        "channel_id"
      case _ => return None
    }
    val tags = a.aggregateExpressions.toSeq.map {
      case _: CountStar => "count"
      case m: Min => m.column match {
        case nr: NamedReference if nr.fieldNames.sameElements(Array("published_at")) =>
          "min_pub"
        case _ => return None
      }
      case m: Max => m.column match {
        case nr: NamedReference if nr.fieldNames.sameElements(Array("published_at")) =>
          "max_pub"
        case _ => return None
      }
      case _ => return None
    }
    Some((groups, tags))
  }

  override def supportCompletePushDown(a: Aggregation): Boolean =
    translate(a).isDefined
  override def pushAggregation(a: Aggregation): Boolean = {
    translate(a) match {
      case some @ Some(_) => agg = some; true
      case None => false
    }
  }

  private def supported(f: Filter): Boolean = f match {
    case EqualTo("channel_id", _: String) => true
    case GreaterThan("published_at", _: String) => true
    case GreaterThanOrEqual("published_at", _: String) => true
    case LessThan("published_at", _: String) => true
    case LessThanOrEqual("published_at", _: String) => true
    // the "API" never returns null ids/dates for matched rows; absorbing
    // the null guard keeps the scan residual-free, which is what lets a
    // later aggregate push down completely
    case IsNotNull("channel_id" | "published_at") => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(supported)
    filters.filterNot(supported) // residual: Spark evaluates these itself
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Bare LIMIT: the API's maxResults — fully handled source-side. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  /** ORDER BY published_at [ASC|DESC] LIMIT n: the API's `order=date` +
    * maxResults (dataingestion1.py:77-78) — the one sort the "server"
    * offers. Anything else stays in Spark. Fully pushed: Catalyst drops
    * its own Sort + Limit nodes entirely. */
  override def pushTopN(orders: Array[V2SortOrder], l: Int): Boolean =
    orders match {
      case Array(so) => so.expression match {
        case nr: NamedReference if nr.fieldNames.sameElements(Array("published_at")) =>
          limit = Some(l)
          topNDesc = so.direction == SortDirection.DESCENDING
          true
        case _ => false
      }
      case _ => false
    }
  override def isPartiallyPushed(): Boolean = false

  override def build(): Scan =
    new VideoScan(path, pushed, required, limit, topNDesc, agg, retry,
      simFailures, maxRowsPerBatch)
}

/** The pushed-filter evaluation shared by the batch scan and the
  * micro-batch stream — "API parameters" applied source-side. */
object VideoFilters {
  def keep(pushed: Array[Filter])(r: VideoRow): Boolean = pushed.forall {
    case EqualTo("channel_id", v: String) => r.channelId == v
    case GreaterThan("published_at", v: String) =>
      r.publishedAt != null && r.publishedAt > v
    case GreaterThanOrEqual("published_at", v: String) =>
      r.publishedAt != null && r.publishedAt >= v
    case LessThan("published_at", v: String) =>
      r.publishedAt != null && r.publishedAt < v
    case LessThanOrEqual("published_at", v: String) =>
      r.publishedAt != null && r.publishedAt <= v
    case IsNotNull("channel_id") => r.channelId != null
    case IsNotNull("published_at") => r.publishedAt != null
    case _ => true
  }
}

class VideoScan(path: String, pushed: Array[Filter], required: StructType,
    limit: Option[Int], topNDesc: Boolean,
    agg: Option[(Seq[String], Seq[String])] = None,
    retry: RetryPolicy = RetryPolicy.Default,
    simFailures: Int = 0,
    maxRowsPerBatch: Int = 0) extends Scan with Batch {
  import org.apache.spark.sql.types.{LongType, StringType, StructField}
  private val pageSize = 50 // maxResults=50, dataingestion1.py:78

  override def readSchema(): StructType = agg match {
    case Some((groups, tags)) => StructType(
      groups.map(g => StructField(g, StringType)) ++
        tags.map {
          case "count" => StructField("count", LongType, nullable = false)
          case "min_pub" => StructField("min_pub", StringType)
          case "max_pub" => StructField("max_pub", StringType)
        })
    case None => required
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-videos PushedFilters: [${pushed.mkString(", ")}], " +
      limit.map(l => s"PushedTopN: published_at ${if (topNDesc) "DESC" else "ASC"} LIMIT $l, ")
        .getOrElse("") +
      agg.map { case (g, t) =>
        s"PushedAggregates: [${t.mkString(", ")}] GroupBy: [${g.mkString(", ")}], "
      }.getOrElse("") +
      s"ReadSchema: ${readSchema().simpleString}"

  private def keep(r: VideoRow): Boolean = VideoFilters.keep(pushed)(r)

  /** The STREAMING read path — `spark.readStream.format("graft-videos")`:
    * the same fixture-backed "API" served as a replayable micro-batch
    * stream (what several engine entries previously only claimed as "the
    * production path"). See [[VideoMicroBatchStream]] for the offset
    * model and admission control. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(agg.isEmpty && limit.isEmpty,
      "graft-videos streaming read supports filter/column pushdown only")
    new VideoMicroBatchStream(path, pushed, required, retry, simFailures,
      maxRowsPerBatch)
  }

  override def planInputPartitions(): Array[InputPartition] = agg match {
    case Some((groups, tags)) =>
      // the "API's" server-side report: one aggregated row per group
      val data = VideoCatalog.load(path).filter(keep)
      val grouped: Seq[(Seq[String], Seq[VideoRow])] =
        if (groups.isEmpty) Seq(Seq.empty -> data)
        else data.groupBy(r => Seq(r.channelId)).toSeq.sortBy(_._1.mkString)
      val rows = grouped.map { case (key, rs) =>
        val pubs = rs.flatMap(r => Option(r.publishedAt))
        (key.map(k => if (k == null) null else UTF8String.fromString(k)) ++
          tags.map {
            case "count" => rs.size.toLong
            case "min_pub" => pubs.minOption.map(UTF8String.fromString).orNull
            case "max_pub" => pubs.maxOption.map(UTF8String.fromString).orNull
          }).toArray[Any]
      }
      Array(VideoAggPage(rows.toArray))
    case None =>
      // "API" does filtering + order:date server-side; one partition per page
      val sorted = VideoCatalog.load(path).filter(keep)
        .sortBy(r => (Option(r.publishedAt).getOrElse(""), r.ingestSeq))
      val ordered = if (topNDesc) sorted.reverse else sorted
      val rows = limit.fold(ordered)(ordered.take)
      rows.grouped(pageSize).map(p => VideoPage(p.toArray): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    if (agg.isDefined) new VideoAggReaderFactory
    else new VideoReaderFactory(required, retry, simFailures)
}

final case class VideoAggPage(rows: Array[Array[Any]]) extends InputPartition

class VideoAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[VideoAggPage]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < page.rows.length }
      override def get(): InternalRow = new GenericInternalRow(page.rows(i))
      override def close(): Unit = ()
    }
  }
}

final case class VideoPage(rows: Array[VideoRow]) extends InputPartition

class VideoReaderFactory(required: StructType,
    retry: RetryPolicy = RetryPolicy.Default,
    simFailures: Int = 0) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[VideoPage]
    new PartitionReader[InternalRow] {
      // the page "fetch" — in production the per-page HTTP GET (the
      // partition would carry a pageToken instead of rows) — is the
      // retryable unit: executor-side, so a 503 costs one page re-fetch
      // under the bounded-backoff policy, never a task restart. The
      // fault injector throws on the first `simFailures` attempts.
      private var failuresLeft = simFailures
      private var fetched: Array[VideoRow] = _
      private def fetchPage(): Array[VideoRow] =
        retry.run(s"graft-videos page fetch (${page.rows.length} rows)") {
          if (failuresLeft > 0) {
            failuresLeft -= 1
            throw new TransientApiError("simulated HTTP 503")
          }
          page.rows
        }
      private var i = -1
      private val getters: Array[VideoRow => Any] = required.fieldNames.map {
        case "video_id" => (r: VideoRow) => UTF8String.fromString(r.videoId)
        case "video_title" => (r: VideoRow) => UTF8String.fromString(r.title)
        case "published_at" => (r: VideoRow) => UTF8String.fromString(r.publishedAt)
        case "channel_id" => (r: VideoRow) => UTF8String.fromString(r.channelId)
        case "ingest_seq" => (r: VideoRow) => r.ingestSeq
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      override def next(): Boolean = {
        if (fetched == null) fetched = fetchPage()
        i += 1; i < fetched.length
      }
      override def get(): InternalRow =
        new GenericInternalRow(getters.map(_(fetched(i))))
      override def close(): Unit = ()
    }
  }
}

/** Offset into the stable replay order of the video stream: the INDEX of
  * the next unserved row in the pushed-filtered, (ingest_seq, video_id)-
  * sorted snapshot. Arrival order (`ingest_seq`) is the offset axis — the
  * natural cursor a real paged-API poller would checkpoint. */
final case class VideoOffset(idx: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = idx.toString
}

/** MICRO_BATCH_READ for `graft-videos` — the production-shaped streaming
  * half of the connector (the reference polls the same search endpoint
  * on a cron; a streaming deployment polls it continuously with a
  * checkpointed cursor — this is that cursor, hermetic):
  *
  *  - rows replay in the STABLE order (ingest_seq, video_id) after the
  *    pushed filters — offsets are indices into that order, so a
  *    checkpoint-restarted query resumes exactly where it left off and
  *    never re-serves or skips a row (pinned by VideoStreamSpec);
  *  - ADMISSION CONTROL (`maxRowsPerBatch` option) bounds each
  *    micro-batch — `latestOffset(start, limit)` advances the cursor at
  *    most that many rows, the engine's per-trigger rate limit;
  *  - `Trigger.AvailableNow` snapshots the end target at
  *    [[prepareForTriggerAvailableNow]] and drains to it in bounded
  *    batches, then stops — the reference's catch-up-then-exit cron
  *    shape;
  *  - partitions reuse the batch scan's 50-row pages and retrying
  *    reader ([[VideoReaderFactory]]), so per-page fault recovery and
  *    column pruning behave identically on both paths.
  *
  * Scale: the driver holds only the fixture cursor (a production impl
  * holds a page token); each micro-batch ships O(batch) rows straight
  * to executors. */
class VideoMicroBatchStream(path: String,
    pushed: Array[org.apache.spark.sql.sources.Filter],
    required: StructType, retry: RetryPolicy, simFailures: Int,
    maxRowsPerBatch: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => StreamOffset, ReadLimit, ReadMaxRows}

  // the filtered, stably-ordered replay snapshot; loaded once per query
  // (the fixture stand-in for the API's cursor-paged result space)
  private lazy val rows: IndexedSeq[VideoRow] =
    VideoCatalog.load(path).filter(VideoFilters.keep(pushed))
      .sortBy(r => (r.ingestSeq, r.videoId)).toIndexedSeq

  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(rows.length.toLong)

  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerBatch > 0) ReadLimit.maxRows(maxRowsPerBatch)
    else ReadLimit.allAvailable()

  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called with admission control")

  override def latestOffset(start: StreamOffset, limit: ReadLimit): StreamOffset = {
    val s = start.asInstanceOf[VideoOffset].idx
    val total = availableNowTarget.getOrElse(rows.length.toLong)
    val end = limit match {
      case mr: ReadMaxRows => math.min(total, s + mr.maxRows())
      case _ => total
    }
    VideoOffset(math.max(s, end))
  }

  override def reportLatestOffset(): StreamOffset = VideoOffset(rows.length.toLong)
  override def initialOffset(): StreamOffset = VideoOffset(0L)
  override def deserializeOffset(json: String): StreamOffset =
    VideoOffset(json.toLong)

  override def planInputPartitions(start: StreamOffset,
      end: StreamOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[VideoOffset].idx.toInt
    val e = end.asInstanceOf[VideoOffset].idx.toInt
    rows.slice(s, e).grouped(50).map(p => VideoPage(p.toArray): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VideoReaderFactory(required, retry, simFailures)

  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()
}
