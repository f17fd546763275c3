package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * `spark.read.format("warc").load(path)` — a DataSource V2 batch reader for
 * WARC shards ([[Warc]] does the byte-level parsing). Spark-first design
 * notes for the 100 TB case:
 *
 *  - **Parallelism = shard count.** Gzip WARC files are not splittable
 *    (per-record members share one stream), so the unit of work is a file;
 *    a Common-Crawl segment is thousands of ~1 GiB shards, far more than
 *    any executor count. Small files are bin-packed into partitions
 *    targeting `spark.sql.files.maxPartitionBytes` so a directory of many
 *    small shards doesn't become many tiny tasks.
 *  - **Streaming, bounded memory.** The reader never materializes a file:
 *    records stream off the open `FSDataInputStream` one at a time, each
 *    bounded by [[Warc.MaxPayload]]. Peak memory per task is one record,
 *    not one shard.
 *  - **Column pruning reaches the byte level.** When the scan needs none of
 *    `payload`/`http_status`/`content_type`/`truncated` (e.g. URL
 *    frequency counts), payload bytes are skipped, not buffered
 *    ([[Warc.records]] `keepPayload=false`) — the WARC analogue of not
 *    reading parquet columns you did not select.
 *
 * Schema: `(file, record_idx, warc_type, url, warc_ts, record_id,
 * warc_content_type, http_status, content_type, payload, truncated)`.
 */
final class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WarcDataSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(properties.asScala.toMap)
}

object WarcDataSource {

  /** Resolve path/glob options to (path, length) shard entries, hidden
    * files excluded, sorted by path for deterministic planning. */
  def listShards(options: Map[String, String],
      conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long)] = {
    val paths = options.get("paths").map(_.split(",").toSeq)
      .orElse(options.get("path").map(Seq(_)))
      .getOrElse(throw new IllegalArgumentException("warc source requires a path"))
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matched: Seq[FileStatus] =
        Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      matched.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }
    }.filter(st => !st.getPath.getName.startsWith(".") && !st.getPath.getName.startsWith("_"))
      .map(st => (st.getPath.toString, st.getLen))
      .sortBy { case (p, _) => p } // deterministic packing
  }

  /** Bin-pack whole shards toward Spark's FilePartition size target:
    * ceiling `maxPartitionBytes`, floor `openCostInBytes`, bytes/core in
    * between (honoring `minPartitionNum`). A corpus smaller than the
    * ceiling must still spread across cores — without the bytes/core term
    * the whole scan lands in one partition and runs serially. */
  def packPartitions(files: Seq[(String, Long)],
      spark: SparkSession): Array[InputPartition] = {
    val targetBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val openCost = spark.sessionState.conf.filesOpenCostInBytes
    val parallelism = spark.sessionState.conf.filesMinPartitionNum
      .getOrElse(spark.sparkContext.defaultParallelism)
    val totalCost = files.map(_._2 + openCost).sum
    val target = math.min(targetBytes,
      math.max(openCost, totalCost / math.max(1, parallelism)))

    val bins = scala.collection.mutable.ArrayBuffer.empty[(scala.collection.mutable.ArrayBuffer[String], Long)]
    files.sortBy { case (_, len) => -len }.foreach { case (p, len) =>
      val cost = len + openCost
      bins.indexWhere { case (_, used) => used + cost <= target } match {
        case -1 => bins += ((scala.collection.mutable.ArrayBuffer(p), cost))
        case i  => val (b, used) = bins(i); b += p; bins(i) = (b, used + cost)
      }
    }
    bins.map { case (b, _) => WarcInputPartition(b.toArray): InputPartition }.toArray
  }

  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_idx", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("record_id", StringType, nullable = false),
    StructField("warc_content_type", StringType, nullable = false),
    StructField("http_status", IntegerType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("truncated", BooleanType, nullable = false)))

  /** Columns whose values require buffering the record payload. Pruning to
    * any subset of the OTHER columns flips the reader to skip-don't-buffer. */
  val PayloadDependent: Set[String] = Set("payload", "http_status", "content_type", "truncated")
}

private final class WarcTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "warc:" + properties.getOrElse("path", properties.getOrElse("paths", "?"))
  override def schema(): StructType = WarcDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(properties ++ options.asScala.toMap)
}

private final class WarcScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcDataSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep source column ORDER (reader emits fields in schema order)
    required = StructType(WarcDataSource.Schema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new WarcScan(options, required)
}

private final class WarcScan(options: Map[String, String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val keep = required.fieldNames.exists(WarcDataSource.PayloadDependent)
    s"warc ${options.getOrElse("path", "")} keepPayload=$keep"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    WarcDataSource.packPartitions(
      WarcDataSource.listShards(options, spark.sessionState.newHadoopConf()), spark)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new WarcMicroBatchStream(options, required.fieldNames)
}

/** Watermark offset for the WARC stream: the highest shard path ingested so
  * far ("" before the first batch). JSON form is the quoted path. */
private final case class WarcOffset(watermark: String)
    extends streaming.Offset {
  override def json(): String =
    "\"" + watermark.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}

private object WarcOffset {
  def fromJson(s: String): WarcOffset = {
    val t = s.trim
    val unq = if (t.length >= 2 && t.head == '"' && t.last == '"')
      t.substring(1, t.length - 1).replace("\\\"", "\"").replace("\\\\", "\\")
    else t
    WarcOffset(unq)
  }
}

/**
 * `spark.readStream.format("warc")` — micro-batch ingestion of a landing
 * directory of crawl shards. The offset is a PATH WATERMARK: each batch
 * takes every shard whose path sorts strictly above the last watermark,
 * and the new watermark is the highest path taken. This makes the source
 * checkpoint-free (the offset alone replays exactly) under one documented
 * contract: shard paths must arrive in lexicographically increasing order,
 * which the Common-Crawl naming convention (timestamped segment/shard
 * names) satisfies by construction. A late-arriving out-of-order path is
 * NOT silently skipped forever — it is simply below the watermark, and the
 * batch path (`spark.read.format("warc")`) over the same directory remains
 * the recovery route; Spark's own FileStreamSource makes the opposite
 * trade (arbitrary names, but a per-batch file log in the checkpoint).
 */
private final class WarcMicroBatchStream(options: Map[String, String],
    fieldNames: Array[String]) extends streaming.MicroBatchStream {

  private def conf = SparkSession.active.sessionState.newHadoopConf()

  override def initialOffset(): streaming.Offset = WarcOffset("")

  override def latestOffset(): streaming.Offset = {
    val files = WarcDataSource.listShards(options, conf)
    if (files.isEmpty) WarcOffset("") else WarcOffset(files.map(_._1).max)
  }

  override def deserializeOffset(json: String): streaming.Offset =
    WarcOffset.fromJson(json)

  override def planInputPartitions(start: streaming.Offset,
      end: streaming.Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[WarcOffset].watermark
    val hi = end.asInstanceOf[WarcOffset].watermark
    val files = WarcDataSource.listShards(options, conf)
      .filter { case (p, _) => p > lo && p <= hi }
    WarcDataSource.packPartitions(files, SparkSession.active)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(fieldNames)

  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

private final case class WarcInputPartition(files: Array[String]) extends InputPartition

private final class WarcReaderFactory(fieldNames: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcInputPartition].files, fieldNames)
}

private final class WarcPartitionReader(files: Array[String], fieldNames: Array[String])
    extends PartitionReader[InternalRow] {

  private val keepPayload = fieldNames.exists(WarcDataSource.PayloadDependent)
  private val conf = new org.apache.hadoop.conf.Configuration()
  private var fileIdx = -1
  private var recIdx = -1L
  private var current: Iterator[WarcRecord] = Iterator.empty
  private var currentStream: java.io.InputStream = _
  private var currentFile: UTF8String = _
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (!current.hasNext) {
      fileIdx += 1
      if (fileIdx >= files.length) return false
      val path = new Path(files(fileIdx))
      val fs = path.getFileSystem(conf)
      currentFile = UTF8String.fromString(files(fileIdx))
      recIdx = -1L
      currentStream = fs.open(path)
      current = Warc.records(currentStream, keepPayload)
    }
    val r = current.next()
    recIdx += 1
    row = toRow(r)
    true
  }

  override def get(): InternalRow = row

  /** Warc closes the stream at exhaustion; an early-terminating consumer
    * (limit, task kill) lands here mid-file, so close it explicitly too. */
  override def close(): Unit = {
    current = Iterator.empty
    if (currentStream != null) {
      try currentStream.close() catch { case _: Throwable => () }
      currentStream = null
    }
  }

  private def toRow(r: WarcRecord): InternalRow = {
    val values = new Array[Any](fieldNames.length)
    var i = 0
    while (i < fieldNames.length) {
      values(i) = fieldNames(i) match {
        case "file"              => currentFile
        case "record_idx"        => recIdx
        case "warc_type"         => UTF8String.fromString(r.warcType)
        case "url"               => UTF8String.fromString(r.targetUri)
        case "warc_ts"           => parseTsMicros(r.date)
        case "record_id"         => UTF8String.fromString(r.recordId)
        case "warc_content_type" => UTF8String.fromString(r.contentType)
        case "http_status"       => r.httpStatus
        case "content_type"      => UTF8String.fromString(r.httpContentType)
        case "payload"           => r.payload
        case "truncated"         => r.truncated
        case other               => throw new IllegalStateException(s"unknown warc column $other")
      }
      i += 1
    }
    new GenericInternalRow(values)
  }

  /** WARC-Date is ISO-8601 UTC (`2017-03-06T04:03:53Z`); null if unparsable. */
  private def parseTsMicros(s: String): Any =
    try {
      val inst = java.time.Instant.parse(s)
      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    } catch { case _: Throwable => null }
}
