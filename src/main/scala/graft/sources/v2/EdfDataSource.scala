package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.EdfReader

/** DataSource V2 front door for the S14 EDF reader:
  * `spark.read.format("edf").load(dir)` (registered via
  * `META-INF/services`, or by fully-qualified class name). One row per
  * non-annotation channel, same schema as [[EdfReader.EdfChannel]], so it
  * drops into the existing `channelArraysToLong` → `EphysChunker` path.
  *
  * Why a connector and not just the `binaryFile`-based [[EdfReader.channels]]:
  * the V2 scan surfaces the two scan-time optimizations Catalyst can only
  * apply through the connector API —
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): when
  *    `values` is not in the required schema (catalog/metadata queries
  *    over raw recordings), the reader fetches ONLY the ASCII header
  *    (256 + ns·256 bytes) and never touches the sample region —
  *    `n_samples` comes from the file length in the `FileStatus` already
  *    collected at planning. A metadata sweep over a 100 TB recording
  *    archive reads megabytes, not terabytes.
  *  - **channel-skip on pushed predicates**: `channel = 'C3'` /
  *    `channel IN (…)` reach [[EdfScanBuilder.pushFilters]]; matching is
  *    done post-scan by Spark (the filters are all returned as residuals,
  *    so semantics never depend on the skip) but the reader drops
  *    non-matching channels before materializing rows.
  *
  * Partition planning is one [[InputPartition]] per file (driver-side
  * glob, same listing the reference's `edf_to_chunks.py` does per upload):
  * a recording archive of N files fans out to N independent tasks with no
  * shuffle; record-range splitting inside one file is not needed because
  * the row granularity is a whole channel. Files beyond 2 GiB fail closed
  * (empty, like every hardened reader here); EDF's int16 records and the
  * reference's per-upload file sizes keep real inputs far below that.
  */
class EdfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "edf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EdfDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EdfTable(new CaseInsensitiveStringMap(properties))
}

object EdfDataSource {
  val schema: StructType = StructType(Seq(
    StructField("file_path", StringType, nullable = false),
    StructField("channel", StringType, nullable = false),
    StructField("sampling_rate_hz", DoubleType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("values", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
}

private[v2] class EdfTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"edf(${options.get("path")})"
  override def schema(): StructType = EdfDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new EdfScanBuilder(options)
}

private[v2] class EdfScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = EdfDataSource.schema
  private var channelKeep: Option[Set[String]] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val keeps = filters.collect {
      case EqualTo("channel", v: String) => Set(v)
      case In("channel", vs) if vs.forall(_.isInstanceOf[String]) =>
        vs.iterator.map(_.asInstanceOf[String]).toSet
    }
    if (keeps.nonEmpty) channelKeep = Some(keeps.reduce(_ intersect _))
    filters // ALL residual: the skip is a decode shortcut, never semantics
  }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def build(): Scan = {
    // ship the session's Hadoop conf so executors resolve the same
    // filesystems (object stores, kerberized HDFS) as the driver listing
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val confMap = conf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap
    new EdfScan(options, required, channelKeep, confMap)
  }
}

private[v2] case class EdfInputPartition(path: String, length: Long)
    extends InputPartition

private[v2] class EdfScan(
    options: CaseInsensitiveStringMap,
    required: StructType,
    channelKeep: Option[Set[String]],
    confMap: Map[String, String]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"edf path=${options.get("path")} columns=" +
      required.fieldNames.mkString(",") +
      channelKeep.fold("")(k => s" channelKeep=${k.mkString(",")}")

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("edf source requires a path"))
    val glob = Option(options.get("glob")).getOrElse("*.edf")
    val conf = new Configuration()
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val statuses = Option(fs.globStatus(new Path(root, glob)))
      .getOrElse(Array.empty)
    statuses.filter(_.isFile).sortBy(_.getPath.toString)
      .map(st => EdfInputPartition(st.getPath.toString, st.getLen)
        : InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    EdfReaderFactory(required, channelKeep, confMap)

  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new EdfMicroBatchStream(options, required, channelKeep, confMap,
      checkpointLocation)
}

private[v2] case class EdfStreamOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** `readStream.format("edf")` — the Spark-native form of
  * `imaging_upload_file_cronjob.pl` (which selects the `mri_upload` rows
  * "on which the insertion pipeline has not been run yet" and launches
  * it): each micro-batch is exactly the files that appeared since the
  * last one.
  *
  * Progress tracking is a versioned seen-file log under the query's own
  * checkpoint directory (the [[org.apache.spark.sql.execution.streaming.FileStreamSource]]
  * design, re-implemented on the public connector API): segment file `n`
  * lists the files first seen at offset `n`, written atomically
  * (temp + rename) before the offset is returned. `planInputPartitions
  * (start, end)` replays segments `start+1..end`, so a restart
  * re-processes exactly the uncommitted batch — per-file exactly-once
  * without keeping the (unbounded) seen set inside the offset JSON
  * itself; the offset is just a version number, segments scale with
  * arrival batches, not with total archive size.
  */
private[v2] class EdfMicroBatchStream(
    options: CaseInsensitiveStringMap,
    required: StructType,
    channelKeep: Option[Set[String]],
    confMap: Map[String, String],
    checkpointLocation: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def conf: Configuration = {
    val c = new Configuration()
    confMap.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val logDir = new Path(checkpointLocation, "edf-seen")

  /** (maxVersion, version → files). Segments are tiny (one text line per
    * newly arrived file); re-read per trigger so concurrent restarts
    * always see the durable truth. */
  private def readSegments(): (Long, Map[Long, Seq[EdfInputPartition]]) = {
    val fs = logDir.getFileSystem(conf)
    if (!fs.exists(logDir)) return (0L, Map.empty)
    val segs = fs.listStatus(logDir).toSeq
      .filter(s => s.isFile && s.getPath.getName.matches("[0-9]+"))
      .map { s =>
        val version = s.getPath.getName.toLong
        val in = fs.open(s.getPath)
        val body = try {
          val buf = new Array[Byte](s.getLen.toInt)
          in.readFully(0, buf)
          new String(buf, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
        val files = body.split("\n").filter(_.nonEmpty).toSeq.map { line =>
          val Array(len, path) = line.split("\t", 2)
          EdfInputPartition(path, len.toLong)
        }
        version -> files
      }
    (if (segs.isEmpty) 0L else segs.map(_._1).max, segs.toMap)
  }

  private def listDir(): Seq[EdfInputPartition] = {
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("edf source requires a path"))
    val glob = Option(options.get("glob")).getOrElse("*.edf")
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    Option(fs.globStatus(new Path(root, glob))).getOrElse(Array.empty)
      .filter(_.isFile).sortBy(_.getPath.toString)
      .map(st => EdfInputPartition(st.getPath.toString, st.getLen)).toSeq
  }

  private def advance(): EdfStreamOffset = {
    val (maxVersion, segs) = readSegments()
    val seen = segs.values.flatten.map(_.path).toSet
    val fresh = listDir().filterNot(p => seen(p.path))
    if (fresh.isEmpty) EdfStreamOffset(maxVersion)
    else {
      val fs = logDir.getFileSystem(conf)
      fs.mkdirs(logDir)
      val next = maxVersion + 1
      val tmp = new Path(logDir, s".$next.tmp")
      val out = fs.create(tmp, true)
      try out.write(fresh.map(p => s"${p.length}\t${p.path}")
        .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      // atomic publish: a crash before this rename leaves only the dotted
      // temp file, which readSegments ignores
      if (!fs.rename(tmp, new Path(logDir, next.toString)))
        throw new java.io.IOException(s"cannot publish seen-file segment $next")
      EdfStreamOffset(next)
    }
  }

  // Trigger.AvailableNow: freeze the target offset once, drain up to it
  private var frozen: Option[EdfStreamOffset] = None
  override def prepareForTriggerAvailableNow(): Unit = frozen = Some(advance())

  override def initialOffset(): Offset = EdfStreamOffset(0L)
  override def latestOffset(): Offset = frozen.getOrElse(advance())
  // SupportsAdmissionControl variant — rate limiting has no meaning for
  // whole-file rows, so every limit admits the full arrival set
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = frozen.getOrElse(advance())
  override def reportLatestOffset(): Offset =
    frozen.getOrElse(EdfStreamOffset(readSegments()._1))
  override def deserializeOffset(json: String): Offset =
    EdfStreamOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[EdfStreamOffset].version
    val e = end.asInstanceOf[EdfStreamOffset].version
    val (_, segs) = readSegments()
    ((s + 1) to e).flatMap(v => segs.getOrElse(v, Seq.empty))
      .map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    EdfReaderFactory(required, channelKeep, confMap)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[v2] case class EdfReaderFactory(
    required: StructType,
    channelKeep: Option[Set[String]],
    confMap: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new EdfPartitionReader(
      p.asInstanceOf[EdfInputPartition], required, channelKeep, confMap)
}

/** Per-file reader. All parsing is delegated to [[EdfReader]] so the
  * connector and the `binaryFile` path can never drift; malformed bytes
  * yield zero rows, matching [[EdfReader.channels]]. */
private[v2] class EdfPartitionReader(
    part: EdfInputPartition,
    required: StructType,
    channelKeep: Option[Set[String]],
    confMap: Map[String, String]) extends PartitionReader[InternalRow] {

  private var iter: Iterator[InternalRow] = _
  private var current: InternalRow = _

  private def fsBytes(length: Long): Array[Byte] = {
    val conf = new Configuration()
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val path = new Path(part.path)
    val fs = path.getFileSystem(conf)
    val buf = new Array[Byte](length.toInt)
    val in = fs.open(path)
    try in.readFully(0, buf) finally in.close()
    buf
  }

  /** (label, rate, n_samples, values-or-null). Header-only when `values`
    * is pruned away: reads 256 bytes, then the ns×256 signal block —
    * the sample region is never fetched. */
  private def channels(): Seq[(String, Double, Long, Array[Double])] = {
    if (part.length < 256 || part.length > Int.MaxValue - 8) return Seq.empty
    val needValues = required.fieldNames.contains("values")
    if (needValues) {
      EdfReader.signalTraces(fsBytes(part.length))
        .map { case (l, r, v) => (l, r, v.length.toLong, v) }
    } else {
      val header = try {
        val conf = new Configuration()
        confMap.foreach { case (k, v) => conf.set(k, v) }
        val path = new Path(part.path)
        val fs = path.getFileSystem(conf)
        val in = fs.open(path)
        try {
          val head = new Array[Byte](256)
          in.readFully(0, head)
          val declared = // total header bytes field, offset 184, len 8
            new String(head, 184, 8, java.nio.charset.StandardCharsets.US_ASCII)
              .trim.toInt
          if (declared < 256 || declared > part.length) None
          else {
            val full = new Array[Byte](declared)
            System.arraycopy(head, 0, full, 0, 256)
            in.readFully(256, full, 256, declared - 256)
            Some(full)
          }
        } finally in.close()
      } catch { case _: Exception => None }
      header.flatMap(EdfReader.parseHeader) match {
        case None => Seq.empty
        case Some(h) =>
          val bytesPerRecord = h.signals.map(_.samplesPerRecord.toLong * 2).sum
          if (bytesPerRecord == 0) Seq.empty
          else {
            val nRec = math.min(
              if (h.nRecords >= 0) h.nRecords.toLong else Long.MaxValue,
              (part.length - h.headerBytes) / bytesPerRecord)
            h.signals.filterNot(_.isAnnotation).map(s =>
              (s.label, h.samplingRateHz(s),
                nRec * s.samplesPerRecord, null))
          }
      }
    }
  }

  override def next(): Boolean = {
    if (iter == null) {
      val kept = channelKeep match {
        case Some(ks) => channels().filter(c => ks(c._1))
        case None => channels()
      }
      iter = kept.iterator.map { case (label, rate, n, vals) =>
        val out = new Array[Any](required.length)
        var i = 0
        required.fields.foreach { f =>
          out(i) = f.name match {
            case "file_path" => UTF8String.fromString(part.path)
            case "channel" => UTF8String.fromString(label)
            case "sampling_rate_hz" => rate
            case "n_samples" => n
            case "values" => new GenericArrayData(vals)
            case other => throw new IllegalStateException(
              s"unknown column $other")
          }
          i += 1
        }
        new GenericInternalRow(out): InternalRow
      }
    }
    if (iter.hasNext) { current = iter.next(); true } else false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
