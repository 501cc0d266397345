package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** One listed file = one partition, shared by every file-granular
  * connector here (EDF, ECAT). */
private[v2] case class ListedFile(path: String, length: Long)
    extends InputPartition

private[v2] object FileListing {
  def conf(confMap: Map[String, String]): Configuration = {
    val c = new Configuration()
    confMap.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Driver-side glob over `options("path")`, path-sorted. */
  def list(options: CaseInsensitiveStringMap, defaultGlob: String,
      confMap: Map[String, String]): Seq[ListedFile] = {
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("file source requires a path"))
    val glob = Option(options.get("glob")).getOrElse(defaultGlob)
    val root = new Path(dir)
    val fs = root.getFileSystem(conf(confMap))
    Option(fs.globStatus(new Path(root, glob))).getOrElse(Array.empty)
      .filter(_.isFile).sortBy(_.getPath.toString)
      .map(st => ListedFile(st.getPath.toString, st.getLen)).toSeq
  }
}

private[v2] case class SeenFileOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** Micro-batch streaming over an append-only file directory — the
  * Spark-native form of the reference's pick-up-what-the-pipeline-has-
  * not-run-on-yet cron jobs (`imaging_upload_file_cronjob.pl`,
  * `tools/petupload_cron_prod`): each micro-batch is exactly the files
  * that appeared since the last one.
  *
  * Progress tracking is a versioned seen-file log under the query's own
  * checkpoint directory (the FileStreamSource design on the public
  * connector API): segment file `n` lists the files first seen at offset
  * `n`, written atomically (dotted temp + rename) BEFORE the offset is
  * returned, so the offset itself stays a bare version number —
  * segments scale with arrival batches, never with archive size — and a
  * restart replays exactly the uncommitted batch: per-file exactly-once.
  * Format-specific behavior is entirely in the injected
  * [[PartitionReaderFactory]], which is the same one the batch scan
  * uses, pruning included. */
private[v2] class SeenFileLogStream(
    options: CaseInsensitiveStringMap,
    defaultGlob: String,
    confMap: Map[String, String],
    checkpointLocation: String,
    factory: PartitionReaderFactory)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val logDir = new Path(checkpointLocation, "seen-files")

  /** (maxVersion, version → files). Segments are tiny (one text line per
    * newly arrived file); re-read per trigger so concurrent restarts
    * always see the durable truth. */
  private def readSegments(): (Long, Map[Long, Seq[ListedFile]]) = {
    val fs = logDir.getFileSystem(FileListing.conf(confMap))
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
          ListedFile(path, len.toLong)
        }
        version -> files
      }
    (if (segs.isEmpty) 0L else segs.map(_._1).max, segs.toMap)
  }

  private def advance(): SeenFileOffset = {
    val (maxVersion, segs) = readSegments()
    val seen = segs.values.flatten.map(_.path).toSet
    val fresh = FileListing.list(options, defaultGlob, confMap)
      .filterNot(p => seen(p.path))
    if (fresh.isEmpty) SeenFileOffset(maxVersion)
    else {
      val fs = logDir.getFileSystem(FileListing.conf(confMap))
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
      SeenFileOffset(next)
    }
  }

  // Trigger.AvailableNow: freeze the target offset once, drain up to it
  private var frozen: Option[SeenFileOffset] = None
  override def prepareForTriggerAvailableNow(): Unit = frozen = Some(advance())

  override def initialOffset(): Offset = SeenFileOffset(0L)
  override def latestOffset(): Offset = frozen.getOrElse(advance())
  // rate limiting has no meaning for whole-file rows: every limit admits
  // the full arrival set
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    frozen.getOrElse(advance())
  override def reportLatestOffset(): Offset =
    frozen.getOrElse(SeenFileOffset(readSegments()._1))
  override def deserializeOffset(json: String): Offset =
    SeenFileOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[SeenFileOffset].version
    val e = end.asInstanceOf[SeenFileOffset].version
    val (_, segs) = readSegments()
    ((s + 1) to e).flatMap(v => segs.getOrElse(v, Seq.empty))
      .map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = factory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
