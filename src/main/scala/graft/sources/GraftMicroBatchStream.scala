package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Micro-batch streaming source over a graft directory.
  *
  * Offset model: a monotonically growing, checkpoint-persisted log of
  * discovered file paths (`<checkpoint>/graft-file-log`); offset N = "the
  * first N files of the log". `latestOffset` diffs the directory against
  * the log and appends newcomers, so file-name ordering never matters and
  * recovery replays identical batches from the persisted log — the same
  * contract as Spark's own FileStreamSource metadata log. (The reference
  * format has no streaming surface at all; SURVEY.md §2.B flags the
  * source as the later milestone of the streaming row.)
  *
  * Scale: the log is append-only text, one line per file; a 100 TB feed
  * of multi-GB graft files is millions of lines — fine for a driver-side
  * log (FileStreamSource carries the same cost).
  */
class GraftMicroBatchStream(dir: String, checkpointLocation: String,
    required: StructType, tableOpt: Option[String],
    maxFilesPerTrigger: Option[Int] = None,
    startingOffsets: String = "earliest") extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  require(startingOffsets == "earliest" || startingOffsets == "latest",
    s"startingOffsets must be earliest|latest, got '$startingOffsets'")

  private val conf = new Configuration()
  private val logPath = new Path(checkpointLocation, "graft-file-log")
  private val fs = logPath.getFileSystem(conf)

  private def readLog(): Vector[String] =
    if (!fs.exists(logPath)) Vector.empty
    else {
      val in = fs.open(logPath)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, StandardCharsets.UTF_8)
          .split("\n").toVector.filter(_.nonEmpty)
      } finally in.close()
    }

  // the log is always the previous or the new version (AtomicPublish):
  // a delete-then-rename pair would open a crash window in which the
  // log vanishes and committed offsets re-map onto a re-discovered,
  // possibly different file order
  private def writeLog(files: Vector[String]): Unit =
    AtomicPublish.text(conf, logPath, files.mkString("", "\n", "\n"))

  /** First-start offset (a restart resumes from the checkpoint instead):
    * `earliest` replays the whole directory; `latest` seeds the file log
    * with everything already present and starts past it, so only files
    * landing AFTER the stream starts are emitted — what a change-feed
    * consumer attaching to an existing capture log wants (the history is
    * served by the batch reader, not a replay).
    *
    * The start position is pinned in its OWN marker
    * (`graft-start-offset`), not derived from the file log's size: the
    * log durably grows in `latestOffset` BEFORE Spark commits the
    * batch's offsets, so a crash in that window would otherwise make a
    * re-run initialOffset see the grown log and silently skip the files
    * discovered pre-crash. */
  override def initialOffset(): Offset =
    if (startingOffsets == "latest") {
      val startPath = new Path(checkpointLocation, "graft-start-offset")
      val n =
        if (fs.exists(startPath)) {
          val in = fs.open(startPath)
          try new String(in.readAllBytes(), StandardCharsets.UTF_8).trim.toInt
          finally in.close()
        } else {
          val known = readLog()
          val all = if (known.nonEmpty) known else {
            val now = GraftDataSource.listFiles(conf, dir).map(_.toString).toVector
            if (now.nonEmpty) writeLog(now)
            now
          }
          AtomicPublish.text(conf, startPath, all.size.toString)
          all.size
        }
      GraftStreamOffset(n)
    } else GraftStreamOffset(0)

  override def latestOffset(): Offset =
    latestOffset(GraftStreamOffset(0),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())

  /** Admission control (`maxFilesPerTrigger`): ALL newly discovered files
    * still append to the log (the stable order every offset indexes), but
    * the returned offset advances at most `maxFiles` past the batch start
    * — a backlog of thousands of files drains in bounded batches instead
    * of one giant catch-up micro-batch. */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val known = readLog()
    val seen = known.toSet
    val now = GraftDataSource.listFiles(conf, dir).map(_.toString)
    val fresh = now.filterNot(seen)
    val all = if (fresh.nonEmpty) { val v = known ++ fresh; writeLog(v); v } else known
    val cap = limit match {
      case f: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles => f.maxFiles()
      case _ => Int.MaxValue
    }
    val from = start.asInstanceOf[GraftStreamOffset].index
    GraftStreamOffset(math.min(all.size.toLong, from.toLong + cap).toInt)
  }

  override def getDefaultReadLimit: org.apache.spark.sql.connector.read.streaming.ReadLimit =
    maxFilesPerTrigger
      .map(org.apache.spark.sql.connector.read.streaming.ReadLimit.maxFiles)
      .getOrElse(org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())

  /** Hive-style partition values re-derived from the file's path relative
    * to the source dir (the log stores plain paths): a stream over a
    * partitioned layout surfaces `k=v` columns exactly like a batch scan. */
  private def partValuesOf(file: String): Map[String, String] = {
    val filePath = new Path(file).toUri.getPath // scheme-independent
    val dirPath = new Path(dir).toUri.getPath
    val rel = if (filePath.startsWith(dirPath)) filePath.substring(dirPath.length) else filePath
    rel.split("/").filter(_.contains("=")).map { seg =>
      val Array(k, v) = seg.split("=", 2)
      k -> GraftDataSource.unescapePathValue(v)
    }.toMap
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].index
    val e = end.asInstanceOf[GraftStreamOffset].index
    readLog().slice(s, e)
      .map(f => GraftInputPartition(f, partValuesOf(f)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required, tableOpt, Array.empty[Filter], -1,
      new SerializableConfiguration(conf))

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = {}
  override def stop(): Unit = {}
}

case class GraftStreamOffset(index: Int) extends Offset {
  override def json(): String = index.toString
}
