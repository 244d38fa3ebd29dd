package graft.sources

import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Merge-on-read SQL `DELETE` (delta-based row-level operation,
  * `SupportsDelta`): instead of rewriting every file that holds a
  * matching row (the copy-on-write path, [[GraftRowLevelOperation]]),
  * the matching rows' STABLE ids `(_file, _pos)` flow to position-delete
  * writers, and commit publishes a new generation that carries every
  * live data file by reference plus per-file delete-vector sidecars
  * ([[graft.format.Dv]] blobs, referenced from the `.dvs` manifest next
  * to `.carry`). A 100-row DELETE against a 100 TB table writes
  * kilobytes; readers subtract the positions from their decode ranges.
  *
  * Enabled per session: `SET spark.graft.deleteMode = merge-on-read`.
  * The default stays copy-on-write — COW keeps footer-served aggregates
  * and top-k pushes fully live, MoR trades them (the scan builder
  * declines while DVs exist) for O(deleted rows) write cost; compaction
  * (`CALL sys.compact`) materializes the DVs and re-enables the footer
  * walk. UPDATE/MERGE stay copy-on-write in both modes.
  *
  * Scan side: Spark plans `Filter(cond)` OVER the table scan and projects
  * the row ids, so the pushed condition still prunes files/chunks/blocks
  * through zone maps and blooms — only files that can hold matching rows
  * are read, and the scan applies EXISTING delete vectors first, so
  * re-deleting already-deleted rows is impossible by construction.
  *
  * Commit publishes through the same staging/claim/no-clobber/pointer
  * machinery as every other rewrite ([[Generations.publishStaging]]):
  * crash before commit leaves unreferenced staging for the next sweep; a
  * concurrent rewrite loses the no-clobber race loudly. A file whose
  * merged delete vector covers EVERY row is dropped from the carry
  * manifest outright (whole-file delete — no DV, no task, no open). */
class GraftMorDeleteOperation(dir: String, table: String, schema: StructType)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = RowLevelOperation.Command.DELETE
  override def description(): String = s"graft merge-on-read DELETE on $table"

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GraftDataSource.FileColName),
    Expressions.column(GraftDataSource.PosColName))

  override def requiredMetadataAttributes(): Array[NamedReference] = Array.empty

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(Seq(dir), schema, Some(table))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite with RequiresDistributionAndOrdering {
        // cluster the matched ids by file and sort by (_file, _pos): each
        // task sees whole files' positions in order, so the per-task
        // fragments are few, sorted, and merge trivially on the driver
        override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution =
          org.apache.spark.sql.connector.distributions.Distributions.clustered(
            Array(Expressions.column(GraftDataSource.FileColName)))
        override def requiredNumPartitions(): Int = 0
        override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          Array(
            Expressions.sort(Expressions.column(GraftDataSource.FileColName),
              org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING),
            Expressions.sort(Expressions.column(GraftDataSource.PosColName),
              org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
        override def toBatch: DeltaBatchWrite = new GraftMorDeleteBatchWrite(dir, table)
      }
    }
}

/** One task's position deletes, delta-varint-encoded per file (the same
  * [[graft.format.Dv]] codec the sidecars use — a 10^6-position fragment
  * rides the commit message in ~1-2 MB, not 8). */
private[sources] case class GraftDvCommitMessage(perFile: Map[String, Array[Byte]])
    extends WriterCommitMessage

private[sources] class GraftMorDeleteBatchWrite(dir: String, table: String)
    extends DeltaBatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new DeltaWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
        new GraftMorDeleteWriter
    }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // merge the tasks' fragments per file (sorted-set union; the write's
    // required ordering makes each fragment sorted already)
    val newPerFile = mutable.HashMap.empty[String, Array[Long]]
    messages.foreach {
      case GraftDvCommitMessage(perFile) => perFile.foreach { case (f, blob) =>
        val pos = graft.format.Dv.decode(blob)
        newPerFile(f) = newPerFile.get(f) match {
          case Some(prev) => graft.format.Dv.merge(prev, pos)
          case None => pos
        }
      }
      case null => // skipped task
      case other => throw new IllegalStateException(
        s"unexpected commit message ${other.getClass.getName}")
    }
    if (newPerFile.isEmpty || newPerFile.values.forall(_.isEmpty)) return // matched nothing

    val spark = SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)

    val nextGen = Generations.prepareRewrite(spark, dir)
    val staging = new Path(root, s"$nextGen.tmp-${UUID.randomUUID()}")
    Generations.claimStaging(conf, staging)
    try {
      // pin the source view; classify for carry stats (zero footer I/O
      // for manifest-covered files, same contract as every DML)
      val listed = GraftDataSource.listPartitionedSized(conf, dir)
      val srcDir = GraftDataSource.resolveDataDir(conf, dir)
      val files = Generations.classifyForDml(conf, root, listed, table, None, dir)
      val statsByRel = files.map(f =>
        GraftDataSource.relativePath(root, f.path) -> f.statsJson).toMap
      val byUriPath = listed.map { case (p, size, _) => p.toUri.getPath -> (p, size) }.toMap

      files.filter(_.names.size > 1).foreach { f =>
        if (newPerFile.contains(f.path.toString) ||
            newPerFile.contains(f.path.toUri.getPath))
          throw new UnsupportedOperationException(
            s"${f.path} holds tables ${f.names.mkString(",")}; merge-on-read " +
              "DELETE needs single-table files — a delete vector is scoped to " +
              "one table's row space. Use copy-on-write mode for this table")
      }

      val existing = GraftDataSource.liveDvs(conf, dir, Some(table))
      var churnBytes = 0L
      var blobIdx = 0
      val newEntries = Seq.newBuilder[(String, String, String, Long)]
      val fullyDeletedRels = Set.newBuilder[String]
      val targetRels = Set.newBuilder[String]
      newPerFile.toSeq.sortBy(_._1).foreach { case (fileStr, fresh0) =>
        if (fresh0.nonEmpty) {
          val uriPath = new Path(fileStr).toUri.getPath
          val (livePath, liveSize) = byUriPath.getOrElse(uriPath,
            throw new graft.format.OliveFormatException(
              s"DELETE matched rows of $fileStr, which is no longer in the live " +
                "view — a concurrent rewrite replaced it; re-run the DELETE"))
          val rel = GraftDataSource.relativePath(root, livePath)
          targetRels += rel
          // merge with the file's existing DV, validate against its real
          // row count (footer open bounded by the number of DV'd files)
          val merged0 = existing.get(uriPath) match {
            case Some((dvPath, _)) =>
              val dfs = dvPath.getFileSystem(conf)
              val st = dfs.getFileStatus(dvPath)
              val bytes = new Array[Byte](st.getLen.toInt)
              val in = dfs.open(dvPath)
              try in.readFully(0, bytes) finally in.close()
              graft.format.Dv.merge(graft.format.Dv.decode(bytes), fresh0)
            case None => fresh0
          }
          val r = graft.format.GraftFileReader.open(livePath.getFileSystem(conf), livePath)
          val totalRows = try {
            r.footer.chunks.iterator
              .flatMap(_.tables.filter(_.name == table)).map(_.numRows.toLong).sum
          } finally r.close()
          if (merged0.nonEmpty && merged0.last >= totalRows)
            throw new graft.format.OliveFormatException(
              s"delete position ${merged0.last} beyond $rel's $totalRows rows — " +
                "the scan and commit saw different file contents; re-run the DELETE")
          churnBytes += (if (totalRows == 0) 0L
            else liveSize * fresh0.length / math.max(totalRows, 1L))
          if (merged0.length == totalRows) {
            // every row deleted: drop the FILE from the new generation
            // instead of carrying a row-0..n DV — no sidecar, no task,
            // no open; time travel still sees it in older generations
            fullyDeletedRels += rel
          } else {
            val blobName = s"_dv/dv-$blobIdx.dvg"
            blobIdx += 1
            val out = fs.create(new Path(staging, blobName), false)
            try out.write(graft.format.Dv.encode(merged0)) finally out.close()
            newEntries += ((table, rel, s"$nextGen/$blobName", merged0.length.toLong))
          }
        }
      }

      val dropped = fullyDeletedRels.result()
      val targets = targetRels.result()
      // carry every live data file by reference (minus fully-deleted
      // ones), stats riding along so the next DML keeps zero-footer-I/O
      GraftDataSource.writeCarryManifest(fs, staging,
        listed.map { case (p, size, _) =>
          val rel = GraftDataSource.relativePath(root, p)
          (rel, size, statsByRel.get(rel))
        }.filterNot { case (rel, _, _) => dropped.contains(rel) })
      // sibling tables' DV entries carry verbatim; this table's entries
      // for re-DV'd files were merged into the fresh blobs above
      val carriedDv = GraftDataSource.carryDvEntries(fs, conf, dir,
        targets ++ dropped)
      GraftDataSource.writeDvManifest(fs, staging, carriedDv ++ newEntries.result())
      GraftDataSource.carryBucketMarkers(fs, conf, dir, staging)
      Generations.publishStaging(fs, conf, root, staging, nextGen, None, dir,
        sourceView = Some((srcDir, listed.map(_._1.toUri.getPath).toSet)))
      GraftDataSource.recordChurn(spark, dir, table, churnBytes)
    } catch {
      case e: Throwable =>
        try fs.delete(staging, true) catch { case _: Exception => }
        throw e
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Task side: collect (file, pos) ids, encode one DV fragment per file at
  * commit. The required ordering delivers ids sorted by (_file, _pos);
  * out-of-order arrival (speculative retries, future plan changes) is
  * handled by an explicit sort+dedup before encoding — never trusted. */
private[sources] class GraftMorDeleteWriter extends DeltaWriter[InternalRow] {
  private val perFile = mutable.HashMap.empty[String, mutable.ArrayBuffer[Long]]

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    if (id == null || id.numFields != 2)
      throw new IllegalStateException(
        s"merge-on-read DELETE expected a (_file, _pos) row id, got " +
          s"${if (id == null) "null" else s"${id.numFields} fields"}")
    val file = id.getUTF8String(0)
    if (file == null || id.isNullAt(1))
      throw new IllegalStateException(
        "merge-on-read DELETE row id carries a null _file/_pos — the scan " +
          "must generate both for every row")
    perFile.getOrElseUpdate(file.toString, mutable.ArrayBuffer.empty) += id.getLong(1)
  }

  override def insert(row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "graft merge-on-read handles DELETE only; UPDATE/MERGE run copy-on-write")
  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "graft merge-on-read handles DELETE only; UPDATE/MERGE run copy-on-write")

  override def commit(): WriterCommitMessage = GraftDvCommitMessage(
    perFile.iterator.map { case (f, buf) =>
      val arr = buf.toArray.sorted.distinct
      f -> graft.format.Dv.encode(arr)
    }.toMap)

  override def abort(): Unit = ()
  override def close(): Unit = ()
}
