package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}

/** The one atomic small-file publish protocol behind every metadata
  * marker in the source layer — schema markers, bucket-spec markers, the
  * generation pointer, the streaming file log: write a sibling `.tmp`,
  * then rename over the destination. A reader sees the previous content
  * or the new content, never a partial file and NEVER a missing file; a
  * crashed half-write leaves only an orphan tmp.
  *
  * The local scheme gets a real POSIX `rename(2)` via NIO ATOMIC_MOVE.
  * Hadoop's `FileContext.rename(OVERWRITE)` is NOT atomic there: the
  * generic `AbstractFileSystem.renameInternal` implements overwrite as
  * delete-dest-then-rename, and a reader's `exists()` landing in that
  * window saw NO generation pointer — a table whose loose files were
  * long swept then looked exactly like a healthy empty table, and a
  * racing reader silently returned 0 of 30 000 rows (CompactionSpec
  * "tiny grace", reproduced under CPU load). The checksummed local fs
  * keeps `.crc` sidecars the NIO move bypasses, so the destination's
  * sidecar is dropped first — a missing checksum reads fine, a STALE
  * one would flag the new content as corrupt.
  *
  * Non-local schemes keep the FileContext path: HDFS renameInternal is
  * atomic in the NameNode, and object stores need their own conditional
  * -put story anyway.
  */
private[graft] object AtomicPublish {
  def text(conf: Configuration, dest: Path, content: String): Unit = {
    val fs = dest.getFileSystem(conf)
    fs.mkdirs(dest.getParent)
    // branch on the RESOLVED filesystem, not the raw URI scheme: a
    // scheme-less path on a cluster whose fs.defaultFS is HDFS resolves
    // to HDFS, and writing its marker to the driver's local disk would
    // silently diverge from every reader
    val isLocal = fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    if (isLocal) {
      val raw = org.apache.hadoop.fs.FileSystem.getLocal(conf).getRaw
      val tmp = new Path(dest.getParent, dest.getName + ".tmp")
      // raw create: no .crc sidecar to fall out of sync with the move
      val out = raw.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
      // stale sidecars (this dest's, or an old checksummed tmp's) would
      // verify the NEW bytes against the OLD checksum — drop them; the
      // checksummed reader treats a missing sidecar as "don't verify"
      raw.delete(new Path(dest.getParent, s".${dest.getName}.crc"), false)
      raw.delete(new Path(dest.getParent, s".${dest.getName}.tmp.crc"), false)
      // ATOMIC_MOVE alone: on POSIX, rename(2) replaces an existing dest
      // natively. The javadoc leaves replace-on-existing-dest
      // implementation-specific, though — a non-POSIX local fs (Windows)
      // may throw instead of replacing; retry once with an explicit
      // REPLACE_EXISTING, which those implementations honor (still a
      // single atomic move where the platform can provide one)
      val src = java.nio.file.Paths.get(tmp.toUri.getPath)
      val dst = java.nio.file.Paths.get(dest.toUri.getPath)
      try java.nio.file.Files.move(src, dst,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.AccessDeniedException =>
          java.nio.file.Files.move(src, dst,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } else {
      val tmp = new Path(dest.getParent, dest.getName + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
      FileContext.getFileContext(dest.toUri, conf)
        .rename(tmp, dest, Options.Rename.OVERWRITE)
    }
  }
}
