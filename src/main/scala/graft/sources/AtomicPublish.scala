package graft.sources

import java.io.OutputStream
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

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
  * Beyond atomicity, the local NIO paths here are FORK-free. Without
  * libhadoop.so, Hadoop's local filesystems shell out per metadata op —
  * `chmod` from every `create()` (RawLocalFileSystem.setPermission) and
  * `readlink` ×4 from every `FileContext.rename` (getFileLinkStatus on
  * src/dst and their `.crc` twins). A JFR profile of one CDC-fold gate
  * counted 2 574 process forks in 16 s of work, nearly all from these
  * two calls — a pure-JVM NIO create/move eliminates them. Non-local
  * schemes keep the Hadoop path: HDFS renameInternal is atomic in the
  * NameNode (and never forks). Object stores have no atomic rename at
  * all — pointer publishes there go through [[ConditionalPut]]'s
  * compare-and-swap protocol (etag-conditioned PUTs; see that file for
  * the lost-update analysis and the raced spec).
  */
private[graft] object AtomicPublish {

  /** Branch on the RESOLVED filesystem, not the raw URI scheme: a
    * scheme-less path on a cluster whose fs.defaultFS is HDFS resolves
    * to HDFS, and a "local" fast path keyed on the scheme string would
    * silently write the driver's disk instead. */
  private def localFs(fs: FileSystem): Boolean =
    fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      fs.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]

  private def nio(p: Path): java.nio.file.Path =
    java.nio.file.Paths.get(p.toUri.getPath)

  /** Sidecar the checksummed local fs would pair with `p` — deleted
    * around NIO ops so a stale checksum never flags fresh bytes. */
  private def crcTwin(p: Path): java.nio.file.Path =
    nio(new Path(p.getParent, s".${p.getName}.crc"))

  /** Open a write stream with ZERO forks on the local scheme (plain NIO:
    * no `chmod` subprocess, no `.crc` sidecar) and `FileSystem.create`
    * semantics elsewhere. Parent directories are created either way —
    * callers rely on Hadoop create()'s implicit mkdirs. With
    * `overwrite=false` an existing destination fails loudly
    * (CREATE_NEW), matching `fs.create(p, false)`. */
  def createStream(conf: Configuration, p: Path, overwrite: Boolean): OutputStream = {
    val fs = p.getFileSystem(conf)
    if (localFs(fs)) {
      val target = nio(p)
      if (target.getParent != null) java.nio.file.Files.createDirectories(target.getParent)
      // a previous CHECKSUMMED file of this name leaves a sidecar the
      // NIO write bypasses; missing = unverified (fine), stale = corrupt
      try java.nio.file.Files.deleteIfExists(crcTwin(p))
      catch { case _: java.io.IOException => }
      import java.nio.file.StandardOpenOption._
      val opts =
        if (overwrite) Array[java.nio.file.OpenOption](CREATE, TRUNCATE_EXISTING, WRITE)
        else Array[java.nio.file.OpenOption](CREATE_NEW, WRITE)
      // translate the NIO exists-collision to the HADOOP exception type:
      // "matching fs.create(p, false)" must include the failure contract,
      // or a caller's catch of the Hadoop type works on HDFS and silently
      // misses on local
      try new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(target, opts: _*), 1 << 16)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"create destination $p exists: $e")
      }
    } else fs.create(p, overwrite)
  }

  /** Atomic rename-with-overwrite: single `rename(2)` on local (zero
    * forks), `FileContext.rename(OVERWRITE)` elsewhere (atomic on HDFS).
    * Stale `.crc` sidecars of both names are dropped on local first. */
  def renameOverwrite(conf: Configuration, src: Path, dst: Path): Unit = {
    val fs = dst.getFileSystem(conf)
    if (localFs(fs)) {
      try {
        java.nio.file.Files.deleteIfExists(crcTwin(dst))
        java.nio.file.Files.deleteIfExists(crcTwin(src))
      } catch { case _: java.io.IOException => }
      moveReplacing(nio(src), nio(dst))
    } else FileContext.getFileContext(dst.toUri, conf)
      .rename(src, dst, Options.Rename.OVERWRITE)
  }

  /** No-clobber rename (files or directories): THROWS
    * [[org.apache.hadoop.fs.FileAlreadyExistsException]] when the
    * destination exists, never merges into it. The local path
    * pre-checks then `rename(2)`s — the same check-then-act window as
    * Hadoop's own `AbstractFileSystem.rename` (which getFileStatus-es
    * the dest before renameInternal), so racing publishers keep the
    * exact failure contract callers already handle; a dst directory
    * created INSIDE the window still fails the move itself (POSIX
    * rename onto a non-empty dir is ENOTEMPTY, caught below). */
  def renameNoClobber(conf: Configuration, src: Path, dst: Path): Unit = {
    val fs = dst.getFileSystem(conf)
    if (localFs(fs)) {
      val d = nio(dst)
      if (java.nio.file.Files.exists(d, java.nio.file.LinkOption.NOFOLLOW_LINKS))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(s"rename destination $dst exists")
      try java.nio.file.Files.move(nio(src), d, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"rename destination $dst exists: $e")
        case e: java.nio.file.DirectoryNotEmptyException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"rename destination $dst exists (non-empty dir): $e")
      }
    } else FileContext.getFileContext(dst.toUri, conf).rename(src, dst)
  }

  /** ATOMIC_MOVE alone: on POSIX, rename(2) replaces an existing dest
    * natively. The javadoc leaves replace-on-existing-dest
    * implementation-specific, though — a non-POSIX local fs (Windows)
    * may throw instead of replacing; retry once with an explicit
    * REPLACE_EXISTING, which those implementations honor (still a
    * single atomic move where the platform can provide one). */
  private def moveReplacing(src: java.nio.file.Path, dst: java.nio.file.Path): Unit =
    try java.nio.file.Files.move(src, dst,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.AccessDeniedException =>
        java.nio.file.Files.move(src, dst,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  def text(conf: Configuration, dest: Path, content: String): Unit = {
    val fs = dest.getFileSystem(conf)
    if (localFs(fs)) {
      val destNio = nio(dest)
      if (destNio.getParent != null) java.nio.file.Files.createDirectories(destNio.getParent)
      val tmp = new Path(dest.getParent, dest.getName + ".tmp")
      // pure-NIO tmp write: no .crc sidecar to fall out of sync with the
      // move, no chmod fork from a Hadoop create()
      java.nio.file.Files.write(nio(tmp), content.getBytes(StandardCharsets.UTF_8))
      // stale sidecars (this dest's, or an old checksummed tmp's) would
      // verify the NEW bytes against the OLD checksum — drop them; the
      // checksummed reader treats a missing sidecar as "don't verify"
      try {
        java.nio.file.Files.deleteIfExists(crcTwin(dest))
        java.nio.file.Files.deleteIfExists(crcTwin(tmp))
      } catch { case _: java.io.IOException => }
      moveReplacing(nio(tmp), destNio)
    } else {
      fs.mkdirs(dest.getParent)
      val tmp = new Path(dest.getParent, dest.getName + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
      FileContext.getFileContext(dest.toUri, conf)
        .rename(tmp, dest, Options.Rename.OVERWRITE)
    }
  }
}
