package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}

/** The one atomic small-file publish protocol behind every metadata
  * marker in the source layer — schema markers, bucket-spec markers, the
  * generation pointer, the streaming file log: write a sibling `.tmp`,
  * then `FileContext.rename(OVERWRITE)`. The rename is a single atomic
  * step on HDFS/local (the FileContext contract), so a reader sees the
  * previous content or the new content, never a partial file; a crashed
  * half-write leaves only an orphan tmp.
  */
private[graft] object AtomicPublish {
  def text(conf: Configuration, dest: Path, content: String): Unit = {
    val tmp = new Path(dest.getParent, dest.getName + ".tmp")
    val fs = dest.getFileSystem(conf)
    fs.mkdirs(dest.getParent)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
    FileContext.getFileContext(dest.toUri, conf)
      .rename(tmp, dest, Options.Rename.OVERWRITE)
  }
}
