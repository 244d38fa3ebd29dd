package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The local-scheme write path must stay fork-free AND artifact-clean:
  * data files land via NIO create + atomic rename, so a published table
  * directory contains no `.crc` checksum sidecars (the checksummed
  * LocalFileSystem would pair one with every create) and no orphaned
  * `.tmp` staging names. A stale `.crc` would be worse than clutter —
  * the checksummed reader would verify fresh bytes against an old
  * checksum and report corruption; this spec pins the no-sidecar
  * invariant the NIO paths rely on. */
class LocalFsCleanWriteSpec extends SparkSpec {
  import spark.implicits._

  private def walk(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer[String]()
    Files.walk(root).forEach(p => if (Files.isRegularFile(p)) out += p.getFileName.toString)
    out.toSeq
  }

  test("batch write + upsert + delete leave no .crc sidecars or orphan tmps") {
    val dir = "/tmp/graft_cleanwrite"
    val hp = new org.apache.hadoop.fs.Path(dir)
    hp.getFileSystem(new org.apache.hadoop.conf.Configuration()).delete(hp, true)

    val df = (1L to 5000L).map(i => (i, s"v$i", i % 7)).toDF("k", "v", "g")
    df.repartition(4).write.format("graft").mode("overwrite").save(dir)
    graft.operators.FormatOps.upsert(spark, dir, "data",
      Seq((42L, "updated", 0L), (99999L, "new", 1L)).toDF("k", "v", "g"), Seq("k"))
    graft.operators.FormatOps.deleteWhere(spark, dir, "data", col("k") % 1000 === 7)

    val names = walk(dir)
    val crcs = names.filter(_.endsWith(".crc"))
    val tmps = names.filter(_.endsWith(".tmp"))
    assert(crcs.isEmpty, s"checksum sidecars leaked: $crcs")
    // .tmp survivors would be half-written attempts; after successful
    // commits the directory must hold none (sweeps aside, none were made)
    assert(tmps.isEmpty, s"orphan tmp files: $tmps")

    // and the data is intact through the whole DML sequence
    val got = spark.read.format("graft").load(dir)
    assert(got.filter(col("k") === 42L).select("v").as[String].head() == "updated")
    assert(got.filter(col("k") % 1000 === 7).count() == 0L)
    // 5000 base + 1 insert (k=99999) - 5 deleted (k ∈ {7,1007,2007,3007,4007})
    assert(got.count() == 4996L)
  }
}
