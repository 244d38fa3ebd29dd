package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The sweep/staging safety protocol: a concurrent grace sweep must
  * never let a rewrite publish a silently-emptied staging, must judge a
  * staging's liveness by activity INSIDE it (partitioned writes bump
  * subdir mtimes, not the staging root's), and must only ever classify
  * directories that readers recognize as generations. */
class StagingSafetySpec extends SparkSpec {
  import spark.implicits._
  private val conf = new Configuration()

  test("publishStaging refuses a staging whose liveness claim vanished") {
    val dir = Files.createTempDirectory("graft-claim").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graft").mode("overwrite").save(dir)
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    // hand-build a staging the way a rewrite would, then simulate the
    // sweep-and-resurrect race by dropping only the claim
    val staging = new Path(root, "gen-00001.tmp-test")
    Generations.claimStaging(conf, staging)
    fs.delete(new Path(staging, GraftDataSource.StagingClaimName), false)
    val e = intercept[graft.format.OliveFormatException] {
      Generations.publishStaging(fs, conf, root, staging, "gen-00001", None, dir)
    }
    assert(e.getMessage.contains("liveness claim"))
    // no generation published, no pointer written
    assert(!fs.exists(new Path(root, "gen-00001")))
    assert(GraftDataSource.readGenPointer(conf, dir).isEmpty)
    // and the happy path still publishes (fresh claim)
    val staging2 = new Path(root, "gen-00001.tmp-test2")
    Generations.claimStaging(conf, staging2)
    Generations.publishStaging(fs, conf, root, staging2, "gen-00001", None, dir)
    assert(GraftDataSource.readGenPointer(conf, dir).contains("gen-00001"))
    assert(!fs.exists(new Path(new Path(root, "gen-00001"),
      GraftDataSource.StagingClaimName)), "claim must not leak into the published gen")
  }

  test("sweep staleness looks inside the staging: fresh subdir files keep it alive") {
    val dir = Files.createTempDirectory("graft-deepstale").toString
    Seq((1L, "x")).toDF("k", "v")
      .write.format("graft").mode("overwrite").save(dir)
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    // a staging whose ROOT mtime is ancient (as a long-running
    // partitioned write's would be) but whose partition subdir holds a
    // freshly-written file
    val staging = new Path(root, "gen-00001.tmp-longrun")
    Generations.claimStaging(conf, staging)
    val sub = new Path(staging, "dt=2020-01-01")
    fs.mkdirs(sub)
    val out = fs.create(new Path(sub, "part-fresh.graft"), true)
    out.write(1); out.close()
    val old = System.currentTimeMillis() - 24L * 3600 * 1000
    fs.setTimes(staging, old, -1)
    // vacuum with a 1-hour grace: root mtime alone says "stale", the
    // fresh file inside says "active" — the staging must survive
    graft.operators.FormatOps.vacuum(spark, dir, graceMs = 3600 * 1000L)
    assert(fs.exists(staging), "active staging swept on root-mtime alone")
    // age the CONTENTS too (claim included): now it is genuinely dead
    fs.setTimes(new Path(sub, "part-fresh.graft"), old, -1)
    fs.setTimes(new Path(staging, GraftDataSource.StagingClaimName), old, -1)
    fs.setTimes(sub, old, -1)
    fs.setTimes(staging, old, -1)
    graft.operators.FormatOps.vacuum(spark, dir, graceMs = 3600 * 1000L)
    assert(!fs.exists(staging), "genuinely stale staging must be reclaimed")
  }

  test("sweep ignores gen-like dirs readers don't recognize (no 5-digit index)") {
    val dir = Files.createTempDirectory("graft-strays").toString
    Seq((1L, "x")).toDF("k", "v")
      .write.format("graft").mode("overwrite").save(dir)
    // make a real generation so a live pointer exists and sweeps engage
    graft.operators.FormatOps.compact(spark, dir, targetFiles = 1)
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    // a user's hand-made dirs: gen-1 (short index), gen-backup
    val stray1 = new Path(root, "gen-1")
    val stray2 = new Path(root, "gen-backup")
    fs.mkdirs(stray1); fs.mkdirs(stray2)
    val o = fs.create(new Path(stray1, "precious.txt"), true); o.write(7); o.close()
    val old = System.currentTimeMillis() - 24L * 3600 * 1000
    fs.setTimes(stray1, old, -1); fs.setTimes(stray2, old, -1)
    // age the pointer so superseded-data reclaim is armed
    fs.setTimes(new Path(root, GraftDataSource.GenPointerName), old, -1)
    graft.operators.FormatOps.vacuum(spark, dir, graceMs = 3600 * 1000L)
    assert(fs.exists(new Path(stray1, "precious.txt")),
      "sweep deleted a dir no reader recognizes as a generation")
    assert(fs.exists(stray2))
    // and new generations never allocate around strays: next rewrite
    // still produces a sane consecutive index
    graft.operators.FormatOps.compact(spark, dir, targetFiles = 1)
    val live = GraftDataSource.readGenPointer(conf, dir).get
    assert(GraftDataSource.genIndex(live).isDefined)
  }

  test("restore survives its target being valid; malformed grace conf is loud") {
    val dir = Files.createTempDirectory("graft-restorex").toString
    Seq((1L, "x")).toDF("k", "v").write.format("graft").mode("overwrite").save(dir)
    graft.operators.FormatOps.compact(spark, dir, targetFiles = 1)
    val before = spark.read.format("graft").load(dir).count()
    graft.operators.FormatOps.deleteWhere(spark, dir, "data", col("k") === 1L)
    Generations.restore(spark, dir, 1)
    assert(spark.read.format("graft").load(dir).count() == before)
    spark.conf.set("spark.graft.graceMs", "15m")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.operators.FormatOps.vacuum(spark, dir)
      }
      assert(e.getMessage.contains("spark.graft.graceMs"))
    } finally spark.conf.unset("spark.graft.graceMs")
  }
}
