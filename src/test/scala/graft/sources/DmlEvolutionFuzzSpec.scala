package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Seeded fuzz of keyed DML interleaved with schema evolution: renames
  * grow the chain, ADD COLUMNs age the tail, appends extend the key
  * range — and after every step the table must (a) agree with a
  * driver-side model on count/key-sum/value-sum under the CURRENT
  * spellings, and (b) stay FILE-GRANULAR: a keyed DELETE/UPDATE whose
  * key lives in exactly one range-clustered file rewrites exactly one
  * file, no matter how long the rename chain has grown (the r12 verdict
  * scale gap: untranslated classification rewrote the whole pre-rename
  * archive). */
class DmlEvolutionFuzzSpec extends SparkSpec {
  private val conf = new Configuration()

  private def carryCount(dir: String): Int = {
    val gen = GraftDataSource.readGenPointer(conf, dir).get
    GraftDataSource.readCarriedRefs(
      new Path(dir).getFileSystem(conf), new Path(dir, gen)).size
  }

  private def fileCount(dir: String): Int =
    GraftDataSource.listPartitionedSized(conf, dir).size

  for (seed <- Seq(0xD13L, 0xFA57L)) test(s"seed 0x${seed.toHexString}") {
    val rnd = new scala.util.Random(seed)
    val cat = s"graft_fz${seed.toHexString}"
    val root = Files.createTempDirectory(s"graft-dmlfuzz-$seed").toString
    val dir = s"$root/db"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (k BIGINT, v BIGINT) USING graft")
    spark.range(0, 40000).selectExpr("id AS k", "id * 3 AS v")
      .repartitionByRange(4, org.apache.spark.sql.functions.col("k"))
      .sortWithinPartitions("k")
      .writeTo(s"$cat.db.t").append()

    // driver-side model: live keys -> v; appends use fresh ascending
    // ranges so every key lives in exactly one range-clustered file
    val model = scala.collection.mutable.LongMap((0L until 40000L).map(i => i -> i * 3): _*)
    var keyCol = "k"
    var nextKey = 40000L
    var addedCols = 0
    var renames = 0

    def liveKey(): Long = {
      // a key guaranteed live: resample from the model
      val ks = model.keys.toArray
      ks(rnd.nextInt(ks.length))
    }
    def check(): Unit = {
      val row = spark.table(s"$cat.db.t")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.col(keyCol)),
          org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.col("v")))
        .head()
      assert(row.getLong(0) == model.size.toLong, s"count drifted at $keyCol")
      assert(row.getLong(1) == model.keys.sum, "key sum drifted")
      assert(row.getLong(2) == model.values.sum, "value sum drifted")
    }

    for (step <- 1 to 12) {
      rnd.nextInt(10) match {
        case 0 | 1 if renames < 4 => // rename the key column
          renames += 1
          val n = s"k$renames"
          spark.sql(s"ALTER TABLE $cat.db.t RENAME COLUMN $keyCol TO $n")
          keyCol = n
        case 2 if addedCols < 3 => // age the tail with an ADD COLUMN
          addedCols += 1
          spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN extra$addedCols BIGINT")
        case 3 | 4 | 5 => // keyed DELETE: must rewrite exactly one file
          val key = liveKey()
          val before = fileCount(dir)
          spark.sql(s"DELETE FROM $cat.db.t WHERE $keyCol = $key")
          model.remove(key)
          assert(carryCount(dir) == before - 1,
            s"step $step: keyed DELETE (chain depth $renames) rewrote " +
              s"${before - carryCount(dir)} files, want 1")
        case 6 | 7 => // keyed UPDATE: same one-file contract
          val key = liveKey()
          val before = fileCount(dir)
          spark.sql(s"UPDATE $cat.db.t SET v = v + 1000 WHERE $keyCol = $key")
          model(key) = model(key) + 1000
          assert(carryCount(dir) == before - 1,
            s"step $step: keyed UPDATE (chain depth $renames) rewrote " +
              s"${before - carryCount(dir)} files, want 1")
        case _ => // append a fresh ascending key range (own file)
          val lo = nextKey; val hi = nextKey + 2000
          nextKey = hi
          val df0 = spark.range(lo, hi).selectExpr(s"id AS $keyCol", "id * 3 AS v")
          val df = (1 to addedCols).foldLeft(df0)((d, i) =>
            d.withColumn(s"extra$i", org.apache.spark.sql.functions.expr(s"$keyCol % 7")))
          df.coalesce(1).writeTo(s"$cat.db.t").append()
          (lo until hi).foreach(i => model(i) = i * 3)
      }
      check()
    }
    // the chain-resolved key still prunes scans at the end of it all
    val key = liveKey()
    assert(spark.table(s"$cat.db.t")
      .filter(org.apache.spark.sql.functions.col(keyCol) === key).count() == 1L)
  }
}
