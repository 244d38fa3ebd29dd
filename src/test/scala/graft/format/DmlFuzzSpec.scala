package graft.format

import java.nio.file.Files

import scala.collection.mutable
import scala.util.Random

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.FormatOps
import graft.sources.GraftDataSource

/** Property-based fuzz over the MUTATION layer — the row-level-DML twin
  * of [[RandomRoundTripSpec]]'s format fuzz: a seeded random sequence of
  * upsert / delete / update / compact operations runs against both the
  * graft table and an in-memory model; after EVERY operation the live
  * table must equal the model exactly, and at the end every recorded
  * generation must still time-travel to the state the model had when
  * that generation was published. Exercises the interactions no single
  * gate does: capture-on/off upserts into freshly compacted layouts,
  * deletes whose predicate prunes everything (no-op fold), updates over
  * carried files, chains of carry manifests across many generations. */
class DmlFuzzSpec extends SparkSpec {

  private def genIndexOf(dir: String): Option[Int] =
    GraftDataSource.readGenPointer(new Configuration(), dir)
      .map(_.replaceAll("[^0-9]", "").toInt)

  // seed 47 runs over a HIVE-PARTITIONED layout (p = id % 4): the same
  // op sequence must hold when candidate files live in k=v dirs, the
  // rewrite re-routes rows through the partitioned writer, and carried
  // files keep their partition-relative paths.
  // -Dgraft.dmlfuzz.seeds=1,2,3,... widens the sweep for soak sessions
  // (seeds ending in 7 take the partitioned layout).
  private val fuzzSeeds: Seq[(Int, Boolean)] =
    sys.props.get("graft.dmlfuzz.seeds") match {
      case Some(s) => s.split(",").map(_.trim.toInt).toSeq.map(n => (n, n % 10 == 7))
      case None => Seq((11, false), (23, false), (47, true))
    }
  for ((seed, partitioned) <- fuzzSeeds) {
    test(s"random DML sequences match an in-memory model (seed $seed" +
        (if (partitioned) ", partitioned layout)" else ")")) {
      val r = new Random(seed)
      val dir = Files.createTempDirectory(s"graft-dmlfuzz$seed").toString
      import spark.implicits._

      var model: Map[Long, (Long, String)] =
        (0L until 400L).map(id => id -> (id * 3, s"s$id")).toMap
      val init = model.toSeq.map { case (id, (v, s)) => (id, v, s) }
        .toDF("id", "v", "s")
        .withColumn("p", col("id") % 4)
        .repartitionByRange(4, col("id"))
      val w = init.write.format("graft").mode("overwrite")
      (if (partitioned) w.option("partitionBy", "p") else w).save(dir)

      def liveState(): Map[Long, (Long, String)] =
        spark.read.format("graft").load(dir).collect()
          .map(row => row.getLong(row.fieldIndex("id")) ->
            (row.getLong(row.fieldIndex("v")), row.getString(row.fieldIndex("s"))))
          .toMap

      // genIndex -> the model state that generation must keep serving
      val snapshots = mutable.Map[Int, Map[Long, (Long, String)]]()

      (1 to 14).foreach { step =>
        val op = r.nextInt(6)
        op match {
          case 0 => // keyed upsert: mix of existing and brand-new keys
            val ks = r.shuffle((0L until 600L).toVector).take(1 + r.nextInt(80))
            val batch = ks.map(id => (id, r.nextLong() % 1000, s"u$step-$id"))
            FormatOps.upsert(spark, dir, "data",
              batch.toDF("id", "v", "s").withColumn("p", col("id") % 4),
              Seq("id"), captureChanges = r.nextBoolean())
            model = model ++ batch.map { case (id, v, s) => id -> (v, s) }
          case 1 => // predicate delete (sometimes matches nothing)
            val m = 2 + r.nextInt(9)
            val rem = r.nextInt(m)
            FormatOps.deleteWhere(spark, dir, "data", col("id") % m === rem)
            model = model.filterNot { case (id, _) => id % m == rem }
          case 2 => // computed update below a random threshold
            val x = r.nextInt(600)
            FormatOps.updateWhere(spark, dir, "data",
              Map("v" -> (col("v") + 7)), col("id") < x)
            model = model.map { case (id, (v, s)) =>
              id -> (if (id < x) (v + 7, s) else (v, s))
            }
          case 3 => // layout churn: everything above must survive it
            FormatOps.compact(spark, dir, 1 + r.nextInt(3))
          case 4 => // zero-grace vacuum: history reclaimed, LIVE state intact
            FormatOps.vacuum(spark, dir, graceMs = 0L)
            snapshots.clear() // time travel to reclaimed generations is over
          case 5 => // plain append of brand-new keys: lands in the LIVE
            // generation and every later DML/compact/vacuum must carry,
            // classify, and fold it like any other file
            val n = 1 + r.nextInt(30)
            val batch = (0 until n).map { j =>
              val id = 1000L + step * 100L + j
              (id, id * 2, s"a$step-$j")
            }
            val w2 = batch.toDF("id", "v", "s").withColumn("p", col("id") % 4)
              .coalesce(1).write.format("graft").mode("append")
            (if (partitioned) w2.option("partitionBy", "p") else w2).save(dir)
            model = model ++ batch.map { case (id, v, s) => id -> (v, s) }
        }
        assert(liveState() == model,
          s"seed $seed step $step (op $op): table diverged from model")
        genIndexOf(dir).foreach(g => snapshots(g) = model)
      }

      // every recorded generation still serves EXACTLY its state (the
      // default 15-min grace keeps them all alive within the test)
      snapshots.foreach { case (g, expect) =>
        val got = spark.read.format("graft").option("generation", g.toString)
          .load(dir).collect()
          .map(row => row.getLong(row.fieldIndex("id")) ->
            (row.getLong(row.fieldIndex("v")), row.getString(row.fieldIndex("s"))))
          .toMap
        assert(got == expect, s"seed $seed: generation $g no longer serves its snapshot")
      }
    }
  }

  // Concurrent mode: per round, TWO upserts on key ranges that live in
  // different files run simultaneously through the REAL upsert path.
  // Whatever the interleaving resolves to (one publishes before the
  // other plans; rename collision + optimistic rebase; the brief
  // mid-swap wait), both must report success and the table must equal
  // the model with BOTH batches applied — disjoint-key writers never
  // lose an update and never corrupt the table.
  test("concurrent disjoint-key upserts always both commit (seed 91)") {
    val r = new Random(91)
    val dir = Files.createTempDirectory("graft-dmlfuzz-conc").toString
    import spark.implicits._
    var model: Map[Long, (Long, String)] =
      ((0L until 300L) ++ (10000L until 10300L)).map(id => id -> (id, s"s$id")).toMap
    model.toSeq.map { case (id, (v, s)) => (id, v, s) }.toDF("id", "v", "s")
      .repartitionByRange(4, col("id"))
      .write.format("graft").mode("overwrite").save(dir)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      (1 to 5).foreach { round =>
        val loBatch = r.shuffle((0L until 400L).toVector).take(1 + r.nextInt(30))
          .map(id => (id, r.nextLong() % 1000, s"lo$round-$id"))
        val hiBatch = r.shuffle((10000L until 10400L).toVector).take(1 + r.nextInt(30))
          .map(id => (id, r.nextLong() % 1000, s"hi$round-$id"))
        def run(batch: Vector[(Long, Long, String)]) =
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = FormatOps.upsert(spark, dir, "data",
              batch.toDF("id", "v", "s"), Seq("id"))
          })
        val (fa, fb) = (run(loBatch), run(hiBatch))
        fa.get(120, java.util.concurrent.TimeUnit.SECONDS)
        fb.get(120, java.util.concurrent.TimeUnit.SECONDS)
        model = model ++ (loBatch ++ hiBatch).map { case (id, v, s) => id -> (v, s) }
        val live = spark.read.format("graft").load(dir).collect()
          .map(row => row.getLong(row.fieldIndex("id")) ->
            (row.getLong(row.fieldIndex("v")), row.getString(row.fieldIndex("s"))))
          .toMap
        assert(live == model, s"round $round: concurrent upserts diverged from model")
      }
    } finally pool.shutdownNow()
  }
}
