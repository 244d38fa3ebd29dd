package graft.format

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec

/** Randomized merge-on-read DML vs an in-memory model — the MoR twin of
  * [[SqlDmlFuzzSpec]]: the same UPDATE/DELETE/MERGE interleavings run
  * with all three `spark.graft.*Mode` switches set to merge-on-read, so
  * every statement lands as position delete-vectors plus replacement
  * files instead of COW rewrites. Between statements the fuzz randomly
  * flips a statement back to copy-on-write or runs a compact /
  * materialize_dvs pass — the two machineries and the maintenance
  * procedures must compose on one table with the state exactly equal to
  * the model after every step, and a final verify_table must hold. */
class MorFuzzSpec extends SparkSpec {

  private val fuzzSeeds: Seq[Int] =
    sys.props.get("graft.morfuzz.seeds")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(11, 47))

  for (seed <- fuzzSeeds) {
    test(s"random MoR/COW DML + maintenance sequences match a model (seed $seed)") {
      val r = new Random(seed)
      val cat = s"morfuzz$seed"
      val root = Files.createTempDirectory(s"graft-$cat").toString
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")

      var model: Map[Long, Long] = (0L until 600L).map(id => id -> (id % 13)).toMap
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      model.toSeq.toDF("k", "v").repartitionByRange(6, col("k"))
        .createOrReplaceTempView(s"${cat}_src")
      spark.sql(s"CREATE TABLE $cat.db.t AS SELECT * FROM ${cat}_src")

      def tableState(): Map[Long, Long] =
        spark.table(s"$cat.db.t").collect()
          .map(row => row.getLong(0) -> row.getLong(1)).toMap

      def withModes[T](mor: Boolean)(body: => T): T = {
        val mode = if (mor) "merge-on-read" else "copy-on-write"
        Seq("deleteMode", "updateMode", "mergeMode")
          .foreach(k => spark.conf.set(s"spark.graft.$k", mode))
        try body finally Seq("deleteMode", "updateMode", "mergeMode")
          .foreach(k => spark.conf.set(s"spark.graft.$k", "copy-on-write"))
      }

      (1 to 12).foreach { step =>
        val mor = r.nextInt(4) != 0 // 3/4 of the statements take the MoR path
        r.nextInt(5) match {
          case 0 =>
            val x = r.nextInt(800)
            withModes(mor)(spark.sql(s"UPDATE $cat.db.t SET v = v + 100 WHERE k < $x"))
            model = model.map { case (k, v) => k -> (if (k < x) v + 100 else v) }
          case 1 =>
            val m = 7 + r.nextInt(13)
            val rem = r.nextInt(m)
            withModes(mor)(spark.sql(s"DELETE FROM $cat.db.t WHERE k % $m = $rem"))
            model = model.filterNot { case (k, _) => k % m == rem }
          case 2 =>
            val ks = r.shuffle((0L until 900L).toVector).take(1 + r.nextInt(60))
            val batch = ks.map(k => (k, r.nextLong() % 1000))
            batch.toDF("k", "v").createOrReplaceTempView(s"${cat}_m$step")
            withModes(mor)(spark.sql(
              s"""MERGE INTO $cat.db.t t USING ${cat}_m$step s ON t.k = s.k
                 |WHEN MATCHED AND s.v < 0 THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET v = s.v
                 |WHEN NOT MATCHED AND s.v >= 0 THEN INSERT (k, v) VALUES (s.k, s.v)
                 |""".stripMargin))
            batch.foreach { case (k, v) =>
              if (model.contains(k)) {
                if (v < 0) model -= k else model += (k -> v)
              } else if (v >= 0) model += (k -> v)
            }
          case 3 => // maintenance: targeted or full materialization
            val frac = if (r.nextBoolean()) 0.0 else 0.2
            spark.sql(s"CALL $cat.sys.materialize_dvs(ns => 'db', table => 't', " +
              s"min_fraction => $frac)")
          case 4 => // maintenance: full compact (materializes + rewrites)
            spark.sql(s"CALL $cat.sys.compact(ns => 'db', target_files => ${2 + r.nextInt(4)})")
        }
        assert(tableState() == model, s"seed $seed step $step: table diverged")
      }
      // the accumulated mix of DVs, replacement files, and carried
      // references must pass the full distributed integrity walk
      val report = graft.operators.FormatOps.verifyTable(spark, s"$root/db", Some("t"))
      assert(report.nonEmpty && report.forall(_._2),
        s"seed $seed: verify_table flagged ${report.filterNot(_._2)}")
    }
  }
}
