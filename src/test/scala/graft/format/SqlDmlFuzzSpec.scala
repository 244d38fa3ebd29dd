package graft.format

import java.nio.file.Files

import scala.util.Random

import graft.SparkSpec

/** Randomized SQL row-level DML vs an in-memory model — the SQL twin of
  * [[DmlFuzzSpec]], exercising the OTHER mutation machinery: Spark's
  * group-based `SupportsRowLevelOperations` planning over
  * [[graft.sources.GraftRowLevelOperation]] (ReplaceData, `_file`-keyed
  * runtime group filtering, COW commit) plus pushable `DELETE FROM`.
  * Random interleavings of UPDATE / DELETE / MERGE (all three clauses)
  * must leave the catalog table exactly equal to the model after every
  * statement. */
class SqlDmlFuzzSpec extends SparkSpec {

  // -Dgraft.sqlfuzz.seeds=1,2,... widens the sweep for soak sessions
  private val fuzzSeeds: Seq[Int] =
    sys.props.get("graft.sqlfuzz.seeds")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(5, 31))
  for (seed <- fuzzSeeds) {
    test(s"random SQL UPDATE/DELETE/MERGE sequences match a model (seed $seed)") {
      val r = new Random(seed)
      val cat = s"sqlfuzz$seed"
      val root = Files.createTempDirectory(s"graft-$cat").toString
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")

      var model: Map[Long, Long] = (0L until 500L).map(id => id -> (id % 13)).toMap
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      model.toSeq.map { case (k, v) => (k, v) }.toDF("k", "v")
        .repartitionByRange(5, col("k"))
        .createOrReplaceTempView(s"${cat}_src")
      spark.sql(s"CREATE TABLE $cat.db.t AS SELECT * FROM ${cat}_src")

      def tableState(): Map[Long, Long] =
        spark.table(s"$cat.db.t").collect()
          .map(row => row.getLong(0) -> row.getLong(1)).toMap

      (1 to 10).foreach { step =>
        r.nextInt(3) match {
          case 0 => // UPDATE with an arithmetic SET below a threshold
            val x = r.nextInt(700)
            spark.sql(s"UPDATE $cat.db.t SET v = v + 100 WHERE k < $x")
            model = model.map { case (k, v) => k -> (if (k < x) v + 100 else v) }
          case 1 => // DELETE by modulus (sometimes matches nothing)
            val m = 7 + r.nextInt(13)
            val rem = r.nextInt(m)
            spark.sql(s"DELETE FROM $cat.db.t WHERE k % $m = $rem")
            model = model.filterNot { case (k, _) => k % m == rem }
          case 2 => // MERGE: updates + deletes + inserts in one statement
            val ks = r.shuffle((0L until 800L).toVector).take(1 + r.nextInt(60))
            val batch = ks.map(k => (k, r.nextLong() % 1000))
            batch.toDF("k", "v").createOrReplaceTempView(s"${cat}_m$step")
            spark.sql(
              s"""MERGE INTO $cat.db.t t USING ${cat}_m$step s ON t.k = s.k
                 |WHEN MATCHED AND s.v < 0 THEN DELETE
                 |WHEN MATCHED THEN UPDATE SET v = s.v
                 |WHEN NOT MATCHED AND s.v >= 0 THEN INSERT (k, v) VALUES (s.k, s.v)
                 |""".stripMargin)
            batch.foreach { case (k, v) =>
              if (model.contains(k)) {
                if (v < 0) model -= k else model += (k -> v)
              } else if (v >= 0) model += (k -> v)
            }
        }
        assert(tableState() == model, s"seed $seed step $step: table diverged")
      }
    }
  }
}
