package graft.format

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Randomized additive schema evolution: interleaved `ALTER TABLE ADD
  * COLUMN` and appends written at whatever width the table had AT THAT
  * MOMENT. Every row must read back with its missing (later) columns as
  * nulls — the evolution-on-read contract — regardless of how the
  * widths interleave across files, and the declared marker must keep
  * every reader agreeing on one widest schema. */
class SchemaEvolutionFuzzSpec extends SparkSpec {

  for (seed <- Seq(3, 29)) {
    test(s"random ADD COLUMN + append sequences null-pad exactly (seed $seed)") {
      val r = new Random(seed)
      val cat = s"evofuzz$seed"
      val root = Files.createTempDirectory(s"graft-$cat").toString
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, c0 BIGINT) USING graft")

      var width = 2 // id + c0
      var nextId = 0L
      // model: every appended row at its write-time width
      var model = Vector.empty[Vector[Any]]

      (1 to 12).foreach { step =>
        if (r.nextInt(3) == 0 && width < 8) {
          spark.sql(s"ALTER TABLE $cat.db.t ADD COLUMN c${width - 1} BIGINT")
          width += 1
        } else {
          val n = 1 + r.nextInt(30)
          val rows = (0 until n).map { _ =>
            val id = nextId
            nextId += 1
            Vector[Any](id) ++ (1 until width).map(c => id * 10 + c: Any)
          }
          model ++= rows
          val schema = StructType(
            StructField("id", LongType) +:
              (1 until width).map(c => StructField(s"c${c - 1}", LongType)))
          val df = spark.createDataFrame(
            java.util.Arrays.asList(rows.map(v => Row(v: _*)): _*), schema)
          df.writeTo(s"$cat.db.t").append()
        }
        // read after EVERY step: each row null-padded to the current width
        val got = spark.table(s"$cat.db.t").collect()
          .map(row => (0 until row.length).map(i =>
            if (row.isNullAt(i)) null else row.get(i)).toVector)
          .sortBy(_.head.asInstanceOf[Long]).toVector
        val want = model.map(v => v ++ Vector.fill(width - v.size)(null))
          .sortBy(_.head.asInstanceOf[Long])
        assert(got.length == want.length, s"seed $seed step $step: row count")
        assert(got == want, s"seed $seed step $step: rows diverged")
      }
    }
  }
}
