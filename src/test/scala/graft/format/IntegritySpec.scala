package graft.format

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.FormatOps

/** `FormatOps.verifyTable` — the distributed walk behind
  * `CALL sys.verify_table` (gate q148 covers the SQL surface and the
  * corruption direction; this spec covers the API shapes the gate
  * doesn't: table filtering over multi-table files, generation-
  * pointered layouts, and the error row's message). */
class IntegritySpec extends SparkSpec {
  private val conf = new Configuration()

  test("table filter restricts the decode; multi-table files verify per table") {
    val dir = Files.createTempDirectory("graft-integ").toString
    val file = new Path(s"$dir/multi.graft")
    val fs = file.getFileSystem(conf)
    val out = fs.create(file, true)
    val w = new GraftFileWriter(out)
    val sA = StructType(Seq(StructField("x", LongType), StructField("s", StringType)))
    val sB = StructType(Seq(StructField("y", IntegerType)))
    val ta = new TableBuffer("alpha", sA)
    val tb = new TableBuffer("beta", sB)
    val encA = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(sA).createSerializer()
    val encB = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(sB).createSerializer()
    (0 until 100).foreach(i => ta.appendRow(encA(Row(i.toLong, s"a$i")).copy()))
    (0 until 40).foreach(i => tb.appendRow(encB(Row(i * 2)).copy()))
    w.writeChunk(Seq(ta, tb))
    w.finish()
    out.close()
    val all = FormatOps.verifyTable(spark, dir)
    assert(all == Seq(("multi.graft", true, 2, 140L, None)), all.toString)
    val alphaOnly = FormatOps.verifyTable(spark, dir, Some("alpha"))
    assert(alphaOnly == Seq(("multi.graft", true, 1, 100L, None)), alphaOnly.toString)
    val none = FormatOps.verifyTable(spark, dir, Some("nope"))
    assert(none == Seq(("multi.graft", true, 0, 0L, None)),
      "an unknown table decodes nothing but still footer-verifies the file")
  }

  test("a generation-pointered table verifies its LIVE view; errors carry the message") {
    val dir = Files.createTempDirectory("graft-integ2").toString
    spark.range(0, 8000).selectExpr("id", "id % 7 AS v")
      .repartition(3).write.format("graft").mode("overwrite").save(dir)
    FormatOps.deleteWhere(spark, dir, "data",
      org.apache.spark.sql.functions.col("id") === 5L)
    val clean = FormatOps.verifyTable(spark, dir)
    assert(clean.size >= 3 && clean.forall(_._2), clean.toString)
    assert(clean.map(_._4).sum == 7999L, "live-view rows, post-DELETE")
    // flip one byte in one LIVE file: exactly that file goes red, with
    // the checksum message in-row
    val victim = graft.sources.GraftDataSource
      .listPartitionedSized(conf, dir).map(_._1).head
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(victim.toUri))
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x40).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(victim.toUri), bytes)
    val post = FormatOps.verifyTable(spark, dir)
    val bad = post.filter(!_._2)
    assert(bad.size == 1, post.toString)
    assert(bad.head._5.exists(m => m.contains("checksum") || m.contains("corrupt")),
      bad.head._5.toString)
    assert(post.count(_._2) == clean.size - 1)
  }

  test("an unsound zone-map bound is flagged: verify re-derives every stat claim") {
    // the worst corruption class — a skip PROOF that silently drops
    // rows. Plant a max bound BELOW the true max (with a valid footer
    // checksum, so only the stat audit can catch it) for each audited
    // family: integral, string, decimal.
    def tamper(mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        col: String, newMax: Array[Byte]): Seq[(String, Boolean, Int, Long, Option[String])] = {
      val dir = Files.createTempDirectory("graft-statx").toString
      mk(spark.range(0, 3000).toDF("id")).coalesce(1)
        .write.format("graft").mode("overwrite").save(dir)
      assert(FormatOps.verifyTable(spark, dir).forall(_._2), "healthy table must verify")
      val f = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".graft")).head
      val hp = new Path(f.toString)
      val fs = hp.getFileSystem(conf)
      val r = GraftFileReader.open(fs, hp)
      val footer = r.footer
      r.close()
      val tampered = footer.copy(chunks = footer.chunks.map(c => c.copy(
        tables = c.tables.map { t =>
          val idx = t.schema.fieldNames.indexOf(col)
          t.copy(stats = t.stats.zipWithIndex.map { case (st, i) =>
            if (i == idx) st.copy(max = Some(newMax)) else st
          })
        })))
      val raw = java.nio.file.Files.readAllBytes(f.toPath)
      val origLen = Bytes.le(raw).getLong(raw.length - 12)
      val fb = Meta.write(tampered)
      val tail = new Bytes(12)
      tail.putLong(fb.length.toLong)
      tail.putBytes(Meta.MagicTail)
      java.nio.file.Files.write(f.toPath,
        raw.slice(0, raw.length - 12 - origLen.toInt) ++ fb ++ tail.toArray)
      FormatOps.verifyTable(spark, dir)
    }
    import org.apache.spark.sql.functions.{col => c, expr}
    // integral: true max 2999, claim 1000
    val longBad = tamper(df => df, "id", Stats.longBytes(1000L))
    assert(longBad.exists(r => !r._2 && r._5.exists(_.contains("stats audit"))), longBad.toString)
    // string: true max "s999", claim "a" (violates the lower-than-value proof)
    val strBad = tamper(_.selectExpr("id", "concat('s', CAST(id AS STRING)) AS s"),
      "s", "a".getBytes("US-ASCII"))
    assert(strBad.exists(r => !r._2 && r._5.exists(_.contains("stats audit"))), strBad.toString)
    // decimal: unscaled claim far below the true max
    val decBad = tamper(_.select(c("id"),
      expr("CAST(id AS DECIMAL(12,2))").as("d")), "d", Stats.longBytes(5L))
    assert(decBad.exists(r => !r._2 && r._5.exists(_.contains("stats audit"))), decBad.toString)
  }
}
