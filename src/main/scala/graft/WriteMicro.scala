package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow

/** Dev tool: single-threaded decomposition of the graft encode path.
  * Collects lineitem rows once, then times (a) the append loop alone and
  * (b) writeChunk (encoding choice + compression) separately.
  * Usage: runMain graft.WriteMicro [sfDir] */
object WriteMicro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, sfDir)
    val schema = li.schema
    val rows: Array[InternalRow] =
      li.queryExecution.toRdd.map(_.copy()).collect()
    println(s"rows=${rows.length}")
    val out = new java.io.ByteArrayOutputStream(64 << 20)
    (1 to 5).foreach { it =>
      // append only
      val buf = new graft.format.TableBuffer("t", schema)
      val t0 = System.nanoTime()
      var i = 0
      while (i < rows.length) { buf.appendRow(rows(i)); i += 1 }
      val t1 = System.nanoTime()
      // writeChunk (encode + compress)
      out.reset()
      val w = new graft.format.GraftFileWriter(out)
      w.writeChunk(Seq(buf))
      val t2 = System.nanoTime()
      w.finish()
      println(f"iter $it: append ${(t1 - t0) / 1e9}%.3f s, writeChunk ${(t2 - t1) / 1e9}%.3f s, bytes ${out.size}")
    }
    spark.stop()
  }
}
