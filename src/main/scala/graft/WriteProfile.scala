package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow

/** Dev tool: decompose graft write cost outside Spark's task machinery.
  * Buffers lineitem rows once, then times the row-append loop and the
  * chunk encode+compress separately over several iterations.
  * Usage: runMain graft.WriteProfile [sfDir] */
object WriteProfile {
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
    println(s"rows buffered: ${rows.length}")
    val sink = java.io.OutputStream.nullOutputStream()
    (1 to 5).foreach { it =>
      val w = new graft.format.GraftFileWriter(sink, 1 << 20, "balanced")
      var buf = new graft.format.TableBuffer("lineitem", schema)
      var tAppend = 0L
      var tChunk = 0L
      var i = 0
      while (i < rows.length) {
        val t0 = System.nanoTime()
        var j = i
        val end = math.min(i + 131072, rows.length)
        while (j < end) { buf.appendRow(rows(j)); j += 1 }
        val t1 = System.nanoTime()
        w.writeChunk(Seq(buf))
        tChunk += System.nanoTime() - t1
        tAppend += t1 - t0
        buf = new graft.format.TableBuffer("lineitem", schema)
        i = end
      }
      println(f"iter $it: append ${tAppend / 1e9}%.3f s, chunk ${tChunk / 1e9}%.3f s")
    }
    spark.stop()
  }
}
