package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** Rows → comparable canonical form (binary → seq, maps → sorted). */
  def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    def norm(v: Any): Any = v match {
      case b: Array[Byte] => b.toList
      case m: scala.collection.Map[_, _] =>
        m.toList.map { case (k, x) => (norm(k), norm(x)) }.sortBy(_.toString())
      // collect() yields mutable.ArraySeq for array columns — match the
      // collection root, not immutable Seq
      case s: scala.collection.Seq[_] => s.toList.map(norm)
      case r: org.apache.spark.sql.Row => r.toSeq.toList.map(norm)
      case other => other
    }
    df.collect().toSeq.map(r => norm(r).toString).sorted
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // fork-free streaming checkpoints on the local scheme (the
      // FileContext manager shells out per metadata op; see AtomicPublish)
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
