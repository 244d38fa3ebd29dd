package graft.format

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Skip-correctness fuzz: every pruning layer (manifest, chunk, block,
  * page) must be INVISIBLE to results. Random data deliberately loaded
  * with the r13 stats edge cases — NaN/±Inf/-0.0 doubles, strings past
  * the 48-byte stat cap sharing long prefixes (truncated-bound bumps),
  * nulls — then random pushed filters compared row-for-row against
  * Spark over PARQUET of the same rows: same engine, same comparison
  * semantics, so any disagreement is a wrong skip (or a wrong keep
  * that dropped rows), never an engine difference. */
class SkipFuzzSpec extends SparkSpec {

  private def canonRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  for (seed <- Seq(11L, 47L)) test(s"random filters over hostile values, seed $seed") {
    val rnd = new scala.util.Random(seed)
    val n = 30000
    // deterministic hostile columns, built driver-side for full control
    val longPrefix = "shared-prefix-" + ("x" * 40) // > 48 bytes with the tail
    val rows = (0 until n).map { i =>
      val d: java.lang.Double = rnd.nextInt(20) match {
        case 0 => Double.NaN
        case 1 => Double.PositiveInfinity
        case 2 => Double.NegativeInfinity
        case 3 => -0.0
        case 4 => 0.0
        case _ => math.floor((rnd.nextDouble() - 0.5) * 2e6) / 4.0
      }
      val s: String = rnd.nextInt(10) match {
        case 0 => null
        case 1 | 2 => longPrefix + f"${rnd.nextInt(1000)}%04d" // long, shared prefix
        case 3 => longPrefix // exactly the prefix
        case _ => f"w${rnd.nextInt(500)}%05d"
      }
      val dd: java.lang.Double = if (rnd.nextInt(15) == 0) null else d
      (i.toLong, dd, s)
    }
    val df = spark.createDataFrame(rows).toDF("id", "d", "s")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
    val gdir = Files.createTempDirectory(s"graft-skipfuzz-$seed").toString
    val pdir = Files.createTempDirectory(s"graft-skipfuzzp-$seed").toString
    df.write.format("graft").option("pagesize", "4096")
      .option("chunkrows", "4096").mode("overwrite").save(gdir)
    df.write.mode("overwrite").parquet(pdir)
    val g = spark.read.format("graft").load(gdir)
    val p = spark.read.parquet(pdir)

    val doubleLits = Seq(0.0, -0.0, 1e5, -1e5, 249999.75, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity)
    val stringLits = Seq(longPrefix, longPrefix + "0007", "w00007",
      longPrefix + "zzzz", "a", "zzzz")
    def randFilter(): org.apache.spark.sql.Column = rnd.nextInt(12) match {
      case 0 => col("d") > doubleLits(rnd.nextInt(doubleLits.size))
      case 1 => col("d") < doubleLits(rnd.nextInt(doubleLits.size))
      case 2 => col("d") === doubleLits(rnd.nextInt(doubleLits.size))
      case 3 => col("d") >= doubleLits(rnd.nextInt(doubleLits.size))
      case 4 => col("s") > stringLits(rnd.nextInt(stringLits.size))
      case 5 => col("s") < stringLits(rnd.nextInt(stringLits.size))
      case 6 => col("s") === stringLits(rnd.nextInt(stringLits.size))
      case 7 => col("s").isin(stringLits(rnd.nextInt(stringLits.size)),
        stringLits(rnd.nextInt(stringLits.size)))
      case 8 => col("id") === rnd.nextInt(n).toLong
      case 9 => col("id") > (n - 100).toLong && col("d") > 0.0
      case 10 => col("s").isNull
      case _ => col("d").isNotNull && col("s") >= stringLits(rnd.nextInt(stringLits.size))
    }

    (1 to 25).foreach { k =>
      val f = randFilter()
      val got = canonRows(g.filter(f))
      val want = canonRows(p.filter(f))
      assert(got == want,
        s"seed $seed filter #$k [$f]: graft ${got.size} rows vs parquet ${want.size}")
    }
    // and the planted extremes answer through pushed aggregates exactly
    val ga = g.agg(min("d"), max("d"), count(col("d"))).head()
    val pa = p.agg(min("d"), max("d"), count(col("d"))).head()
    assert(ga.getDouble(0) == pa.getDouble(0) || (ga.getDouble(0).isNaN && pa.getDouble(0).isNaN))
    assert(ga.getDouble(1).isNaN == pa.getDouble(1).isNaN)
    if (!ga.getDouble(1).isNaN) assert(ga.getDouble(1) == pa.getDouble(1))
    assert(ga.getLong(2) == pa.getLong(2))
  }
}
