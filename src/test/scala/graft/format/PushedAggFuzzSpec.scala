package graft.format

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

/** Randomized cross-check for the round-14 pushdown surfaces: pushed
  * string/decimal MIN/MAX and decimal top-k must agree with parquet on
  * ADVERSARIALLY shaped data — string lengths straddling the 48-byte
  * stat cap (exact-serve vs decode-fallback per chunk), 0xff-adjacent
  * bytes (the bump/pad edge), random decimal precisions and scales on
  * both sides of the i64/16-byte physical boundary, negatives, nulls,
  * and multi-chunk layouts. Seeded: failures replay. */
class PushedAggFuzzSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("pushed string/decimal MIN/MAX and decimal top-k equal parquet on random data") {
    val seed = 0xA14L
    val rnd = new scala.util.Random(seed)
    (1 to 6).foreach { iter =>
      val n = 1000 + rnd.nextInt(9000)
      val cap = Stats.MaxStringStat
      // string generator: short, exactly-cap, over-cap with shared
      // prefixes, and high-byte tails near the bump edge
      def randString(): String = rnd.nextInt(5) match {
        case 0 => "" // empty is a legal extreme
        case 1 => Seq.fill(1 + rnd.nextInt(8))(rnd.nextPrintableChar()).mkString
        case 2 => "p" * cap // exactly at the cap
        case 3 => "p" * cap + rnd.nextInt(1000000).toString // over-cap, shared prefix
        case 4 => "ÿ" * (cap - 2 + rnd.nextInt(6)) + rnd.nextPrintableChar()
      }
      val (p, sc) = Seq((6, 2), (12, 4), (18, 4), (24, 6), (38, 8))(rnd.nextInt(5))
      // unscaled magnitude bounded to the precision so the cast is total
      val maxUnscaled = BigInt(10).pow(p) - 1
      val rows = Seq.tabulate(n) { i =>
        val s = if (rnd.nextInt(10) == 0) null else randString()
        val d = if (rnd.nextInt(10) == 0) null
          else BigDecimal(BigInt(rnd.nextLong()) % maxUnscaled, sc)
        // unique signed decimal: single-key ORDER BY is deterministic,
        // so the PUSHED top-k path is assertable without a tiebreak
        val u = BigDecimal(BigInt(i - n / 2) * 37 + (i % 5).toLong.abs.min(4), sc)
        (i.toLong, s, d, u)
      }
      import spark.implicits._
      val df = rows.toDF("id", "s", "d", "u")
        .select(col("id"), col("s"), col("d").cast(DecimalType(p, sc)).as("d"),
          col("u").cast(DecimalType(p, sc)).as("u"))
        .localCheckpoint()
      val dir = Files.createTempDirectory(s"graft-aggfuzz$iter").toString
      df.repartition(1 + rnd.nextInt(3)).write.format("graft")
        .option("chunkrows", (200 + rnd.nextInt(2000)).toString)
        .mode("overwrite").save(dir)
      val pq = Files.createTempDirectory(s"graft-aggfuzzpq$iter").toString
      df.write.mode("overwrite").parquet(pq)
      val g = spark.read.format("graft").load(dir)
      val pdf = spark.read.parquet(pq)
      def aggs(x: DataFrame) = x.agg(
        min("s"), max("s"), min("d"), max("d"), count(col("s")), count(col("d")))
      val gAgg = aggs(g)
      assert(plan(gAgg).contains("pushedAggs="), s"iter $iter: ${plan(gAgg)}")
      assert(canon(gAgg) == canon(aggs(pdf)), s"iter $iter (seed $seed): MIN/MAX diverged")
      // decimal top-k. Two legs: the tie-able column with an id
      // tiebreak (multi-key pushes via the STRICT leading-key skip —
      // ties at the threshold are exactly what random decimals produce,
      // so this leg fuzzes the strictness proof), and the unique column
      // single-key
      val k = 1 + rnd.nextInt(7)
      def topTied(x: DataFrame, asc: Boolean) = {
        val o = if (asc) col("d").asc else col("d").desc
        x.orderBy(o, col("id")).limit(k).select(col("id"))
      }
      val gTied = topTied(g, asc = false)
      if (p <= 18)
        assert(plan(gTied).contains("pushedTopN="), s"iter $iter: ${plan(gTied)}")
      assert(canon(gTied) == canon(topTied(pdf, asc = false)),
        s"iter $iter tied DESC top-$k")
      assert(canon(topTied(g, asc = true)) == canon(topTied(pdf, asc = true)),
        s"iter $iter tied ASC top-$k")
      def topU(x: DataFrame, asc: Boolean) = x
        .orderBy(if (asc) col("u").asc else col("u").desc).limit(k).select(col("id"))
      val gTop = topU(g, asc = false)
      if (p <= 18)
        assert(plan(gTop).contains("pushedTopN="), s"iter $iter: ${plan(gTop)}")
      assert(canon(gTop) == canon(topU(pdf, asc = false)), s"iter $iter DESC top-$k")
      assert(canon(topU(g, asc = true)) == canon(topU(pdf, asc = true)),
        s"iter $iter ASC top-$k")
    }
  }
}
