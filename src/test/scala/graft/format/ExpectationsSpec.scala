package graft.format

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.FormatOps

/** Write-time expectations: exact violation counters, drop vs fail
  * semantics, and null-predicate handling (null = violation). */
class ExpectationsSpec extends SparkSpec {

  test("drop mode: counters exact, only passing rows land, one pass") {
    val dir = Files.createTempDirectory("graft-expect").toString + "/t"
    val df = spark.range(0, 100).selectExpr(
      "id", "CASE WHEN id % 10 = 0 THEN NULL ELSE id % 7 END AS v")
    val counts = FormatOps.writeWithExpectations(spark, df, dir, Map(
      "v_known" -> col("v").isNotNull, // 10 nulls -> 10 violations
      "v_small" -> (col("v") < 6)))    // v==6 (id%7==6, id%10!=0): 13 violations + nulls
    assert(counts("v_known") == 10)
    // null v rows also violate v_small (predicate -> null counts as violation)
    val vSmallViolations = (0 until 100).count(i => i % 10 == 0 || i % 7 == 6)
    assert(counts("v_small") == vSmallViolations)
    val landed = spark.read.format("graft").load(dir)
    val expected = (0 until 100).filterNot(i => i % 10 == 0 || i % 7 == 6)
    assert(landed.count() == expected.size)
    assert(canon(landed.select("id")) == expected.map(i => s"List($i)").sorted)
  }

  test("persisted contract: later appends re-enforce it from disk") {
    val dir = Files.createTempDirectory("graft-contract").toString + "/t"
    val batch1 = spark.range(0, 50).selectExpr(
      "id", "CASE WHEN id % 10 = 0 THEN NULL ELSE id END AS v")
    val c1 = FormatOps.writeWithExpectations(spark, batch1, dir,
      Map("v_known" -> col("v").isNotNull, "v_pos" -> (col("v") >= 0)),
      persistContract = true)
    assert(c1("v_known") == 5)
    // the contract is on DISK: a fresh load sees both expectations
    val loaded = FormatOps.tableContract(spark, dir)
    assert(loaded.keySet == Set("v_known", "v_pos"))
    // a later ingest session appends UNDER the standing contract —
    // no expectations passed, the table enforces its own
    val batch2 = spark.range(100, 140).selectExpr(
      "id", "CASE WHEN id % 4 = 0 THEN NULL ELSE id END AS v")
    val c2 = FormatOps.appendWithContract(spark, batch2, dir)
    assert(c2("v_known") == 10)
    val landed = spark.read.format("graft").load(dir)
    assert(landed.count() == 45 + 30, "both batches quarantined their nulls")
    assert(landed.filter(col("v").isNull).count() == 0)
    // no contract -> loud refusal, never a silent unvalidated append
    val bare = Files.createTempDirectory("graft-nocontract").toString + "/t"
    spark.range(0, 5).selectExpr("id", "id AS v")
      .write.format("graft").mode("overwrite").save(bare)
    intercept[IllegalArgumentException] {
      FormatOps.appendWithContract(spark, batch2, bare)
    }
    // a corrupt marker fails with a typed contextual error, never a
    // silent weaker contract or a bare MatchError
    graft.sources.AtomicPublish.text(
      spark.sparkContext.hadoopConfiguration,
      new org.apache.hadoop.fs.Path(dir, FormatOps.ExpectationsName),
      "garbage with no tab\n")
    val e = intercept[OliveFormatException] {
      FormatOps.appendWithContract(spark, batch2, dir)
    }
    assert(e.getMessage.contains("corrupt"))
    // duplicate names (botched merge) must not quietly keep only the
    // LAST predicate — that would read as a weaker contract
    graft.sources.AtomicPublish.text(
      spark.sparkContext.hadoopConfiguration,
      new org.apache.hadoop.fs.Path(dir, FormatOps.ExpectationsName),
      "v_known\tv IS NOT NULL\nv_known\ttrue\n")
    val dup = intercept[OliveFormatException] {
      FormatOps.appendWithContract(spark, batch2, dir)
    }
    assert(dup.getMessage.contains("duplicate"))
  }

  test("fail mode: nothing lands when an expectation is violated") {
    val dir = Files.createTempDirectory("graft-expect-fail").toString + "/t"
    val df = spark.range(0, 50).selectExpr("id", "id % 5 AS v")
    val e = intercept[OliveFormatException] {
      FormatOps.writeWithExpectations(spark, df, dir,
        Map("no_fours" -> (col("v") =!= 4)), onViolation = "fail")
    }
    assert(e.getMessage.contains("no_fours=10"))
    assert(!new java.io.File(dir).exists(), "fail mode must not write")
    // a clean batch through fail mode lands normally
    val counts = FormatOps.writeWithExpectations(spark, df.filter(col("v") =!= 4), dir,
      Map("no_fours" -> (col("v") =!= 4)), onViolation = "fail")
    assert(counts == Map("no_fours" -> 0L))
    assert(spark.read.format("graft").load(dir).count() == 40)
  }
}
