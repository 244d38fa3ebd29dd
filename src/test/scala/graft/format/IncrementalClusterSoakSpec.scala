package graft.format

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.FormatOps

/** Repeated append → incremental-recluster rounds: the maintenance loop
  * a clustered ingest table lives in. Invariants that must hold at
  * EVERY round, not just the first:
  *   - each round rewrites exactly its drift files (all earlier tilings
  *     byte-identical — cost ∝ drift forever, never re-inflating);
  *   - the record's member list equals the live listing after every
  *     round (DESCRIBE's 'clustered' claim never drifts from truth);
  *   - point queries stay planning-prunable: each tiling covers a
  *     bounded key range, so a probe schedules O(1) files no matter
  *     how many incremental rounds have run;
  *   - content is preserved exactly across the whole history.
  */
class IncrementalClusterSoakSpec extends SparkSpec {
  private val conf = new Configuration()

  test("5 append+incremental rounds: drift-only rewrites, truthful record, O(1) probes") {
    val dir = Files.createTempDirectory("graft-inc-soak").toString
    val perRound = 6000L
    spark.range(0, 48000).selectExpr("id AS k", "id % 11 AS v")
      .repartition(8)
      .write.format("graft").option("chunkrows", "2048").mode("overwrite").save(dir)
    FormatOps.cluster(spark, dir, "data", Seq("k"), targetFiles = 8,
      writeOptions = Map("chunkrows" -> "2048"))

    def fileState(): Map[String, (Long, Long)] =
      graft.sources.GraftDataSource.listFiles(conf, dir).map { p =>
        val st = p.getFileSystem(conf).getFileStatus(p)
        p.getName -> (st.getLen, st.getModificationTime)
      }.toMap
    def scheduledFiles(key: Long): Int = {
      val sel = spark.read.format("graft").load(dir).filter(col("k") === key)
      sel.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.collect {
            case p: graft.sources.GraftInputPartition => Seq(p.file)
            case p: graft.sources.GraftPackedPartition => p.files.map(_._1)
          }.flatten
      }.flatten.distinct.size
    }

    var hi = 48000L
    var settled = fileState()
    (1 to 5).foreach { round =>
      // drift lands as 2 shuffled files of new high keys
      spark.range(hi, hi + perRound).selectExpr("id AS k", "id % 11 AS v")
        .repartition(2)
        .write.format("graft").option("chunkrows", "2048").mode("append").save(dir)
      hi += perRound
      val n = FormatOps.clusterIncremental(spark, dir, "data")
      assert(n == 2, s"round $round: expected the 2 drift files reclustered, got $n")
      val now = fileState()
      // EVERY earlier tiling survives byte-identical
      settled.foreach { case (name, sig) =>
        assert(now.get(name).contains(sig),
          s"round $round rewrote settled file $name — cost is no longer ∝ drift")
      }
      // the record tells the truth: count == live, members == live names
      val spec = graft.sources.GraftDataSource.readClusterSpec(conf, dir).get
      assert(spec._3 == now.size.toLong, s"round $round: record ${spec._3} != live ${now.size}")
      assert(graft.sources.GraftDataSource.readClusterSpecFiles(conf, dir)
        .exists(_ == now.keySet), s"round $round: member list drifted from listing")
      settled = now
    }
    // content exact after the full history
    val t = spark.read.format("graft").load(dir)
    assert(t.count() == hi)
    assert(t.agg(sum("k")).head.getLong(0) == (0L until hi).sum)
    // O(1) probes across every era: the original tiling, each round's
    // tiling, and the last round — never a scan that grows with rounds
    for (key <- Seq(100L, 40000L, 49000L, 61000L, hi - 1)) {
      val n = scheduledFiles(key)
      assert(n <= 2, s"point probe k=$key schedules $n files after 5 rounds")
      assert(spark.read.format("graft").load(dir)
        .filter(col("k") === key).count() == 1L)
    }
  }
}
