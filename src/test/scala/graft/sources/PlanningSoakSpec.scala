package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.FormatOps

/** Driver-side planning soak: every 100 TB claim routes through
  * `planInputPartitions` reading manifest stats, so planning must stay
  * FLAT as the file count explodes — bounded wall time, zero footer
  * opens for pruned files, one manifest parse per live view.
  *
  * The harness plants 10^4 manifest-carried entries whose zone maps
  * disprove the probe key. 9,996 of them are PHANTOMS — carried paths
  * with no file behind them — which turns "pruned files cost zero
  * opens" into a hard guarantee: if planning (or execution) ever
  * touches a pruned file, the read throws FileNotFound instead of
  * silently costing I/O. Only the live generation's one physical file
  * admits the key. */
class PlanningSoakSpec extends SparkSpec {
  private val conf = new Configuration()
  private val TotalFiles = 10000

  test("planning 10^4 carried files: bounded time, 1 scheduled, 1 parse") {
    val dir = Files.createTempDirectory("graft-soak").toString
    spark.range(0, 40000).selectExpr("id", "id % 7 AS v")
      .repartitionByRange(4, col("id")).sortWithinPartitions("id")
      .write.format("graft").mode("overwrite").save(dir)
    // keyed delete rewrites the low-range file -> gen-1 holds ONE
    // physical file (ids ~0..10k) and carries the other three by
    // reference with stats
    FormatOps.deleteWhere(spark, dir, "data", col("id") === 100L)
    val genDir = new Path(GraftDataSource.resolveDataDir(conf, dir))
    val fs = genDir.getFileSystem(conf)
    val existing = GraftDataSource.readCarryManifestFull(fs, genDir)
    // 3 carried refs + 1 self-covering entry for the DML's own output
    val carried = existing.filterNot(_._1.startsWith(genDir.getName + "/"))
    assert(carried.size == 3 && existing.size == 4 &&
      existing.forall(_._3.isDefined))
    // every CARRIED file's range sits above the probe key (50): any of
    // their stats serves as the phantom template (the self entry's range
    // covers the key and must not be the template)
    val (_, templSize, templStats) = carried.head
    // physical(1) + carried(3) + phantoms = TotalFiles in the listing
    // (the self entry dedups against the physical walk by name)
    val phantoms = (0 until TotalFiles - 1 - carried.size).map(i =>
      (f"phantom-$i%05d.graft", templSize, templStats))
    GraftDataSource.writeCarryManifest(fs, genDir, existing ++ phantoms)

    assert(GraftDataSource.listPartitionedSized(conf, dir).size == TotalFiles)

    def planOnce(): (Seq[String], Long, Long, Long) = {
      val sel = spark.read.format("graft").load(dir).filter(col("id") === 50L)
      val opens0 = graft.format.GraftFileReader.opens.get()
      val parses0 = GraftDataSource.manifestParses.get()
      val t0 = System.nanoTime()
      val scheduled = sel.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.collect {
            case p: GraftInputPartition => Seq(p.file)
            case p: GraftPackedPartition => p.files.map(_._1)
          }.flatten
      }.flatten
      val wallMs = (System.nanoTime() - t0) / 1000000L
      (scheduled,
        graft.format.GraftFileReader.opens.get() - opens0,
        GraftDataSource.manifestParses.get() - parses0,
        wallMs)
    }

    val (scheduled, opens, parses, wallMs) = planOnce()
    assert(scheduled.size == 1,
      s"want the 1 physical file scheduled, got ${scheduled.size}")
    assert(scheduled.head.contains("gen-"),
      s"the scheduled file must be the generation's own: ${scheduled.head}")
    // footer opens during planning: at most the kept file's per-chunk
    // split probe — NEVER the 9,999 pruned files
    assert(opens <= 2, s"planning opened $opens footers (want <=2)")
    assert(parses <= 1, s"planning parsed the manifest $parses times")
    // catches O(files x footer-open) planning (~minutes at 10^4 files);
    // generous for co-tenant load, an order of magnitude under failure
    assert(wallMs < 15000L, s"planning took ${wallMs}ms at 10^4 files")

    // same live view, fresh scan: the parsed-stats cache must serve
    val (scheduled2, _, parses2, wallMs2) = planOnce()
    assert(scheduled2 == scheduled)
    assert(parses2 == 0L, "second planning of the same view re-parsed the manifest")
    assert(wallMs2 < 15000L, s"cached planning took ${wallMs2}ms")

    // execution proof: phantoms were never scheduled, or this throws
    // FileNotFound; the one real file answers
    val rows = spark.read.format("graft").load(dir)
      .filter(col("id") === 50L).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 50L)

    // an unselective scan over the soak view would read phantoms — put
    // the real manifest back so later suites' temp-dir sweeps stay sane
    GraftDataSource.writeCarryManifest(fs, genDir, existing)
  }
}
