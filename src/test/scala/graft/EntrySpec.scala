package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants for SparkEntry. */
class EntrySpec extends AnyFunSuite with SparkSpec {
  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }
  test("inventory is populated and documented") {
    // the round-4 floor: a refactor that silently drops a module's
    // queries map from SparkEntry must fail here, not at the driver
    assert(SparkEntry.queries.size >= 126)
    // since round 15 EVERY gate carries a hash oracle: q28 (the last
    // rows-only gate) now reduces its HLL estimate to exact-verifiable
    // facts with the error bound asserted in-gate
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"unexpected rows-only queries: $noOracle")
  }
  test("every declared query executes at sf0.001") {
    // Round-6 lesson: a driver fixture-schema drift (events.ts became
    // TIMESTAMP_NTZ) killed 9 gates while `sbt test` stayed green because
    // only one query was ever executed here. Run ALL of them — any
    // AnalysisException from drift turns the build red immediately.
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory, s"driver testdata not present at $sf")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, sf).count(); None }
      catch {
        case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    assert(failures.isEmpty, s"${failures.size} queries failed:\n${failures.mkString("\n")}")
  }

  test("q29b executes under its own conf and leaves the caller session untouched") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory, s"driver testdata not present at $sf")
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    assert(spark.conf.get(key) == "true", "precondition: flag at default")
    val df = SparkEntry.queries("q29b_bucketed_join")(spark, sf)
    assert(df.count() > 0)
    assert(spark.conf.get(key) == "true",
      "q29b leaked autoBucketedScan=false into the caller session")
  }
}
