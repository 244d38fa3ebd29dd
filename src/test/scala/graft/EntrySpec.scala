package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants for SparkEntry. */
class EntrySpec extends AnyFunSuite {
  test("every oracle key has a query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }
  test("inventory is populated and documented") {
    assert(SparkEntry.queries.size >= 70)
    // non-oracled queries are the known non-SQL-expressible set
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("q28_approx_distinct", "q35_minhash_lsh", "q36_simhash",
      "q38b_rolling_fingerprint", "q41_ann_lsh", "q44_ivf_ann"),
      s"unexpected rows-only queries: $noOracle")
  }
}
