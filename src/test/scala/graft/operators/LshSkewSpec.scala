package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hot-bucket skew guard for the LSH band join. A viral document copied
  * 10⁴ times collides in every band: without the guard that's one join
  * key holding 10⁴ members → 10⁸ candidate pairs in ONE task (no
  * partitioning scheme can split a single key). [[TextOps.saltHotBuckets]]
  * splits buckets above the cap into ⌈n/cap⌉ salted sub-buckets, bounding
  * every task's bucket input at ~cap while leaving un-skewed buckets
  * bit-identical (salt 0). Dedup recall survives the split: every copy
  * still pairs with its sub-bucket neighbours. */
class LshSkewSpec extends SparkSpec {
  import spark.implicits._

  private val ViralCopies = 10000
  private val Cap = 500

  private def corpus() = {
    // 400 distinct docs (≥3 tokens each, pairwise-disjoint shingles via a
    // per-doc token prefix) + 10⁴ verbatim copies of one viral doc
    val distinctDocs = (0 until 400).map { i =>
      (i.toLong, (0 until 20).map(t => s"w${i}x$t"))
    }
    val viralToks = (0 until 20).map(t => s"viral$t")
    val viral = (0 until ViralCopies).map(c => (100000L + c, viralToks))
    (distinctDocs ++ viral).toDF("doc_id", "toks")
  }

  test("viral bucket splits to ~cap members per task; dedup recall survives") {
    val bands = TextOps.saltHotBuckets(
      TextOps.bandHashes(TextOps.minhashSigsOf(corpus())), Cap)
      .localCheckpoint()

    // bounded task input: no (band, bh, salt) group exceeds 2×cap
    // (the ⌈n/cap⌉ split is by doc hash, so sub-buckets vary around cap)
    val maxBucket = bands.groupBy("band", "bh", "salt")
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).head().getLong(0)
    assert(maxBucket <= 2L * Cap,
      s"a salted sub-bucket still holds $maxBucket members (cap $Cap)")
    // and the split actually engaged: the viral doc spans many salts
    val viralSalts = bands.filter(col("doc_id") >= 100000L)
      .select(col("salt")).distinct().count()
    assert(viralSalts >= ViralCopies / Cap / 2, s"only $viralSalts sub-buckets")

    // un-skewed buckets untouched: every non-viral row keeps salt 0
    assert(bands.filter(col("doc_id") < 100000L && col("salt") =!= 0L).count() == 0)

    // dedup recall: every viral copy still meets ≥1 other copy
    val l = bands.select(col("doc_id").as("id1"), col("band"), col("bh"), col("salt"))
    val r = bands.select(col("doc_id").as("id2"), col("band"), col("bh"), col("salt"))
    val pairs = l.join(r, Seq("band", "bh", "salt"))
      .filter(col("id1") =!= col("id2"))
      .filter(col("id1") >= 100000L && col("id2") >= 100000L)
    val matched = pairs.select(col("id1")).distinct().count()
    assert(matched == ViralCopies.toLong,
      s"only $matched of $ViralCopies viral copies kept a candidate partner")

    // and the pair count is bounded ~n×cap, nowhere near the n² cliff
    val nPairs = pairs.count()
    assert(nPairs < ViralCopies.toLong * Cap * 8 * 2,
      s"pair count $nPairs suggests the quadratic bucket survived")
  }

  test("under the cap nothing changes: salt is identically zero") {
    val small = (0 until 50).map(i => (i.toLong, (0 until 10).map(t => s"d${i}t$t")))
      .toDF("doc_id", "toks")
    val bands = TextOps.saltHotBuckets(
      TextOps.bandHashes(TextOps.minhashSigsOf(small)), Cap)
    assert(bands.filter(col("salt") =!= 0L).count() == 0)
  }
}
