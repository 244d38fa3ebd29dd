package graft.operators

import org.apache.spark.sql.functions._

/** Soak for the LSH dedup path's skew machinery at viral-cluster scale:
  * one document duplicated far past the hot-bucket cap must not turn
  * the banding join quadratic, every un-skewed bucket must pass through
  * bit-identically (salt 0), and every viral member must stay ATTACHED
  * to its cluster (near-dup dedup only needs one surviving edge per
  * member, not all n² edges).
  *
  * Invariants are asserted STRUCTURALLY (bucket sizes, pair counts,
  * connectivity) rather than as wall-clock ratios — same-code timings
  * swing up to 3× on this box under co-tenant load, while the pair
  * count IS the work the join performs. */
class LshScaleSoakSpec extends graft.SparkSpec {

  private val Cap = 512

  test("a viral cluster 30x past the cap salt-splits: bounded buckets, full attachment") {
    val s = spark
    // 15,000 copies of one viral document (30x the cap) + 5,000 distinct
    // documents: the 10x-corpus shape a crawl dedup actually sees
    val viralText = "the same viral boilerplate page copied everywhere " * 4
    val viral = s.range(0, 15000)
      .select((col("id") + 1000000L).as("doc_id"), lit(viralText).as("text"))
    val distinct = s.range(0, 5000)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          (0 until 12).map(i => concat(lit(s"w$i"), pmod(col("id") * (i * 31 + 7), lit(9973)))): _*)
          .as("text"))
    val corpus = viral.unionByName(distinct)
      .withColumn("toks", expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
      .localCheckpoint()

    val bands = TextOps.saltHotBuckets(
      TextOps.bandHashes(TextOps.minhashSigsOf(corpus)), Cap).localCheckpoint()

    // 1. No post-salt bucket exceeds the cap by more than hash-imbalance
    //    slack: the viral bucket held 15,000 members (no partitioning
    //    scheme could split ONE join key) — after salting, every
    //    (band, bh, salt) group must be ~cap-sized
    val maxBucket = bands.groupBy(col("band"), col("bh"), col("salt"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).head.getLong(0)
    assert(maxBucket <= 2L * Cap,
      s"post-salt bucket of $maxBucket exceeds 2x cap ($Cap) — salting failed")

    // 2. Un-skewed buckets ride through untouched: every distinct doc's
    //    bucket is below the cap, so its salt is identically 0 (the
    //    bit-identical-pairs guarantee the exact gates rely on)
    val saltedSmall = bands.filter(col("doc_id") < 1000000L && col("salt") =!= 0L).count()
    assert(saltedSmall == 0L, s"$saltedSmall un-skewed rows got a non-zero salt")

    // 3. The candidate join's work is bounded PER JOIN KEY and in total.
    //    Unsalted, the viral bucket generates 8 bands x C(15000,2) =
    //    900M pairs with 112M of them inside EACH single join key — one
    //    task's input, unsplittable by any partitioning. Salted, no key
    //    generates more than C(2*cap, 2) ≈ 0.5M pairs, and the total
    //    generated volume is ~bands x n x cap/2 ≈ 30M (the 8 bands
    //    split independently, so their pair sets union rather than
    //    coincide — the reduction factor is n/(cap x splits) per band
    //    and grows with cluster size: a 10^6-member cluster caps at the
    //    same per-key bound).
    val l = bands.select(col("doc_id").as("id1"), col("band"), col("bh"), col("salt"))
    val r = bands.select(col("doc_id").as("id2"), col("band"), col("bh"), col("salt"))
    val perKey = bands.groupBy(col("band"), col("bh"), col("salt"))
      .agg(count(lit(1)).as("m"))
      .agg(max((col("m") * (col("m") - 1) / 2).cast("long")).as("maxPairs"),
        sum((col("m") * (col("m") - 1) / 2).cast("long")).as("genPairs")).head
    assert(perKey.getLong(0) <= 2L * Cap * (2L * Cap - 1) / 2,
      s"one join key still generates ${perKey.getLong(0)} pairs")
    assert(perKey.getLong(1) < 45000000L, // ~bands*n*cap/2 + slack; unsalted = 900M
      s"generated pair volume ${perKey.getLong(1)} — salting not engaging")
    val pairs = l.join(r, Seq("band", "bh", "salt"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2")).distinct()
      .localCheckpoint()
    val nPairs = pairs.count()
    assert(nPairs < 45000000L, s"pair explosion: $nPairs candidates")

    // 4. ...every viral member stays attached: each of the 15,000 copies
    //    appears in at least one candidate pair with another copy, so a
    //    connected-component dedup still collapses the whole cluster
    val attached = pairs
      .filter(col("id1") >= 1000000L && col("id2") >= 1000000L)
      .select(explode(array(col("id1"), col("id2"))).as("doc_id"))
      .distinct().count()
    assert(attached == 15000L, s"only $attached of 15000 viral members attached")
  }
}
