package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** q59's star-shaped edge construction: per span digest every doc links
  * to the group's min doc_id, so a digest shared by k docs yields
  * 2(k-1) edges where the old all-pairs self-join built k(k-1). The
  * components must be IDENTICAL — any two docs sharing a digest are
  * joined through the digest's hub doc. */
class DedupClusterSpec extends SparkSpec {

  test("a span digest shared by 1,200 docs yields linear edges, not k^2") {
    val k = 1200
    // one hot digest shared by all k docs (a license header / navbar at
    // scale) plus a private digest per doc
    val wins = spark.range(0, k).selectExpr("id AS doc_id", "'HOT' AS h")
      .union(spark.range(0, k).selectExpr("id AS doc_id", "concat('p', id) AS h"))
    val n = TextOps.spanStarEdges(wins).count()
    // all-pairs would build k*(k-1) = 1,438,800 edges here
    assert(n == 2L * (k - 1), s"expected ${2 * (k - 1)} symmetric star edges, got $n")
    // and the star still reaches every doc (hub is doc 0)
    val e = TextOps.spanStarEdges(wins)
    val touched = e.select("src").union(e.select("dst")).distinct().count()
    assert(touched == k, s"star edges touch $touched of $k docs")
  }

  test("star edges produce the same connected components as all-pairs edges") {
    import spark.implicits._
    // pseudo-random doc→digest memberships: 300 docs, 2 digests each
    // drawn from 90, giving a non-trivial mix of chains and singletons
    val wins = spark.range(0, 300).selectExpr(
      "id AS doc_id",
      "explode(array(concat('d', (id * 7919) % 90), concat('d', (id * 104729) % 90))) AS h")
      .distinct()
    // driver-side union-find: fine for a 300-doc test fixture
    def components(edges: Seq[(Long, Long)], docs: Seq[Long]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(docs.map(d => d -> d): _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      docs.map(d => d -> find(d)).toMap
    }
    val docs = wins.select("doc_id").distinct().as[Long].collect().toSeq
    val star = TextOps.spanStarEdges(wins)
      .select(col("src"), col("dst")).as[(Long, Long)].collect().toSeq
    val allPairs = wins
      .join(wins.select(col("doc_id").as("dst"), col("h")), Seq("h"))
      .filter(col("doc_id") =!= col("dst"))
      .select(col("doc_id"), col("dst")).as[(Long, Long)].collect().toSeq
    assert(allPairs.size > star.size, "fixture too sparse to distinguish the shapes")
    assert(components(star, docs) == components(allPairs, docs))
  }

  test("spanWindows digests shared sentences identically across docs") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog again and again "
    val docs = Seq(
      (1L, s"alpha $shared omega"),
      (2L, s"beta $shared gamma"),
      (3L, "entirely unrelated content with no overlap whatsoever here today"))
      .toDF("doc_id", "text")
    val wins = TextOps.spanWindows(docs)
    val sharedDigests = wins.groupBy("h").agg(countDistinct("doc_id").as("k"))
      .filter(col("k") >= 2)
    assert(sharedDigests.count() > 0, "docs sharing a 40-char span must share a digest")
    // and those digests link exactly docs 1 and 2
    val linked = wins.join(sharedDigests, Seq("h")).select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(linked == Set(1L, 2L))
  }
}
