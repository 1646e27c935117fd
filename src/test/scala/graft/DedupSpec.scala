package graft

import graft.operators.Dedup

/** MinHash-LSH quality contract: candidates that survive verification are
  * exactly a subset of the exact n-gram Jaccard pairs (no false
  * positives — verification guarantees it), with recall high enough to be
  * useful (the band parameters target >0.9 for Jaccard >= 0.8).
  */
class DedupSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("LSH pairs are a subset of exact Jaccard pairs with recall >= 0.5") {
    val s = spark
    import s.implicits._
    val exact = Dedup.ngramJaccard(s, sf01)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(s, sf01)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test data has no near-dup pairs at sf0.01")
    assert((lsh -- exact).isEmpty,
      s"false positives survived verification: ${(lsh -- exact).take(3)}")
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("simhash near-dup pairs overlap the exact Jaccard pairs") {
    val s = spark
    import s.implicits._
    val exact = Dedup.ngramJaccard(s, sf01)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val sim = Dedup.simhash(s, sf01)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(sim.nonEmpty && exact.nonEmpty)
    assert(sim.intersect(exact).nonEmpty,
      "simhash buckets found none of the exact near-dups")
  }
}
