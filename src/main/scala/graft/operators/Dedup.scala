package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions.cosine
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication pipelines (SURVEY.md §2D) — exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine.
  *
  * Scale design: nothing here is O(n²) on the full corpus, and signature
  * computation (MinHash, SimHash) is a pure per-row projection over the
  * doc's token/shingle array — zero shuffle until candidates are bucketed.
  * Candidate pairs come from shared shingles (inverted-index join), LSH
  * band buckets, or SimHash chunk buckets; only candidates get exact
  * verification. The embedding variant is the documented brute-force
  * correctness baseline — the scale path is the LSH/IVF ANN in
  * graft.operators.Similarity.
  */
object Dedup {

  /** dd_exact: exact dedup on the md5 of normalized text. Emits every doc
    * with its fingerprint and whether it is the kept representative
    * (minimum doc_id in its group) — one shuffle on the fingerprint. */
  def exact(s: SparkSession, d: String): DataFrame = {
    val byFp = Window.partitionBy(col("fp"))
    Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(byFp))
  }

  /** Distinct (doc_id, shingle-hash) rows. Shingles are built with
    * posexplode + window lead — flat codegen'd expressions throughout (a
    * higher-order transform/slice formulation evaluates interpreted and
    * measured ~10x slower). The 64-bit hash stands in for the shingle
    * string everywhere downstream: set sizes, intersections, and minhash
    * permutations are all over longs (collision odds ~1e-11 per doc). */
  private def shingleHashRows(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .select(col("doc_id"),
        posexplode(wsTokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("l1", lead(col("tok"), 1).over(w))
      .withColumn("l2", lead(col("tok"), 2).over(w))
      .filter(col("l2").isNotNull)
      .select(col("doc_id"),
        xxhash64(concat_ws(" ", col("tok"), col("l1"), col("l2"))).as("h"))
  }

  /** Shingle rows of only the docs appearing in the candidate pair set —
    * a broadcast semi-join prunes the corpus before the (re)shingling
    * window pass, so verification cost scales with candidates, not corpus. */
  private def candShingleRows(docs: DataFrame, cands: DataFrame): DataFrame = {
    val candDocs = cands
      .select(explode(array(col("d1"), col("d2"))).as("doc_id")).distinct()
    shingleHashRows(
      docs.join(broadcast(candDocs), Seq("doc_id"), "left_semi")).distinct()
  }

  /** Exact Jaccard for candidate pairs (d1, d2) from shared-hash counts.
    * Both joins key on the tiny candidate set (AQE broadcasts it); the
    * corpus-side rows are (long, long) pairs. */
  private def verifiedJaccard(shrows: DataFrame, cands: DataFrame): DataFrame = {
    val sizes = shrows.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = cands
      .join(shrows.select(col("doc_id").as("d1"), col("h")), "d1")
      .join(shrows.select(col("doc_id").as("d2b"), col("h").as("h2")),
        col("d2") === col("d2b") && col("h") === col("h2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2b"), col("n").as("n2")),
        col("d2") === col("d2b"))
      .select(col("d1"), col("d2"),
        (col("common").cast("double") /
          (col("n1") + col("n2") - col("common"))).as("j"))
  }

  /** dd_ngram_jaccard: 3-gram shingle Jaccard ≥ 0.8. Candidates from the
    * shingle inverted index (docs sharing ≥1 shingle), so the pair space
    * never materializes the full cross product. */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val shrows = shingleHashRows(docs).distinct()
    val a = shrows.select(col("doc_id").as("d1"), col("h"))
    val b = shrows.select(col("doc_id").as("d2"), col("h").as("h2"))
    // tiny; cached so the doc-filter subtree and the verification side
    // don't each re-run the candidate-generation pipeline
    val cands = a.join(b, col("h") === col("h2") && col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct().persist()
    verifiedJaccard(candShingleRows(docs, cands), cands)
      .filter(col("j") >= 0.8)
  }

  // ---- MinHash + banded LSH ------------------------------------------------

  val NumPerms = 128
  val NumBands = 32 // 4 rows per band
  private val MersenneP = 2147483647L // 2^31 - 1

  /** Deterministic permutation coefficients (splitmix-style scramble of the
    * permutation index — no RNG state, reproducible across runs). */
  private def permCoeff(i: Int, salt: Long): Long = {
    var z = i.toLong * 0x9E3779B97F4A7C15L + salt
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) & 0x7FFFFFFFL) | 1L // odd, positive, < 2^31
  }

  /** MinHash signature columns m0..m127: one groupBy(doc_id) whose 128
    * min-of-linear-rehash aggregates are all flat codegen'd expressions
    * with map-side partial aggregation. (A per-row array_min(transform)
    * formulation avoids the shuffle but higher-order functions evaluate
    * interpreted — measured several times slower than this agg.) */
  private def signatures(shrows: DataFrame): DataFrame = {
    val hp = shrows.select(col("doc_id"),
      pmod(col("h"), lit(MersenneP)).as("hp"))
    val mins = (0 until NumPerms).map { i =>
      val a = permCoeff(i, 0x5DEECE66DL)
      val b = permCoeff(i, 0x2545F4914F6CDD1DL)
      min(pmod(lit(a) * col("hp") + lit(b), lit(MersenneP))).as(s"m$i")
    }
    hp.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** dd_minhash_lsh: band the 128-perm signature into 32 buckets of 4,
    * hash each band, pair up docs landing in the same (band, key) bucket,
    * then verify candidates with exact Jaccard ≥ 0.8.
    *
    * Shuffle profile: ONE groupBy on (band, key) with tiny payloads for
    * candidate generation + the candidate-keyed verification joins. */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // no distinct before the signature agg: MIN is duplicate-insensitive
    val sig = signatures(shingleHashRows(docs))
    val bandStructs = array((0 until NumBands).map { bnd =>
      val cols = (0 until 4).map(r => col(s"m${bnd * 4 + r}"))
      struct(lit(bnd).as("band"),
        xxhash64(lit(bnd) +: cols: _*).as("key"))
    }: _*)
    val bands = sig.select(col("doc_id"), explode(bandStructs).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    // bucket members → in-bucket pairs via pairwise transform; the
    // signature projection runs once (a self-join would execute it twice)
    val cands = bands.groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))),
          y => struct(x.as("d1"), y.as("d2")))))).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
      // tiny; cached so the doc-filter subtree and the verification side
      // don't each re-run the signature/banding pipeline
      .persist()
    verifiedJaccard(candShingleRows(docs, cands), cands)
      .filter(col("j") >= 0.8)
      .select(col("d1"), col("d2"))
  }

  // ---- SimHash -------------------------------------------------------------

  /** dd_simhash: 64-bit SimHash over whitespace tokens. Computed as a
    * per-row fold over the token array (repeated tokens contribute their
    * multiplicity — exactly term-frequency weighting) — NO shuffle for
    * signatures. Near-dup = hamming ≤ 3; bucketing splits the signature
    * into 4 × 16-bit chunks (pigeonhole: ≤3 differing bits leave ≥1 chunk
    * intact), so the candidate join is on (chunk_index, chunk_value),
    * never all-pairs. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    // explode + groupBy with 64 flat sum() aggregates: all codegen'd with
    // map-side combine (per-row higher-order folds evaluate interpreted)
    val hashed = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(wsTokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2L - 1L).as(s"s$j")
    }
    val sig = hashed.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("sig"))
    val chunks = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("k"),
          shiftright(col("sig"), 16 * k).bitwiseAND(lit(0xFFFFL))
            .as("v"))): _*)).as("c"))
      .select(col("doc_id"), col("sig"), col("c.k").as("k"), col("c.v").as("v"))
    val a = chunks.select(col("doc_id").as("d1"), col("sig").as("sig1"),
      col("k"), col("v"))
    val b = chunks.select(col("doc_id").as("d2"), col("sig").as("sig2"),
      col("k"), col("v"))
    a.join(b, Seq("k", "v")).filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("sig1").bitwiseXOR(col("sig2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  // ---- Embedding cosine ----------------------------------------------------

  /** dd_embed_cosine: embedding near-dup pairs with cosine ≥ 0.45.
    * Documented brute-force baseline (all-pairs with v1 < v2) — correct at
    * any SF, quadratic by design; the scale path is the bucketed ANN in
    * Similarity (sim_ann_lsh / sim_ann_ivf). */
  def embedCosine(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = e.select(col("vec_id").as("v1"), col("v").as("va"))
    val b = e.select(col("vec_id").as("v2"), col("v").as("vb"))
    a.join(b, col("v1") < col("v2"))
      .filter(cosine(col("va"), col("vb")) >= 0.45)
      .select(col("v1"), col("v2"))
  }
}
