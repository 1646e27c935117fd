package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication pipelines (SURVEY.md §2D) — exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine.
  *
  * Scale design: nothing here is O(n²) on the full corpus. Candidate pairs
  * come from shared shingles (inverted-index join), LSH band buckets, or
  * SimHash chunk buckets; only candidates get exact verification. The
  * embedding variant is the documented brute-force correctness baseline —
  * the scale path is the LSH/IVF ANN in graft.operators.Similarity.
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

  /** Distinct (doc_id, shingle) pairs — the inverted-index base for the
    * shingle-driven dedup variants. */
  private def docShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(shingles(wsTokens(col("text")), 3)).as("shingle"))
      .distinct()

  /** Exact Jaccard over candidate pairs given as (d1, d2). */
  private def verifiedJaccard(sh: DataFrame, cands: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = cands
      .join(sh.withColumnRenamed("doc_id", "d1")
        .withColumnRenamed("shingle", "sh1"), "d1")
      .join(sh.withColumnRenamed("doc_id", "d2")
        .withColumnRenamed("shingle", "sh2"), "d2")
      .filter(col("sh1") === col("sh2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "d1")
        .withColumnRenamed("n", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2")
        .withColumnRenamed("n", "n2"), "d2")
      .select(col("d1"), col("d2"),
        (col("common").cast("double") /
          (col("n1") + col("n2") - col("common"))).as("j"))
  }

  /** dd_ngram_jaccard: 3-gram shingle Jaccard ≥ 0.8. Candidates from the
    * shingle inverted index (docs sharing ≥1 shingle), so the pair space
    * never materializes the full cross product. */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    val sh = docShingles(s, d)
    val a = sh.withColumnRenamed("doc_id", "d1")
    val b = sh.withColumnRenamed("doc_id", "d2")
    val common = a.join(b, a("shingle") === b("shingle") &&
        col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("common"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    common
      .join(sizes.withColumnRenamed("doc_id", "d1")
        .withColumnRenamed("n", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2")
        .withColumnRenamed("n", "n2"), "d2")
      .select(col("d1"), col("d2"),
        (col("common").cast("double") /
          (col("n1") + col("n2") - col("common"))).as("j"))
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

  /** MinHash signature columns m0..m127 per doc: one xxhash64 per shingle,
    * then 128 linear permutations folded by MIN — a single map-side-combined
    * aggregation, no shuffle beyond the groupBy(doc_id). */
  private def signatures(sh: DataFrame): DataFrame = {
    val h = pmod(xxhash64(col("shingle")), lit(MersenneP))
    val mins = (0 until NumPerms).map { i =>
      val a = permCoeff(i, 0x5DEECE66DL)
      val b = permCoeff(i, 0x2545F4914F6CDD1DL)
      min(pmod(lit(a) * h + lit(b), lit(MersenneP))).as(s"m$i")
    }
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** dd_minhash_lsh: band the 128-perm signature into 32 buckets of 4,
    * hash each band, join docs landing in the same (band, hash) bucket,
    * then verify candidates with exact Jaccard ≥ 0.8.
    *
    * Shuffle profile: shingle explode → groupBy(doc_id); band explode →
    * self-join on (band, key) where bucket sizes are tiny; verification
    * touches candidates only. */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    val sh = docShingles(s, d)
    val sig = signatures(sh)
    val bandStructs = array((0 until NumBands).map { bnd =>
      val cols = (0 until 4).map(r => col(s"m${bnd * 4 + r}"))
      struct(lit(bnd).as("band"),
        xxhash64(lit(bnd) +: cols: _*).as("key"))
    }: _*)
    val bands = sig.select(col("doc_id"), explode(bandStructs).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = bands.withColumnRenamed("doc_id", "d1")
    val b = bands.withColumnRenamed("doc_id", "d2")
    val cands = a.join(b,
        a("band") === b("band") && a("key") === b("key") &&
          col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
    verifiedJaccard(sh, cands).filter(col("j") >= 0.8)
      .select(col("d1"), col("d2"))
  }

  // ---- SimHash -------------------------------------------------------------

  /** dd_simhash: 64-bit SimHash over whitespace tokens (term-frequency
    * weighted), near-dup = hamming distance ≤ 3. Bucketing: split the
    * signature into 4 × 16-bit chunks — by pigeonhole, any pair within
    * hamming 3 agrees on ≥1 chunk, so the candidate join is on
    * (chunk_index, chunk_value), never all-pairs. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(wsTokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("w"))
      .withColumn("h", xxhash64(col("tok")))
    // per-bit weighted sums: +w when bit set, -w when clear
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, col("w"))
        .otherwise(-col("w"))).as(s"s$j")
    }
    val sig = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
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

  /** Sequential-fold cosine between two double-array columns — element
    * order matches the oracle's, so results are bit-identical. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** dd_embed_cosine: embedding near-dup pairs with cosine ≥ 0.45.
    * Documented brute-force baseline (all-pairs with d1 < d2) — correct at
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
