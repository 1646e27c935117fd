package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Quality contracts for the approximate paths that the rows-only oracle
  * can't see into. */
class SimilaritySpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("simhash chunk bucketing is lossless for hamming <= 3") {
    // pigeonhole: 4 chunks, <= 3 differing bits => >= 1 identical chunk,
    // so the bucketed join must find EXACTLY the brute-force pair set
    val s = spark
    import s.implicits._
    val bits = Dedup.SimhashBits
    val bucketed = Dedup.simhash(s, sf01)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // recompute signatures the same way, brute-force all pairs in memory
    val sigRows = graft.Tables.documents(s, sf01)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokHash60(col("tok")).as("h"))
      .groupBy("doc_id")
      .agg((0 until bits).map(j =>
        sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2L - 1L).as(s"s$j")).head,
        (0 until bits).map(j =>
          sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2L - 1L).as(s"s$j")).tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(j =>
          when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _).as("sig"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (d1, s1) <- sigRows; (d2, s2) <- sigRows if d1 < d2
      if java.lang.Long.bitCount(s1 ^ s2) <= 3
    } yield (d1, d2)).toSet
    assert(bucketed == brute,
      s"missing=${(brute -- bucketed).take(3)} extra=${(bucketed -- brute).take(3)}")
  }

  test("LSH ANN finds at least half of the exact top-k at sf0.01") {
    val s = spark
    import s.implicits._
    val brute = Similarity.knnBrute(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.annLsh(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall $recall")
  }

  test("kmeans assigns every vector and uses multiple clusters") {
    val s = spark
    import s.implicits._
    val assign = Similarity.kmeans(s, sf01)
      .as[(Long, Int)].collect()
    assert(assign.length == 500)
    val clusters = assign.map(_._2).toSet
    assert(clusters.size > 1 && clusters.forall(c => c >= 0 && c < 8),
      s"clusters: $clusters")
  }

  test("filtered ANN: every hit satisfies the predicate, equals the " +
      "filter-then-rank reference over probed cells, files pruned") {
    val s = spark
    import s.implicits._
    val out = Similarity.annFiltered(s, sf01)
      .select("q_id", "n_id", "rank", "filt_ok")
      .as[(Long, Long, Int, Boolean)].collect()
    assert(out.nonEmpty)
    // the prune accounting bit: ≤ 1 stats-bearing file per probe read,
    // strictly fewer than the table's total — pruned files never opened
    assert(out.forall(_._4), "filt_ok false: a probe read kept too much")
    // the predicate actually holds on every returned neighbor
    assert(out.forall(_._2 % 4 == 1), "a hit violates the lic predicate")
    // ranks are contiguous from 1 per query
    out.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1 to rs.length),
        s"ranks not contiguous for query $q")
    }
    // reference: score probed cells brute-force, filter, rank — the
    // file prune must be invisible to the RESULT
    val (assigned, probes) = Similarity.ivfParts(s, sf01)
    val expected = assigned
      .join(probes, Seq("c_id"))
      .filter($"vec_id" =!= $"q_id" && $"vec_id" % 4 === 1)
      .select($"q_id", $"vec_id".as("n_id"),
        graft.functions.VectorFunctions.cosine($"qv", $"v").as("cos"))
    // rank in-memory (tiny): top-5 by (cos desc, n_id)
    val exp = expected.as[(Long, Long, Double)].collect()
      .groupBy(_._1).toSeq.flatMap { case (qid, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(5).zipWithIndex
          .map { case (r, i) => (qid, r._2, i + 1) }.toSeq
      }.toSet
    assert(out.map(r => (r._1, r._2, r._3)).toSet === exp,
      "filtered ANN result differs from the filter-then-rank reference")
  }

  test("hybrid over the IVF-PQ arm overlaps the brute-arm hybrid >= 0.5") {
    val s = spark
    import s.implicits._
    def tops(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val brute = tops(Similarity.hybridRrf(s, sf01))
    val ivfpq = tops(Similarity.hybridIvfPq(s, sf01))
    assert(brute.nonEmpty && ivfpq.keySet === brute.keySet)
    val overlap = brute.keys.toSeq.map(q =>
      ivfpq(q).intersect(brute(q)).size.toDouble / brute(q).size).sum /
      brute.size
    assert(overlap >= 0.5,
      f"IVF-PQ-arm hybrid overlaps brute-arm hybrid only $overlap%.2f")
  }

  test("IVF ANN recall >= 0.75 vs exact top-k at sf0.01") {
    val s = spark
    import s.implicits._
    val brute = Similarity.knnBrute(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.75, s"IVF recall $recall")
  }

  test("incremental IVF recall >= 0.7 vs exact top-k at sf0.01, and " +
      "its accounting flag holds") {
    val s = spark
    import s.implicits._
    val brute = Similarity.knnBrute(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val inc = Similarity.annIncremental(s, sf01)
    assert(inc.select("ivfinc_ok").distinct().collect()
      .map(_.getBoolean(0)).toSeq === Seq(true),
      "accretion accounting (verbatim carry / prune / row counts) failed")
    val got = inc.select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(brute).size.toDouble / brute.size
    // centroids trained on 2/3 of the corpus: slightly below the
    // full-train IVF bar is acceptable, garbage is not
    assert(recall >= 0.7, s"incremental IVF recall $recall")
  }

  test("graph ANN recall >= IVF's vs exact top-k at sf0.01") {
    val s = spark
    import s.implicits._
    val brute = Similarity.knnBrute(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val graph = Similarity.annGraph(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val gRecall = graph.intersect(brute).size.toDouble / brute.size
    val iRecall = ivf.intersect(brute).size.toDouble / brute.size
    // the high-recall family must earn its place over the partition one
    assert(gRecall >= iRecall, s"graph $gRecall < ivf $iRecall")
    assert(gRecall >= 0.75, s"graph recall $gRecall")
  }

  test("PQ ANN recall >= 0.6 vs exact top-k at sf0.01") {
    val s = spark
    import s.implicits._
    val brute = Similarity.knnBrute(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.annPq(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = pq.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"PQ recall $recall")
    assert(pq.size == brute.size, s"PQ returned ${pq.size} of ${brute.size}")
  }

  test("range search: subset of exact radius matches with recall >= 0.6") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(s, sf01)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val exact = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .filter(graft.functions.CosineSimilarity(col("qv"), col("v")) >=
        operators.Similarity.RangeTau)
      .select(col("q_id"), col("vec_id").as("n_id"))
      .as[(Long, Long)].collect().toSet
    val bucketed = operators.Similarity.rangeSearch(s, sf01)
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert((bucketed -- exact).isEmpty,
      s"false positives: ${(bucketed -- exact).take(3)}")
    val recall = bucketed.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"range-search recall $recall")
  }

  test("IVF ANN probes return full top-k result sets per query") {
    val s = spark
    import s.implicits._
    val ivf = Similarity.annIvf(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect()
    assert(ivf.length == 50, s"expected 10 queries x k=5, got ${ivf.length}")
  }

  test("sq8 top-k recall >= 0.8 vs exact brute force") {
    val s = spark
    import s.implicits._
    val exact = Similarity.knnBrute(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val sq8 = Similarity.annSq8(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(sq8.size == exact.size)
    val recall = sq8.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"sq8 recall $recall below 0.8 — int8 " +
      "quantization + exact re-rank should be near-lossless at k=5")
  }

  test("ivfpq top-k recall is within reach of its own coarse layer") {
    val s = spark
    import s.implicits._
    val exact = Similarity.knnBrute(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivfpq = Similarity.annIvfPq(s, sf01)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val rIvf = ivf.intersect(exact).size.toDouble / exact.size
    val rPq = ivfpq.intersect(exact).size.toDouble / exact.size
    // PQ can only lose recall vs its own coarse layer (same probes,
    // quantized scores) — but the 32-deep exact re-rank should keep it
    // close; 0.15 absolute headroom is generous
    assert(rPq >= rIvf - 0.15,
      s"ivfpq recall $rPq fell too far below ivf's $rIvf")
    assert(rPq >= 0.5, s"ivfpq recall $rPq below 0.5")
  }

  test("sim_hybrid_rrf fuses both arms with exact reciprocal-rank scores") {
    val got = Similarity.hybridRrf(spark, sf01).collect()
    assert(got.nonEmpty)
    // fused ranks contiguous from 1 per query
    got.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to rows.length))
    }
    // the semantic arm's ranks agree with the exact kNN baseline
    val brute = Similarity.knnBrute(spark, sf01).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank")) ->
        r.getAs[Long]("n_id")).toMap
    var semSeen = 0
    var lexSeen = 0
    got.foreach { r =>
      val iS = r.fieldIndex("rank_s")
      val iL = r.fieldIndex("rank_l")
      val rs = if (r.isNullAt(iS)) None else Some(r.getInt(iS))
      val rl = if (r.isNullAt(iL)) None else Some(r.getInt(iL))
      assert(rs.isDefined || rl.isDefined,
        "a fused row must come from at least one arm")
      // rrf is exactly the two-term reciprocal sum of its own ranks
      val expect = rs.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rl.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getAs[Double]("rrf") == expect)
      semSeen += rs.size
      lexSeen += rl.size
      rs.filter(_ <= Similarity.K).foreach { x =>
        assert(brute((r.getAs[Long]("q_id"), x)) == r.getAs[Long]("n_id"),
          "semantic arm rank disagrees with the exact kNN baseline")
      }
    }
    assert(semSeen > 0, "no fused row carried a semantic rank")
    assert(lexSeen > 0, "no fused row carried a lexical rank")
  }
}
