package graft

import graft.functions.TextFunctions
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Behavior checks for the text-pipeline operators whose oracles only
  * prove engine parity — these pin the *semantics* (what gets redacted,
  * what gets sampled) on hand-built inputs. */
class TextAnalysisSpec extends SparkSpec {

  test("BPE merge via literal replace has greedy left-to-right semantics") {
    // the rendering contract: merging (a,a) in [a,a,a] must yield [aa,a]
    // (no overlap) and (l,o) in [l,o,l,o] must yield [lo,lo] (back-to-back
    // both merged) — the same scan-continue-after-match semantics DuckDB's
    // replace() has, which is what makes the oracle replay bit-exact
    val s = spark
    import s.implicits._
    val got = Seq(" a  a  a ", " l  o  l  o ").toDF("sym")
      .select(
        replace(col("sym"), lit(" a  a "), lit(" aa ")),
        replace(col("sym"), lit(" l  o "), lit(" lo ")))
      .as[(String, String)].collect()
    assert(got(0)._1 == " aa  a ")
    assert(got(1)._2 == " lo  lo ")
  }

  test("ta_bpe_train learns well-formed merges; tokenize respects them") {
    val rows = TextAnalysis.bpeTrainQuery(spark, sf).collect()
    assert(rows.length == TextAnalysis.BpeMerges)
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
      (1L to TextAnalysis.BpeMerges.toLong))
    rows.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("lhs") + r.getAs[String]("rhs"))
      assert(r.getAs[Long]("freq") > 0)
    }
    // every word is at least one token and at most its char count, so
    // per doc: n_words <= n_bpe <= total chars; merges must bite (some
    // doc ends up with fewer bpe tokens than characters)
    val tok = TextAnalysis.bpeTokenize(spark, sf).collect()
    assert(tok.nonEmpty)
    tok.foreach { r =>
      assert(r.getAs[Long]("n_bpe") >= r.getAs[Long]("n_words"))
    }
  }

  test("piiScrub redacts emails, IPv4s, and phones to typed tags") {
    val s = spark
    import s.implicits._
    val got = Seq(
      "mail a.b+c@ex-ample.org now",
      "host 192.168.0.1 up",
      "call 415-555-0123 today",
      "all three x@y.io 10.0.0.7 555-867-5309",
      "no pii here 1.2 v3").toDF("t")
      .select(TextFunctions.piiScrub(col("t"))).as[String].collect()
    assert(got(0) == "mail <EMAIL> now")
    assert(got(1) == "host <IP> up")
    assert(got(2) == "call <PHONE> today")
    assert(got(3) == "all three <EMAIL> <IP> <PHONE>")
    assert(got(4) == "no pii here 1.2 v3", s"over-scrubbed: ${got(4)}")
  }

  test("ta_pii_scrub fires each injected pattern exactly once per doc") {
    val s = spark
    import s.implicits._
    val rows = TextAnalysis.piiScrubDocs(s, sf)
      .select("n_email", "n_ip", "n_phone", "clean")
      .as[(Int, Int, Int, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (e, i, p, clean) =>
      assert(e == 1 && i == 1 && p == 1, s"counts ($e,$i,$p)")
      assert(clean.contains("<EMAIL>") && clean.contains("<IP>") &&
        clean.contains("<PHONE>"))
      assert(!clean.contains("@mail.example.org"), "email survived scrub")
    }
  }

  test("sequence packing conserves docs and tokens across sequences") {
    val s = spark
    import s.implicits._
    val packed = TextAnalysis.packSequences(s, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long)].collect()
    val docs = Tables.documents(s, "/root/testdata/sf0.01")
    val totalDocs = docs.count()
    val totalToks = docs
      .select(size(TextFunctions.wsTokens(col("text"))).cast("long"))
      .as[Long].collect().sum
    assert(packed.map(_._3).sum == totalDocs, "docs lost in packing")
    assert(packed.map(_._4).sum == totalToks, "tokens lost in packing")
    // sequences within a shard are contiguous from 0
    packed.groupBy(_._1).foreach { case (shard, rows) =>
      val ids = rows.map(_._2).sorted.toSeq
      assert(ids == Seq.range(0L, ids.length.toLong),
        s"shard $shard has non-contiguous seq_ids: $ids")
    }
  }

  test("stratified sample matches a local md5-threshold replay") {
    val s = spark
    import s.implicits._
    val all = Tables.documents(s, "/root/testdata/sf0.01")
      .select("doc_id", "lang").as[(Long, String)].collect()
    def bucket(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s"sample:$id".getBytes("UTF-8"))
        .take(1).map(b => f"$b%02x").mkString
    }
    val expected = all.filter { case (id, lang) =>
      if (lang == "en") bucket(id) < "1a" else bucket(id) < "80"
    }.toSet
    val got = TextAnalysis.sampleStratified(s, "/root/testdata/sf0.01")
      .as[(Long, String)].collect().toSet
    assert(got == expected,
      s"sample mismatch: ${(got diff expected).take(3)} / ${(expected diff got).take(3)}")
    // both strata present and the en stratum is downsampled harder
    val enRate = got.count(_._2 == "en").toDouble / all.count(_._2 == "en")
    val otherRate =
      got.count(_._2 != "en").toDouble / all.count(_._2 != "en")
    assert(enRate < otherRate,
      s"en rate $enRate should be below non-en rate $otherRate")
  }

  test("cdc chunk boundaries resynchronize after a prepend; fixed don't") {
    val s2 = spark
    import s2.implicits._
    val out = graft.operators.TextAnalysis.cdcChunk(spark, "/root/testdata/sf0.01")
      .select("n_cdc_o", "shared_cdc", "n_fix_o", "shared_fix")
      .as[(Long, Long, Long, Long)].collect()
    val nCdc = out.map(_._1).sum
    val shCdc = out.map(_._2).sum
    val nFix = out.map(_._3).sum
    val shFix = out.map(_._4).sum
    // CDC keeps most chunks across the edit; fixed-width loses nearly all
    assert(shCdc * 2 > nCdc,
      s"CDC resync too weak: $shCdc of $nCdc chunks survived")
    assert(shFix * 10 < nFix,
      s"fixed chunking unexpectedly robust: $shFix of $nFix survived")
  }

  test("dsir selection enriches the target language") {
    val s2 = spark
    import s2.implicits._
    val sel = graft.operators.TextAnalysis.dsir(spark, "/root/testdata/sf0.01")
      .join(graft.Tables.documents(spark, "/root/testdata/sf0.01")
        .select("doc_id", "lang"), "doc_id")
      .groupBy($"lang" === "en")
      .agg(org.apache.spark.sql.functions.avg(
        org.apache.spark.sql.functions.when($"selected", 1.0).otherwise(0.0))
        .as("rate"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1))).toMap
    assert(sel(true) > sel(false),
      s"en selection rate ${sel(true)} not above other ${sel(false)}")
  }

  test("domain mix: sqrt-temperature upsamples small domains, budget ~half") {
    val s2 = spark
    import s2.implicits._
    val out = graft.operators.TextAnalysis.domainMix(spark, "/root/testdata/sf0.01")
      .select("doc_id", "source", "n_tok", "kept")
      .as[(Long, String, Long, Boolean)].collect()
    val kept = out.count(_._4).toDouble / out.length
    assert(kept > 0.25 && kept < 0.75, s"kept fraction $kept far from budget")
    // replay the per-domain target rate r_d ∝ s_d·T/n_d in exact integers:
    // rates must be monotone DECREASING in domain size (α=1/2 upsampling)
    val nD = out.groupBy(_._2).map { case (src, rs) =>
      src -> rs.map(_._3).sum
    }
    val sD = nD.map { case (src, n) =>
      src -> math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong
    }
    // r_d = s_d·T / (S·n_d); compare adjacent domains cross-multiplied
    val bySize = nD.toSeq.sortBy(_._2)
    for (Seq((aSrc, aN), (bSrc, bN)) <- bySize.sliding(2)) {
      if (aN < bN) {
        // r_a >= r_b  <=>  s_a·n_b >= s_b·n_a (T and S cancel)
        assert(BigInt(sD(aSrc)) * bN >= BigInt(sD(bSrc)) * aN,
          s"smaller domain $aSrc ($aN tok) not upsampled vs $bSrc ($bN)")
      }
    }
  }

  test("quality classifier learns: beats the majority-class baseline") {
    val s = spark
    import s.implicits._
    val out = operators.TextAnalysis.qualityClassifier(s, sf)
      .select(col("y"), col("pred").cast("long").as("p"))
      .as[(Long, Long)].collect()
    assert(out.nonEmpty)
    val acc = out.count { case (y, p) => y == p }.toDouble / out.length
    val pos = out.count(_._1 == 1L).toDouble / out.length
    val majority = math.max(pos, 1 - pos)
    assert(pos > 0.02 && pos < 0.98,
      s"degenerate label split $pos — the test proves nothing")
    assert(acc > majority,
      s"trained accuracy $acc does not beat majority baseline $majority")
  }

  test("ta_bm25 matches a driver-side reference computation") {
    val got = operators.TextAnalysis.bm25(spark, sf).collect()
    assert(got.nonEmpty)
    // ranks contiguous from 1, scores non-increasing within a term
    got.groupBy(_.getAs[String]("tok")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
      assert(rows.length <= operators.TextAnalysis.Bm25TopK)
      val scores = sorted.map(_.getAs[Double]("bm25"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // plain-Scala BM25 over the raw corpus (same literals, same tree)
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.get(0).toString.toLong -> r.getString(1)).toMap
    val toks = docs.view.mapValues(
      _.split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val n = docs.size
    val dl = toks.view.mapValues(_.size).toMap
    val avgdl = dl.values.map(_.toLong).sum.toDouble / n
    val df = toks.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size).toMap
    val topTerms = df.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(operators.TextAnalysis.Bm25Queries).map(_._1).toSet
    assert(got.map(_.getAs[String]("tok")).toSet == topTerms)
    got.foreach { r =>
      val (t, d) = (r.getAs[String]("tok"), r.getAs[Long]("doc_id"))
      val tf = toks(d).count(_ == t)
      assert(r.getAs[Long]("tf") == tf)
      assert(r.getAs[Long]("df") == df(t))
      val idf = math.log((n.toDouble - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
      val ref = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl(d) / avgdl))
      assert(math.abs(r.getAs[Double]("bm25") - ref) < 2e-4,
        s"bm25($t, $d) = ${r.getAs[Double]("bm25")}, reference $ref")
    }
  }
}
