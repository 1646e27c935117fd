package graft

/** Every SparkEntry query runs end-to-end on sf0.001 and returns a sane
  * result. Value-level correctness is the DuckDB oracle's job (driver +
  * tools/check.py); this guards the API surface: every inventory entry
  * stays runnable, every oracle key stays wired to a query.
  */
class OperatorSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("storage ls lists the test tables with sizes") {
    val s = spark
    import s.implicits._
    val files = graft.operators.StorageRoundtrip.ls(s, sf)
      .as[(String, Long, Boolean)].collect()
    assert(files.exists(_._1.endsWith("lineitem.parquet")))
    assert(files.filter(!_._3).forall(_._2 > 0L))
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql keys without queries: $missing")
  }

  test("every query key appears in the SURVEY.md §2 inventory exactly once") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val s2 = survey.substring(survey.indexOf("## §2"), survey.indexOf("## §3"))
    val bad = SparkEntry.queries.keySet.toSeq.sorted.flatMap { k =>
      val n = s2.sliding(k.length + 2).count(_ == s"`$k`")
      if (n != 1) Some(s"$k (x$n)") else None
    }
    assert(bad.isEmpty,
      s"§2 inventory drift — keys not listed exactly once: $bad")
  }

  // Queries whose result can legitimately be empty at the smallest SF
  // (near-dup pairs may not exist among ~50 docs).
  private val mayBeEmpty = Set(
    "dd_minhash_lsh", "dd_simhash", "dd_ngram_jaccard", "dd_embed_cosine",
    "dd_cluster", // components of the (may-be-empty) ngram pair graph
    "q05_anti_join")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
