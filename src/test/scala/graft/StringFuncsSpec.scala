package graft

import org.apache.spark.sql.functions._

/** Pins Spark's NON-ASCII string-function semantics. The q42 oracle corpus
  * is ASCII (where Java and DuckDB agree on every function in the battery);
  * multibyte behavior is an engine contract, not a cross-engine parity
  * claim, so it's asserted here against Spark alone: code-point reverse
  * (not grapheme clusters), Unicode simple case mapping (ß → SS), and
  * code-point (not byte) lengths.
  */
class StringFuncsSpec extends SparkSpec {

  test("non-ASCII: reverse is code-point-wise, case mapping is Unicode") {
    val s = spark
    import s.implicits._
    val rows = Seq("héllo wörld", "straße", "日本語 text")
      .toDF("t")
      .select(
        reverse(col("t")).as("rev"),
        upper(col("t")).as("up"),
        lower(col("t")).as("lo"),
        translate(col("t"), "éö", "eo").as("tr"),
        length(col("t")).as("len"))
      .as[(String, String, String, String, Int)]
      .collect()

    // code-point reverse, no grapheme clustering
    assert(rows(0)._1 == "dlröw olléh")
    assert(rows(1)._1 == "eßarts")
    // Unicode case mapping: ß upper-cases to SS (length changes!)
    assert(rows(1)._2 == "STRASSE")
    assert(rows(0)._3 == "héllo wörld")
    // translate operates on code points
    assert(rows(0)._4 == "hello world")
    // length counts code points, not bytes
    assert(rows(2)._5 == 8)
    assert(rows(1)._5 == 6)
  }
}
