package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (SURVEY.md §6): headline queries at SPARK_GRAFT_SF_DIR,
  * one warm run each after a session-warming query, ONE JSON line out. */
object Bench {
  // Headline set: scan-agg, join-agg, snowflake, selective scan, MR path,
  // LSH dedup, vector search, text scoring — one per subsystem.
  private val headline = Seq(
    "q02_agg_group", "q03_join_agg_topk", "q06_multi_join",
    "q07_selective_agg", "mr_wordcount", "dd_minhash_lsh",
    "sim_knn_brute", "ta_quality_score")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Engine.session(cpus, appName = "graft-bench")

    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      // warm run off the clock: codegen/JIT compilation of the generated
      // classes (a one-time session cost, irrelevant at production scale)
      try fn(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      // TWO timed passes: run-order effects (a cold broadcast build after
      // the warmup, GC timing) showed up as ±0.3 s wobble on q06 between
      // rounds with an unchanged plan — the rerun pass separates plan
      // regressions (both passes slow) from variance (rerun recovers).
      // `queries`/`value` stay pass-1, comparable with earlier rounds.
      def timed(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          // a failed query reports -1, never a fast-looking time-to-crash
          System.err.println(s"[bench] $name: $e"); -1.0 }
      }
      (name, timed(), timed())
    }
    def obj(f: ((String, Double, Double)) => (String, Double)): String =
      results.map(f).map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val qs = obj(r => (r._1, r._2))
    val qs2 = obj(r => (r._1, r._3))
    // failed queries are EXCLUDED from the total and surfaced in
    // `failures` — a crashed run must never read as a fast one, in EITHER
    // timed pass (a pass-2 crash disqualifies the query's pass-1 time too)
    val failures = results.count(r => r._2 < 0 || r._3 < 0)
    val total = results.filter(r => r._2 >= 0 && r._3 >= 0).map(_._2).sum
    // self-evidencing parallelism: the RUNTIME core count and master,
    // straight from the live context — proves the $SPARK_GRAFT_CPUS knob
    // actually bit (scan-agg queries at sf0.1 are fixed-cost-dominated,
    // so 8-vs-32-core wall times alone cannot show it)
    val par = spark.sparkContext.defaultParallelism
    val master = spark.sparkContext.master
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_rerun":$qs2,"failures":$failures,"cpus":$par,"master":"$master","sf":"$sfDir"}"""
    // also write to a file: stdout goes through sbt's [info] prefix, which
    // machine parsers choke on
    java.nio.file.Files.write(java.nio.file.Paths.get("target/bench.json"),
      json.getBytes("UTF-8"))
    spark.stop()
    // the ONE JSON object, printed after spark.stop() so it is stdout's
    // LAST line — the driver's parser takes the final line
    println(json)
  }
}
