package graft
import org.apache.spark.sql.SparkSession

/** Timing sweep main: runs EVERY SparkEntry.queries entry (warm, like
  * Bench) at SPARK_GRAFT_SF_DIR and prints one `SWEEP name seconds rows`
  * line per query, slowest last. Not part of the driver contract — this is
  * the profiling loop that finds per-query outliers the 8-query Bench
  * headline can't see (dd_ngram_jaccard's 14.7 s regression at sf0.1 was
  * invisible to Bench and found by exactly this sweep). */
object Sweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val only = args.toSet
    val spark = Engine.session(cpus, appName = "graft-sweep")

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    val results = names.flatMap { name =>
      val fn = SparkEntry.queries(name)
      try {
        fn(spark, sfDir).count() // warm: codegen/JIT off the clock
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        Some((name, (System.nanoTime() - t0) / 1e9, rows))
      } catch { case scala.util.control.NonFatal(e) =>
        // fatal errors (OOM, stack overflow) must propagate: timings
        // taken in a corrupted JVM would be garbage
        System.err.println(s"[sweep] $name FAILED: $e"); None
      }
    }
    results.sortBy(_._2).foreach { case (n, s, r) =>
      println(f"SWEEP $n%-24s $s%8.3f s  ($r rows)")
    }
    println(f"SWEEP TOTAL ${results.map(_._2).sum}%.3f s over ${results.size} queries")
    println(s"SWEEP COVERAGE ${results.size}/${names.size}")
    spark.stop()
    // COMPLETENESS GUARD: an unfiltered sweep that measured fewer
    // queries than are registered exits nonzero — a silently-missing
    // row is exactly the surprise outlier the sweep exists to catch
    // (r13 shipped 176/179 measured, r14 180/186; never again).
    if (only.isEmpty && results.size != names.size) {
      System.err.println(s"[sweep] INCOMPLETE: measured ${results.size} " +
        s"of ${names.size} registered queries — failing the sweep")
      sys.exit(1)
    }
  }
}
