package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode

/** Plan-evidence dumper for the optimization rounds: writes
  * `.explain("formatted")` output for named queries to
  * `plans/<round>/<query>_<tag>.txt` so plan claims in OPTIMIZATION_*.md
  * are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <round> <tag> [query ...]
  * (no query list = the Bench headline set). Not part of the driver
  * contract.
  */
object PlanDump {
  private val headline = Seq(
    "q02_agg_group", "q03_join_agg_topk", "q06_multi_join",
    "q07_selective_agg", "mr_wordcount", "dd_minhash_lsh",
    "sim_knn_brute", "ta_quality_score")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val round = args.headOption.getOrElse("r20")
    val tag = args.drop(1).headOption.getOrElse("before")
    val names = if (args.length > 2) args.drop(2).toSeq else headline
    val spark = Engine.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-plandump")
    val dir = Paths.get(s"plans/$round")
    Files.createDirectories(dir)
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(FormattedMode)
      Files.write(dir.resolve(s"${n}_$tag.txt"), txt.getBytes("UTF-8"))
      println(s"[plandump] wrote plans/$round/${n}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
