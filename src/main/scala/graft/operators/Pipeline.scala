package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** End-to-end training-data pipeline (SURVEY.md §2F): the individual
  * operators composed the way a pipeline user actually runs them —
  * quality-filter → exact-dedup → deterministic split — as ONE Catalyst
  * plan. Nothing materializes between stages: the filter prunes before
  * the dedup shuffle, the dedup window is the plan's only wide exchange
  * over documents, and the split + count is a 3-group aggregate. At
  * 100 TB this chains the same way: each stage is row-local except the
  * single fingerprint shuffle.
  */
object Pipeline {

  /** pipe_clean_corpus: keep docs with quality score ≥ 0.5, drop exact
    * duplicates (keep min doc_id per normalized-text fingerprint), assign
    * md5-bucket train/val/test splits, count per split. The score/dedup/
    * split expressions are byte-identical to ta_quality_score, dd_exact
    * and ta_split, so the SQL oracle replays the whole chain exactly. */
  def cleanCorpus(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        wsTokenCount(col("text")).as("n_tok"),
        stopwordCountText(col("text")).as("stop_n"))
      .select(col("doc_id"), col("text"),
        (least(lit(1.0), col("n_tok") / 100.0) *
          (lit(1.0) - col("stop_n").cast("double") / col("n_tok")))
          .as("score"))
      .filter(col("score") >= 0.5)
    val deduped = keepMinByFp(
      scored.select(col("doc_id"), fingerprint(col("text")).as("fp")))
      .filter(col("keep"))
    deduped
      .select(col("doc_id"), splitBucket(col("doc_id")).as("split"))
      .groupBy(col("split")).agg(count(lit(1)).as("n"))
  }

  /** pipe_dedup_corpus: the full dedup story composed end-to-end — exact
    * dedup, then NEAR-dup removal via the verified n-gram pair graph's
    * connected components (every doc whose component representative isn't
    * itself is dropped), then split counts. This is the keep-one-per-
    * cluster semantics a crawl pipeline actually ships: pairs alone
    * don't dedup anything; components + representative selection do.
    * Chains [[Dedup.exact]]-shape dedup, [[Dedup.ngramJaccardDocs]],
    * [[Dedup.connectedComponents]], and the ta_split bucketing — each
    * stage's expressions byte-identical to its standalone operator, so
    * the oracle replays the chain (recursive CTE for the closure). */
  def dedupCorpus(s: SparkSession, d: String): DataFrame = {
    val exactKept = keepMinByFp(Tables.documents(s, d)
      .select(col("doc_id"), col("text"), fingerprint(col("text")).as("fp")))
      .filter(col("keep"))
      .select(col("doc_id"), col("text"))
      .localCheckpoint(true) // feeds pair-gen AND the final anti-join
    val reps = Dedup.connectedComponents(
      Dedup.ngramJaccardDocs(exactKept).select(col("d1"), col("d2")))
    val dropped = reps.filter(col("rep") =!= col("doc_id"))
      .select(col("doc_id"))
    exactKept.join(dropped, Seq("doc_id"), "left_anti")
      .select(splitBucket(col("doc_id")).as("split"))
      .groupBy(col("split")).agg(count(lit(1)).as("n"))
  }
}
