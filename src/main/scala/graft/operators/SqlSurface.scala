package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text front-end (SURVEY.md §2C): the engine's capabilities exercised
  * through `spark.sql("...")` strings instead of the DataFrame API —
  * including the GraftExtensions-registered native expressions
  * (`rolling_hash`, `cosine_similarity`) — proving a SQL-only user gets
  * the same surface, plans, and answers. Each query here shares its DuckDB
  * oracle with the DataFrame twin it mirrors, so the two front-ends are
  * held to the same hash.
  */
object SqlSurface {

  private def view(s: SparkSession, d: String, name: String): Unit =
    Tables.table(s, d, name).createOrReplaceTempView(name)

  /** sql_text_agg: the q02 pricing summary through SQL text. The statement
    * is the engine-portable ANSI subset — the same string runs on DuckDB —
    * and Catalyst plans it identically to the DataFrame formulation (one
    * hash aggregate over the pushed-down scan). */
  val TextAggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  def textAgg(s: SparkSession, d: String): DataFrame = {
    view(s, d, "lineitem")
    s.sql(TextAggSql)
  }

  /** sql_text_rolling: the native codegen'd RollingHash expression called
    * by its SQL name — the function registration path
    * (SparkSessionExtensions.injectFunction), not the Column builder. */
  def textRolling(s: SparkSession, d: String): DataFrame = {
    view(s, d, "documents")
    s.sql("SELECT doc_id, rolling_hash(text) AS rh FROM documents")
  }

  /** sql_text_minhash: the native one-pass MinHash signature called by
    * its SQL name, probed at three permutation positions (first, middle,
    * last). The oracle recomputes those three minima from the replayable
    * modular shingle hashes — the SQL front-end, the native kernel, and
    * the oracle's aggregate formulation all held to one hash. */
  def textMinhash(s: SparkSession, d: String): DataFrame = {
    view(s, d, "documents")
    s.sql(
      """SELECT doc_id,
        |  element_at(minhash_signature(text), 1) AS m1,
        |  element_at(minhash_signature(text), 64) AS m64,
        |  element_at(minhash_signature(text), 128) AS m128
        |FROM documents
        |WHERE minhash_signature(text) IS NOT NULL""".stripMargin)
  }

  /** sql_text_knn: exact cosine top-k per query vector via SQL text, the
    * native cosine_similarity expression in a window ORDER BY. Same
    * oracle as sim_knn_brute — SQL front-end and DataFrame API are held
    * to identical results. The 10-row query side broadcasts, so the plan
    * is the same map-side scan as the DataFrame twin. */
  def textKnn(s: SparkSession, d: String): DataFrame = {
    view(s, d, "embeddings")
    s.sql(
      """SELECT q_id, n_id, rank FROM (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
        |      ORDER BY cosine_similarity(CAST(n.embedding AS ARRAY<DOUBLE>),
        |                 CAST(q.embedding AS ARRAY<DOUBLE>)) DESC, n.vec_id) AS rank
        |  FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10) t
        |WHERE rank <= 5""".stripMargin)
  }

  /** sql_recursive_cte: WITH RECURSIVE through Spark 4's UnionLoop — the
    * iterative-closure surface (org charts, BOM explosions, graph
    * reachability) that until 4.0 required a driver-side loop. The
    * hierarchy is a deterministic digit-tree over customer keys
    * (parent(k) = k DIV 10, roots are the single-digit keys), so every
    * customer resolves to a root and a depth in ⌈log10(N)⌉ recursive
    * steps — each step one key-equi join, so the whole closure is
    * O(depth) shuffles, never a driver loop, and depth grows only
    * logarithmically at 100 TB. Balances aggregate in DECIMAL (exact,
    * order-free); DuckDB replays the identical recursion with `//`
    * integer division. */
  def recursiveCte(s: SparkSession, d: String): DataFrame = {
    view(s, d, "customer")
    s.sql(
      """WITH RECURSIVE tree AS (
        |  SELECT c_custkey AS k, c_custkey AS root, 0 AS depth,
        |         CAST(c_acctbal AS DECIMAL(12,2)) AS bal
        |  FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, t.root, t.depth + 1,
        |         CAST(c.c_acctbal AS DECIMAL(12,2))
        |  FROM customer c JOIN tree t ON c.c_custkey DIV 10 = t.k
        |  WHERE c.c_custkey >= 10  -- root 0 would otherwise self-loop
        |)
        |SELECT root, depth, COUNT(*) AS n_members,
        |       CAST(SUM(bal) AS DOUBLE) AS sum_bal, MAX(k) AS max_key
        |FROM tree GROUP BY root, depth""".stripMargin)
  }
}
