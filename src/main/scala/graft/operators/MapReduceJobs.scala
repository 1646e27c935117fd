package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StructField, StructType}

/** MapReduce-equivalent core jobs (SURVEY.md §2B) — the canonical jobs the
  * reference framework runs (word count, grep, sort, inverted index,
  * reduce-side join), re-expressed as Catalyst plans.
  *
  * Reference semantics (amoghbl1/HDFS-MR, MapReduce side — JobTracker/
  * TaskTracker job flow per SURVEY.md §1): split → map(k,v) → shuffle/sort
  * by key → reduce. Each job below keeps that dataflow but lets Catalyst
  * plan it: `explode` is the map phase, hash aggregation with map-side
  * partial aggregation is the combine + reduce phase, and shuffle joins
  * are reduce-side joins.
  */
object MapReduceJobs {

  private val D12 = DecimalType(12, 2)

  /** Tokenize the documents corpus — the "map" of word count. Splitting on
    * runs of whitespace keeps Spark and the DuckDB oracle in lockstep. */
  private def words(s: SparkSession, d: String) =
    // native byte-scan tokenizer (one pass, codegen'd, empties never
    // materialize) — value-identical to explode(split(text, "\\s+"))
    // with the empty-token filter, which walked a regex per row
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.functions.WsTokens(col("text"))).as("word"))

  /** mr_wordcount: flatMap(split) → count by word. Map-side partial agg
    * means the shuffle carries one row per (partition, word), not per
    * token — the classic MR combiner, for free. */
  def wordCount(s: SparkSession, d: String): DataFrame =
    words(s, d).groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** mr_grep: distributed grep — substring filter (pushed to the scan as a
    * Contains filter) then count per source file, like grep -c per input. */
  def grep(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").contains("spark"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))

  /** mr_sort: global total-order sort with an explicit global rank.
    *
    * Scale path: `repartitionByRange` samples the key distribution and
    * range-partitions (what MR's TotalOrderPartitioner does by hand), each
    * partition sorts locally, and `zipWithIndex` assigns global positions
    * with one extra count-per-partition job (a prefix-sum of partition
    * sizes) — no single-partition bottleneck at any scale. */
  def sort(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
    val parts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sorted = docs
      .repartitionByRange(parts, col("n_chars"), col("doc_id"))
      .sortWithinPartitions(col("n_chars"), col("doc_id"))
    val schema = StructType(sorted.schema.fields :+
      StructField("rank", LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    s.createDataFrame(ranked, schema)
  }

  /** mr_inverted_index: word → distinct-document count (the count form of
    * an inverted index; the posting-list form is [[invertedPostings]]). */
  def invertedIndex(s: SparkSession, d: String): DataFrame =
    words(s, d).groupBy(col("word"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))

  /** mr_inverted_postings: the classic posting-list form — word → sorted
    * distinct doc_id list, stringified so the oracle compare is exact.
    * collect_set is a mergeable (map-side combined) aggregate; the sort
    * runs per-row after aggregation, so the shuffle carries set partials,
    * never the exploded token stream. */
  def invertedPostings(s: SparkSession, d: String): DataFrame =
    words(s, d).groupBy(col("word"))
      .agg(concat_ws(",", sort_array(collect_set(col("doc_id"))))
        .as("postings"))

  /** mr_api_wordcount: word count routed through the generic user contract
    * [[graft.api.MapReduce.run]] — the user writes only map and reduce
    * (the reference's programming model); the combiner-friendly reduce
    * shape gives map-side partial aggregation exactly like the DataFrame
    * twin [[wordCount]], and the same oracle checks both. */
  def wordCountViaApi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d).select(col("text")).as[String]
    graft.api.MapReduce.run(docs)(
      t => t.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, 1L)))(
      _ + _)
      .toDF("word", "n")
  }

  /** Deterministic synthetic-graph edge generators shared by [[pagerank]]
    * and [[triangleCount]]. Every intermediate is pmod-reduced BEFORE the
    * next multiply, so nothing wraps in non-ANSI long arithmetic as long
    * as the NODE COUNT n < 2^31.5 ≈ 3.03e9 (the raw id range is
    * unbounded — ids reduce mod n first; reducing mod n commutes with the
    * polynomial, so values are identical to the unreduced form). A graph
    * beyond ~3e9 nodes needs a 128-bit mulmod; the DuckDB oracle's
    * HUGEINT promotion is exact either way, so the two sides agree at any
    * supported scale. */
  private def quadEdge(node: Column, n: Long): Column = {
    val m = pmod(node, lit(n))
    pmod(m * m + 7, lit(n))
  }
  private def quadEdge13(node: Column, n: Long): Column = {
    val m = pmod(node, lit(n))
    pmod(lit(13L) * pmod(m * m, lit(n)) + m + 5, lit(n))
  }
  private def affineEdge7(node: Column, n: Long): Column = {
    val m = pmod(node, lit(n))
    pmod(lit(7L) * m + 3, lit(n))
  }

  /** mr_pagerank: the canonical iterative MapReduce workload — 5 PageRank
    * rounds over a deterministic synthetic graph on the customer nodes
    * (two quadratic out-edges per node; quadratic so in-degrees vary and
    * mass actually concentrates). All arithmetic is INTEGER micro-units
    * (rank×10⁶, floor division) so every engine computes bit-identical
    * ranks — no float summation-order drift — and the oracle replays the
    * 5 rounds as chained SQL CTEs. Per round: one join to ship each
    * node's rank share along its edges, one groupBy(dst) sum (map-side
    * combined), one left join to apply the damping update; lineage is
    * localCheckpoint-flattened per round, the same loop discipline as
    * [[graft.operators.Dedup.connectedComponents]]. Top-20 by rank via
    * TakeOrdered. */
  def pagerank(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.customer(s, d).select(col("c_custkey").as("node"))
    val n = nodes.count()
    val edges = nodes.select(col("node").as("src"),
        quadEdge(col("node"), n).as("dst"))
      .union(nodes.select(col("node").as("src"),
        quadEdge13(col("node"), n).as("dst")))
      .distinct()
      .localCheckpoint(true)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    var ranks = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to 5) {
      val contrib = edges
        .join(ranks.select(col("node").as("src"), col("r")), "src")
        .join(outdeg, "src")
        .groupBy(col("dst")).agg(sum(expr("r DIV deg")).as("c"))
      ranks = ranks.select(col("node"))
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          expr("150000 + (85 * coalesce(c, 0)) DIV 100").as("r"))
        .localCheckpoint(true)
    }
    ranks.orderBy(col("r").desc, col("node")).limit(20)
  }

  /** mr_triangle_count: triangle counting — with PageRank, the canonical
    * iterative-graph MR workload. Reuses [[pagerank]]'s deterministic
    * quadratic edge generators (plus one affine generator for density),
    * canonicalized to an undirected simple graph (u < v, self-loops
    * dropped). The plan uses DEGREE-ORDERED ORIENTATION: each edge points
    * from its (degree, id)-lower endpoint to the higher one, which bounds
    * every node's out-degree by O(√m), so the wedge self-join enumerates
    * O(m^1.5) candidate pairs worst-case — the optimal bound — instead of
    * Σ deg² around hub nodes. On a power-law graph (the 100 TB reality)
    * that is the difference between a bounded shuffle and a hub node
    * exploding into billions of wedges. Each triangle is counted exactly
    * once, at its orientation-minimal vertex; a left-semi join closes the
    * wedge. The oracle replays the count orientation-FREE (numeric
    * a < b < c joins): per-bucket triangle totals are orientation-
    * invariant, so two deliberately different plans must agree exactly. */
  def triangleCount(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.customer(s, d).select(col("c_custkey").as("node"))
    val n = nodes.count()
    val raw = nodes.select(col("node").as("a"),
        quadEdge(col("node"), n).as("b"))
      .union(nodes.select(col("node").as("a"),
        quadEdge13(col("node"), n).as("b")))
      .union(nodes.select(col("node").as("a"),
        affineEdge7(col("node"), n).as("b")))
    val edges = raw
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // the (degree, id) total order packed into one sortable long; degree
    // and id are both < 2^31 so the packing never collides
    def okey(dg: Column, id: Column): Column = dg * lit(1L << 32) + id
    val oriented = edges
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(when(okey(col("du"), col("u")) < okey(col("dv"), col("v")),
          struct(col("u").as("src"), col("v").as("dst"),
            okey(col("dv"), col("v")).as("kdst")))
        .otherwise(struct(col("v").as("src"), col("u").as("dst"),
          okey(col("du"), col("u")).as("kdst"))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.kdst"))
      .localCheckpoint(true)
    val wedges = oriented
      .select(col("src"), col("dst").as("y"), col("kdst").as("ky"))
      .join(oriented.select(col("src"), col("dst").as("z"),
        col("kdst").as("kz")), "src")
      .where(col("ky") < col("kz"))
    val tris = wedges.join(
      oriented.select(col("src").as("y"), col("dst").as("z")),
      Seq("y", "z"), "left_semi")
    tris.select(least(col("src"), col("y"), col("z")).as("m"))
      .groupBy(pmod(col("m"), lit(10L)).as("bucket"))
      .agg(count(lit(1)).as("n_tri"))
  }

  /** mr_api_grep: grep routed through the GENERAL user contract
    * [[graft.api.MapReduce.runGroups]] — the reducer sees its key's whole
    * value group (the non-combinable MR idiom). The lambda map phase
    * can't push the substring filter to the scan (the trade a black-box
    * user function always makes vs [[grep]]'s Catalyst plan); the same
    * oracle checks both paths. */
  def grepViaApi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select(col("source"), col("text")).as[(String, String)]
    graft.api.MapReduce.runGroups(docs) { case (src, text) =>
      if (text.contains("spark")) Iterator.single((src, 1L)) else Iterator.empty
    } { (k, it) => (k, it.sum) }
      .toDF("source", "n")
  }

  /** mr_secondary_sort: the classic MR secondary-sort pattern — partition
    * by the grouping key, sort within partitions by a composite key, then
    * one streaming pass numbers each user's events in time order. This is
    * the composite-key + grouping-comparator trick MR needs a custom
    * partitioner for, expressed as repartition + sortWithinPartitions +
    * a single mapPartitions sweep with O(1) state (no per-group
    * buffering — a user's whole history never materializes in memory,
    * which is what makes it safe on a 100 TB event log). The oracle
    * replays it declaratively as a ROW_NUMBER window, proving the
    * imperative and declarative forms identical. */
  def secondarySort(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val parts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"))
      .as[(Long, Long, Long)]
      .repartition(parts, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("event_id"))
      .mapPartitions { it =>
        var curUser = Long.MinValue
        var seq = 0L
        it.map { case (u, _, e) =>
          if (u != curUser) { curUser = u; seq = 0L }
          seq += 1L
          (e, u, seq)
        }
      }.toDF("event_id", "user_id", "seq")
  }

  /** mr_mapside_join: the distributed-cache (map-side) join — the bounded
    * dimension ships to every task and the fact side never shuffles for
    * the join. Spark's broadcast hash join is Hadoop's map-side join with
    * the DistributedCache replaced by a torrent broadcast. Only nation
    * (≤ 25 rows at any SF) is broadcast — never an SF-proportional side. */
  def joinMapSide(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("c_acctbal").cast(D12)).cast("double").as("total_bal"))

  /** mr_join_tagged: MR-style reduce-side join — both inputs shuffled on
    * the join key (tagged union → co-located reduce). Forced to a shuffle
    * merge join to exercise exactly that dataflow; at real scale Catalyst
    * would pick broadcast only if one side fit. */
  def joinTagged(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d).hint("SHUFFLE_MERGE"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(D12)).cast("double").as("total"))
}
