package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Storage source/sink roundtrips (SURVEY.md §2A) — the reference's HDFS
  * put/get/list path (amoghbl1/HDFS-MR NameNode/DataNode block storage,
  * per SURVEY.md §1) re-expressed as Spark sources: write a slice out in
  * a format, read it back through the corresponding source, aggregate.
  *
  * Numeric columns travel as DECIMAL(12,2) (exact text representation) so
  * the roundtrip is lossless in CSV/JSON; the oracle computes the same
  * aggregate straight from parquet.
  */
object StorageRoundtrip {

  private val D12 = DecimalType(12, 2)

  /** Per-process scratch dir: two concurrent runs (say, the driver's
    * verify and a local one) must not overwrite each other's sink dirs. */
  private def tmp(name: String): String = graft.Fs.scratch("graft_rt", name)

  /** The reference's `list` operation: enumerate a storage path through
    * the Hadoop FileSystem API (works for any supported scheme — local,
    * HDFS, s3a) as a DataFrame of (path, bytes, is_dir). Driver-side
    * listing by design: it's metadata, not data. */
  def ls(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p).toSeq.map { st =>
      (st.getPath.toString, st.getLen, st.isDirectory)
    }
    entries.toDF("path", "bytes", "is_dir")
  }

  /** q35: the reference's `list` primitive as a checked query — enumerate
    * the source dir via [[ls]], project (name, bytes) for plain files.
    * The oracle replays the same listing with DuckDB's read_blob glob. */
  def listDir(s: SparkSession, d: String): DataFrame =
    ls(s, d).filter(!col("is_dir"))
      .select(regexp_extract(col("path"), "[^/]+$", 0).as("name"),
        col("bytes"))

  /** q25: CSV sink + source. Header on, explicit schema on read-back (no
    * inference scan at scale). */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = tmp("csv_lineitem")
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_quantity").cast(D12).as("qty"),
        col("l_extendedprice").cast(D12).as("price"))
      .write.mode("overwrite").option("header", "true").csv(out)
    s.read
      .schema("l_orderkey LONG, l_returnflag STRING, qty DECIMAL(12,2), price DECIMAL(12,2)")
      .option("header", "true").csv(out)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("qty")).cast("double").as("sum_qty"),
        sum(col("price")).cast("double").as("sum_price"))
  }

  /** q26: JSON sink + source. Dates stringified before the sink so the
    * roundtrip has no timezone/format ambiguity. */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = tmp("json_orders")
    Tables.orders(s, d)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast(D12).as("price"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
      .write.mode("overwrite").json(out)
    s.read
      .schema("o_orderkey LONG, o_orderstatus STRING, price DECIMAL(12,2), odate STRING")
      .json(out)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("price")).cast("double").as("sum_price"),
        min(col("odate")).as("first_date"))
  }

  /** q28: hive-style partitioned parquet sink + source. The read-back
    * filter on the partition column never touches non-matching files —
    * partition pruning (PartitionFilters in the scan), the layout pattern
    * that makes 100 TB tables scannable. */
  def partitionedWrite(s: SparkSession, d: String): DataFrame = {
    val out = tmp("part_orders")
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast(D12).as("price"), col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    s.read.parquet(out)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("price")).cast("double").as("sum_price"))
  }

  /** q36: ORC sink + source — the second columnar format Spark ships
    * natively (predicate pushdown + column pruning work the same as
    * parquet). The oracle computes the identical aggregate straight from
    * the parquet original, proving the roundtrip lossless. */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = tmp("orc_lineitem")
    Tables.lineitem(s, d)
      .filter(col("l_discount") >= 0.05)
      .select(col("l_orderkey"), col("l_linestatus"),
        col("l_quantity").cast(D12).as("qty"),
        col("l_extendedprice").cast(D12).as("price"))
      .write.mode("overwrite").orc(out)
    s.read.orc(out)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("qty")).cast("double").as("sum_qty"),
        sum(col("price")).cast("double").as("sum_price"))
  }

  /** Bucketed tables already created in THIS JVM, per source dir: the
    * one-time write-side shuffle is the amortized cost of bucketing —
    * re-paying it on every invocation (bench rerun, sweep pass) would
    * measure the CREATE TABLEs, not the exchange-free join. */
  private val bucketedFor =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  /** op_bucketed_join: co-located join via bucketed tables — both sides
    * written `bucketBy` the join key, so the join needs NO exchange at
    * any scale (the layout IS the shuffle, paid once at write time and
    * amortized over every subsequent join; PlanSpec proves the
    * zero-Exchange plan). The oracle is the plain join — bucketing must
    * be invisible in results. */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    // the cache outlives a SparkSession: a fresh session's in-memory
    // catalog has never seen the tables, so validate before reuse
    val cached = bucketedFor.get(d).filter { case (li, ord) =>
      s.catalog.tableExists(li) && s.catalog.tableExists(ord) }
    val (liT, ordT) = cached.getOrElse {
      val suffix = (d.hashCode & 0x7fffffff).toString
      val (li, ord) = (s"graft_li_bkt_$suffix", s"graft_ord_bkt_$suffix")
      Seq(li, ord).foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS $t")
        // a fresh in-memory catalog doesn't know about table dirs left
        // by a previous run of this JVM's warehouse — clear stale
        // locations (recursively: a killed run can leave _temporary/
        // subtrees) before CTAS, or saveAsTable fails with "location
        // already exists"
        val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        graft.Fs.deleteRecursively(s"$wh/$t")
      }
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity").cast(D12).as("qty"))
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable(li)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable(ord)
      bucketedFor(d) = (li, ord)
      (li, ord)
    }
    s.table(liT)
      .join(s.table(ordT), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("qty")).cast("double").as("sum_qty"))
  }

  /** q40: schema evolution — two parquet generations (v2 adds a column)
    * read back as ONE table via mergeSchema; the old generation's missing
    * column reads as NULL. This is how a long-lived 100 TB table actually
    * looks on disk: readers must span schema versions without a rewrite.
    * The oracle replays the union with an explicit NULL column. */
  def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val out = tmp("schema_evo_orders")
    val orders = Tables.orders(s, d)
    orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey"), col("o_totalprice").cast(D12).as("price"))
      .write.mode("overwrite").parquet(s"$out/gen=1")
    orders.filter(pmod(col("o_orderkey"), lit(2)) === 1)
      .select(col("o_orderkey"), col("o_totalprice").cast(D12).as("price"),
        col("o_orderstatus"))
      .write.mode("overwrite").parquet(s"$out/gen=2")
    s.read.option("mergeSchema", "true").parquet(out)
      .agg(count(lit(1)).as("n"),
        sum(col("price")).cast("double").as("sum_price"),
        count(col("o_orderstatus")).as("n_status"))
  }

  /** q44_compaction: small-file compaction — the table-maintenance job
    * every long-lived big table needs. Streaming appends / tiny batch
    * writes leave a 100 TB table as millions of KB-scale files, and scan
    * cost becomes per-FILE overhead (open + footer + seek), not data.
    * Here: orders deliberately fragmented into 64 tiny files, then
    * compacted by rewriting with a partition count derived from actual
    * on-disk bytes over a target file size — the standard OPTIMIZE /
    * rewrite-data-files recipe, expressed as one repartition + write.
    *
    * Oracle design: compaction must be CONTENT-INVARIANT, so the output
    * is the per-status aggregate of the compacted table (hash-checked
    * against the base table straight from parquet) plus file-count
    * booleans the oracle asserts TRUE (fragmented > compacted ∧ compacted
    * ≤ target) — a compaction that loses rows, alters values, or fails to
    * reduce file count flips the row red.
    *
    * This demonstrates the rewrite recipe in isolation; the committed,
    * reader-isolated form (rewrite staged + atomic manifest advance, old
    * snapshot still readable) is [[TxnTable.compact]], checked by
    * op_txn_commit. */
  def compaction(s: SparkSession, d: String): DataFrame = {
    val outSmall = tmp("compact_small")
    val outBig = tmp("compact_big")
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast(D12).as("price"))
    orders.repartition(64).write.mode("overwrite").parquet(outSmall)
    def parquetFiles(dir: String): Seq[(String, Long)] = {
      import s.implicits._
      ls(s, dir).filter(!col("is_dir") && col("path").endsWith(".parquet"))
        .select(col("path"), col("bytes")).as[(String, Long)].collect().toSeq
    }
    val small = parquetFiles(outSmall)
    // target partition count from measured bytes (128 MiB target files,
    // the usual parquet sweet spot); tiny test tables collapse to 1.
    // Same byte math as the committed form (TxnTable.compact)
    val target = TxnTable.compactionTarget(small.map(_._2).sum)
    s.read.parquet(outSmall).repartition(target)
      .write.mode("overwrite").parquet(outBig)
    val nBig = parquetFiles(outBig).size
    s.read.parquet(outBig)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("price")).cast("double").as("total"))
      .withColumn("compacted_ok",
        lit(nBig < small.size && nBig <= target))
  }

  /** q45_zorder: multi-dimensional clustering for scan pruning — the
    * data-layout technique (Delta/Iceberg OPTIMIZE ZORDER) that makes
    * selective scans on a 100 TB table skip most files when queries
    * filter on TWO dimensions at once (range-partitioning on one column
    * only clusters that column). The z-value interleaves the bits of the
    * 16-bit min/max-scaled ranks of (customer, order-day); writing
    * range-partitioned + sorted by it gives every file a tight bounding
    * box in BOTH dimensions, so parquet min/max stats prune files for
    * predicates on either or both.
    *
    * The z-value is layout-internal (never in the output), so no
    * cross-engine arithmetic matters. The CHECKED contract: a two-sided
    * box predicate's aggregate read back from the clustered files
    * (hash-checked against the base table — clustering must be
    * content-invariant), plus `clustered_ok`: the fraction of files whose
    * per-file (min,max) bounding box intersects the quarter×quarter query
    * box must be ≤ half — an unclustered layout intersects ~all files.
    * Locality is measured from the actual files via input_file_name(). */
  def zorder(s: SparkSession, d: String): DataFrame = {
    val out = tmp("zorder_orders")
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01")).as("od"),
        col("o_totalprice").cast(D12).as("price"))
    val Array(cmin, cmax, dmin, dmax) = base
      .agg(min("o_custkey"), max("o_custkey"), min("od"), max("od"))
      .collect()(0).toSeq.map(_.asInstanceOf[Number].longValue).toArray
    val z = ZOrder.zValue(Seq(
      (col("o_custkey"), cmin, cmax), (col("od"), dmin, dmax)))
    base.withColumn("z", z)
      .repartitionByRange(8, col("z")).sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(out)
    // query box: the low quarter of both dimensions
    val (cq, dq) = (cmin + (cmax - cmin) / 4, dmin + (dmax - dmin) / 4)
    val clustered = s.read.parquet(out)
    val boxed = clustered
      .filter(col("o_custkey") < cq && col("od") < dq)
    // per-file bounding boxes: which files could a stats-pruned scan of
    // the box predicate touch?
    val boxes = clustered
      .groupBy(input_file_name().as("f"))
      .agg(min("o_custkey").as("clo"), min("od").as("dlo"))
    val total = boxes.count()
    val hit = boxes.filter(col("clo") < cq && col("dlo") < dq).count()
    boxed.agg(count(lit(1)).as("n"),
        sum(col("price")).cast("double").as("total_price"))
      .withColumn("clustered_ok", lit(hit * 2 <= total))
  }

  /** q46_bad_records: corrupt-record-tolerant ingest — at 100 TB some
    * fraction of any JSON/CSV feed is malformed, and the job must
    * quarantine those rows, not die (FAILFAST) or silently null them
    * untracked. Deterministic corruption: every 13th order's JSON line is
    * truncated mid-object; the PERMISSIVE reader routes those lines to
    * _corrupt_record, and the output counts good/bad plus an exact
    * decimal aggregate over the rows that parsed. The oracle replays the
    * corruption rule arithmetically from parquet. */
  def badRecords(s: SparkSession, d: String): DataFrame = {
    val out = tmp("bad_json_orders")
    Tables.orders(s, d)
      .select(when(pmod(col("o_orderkey"), lit(13)) === 0,
          concat(lit("{\"k\":"), col("o_orderkey"), lit(",\"p\":")))
        .otherwise(concat(lit("{\"k\":"), col("o_orderkey"), lit(",\"p\":"),
          col("o_totalprice").cast(D12), lit("}")))
        .as("value"))
      .write.mode("overwrite").text(out)
    val parsed = s.read
      .schema("k LONG, p DECIMAL(12,2), _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(out)
    parsed.agg(
      count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
      count(col("_corrupt_record")).as("n_bad"),
      sum(when(col("_corrupt_record").isNull, col("p")))
        .cast("double").as("sum_good"))
  }

  /** q27: text sink + source — raw line ingestion (the reference's
    * text-oriented HDFS file model), aggregated by line length. */
  def textLines(s: SparkSession, d: String): DataFrame = {
    val out = tmp("text_documents")
    // length-preserving newline scrub: embedded \n|\r would split one doc
    // into several read-back lines and break the line-per-doc contract
    Tables.documents(s, d)
      .select(translate(col("text"), "\n\r", "  ").as("text"))
      .write.mode("overwrite").text(out)
    s.read.text(out)
      .groupBy(length(col("value")).as("len"))
      .agg(count(lit(1)).as("n"))
  }
}
