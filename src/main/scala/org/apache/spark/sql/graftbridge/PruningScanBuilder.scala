package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 ScanBuilder that interposes MANIFEST-LEVEL FILE SKIPPING in
  * front of Spark's own parquet scan: the pushed-down filter conjuncts
  * first shrink the live-file list via the caller's `prune` function
  * (per-file min/max/null stats from the table's manifest), and only
  * the SURVIVING files seed the [[InMemoryFileIndex]] the real
  * [[ParquetScanBuilder]] plans over. Everything downstream is stock
  * Spark — parquet footer/row-group pruning, column pruning, aggregate
  * pushdown and vectorized reading all still apply, now over fewer
  * files. This is exactly the layering public table formats use: the
  * manifest replaces the directory listing AND answers the coarse
  * predicate, the format scan does the rest.
  *
  * Lives in the bridge package because catalyst-level pushdown
  * ([[SupportsPushDownCatalystFilters]], what FileScanBuilder itself
  * speaks) is `private[sql]` — same pattern as the Column/Expression
  * bridge; no behavior is forked.
  *
  * Spark drives pushdown in a fixed order (filters → aggregates →
  * columns → build), so the inner builder is created at the first
  * callback: `pushFilters` always runs (with an empty list when the
  * query has no predicates), and every later hook delegates. */
class PruningScanBuilder(
    spark: SparkSession,
    schema: StructType,
    options: CaseInsensitiveStringMap,
    allPaths: Seq[Path],
    prune: (Seq[Expression], Boolean) => Seq[Path],
    aggAnswer: (Aggregation, Seq[Expression]) =>
      Option[(StructType, Array[org.apache.spark.sql.catalyst.InternalRow])]
      = (_, _) => None,
    onIndexBuild: () => Unit = () => ())
  extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var inner: ParquetScanBuilder = _
  private var pushedCatalyst: Seq[Expression] = Nil
  private var pendingPaths: () => Seq[Path] = () => allPaths
  private var prunedSchema: Option[StructType] = None
  private var answered:
    Option[(StructType, Array[org.apache.spark.sql.catalyst.InternalRow])] =
    None

  /** The inner parquet builder is constructed LAZILY, at the first hook
    * that genuinely needs a file index: a metadata-answered aggregate
    * then never lists, opens or indexes a single file — the whole query
    * is one manifest read. Spark's hook order (filters → aggregates →
    * columns → build) makes this safe: by the time pruneColumns/build
    * run, the recorded filters seed the same pruned index the eager
    * construction produced. */
  private def ensure(): ParquetScanBuilder = {
    if (inner == null) {
      // the construction itself is what "zero file-index builds"
      // instrumentation must count — the prune callback only fires when
      // a filter was pushed, so counting prune invocations alone would
      // let an eager-build regression on unfiltered metadata-answered
      // aggregates pass unnoticed
      onIndexBuild()
      val index = new InMemoryFileIndex(spark, pendingPaths(),
        Map.empty[String, String], Some(schema))
      inner = ParquetScanBuilder(spark, index, schema, schema, options)
      inner.pushFilters(pushedCatalyst)
    }
    inner
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushedCatalyst = filters
    pendingPaths = () => prune(filters, false)
    // with no partition columns every conjunct is a data filter, and
    // parquet always re-evaluates data filters above the scan — so the
    // post-scan set is the input set, exactly what the eager
    // inner.pushFilters returned
    filters
  }

  override def pushedFilters(): Array[Predicate] = ensure().pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit = {
    prunedSchema = Some(requiredSchema)
    ensure().pruneColumns(requiredSchema)
  }

  /** Re-plan the parquet scan with RUNTIME conjuncts appended to the
    * pushed set: the manifest prune runs again over `pushed ++ extra`
    * (strictly fewer surviving files — pruning is monotone in the
    * conjunct set), a fresh file index seeds a fresh parquet builder,
    * and the original pushdown state (filters, required columns) is
    * replayed so the rebuilt scan is plan-identical except for its file
    * list. This is what `SupportsRuntimeV2Filtering.filter` calls when
    * a dynamic-pruning subquery resolves at execution time — the DSv2
    * equivalent of dynamic partition pruning, except the unit of
    * pruning is the manifest entry (file), not a partition directory. */
  def rebuiltWith(extra: Seq[Expression]): Scan = {
    onIndexBuild()
    // isRuntime = true: the caller's static-prune instrumentation must
    // not double-count this re-plan (it has its own runtime counters)
    val index = new InMemoryFileIndex(spark,
      prune(pushedCatalyst ++ extra, true),
      Map.empty[String, String], Some(schema))
    val b = ParquetScanBuilder(spark, index, schema, schema, options)
    b.pushFilters(pushedCatalyst)
    prunedSchema.foreach(b.pruneColumns)
    b.build()
  }

  override def pushAggregation(aggregation: Aggregation): Boolean =
    answered.isDefined || ensure().pushAggregation(aggregation)

  /** Spark consults this FIRST (then [[pushAggregation]]): when the
    * caller's `aggAnswer` can serve the whole aggregation from table
    * metadata, [[build]] returns a driver-side [[LocalScan]] holding
    * the single result row — zero files listed, opened or scanned.
    * Otherwise everything delegates to the parquet builder (per-footer
    * pushdown, off by default). */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = {
    answered = aggAnswer(aggregation, pushedCatalyst)
    answered.isDefined || ensure().supportCompletePushDown(aggregation)
  }

  override def build(): Scan = answered match {
    case Some((aggSchema, rs)) => new LocalScan {
      override def readSchema(): StructType = aggSchema
      override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
        rs
      override def description(): String = "GraftManifestAggregate"
    }
    case None => ensure().build()
  }
}
