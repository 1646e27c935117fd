package org.apache.spark.sql.graftbridge

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
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
    prune: Seq[Expression] => Seq[Path])
  extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var inner: ParquetScanBuilder = _

  private def ensure(paths: => Seq[Path]): ParquetScanBuilder = {
    if (inner == null) {
      val index = new InMemoryFileIndex(spark, paths,
        Map.empty[String, String], Some(schema))
      inner = ParquetScanBuilder(spark, index, schema, schema, options)
    }
    inner
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    ensure(prune(filters)).pushFilters(filters)

  override def pushedFilters(): Array[Predicate] =
    ensure(allPaths).pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    ensure(allPaths).pruneColumns(requiredSchema)

  override def pushAggregation(aggregation: Aggregation): Boolean =
    ensure(allPaths).pushAggregation(aggregation)

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    ensure(allPaths).supportCompletePushDown(aggregation)

  override def build(): Scan = ensure(allPaths).build()
}
