package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the synthetic star-schema tables (see TESTDATA.md).
  *
  * Plain `spark.read.parquet` — schema comes from parquet footers, filters
  * and column pruning push down to the scan. At 100 TB the same call works
  * against a partitioned parquet/iceberg layout; nothing here assumes
  * single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.parquet's `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (rejected by Spark's vectorized reader —
    * read as long under the legacy conf and divided down) or plain
    * TIMESTAMP(MICROS) (read natively, as NTZ when the footer says
    * isAdjustedToUTC=false). Normalize both to a session-zone TimestampType
    * column; the session runs UTC so the NTZ cast is instant-preserving and
    * both layouts yield identical values. The conversion is a per-row
    * scalar; pushdown on other columns is unaffected. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      // integer division — ns epochs exceed 2^53, double math would lose µs
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
