package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (nearest-earlier) join — an operator Spark lacks natively
  * (SURVEY.md §2C op_asof_join), composed from built-ins per the
  * preference order: union-tag both sides on (key, time), then one
  * in-partition window pass carrying the right side's last value forward.
  *
  * Shuffle profile: ONE shuffle on the join key, then a per-partition
  * sort — same cost as a single sort-merge join, with no range explosion.
  * A per-key skew (one user with millions of events) is handled by AQE
  * skew splitting on the window shuffle.
  */
object AsOf {

  /** Generic as-of: for each left row, the latest `rightVal` at or before
    * the left row's time, per key. Left columns are preserved.
    *
    * Right rows sort before left rows at equal timestamps (tag 0 < tag 1),
    * so a right row at exactly t matches a left row at t — "at or before"
    * semantics, matching DuckDB's ASOF JOIN (>=). */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightVal: String): DataFrame = {
    val lcols = left.columns
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_tag", lit(1)).withColumn("_rv", lit(null).cast(
        right.schema(rightVal).dataType))
    val r = right.select(
      col(rightKey).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_tag"), col(rightVal).as("_rv"))
    val runion = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    val w = Window.partitionBy(col("_k")).orderBy(col("_t"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(runion)
      .withColumn("_asof", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(lcols.map(col) :+ col("_asof"): _*)
  }

  /** op_range_join: keyed interval join — for each error event, the count
    * of clicks by the same user in the preceding hour (attribution
    * window). With a key present this is a plain shuffle join on the key
    * plus a range filter — Catalyst's hash join handles it; a key-less
    * range join would add time-bucketing (join on overlapping day buckets,
    * then filter) to avoid the nested-loop cross product. */
  def errorClickWindow(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"))
    errors.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_us") >= col("t_us") - lit(3600L * 1000000L) &&
          col("c_us") <= col("t_us"), "left_outer")
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(col("c_us")).as("n_clicks"))
  }

  /** op_asof_join: for each purchase event, the nearest earlier (or
    * simultaneous) click by the same user. Output carries the matched
    * click's timestamp (epoch micros) — tie-safe vs. the DuckDB ASOF
    * oracle, which picks an arbitrary row among equal timestamps. */
  def purchaseToClick(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
      .withColumn("click_us", unix_micros(col("ts")))
    asofJoin(purchases, clicks,
      leftKey = "user_id", rightKey = "user_id",
      leftTime = "ts", rightTime = "ts", rightVal = "click_us")
      .select(col("event_id"), col("user_id"), col("_asof").as("click_us"))
  }
}
