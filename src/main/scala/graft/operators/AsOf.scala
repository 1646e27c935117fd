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

  // internal columns get an unambiguous prefix; a left frame that already
  // uses one of these names is rejected up front rather than silently
  // corrupted by the union/select below
  private val K = "__graft_asof_k"
  private val T = "__graft_asof_t"
  private val Tag = "__graft_asof_tag"
  private val Rv = "__graft_asof_rv"

  /** Generic as-of: for each left row, the latest `rightVal` at or before
    * the left row's time, per key. Left columns are preserved; the matched
    * value is appended as `_asof`.
    *
    * Right rows sort before left rows at equal timestamps (tag 0 < tag 1),
    * so a right row at exactly t matches a left row at t — "at or before"
    * semantics, matching DuckDB's ASOF JOIN (>=). When multiple right rows
    * share the same (key, timestamp), the LARGEST `rightVal` wins (the
    * window orders by value within equal timestamps) — a deterministic
    * tiebreak regardless of partitioning. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightVal: String): DataFrame = {
    val lcols = left.columns
    val clash = lcols.toSet
      .intersect(Set(K, T, Tag, Rv, "_asof"))
    require(clash.isEmpty,
      s"asofJoin: left columns collide with internal names: $clash")
    val l = left
      .withColumn(K, col(leftKey)).withColumn(T, col(leftTime))
      .withColumn(Tag, lit(1)).withColumn(Rv, lit(null).cast(
        right.schema(rightVal).dataType))
    val r = right.select(
      col(rightKey).as(K), col(rightTime).as(T),
      lit(0).as(Tag), col(rightVal).as(Rv))
    val runion = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.toIndexedSeq.map(col): _*)
    // ordering by Rv after (T, Tag) makes `last` deterministic when several
    // right rows share one (key, timestamp): the max value wins
    val w = Window.partitionBy(col(K)).orderBy(col(T), col(Tag), col(Rv))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(runion)
      .withColumn("_asof", last(col(Rv), ignoreNulls = true).over(w))
      .filter(col(Tag) === 1)
      .select(lcols.toIndexedSeq.map(col) :+ col("_asof"): _*)
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
