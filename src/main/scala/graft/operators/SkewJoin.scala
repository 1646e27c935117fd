package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Manual skew mitigation for shuffle joins (SURVEY.md §4). AQE's runtime
  * skew splitting covers most cases; this utility is for the pathological
  * hot key known ahead of time (a null-ish default id, a celebrity user)
  * where pre-salting beats letting one task receive the key's entire
  * partition.
  *
  * Left rows get a random-but-deterministic salt in [0, salts); right
  * rows are replicated once per salt value. The join key becomes
  * (key, salt), spreading each hot key over `salts` tasks. Inner-join
  * semantics are preserved exactly.
  */
object SkewJoin {

  /** Inner join `left` and `right` on leftKey == rightKey with the left
    * side salted and the right side replicated `salts` ways.
    *
    * The salt mixes the key hash with a per-row monotonic id, so a hot
    * key spreads over all `salts` buckets even when its rows arrive
    * clustered in one or two input partitions (hashing the key alone, or
    * key + partition id, would leave clustered hot rows in few buckets —
    * exactly the layout that caused the skew). monotonically_increasing_id
    * is deterministic given a fixed partition layout, which task retries
    * preserve. */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 salts: Int): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(xxhash64(col(leftKey), monotonically_increasing_id()), lit(salts)))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, col(leftKey) === col(rightKey) && l("_salt") === r("_salt"))
      .drop("_salt")
  }

  /** op_salted_join: the salting utility as a checked query — orders ⋈
    * customer on custkey, 8-way salted, aggregated per market segment.
    * The oracle is the PLAIN join: salting must be invisible in the
    * result, only in the task-size distribution. */
  def saltedOrdersBySegment(s: SparkSession, d: String): DataFrame =
    saltedJoin(Tables.orders(s, d), Tables.customer(s, d),
      "o_custkey", "c_custkey", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(12, 2))).cast("double")
          .as("total"))
}
