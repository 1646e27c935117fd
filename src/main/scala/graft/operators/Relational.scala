package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational / OLAP operator suite (SURVEY.md §2C).
  *
  * Design notes (100 TB scale):
  *  - every query is a declarative DataFrame tree: filters/projections
  *    reach the parquet scan (PushedFilters / ReadSchema), Catalyst
  *    reorders joins, AQE re-plans at runtime;
  *  - `broadcast(...)` hints ONLY on dimensions bounded at any SF
  *    (region=5, nation=25). SF-proportional sides (customer, supplier,
  *    part, filtered slices of them) carry NO hint: a forced hint is
  *    honored past the 8 GB broadcast limit and OOMs at 100 TB, while
  *    CBO/AQE broadcasts them automatically whenever the side is actually
  *    small. Fact-fact joins shuffle on their keys;
  *  - money/quantity aggregates run in DecimalType (exact, order-free)
  *    and are cast to double only in the final projection so results are
  *    bit-identical to the DuckDB oracle regardless of partitioning.
  */
object Relational {

  private val D12 = DecimalType(12, 2) // money columns (< 10^10)
  private val D4  = DecimalType(4, 2)  // rates: discount / tax in [0,1)

  private def m(c: Column): Column = c.cast(D12)
  private def r(c: Column): Column = c.cast(D4)
  private def dbl(c: Column): Column = c.cast("double")

  /** q01: scan + pushed filter + pruned projection. Per-row scalar double
    * math only (IEEE-identical across engines). */
  def q01ScanFilterProject(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
  }

  /** q02: TPC-H Q1 shape — grouped aggregation, decimal-exact sums. */
  def q02AggGroup(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dbl(sum(m(col("l_quantity")))).as("sum_qty"),
        dbl(sum(m(col("l_extendedprice")))).as("sum_base_price"),
        dbl(sum(m(col("l_extendedprice")) * (lit(1) - r(col("l_discount")))))
          .as("sum_disc_price"),
        dbl(sum(m(col("l_extendedprice")) * (lit(1) - r(col("l_discount"))) *
            (lit(1) + r(col("l_tax"))))).as("sum_charge"),
        (dbl(sum(m(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q03: TPC-H Q3 shape — selective dim broadcast, fact-fact shuffle join,
    * top-k with unique tiebreak. */
  def q03JoinAggTopk(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li   = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    // no broadcast hint on customer: it grows linearly with SF, and a forced
    // hint is honored past the 8 GB broadcast limit. AQE/CBO still picks
    // BroadcastHashJoin at any SF where the filtered slice is actually small.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      // group on the RAW o_orderdate and render the string per GROUP, not
      // per joined row (guide §2.3: shuffle narrower keys — a timestamp,
      // not a formatted string; o_orderkey is unique in orders, so each
      // l_orderkey sees one o_orderdate and the group set is unchanged)
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dbl(sum(m(col("l_extendedprice")) * (lit(1) - r(col("l_discount")))))
        .as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_odate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q04: EXISTS ≡ left-semi join (no row duplication, build side only keys). */
  def q04SemiJoin(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val li  = Tables.lineitem(s, d).filter(col("l_quantity") > 49)
    ord.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderstatus"))
  }

  /** q05: NOT EXISTS ≡ left-anti join. The orders side is filtered so the
    * result is non-degenerate at every SF (customers exist with orders but
    * none above the threshold). */
  def q05AntiJoin(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val ord  = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** q06: TPC-H Q5 shape — snowflake join over 6 tables; all dims broadcast,
    * only orders⋈lineitem shuffles. */
  def q06MultiJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val or = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val cu = Tables.customer(s, d)
    val su = Tables.supplier(s, d)
    val na = Tables.nation(s, d)
    val re = Tables.region(s, d)
    // broadcast hints ONLY on the bounded dims (nation=25, region=5 at any
    // SF). customer/supplier grow linearly — AQE converts those joins to
    // broadcast at runtime when the side is genuinely small, and degrades
    // to shuffle joins at 100 TB instead of OOMing on a forced hint.
    li.join(or, col("l_orderkey") === col("o_orderkey"))
      .join(cu, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(na), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(re), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dbl(sum(m(col("l_extendedprice")) * (lit(1) - r(col("l_discount")))))
        .as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** q07: TPC-H Q6 shape — fully pushed-down selective scan-agg. */
  def q07SelectiveAgg(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(dbl(sum(m(col("l_extendedprice")) * r(col("l_discount"))))
        .as("revenue"),
        count(lit(1)).as("n"))
  }

  /** q08: global top-k — TakeOrderedAndProject (no full sort materialized). */
  def q08SortLimit(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
      .limit(20)
  }

  /** q09: distinct projection (shuffle on the distinct key set). */
  def q09Distinct(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()

  /** q10: exact grouped distinct counts (expand + two-phase agg). */
  def q10CountDistinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))

  /** q11: HAVING — post-aggregation filter. */
  def q11Having(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(dbl(sum(m(col("o_totalprice")))).as("total_spent"),
        count(lit(1)).as("n_orders"))
      .filter(col("total_spent") > 1000000.0)

  /** q12: TPC-H Q12 shape — conditional aggregation over a join. */
  def q12CaseAgg(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val or = Tables.orders(s, d)
    li.join(or, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))
  }

  /** q13: TPC-H Q13 — outer join with join-side filter, nested aggregation. */
  def q13OuterJoinAgg(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val ord  = Tables.orders(s, d)
      .filter(col("o_orderpriority") =!= "1-URGENT")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** q14: UNION ALL of heterogeneous slices, then aggregate. */
  def q14Union(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(lit("cust").as("kind"), col("c_nationkey").cast("int").as("nk"))
    val p = Tables.supplier(s, d)
      .select(lit("supp").as("kind"), col("s_nationkey").cast("int").as("nk"))
    c.unionAll(p).groupBy(col("kind"), col("nk")).agg(count(lit(1)).as("n"))
  }

  /** q15: top-N per key via window rank (single shuffle on the key). */
  def q15WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"))
  }

  /** q16: running sum per key (decimal-exact accumulation). */
  def q16WindowRunning(s: SparkSession, d: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in this data (118k dup
    // groups at sf0.1, one of which also ties shipdate+suppkey), so the
    // ROWS frame needs l_quantity in the order: ties then carry equal
    // quantity and the running sum is invariant under their order
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        dbl(sum(m(col("l_quantity"))).over(w)).as("running_qty"))
  }

  /** q17: ROLLUP grouping sets; rolled-up keys coalesced to 'ALL'. */
  def q17Rollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dbl(sum(m(col("l_quantity")))).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("sum_qty"), col("n"))

  /** q33: CUBE grouping sets — all key combinations in one pass
    * (complements q17's ROLLUP). */
  def q33Cube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        dbl(sum(m(col("o_totalprice")))).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))

  /** q18: IN (uncorrelated subquery) ≡ semi join against the subquery. */
  def q18InSubquery(s: SparkSession, d: String): DataFrame = {
    val rich = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"))
    Tables.orders(s, d)
      // no hint: the acctbal slice is a constant fraction of customer and
      // grows with SF; AQE broadcasts it at runtime while it's small
      .join(rich, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
  }

  /** q19: correlated EXISTS with extra predicate ≡ filtered semi join. */
  def q19ExistsCorrelated(s: SparkSession, d: String): DataFrame = {
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 450000 &&
      col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
    Tables.customer(s, d)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_acctbal"))
  }

  /** q20: TPC-H Q17 shape — correlated aggregate subquery (per-part avg).
    * Quantities are integral doubles, so the per-part sum is exact and the
    * avg is deterministic across engines. */
  def q20ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    val li  = Tables.lineitem(s, d)
    val avg = li.groupBy(col("l_partkey").as("pk"))
      .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    // cardinality(avg) = |distinct partkey| — SF-proportional, so a shuffle
    // join on partkey is the scale-correct plan (both sides co-partition)
    li.join(avg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(dbl(sum(m(col("l_extendedprice")))).as("total_price"),
        count(lit(1)).as("n"))
  }

  /** q21: lag over event time per user — gap to previous event in micros. */
  def q21LagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - col("prev_us")).as("gap_us"))
  }

  /** q22: tumbling daily window aggregation over the event stream table. */
  def q22TimeWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
        .as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        dbl(sum(col("value").cast(D12))).as("sum_value"))

  /** q23: pivot event_type → columns (explicit value list keeps the plan
    * single-pass; no collect-driven schema inference). */
  def q23Pivot(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .count()
    p.select(col("user_id") +:
      types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** q29: exact percentiles (median, p95) per group — sort-based exact
    * aggregation; the approx_percentile sketch is the scale path when
    * exactness isn't required. */
  def q29Percentile(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
        percentile(col("l_extendedprice"), lit(0.95)).as("p95"))

  /** q30: sketch-based aggregation — HyperLogLog++ approximate distinct
    * users and an approximate p50 sketch per event_type, next to the exact
    * values. At 100 TB the sketches are the default: fixed-size state,
    * mergeable across partitions, no expand-distinct shuffle.
    *
    * Oracle design: the raw sketch estimates have no SQL twin (every
    * engine's HLL/KLL differs), so the emitted columns are the EXACT
    * values (hash-checked against DuckDB) plus error-bound booleans
    * computed from the sketches — the oracle asserts them TRUE, so an
    * accuracy regression in either sketch flips this row red while the
    * implementation-specific estimate itself stays out of the hash. */
  def q30ApproxSketch(s: SparkSession, d: String): DataFrame = {
    val agg = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"),
        percentile(col("value"), lit(0.5)).as("exact_p50"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx_p50"),
        count(lit(1)).as("n"))
    // percentile_approx guarantees RANK error (<= n/accuracy), not value
    // error, so the check is in rank space: re-rank the estimate against
    // the group's values (one pass over events against the broadcast
    // 5-row sketch table) and require the target rank ceil(n/2) to fall
    // within [below+1, upto] widened by 1 + n/accuracy. A value-relative
    // bound misfires on plateaued or skewed distributions; interpolated
    // quantile bounds misfire when adjacent data values are farther
    // apart than the rank tolerance.
    val ranks = Tables.events(s, d)
      .join(broadcast(agg.select(col("event_type"), col("approx_p50"))),
        Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("value") < col("approx_p50"), 1L).otherwise(0L)).as("below"),
        sum(when(col("value") <= col("approx_p50"), 1L).otherwise(0L)).as("upto"))
    val slack = lit(1.0) + col("n") / 10000.0
    val target = ceil(col("n") / 2.0)
    agg.join(ranks, Seq("event_type"))
      .select(col("event_type"), col("exact_users"), col("exact_p50"),
        // 3·rsd relative bound (HLL++ is exact in sparse mode, so the
        // floor only matters for tiny groups)
        (abs(col("approx_users") - col("exact_users")) <=
          greatest(col("exact_users") * 0.03, lit(3.0))).as("approx_users_ok"),
        (col("below") + 1 <= target + slack &&
          col("upto") >= target - slack).as("approx_p50_ok"))
  }

  /** q31: full outer join — customers vs suppliers per nation, with
    * nulls surviving on both sides. */
  def q31FullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_cust"))
      .filter(col("nk_c") < 13)
    val p = Tables.supplier(s, d).groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_supp"))
      .filter(col("nk_s") >= 7)
    c.join(p, col("nk_c") === col("nk_s"), "full_outer")
      .select(col("nk_c"), col("nk_s"), col("n_cust"), col("n_supp"))
  }

  /** q32: set operations — INTERSECT and EXCEPT of key slices, tagged and
    * unioned (both rewrite to semi/anti joins under Catalyst). */
  def q32SetOps(s: SparkSession, d: String): DataFrame = {
    val ordCust = Tables.orders(s, d)
      .filter(col("o_totalprice") > 200000).select(col("o_custkey").as("ck"))
    val bigCust = Tables.customer(s, d)
      .filter(col("c_acctbal") > 5000).select(col("c_custkey").as("ck"))
    val both = ordCust.intersect(bigCust)
      .select(lit("both").as("kind"), col("ck"))
    val onlyOrders = ordCust.except(bigCust)
      .select(lit("only_orders").as("kind"), col("ck"))
    both.unionAll(onlyOrders)
  }

  /** q24: JSON field extraction from the string props column. */
  def q24JsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
      .groupBy(col("event_type"))
      .agg(sum(col("k_val")).as("sum_k"), count(lit(1)).as("n"))

  /** q34: TPC-H Q14 shape — lineitem⋈part fact-dim join, promo-class
    * revenue share. part is SF-proportional so NO broadcast hint: the join
    * shuffles on partkey (both sides co-partition) and AQE broadcasts it
    * while it's genuinely small. Decimal-exact sums; the percentage is one
    * double multiply-then-divide, mirrored exactly in the oracle. */
  /** q37: explicit GROUPING SETS — the general form rollup/cube are sugar
    * for; each set is a separate grand-total lane in one aggregation pass
    * (same single-shuffle plan as q17/q33). */
  def q37GroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dbl(sum(m(col("l_quantity")))).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("sum_qty"), col("n"))

  /** q38: RANGE-frame window — per customer, total order value in the
    * 30 days preceding each order (value-based frame over event time, the
    * sliding-lookback shape ROWS frames can't express). Frames are over
    * epoch micros so the bound is engine-portable; RANGE includes
    * same-timestamp peers, so the result is deterministic under ties. */
  def q38WindowRange(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("od_us"))
      .rangeBetween(-2592000000000L, 0L) // 30 days in microseconds
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        // o_orderdate is TIMESTAMP_NTZ on disk; the session runs UTC, so
        // the cast is value-identical and matches the oracle's epoch_us
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
        col("o_totalprice"))
      .withColumn("spend_30d", dbl(sum(m(col("o_totalprice"))).over(w)))
      .select(col("o_orderkey"), col("o_custkey"), col("spend_30d"))
  }

  /** q39: unpivot/melt — wide metric columns to (key, metric, val) rows,
    * the inverse of q23's pivot. Row-local (zero shuffle). */
  def q39Unpivot(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")),
        "metric", "val")

  /** op_scd2: slowly-changing-dimension type 2 — turn a per-key change
    * log (each customer's orders in date order) into versioned rows with
    * validity intervals: valid_from = this change's time, valid_to = the
    * next change's time, NULL marks the current version. One shuffle on
    * the key, one in-partition window pass — the standard way to build
    * point-in-time-joinable dimension history at any scale. */
  def opScd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("valid_from_us"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("valid_from_us"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  /** op_upsert: MERGE-style upsert — apply a deterministic change set
    * (updates to every 10th order, inserts of new keys derived from every
    * 97th) onto the orders base, latest-wins per key. The plan is the
    * scale-canonical merge: union the base with the (much smaller) change
    * set, ONE shuffle on the key, and a per-key window keeps the newest
    * version — no driver-side diffing, no row-by-row apply. */
  def opUpsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        dbl(col("o_totalprice")).as("o_totalprice"), col("o_orderpriority"))
      .withColumn("src", lit(0))
    val updates = Tables.orders(s, d)
      .filter(pmod(col("o_orderkey"), lit(10)) === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        dbl(col("o_totalprice") + 1000.0).as("o_totalprice"),
        lit("5-LOW").as("o_orderpriority"), lit(1).as("src"))
    val inserts = Tables.orders(s, d)
      .filter(pmod(col("o_orderkey"), lit(97)) === 0)
      .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"),
        dbl(col("o_totalprice")).as("o_totalprice"),
        col("o_orderpriority"), lit(1).as("src"))
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("src").desc)
    base.unionByName(updates).unionByName(inserts)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
  }

  /** q41: datetime-function battery over a deterministic order slice —
    * truncation, field extraction, interval/day arithmetic, ISO week.
    * Row-local, zero shuffle. The oracle maps each function to its DuckDB
    * twin, normalizing the two engines' calendar conventions: DuckDB's
    * dayofweek is 0-based from Sunday where Spark's is 1-based, and
    * DuckDB's date_trunc returns DATE where Spark returns TIMESTAMP —
    * both sides project to DATE and Spark's numbering. */
  def q41Datetime(s: SparkSession, d: String): DataFrame = {
    val od = col("o_orderdate")
    Tables.orders(s, d)
      .filter(pmod(col("o_orderkey"), lit(997)) === 0)
      .select(col("o_orderkey"),
        to_date(od).as("d"),
        year(od).cast("long").as("y"),
        quarter(od).cast("long").as("q"),
        month(od).cast("long").as("m"),
        to_date(date_trunc("month", od)).as("mon"),
        last_day(to_date(od)).as("ld"),
        date_add(to_date(od), 30).as("plus30"),
        datediff(to_date(od), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"),
        weekofyear(od).cast("long").as("woy"),
        dayofweek(od).cast("long").as("dow"))
  }

  /** q42: string-function battery over a deterministic document slice —
    * case mapping, reverse, translate, pad, repeat, substring search,
    * regex extraction, edit distance, tokenize-count. Row-local, zero
    * shuffle. Cross-engine parity caveat: the correctness corpus is
    * ASCII, where Java (Spark codegen) and DuckDB semantics coincide for
    * every function here; on multibyte text the engines can diverge
    * (code-point vs grapheme reverse, locale-sensitive case mapping,
    * multibyte edit distance), so the oracle proves ASCII parity only —
    * StringFuncsSpec pins Spark's own non-ASCII behavior (code-point
    * reverse, Unicode simple case mapping) as the documented contract. */
  def q42StringFuncs(s: SparkSession, d: String): DataFrame = {
    val t20 = substring(col("text"), 1, 20)
    Tables.documents(s, d)
      .filter(pmod(col("doc_id"), lit(17)) === 0)
      .select(col("doc_id"),
        upper(t20).as("up"),
        lower(t20).as("lo"),
        reverse(t20).as("rev"),
        translate(t20, "aeiou", "AEIOU").as("tr"),
        lpad(col("doc_id").cast("string"), 8, "0").as("lp"),
        repeat(substring(col("text"), 1, 2), 3).as("rep"),
        instr(col("text"), "the").cast("long").as("ins"),
        ascii(col("lang")).cast("long").as("asc"),
        concat_ws("|", col("lang"), col("source")).as("cw"),
        regexp_extract(col("text"), "([A-Za-z]+ing)", 1).as("rx"),
        levenshtein(col("lang"), col("source")).cast("long").as("lev"),
        size(split(col("text"), "\\s+")).cast("long").as("ntok"))
  }

  /** q43: higher-order array functions — filter / aggregate (fold) /
    * transform / exists over the token array, plus distinct + sort.
    * Row-local, zero shuffle. NOTE: Spark evaluates lambda functions
    * interpreted (no codegen), so corpus-scale hot paths use the
    * explode + aggregate formulation instead (see ta_repetition); this
    * battery pins down the semantics of the lambda forms themselves.
    * Array outputs are stringified for exact oracle compare; the
    * distinct head is sorted on both sides because DuckDB's
    * list_distinct does not preserve first-occurrence order. */
  def q43HigherOrder(s: SparkSession, d: String): DataFrame = {
    val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
    Tables.documents(s, d)
      .filter(pmod(col("doc_id"), lit(17)) === 0)
      .select(col("doc_id"),
        size(filter(toks, t => length(t) > 5)).cast("long").as("n_long"),
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)).as("chars"),
        concat_ws(",", transform(slice(toks, 1, 5), t => upper(t)))
          .as("head5_up"),
        concat_ws(",", sort_array(array_distinct(slice(toks, 1, 8))))
          .as("head8_uniq"),
        exists(toks, t => t === "the").as("has_the"))
  }

  def q34PartPromo(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-03-01").cast("timestamp"))
    val net = m(col("l_extendedprice")) * (lit(1) - r(col("l_discount")))
    li.join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(
        dbl(sum(when(col("p_type") === "ECONOMY", net))).as("promo_revenue"),
        dbl(sum(net)).as("total_revenue"))
      .withColumn("promo_pct",
        col("promo_revenue") * 100.0 / col("total_revenue"))
  }

  /** q48_set_ops_all: INTERSECT ALL / EXCEPT ALL — the multiset set ops,
    * which Catalyst rewrites very differently from q32's distinct forms
    * (row_number replication + join instead of semi/anti): duplicates
    * survive with min/“bag difference” multiplicity. Two overlapping
    * slices of orders keyed by (custkey, status) exercise real duplicate
    * multiplicities; outputs are per-status counts of both results. */
  def q48SetOpsAll(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderstatus"))
    val a = o.filter(col("o_orderkey") % 3 =!= 0)
    val b = o.filter(col("o_orderkey") % 2 === 0)
    a.intersectAll(b).groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_intersect"))
      .join(a.exceptAll(b).groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_except")), Seq("o_orderstatus"), "full_outer")
      .select(col("o_orderstatus"),
        coalesce(col("n_intersect"), lit(0L)).as("n_intersect"),
        coalesce(col("n_except"), lit(0L)).as("n_except"))
  }

  /** q49_null_semantics: the NULL battery — the semantics every engine
    * pair must agree on before any other result can be trusted at 100 TB
    * (real columns are nullable): NULL group keys (one group, present in
    * GROUP BY output), COUNT(*) vs COUNT(col) vs COUNT(DISTINCT col),
    * COALESCE, NULLIF, and null-safe equality (<=> / IS NOT DISTINCT
    * FROM). Nulls are injected deterministically by key so the oracle
    * replays the rule. */
  def q49NullSemantics(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    val base = Tables.orders(s, d).select(k.as("k"),
      when(pmod(k, lit(7)) === 0, lit(null)).otherwise(col("o_orderstatus"))
        .as("st"),
      when(pmod(k, lit(11)) === 0, lit(null)).otherwise(m(col("o_totalprice")))
        .as("pr"))
    base.groupBy(col("st"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("pr")).as("n_price"),
        countDistinct(col("pr")).as("n_distinct_price"),
        dbl(sum(coalesce(col("pr"), lit(0).cast(D12)))).as("sum_coalesced"),
        sum(when(col("pr").isNull, 1).otherwise(0)).as("n_null_price"),
        sum(when(nullif(col("st"), lit("F")).isNull, 1).otherwise(0))
          .as("n_nullif_f"),
        sum(when(col("st") <=> lit("O"), 1).otherwise(0)).as("n_eq_ns_o"))
  }

  /** q47_stats_join: persisted-statistics-driven planning — the CBO box.
    * AQE fixes runtime sizes, but the COMPILE-TIME broadcast/reorder
    * decision on a 1000-executor cluster comes from catalog statistics
    * (ANALYZE TABLE), and this query proves the engine actually consumes
    * them. Two identical customer catalog tables; one gets
    * `ANALYZE ... FOR ALL COLUMNS`, the twin stays stats-less. With AQE
    * OFF and CBO ON, the same segment-filtered join is planned against
    * both at ONE threshold chosen strictly between the two estimates:
    *
    *   - analyzed:  FilterEstimation shrinks the dim by the segment's
    *     1/ndv selectivity and column pruning drops the unread columns →
    *     estimate clears the threshold → BroadcastHashJoin;
    *   - stats-less: the relation's estimate is its raw on-disk size
    *     (no rowCount → no filter/projection shrink) → exceeds the
    *     threshold → shuffle join.
    *
    * `stats_broadcast_ok` asserts exactly that plan divergence (plus that
    * the analyzed estimate is genuinely smaller). Values are the plain
    * join aggregate, hash-checked; confs are restored in a finally so the
    * (lazy) returned frame re-plans under the session defaults — the
    * booleans, captured here, carry the planning evidence. */
  def q47StatsJoin(s: SparkSession, d: String): DataFrame = {
    val (ordT, custT, twinT) =
      ("graft_stats_ord", "graft_stats_cust", "graft_stats_cust_twin")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq(ordT, custT, twinT).foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      graft.Fs.deleteRecursively(s"$wh/$t")
    }
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), m(col("o_totalprice")).as("price"))
      .write.saveAsTable(ordT)
    val cust = Tables.customer(s, d)
    cust.write.saveAsTable(custT)
    cust.write.saveAsTable(twinT)
    s.sql(s"ANALYZE TABLE $ordT COMPUTE STATISTICS FOR ALL COLUMNS")
    s.sql(s"ANALYZE TABLE $custT COMPUTE STATISTICS FOR ALL COLUMNS")
    val prevAqe = s.conf.get("spark.sql.adaptive.enabled")
    val prevCbo = s.conf.get("spark.sql.cbo.enabled")
    val prevThr = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.cbo.enabled", "true")
      def dim(t: String) = s.table(t)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_mktsegment"))
      def joined(t: String) = s.table(ordT)
        .join(dim(t), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dbl(sum(col("price"))).as("total"))
      val estWith = dim(custT).queryExecution.optimizedPlan.stats.sizeInBytes
      val estSans = dim(twinT).queryExecution.optimizedPlan.stats.sizeInBytes
      // one threshold strictly between the two estimates: only the
      // stats-informed plan may broadcast
      val thr = ((estWith + estSans) / 2).toLong
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", thr.toString)
      def bhj(df: DataFrame) =
        df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin")
      val ok = estWith < estSans && bhj(joined(custT)) && !bhj(joined(twinT))
      joined(custT).withColumn("stats_broadcast_ok", lit(ok))
    } finally {
      s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      s.conf.set("spark.sql.cbo.enabled", prevCbo)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
    }
  }
}
