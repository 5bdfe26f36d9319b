package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator suite (SURVEY.md §7.1 item 7): the data-plane
  * queries the reference (a catalog-only HTTP client, SURVEY.md §2.1)
  * delegates to its server. Pure declarative DataFrame pipelines —
  * Catalyst handles pushdown, pruning and join selection; explicit
  * `broadcast()` only where a dimension is guaranteed tiny at any SF
  * (region=5, nation=25 rows — constant-size lookup tables even at
  * 100 TB; everything else is left to AQE's size-based join choice).
  *
  * Determinism contract for the DuckDB oracle: every query ends in a
  * total-order sort, every double aggregate is rounded, every output
  * column is aliased identically to the oracle SQL.
  */
object Relational {

  /** Cross-engine-stable half-up rounding (same double-op sequence as
    * the DuckDB oracle's floor(x*scale+0.5)/scale — see
    * ARCHITECTURE.md determinism contract). Load-bearing for oracle
    * hash-matching; keep all call sites on these two helpers.
    */
  private def r2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 100.0 + 0.5) / 100.0
  private def r4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 10000.0 + 0.5) / 10000.0

  /** TPC-H Q1-style pricing summary: filter → partial+final hash agg
    * → sort. Scales as a single map-side-combinable aggregation on a
    * low-cardinality key (6 groups) — no skew risk, one shuffle.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Top-k per group via ranking window — the scalable top-k shape:
    * partial top-k happens inside the window exec per partition after
    * one shuffle on the partition key; no global sort of the fact
    * table, no driver-side collection.
    */
  def q2TopkOrders(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w).cast("long")) // match DuckDB's BIGINT row_number
      .filter(col("rk") <= 5)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  /** 5-way star join: fact `lineitem` ⋈ `orders` ⋈ `customer` ⋈
    * broadcast(`nation`) ⋈ broadcast(`region`). The two fact-side
    * joins shuffle on their keys (AQE picks SMJ/SHJ by size); the two
    * dimension joins are broadcast so they add no shuffle at any
    * scale (25 / 5 rows are constants of the schema).
    */
  def q3JoinRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val nat = broadcast(Tables.nation(s, dir))
    val reg = broadcast(Tables.region(s, dir))
    // Partial aggregation pushed BELOW the joins (an eager-agg rewrite
    // Catalyst does not apply on its own): lineitem collapses to one
    // (orderkey, revenue, n_items) row per order before any join, so
    // the two shuffle joins carry |orders| rows instead of |lineitem|
    // (~4× less at TPC-H shape). Group keys (r_name, n_name) are
    // order-functional, so sum/count distribute exactly; the rounding
    // happens once, at the end, as before.
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("o_rev"),
        count(lit(1)).as("o_items"))
    perOrder.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("o_rev")), 2).as("revenue"),
        sum(col("o_items")).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** TPC-H Q5-shaped 6-way join — the local-supplier revenue query:
    * `lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region`
    * with the n_nationkey = s_nationkey = c_nationkey cross-filter
    * (revenue counts only when the supplier serves a same-nation
    * customer). Fact-side joins shuffle on their keys; `supplier` is
    * a dimension here (sf-proportional but small next to lineitem) so
    * its join stays a plain hash join; nation/region broadcast. The
    * cross-filter is an equi-predicate on two already-joined columns,
    * so it costs a filter, not an extra join.
    */
  def q23SupplierRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val supp = Tables.supplier(s, dir)
    val nat = broadcast(Tables.nation(s, dir))
    val reg = broadcast(Tables.region(s, dir))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("local_revenue"),
        count(lit(1)).as("n_items"),
        countDistinct(col("s_suppkey")).as("n_suppliers"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Salted skew join, oracle-proven: routes the (potentially hot)
    * fact keys over `buckets` reducers via [[SkewJoin.saltedInner]]
    * and aggregates — the DuckDB twin runs the PLAIN join, so the
    * hash-match certifies that salting changes the distribution, not
    * the result set.
    */
  def q24SkewJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val smallParts = Tables.part(s, dir).filter(col("p_size") === 1)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    SkewJoin.saltedInner(li, smallParts, "l_partkey", buckets = 8)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("p_brand"))
  }

  /** RANGE-frame window (vs the rows-frame suite in q7/q16): 30-day
    * trailing revenue per customer — the frame is bounded by VALUE
    * distance on the epoch-seconds ordering, so same-day peers all
    * enter the frame together regardless of row order. One shuffle on
    * the partition key; range frames stream like rows frames.
    */
  def q25RangeWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("epoch_s"))
      .rangeBetween(-2592000L, Window.currentRow)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 300)
      // NTZ → timestamp (session tz is UTC) → epoch seconds; a direct
      // NTZ→long cast is rejected under ANSI
      .withColumn("epoch_s", col("o_orderdate").cast("timestamp").cast("long"))
      .withColumn("trailing_30d", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"), col("trailing_30d"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** ROLLUP aggregation (grouping sets): subtotal rows use an 'ALL'
    * sentinel instead of NULL so Spark/DuckDB null-ordering
    * differences can't break the total order.
    */
  def q4Rollup(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .rollup(col("c_mktsegment"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("mktsegment"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("n_orders"), col("total_price"))
      .orderBy(col("mktsegment"), col("orderpriority"))
  }

  /** Left-semi join: customers having ≥1 order, counted per segment.
    * Semi join shuffles only the keys of the build side — no
    * row-multiplication, safe on skew.
    */
  def q5SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir).select(col("o_custkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers_with_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left-anti join: customers with no large (>400k) order, per
    * nation. The anti-join's build side is pre-filtered so only
    * qualifying keys shuffle.
    */
  def q6AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val bigOrders = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 400000.0).select(col("o_custkey"))
    cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers_without_big_orders"))
      .orderBy(col("c_nationkey"))
  }

  /** Running-total window per customer: one shuffle on o_custkey,
    * then an in-partition sort — the frame is computed streamingly
    * (rows unbounded preceding), no buffering of the whole partition.
    */
  def q7RunningTotal(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"), col("running_total"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Distinct aggregation: count(distinct) expands to a two-phase
    * aggregate in Spark (partial distinct per partition first) — no
    * single-point bottleneck.
    */
  def q8DistinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_distinct_customers"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy(col("o_orderpriority"))

  /** Set operations: INTERSECT / EXCEPT over customer-key sets.
    * Output: high-balance customers who do have orders (intersect)
    * and those who don't (except), as one tagged, totally-ordered
    * relation.
    */
  def q9SetOps(s: SparkSession, dir: String): DataFrame = {
    val rich = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 9000.0).select(col("c_custkey"))
    val withOrders = Tables.orders(s, dir)
      .select(col("o_custkey").as("c_custkey"))
    val both = rich.intersect(withOrders).withColumn("tag", lit("rich_with_orders"))
    val only = rich.except(withOrders).withColumn("tag", lit("rich_without_orders"))
    both.unionByName(only)
      .select(col("tag"), col("c_custkey"))
      .orderBy(col("tag"), col("c_custkey"))
  }

  /** Array aggregation: per-customer bag of order priorities —
    * collect_list is order-nondeterministic across shuffles, so
    * sort_array canonicalizes, and the array is serialized to one
    * comma-joined string so the result stays hashable/sortable for
    * the cross-engine compare (list cells aren't).
    */
  def q22ArrayAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 200)
      .groupBy(col("o_custkey"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("o_orderpriority")))).as("priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_custkey"))

  /** Multiset set operations (INTERSECT ALL / EXCEPT ALL): duplicate
    * occurrences are preserved per bag semantics — Spark plans these
    * as aggregates over per-row counts, one shuffle each.
    */
  def q21SetOpsAll(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val cheap = li.filter(col("l_quantity") < 10).select(col("l_suppkey"))
    val discounted = li.filter(col("l_discount") >= 0.05).select(col("l_suppkey"))
    val both = cheap.intersectAll(discounted).withColumn("tag", lit("intersect_all"))
    val only = cheap.exceptAll(discounted).withColumn("tag", lit("except_all"))
    both.unionByName(only)
      .select(col("tag"), col("l_suppkey"))
      .orderBy(col("tag"), col("l_suppkey"))
  }

  /** Global sort + limit (top-N): Spark runs TakeOrderedAndProject —
    * per-partition top-N then a single small merge, never a full
    * global sort.
    */
  def q10SortLimit(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_quantity"), col("l_shipdate"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(100)

  /** CUBE over two low-cardinality dims with an 'ALL' sentinel. */
  def q11Cube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_items"), col("sum_qty"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** Selective filter + projection: exists to prove pushdown — the
    * parquet scan must show PushedFilters on p_size/p_type and a
    * 4-column ReadSchema.
    */
  def q12FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_size").between(10, 20) && col("p_type").startsWith("STANDARD"))
      .select(col("p_partkey"), col("p_name"), col("p_size"), col("p_retailprice"))
      .orderBy(col("p_partkey"))

  /** GROUPING SETS through the SQL entry point (the DataFrame API
    * only exposes rollup/cube): independent subtotals by status and
    * by priority plus a grand total, one aggregation pass.
    */
  def q15GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin)
  }

  /** Window-function breadth on one shuffle: lag/lead, dense_rank,
    * ntile and percent_rank all share the same partition key so the
    * window exec sorts each customer's rows once.
    */
  def q16WindowSuite(s: SparkSession, dir: String): DataFrame = {
    val byDate = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val byPrice = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(byDate).as("prev_price"),
        lead(col("o_totalprice"), 1).over(byDate).as("next_price"),
        dense_rank().over(byPrice).cast("long").as("price_rank"),
        ntile(4).over(byPrice).cast("long").as("price_quartile"),
        r4(percent_rank().over(byPrice)).as("price_pct_rank"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Correlated scalar subquery (decorrelated by Catalyst into a
    * join against the per-group aggregate): orders above their own
    * customer's average.
    */
  def q17CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_cs")
    s.sql(
      """SELECT o_custkey, count(*) AS n_above_avg,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM orders_cs o
        |WHERE o_totalprice > (SELECT avg(o2.o_totalprice)
        |                      FROM orders_cs o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin)
  }

  /** Conditional (pivot-style) aggregation: one pass, per-status
    * sums via filtered aggregates — the shuffle-free way to pivot a
    * low-cardinality column into measures.
    */
  def q20ConditionalPivot(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    ord.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        r2(coalesce(sum(when(col("o_orderstatus") === "F", col("o_totalprice"))), lit(0.0))).as("f_total"),
        r2(coalesce(sum(when(col("o_orderstatus") === "O", col("o_totalprice"))), lit(0.0))).as("o_total"),
        r2(coalesce(sum(when(col("o_orderstatus") === "P", col("o_totalprice"))), lit(0.0))).as("p_total"))
      .orderBy(col("o_orderpriority"))
  }

  /** Statistical aggregates: stddev/corr computed by different
    * (numerically stable) algorithms on each engine — rounding is
    * magnitude-aware: 2 decimals for ~1e5-scale stddev, 4 for
    * unit-scale correlation, so accumulation-order noise (≪1e-4)
    * can't flip a digit.
    */
  def q18Stats(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        r4(avg(col("l_quantity"))).as("avg_qty"),
        r2(stddev_samp(col("l_extendedprice"))).as("stddev_price"),
        r4(corr(col("l_quantity"), col("l_extendedprice"))).as("qty_price_corr"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact interpolated percentiles (not the approximate sketch):
    * per-group sort + linear interpolation, matching DuckDB's
    * quantile_cont definition.
    */
  def q19Percentiles(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        r2(expr("percentile(o_totalprice, 0.5)")).as("p50_price"),
        r2(expr("percentile(o_totalprice, 0.9)")).as("p90_price"),
        r2(expr("percentile(o_totalprice, 0.99)")).as("p99_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Equi-join with an interval predicate (range join): lineitems
    * shipped within 30 days of their order's date. The equi-key keeps
    * it a hash/SMJ join (the range predicate is a post-join filter) —
    * no nested-loop blowup at scale.
    */
  def q13RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    // interval arithmetic, NOT date_add: date_add truncates the
    // timestamp to a date, which would silently diverge from the
    // oracle's `+ INTERVAL 30 DAY` on any non-midnight order date
    li.join(ord, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(
        count(lit(1)).as("n_fast_shipped"),
        round(sum(col("l_extendedprice")), 2).as("fast_revenue"))
      .orderBy(col("order_month"))
  }

  /** FULL OUTER join with engineered one-sided keys: customer counts
    * (nations 0-14) against supplier counts (nations 10-24), so the
    * result carries left-only, both-sides and right-only rows and the
    * null-handling of every outer flavor is driver-checked in one
    * query. Two partial-agg'd counts then a tiny join — at scale both
    * inputs are already reduced to ≤ |nations| rows before the
    * exchange.
    */
  def q27OuterJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_nationkey") < 15)
      .groupBy(col("c_nationkey").as("c_nk"))
      .agg(count(lit(1)).as("n_customers"))
    val sup = Tables.supplier(s, dir).filter(col("s_nationkey") >= 10)
      .groupBy(col("s_nationkey").as("s_nk"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(sup, col("c_nk") === col("s_nk"), "full_outer")
      .select(
        coalesce(col("c_nk"), col("s_nk")).cast("long").as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
        col("c_nk").isNotNull.as("in_customers"),
        col("s_nk").isNotNull.as("in_suppliers"))
      .orderBy(col("nationkey"))
  }

  /** Sketch aggregates with DRIVER-VISIBLE accuracy certification:
    * HLL++ distinct counts and t-digest-style approximate percentiles
    * are the single-pass, mergeable, fixed-memory summaries a 100 TB
    * profile job runs where exact distinct/percentile would shuffle
    * the world. The approximate values themselves are
    * engine-specific, so the query emits the EXACT values (oracled)
    * plus in-row booleans asserting each sketch landed within its
    * error envelope — both sketches are deterministic under
    * re-partitioning (HLL register merge is a commutative max;
    * approx_percentile merges are order-insensitive), so the booleans
    * are stable facts, and a sketch drifting out of bounds turns the
    * driver artifact red.
    */
  def q26SketchBounds(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.agg(
        countDistinct(col("l_orderkey")).as("orders_exact"),
        approx_count_distinct(col("l_orderkey")).as("orders_approx"),
        expr("percentile(l_quantity, 0.5)").as("p50_exact"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").cast("double").as("p50_approx"),
        expr("percentile(l_extendedprice, 0.95)").as("p95_price_exact"),
        expr("approx_percentile(l_extendedprice, 0.95, 10000)").cast("double")
          .as("p95_price_approx"))
      .select(
        col("orders_exact"),
        (abs(col("orders_approx") - col("orders_exact")).cast("double") /
          col("orders_exact").cast("double") <= 0.05).as("cd_within_5pct"),
        r2(col("p50_exact")).as("p50_exact"),
        (abs(col("p50_approx") - col("p50_exact")) <=
          greatest(abs(col("p50_exact")) * 0.01, lit(1.0))).as("p50_within_1pct"),
        r2(col("p95_price_exact")).as("p95_price_exact"),
        (abs(col("p95_price_approx") - col("p95_price_exact")) <=
          greatest(abs(col("p95_price_exact")) * 0.01, lit(1.0))).as("p95_within_1pct"))
  }

  /** Referential-integrity audit across the whole star schema: for
    * every FK → PK edge, the child row count and the orphan count
    * (child rows whose key has no parent). Each check is one LEFT
    * ANTI join — broadcast when the parent is a dim table, shuffled
    * hash otherwise — followed by a count, so the audit is a linear
    * scan per edge with no row ever widened. This is the standing
    * data-quality gate a 100 TB warehouse runs after every load; the
    * oracle proves the anti-join orphan semantics (including the
    * NULL-key behavior NOT IN would get wrong) match NOT EXISTS.
    */
  def qIntegrity(s: SparkSession, dir: String): DataFrame = {
    // ONE scan per edge: the left join surfaces orphans as NULL parent
    // keys, so n_child and n_orphans come out of the same aggregation
    // (a separate count + anti-join would scan the child twice). The
    // parent key is a primary key, so the left join cannot duplicate
    // child rows and count(*) stays exact; a NULL child key never
    // matches and counts as an orphan — identical to LEFT ANTI / NOT
    // EXISTS semantics.
    def check(name: String, child: DataFrame, fk: String,
              parent: DataFrame, pk: String): DataFrame =
      child.select(col(fk))
        .join(parent.select(col(pk)), col(fk) === col(pk), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col(pk).isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("constraint_name"), col("n_child"), col("n_orphans"))
    val li = Tables.lineitem(s, dir)
    Seq(
      check("lineitem.l_orderkey->orders", li, "l_orderkey",
        Tables.orders(s, dir), "o_orderkey"),
      check("lineitem.l_partkey->part", li, "l_partkey",
        Tables.part(s, dir), "p_partkey"),
      check("lineitem.l_suppkey->supplier", li, "l_suppkey",
        Tables.supplier(s, dir), "s_suppkey"),
      check("orders.o_custkey->customer", Tables.orders(s, dir), "o_custkey",
        Tables.customer(s, dir), "c_custkey"),
      check("customer.c_nationkey->nation", Tables.customer(s, dir), "c_nationkey",
        Tables.nation(s, dir), "n_nationkey"),
      check("supplier.s_nationkey->nation", Tables.supplier(s, dir), "s_nationkey",
        Tables.nation(s, dir), "n_nationkey"),
      check("nation.n_regionkey->region", Tables.nation(s, dir), "n_regionkey",
        Tables.region(s, dir), "r_regionkey"))
      .reduce(_ unionByName _)
      .orderBy(col("constraint_name"))
  }

  /** Equi-width HISTOGRAM with cumulative distribution over
    * l_extendedprice: two passes — a scalar min/max agg (broadcast
    * back as a 1-row frame), then a map-stage bucket assignment and
    * one hash agg on ≤ `buckets` groups, plus a window over the tiny
    * bucket relation for the running distribution. The histogram of a
    * 100 TB column costs exactly two linear scans and shuffles only
    * `buckets` rows; bucket edges derive from the data itself in a
    * fixed double-op order both engines evaluate identically.
    */
  def q34Histogram(s: SparkSession, dir: String, buckets: Int = 20): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_extendedprice").as("x"))
    val bounds = li.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val b = li.crossJoin(broadcast(bounds))
      .select(least(lit(buckets - 1),
        floor((col("x") - col("lo")) * lit(buckets.toDouble) / (col("hi") - col("lo"))))
        .cast("long").as("bucket"),
        col("x"), col("lo"), col("hi"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), r2(sum(col("x"))).as("sum_price"),
        r2(first(col("lo")) + col("bucket") * (first(col("hi")) - first(col("lo")))
          / lit(buckets.toDouble)).as("bucket_lo"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val total = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    b.withColumn("cum_rows", sum(col("n_rows")).over(w))
      .withColumn("cum_pct",
        r4(col("cum_rows").cast("double") / sum(col("n_rows")).over(total)))
      .select(col("bucket"), col("bucket_lo"), col("n_rows"), col("sum_price"),
        col("cum_rows"), col("cum_pct"))
      .orderBy(col("bucket"))
  }

  /** Heavy hitters via a MERGEABLE count-min sketch, with the same
    * driver-visible accuracy certification as [[q26SketchBounds]]:
    * the exact top-10 supplier keys (oracled) are looked up in a
    * `count_min_sketch` aggregate — single-pass, fixed-memory
    * (depth×width counters regardless of input size), partial-agg
    * merged across partitions, exactly what replaces an exact
    * groupBy at 100 TB when only the heads matter. The lookup uses
    * the custom [[graft.functions.CmsEstimate]] expression (Spark
    * ships the sketch aggregate but no SQL-side estimator). In-row
    * booleans certify the CMS contract: estimates never undercount,
    * and land within ε·N above the true count (fixed seed → the
    * sketch, hence the booleans, are deterministic under
    * re-partitioning; a sketch drifting out of bounds turns the
    * driver artifact red).
    */
  def q35HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_suppkey"))
    val sketch = li.agg(
      expr("count_min_sketch(l_suppkey, 0.001d, 0.99d, 42)").as("cms"),
      count(lit(1)).as("n_total"))
    val exact = li.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("l_suppkey"))
      .limit(10)
    exact.crossJoin(broadcast(sketch))
      .select(col("l_suppkey"), col("n_exact"),
        graft.functions.CmsEstimate(col("cms"), col("l_suppkey")).as("est"),
        col("n_total"))
      .select(col("l_suppkey"), col("n_exact"),
        (col("est") >= col("n_exact")).as("est_ge_exact"),
        (col("est") - col("n_exact") <=
          ceil(col("n_total").cast("double") * lit(0.001))).as("within_eps_n"))
      .orderBy(col("n_exact").desc, col("l_suppkey"))
  }

  /** Salted TWO-PHASE aggregation for skewed group keys, proven
    * algebraically equal to the plain aggregate by the oracle. A
    * synthetic 'bulk' key absorbs roughly half of lineitem (the
    * classic hot-key shape that makes a single reducer the straggler
    * at 100 TB); phase 1 aggregates on (key, salt) — 32 salts spread
    * the hot key across reducers — and phase 2 combines the 32
    * algebraic partials per key. count/sum re-merge losslessly
    * (sum-of-sums); avg derives from the merged parts at read time,
    * never averaged-of-averages. The hash-match against a plain
    * GROUP BY is the correctness proof that salting changes the
    * schedule, not the answer.
    */
  def qSkewAgg(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.lineitem(s, dir)
      .select(
        when(col("l_quantity") <= 25, lit("bulk"))
          .otherwise(concat(lit("s"), pmod(col("l_suppkey"), lit(100)).cast("string")))
          .as("grp"),
        col("l_quantity"), col("l_extendedprice"), col("l_orderkey"))
    val phase1 = keyed
      .groupBy(col("grp"), pmod(col("l_orderkey"), lit(32)).as("salt"))
      .agg(
        count(lit(1)).as("pn"),
        sum(col("l_quantity")).as("pq"),
        sum(col("l_extendedprice")).as("pp"))
    phase1.groupBy(col("grp"))
      .agg(
        sum(col("pn")).as("n_rows"),
        r2(sum(col("pq"))).as("sum_qty"),
        r2(sum(col("pp"))).as("sum_price"))
      .withColumn("avg_qty", r4(col("sum_qty") / col("n_rows")))
      .orderBy(col("grp"))
  }

  /** Closed-form OLS regression via NORMAL EQUATIONS — distributed ML
    * as pure aggregation: slope/intercept of price ~ quantity per
    * return flag derive from five sufficient statistics
    * (n, Σx, Σy, Σxy, Σx²) collected in ONE map-side-combinable hash
    * agg — the aggregate-only regression shape that needs no
    * iteration and no shuffle beyond the group keys at any data
    * volume. Inputs fix to integer hundredths first, so every
    * sufficient statistic is exact integer math (sums of ≤2.5e11
    * products stay far under Long range at bench scale; a 100 TB run
    * promotes the accumulators to DECIMAL) and the final division is
    * the only float op — spelled identically in the oracle.
    */
  def q42Ols(s: SparkSession, dir: String): DataFrame = {
    val cents = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(100.0) + lit(0.5)).cast("long")
    val stats = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("flag"),
        cents(col("l_quantity")).as("x"), cents(col("l_extendedprice")).as("y"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val d = (c: String) => col(c).cast("double")
    val slopeRaw = (d("n") * d("sxy") - d("sx") * d("sy")) /
      (d("n") * d("sxx") - d("sx") * d("sx"))
    stats.select(col("flag"), col("n"),
      (floor(slopeRaw * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("slope"),
      (floor((d("sy") - slopeRaw * d("sx")) / d("n") / lit(100.0) *
        lit(10000.0) + lit(0.5)) / lit(10000.0)).as("intercept"))
      .orderBy(col("flag"))
  }

  /** SKYLINE (Pareto-front) operator — Börzsönyi et al. 2001's
    * multi-objective selection: the line items no other row beats on
    * BOTH objectives (maximize quantity, minimize price); the
    * data-selection primitive behind "best trade-off" queries that
    * plain top-k by a single weighted score cannot answer.
    *
    * Scale shape: the corpus collapses to one (quantity → min price,
    * count) row per DISTINCT quantity in a map-side-combinable hash
    * agg — TPC-H quantities are whole 1..50, so the dominance pass is
    * a running min over a ≤50-row post-aggregation frame (census
    * allowlisted with that bound; for unbounded objective domains
    * you'd range-partition the running min like `txt_global_ids`).
    * Dominance law with ties spelled out: a point survives iff its
    * price is STRICTLY below every higher-quantity point's min price
    * (equal price at higher quantity dominates), decided on exact
    * integer cents.
    */
  def q61Skyline(s: SparkSession, dir: String): DataFrame =
    q61SkylineOf(Tables.lineitem(s, dir)
      .select(col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * lit(100.0) + lit(0.5)).cast("long")
          .as("price_c")))

  /** The dominance core over any (qty, price_c) relation — spec
    * entry point for planted fronts. */
  def q61SkylineOf(rows: DataFrame): DataFrame = {
    val pts = rows
      .groupBy(col("qty"))
      .agg(min(col("price_c")).as("min_price_c"),
        count(lit(1)).as("n_rows"))
    val better = Window.orderBy(col("qty").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pts
      .withColumn("best_higher", min(col("min_price_c")).over(better))
      .filter(col("best_higher").isNull ||
        col("min_price_c") < col("best_higher"))
      .select(col("qty"), col("min_price_c"), col("n_rows"))
      .orderBy(col("qty"))
  }

  /** k-fold CROSS-VALIDATED OLS — the model-selection layer on top of
    * [[q42Ols]]'s estimator: cluster folds by md5(order) (whole
    * orders stay together — the leakage discipline every sampler
    * here follows), train each fold's line on the OTHER k−1 folds,
    * and score it on the held-out fold with an exact integer MAE.
    *
    * ONE training scan for ALL k models: the pass computes per-fold
    * sufficient statistics (n, Σx, Σy, Σxy, Σx²) and each fold's
    * TRAIN stats are the exact LONG differences total − fold — the
    * algebraic-partials trick that makes leave-fold-out free at any
    * scale. Slope/intercept divisions follow q42's operation order on
    * identical integers (same doubles on both engines); the held-out
    * residual rounds ŷ to whole cents with the same floor(·+0.5) on
    * both sides, so the per-fold sum of absolute errors is an exact
    * BIGINT and `mae_c4 = ⌊10⁴·Σ|r| / n_test⌋` hashes. Magnitude
    * contract: Σx·y in cents² is the q42 bound (~10⁹ rows at TPC-H
    * prices); the scoring join broadcasts the k-row model relation.
    */
  def q59CvOls(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val cents = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(100.0) + lit(0.5)).cast("long")
    // Materialized once (r14, guide §1.2 "don't compute things
    // twice"): the fold assignment's md5+conv runs per row, and BOTH
    // passes (the per-fold moments and the per-row residual MAE)
    // consume the same 3-long projection — lazily composed, each
    // pass re-scanned lineitem and re-hashed every order key. The
    // checkpointed frame is 3 longs/row; values are unchanged (the
    // same deterministic projection, computed once).
    val li = Tables.lineitem(s, dir).select(
      (conv(substring(md5(concat(lit("cv:"), col("l_orderkey").cast("string"))),
        1, 4), 16, 10).cast("long") % k).as("fold"),
      cents(col("l_quantity")).as("x"), cents(col("l_extendedprice")).as("y"))
      .localCheckpoint(true)
    val perFold = li.groupBy(col("fold"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val tot = perFold.agg(sum(col("n")).as("tn"), sum(col("sx")).as("tsx"),
      sum(col("sy")).as("tsy"), sum(col("sxy")).as("tsxy"),
      sum(col("sxx")).as("tsxx"))
    val d = (c: String) => col(c).cast("double")
    val train = perFold.crossJoin(broadcast(tot))
      .withColumn("ntr", col("tn") - col("n"))
      .withColumn("sxtr", col("tsx") - col("sx"))
      .withColumn("sytr", col("tsy") - col("sy"))
      .withColumn("sxytr", col("tsxy") - col("sxy"))
      .withColumn("sxxtr", col("tsxx") - col("sxx"))
    val model = train
      .withColumn("b", (d("ntr") * d("sxytr") - d("sxtr") * d("sytr")) /
        (d("ntr") * d("sxxtr") - d("sxtr") * d("sxtr")))
      .withColumn("a_c", (d("sytr") - col("b") * d("sxtr")) / d("ntr"))
      .select(col("fold"), col("n").as("n_test"), col("ntr").as("n_train"),
        col("b"), col("a_c"))
    val res = li.join(broadcast(model.select(col("fold"), col("b"), col("a_c"))), "fold")
      .withColumn("r", col("y") -
        floor(col("a_c") + col("b") * col("x") + lit(0.5)).cast("long"))
      .groupBy(col("fold"))
      .agg(sum(abs(col("r"))).as("sae"), count(lit(1)).as("nt"))
    model.join(broadcast(res), "fold")
      .select(col("fold"), col("n_train"), col("n_test"),
        (floor(col("b") * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("slope"),
        (floor(col("a_c") / lit(100.0) * lit(10000.0) + lit(0.5)) /
          lit(10000.0)).as("intercept"),
        expr("(sae * 10000L) DIV nt").as("mae_c4"))
      .orderBy(col("fold"))
  }

  /** EQUI-DEPTH binning (quantile discretization) — the ML
    * feature-binning dual of [[q34Histogram]]'s equi-width buckets,
    * and the scalable shape for it: a naive `ntile()` is a GLOBAL
    * window (one reducer sorts everything); instead the 9 internal
    * decile boundaries come from ONE exact-percentile aggregate (the
    * same interpolation contract the q19 oracle proves
    * engine-identical), broadcast back, and bin assignment is a pure
    * map stage — `1 + Σ (value > boundary_i)`, spelled out so both
    * engines share the tie rule at duplicated boundary values. Two
    * scans, no sort, bins exactly N/10 ± interpolation ties.
    */
  /** Approximate query processing with error certification — the
    * online-aggregation shape: a 10 % DETERMINISTIC cluster sample
    * (md5 bucket on l_orderkey, so whole orders survive together and
    * the sample is rerun/ingest-stable like every sampling operator
    * here) feeds the scaled Horvitz–Thompson estimate. The standard
    * error is the DESIGN-true one: inclusion is Bernoulli per ORDER,
    * so Var(T̂) = ((1−f)/f)·Σ tᵢ² over order-level cluster totals tᵢ
    * (estimated from the sample's own Σ tᵢ²/f — one pass, exact
    * integer sums since quantities are whole-valued). A row-iid SE
    * here would understate the variance and fail its own 2σ band —
    * the first cut did exactly that. At 100 TB the estimate path
    * reads 10 % of the data and ships 3 longs per group; the exact
    * pass exists ONLY to certify the estimate in-row (`err_pct`,
    * `within_2se`) — a production run drops it.
    */
  def q49SampledAgg(s: SparkSession, dir: String, pct: Int = 10): DataFrame = {
    // the long scale-up (est_qty = s·100/pct) and the double 1/f must
    // agree exactly, which holds only for divisor fractions
    require(100 % pct == 0, s"pct=$pct must divide 100")
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_orderkey"),
        col("l_quantity").cast("long").as("qty"))
    val bucket =
      conv(substring(md5(col("l_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    val f = pct / 100.0
    // order-level cluster totals within the sample, then per-flag
    // moments — both aggregations are map-side combinable
    val sample = li.filter(bucket < pct)
      .groupBy(col("l_returnflag"), col("l_orderkey"))
      .agg(sum(col("qty")).as("t"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("t")).as("s_qty"),
        sum(col("t") * col("t")).as("ss_qty"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(sum(col("qty")).as("true_qty"))
    val est = col("s_qty").cast("double") * lit(1.0 / f)
    val se = sqrt(lit((1.0 - f) / (f * f)) * col("ss_qty").cast("double"))
    sample.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n_orders"),
        (col("s_qty") * lit((1.0 / f).toLong)).as("est_qty"),
        col("true_qty"),
        CrossEngine.rnd4(se).as("se_qty"),
        CrossEngine.rnd4((est - col("true_qty").cast("double")) * lit(100.0)
          / col("true_qty").cast("double")).as("err_pct"),
        (abs(est - col("true_qty").cast("double")) <= lit(2.0) * se)
          .as("within_2se"))
      .orderBy(col("l_returnflag"))
  }

  /** Trimmed and winsorized means per group — the robust-aggregation
    * pair every metrics pipeline reaches for when a long tail
    * poisons plain averages: trimming DROPS values outside the
    * [p10, p90] exact percentiles, winsorizing CLAMPS them to the
    * bounds. Exact per-group percentiles (bounded group count), then
    * the stats broadcast back for one conditional-aggregate pass —
    * two shuffles on the group key total. Boundary membership
    * compares raw doubles computed identically on both engines (the
    * q19 percentile pairing), and sums round once at emission.
    */
  def q54Trimmed(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("grp"), col("o_totalprice").as("v"))
    val bounds = o.groupBy(col("grp"))
      .agg(expr("percentile(v, 0.1)").as("lo"), expr("percentile(v, 0.9)").as("hi"))
    o.join(broadcast(bounds), "grp")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        r2(avg(col("v"))).as("mean_raw"),
        sum(when(col("v") >= col("lo") && col("v") <= col("hi"), 1L)
          .otherwise(0L)).as("n_kept"),
        r2(
          sum(when(col("v") >= col("lo") && col("v") <= col("hi"), col("v"))
            .otherwise(lit(0.0))) /
            sum(when(col("v") >= col("lo") && col("v") <= col("hi"), 1L)
              .otherwise(0L)).cast("double")).as("mean_trimmed"),
        r2(
          avg(greatest(col("lo"), least(col("hi"), col("v")))))
          .as("mean_winsorized"))
      .orderBy(col("grp"))
  }

  /** RFM customer segmentation — the marketing/analytics staple that
    * buckets every customer by Recency (days since last order,
    * anchored at the corpus max day so the cut is data-relative and
    * rerun-stable), Frequency (order count) and Monetary (lifetime
    * cents) into QUINTILES, then reports the populated (r,f,m) cells.
    * r_q = 1 is the MOST RECENT quintile (recency measures days ago —
    * ascending value is descending freshness). Quintile boundaries
    * come from ONE exact-percentile aggregate broadcast back
    * ([[q41Bins]]'s no-global-window discipline and its spelled-out
    * `value > boundary` tie rule); cell money means are exact
    * integer `DIV`. Scale shape: orders collapse per customer in one
    * hash agg, the boundary agg and the 1-row anchor broadcast, cell
    * output is ≤ 125 rows at any corpus size.
    */
  def q60Rfm(s: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate").cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val cust = Tables.orders(s, dir)
      .select(col("o_custkey"), day.as("day"),
        floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .groupBy(col("o_custkey"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("freq"),
        sum(col("cents")).as("money"))
    val anchor = cust.agg(max(col("last_day")).as("maxd"))
    val c2 = cust.crossJoin(broadcast(anchor))
      .withColumn("recency", col("maxd") - col("last_day"))
    val bounds = c2.agg(
      expr("percentile(recency, array(0.2,0.4,0.6,0.8))").as("rb"),
      expr("percentile(freq, array(0.2,0.4,0.6,0.8))").as("fb"),
      expr("percentile(money, array(0.2,0.4,0.6,0.8))").as("mb"))
    def quint(v: String, b: String) = (1 to 4).map(i =>
      when(col(v) > element_at(col(b), i), 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    c2.crossJoin(broadcast(bounds))
      .select(quint("recency", "rb").as("r_q"), quint("freq", "fb").as("f_q"),
        quint("money", "mb").as("m_q"), col("money"))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_customers"), sum(col("money")).as("money_cents"))
      .withColumn("avg_money_c", expr("money_cents DIV n_customers"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  def q41Bins(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_totalprice"))
    val bounds = o.agg(expr(
      "percentile(o_totalprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("bs"))
    val bin = (1 to 9).map(i =>
      when(col("o_totalprice") > element_at(col("bs"), i), 1L).otherwise(0L))
      .foldLeft(lit(1L))(_ + _)
    o.crossJoin(broadcast(bounds))
      .select(bin.cast("long").as("bin"), col("o_totalprice").as("v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        (floor(min(col("v")) * 100.0 + 0.5) / 100.0).as("min_price"),
        (floor(max(col("v")) * 100.0 + 0.5) / 100.0).as("max_price"))
      .orderBy(col("bin"))
  }

  /** Declarative data-quality EXPECTATIONS audit (the dbt-test /
    * Great-Expectations shape): not_null, accepted_values, range and
    * uniqueness checks evaluate as conditional aggregates in ONE scan
    * per table — adding an expectation adds a column to the agg, not
    * a pass over the data — and the referential check is the same
    * left-anti shape as [[qIntegrity]]. Each expectation reports
    * (checked, violations, pass); the deliberately-tight tax bound
    * shows real violations flowing through, the rest hold. At 100 TB
    * this is exactly 2 scans + 1 join however many expectations run.
    */
  def q37Expectations(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val liRows = li.agg(
        count(lit(1)).as("n"),
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("v_nn"),
        sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L).otherwise(0L)).as("v_av"),
        sum(when(col("l_tax") > 0.06, 1L).otherwise(0L)).as("v_rng"))
      .select(col("n").as("n_checked"), expr(
        """stack(3,
          |  'lineitem.l_orderkey not_null', v_nn,
          |  'lineitem.l_returnflag in (A,N,R)', v_av,
          |  'lineitem.l_tax <= 0.06', v_rng) AS (expectation, n_violations)""".stripMargin))
    val ordRows = ord.agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_uq"))
      .select(col("n").as("n_checked"), expr(
        "stack(1, 'orders.o_orderkey unique', v_uq) AS (expectation, n_violations)"))
    val refRows = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(broadcast(li.agg(count(lit(1)).as("n_checked"))))
      .select(col("n_checked"),
        lit("lineitem.l_orderkey references orders").as("expectation"),
        col("n_violations"))
    liRows.unionByName(ordRows).unionByName(refRows)
      .select(col("expectation"), col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
      .orderBy(col("expectation"))
  }

  /** Driver query for the custom MERGEABLE quantile sketch
    * ([[graft.functions.HistQuantile]], the suite's native
    * `TypedImperativeAggregate`): per-returnflag p50/p95 price
    * estimates from the sketch next to the EXACT rank-based
    * percentiles, with the ≤ width/2 error bound certified in-row
    * (the q26 sketch-bounds honesty contract). The exact side — a
    * per-group sort — exists here only as certification; at 100 TB
    * the sketch side is the plan: one scan, constant bins·8 bytes of
    * partial-agg state per group, sketches merge cell-wise so
    * arrival/merge order provably cannot perturb the estimate.
    */
  def q45SketchQuantile(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.HistQuantile
    val li = Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_extendedprice"))
    val (lo, hi, bins) = (0.0, 110000.0, 1100) // width 100 → |err| ≤ 50
    val est = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      HistQuantile(col("l_extendedprice"), lo, hi, bins, 0.5).as("p50_est"),
      HistQuantile(col("l_extendedprice"), lo, hi, bins, 0.95).as("p95_est"))
    val ranked = li
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))).cast("long"))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy(col("l_returnflag"))))
    def exactAt(q: Double, name: String): DataFrame =
      ranked.filter(col("rn") ===
          greatest(lit(1L), ceil(col("nn").cast("double") * lit(q)).cast("long")))
        .select(col("l_returnflag"), col("l_extendedprice").as(name))
    est.join(exactAt(0.5, "p50_exact"), "l_returnflag")
      .join(exactAt(0.95, "p95_exact"), "l_returnflag")
      .select(col("l_returnflag"), col("n"),
        col("p50_est"), col("p50_exact"),
        CrossEngine.rnd4(abs(col("p50_est") - col("p50_exact"))).as("p50_abs_err"),
        (abs(col("p50_est") - col("p50_exact")) <= lit(50.0)).cast("long").as("p50_within_bound"),
        col("p95_est"), col("p95_exact"),
        CrossEngine.rnd4(abs(col("p95_est") - col("p95_exact"))).as("p95_abs_err"),
        (abs(col("p95_est") - col("p95_exact")) <= lit(50.0)).cast("long").as("p95_within_bound"))
      .orderBy(col("l_returnflag"))
  }
}
