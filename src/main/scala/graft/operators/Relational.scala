package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator suite (SURVEY.md §7.1 item 7): the data-plane
  * queries the reference (a catalog-only HTTP client, SURVEY.md §2.1)
  * delegates to its server. Pure declarative DataFrame pipelines —
  * Catalyst handles pushdown, pruning and join selection; explicit
  * `broadcast()` only where a dimension is guaranteed tiny at any SF
  * (region=5, nation=25 rows).
  *
  * Determinism contract for the DuckDB oracle: every query ends in a
  * total-order sort, every double aggregate is rounded, every output
  * column is aliased identically to the oracle SQL.
  */
object Relational {

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
}
