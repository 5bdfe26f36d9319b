package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join REDUCTION: when the join's dimension side
  * is too large to broadcast as rows but its key set fits a few
  * hundred MB as a Bloom sketch, pre-filtering the fact side against
  * the sketch before the shuffle removes most non-matching rows at
  * scan time — the shuffle then carries ~|matching| rows instead of
  * |fact|. This is exactly the runtime-filter optimization Spark's
  * AQE injects for some plans; exposing it as an operator makes it
  * available unconditionally (e.g. ahead of a multi-join pipeline AQE
  * can't see through).
  *
  * Correctness: a Bloom filter has NO false negatives, so the
  * pre-filter never drops a matching row; false positives are
  * eliminated by the exact join that follows. The result is
  * row-identical to the plain join — which is what the driver oracle
  * checks (`q30_bloom_join` ≡ plain-join SQL).
  *
  * The probe is the codegen'd
  * [[graft.functions.BloomMightContain]] expression over the
  * broadcast filter — one virtual `mightContainLong` call per fact
  * row inside the scan's WholeStageCodegen span, no UDF
  * serialization/boxing tax — and it pipelines inside the same scan
  * stage, so at 100 TB the saved shuffle bytes are pure win.
  */
object BloomJoin {

  /** Inner-join `fact` with `dim` on `key`, pre-filtering fact rows
    * through a Bloom sketch of dim's keys. `expectedItems` sizes the
    * sketch (overestimate is safe, under inflates fpp).
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, key: String,
                      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val sketch = dim.stat.bloomFilter(key, expectedItems, fpp)
    val spark = fact.sparkSession
    val bcast = spark.sparkContext.broadcast(sketch)
    fact.filter(graft.functions.BloomMightContain(col(key).cast("long"), bcast))
      .join(dim, key)
  }

  /** Driver query: lineitem joined to the high-value-order subset
    * through the Bloom pre-filter — result row-identical to the plain
    * join (the oracle), with aggregate output for a compact compare.
    */
  def bloomJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val fact = graft.Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val dim = graft.Tables.orders(s, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    bloomPrunedJoin(fact, dim, "l_orderkey", expectedItems = 100000L)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
  }
}
