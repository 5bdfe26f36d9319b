package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over relational edge lists — the link-structure
  * signals (influence ranking, co-occurrence importance) a large
  * corpus-curation pipeline computes next to its dedup/quality passes.
  *
  * PageRank here is the fixed-iteration power method expressed as
  * joins + aggregations, which is exactly how it runs on a real
  * cluster: each iteration is ONE shuffle (contributions grouped by
  * destination), the rank vector never leaves the executors, and the
  * damping/teleport term is a scalar. Spark's map-side partial
  * aggregation combines contributions per destination before the
  * shuffle, so per-iteration network volume is bounded by the number
  * of distinct (partition, dst) pairs, not the edge count. A fixed
  * iteration count (vs convergence testing) keeps the operator fully
  * deterministic and oracle-checkable; production runs would loop the
  * same job with a driver-side delta check (only a scalar crosses the
  * driver), identical to the label-propagation discipline in
  * [[Dedup.connectedComponents]].
  */
object Graph {

  /** Directed co-purchase edges: parts appearing in the same order.
    * The self-join is keyed on l_orderkey and order sizes are bounded
    * by the schema (≤ ~13 items), so the pair expansion is a
    * constant-factor map of lineitem — linear at 100 TB, never
    * quadratic in the corpus. `distinct` collapses repeat
    * co-purchases; at scale that dedup is the usual hash shuffle on
    * (src, dst).
    */
  def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
    li.as("a").join(li.as("b"), Seq("l_orderkey"))
      .filter(col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
  }

  /** PageRank over the co-purchase graph, `iters` power iterations at
    * damping 0.85. Node set = parts with at least one edge (the graph
    * is symmetric by construction, so every node has both in- and
    * out-degree — no dangling-mass term needed). Emits the top `topK`
    * parts by rank normalized to mean 1 (`rank_x_n` = rank × N), with
    * the cross-engine rounding contract applied before the ordering
    * so the cutoff is deterministic on both engines.
    */
  def pagerank(s: SparkSession, dir: String,
               iters: Int = 3, topK: Int = 50): DataFrame =
    pagerankOnEdges(copurchaseEdges(s, dir), iters, topK)
      .withColumnRenamed("node", "p_partkey")

  /** Power iteration over an arbitrary (src, dst) edge list where
    * every node has out-degree ≥ 1 (callers with dangling nodes add
    * self-loops or a dangling-mass term first).
    */
  def pagerankOnEdges(edges: DataFrame, iters: Int, topK: Int): DataFrame = {
    // localCheckpoint: the edge list feeds deg + every iteration; at
    // scale you would persist it once rather than re-derive per pass.
    val e = edges.localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val n = deg.count() // scalar: node count (driver-side by design)
    var ranks = deg.select(col("src").as("node"), (lit(1.0) / n).as("r"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), (col("r") / col("outdeg")).as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("in_c"))
      ranks = contrib.select(col("node"),
        (lit(0.15) / n + lit(0.85) * col("in_c")).as("r"))
    }
    ranks.join(deg.withColumnRenamed("src", "node"), "node")
      .select(col("node"),
        CrossEngine.rnd4(col("r") * lit(n.toDouble)).as("rank_x_n"),
        col("outdeg").as("n_copurchase"))
      .orderBy(col("rank_x_n").desc, col("node"))
      .limit(topK)
  }
}
