package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphAnnSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def frames = {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"))
    (corpus, queries)
  }

  test("kNN graph: every node has out-edges, degree is bounded, ring guarantees reach") {
    val (corpus, _) = frames
    val g = GraphAnn.buildKnnGraph(corpus, m = 8).cache()
    val n = corpus.count()
    // the ring makes every node a source (and a destination)
    assert(g.select(col("src")).distinct().count() === n)
    assert(g.select(col("dst")).distinct().count() === n)
    // out-degree ≤ m + 2 ring links
    val maxDeg = g.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(maxDeg <= 10, s"out-degree $maxDeg exceeds m + 2")
    // no self-loops, no duplicate edges
    assert(g.filter(col("src") === col("dst")).count() === 0)
    assert(g.count() === g.distinct().count())
    g.unpersist()
  }

  test("beam search: recall floor vs brute force, deterministic across runs") {
    val (corpus, queries) = frames
    val g = GraphAnn.buildKnnGraph(corpus, m = 8).localCheckpoint(true)
    val out = GraphAnn.beamSearch(queries, corpus, g, k = 10).collect()
    assert(out.length === 100) // 10 queries × top-10
    val brute = VectorOps.knnBrute(queries, corpus, 10)
      .select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = out.map(r => (r.getLong(0), r.getLong(2))).count(brute.contains)
    assert(hits >= 80, s"graph-ANN recall@10 too low: $hits/100")
    // scores non-increasing per query; rerun bit-identical
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val s = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    }
    val again = GraphAnn.beamSearch(queries, corpus, g, k = 10).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("search cost is frontier-bounded: deeper hops only ever improve the beam's worst score") {
    val (corpus, queries) = frames
    val g = GraphAnn.buildKnnGraph(corpus, m = 8).localCheckpoint(true)
    def meanTop(hops: Int): Double = {
      val rows = GraphAnn.beamSearch(queries, corpus, g, k = 10, hops = hops).collect()
      rows.map(_.getDouble(3)).sum / rows.length
    }
    // the beam is monotone: hop h+1's candidate set contains hop h's
    // beam, so mean top-k score cannot degrade with depth
    val h1 = meanTop(1)
    val h3 = meanTop(3)
    assert(h3 >= h1 - 1e-9, s"beam degraded with depth: $h1 -> $h3")
  }

  test("driver query carries a certified recall column with a floor") {
    val out = GraphAnn.annGraphQuery(spark, sfDir).collect()
    assert(out.length === 100)
    val perQuery = out.groupBy(_.getLong(0)).values.map(_.head.getDouble(4))
    val mean = perQuery.sum / perQuery.size
    assert(mean >= 0.8, s"mean recall_at_10 $mean below floor")
  }
}
