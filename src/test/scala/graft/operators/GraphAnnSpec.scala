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

  test("levelRankDf: deterministic, a permutation of 1..N, stable under row order") {
    val (corpus, _) = frames
    val (r1, n1) = GraphAnn.levelRankDf(corpus)
    val (r2, n2) = GraphAnn.levelRankDf(corpus.orderBy(col("vec_id").desc))
    assert(n1 === n2)
    val m1 = r1.collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("hrk"))).toMap
    val m2 = r2.collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("hrk"))).toMap
    // identical assignment regardless of input row order (the rank is
    // a pure function of the id hash), and a permutation of 1..N —
    // so every "top ceil(N/M^l) ranks" layer has its EXACT size
    assert(m1 === m2, "level ranks depend on input row order")
    assert(m1.values.toSeq.sorted === (1L to n1).toSeq)
    // hash order is not id order (the layers are a random-like sample,
    // not a prefix of the id space)
    assert(m1.toSeq.sortBy(_._1).map(_._2).sliding(2).exists(p => p(0) > p(1)))
  }

  test("ringEdges: one cycle per stride, in- and out-degree exactly 1, covers every node") {
    val (corpus, _) = frames
    val n = corpus.count()
    val ring = GraphAnn.ringEdges(corpus, Seq(1L))
    assert(ring.count() === n)
    assert(ring.select(col("src")).distinct().count() === n)
    assert(ring.select(col("dst")).distinct().count() === n)
    // following succ from the minimum id returns after exactly N steps
    val succ = ring.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val start = succ.keys.min
    var cur = start; var steps = 0
    do { cur = succ(cur); steps += 1 } while (cur != start && steps <= n)
    assert(steps === n, s"stride-1 ring is not a single $n-cycle (closed after $steps)")
  }

  test("beamSearchSeeded: per-query seeds stay per-query, and a seed at the true NN is kept") {
    val (corpus, queries) = frames
    val graph = GraphAnn.buildKnnGraph(corpus)
    val dist = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      lit(1.0) - VectorOps.cosine(a, b)
    // seed each query with its brute-force nearest neighbor — the
    // walk may wander, but the seed itself is in the initial beam and
    // can only be displaced by STRICTLY closer rows, so it must
    // survive into the final ef-wide candidate set
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("d").asc, col("vec_id").asc)
    val nn = queries.crossJoin(corpus)
      .select(col("query_id"), col("vec_id"),
        (lit(1.0) - VectorOps.cosine(col("qvec"), col("vec"))).as("d"))
      .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("query_id"), col("vec_id"))
    val out = GraphAnn.beamSearchSeeded(queries, corpus, graph, nn,
      ef = 16, hops = 2, dist).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val seeds = nn.collect().map(r => (r.getLong(0), r.getLong(1)))
    seeds.foreach { s =>
      assert(out.contains(s), s"true-NN seed $s displaced from the beam")
    }
    // nothing leaks across queries: every output row's query_id is a
    // real query and the per-query beam is bounded by ef
    val byQ = out.groupBy(_._1)
    assert(byQ.keys.toSet === seeds.map(_._1).toSet)
    byQ.foreach { case (q, rows) => assert(rows.size <= 16, s"query $q beam > ef") }
  }

  test("wave-staged candidate scoring is bit-invisible: any wave count yields the single-pass top-m exactly") {
    // the r14 volume-tier claim ([[GraphAnn.knnTopD]]): the global
    // per-src top-m equals the final top-m over the union of
    // per-wave top-m sets — each true top-m pair ranks ≤ m inside
    // its own wave, and ties break (d asc, dst asc) in both passes.
    // forcedWaves exercises the fold at fixture scale (the law
    // engages organically only past BuildVolumeGateRows).
    val (corpus0, _) = frames
    val corpus = corpus0.withColumn("vec_id", col("vec_id").cast("string"))
    val dist = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      lit(1.0) - VectorOps.cosine(a, b)
    def edgesAt(waves: Option[Int]) = GraphAnn
      .knnTopD(corpus, 8, dist, forcedWaves = waves)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val single = edgesAt(None)
    assert(single.nonEmpty)
    assert(edgesAt(Some(3)) === single, "3-wave fold diverged from single-pass")
    assert(edgesAt(Some(7)) === single, "7-wave fold diverged from single-pass")
  }

  test("wavesForVolume: capacity-derived, bounded, and 1 whenever the volume fits") {
    import GraphAnn.{wavesForVolume, wavesForRecap, PairShuffleBytes}
    val G = 1L << 30
    // small volumes -> single pass (a wave may claim usable/3 less
    // the kept side it re-exchanges, each pair costing its measured
    // 96 B through the one fused exchange)
    assert(wavesForVolume(1000L, 1000L, 100L * G) === 1)
    assert(wavesForVolume(G / PairShuffleBytes / 4, 1000L, 100L * G) === 1)
    // the 6.4M ladder point (1.21e9 measured pairs, ~7.6e6 kept
    // rows) against this box's ~101 GB media-adjusted default pool
    // (disk·0.8 + tmpfs·0.3) -> a few bounded waves
    assert(wavesForVolume(1210000000L, 7600000L, 101L * G) === 4)
    // the 25.6M measured point (3.05e9 pairs) splits further
    assert(wavesForVolume(3053767512L, 24000000L, 101L * G) === 10)
    // a huge kept side cannot starve the budget below usable/8
    assert(wavesForVolume(1210000000L, 2000000000L, 101L * G) === 9)
    // degenerate capacity never divides by zero or overflows, and
    // the wave count is capped (a pathological estimate must not
    // schedule thousands of sequential jobs)
    assert(wavesForVolume(Long.MaxValue / PairShuffleBytes, 0L, 24L) === 64)
    // recap sizing: 2·n·k rows at 160 B vs a third of scratch —
    // the 25.6M/2m=16 point needs a handful of waves, fixtures one
    assert(wavesForRecap(10000L, 16, 101L * G) === 1)
    assert(wavesForRecap(25600000L, 16, 101L * G) === 4)
  }
}
