package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, count, lit}

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank on a directed cycle is uniform (rank_x_n = 1)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val out = Graph.pagerankOnEdges(edges, iters = 3, topK = 10).collect()
    assert(out.length === 3)
    out.foreach(r => assert(r.getAs[Double]("rank_x_n") === 1.0))
  }

  test("pagerank on a symmetric star matches the hand-computed power iteration") {
    // center 0 <-> leaves 1,2,3 (symmetric edges, so no dangling nodes)
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    // closed-form power iteration: outdeg(center)=3, outdeg(leaf)=1
    var c = 0.25; var l = 0.25
    for (_ <- 1 to 3) {
      val c2 = 0.15 / 4 + 0.85 * (3 * l) // leaves all point at center
      val l2 = 0.15 / 4 + 0.85 * (c / 3) // each leaf fed by center/3
      c = c2; l = l2
    }
    val out = Graph.pagerankOnEdges(edges, iters = 3, topK = 10)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank_x_n")).toMap
    def rnd4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(out(0L) === rnd4(c * 4))
    Seq(1L, 2L, 3L).foreach(k => assert(out(k) === rnd4(l * 4)))
    // probability mass is conserved by the iteration
    assert(math.abs(c + 3 * l - 1.0) < 1e-12)
    // the auto flip-back gate (r11 advisory: rule as code): forcing
    // the measured node count past the broadcast ceiling demotes the
    // per-iteration join to a shuffle — identical ranks either way
    val shuffled = Graph.pagerankOnWeightedEdges(
      edges.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w")),
      iters = 3, topK = 10, maxBroadcastNodes = 0L)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank_x_n")).toMap
    assert(shuffled === out, "shuffle flip-back must not change ranks")
  }

  test("topK cuts deterministically and output is rank-descending") {
    val out = Graph.pagerank(spark, "/root/testdata/sf0.001", iters = 2, topK = 15).collect()
    assert(out.length === 15)
    val ranks = out.map(_.getAs[Double]("rank_x_n")).toSeq
    assert(ranks === ranks.sorted.reverse)
    // ties after rounding must be ordered by ascending part key
    ranks.zip(ranks.tail).zipWithIndex.foreach { case ((a, b), i) =>
      if (a == b)
        assert(out(i).getAs[Long]("p_partkey") < out(i + 1).getAs[Long]("p_partkey"))
    }
  }

  test("co-purchase edge list is symmetric and self-loop-free") {
    val e = Graph.copurchaseEdges(spark, "/root/testdata/sf0.001")
    assert(e.filter($"src" === $"dst").count() === 0)
    val asym = e.as("a").join(e.as("b"),
        $"a.src" === $"b.dst" && $"a.dst" === $"b.src", "left_anti").count()
    assert(asym === 0, "every co-purchase edge must have its reverse")
  }

  test("association rules match a brute-force basket recount") {
    val dir = "/root/testdata/sf0.001"
    val out = Graph.assocRules(spark, dir, minPairCount = 2L, topK = 15).collect()
    assert(out.nonEmpty)
    val baskets = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = baskets.map(_._1).distinct.length
    val itemN = baskets.groupBy(_._2).view.mapValues(_.length).toMap
    val pairN = baskets.groupBy(_._1).values.flatMap { items =>
      val pks = items.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- i + 1 until pks.length) yield (pks(i), pks(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    out.foreach { r =>
      val (pa, pb, nab) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nab === pairN((pa, pb)).toLong, s"pair count ($pa,$pb)")
      def rnd4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
      assert(r.getDouble(3) === rnd4(nab.toDouble / nOrders))
      assert(r.getDouble(4) === rnd4(nab.toDouble / itemN(pa)))
      assert(r.getDouble(5) === rnd4(nab.toDouble / itemN(pb)))
      assert(r.getDouble(6) === rnd4(nOrders.toDouble * nab /
        (itemN(pa).toDouble * itemN(pb).toDouble)))
    }
    // descending rounded lift with (pa, pb) tiebreak
    val keys = out.map(r => (-r.getDouble(6), r.getLong(0), r.getLong(1))).toSeq
    assert(keys === keys.sorted)
  }

  test("triangle counts match a brute-force recount on the heavy core") {
    val dir = "/root/testdata/sf0.001"
    val out = Graph.triangles(spark, dir, topNodes = 50, topK = 10).collect()
    assert(out.nonEmpty)
    // brute force the same construction in scala
    val canon = Graph.copurchaseEdges(spark, dir)
      .filter($"src" < $"dst").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val degree = canon.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length).toMap
    val top = degree.toSeq.sortBy { case (n, d) => (-d, n) }.take(50).map(_._1).toSet
    val core = canon.filter(e => top(e._1) && top(e._2)).toSet
    val adj = core.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- core; c <- adj.getOrElse(b, Set.empty) if core((a, c))) {
      triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
    }
    out.foreach { r =>
      assert(r.getLong(1) === triCount(r.getLong(0)),
        s"triangle count mismatch at node ${r.getLong(0)}")
    }
    // descending with node tiebreak
    val keys = out.map(r => (-r.getLong(1), r.getLong(0))).toSeq
    assert(keys === keys.sorted)
  }

  test("k-hop BFS: layered min-hop on a path, shortcut wins, disconnected stays out") {
    // path 1-2-3-4-5-6 plus a shortcut 1-4; isolated component 10-11
    val undirected = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 4L), (10L, 11L))
    val edges = (undirected ++ undirected.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = Graph.khopOnEdges(edges, seeds, hops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4 is 1 hop via the shortcut, NOT 3 via the path; 6 is 3 via 4-5
    assert(out === Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L, 6L -> 3L))
  }

  test("item-item Jaccard neighbors match a naive basket recount") {
    val dir = "/root/testdata/sf0.001"
    val got = Graph.itemSimQuery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val baskets = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nItem = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairCounts = baskets.groupBy(_._1).values.flatMap { rows =>
      val pks = rows.map(_._2).sorted
      for (i <- pks.indices; j <- i + 1 until pks.length) yield (pks(i), pks(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def rnd4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val expected = pairCounts.toSeq.filter(_._2 >= 2L)
      .flatMap { case ((a, b), n) => Seq((a, b, n), (b, a, n)) }
      .map { case (item, nbr, n) =>
        (item, nbr, n, rnd4(n.toDouble / (nItem(item) + nItem(nbr) - n).toDouble))
      }
      .groupBy(_._1).toSeq.flatMap { case (item, rows) =>
        rows.sortBy { case (_, nbr, _, j) => (-j, nbr) }.take(5).zipWithIndex
          .map { case ((_, nbr, n, j), i) => (item, i + 1L, nbr, n, j) }
      }.sortBy(r => (r._1, r._2))
    assert(got.toSeq === expected)
    assert(got.nonEmpty)
  }

  test("k-hop driver query matches a naive unrolled expansion on real data") {
    val dir = "/root/testdata/sf0.001"
    val out = Graph.khopQuery(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive replay from the raw lineitem self-join
    val li = graft.Tables.lineitem(spark, dir)
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
    val e = li.as("a").join(li.as("b"),
        $"a.ok" === $"b.ok" && $"a.pk" =!= $"b.pk")
      .select($"a.pk".as("src"), $"b.pk".as("dst")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = e.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = e.map(_._1).distinct.sorted.take(5)
    var dist = seeds.map(_ -> 0L).toMap
    for (h <- 1 to 3) {
      val frontier = dist.filter(_._2 == h - 1L).keys
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h.toLong)
    }
    assert(out === dist)
    assert(out.nonEmpty)
  }

  test("clustering coefficient: triangle corners 1.0, hub diluted, pendants excluded") {
    // complete triangle {1,2,3} with pendant 4 hanging off node 1
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)).toDF("pa", "pb")
    val out = Graph.clusteringOnPairs(pairs, topK = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(2L) === ((2L, 1L, 1.0)))
    assert(out(3L) === ((2L, 1L, 1.0)))
    // hub: deg 3, one closed wedge of three → 2·1/(3·2)
    assert(out(1L) === ((3L, 1L, 0.3333)))
    // the pendant has no wedge to close and is excluded (deg < 2)
    assert(!out.contains(4L))
  }

  test("communitiesOnEdges converges disjoint components to their min ids") {
    // components {1,2,3} (path) and {10,11}; symmetric edge list
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (10L, 11L), (11L, 10L))
      .toDF("src", "dst")
    val labels = Graph.communitiesOnEdges(e, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("communitiesOnEdges rounds bound the label's reach to L hops") {
    // path 1-2-3-4-5: after ONE synchronous round node 3's label is
    // min within 1 hop (= 2), not the component min — bounded-round
    // semantics, what makes the operator oracle-checkable
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val e = (path ++ path.map(_.swap)).toDF("src", "dst")
    val one = Graph.communitiesOnEdges(e, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    val four = Graph.communitiesOnEdges(e, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(four.values.toSet === Set(1L))
  }

  test("ssspOnEdges: weighted shortcut beats fewer hops; tie resolves to fewest hops; round bound") {
    // planted graph from seed 1:
    //   1->2 len 10, 2->3 len 10 (two-hop cost 20)
    //   1->3 len 50 (direct but LONGER — must lose to the 2-hop path)
    //   1->4 len 7, 4->5 len 7, 5->6 len 7 (3 hops, exact at rounds=3)
    //   1->7 len 20 and 1->2(10)->7(10): EQUAL dist 20 -> tie law
    //   must pick fewest hops (1)
    val e = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 50L),
      (1L, 4L, 7L), (4L, 5L, 7L), (5L, 6L, 7L),
      (1L, 7L, 20L), (2L, 7L, 10L)
    ).toDF("src", "dst", "len")
    val seeds = Seq(1L).toDF("node")
    val out = Graph.ssspOnEdges(e, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(n: Long) = out(n) / 4
    def hops(n: Long) = out(n) % 4
    assert(dist(1L) === 0L && hops(1L) === 0L)
    assert(dist(3L) === 20L && hops(3L) === 2L, "shortcut must lose to cheaper 2-hop")
    assert(dist(6L) === 21L && hops(6L) === 3L, "3-edge path exact at rounds=3")
    assert(dist(7L) === 20L && hops(7L) === 1L, "dist tie must resolve to fewest hops")
    // round bound: at rounds=2 node 6 (only reachable in 3 edges) is absent
    val two = Graph.ssspOnEdges(e, seeds, rounds = 2)
      .collect().map(r => r.getLong(0)).toSet
    assert(!two.contains(6L) && two.contains(5L))
    // determinism
    val again = Graph.ssspOnEdges(e, seeds, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === out)
  }

  test("hitsOnEdges: strong-hub endorsement beats raw degree; exact integer replay") {
    // bipartite: S1 is a strong hub stocking parts 10..14; S2 also
    // stocks part 10; S3,S4,S5 are weak hubs all stocking part 15.
    // Part 15 has HIGHER degree (3) than part 10 (2) and parts 11..14
    // (1), but its endorsers are weak — HITS must rank it BELOW the
    // strong hub's parts, which raw degree cannot do.
    val edges = (Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
      (2L, 10L), (3L, 15L), (4L, 15L), (5L, 15L))).toDF("sk", "pk")
    val out = Graph.hitsOnEdges(edges, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val auth = out.map(t => t._1 -> t._2).toMap
    val deg = out.map(t => t._1 -> t._3).toMap
    assert(deg(15L) === 3L && deg(10L) === 2L)
    assert(auth(10L) > auth(15L), "strong-hub part must out-rank the popular weak part")
    (11L to 14L).foreach(p => assert(auth(p) > auth(15L),
      s"degree-1 strong-hub part $p must out-rank degree-3 weak part 15"))
    // exact replay of the integer law: h = deg, norm 1e6 DIV max,
    // then two a/h half-steps with the same normalization
    def fd(a: Long, b: Long) = Math.floorDiv(a, b)
    val adj = Map(1L -> Seq(10L, 11L, 12L, 13L, 14L), 2L -> Seq(10L),
      3L -> Seq(15L), 4L -> Seq(15L), 5L -> Seq(15L))
    val parts = adj.values.flatten.toSeq.distinct
    var h = adj.map { case (s, ps) => s -> ps.length.toLong }
    def normM(m: Map[Long, Long]) = { val mx = m.values.max; m.map { case (k, v) => k -> fd(v * 1000000L, mx) } }
    h = normM(h)
    var a = parts.map(p => p -> adj.collect { case (s, ps) if ps.contains(p) => h(s) }.sum).toMap
    a = normM(a)
    h = normM(adj.map { case (s, ps) => s -> ps.map(a).sum })
    a = normM(parts.map(p => p -> adj.collect { case (s, ps) if ps.contains(p) => h(s) }.sum).toMap)
    parts.foreach(p => assert(auth(p) === a(p), s"auth($p) != replay"))
  }

  test("sssp/hits: shuffle-default and broadcast paths agree; score-frame hints only on opt-in") {
    // r11 advisory #1: the generic iteration cores must not broadcast
    // data-sized relations by default. The planted graphs above run
    // the shuffle default; here both flags produce identical answers
    // and the analyzed-plan hint census shows the score/distance
    // broadcasts appear ONLY on opt-in (the 1-row mx normalizer's
    // 4 hints are size-independent and always present).
    val e = Seq(
      (1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 50L), (1L, 7L, 20L), (2L, 7L, 10L)
    ).toDF("src", "dst", "len")
    val seeds = Seq(1L).toDF("node")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(Graph.ssspOnEdges(e, seeds, 3)) ===
      m(Graph.ssspOnEdges(e, seeds, 3, broadcastDistances = true)))
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 15L), (4L, 15L))
      .toDF("sk", "pk")
    // hint census over the analyzed tree. Each norm() embeds its df
    // TWICE (under the mx agg and as the crossJoin side), so hint
    // occurrences follow hints(norm(x)) = 2·hints(x) + 1 — the
    // normalizer-only chain h1,a1,h2,a2 yields 1,3,7,15. The
    // broadcast opt-in adds one score-frame hint inside each of the
    // three half-step joins (2·(x+1)+1) plus the deg join at the top:
    // 1,5,13,29 → 30. What matters: the DELTA is the score/degree
    // frames, present only on opt-in.
    def hintCount(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.length
    val off = Graph.hitsOnEdges(edges, 10)
    val on = Graph.hitsOnEdges(edges, 10, broadcastScores = true)
    assert(m(off.select(col("p_partkey"), col("auth_1e6"))) ===
      m(on.select(col("p_partkey"), col("auth_1e6"))))
    assert(hintCount(off) === 15, "shuffle path: only the 1-row mx normalizers hint")
    assert(hintCount(on) === 30, "broadcast path: + score/degree frame hints")
  }
}
