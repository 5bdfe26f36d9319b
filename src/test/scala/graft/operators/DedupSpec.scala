package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "a completely different document about spark query engines and shuffles"),
    (3L, "yet another text mentioning vectors embeddings and nearest neighbors search")
  )

  test("shingles produce distinct word trigrams with short-doc fallback") {
    val out = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](1).toList).toSeq
    assert(out(0) === List("a b c", "b c d"))
    assert(out(1) === List("a b")) // shorter than n → whole doc
  }

  test("jaccard: identical=1, disjoint=0") {
    val df = Seq(
      (Seq("x", "y"), Seq("x", "y")),
      (Seq("x"), Seq("z"))
    ).toDF("a", "b").select(Dedup.jaccard(col("a"), col("b")).as("j"))
    val j = df.as[Double].collect()
    assert(j(0) === 1.0 && j(1) === 0.0)
  }

  test("ShingleHashes kernel is hash-set equal to the HOF shingle chain") {
    val docs = (base ++ Seq((4L, "a b"), (5L, "  padded   text  here now  "))).toDF("doc_id", "text")
    val rows = docs.select(
      graft.functions.ShingleHashes(col("text"), 3).as("k"),
      transform(Dedup.shingles(col("text"), 3), s => xxhash64(s)).as("h")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).toSet === r.getSeq[Long](1).toSet)
    }
  }

  test("SimHash64 kernel is bitwise equal to the HOF reference simhashColumn") {
    val docs = (base ++ Seq((4L, "x"), (5L, "  padded   text  here now  "))).toDF("doc_id", "text")
    val rows = docs.select(
      graft.functions.SimHash64(col("text")).as("k"),
      Dedup.simhashColumn(col("text")).as("h")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("md5-grid kernels match the in-plan md5/conv HOF references bitwise") {
    // The HOFs derive every value from Spark's OWN md5/conv builtins —
    // the exact formula the DuckDB oracles run — so kernel ≡ HOF is
    // the executable cross-engine contract for the certified family.
    val docs = (base ++ Seq((4L, "a b"), (5L, "  padded   text  here now  "))).toDF("doc_id", "text")
    val rows = docs.select(
      graft.functions.ShingleHashesMd5(col("text"), 3).as("shK"),
      Dedup.shingleHashesMd5Hof(col("text"), 3).as("shH"),
      graft.functions.SimHash60(col("text")).as("smK"),
      Dedup.simhash60Column(col("text")).as("smH"),
      Dedup.minhashSignatureGrid(graft.functions.ShingleHashesMd5(col("text"), 3)).as("mgK"),
      Dedup.minhashSignatureGridHof(Dedup.shingleHashesMd5Hof(col("text"), 3)).as("mgH"),
      // string-input path of the grid kernel = hashed path
      Dedup.minhashSignatureGrid(Dedup.shingles(col("text"), 3)).as("mgS")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0).toSet === r.getSeq[Long](1).toSet)
      assert(r.getLong(2) === r.getLong(3))
      assert(r.getSeq[Long](4) === r.getSeq[Long](5))
      assert(r.getSeq[Long](4) === r.getSeq[Long](6))
    }
  }

  test("simhash60 signatures stay within 60 bits; grid values within the Mersenne field") {
    val docs = base.toDF("doc_id", "text")
    val rows = docs.select(
      graft.functions.SimHash60(col("text")).as("sig"),
      Dedup.minhashSignatureGrid(graft.functions.ShingleHashesMd5(col("text"), 3)).as("mg")).collect()
    rows.foreach { r =>
      val sig = r.getLong(0)
      assert(sig >= 0L && sig < (1L << 60))
      r.getSeq[Long](1).foreach(v =>
        assert(v >= 0L && v < graft.functions.MinHashGridSignature.P))
    }
  }

  test("Xx64 family knob still recovers planted near-duplicates") {
    val docs = (base :+
      (11L, "the quick brown fox jumps over the lazy cat near the river bank today"))
      .toDF("doc_id", "text")
    val mh = Dedup.minhashPairs(docs, threshold = 0.4,
      hasher = Dedup.HashFamily.Xx64).collect()
    assert(mh.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 11L)))
    val sh = Dedup.simhashPairs(docs, maxHamming = 9,
      hasher = Dedup.HashFamily.Xx64).collect()
    assert(sh.map(r => (r.getLong(0), r.getLong(1))).toSet.contains((1L, 11L)))
  }

  test("MinHash long-input path (hashed shingles) matches the string path bitwise") {
    val docs = base.toDF("doc_id", "text")
    val rows = docs.select(
      Dedup.minhashSignature(graft.functions.ShingleHashes(col("text"), 3)).as("viaHashes"),
      Dedup.minhashSignature(Dedup.shingles(col("text"), 3)).as("viaStrings")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("minhash LSH recovers planted near-duplicates and skips unrelated docs") {
    // plant: doc 11 = doc 1 with one word changed
    val docs = (base :+
      (11L, "the quick brown fox jumps over the lazy cat near the river bank today"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, threshold = 0.4).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 11L)))
    assert(pairs.head.getAs[Double]("jaccard") > 0.5)
  }

  test("simhash places a near-duplicate closer than any unrelated pair") {
    val docs = (base :+
      (11L, "the quick brown fox jumps over the lazy cat near the river bank today"))
      .toDF("doc_id", "text")
    // radius from the DEFAULT (md5-grid, 60-bit) family's reference
    // formulation, so it matches what simhashPairs signs with
    val sigs = docs.select(col("doc_id"), Dedup.simhash60Column(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def h(a: Long, b: Long): Int = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    val nearDup = h(1L, 11L)
    val unrelated = Seq(h(1L, 2L), h(1L, 3L), h(2L, 3L))
    info(s"near-dup hamming=$nearDup unrelated=$unrelated")
    assert(unrelated.forall(_ > nearDup))
    // and the pair query recovers exactly that pair at radius = nearDup
    val pairs = Dedup.simhashPairs(docs, maxHamming = nearDup).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 11L)))
    // unrelated docs are NOT close at a tight radius
    val tight = Dedup.simhashPairs(base.toDF("doc_id", "text"), maxHamming = 3).collect()
    assert(tight.isEmpty)
  }

  test("prefix-filtered ngram join finds exactly the pairs above threshold") {
    val docs = (base :+
      (11L, "the quick brown fox jumps over the lazy cat near the river bank today"))
      .toDF("doc_id", "text")
    val top = Dedup.ngramJaccardPairs(docs, threshold = 0.5, topK = 5).collect()
    // brute-force ground truth over the same shingle sets
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val expected = (for {
      a <- sh.keys; b <- sh.keys if a < b
      j = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      if j >= 0.5
    } yield (a, b)).toSet
    assert(top.map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
    assert(expected === Set((1L, 11L))) // the planted near-dup, nothing else
  }

  test("prefix filtering matches brute force on a clustered corpus (recall = 1)") {
    // several planted families at different similarity levels
    val docs = (base ++ Seq(
      (11L, "the quick brown fox jumps over the lazy cat near the river bank today"),
      (12L, "zz the quick brown fox jumps over the lazy dog near the river bank today"),
      (21L, "a completely different document about flink query engines and shuffles"),
      (31L, "totally unrelated words about gardening tomatoes and weather patterns")))
      .toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(docs, threshold = 0.4, topK = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val expected = (for {
      a <- sh.keys; b <- sh.keys if a < b
      j = sh(a).intersect(sh(b)).size.toDouble / sh(a).union(sh(b)).size
      if j >= 0.4
    } yield (a, b)).toSet
    assert(got === expected)
    assert(expected.size >= 3) // non-trivial: 1-11, 1-12, 11-12, 2-21 …
  }

  test("minhash estimate-then-verify emits the same pairs as exhaustive verification") {
    val docs = (base ++ Seq(
      (11L, "the quick brown fox jumps over the lazy cat near the river bank today"),
      (12L, "xq the quick brown fox jumps over the lazy dog near the river bank today"),
      (21L, "a completely different document about flink query engines and shuffles")))
      .toDF("doc_id", "text")
    // margin 1.0 disables the estimate prune → exhaustive verification
    val exhaustive = Dedup.minhashPairs(docs, threshold = 0.4, estimateMargin = 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pruned = Dedup.minhashPairs(docs, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned === exhaustive)
    assert(exhaustive.map(t => (t._1, t._2)).contains((1L, 12L))) // j ≈ 0.92 planted pair
    assert(exhaustive.size >= 2)
  }

  test("incremental minhash finds delta-involving pairs, prunes corpus-internal ones") {
    // corpus contains its own internal exact dup (1 ↔ 4) which must
    // NOT be emitted; the delta doc is a near-dup of both
    val corpus = (base :+ (4L, base.head._2)).toDF("doc_id", "text")
    val delta = Seq(
      (11L, "the quick brown fox jumps over the lazy cat near the river bank today"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairsIncremental(corpus, delta, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall { case (a, b) => a == 11L || b == 11L },
      s"corpus-internal pair leaked: $pairs")
    assert(pairs.contains((1L, 11L)) && pairs.contains((4L, 11L)))
  }

  test("simhashPairs at radius 0 buckets on the full signature (no mask wrap)") {
    // doc 11 is an exact copy of doc 1 → identical signature
    val docs = (base :+ (11L, base.head._2)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 11L)))
  }

  test("dedupGroups collapses chained pairs into min-id components") {
    // chain 1-2-3-7 (diameter 3 → needs several propagation rounds)
    // plus a separate pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 7L)).toDF("doc_a", "doc_b")
    val out = Dedup.dedupGroups(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet === Set(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (7L, 1L, 4L),
      (10L, 10L, 2L), (11L, 10L, 2L)))
  }

  test("persisted pair-set index reproduces direct mining exactly, build-once") {
    val dir = "/root/testdata/sf0.001"
    val direct = Dedup.ngramJaccardPairs(Dedup.plantedDocs(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val indexed = Dedup.ngramTopQuery(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(indexed === direct)
    // second resolve is a metadata check on the SAME completed artifact
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-ngram-cache"
    val p1 = Dedup.ngramPairsIndexIfAbsent(Dedup.plantedDocs(spark, dir), root)
    val mtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(p1, "_INDEX_OK"))
    val p2 = Dedup.ngramPairsIndexIfAbsent(Dedup.plantedDocs(spark, dir), root)
    assert(p1 === p2)
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(p2, "_INDEX_OK")) === mtime)
  }

  test("pair queries release their signature caches (session-reuse safe)") {
    import org.apache.spark.sql.GraftSqlBridge
    val docs = (base :+
      (11L, "the quick brown fox jumps over the lazy cat near the river bank today"))
      .toDF("doc_id", "text")
    Dedup.minhashPairs(docs, threshold = 0.4).collect()
    Dedup.simhashPairs(docs, maxHamming = 3).collect()
    Dedup.ngramJaccardPairs(docs, threshold = 0.5).collect()
    Dedup.dedupGroups(Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")).collect()
    assert(GraftSqlBridge.cacheIsEmpty(spark),
      "dedup pipelines left persisted plans behind")
  }

  test("embedding near-dup top pairs surfaces a planted duplicate vector") {
    val vecs = Seq(
      (1L, Seq.tabulate(64)(i => math.sin(i).toFloat), 0),
      (2L, Seq.tabulate(64)(i => math.cos(i * 2).toFloat), 1),
      (3L, Seq.tabulate(64)(i => (math.sin(i) + 0.001).toFloat), 0) // ≈ vec 1
    ).toDF("vec_id", "embedding", "label")
    val top = Dedup.embeddingNearDupTop(vecs, topK = 3).collect()
    assert(top.nonEmpty)
    assert((top.head.getLong(0), top.head.getLong(1)) === (1L, 3L))
    assert(top.head.getAs[Double]("cosine") > 0.999)
  }

  test("planted embedding near-dups: truth set is exactly the 5 planted pairs, LSH finds all") {
    val dir = "/root/testdata/sf0.001"
    val truth = Dedup.embeddingExactPairs(Dedup.plantedEmbeddings(spark, dir), 0.95)
      .collect()
    // the base table has no pair above ~0.5 cosine, so the ≥0.95 truth
    // set is precisely source↔perturbed-copy for the 5 planted vectors
    assert(truth.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      (0L until 5L).map(i => (i, i + 1000000L)))
    truth.foreach(r => assert(r.getAs[Double]("cosine") > 0.999))
    // the O(N·planted) truth restriction the driver queries use is
    // lossless vs the quadratic formulation at the 0.95 bar
    val restricted = Dedup.plantedTruthPairs(Dedup.plantedEmbeddings(spark, dir), 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(restricted === truth.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    val q = Dedup.embedNearDupQuery(spark, dir).collect()
    val recalls = q.map(_.getAs[Double]("recall_planted")).distinct
    assert(recalls.length === 1)
    assert(recalls.head === 1.0, s"LSH missed planted near-dups: recall ${recalls.head}")
    // the planted pairs dominate the top of the ranked output
    assert(q.take(5).forall(_.getAs[Double]("cosine") > 0.999))
  }

  test("semantic dedup finds every planted pair within its learned cluster") {
    val emb = Dedup.plantedEmbeddings(spark, "/root/testdata/sf0.001")
    val out = Dedup.semanticNearDup(emb, minCosine = 0.9).collect()
    // the 5 planted (v, v+1e6) pairs are the only cosine ≥ 0.9 pairs
    // in the corpus, and a perturbed copy must land in its twin's
    // cluster — SemDeDup's premise
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 5L).foreach(v => assert(pairs.contains((v, v + 1000000L)),
      s"planted pair $v missing from $pairs"))
    out.foreach(r => assert(r.getDouble(3) >= 0.9))
  }

  test("indexed semantic dedup equals the inline path row for row") {
    val emb = Dedup.plantedEmbeddings(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files
      .createTempDirectory("semdedup-spec").toString
    val indexed = Dedup.semanticNearDupIndexed(emb, root).collect().toSeq
    // second call resolves the completed artifact instead of rebuilding
    val again = Dedup.semanticNearDupIndexed(emb, root).collect().toSeq
    val inline = Dedup.semanticNearDup(emb, minCosine = 0.9).collect().toSeq
    assert(indexed === inline)
    assert(again === inline)
  }

  test("semantic dedup pair clusters agree with a direct assignment recomputation") {
    val emb = Dedup.plantedEmbeddings(spark, "/root/testdata/sf0.001")
    val v = emb.select(col("vec_id"), col("embedding").as("vec"))
    val cents = VectorOps.kmeansCentroids(v, Dedup.semanticK(v.count(), 32), 2)
    val labels = v.select(col("vec_id"),
      VectorOps.nearestCentroidId(col("vec"), cents).as("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    Dedup.semanticNearDup(emb, minCosine = 0.9).collect().foreach { r =>
      assert(labels(r.getLong(0)) === r.getInt(2))
      assert(labels(r.getLong(1)) === r.getInt(2))
    }
  }

  test("repeated-substring miner surfaces planted spans at exact offsets") {
    val out = Dedup.repeatedSubstringsQuery(spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 0's first 30 tokens were planted after 10 tokens of doc 1
    // (id 3000001) and after 5 tokens of doc 2 (id 3000002): the miner
    // must recover all three sharing relations at those exact offsets
    assert(out.contains((0L, 3000001L, 0L, 10L, 30L)))
    assert(out.contains((0L, 3000002L, 0L, 5L, 30L)))
    assert(out.contains((3000001L, 3000002L, 10L, 5L, 30L)))
    // spans are maximal: no other row pairs doc 0 with a planted doc
    assert(out.count(t => t._2 >= 3000000L || t._1 >= 3000000L) === 3)
  }

  test("repeated-substring miner: islands give exact maximal span lengths") {
    import spark.implicits._
    // two docs sharing exactly tokens 3..27 of a (25-token span) at
    // different offsets, plus an unrelated doc
    val span = (1 to 25).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $span z1 z2"),
      (2L, s"b1 $span y1 y2 y3"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14 c15 c16 c17 c18 c19 c20 c21")
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSubstrings(docs, k = 20, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 2L, 3L, 1L, 25L)))
  }

  test("semanticK keeps mean cluster cardinality fixed as the corpus grows") {
    assert(Dedup.semanticK(505L, 32) === 16)
    assert(Dedup.semanticK(50500L, 32, maxClusters = 4096) === 1579) // 100× corpus → 100× k
    // the cap bounds ASSIGNMENT cost (O(n·k·dim) would go quadratic
    // with k ∝ n); past it the oversized-cluster LSH banding owns
    // candidate bounding
    assert(Dedup.semanticK(50500L, 32) === 16)
    assert(Dedup.semanticK(3L, 32) === 2)          // floor
  }

  test("semantic dedup: oversized cluster is banded without losing pairs (scale guard)") {
    // engineer a corpus whose dominant cluster exceeds the size cap:
    // the sf0.001 embeddings plus 40 near-identical perturbations of
    // vector 0 (component j scaled by 1 + i/1e4) — all 41 copies are
    // mutual near-dups and must land in one k-means cluster
    val dir = "/root/testdata/sf0.001"
    val baseEmb = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val copies = baseEmb.filter(col("vec_id") === 0)
      .select(explode(sequence(lit(1), lit(40))).as("i"), col("embedding"))
      .select((col("i") + 2000000L).as("vec_id"),
        transform(col("embedding"), x =>
          (x.cast("double") * (lit(1.0) + col("i").cast("double") / lit(10000.0)))
            .cast("float")).as("embedding"))
    val emb = baseEmb.unionByName(copies)
    val target = 8
    val capFactor = 2 // cap = 16 < 41 ⇒ the big cluster MUST overflow
    // precondition: some learned cluster really exceeds the cap
    val v = emb.select(col("vec_id"), col("embedding").as("vec"))
    val cents = VectorOps.kmeansCentroids(v, Dedup.semanticK(v.count(), target), 2)
    val maxCluster = v.select(VectorOps.nearestCentroidId(col("vec"), cents).as("label"))
      .groupBy(col("label")).count().agg(max(col("count"))).head().getLong(0)
    assert(maxCluster > target.toLong * capFactor,
      s"corpus failed to produce an oversized cluster (max $maxCluster)")
    // the guarded (banded) path finds exactly what the unguarded
    // exact within-cluster search finds — the guard changes cost
    // shape, not output
    def run(band: Boolean) =
      Dedup.semanticNearDup(emb, targetClusterSize = target,
        maxClusterFactor = capFactor, minCosine = 0.9, topK = 5000,
        bandOversized = band)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    val banded = run(band = true)
    assert(banded === run(band = false))
    // and the engineered copies are actually surfaced as near-dups
    val pairs = banded.map(t => (t._1, t._2)).toSet
    assert(pairs.contains((0L, 2000001L)), s"copy pair missing from ${pairs.take(5)}")
  }

  test("keeper selection: one keeper per group, longest-with-id-tiebreak, planted clones win") {
    val sfDir = "/root/testdata/sf0.001"
    val keepers = Dedup.dedupKeepersQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(keepers.nonEmpty)
    assert(keepers.map(_._1).distinct.length === keepers.length, "one keeper per group")
    keepers.foreach { case (_, size, _, _, removed) => assert(removed === size - 1) }
    val groups = Dedup.dedupGroupsQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val lens = Dedup.plantedDocs(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    keepers.foreach { case (gid, _, keeper, klen, _) =>
      val members = groups(gid)
      assert(members.contains(keeper), s"keeper $keeper not in its group $gid")
      assert(klen === members.map(lens).max, s"group $gid keeper is not longest")
      assert(lens(keeper) === klen)
    }
    // the five planted clones carry an 'xq ' prefix (+3 chars): in a
    // pure (source, clone) pair the clone must win keep-longest; a
    // clone group that also absorbed organic near-dups may keep a
    // longer organic member (covered by the max-length check above)
    (0 to 4).foreach { d =>
      keepers.find(_._1 == d).foreach { k =>
        if (k._2 == 2) assert(k._3 === d + 1000000L,
          s"pair group $d should keep the longer clone, kept ${k._3}")
      }
    }
  }

  test("span scrub removes exactly the embedded copy and keeps the host prefix") {
    val sfDir = "/root/testdata/sf0.001"
    val out = Dedup.spanScrubQuery(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // the two constructed docs embed doc 0's first 30 tokens after a
    // host prefix; scrubbing must delete exactly those 30 tokens and
    // reassemble to the bare prefix
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toSeq).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp(toks: Seq[String]) =
      md.digest(toks.mkString(" ").getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val embedLen = math.min(30, docs(0L).length).toLong
    Seq((3000001L, docs(1L).take(10)), (3000002L, docs(2L).take(5))).foreach {
      case (id, prefix) =>
        val (n, removed, hash) = out(id)
        assert(n === prefix.length + embedLen, s"doc $id token count")
        assert(removed === embedLen, s"doc $id must lose exactly the embedded span")
        assert(hash === fp(prefix), s"doc $id reassembly")
    }
    // sanity over all affected docs
    assert(out.values.forall { case (n, rm, _) => rm > 0 && rm <= n })
  }

  test("containment finds planted fragments that Jaccard cannot see") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Dedup.plantedFragmentDocs(spark, sfDir)
    val cont = Dedup.containmentPairs(docs, threshold = 0.9, topK = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    // every planted fragment is contained in its source at exactly 1.0
    // (a contiguous token prefix's shingles are a subset of the doc's)
    val planted = (0L to 4L).map(d => (d + 2000000L, d))
    planted.foreach { case (frag, src) =>
      val hit = cont.find(p => p._1 == frag && p._2 == src)
      assert(hit.isDefined, s"fragment $frag not found in $src")
      assert(hit.get._3 === 1.0)
    }
    // direction invariant: doc_a is never the larger set
    val all = Dedup.containmentPairs(docs, threshold = 0.9, topK = 0)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(all.forall { case (la, lb) => la <= lb })
    // the same fragment pairs are INVISIBLE to Jaccard at 0.6 when the
    // fragment is a genuine minority slice of its source
    val jac = Dedup.ngramJaccardPairs(docs, threshold = 0.6, topK = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val invisible = planted.count { case (frag, src) =>
      !jac.contains((src, frag)) && !jac.contains((frag, src))
    }
    assert(invisible >= 3,
      s"expected most 40% fragments below the Jaccard threshold, got $invisible/5 invisible")
  }

  test("incremental group maintenance merges groups and surfaces emergent docs") {
    import spark.implicits._
    // stored artifact: two groups {1,2} and {5,6}; corpus doc 9 was a
    // singleton (no stored label — labels only cover paired docs)
    val oldLabels = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "group_id")
    // delta: doc 100 bridges BOTH old groups; doc 200 pairs with the
    // previously-unlabeled 9; 100-200 chains everything checked below
    val delta = Seq((2L, 100L), (100L, 5L), (9L, 200L))
      .toDF("doc_a", "doc_b")
    val out = Dedup.dedupGroupsIncremental(oldLabels, delta).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = Seq(
      (1L, 1L, 5L), (2L, 1L, 5L), (5L, 1L, 5L), (6L, 1L, 5L), (100L, 1L, 5L),
      (9L, 9L, 2L), (200L, 9L, 2L))
      .sortBy(t => (t._2, t._1))
    assert(out.toSeq === expected)
  }

  test("incremental query equals the full recompute on the planted corpus") {
    val sfDir = "/root/testdata/sf0.001"
    val full = Dedup.dedupGroupsQuery(spark, sfDir).collect().map(_.toSeq)
    val incr = Dedup.dedupGroupsIncrQuery(spark, sfDir).collect().map(_.toSeq)
    assert(incr.toSeq === full.toSeq)
    assert(full.nonEmpty)
  }
}
