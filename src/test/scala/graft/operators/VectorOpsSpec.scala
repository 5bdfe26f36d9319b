package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("matryoshka: full-dim recall is 1.0 and a planted prefix inversion is caught") {
    // q's true nearest is a (same direction); b's 1-dim prefix ties a's
    // (both positive first component → 1-dim cosine 1) and b's lower
    // vec_id wins the tie, so the dim-1 top-1 is WRONG and recall@1
    // drops to 0 — while the full-dim pass must always score 1.0.
    val queries = Seq((100L, Seq(1.0f, 1.0f))).toDF("query_id", "qvec")
    val corpus = Seq(
      (1L, Seq(5.0f, -5.0f)), // bad full-dim match, perfect 1-dim prefix
      (2L, Seq(1.0f, 1.0f))   // the true nearest
    ).toDF("vec_id", "vec")
    val byDim = VectorOps.matryoshkaRecall(queries, corpus, dims = Seq(1, 2), k = 1)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("top1_vec_id"), r.getAs[Double]("recall_at_k"))).toMap
    assert(byDim(1L) === ((1L, 0.0))) // prefix tie broken to lower id → miss
    assert(byDim(2L) === ((2L, 1.0))) // full dim recovers the true nearest
  }

  test("matryoshka on testdata: one row per (dim, query), full dim exact") {
    val out = VectorOps.matryoshkaQuery(spark, sfDir).collect()
    val dims = out.map(_.getLong(0)).distinct.sorted
    assert(dims === Array(8L, 16L, 32L, 64L))
    val queries = out.map(_.getLong(1)).distinct
    assert(out.length === dims.length * queries.length)
    // the 64-dim slice IS the full vector: recall must be exactly 1.0
    out.filter(_.getLong(0) == 64L)
      .foreach(r => assert(r.getAs[Double]("recall_at_10") === 1.0))
    out.foreach { r =>
      val rec = r.getAs[Double]("recall_at_10")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("cosine identities: cos(v,v)=1, symmetry, orthogonality") {
    val df = Seq(
      (Seq(1.0f, 0.0f, 2.0f), Seq(1.0f, 0.0f, 2.0f)),
      (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f))
    ).toDF("a", "b")
    val out = df.select(
      VectorOps.cosine(col("a"), col("b")).as("ab"),
      VectorOps.cosine(col("b"), col("a")).as("ba")).collect()
    assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)
    assert(out(1).getDouble(0) === 0.0)
    assert(out(0).getDouble(0) === out(0).getDouble(1)) // symmetry
  }

  test("dot and l2 agree with hand computation") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val r = df.select(
      VectorOps.dot(col("a"), col("b")).as("d"),
      VectorOps.l2(col("a"), col("b")).as("e")).collect().head
    assert(r.getDouble(0) === 11.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(8.0)) < 1e-12)
  }

  test("LshSignatures kernel is bitwise equal to the per-plane HOF fold") {
    val tables = 4
    val bits = 6
    val dim = 8
    val allPlanes = (0 until tables).map(t => VectorOps.hyperplanes(bits, dim, 7L + t))
    val df = Seq(
      Seq.tabulate(dim)(i => math.sin(i + 1).toFloat),
      Seq.tabulate(dim)(i => -math.cos(i).toFloat),
      Seq.fill(dim)(0.0f),
      Seq(1.0f, 2.0f) // dimension mismatch → all-zero signatures
    ).toDF("vec")
    val rows = df.select(
      graft.functions.LshSignatures(col("vec"), allPlanes).as("kernel"),
      array(allPlanes.map(p => VectorOps.lshSignature(col("vec"), p)): _*).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
    assert(rows.last.getSeq[Long](0) === Seq.fill(tables)(0L)) // mismatch case
  }

  test("knnBrute returns the true nearest neighbor first on planted data") {
    val queries = Seq((100L, Seq(1.0f, 0.0f))).toDF("query_id", "qvec")
    val corpus = Seq(
      (1L, Seq(0.99f, 0.05f)),  // nearly parallel → best
      (2L, Seq(0.0f, 1.0f)),    // orthogonal
      (3L, Seq(-1.0f, 0.0f))    // opposite
    ).toDF("vec_id", "vec")
    val out = VectorOps.knnBrute(queries, corpus, k = 2).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq === Seq(1L, 2L))
  }

  test("lsh signature is deterministic and in range") {
    val planes = VectorOps.hyperplanes(8, 2)
    assert(planes === VectorOps.hyperplanes(8, 2)) // seeded → stable
    val df = Seq(Tuple1(Seq(1.0f, 2.0f)), Tuple1(Seq(-1.0f, -2.0f))).toDF("vec")
    val sigs = df.select(VectorOps.lshSignature(col("vec"), planes).as("sig"))
      .as[Long].collect()
    assert(sigs.forall(s => s >= 0 && s < 256))
    val again = df.select(VectorOps.lshSignature(col("vec"), planes).as("sig"))
      .as[Long].collect()
    assert(sigs.toSeq === again.toSeq)
  }

  test("ann lsh achieves nonzero recall@10 vs brute force on sf0.001") {
    val queries = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"), col("label"))
    val brute = VectorOps.knnBrute(queries, corpus, 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = VectorOps.annLsh(queries, corpus, 10, multiProbe = false)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = VectorOps.annLsh(queries, corpus, 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallSingle = (brute intersect single).size.toDouble / brute.size
    val recallMulti = (brute intersect multi).size.toDouble / brute.size
    info(f"LSH recall@10: single-probe=$recallSingle%.3f multi-probe=$recallMulti%.3f")
    assert(recallSingle > 0.25, s"single-probe LSH recall collapsed: $recallSingle")
    assert(recallMulti >= recallSingle)
    // production floor: 16 tables × hamming-1 multi-probe (swept r5)
    assert(recallMulti >= 0.8, s"multi-probe LSH recall under floor: $recallMulti")
  }

  test("k-means IVF trains deterministic centroids and beats a recall floor") {
    val queries = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"), col("label"))
    val c1 = VectorOps.kmeansCentroids(corpus, k = 8, iters = 2)
    val c2 = VectorOps.kmeansCentroids(corpus, k = 8, iters = 2)
    assert(c1 === c2, "k-means training is not deterministic")
    assert(c1.nonEmpty && c1.forall(_._2.length === 64))
    val brute = VectorOps.knnBrute(queries, corpus, 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = VectorOps.annIvfKmeans(queries, corpus, 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ivf).size.toDouble / brute.size
    info(f"k-means IVF recall@10 (default nprobe 12/16) = $recall%.3f")
    // production floor at the swept default probe width
    assert(recall >= 0.8, s"k-means IVF recall under floor: $recall")
  }

  test("withRecallAt attaches the true per-query recall@10 column") {
    val queries = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"), col("label"))
    val brute = VectorOps.knnBrute(queries, corpus, 10)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val out = VectorOps.withRecallAt(VectorOps.annLsh(queries, corpus, 10),
      queries, corpus, 10).collect()
    assert(out.nonEmpty)
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (qid, rows) =>
      val returned = rows.map(_.getAs[Long]("vec_id")).toSet
      val expected = (returned intersect brute(qid)).size / 10.0
      val cols = rows.map(_.getAs[Double]("recall_at_10")).distinct
      assert(cols.length === 1, s"recall column not constant for query $qid")
      assert(cols.head === expected, s"recall mismatch for query $qid")
    }
    // production floors for the driver-visible wrappers (swept r5:
    // lsh 16 tables, kmeans nprobe 12/16, pq kCodes 32 + shortlist 200)
    val floors = Seq(
      VectorOps.annLshQuery(spark, sfDir) -> 0.8,
      VectorOps.annKmeansQuery(spark, sfDir) -> 0.8,
      VectorOps.annPqQuery(spark, sfDir) -> 0.8,
      VectorOps.annIvfPqQuery(spark, sfDir) -> 0.8)
    floors.foreach { case (df, floor) =>
      val mean = df.agg(avg(col("recall_at_10"))).collect().head.getDouble(0)
      assert(mean > floor, s"mean recall $mean under floor $floor")
    }
  }

  test("nprobe-vs-recall curve is monotone and ends at exactly 1.0") {
    val queries = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"), col("label"))
    val curve = VectorOps.annRecallCurve(queries, corpus, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(curve.map(_._1).toSeq === (1L to 16L))
    // nondecreasing in nprobe
    assert(curve.sliding(2).forall { case Array(a, b) => b._2 >= a._2 })
    // probing every cell IS brute force — the endpoint certifies the
    // whole derivation
    assert(curve.last._2 === 1.0)
    // the curve's point at the shipped default must agree with the
    // independently-measured recall of the actual search path
    val measured = VectorOps.annKmeansQuery(spark, sfDir)
      .groupBy(col("query_id")).agg(first(col("recall_at_10")).as("r"))
      .agg(avg(col("r"))).head().getDouble(0)
    val curveAt12 = curve(11)._2
    assert(math.abs(curveAt12 - measured) < 1e-9,
      s"curve point $curveAt12 disagrees with measured recall $measured")
  }

  test("map-stage nearest-centroid assignment matches the join+min_by formulation") {
    val corpus = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"))
    val cents = VectorOps.kmeansCentroids(corpus, k = 8, iters = 1)
    val mapSide = corpus
      .select(col("vec_id"), VectorOps.nearestCentroidId(col("vec"), cents).as("c_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the round-2 formulation: broadcast-join corpus × centroids,
    // then per-vector min_by on (distance, c_id)
    val centDf = broadcast(cents.toDF("c_id", "centroid"))
    val joined = corpus.join(centDf)
      .select(col("vec_id"), col("c_id"),
        VectorOps.l2(col("vec"), col("centroid")).as("d"))
      .groupBy(col("vec_id"))
      .agg(min_by(col("c_id"), struct(col("d"), col("c_id"))).as("c_id"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(mapSide.size === joined.size)
    assert(mapSide === joined)
  }

  test("PqEncode kernel is bitwise equal to the HOF encoding") {
    val corpus = graft.Tables.embeddings(spark, sfDir).limit(100)
      .select(col("vec_id"), col("embedding").as("vec"))
    val flat = VectorOps.pqTrain(corpus, m = 8, kCodes = 16, iters = 1, dim = 64)
    val rows = corpus.select(
      graft.functions.PqEncode(col("vec"), flat.toSeq, 8, 16, 8).as("kernel"),
      VectorOps.pqEncodeHof(col("vec"), flat, 8, 16, 8).as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Int](0) === r.getSeq[Int](1)))
  }

  test("PQ-ADC with exact re-rank beats a recall floor at 32x compression") {
    val queries = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"), col("label"))
    val brute = VectorOps.knnBrute(queries, corpus, 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = VectorOps.annPq(queries, corpus, 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect pq).size.toDouble / brute.size
    info(f"PQ recall@10 (m=8, kCodes=32, shortlist 200) = $recall%.3f")
    // production floor at the swept defaults
    assert(recall >= 0.8, s"PQ recall under floor: $recall")
    // training is deterministic
    val f1 = VectorOps.pqTrain(corpus, m = 8, kCodes = 16, iters = 2, dim = 64)
    val f2 = VectorOps.pqTrain(corpus, m = 8, kCodes = 16, iters = 2, dim = 64)
    assert(f1.toSeq === f2.toSeq)
  }

  test("ann ivf returns k ranked rows per query with valid scores") {
    val queries = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 5)
      .select(col("vec_id"), col("embedding").as("vec"), col("label"))
    val out = VectorOps.annIvf(queries, corpus, k = 5, nprobe = 2).collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size === 5)
    byQuery.values.foreach { rows =>
      assert(rows.length === 5)
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      rows.foreach(r => assert(math.abs(r.getAs[Double]("score")) <= 1.0001))
    }
  }

  test("Int8Dot kernel is bitwise equal to the HOF fold and null on length mismatch") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(50)((
      Seq.fill(64)((rnd.nextInt(255) - 127).toByte),
      Seq.fill(64)((rnd.nextInt(255) - 127).toByte)))
    val df = spark.createDataFrame(rows).toDF("a", "b")
    val both = df.select(
      graft.functions.VectorExpressions.int8Dot(col("a"), col("b")).as("k"),
      VectorOps.intDotHof(col("a"), col("b")).as("h")).collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val mismatch = spark.createDataFrame(
      Seq((Seq[Byte](1, 2, 3), Seq[Byte](1, 2)))).toDF("a", "b")
      .select(graft.functions.VectorExpressions.int8Dot(col("a"), col("b")).as("k"))
      .collect()
    assert(mismatch.head.isNullAt(0), "dimension mismatch must be NULL")
  }

  test("AdcScore kernel is bitwise equal to the HOF lookup-sum") {
    val rnd = new scala.util.Random(23)
    val (m, kCodes) = (8, 32)
    val rows = Seq.fill(80)((
      Seq.fill(m)(rnd.nextInt(kCodes)),
      Seq.fill(m * kCodes)(rnd.nextDouble() * 3)))
    val df = spark.createDataFrame(rows).toDF("codes", "lut")
    val both = df.select(
      graft.functions.AdcScore(col("codes"), col("lut"), kCodes).as("k"),
      VectorOps.adcScoreHof(col("codes"), col("lut"), m, kCodes).as("h")).collect()
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    // an out-of-range lookup nulls the score, like non-ANSI element_at
    val oob = spark.createDataFrame(Seq((Seq(kCodes + 5), Seq(0.5))))
      .toDF("codes", "lut")
      .select(graft.functions.AdcScore(col("codes"), col("lut"), kCodes).as("k"))
      .collect()
    assert(oob.head.isNullAt(0))
  }

  test("Int8Encode kernel is bitwise equal to the HOF encode chain") {
    val rnd = new scala.util.Random(17)
    val vecs = Seq.fill(60)(Seq.fill(64)((rnd.nextDouble() * 4 - 2).toFloat)) ++
      Seq(Seq.fill(64)(0.0f)) // all-zero vector exercises the s=1.0 fallback
    val df = spark.createDataFrame(vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) })
      .toDF("vec_id", "v")
    val kernel = VectorOps.sqEncodeAll(df, "v")
      .select("vec_id", "_s", "_c8", "_n").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getSeq[Byte](2), r.getDouble(3)))).toMap
    val hof = VectorOps.sqEncodeAllHof(df, "v")
      .select("vec_id", "_s", "_c8", "_n").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getSeq[Byte](2), r.getDouble(3)))).toMap
    assert(kernel.keySet === hof.keySet)
    kernel.foreach { case (id, (s, c8, n)) =>
      val (hs, hc8, hn) = hof(id)
      assert(s === hs, s"scale mismatch at $id")          // bitwise: same double ops
      assert(c8 === hc8, s"codes mismatch at $id")
      assert(n === hn, s"norm mismatch at $id")
    }
    // float and double element types both accepted
    val dbl = spark.createDataFrame(Seq((1L, Seq(0.5, -1.25, 2.0))))
      .toDF("vec_id", "v")
    assert(VectorOps.sqEncodeAll(dbl, "v").select("_c8").head().getSeq[Byte](0).nonEmpty)
  }

  test("SQ8 ANN: int8 codes (4x compression), high recall, deterministic") {
    val queries = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"), col("label"))
    val brute = VectorOps.knnBrute(queries, corpus, 10)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = VectorOps.annSq(queries, corpus, 10)
    val got = sq.select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    info(f"SQ8 recall@10 (shortlist 50) = $recall%.3f")
    // int8 is a far gentler approximation than PQ — recall should be near-exact
    assert(recall > 0.9, s"SQ8 recall collapsed: $recall")
    assert(sq.collect().toSeq === VectorOps.annSq(queries, corpus, 10).collect().toSeq)
  }

  test("MMR re-rank equals a naive in-memory greedy replay on real data") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"))
    val k = 5; val shortlist = 8
    val out = HybridSearch.mmrRerank(queries, corpus, k, shortlist).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // naive replay: same rounded sims (engine kernel), greedy in Scala
    def s4(c: org.apache.spark.sql.Column) =
      floor(c * lit(10000.0) + lit(0.5)).cast("long")
    val rel = corpus.join(broadcast(queries))
      .select(col("query_id"), col("vec_id"),
        s4(VectorOps.cosine(col("qvec"), col("vec"))).as("rel4"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byQ = rel.groupBy(_._1._1)
    val expected = byQ.keys.toSeq.sorted.flatMap { qid =>
      val cands = byQ(qid).toSeq.map { case ((_, v), r) => (v, r) }
        .sortBy { case (v, r) => (-r, v) }.take(shortlist)
      val vecs = corpus.filter(col("vec_id").isin(cands.map(_._1): _*))
      val sim = vecs.as("a").join(vecs.as("b"),
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"),
          s4(VectorOps.cosine(col("a.vec"), col("b.vec"))).as("v4"))
        .collect().flatMap(r => Seq((r.getLong(0), r.getLong(1)) -> r.getLong(2),
          (r.getLong(1), r.getLong(0)) -> r.getLong(2))).toMap
      var sel = List.empty[Long]
      (1 to k).map { rank =>
        val (best, mmr) = cands.filterNot(c => sel.contains(c._1))
          .map { case (v, r) =>
            val red = if (sel.isEmpty) 0L else sel.map(s => sim((v, s))).max
            (v, 7L * r - 3L * red)
          }
          .minBy { case (v, m) => (-m, v) }
        sel ::= best
        (qid, rank.toLong, best, mmr)
      }
    }
    assert(out.toSeq === expected)
    // structural: rank 1 is the pure-relevance argmax; no repeats
    out.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._3).distinct.length === rows.length)
      val top = byQ(qid).toSeq.map { case ((_, v), r) => (v, r) }
        .minBy { case (v, r) => (-r, v) }
      assert(rows.find(_._2 == 1L).get._3 === top._1)
    }
  }

  test("k-center coreset: greedy selection replays exactly; covering radius non-increasing") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val res = VectorOps.kcenterSelect(emb, 8).collect()
    assert(res.length === 8)
    val ids = res.map(_.getLong(1))
    assert(ids.distinct.length === 8, "selected centers repeat")
    assert(res.head.isNullAt(2), "seed must carry NULL sel_dist")
    // radius sequence non-increasing (greedy invariant)
    val dists = res.drop(1).map(_.getDouble(2))
    dists.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"covering radius grew: $a -> $b")
    }
    // full driver-side replay in plain doubles: same seed law (min
    // md5('kc:'||id) hex rank), same kernel arithmetic (left-to-right
    // double fold), same argmax with id tie-break
    val all = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .filter { case (_, v) => v.exists(_ != 0f) }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def cosDist(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = all.toMap
    val seed = all.map(_._1).minBy(id => (md5hex("kc:" + id), id))
    assert(ids.head === seed, s"seed diverged: ${ids.head} vs $seed")
    var mind = all.map { case (id, v) => id -> cosDist(byId(seed), v) }.toMap
    for (i <- 1 until 8) {
      val next = mind.toSeq.minBy { case (id, d) => (-d, id) }
      assert(ids(i) === next._1,
        s"round ${i + 1} selection diverged: got ${ids(i)}, replay ${next._1}")
      assert(math.abs(dists(i - 1) -
        math.floor(next._2 * 10000.0 + 0.5) / 10000.0) < 1e-9)
      val nv = byId(next._1)
      mind = mind.map { case (id, d) => id -> math.min(d, cosDist(nv, byId(id))) }
    }
  }

  test("silhouette: tight separated clusters score near 1; straddlers score low; coverage exact") {
    import spark.implicits._
    // two tight blobs far apart in 4-d, plus one straddler midway:
    // k=2 k-means must separate the blobs; blob members score near 1
    // (a ~ 0.1-scale, b ~ 10-scale) while the midpoint straddler's
    // a and b are comparable, pulling ITS cluster's min down
    def blob(cx: Double, n: Int, off: Int) = (0 until n).map { i =>
      (s"v${off + i}", Array(cx + 0.01f * (i % 5), cx - 0.01f * (i % 3),
        cx.toFloat, cx.toFloat).map(_.toFloat).toSeq)
    }
    val pts = blob(0.0, 20, 0) ++ blob(10.0, 20, 100) ++
      Seq(("vmid", Seq(5.0f, 5.0f, 5.0f, 5.0f)))
    val c = pts.toDF("vec_id", "vec")
    val out = VectorOps.silhouetteOf(c, kClusters = 2, iters = 2).collect()
    assert(out.map(_.getLong(1)).sum === 41L, "every point scored exactly once")
    // both clusters' MEAN silhouette is high (blob members dominate)
    out.foreach(r => assert(r.getLong(2) > 8000L,
      s"cluster ${r.getLong(0)} mean ${r.getLong(2)}"))
    // the straddler is the corpus-wide minimum and is far below the
    // blob members' scores
    val minSil = out.map(_.getLong(3)).min
    assert(minSil < 5000L, s"straddler not visible in min: $minSil")
    assert(out.map(_.getLong(4)).max > 9500L, "tight members must approach 1")
    // determinism
    val again = VectorOps.silhouetteOf(c, kClusters = 2, iters = 2).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }
}
