package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpqSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("jacobiEigen recovers a known spectrum and returns an orthonormal basis") {
    // A = Q diag(5,2,1) Qᵀ for a hand-built rotation Q (xy-plane angle)
    val c = math.cos(0.3); val s = math.sin(0.3)
    val q = Array(Array(c, -s, 0.0), Array(s, c, 0.0), Array(0.0, 0.0, 1.0))
    val d = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => q(i)(k) * d(k) * q(j)(k)).sum)
    val (vals, vecs) = OpqRotation.jacobiEigen(a)
    assert(vals.sorted.zip(Array(1.0, 2.0, 5.0)).forall { case (x, y) => math.abs(x - y) < 1e-9 })
    // rows are orthonormal: V·Vᵀ = I
    for (i <- 0 until 3; j <- 0 until 3) {
      val dotIJ = (0 until 3).map(k => vecs(i)(k) * vecs(j)(k)).sum
      assert(math.abs(dotIJ - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
    // each row is genuinely an eigenvector: A·vᵀ = λ·vᵀ
    for (i <- 0 until 3; r <- 0 until 3) {
      val av = (0 until 3).map(k => a(r)(k) * vecs(i)(k)).sum
      assert(math.abs(av - vals(i) * vecs(i)(r)) < 1e-9)
    }
  }

  test("allocatedRotation is a permuted orthonormal basis with balanced block variance") {
    val dim = 8; val m = 4
    // diagonal covariance with a steep spectrum — allocation must not
    // put the two largest eigenvalues in the same block
    val eig = Array(100.0, 50.0, 10.0, 8.0, 4.0, 2.0, 1.0, 0.5)
    val basis = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    val rot = OpqRotation.allocatedRotation(eig, basis, m)
    assert(rot.length == dim)
    // still orthonormal after permutation
    for (i <- 0 until dim; j <- 0 until dim) {
      val d = (0 until dim).map(k => rot(i)(k) * rot(j)(k)).sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-12)
    }
    // per-block variance products (rows are unit basis vectors, so the
    // assigned eigenvalue is recoverable from the 1-position)
    val blockLogVar = (0 until m).map { b =>
      (0 until dim / m).map { r =>
        val row = rot(b * (dim / m) + r)
        math.log(eig(row.indexWhere(x => math.abs(x - 1.0) < 1e-12)))
      }.sum
    }
    // greedy balance: spread must beat the naive in-order slicing
    val naive = (0 until m).map(b =>
      (0 until dim / m).map(r => math.log(eig(b * (dim / m) + r))).sum)
    assert(blockLogVar.max - blockLogVar.min < naive.max - naive.min)
    // the two largest directions land in different blocks
    val blockOf = (0 until dim).map(i =>
      rot.indexWhere(row => math.abs(row(i) - 1.0) < 1e-12) / (dim / m))
    assert(blockOf(0) != blockOf(1))
  }

  test("rotateExpr is an isometry: pairwise L2 preserved, cosine generally not") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec")).limit(40)
    val (mean, cov) = OpqRotation.meanCovariance(corpus, "vec", 64)
    val (vals, vecs) = OpqRotation.jacobiEigen(cov)
    val rot = OpqRotation.allocatedRotation(vals, vecs, 8)
    val paired = corpus.select(col("vec_id"), col("vec"),
        OpqRotation.rotateExpr(col("vec"), rot, mean).as("vecr"))
      .crossJoin(q.limit(1).select(col("qvec"),
        OpqRotation.rotateExpr(col("qvec"), rot, mean).as("qvecr")))
      .select(
        VectorOps.l2(col("qvec"), col("vec")).as("d_orig"),
        VectorOps.l2(col("qvecr"), col("vecr")).as("d_rot"),
        VectorOps.cosine(col("qvec"), col("vec")).as("cos_orig"),
        VectorOps.cosine(col("qvecr"), col("vecr")).as("cos_rot"))
      .collect()
    // float32 storage of the rotated coordinates bounds the tolerance
    paired.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-4,
      s"L2 not preserved: ${r.getDouble(0)} vs ${r.getDouble(1)}"))
    // centering shifts the origin, so cosine must differ for at least
    // some pair — this guards against rotateExpr silently no-op'ing
    assert(paired.exists(r => math.abs(r.getDouble(2) - r.getDouble(3)) > 1e-3))
  }

  test("meanCovariance matches a hand computation on a tiny frame") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(3.0f, 6.0f)),
      (3L, Seq(5.0f, 4.0f))
    ).toDF("vec_id", "vec")
    val (mean, cov) = OpqRotation.meanCovariance(df, "vec", 2)
    assert(mean.zip(Array(3.0, 4.0)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // population covariance: var(x)=8/3, var(y)=8/3, cov(x,y)=4/3
    assert(math.abs(cov(0)(0) - 8.0 / 3) < 1e-9)
    assert(math.abs(cov(1)(1) - 8.0 / 3) < 1e-9)
    assert(math.abs(cov(0)(1) - 4.0 / 3) < 1e-9)
    assert(math.abs(cov(1)(0) - cov(0)(1)) < 1e-15)
  }

  test("signPack packs sign bits MSB-first into one long") {
    val df = Seq(
      Seq(1.0f, -2.0f, 3.0f, 0.0f),   // 1010 = 10
      Seq(-1.0f, -1.0f, -1.0f, -1.0f), // 0000
      Seq(0.5f, 0.5f, 0.5f, 0.5f)      // 1111 = 15
    ).toDF("vec")
    val got = df.select(VectorOps.signPack(col("vec"), 4).as("c")).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(10L, 0L, 15L))
    // full-width: a 64th set bit lands in the sign position without loss
    val wide = Seq(Seq.fill(64)(1.0f)).toDF("vec")
      .select(VectorOps.signPack(col("vec"), 64).as("c")).collect().head.getLong(0)
    assert(wide === -1L) // all 64 bits set
  }

  test("annBq holds its recall floor and each query returns k ranked rows") {
    val out = VectorOps.annBqQuery(spark, sfDir)
    val recalls = out.select(col("query_id"), col("recall_at_10")).distinct().collect()
    assert(recalls.length == 10)
    val meanRecall = recalls.map(_.getDouble(1)).sum / recalls.length
    assert(meanRecall >= 0.9, s"BQ mean recall@10 $meanRecall below floor")
    // no individual query below 0.8 either (the 320-code shortlist's
    // per-query worst case, not just the average)
    assert(recalls.map(_.getDouble(1)).min >= 0.8,
      s"BQ per-query min recall below 0.8")
    val ranks = out.groupBy(col("query_id")).agg(count(lit(1)).as("n"),
      max(col("rank")).as("mx")).collect()
    ranks.foreach { r => assert(r.getLong(1) == 10L && r.getLong(2) == 10L) }
  }

  test("annOpq holds the production recall floor on the test corpus") {
    val out = VectorOps.annOpqQuery(spark, sfDir)
    val recalls = out.select(col("query_id"), col("recall_at_10")).distinct().collect()
    assert(recalls.length == 10)
    val meanRecall = recalls.map(_.getDouble(1)).sum / recalls.length
    assert(meanRecall >= 0.8, s"OPQ mean recall@10 $meanRecall below production floor")
    // per-query sanity: k rows per query, ranks 1..10
    val ranks = out.groupBy(col("query_id")).agg(count(lit(1)).as("n"),
      max(col("rank")).as("mx")).collect()
    ranks.foreach { r => assert(r.getLong(1) == 10L && r.getLong(2) == 10L) }
  }
}
