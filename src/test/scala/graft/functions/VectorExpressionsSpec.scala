package graft.functions

import graft.SparkSpec
import graft.operators.VectorOps
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vectors = {
    val rnd = new scala.util.Random(7)
    Seq.fill(200)((Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("a", "b").persist()
  }

  test("codegen kernels are BITWISE identical to the HOF formulation") {
    val rows = vectors.select(
      VectorExpressions.cosine(col("a"), col("b")).as("fast_cos"),
      VectorOps.cosineHof(col("a"), col("b")).as("hof_cos"),
      VectorExpressions.dot(col("a"), col("b")).as("fast_dot"),
      VectorOps.dotHof(col("a"), col("b")).as("hof_dot"),
      VectorExpressions.l2(col("a"), col("b")).as("fast_l2"),
      VectorOps.l2Hof(col("a"), col("b")).as("hof_l2")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "cosine differs")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "dot differs")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(5)), "l2 differs")
    }
  }

  test("parity holds on the real embeddings table") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
      .select(col("vec_id"), col("embedding"))
    val pairs = emb.as("x").join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.embedding").as("a"), col("y.embedding").as("b"))
    val diff = pairs.select(
      (VectorExpressions.cosine(col("a"), col("b")) -
        VectorOps.cosineHof(col("a"), col("b"))).as("d"))
      .filter(col("d") =!= 0.0).count()
    assert(diff === 0L)
  }

  test("expressions run inside whole-stage codegen (no fallback)") {
    val plan = vectors.select(VectorExpressions.cosine(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
  }

  test("SQL registration: graft_cosine/graft_dot/graft_l2 callable from SQL") {
    VectorExpressions.register(spark)
    vectors.limit(5).createOrReplaceTempView("vx")
    val r = spark.sql(
      "SELECT graft_cosine(a, b) c, graft_dot(a, b) d, graft_l2(a, b) e FROM vx").collect()
    assert(r.length === 5)
    assert(r.forall(row => !row.isNullAt(0) && math.abs(row.getDouble(0)) <= 1.0 + 1e-12))
  }

  test("SQL registration: text kernels callable from SQL, shape args must be literals") {
    VectorExpressions.register(spark)
    Seq((1L, "the quick brown fox jumps high")).toDF("id", "text")
      .createOrReplaceTempView("tx")
    val r = spark.sql(
      """SELECT graft_simhash64(text) sh,
        |       size(graft_shingle_hashes(text, 3)) n_sh,
        |       size(graft_minhash(graft_shingle_hashes(text, 3), 64)) n_sig
        |FROM tx""".stripMargin).collect().head
    assert(!r.isNullAt(0))
    assert(r.getInt(1) === 4) // 6 tokens → 4 trigrams
    assert(r.getInt(2) === 64)
    // a column where a literal is required fails analysis, not codegen
    intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes(text, id) FROM tx").collect()
    }
  }

  test("dimension-mismatched vectors yield NULL like the HOF, not a prefix score") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b")
    val out = df.select(
      VectorExpressions.cosine(col("a"), col("b")).as("fast"),
      VectorOps.cosineHof(col("a"), col("b")).as("hof")).collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("null inputs propagate null; type mismatch fails analysis") {
    val withNull = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
    val out = withNull.select(VectorExpressions.cosine(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
    // mixed float/double is allowed (matches the HOF cast-to-double);
    // non-numeric arrays must fail analysis
    val mixed = Seq((Seq(1.0, 0.0), Seq(1f, 0f))).toDF("a", "b")
    assert(mixed.select(VectorExpressions.cosine(col("a"), col("b")))
      .collect().head.getDouble(0) === 1.0)
    val bad = Seq((Seq("x", "y"), Seq(1f, 2f))).toDF("a", "b")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      bad.select(VectorExpressions.cosine(col("a"), col("b"))).collect()
    }
  }
}
