package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class MinHashExpressionSpec extends SparkSpec {
  import spark.implicits._

  test("codegen minhash is BITWISE identical to the HOF formulation") {
    val rnd = new scala.util.Random(11)
    val docs = (Seq.fill(80)(
      Seq.fill(3 + rnd.nextInt(40))(s"tok${rnd.nextInt(500)}").distinct) ++
      Seq(Seq.empty[String], Seq("solo"))) // the edge cases where parity could break
      .toDF("sh")
    val rows = docs.select(
      MinHashSignature(col("sh"), 64).as("fast"),
      Dedup.minhashSignatureHof(col("sh"), 64).as("hof")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[java.lang.Long](0) === r.getSeq[java.lang.Long](1))
    }
  }

  test("null elements hash like xxhash64(NULL) — parity with the HOF") {
    val docs = Seq(Seq(Some("a"), None, Some("b")), Seq(None)).toDF("sh")
    val rows = docs.select(
      MinHashSignature(col("sh"), 16).as("fast"),
      Dedup.minhashSignatureHof(col("sh"), 16).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[java.lang.Long](0) === r.getSeq[java.lang.Long](1))
    }
  }

  test("signature is permutation-count wide and stable") {
    val df = Seq(Seq("a b c", "b c d", "c d e")).toDF("sh")
    val s1 = df.select(MinHashSignature(col("sh"), 16)).collect().head.getSeq[Long](0)
    val s2 = df.select(MinHashSignature(col("sh"), 16)).collect().head.getSeq[Long](0)
    assert(s1.length === 16 && s1 === s2)
  }

  test("similar shingle sets share more minhash positions than dissimilar ones") {
    val a = Seq.tabulate(50)(i => s"sh$i")
    val nearA = Seq.tabulate(50)(i => if (i == 0) "CHANGED" else s"sh$i")
    val far = Seq.tabulate(50)(i => s"other$i")
    val rows = Seq(("a", a), ("nearA", nearA), ("far", far)).toDF("name", "sh")
      .select(col("name"), MinHashSignature(col("sh"), 128).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    def agree(x: Seq[Long], y: Seq[Long]) = x.zip(y).count { case (p, q) => p == q }
    assert(agree(rows("a"), rows("nearA")) > 100) // ~98% jaccard
    assert(agree(rows("a"), rows("far")) < 20)
  }

  test("null and empty inputs") {
    val df = Seq(Some(Seq("x")), Some(Seq.empty[String]), None).toDF("sh")
    val out = df.select(MinHashSignature(col("sh"), 8)).collect()
    assert(!out(0).isNullAt(0))
    // empty array → [null × perms], exactly like array_min-of-empty per position
    assert(!out(1).isNullAt(0))
    assert(out(1).getSeq[java.lang.Long](0) === Seq.fill(8)(null))
    assert(out(2).isNullAt(0)) // null input → null output
  }
}
