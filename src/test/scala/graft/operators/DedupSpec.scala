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
    val sigs = docs.select(col("doc_id"), Dedup.simhashColumn(col("text")).as("sig"))
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

  test("ngram top pairs ranks the planted duplicate first") {
    val docs = (base.map { case (id, t) => (id, "en", t.length.toLong, t) } :+
      (11L, "en", 70L, "the quick brown fox jumps over the lazy cat near the river bank today"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val top = Dedup.ngramJaccardTop(docs, topK = 5).collect()
    assert(top.head.getLong(0) === 1L && top.head.getLong(1) === 11L)
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
}
