package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("multivec: each query retrieves its source document near the top") {
    val out = HybridSearch.multivecQuery(spark, sfDir).cache()
    val queries = out.select(col("query_id")).distinct().as[Long].collect().sorted
    assert(queries.length === 5)
    // every query returns a full ranked list
    val perQ = out.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx")).collect()
    perQ.foreach(r => assert(r.getLong(1) === 10L && r.getLong(2) === 10L))
    // the query text is a mid-document excerpt of its source doc, so
    // MaxP must surface that doc near the top (planted near-dups of
    // the source may legitimately outrank it — hence top-5, not #1)
    val selfRank = out.filter(col("query_id") === col("doc_id"))
      .select(col("query_id"), col("rank")).as[(Long, Long)].collect().toMap
    queries.foreach { q =>
      assert(selfRank.contains(q), s"query $q: source doc missing from top-10")
      assert(selfRank(q) <= 5, s"query $q: source doc at rank ${selfRank(q)}")
    }
    // scores are valid rounded cosines in [-1, 1], non-increasing per query
    val ordered = out.orderBy(col("query_id"), col("rank"))
      .select(col("query_id"), col("score")).as[(Long, Double)].collect()
    ordered.foreach { case (_, s) => assert(s >= -1.0001 && s <= 1.0001) }
    ordered.sliding(2).foreach {
      case Array((q1, s1), (q2, s2)) => if (q1 == q2) assert(s1 >= s2)
      case _ =>
    }
    out.unpersist()
  }

  test("hard negatives: labels partition the BM25 list by vector-top-k membership") {
    val out = HybridSearch.hardNegatives(spark, sfDir, lexK = 20, posK = 5).collect()
    assert(out.nonEmpty)
    val vecTop = VectorOps.knnBrute(
      graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
      graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 3)
        .select(col("vec_id"), col("embedding").as("vec")),
      k = 5).select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 20)
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length.toLong),
        "text_rank must be dense 1..n")
    }
    out.foreach { r =>
      val inVec = vecTop.contains((r.getLong(0), r.getLong(2)))
      assert(r.getString(6) === (if (inVec) "positive" else "hard_negative"))
      assert(inVec === !r.isNullAt(4), "vec_rank null iff not in vector top-k")
    }
    assert(out.exists(_.getString(6) == "hard_negative"),
      "mining must surface at least one hard negative")
  }

  test("retrievalEval: frozen discount table; full metric replay from the two public rankers") {
    // the frozen discount constants: exact at the three rational
    // ranks, and strictly decreasing (a discount curve must be)
    val w = HybridSearch.NdcgWeightsMicro
    assert(w(0) === 1000000L && w(2) === 500000L && w(6) === 333333L)
    assert(w.sliding(2).forall(p => p(0) > p(1)))
    val out = HybridSearch.retrievalEval(spark, sfDir).collect()
    assert(out.length === 3, "one scorecard row per query")
    // independent driver-side replay from the SAME public rankers
    val docs = graft.Tables.documents(spark, sfDir)
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ")
          .as("query_text"))
    val text = TextAnalysis.bm25(docs.filter(col("doc_id") >= 3), queries, topK = 10)
      .select("query_id", "doc_id", "rank").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    val vec = VectorOps.knnBrute(
      graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
      graft.Tables.embeddings(spark, sfDir).filter(col("vec_id") >= 3)
        .select(col("vec_id"), col("embedding").as("vec")),
      k = 10).select("query_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    def grade(vr: Long): Long = if (vr <= 2) 3L else if (vr <= 5) 2L else 1L
    out.foreach { r =>
      val q = r.getLong(0)
      val relMap = vec(q).map(t => t._2 -> grade(t._3)).toMap
      val sys = text(q).sortBy(_._3)
        .map(t => (t._3, relMap.getOrElse(t._2, 0L)))
      val dcg = sys.map { case (rk, rel) => rel * w((rk - 1).toInt) }.sum
      val rels = vec(q).map(t => grade(t._3)).sortBy(-_)
      val idcg = rels.take(10).zipWithIndex.map { case (rel, i) => rel * w(i) }.sum
      val hits = sys.count(_._2 > 0L)
      val firstRel = sys.filter(_._2 > 0L).map(_._1).minOption
      assert(r.getLong(1) === math.min(10, rels.length).toLong, "n_rel")
      assert(r.getLong(2) === dcg, s"dcg mismatch for q$q")
      assert(r.getLong(3) === idcg, s"idcg mismatch for q$q")
      assert(r.getLong(4) ===
        (if (idcg > 0) Math.floorDiv(dcg * 10000L, idcg) else 0L), "ndcg")
      assert(r.getLong(5) ===
        firstRel.map(1000000L / _).getOrElse(0L), "mrr")
      assert(r.getLong(6) ===
        Math.floorDiv(hits * 10000L, math.min(10, rels.length).toLong), "recall")
      // metric laws: DCG never beats the ideal; bounds hold
      assert(dcg <= idcg && r.getLong(4) <= 10000L && r.getLong(6) <= 10000L)
    }
    // determinism: a second run is byte-identical
    val again = HybridSearch.retrievalEval(spark, sfDir).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }
}
