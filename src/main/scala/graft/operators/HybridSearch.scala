package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** HYBRID retrieval — the query pattern a vector store serves in
  * production: a lexical ranker (BM25) and a vector ranker (cosine
  * kNN) fused by Reciprocal Rank Fusion (Cormack et al. 2009,
  * rrf = Σ 1/(k + rank), k = 60). RRF needs only RANKS, never score
  * calibration across rankers, which is why it composes cleanly:
  * each side keeps its own top-N plan (BM25's two hash aggs, kNN's
  * broadcast scan — both already oracled standalone), and the fusion
  * is a full-outer join of two tiny per-query top-N lists followed by
  * one ranking window. Fusion cost is O(queries × N), independent of
  * corpus size — the heavy lifting stays in the per-ranker plans.
  */
object HybridSearch {

  private def rnd4 = CrossEngine.rnd4 _

  /** Fuse two (query_id, rank, doc_id) lists with RRF.
    * @param text vector of lexical ranks (query_id, rank, doc_id)
    * @param vec  vector of embedding ranks (query_id, rank, doc_id)
    */
  def rrfFuse(text: DataFrame, vec: DataFrame, k: Int = 60,
              topK: Int = 5): DataFrame = {
    val t = text.select(col("query_id"), col("doc_id"), col("rank").as("text_rank"))
    val v = vec.select(col("query_id"), col("doc_id"), col("rank").as("vec_rank"))
    val fusedScore =
      coalesce(lit(1.0) / (lit(k) + col("text_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(k) + col("vec_rank")), lit(0.0))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_raw").desc, col("doc_id").asc)
    t.join(v, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_raw", fusedScore)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("text_rank"), col("vec_rank"), rnd4(col("rrf_raw")).as("rrf"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Driver query: hybrid search for query ids 0..2 — BM25 over the
    * first 8 tokens of each query document vs cosine kNN over its
    * embedding, both against the doc_id/vec_id ≥ 3 corpus (query
    * items excluded from both sides so neither ranker gets a trivial
    * self-hit), top-10 each, RRF-fused to a top-5. Fully
    * DuckDB-oracled: the oracle re-derives BOTH rankers (the same
    * CTE stacks as txt_bm25 / vec_knn) and the fusion arithmetic.
    */
  def hybridQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ").as("query_text"))
    val text = TextAnalysis.bm25(docs.filter(col("doc_id") >= 3), queries, topK = 10)
    val emb = Tables.embeddings(s, dir)
    val vec = VectorOps.knnBrute(
      emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
      emb.filter(col("vec_id") >= 3)
        .select(col("vec_id"), col("embedding").as("vec")),
      k = 10)
      .select(col("query_id"), col("rank"), col("vec_id").as("doc_id"))
    rrfFuse(text.select(col("query_id"), col("rank"), col("doc_id")), vec)
  }

  /** Exact RANGE search (radius query): every corpus vector with
    * cosine ≥ `minCosine` of each query — the "find all near things"
    * dual of top-k, used for dedup-style audits where k is unknown.
    * Same broadcast-queries single-scan shape as [[VectorOps.knnBrute]]
    * minus the ranking window: a pure filter, so there is NO shuffle
    * at all after the scan. Fully oracled (exact arithmetic).
    */
  def rangeSearch(s: SparkSession, dir: String,
                  minCosine: Double = 0.30): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = broadcast(emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec")))
    emb.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"))
      .join(q)
      .select(col("query_id"), col("vec_id"),
        rnd4(VectorOps.cosine(col("qvec"), col("vec"))).as("score"))
      // the radius test runs on the ROUNDED score (the cross-engine
      // rounding contract): the two engines' cosine kernels can differ
      // by an ulp, and a raw-double threshold would let that flip a
      // boundary row's membership between them
      .filter(col("score") >= lit(minCosine))
      .select(col("query_id"), col("vec_id"), col("score"))
      .orderBy(col("query_id"), col("vec_id"))
  }
}
