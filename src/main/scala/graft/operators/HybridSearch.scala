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

  /** Maximal-marginal-relevance DIVERSE top-k (Carbonell & Goldstein
    * 1998): greedily pick the candidate maximizing
    * `λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s)` — the re-rank that stops
    * a training-data sampler or retrieval layer returning k copies of
    * the same thing. All similarities are fixed to the 1e-4 grid as
    * BIGINTs and λ = 0.7 enters as integer weights (`7·rel4 −
    * 3·red4`), so every comparison both engines make is exact integer
    * arithmetic — no float boundary can flip a selection.
    *
    * Scale shape: the corpus-sized work is ONE broadcast-queries scan
    * (the [[VectorOps.knnBrute]] plan) cut to a `shortlist` of
    * `n` per query; the quadratic part (pairwise sims, greedy loop)
    * runs per query over that BOUNDED set — n² at n=20 — inside
    * `flatMapGroups`, so a million queries parallelize across the
    * cluster and nothing quadratic ever touches the corpus. The
    * oracle unrolls the same greedy selection as k chained CTEs.
    */
  def mmrRerank(queries: DataFrame, corpus: DataFrame, k: Int = 10,
                shortlist: Int = 20): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    def s4(c: org.apache.spark.sql.Column) =
      floor(c * lit(10000.0) + lit(0.5)).cast("long")
    val scored = corpus.select(col("vec_id"), col("vec"))
      .join(broadcast(queries.select(col("query_id"), col("qvec"))))
      .select(col("query_id"), col("vec_id"), col("vec"),
        s4(VectorOps.cosine(col("qvec"), col("vec"))).as("rel4"))
    // shortlist on the ROUNDED score (the cross-engine boundary
    // contract), ties by vec_id
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("rel4").desc, col("vec_id").asc)
    val short = scored.withColumn("rk", row_number().over(wShort))
      .filter(col("rk") <= shortlist)
      .select(col("query_id"), col("vec_id"), col("vec"), col("rel4"))
    // pairwise sims within the shortlist only: n² per query, bounded
    val sims = short.as("a").join(short.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.query_id").as("query_id"), col("a.vec_id").as("va"),
        col("b.vec_id").as("vb"),
        s4(VectorOps.cosine(col("a.vec"), col("b.vec"))).as("v4"))
    // tag rel rows with vb = -1 (corpus ids are ≥ 0) and run the
    // greedy selection per query over the bounded group
    val tagged = short
      .select(col("query_id"), col("vec_id").as("va"), lit(-1L).as("vb"),
        col("rel4").as("v4"))
      .unionByName(sims)
      .as[(Long, Long, Long, Long)]
    tagged.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val rows = it.toSeq
      val rel = rows.collect { case (_, va, -1L, v4) => va -> v4 }.toMap
      val sim = rows.collect { case (_, va, vb, v4) if vb != -1L =>
        Seq((va, vb) -> v4, (vb, va) -> v4) }.flatten.toMap
      val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      for (rank <- 1L to math.min(k.toLong, rel.size.toLong)) {
        val (best, mmr) = rel.keysIterator
          .filterNot(selected.contains)
          .map { d =>
            val red = if (selected.isEmpty) 0L
              else selected.map(s => sim.getOrElse((d, s), 0L)).max
            d -> (7L * rel(d) - 3L * red)
          }
          .reduceLeft { (x, y) => // max by (mmr desc, vec_id asc)
            if (y._2 > x._2 || (y._2 == x._2 && y._1 < x._1)) y else x
          }
        selected += best
        out += ((qid, rank, best, mmr))
      }
      out
    }.toDF("query_id", "rank", "vec_id", "mmr_u")
      .orderBy(col("query_id"), col("rank"))
  }

  /** Driver query: MMR over the standard 10-query / corpus split. */
  def mmrQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    mmrRerank(
      emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
      emb.filter(col("vec_id") >= 10)
        .select(col("vec_id"), col("embedding").as("vec")))
  }

  /** DuckDB twin of [[mmrQuery]]: the identical greedy selection
    * unrolled as k chained CTEs — each step anti-joins the selected
    * set, recomputes the integer MMR objective against it, and picks
    * the per-query argmax with the same (mmr desc, vec_id asc)
    * tie-break.
    */
  def mmrOracleSql(k: Int = 10, shortlist: Int = 20): String = {
    val sb = new StringBuilder(
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 10),
         |c AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings WHERE vec_id >= 10),
         |rel AS MATERIALIZED (
         |  SELECT query_id, vec_id, v,
         |    CAST(floor(list_cosine_similarity(qv, v) * 10000 + 0.5) AS BIGINT) AS rel4
         |  FROM q CROSS JOIN c),
         |short AS MATERIALIZED (
         |  SELECT query_id, vec_id, v, rel4 FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY rel4 DESC, vec_id ASC) AS rk FROM rel)
         |  WHERE rk <= $shortlist),
         |sims AS MATERIALIZED (
         |  SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb,
         |    CAST(floor(list_cosine_similarity(a.v, b.v) * 10000 + 0.5) AS BIGINT) AS s4
         |  FROM short a JOIN short b
         |    ON a.query_id = b.query_id AND a.vec_id < b.vec_id),
         |sel0 AS (
         |  SELECT CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS vec_id,
         |    CAST(NULL AS BIGINT) AS mmr_u, CAST(NULL AS BIGINT) AS "rank"
         |  WHERE 1 = 0)""".stripMargin)
    for (i <- 1 to k) {
      val p = i - 1
      sb ++= s""",
         |red$i AS MATERIALIZED (
         |  SELECT s.query_id, s.vec_id,
         |    7 * s.rel4 - 3 * COALESCE((
         |      SELECT max(m.s4) FROM sims m JOIN sel$p e
         |        ON e.query_id = m.query_id AND
         |           ((m.va = s.vec_id AND m.vb = e.vec_id) OR
         |            (m.vb = s.vec_id AND m.va = e.vec_id))
         |      WHERE m.query_id = s.query_id), 0) AS mmr_u
         |  FROM short s
         |  WHERE NOT EXISTS (SELECT 1 FROM sel$p e
         |    WHERE e.query_id = s.query_id AND e.vec_id = s.vec_id)),
         |pick$i AS (
         |  SELECT query_id, vec_id, mmr_u, CAST($i AS BIGINT) AS "rank" FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY mmr_u DESC, vec_id ASC) AS rk FROM red$i)
         |  WHERE rk = 1),
         |sel$i AS MATERIALIZED (
         |  SELECT * FROM sel$p UNION ALL SELECT * FROM pick$i)""".stripMargin
    }
    sb ++= s"""
         |SELECT query_id, "rank", vec_id, mmr_u FROM sel$k
         |ORDER BY query_id, "rank"""".stripMargin
    sb.toString
  }

  /** MULTI-VECTOR document retrieval with max-pooling (the "MaxP"
    * long-document discipline, Dai & Callan 2019; the single-query-
    * vector half of ColBERT-style late interaction): each document is
    * represented by one embedding PER CHUNK, and a query's score
    * against a document is the MAXIMUM chunk cosine — so a long
    * document is retrievable by its best passage instead of drowning
    * it in an averaged whole-document vector. Chunking reuses the
    * [[TextAnalysis.chunks]] geometry (200 chars, 50 overlap);
    * embeddings are the deterministic [[graft.functions.HashEmbed]]
    * feature-hasher, which keeps the whole path — chunk, embed, score,
    * pool, rank — re-derivable in the DuckDB oracle.
    *
    * Plan shape at scale: chunk expansion and embedding are one map
    * stage (the chunk multiplier is bounded by max doc length / step);
    * queries broadcast; per-chunk scores never shuffle — the MaxP
    * pooling is a map-side-combinable max-agg on (query, doc), and
    * only the per-doc maxima reach the ranking window. At 100 TB the
    * chunk vectors are a write-time column and this is one scan.
    * Zero vectors (degenerate chunks) are filtered on both engines —
    * a 0/0 cosine would poison max-pooling with NaN.
    */
  def multivecQuery(s: SparkSession, dir: String, chunkChars: Int = 200,
                    overlap: Int = 50, dim: Int = 64, k: Int = 10): DataFrame = {
    import graft.functions.HashEmbed
    val step = chunkChars - overlap
    val docs = Tables.documents(s, dir)
    val chunks = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), greatest(lit(1), length(col("text"))), lit(step)))
          .as("start"))
      .select(col("doc_id"),
        HashEmbed(col("text").substr(col("start"), lit(chunkChars)), dim).as("cvec"))
      .filter(exists(col("cvec"), x => x =!= lit(0.0f)))
    val queries = broadcast(docs
      .filter(length(col("text")) >= 221)
      .orderBy(col("doc_id")).limit(5)
      .select(col("doc_id").as("query_id"),
        HashEmbed(col("text").substr(lit(101), lit(120)), dim).as("qvec"))
      .filter(exists(col("qvec"), x => x =!= lit(0.0f))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    chunks.join(queries)
      .select(col("query_id"), col("doc_id"),
        VectorOps.cosine(col("qvec"), col("cvec")).as("cscore"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("cscore")).as("raw"))
      .select(col("query_id"), col("doc_id"), rnd4(col("raw")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** HARD-NEGATIVE MINING for retrieval training (the DPR/BM25-negatives
    * recipe, Karpukhin et al. 2020): for each query, take the lexical
    * (BM25) top-`lexK` candidates and label each one by whether the
    * embedding ranker also puts it in its top-`posK` — candidates the
    * lexical ranker loves but the vector ranker rejects are exactly the
    * "hard negatives" a contrastive trainer wants (lexically plausible,
    * semantically wrong). Emits both ranks and the cosine (so the
    * trainer can margin-filter), with the label as a column.
    *
    * Scale: both rankers are the already-oracled top-N plans (BM25's
    * two hash aggs; kNN's broadcast single scan); the mining step is a
    * left join of two per-query top-N lists — O(queries × lexK),
    * corpus-independent, exactly like the RRF fusion above.
    */
  def hardNegatives(s: SparkSession, dir: String,
                    lexK: Int = 20, posK: Int = 5): DataFrame = {
    val docs = Tables.documents(s, dir)
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ").as("query_text"))
    val text = TextAnalysis.bm25(docs.filter(col("doc_id") >= 3), queries, topK = lexK)
      .select(col("query_id"), col("doc_id"),
        // bm25's score is score_micro/1e6 with score_micro exact
        // integer on both engines — the division is bit-identical, no
        // re-rounding needed
        col("rank").as("text_rank"), col("score").as("bm25"))
    val emb = Tables.embeddings(s, dir)
    val vec = VectorOps.knnBrute(
      emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
      emb.filter(col("vec_id") >= 3)
        .select(col("vec_id"), col("embedding").as("vec")),
      k = posK)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").as("vec_rank"), col("score").as("cosine"))
    text.join(vec, Seq("query_id", "doc_id"), "left_outer")
      .withColumn("label",
        when(col("vec_rank").isNotNull, lit("positive")).otherwise(lit("hard_negative")))
      .select(col("query_id"), col("text_rank"), col("doc_id"),
        col("bm25"), col("vec_rank"), col("cosine"), col("label"))
      .orderBy(col("query_id"), col("text_rank"))
  }

  /** nDCG@10 discount weights in integer micros —
    * w_r = round(10⁶ / log₂(r+1)), r = 1..10. Computed ONCE here and
    * interpolated as literals into the DuckDB oracle, so the only
    * transcendental in the whole metric is frozen into ten shared
    * constants and every downstream step is exact BIGINT arithmetic
    * (the fix-before-sum rule applied to the discount curve itself).
    */
  val NdcgWeightsMicro: Array[Long] =
    (1 to 10).map(r =>
      math.round(1e6 / (math.log(r + 1.0) / math.log(2.0)))).toArray

  /** Retrieval-quality EVALUATION harness — the metric layer every
    * retrieval pipeline needs next to its rankers: score a system
    * ranking against graded relevance judgments with nDCG@10
    * (Järvelin & Kekäläinen 2002), MRR@10 and recall@10. System =
    * the BM25 lexical ranker; judgments = the exact vector top-10
    * graded 3/2/1 by cosine rank band (1-2 / 3-5 / 6-10) — the
    * lexical-vs-semantic agreement audit, sharing both certified
    * rankers with [[hardNegatives]] so the harness itself is the only
    * new surface. EXACT integer metrics: gains are integer grades,
    * discounts the frozen [[NdcgWeightsMicro]] micros, DCG/IDCG exact
    * BIGINT sums, ndcg = ⌊10⁴·DCG/IDCG⌋, mrr = 10⁶ DIV first-hit
    * rank, recall = ⌊10⁴·hits/judged⌋ — every division floor-exact on
    * non-negative operands, so the whole scorecard hashes.
    *
    * Scale shape: both rankers are the already-certified per-query
    * top-k plans (broadcast queries, one corpus scan each); the
    * metric layer runs on O(queries × k) rows — rank joins, one
    * bounded ideal-ordering window, two small aggs. Nothing
    * corpus-sized is added by evaluation.
    */
  def retrievalEval(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    // the discount table defines an @10 metric; a deeper cut would
    // need more frozen constants, not silent nulls (review finding)
    require(k <= NdcgWeightsMicro.length,
      s"retrievalEval scores at most @${NdcgWeightsMicro.length}")
    val docs = Tables.documents(s, dir)
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(col("text")), "\\s+"), 1, 8), " ").as("query_text"))
    val text = TextAnalysis.bm25(docs.filter(col("doc_id") >= 3), queries, topK = k)
      .select(col("query_id"), col("doc_id"), col("rank").as("text_rank"))
    val emb = Tables.embeddings(s, dir)
    val rel = VectorOps.knnBrute(
      emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
      emb.filter(col("vec_id") >= 3)
        .select(col("vec_id"), col("embedding").as("vec")),
      k = 10)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").as("vec_rank"))
      .withColumn("rel",
        when(col("vec_rank") <= 2, 3L)
          .when(col("vec_rank") <= 5, 2L)
          .otherwise(1L))
    val wLit = lit(NdcgWeightsMicro)
    val sys = text
      .join(rel.select(col("query_id"), col("doc_id"), col("rel")),
        Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
      .withColumn("w", element_at(wLit, col("text_rank").cast("int")))
    val perQ = sys.groupBy(col("query_id"))
      .agg(sum(col("rel") * col("w")).as("dcg_micro"),
        min(when(col("rel") > 0L, col("text_rank"))).as("first_rel"),
        sum(when(col("rel") > 0L, 1L).otherwise(0L)).as("n_hits"))
    val wIdeal = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("vec_rank").asc)
    val ideal = rel
      .withColumn("irn", row_number().over(wIdeal))
      .filter(col("irn") <= 10)
      .withColumn("w", element_at(wLit, col("irn")))
      .groupBy(col("query_id"))
      .agg(sum(col("rel") * col("w")).as("idcg_micro"),
        count(lit(1)).as("n_rel"))
    // LEFT join from the judgment side: a query whose lexical ranker
    // returns NOTHING is a total retrieval failure and must appear in
    // the scorecard as zeros — dropping it (the old inner join)
    // silently excluded exactly the worst-case queries the harness
    // exists to surface (review finding; the oracle mirrors the
    // direction)
    ideal.join(perQ, Seq("query_id"), "left")
      .withColumn("dcg_micro", coalesce(col("dcg_micro"), lit(0L)))
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .select(col("query_id"), col("n_rel"),
        col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") > 0L,
          expr("(dcg_micro * 10000L) DIV idcg_micro")).otherwise(0L)
          .as("ndcg_1e4"),
        when(col("first_rel").isNotNull,
          expr("1000000L DIV first_rel")).otherwise(0L).as("mrr_micro"),
        expr("(n_hits * 10000L) DIV n_rel").as("recall_1e4"))
      .orderBy(col("query_id"))
  }
}
