package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token counting, quality scoring, language
  * identification, content fingerprinting and exact dedup.
  *
  * Everything is built from codegen'd built-in functions (string ops,
  * regex, higher-order array functions) — no UDFs — so each operator
  * stays inside whole-stage codegen and runs embarrassingly parallel:
  * per-row work, no shuffle except the final aggregations. At 100 TB
  * these are scan-bound map stages, exactly what you want.
  */
object TextAnalysis {

  /** Canonical whitespace-token column. */
  private[operators] def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  private def rnd4(c: Column): Column = CrossEngine.rnd4(c)

  /** BPE-ish token pattern: letter runs, digit runs, or single
    * non-alphanumeric symbols — the shape of byte-pair pre-tokenizers.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Function words per language for the lang-id heuristic. Tiny fixed
    * sets keep the generated code small and identical on the oracle
    * side.
    */
  val StopwordsEn = Seq("the", "a", "of", "to", "and", "in", "is", "it", "that", "for")

  /** Per-document token counts: whitespace tokens and BPE-ish tokens.
    * Pure map stage; the parquet scan reads only (doc_id, text).
    */
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(wsTokens(col("text"))).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit(BpeishPattern)).cast("long").as("bpeish_tokens"),
        length(col("text")).cast("long").as("text_len"))
      .orderBy(col("doc_id"))

  /** Heuristic quality score in [0,1] from length, punctuation and
    * stopword ratios — the standard cheap pre-filter before expensive
    * dedup/embedding stages. All ratios are double-divided and
    * rounded identically on the oracle side.
    */
  /** The three quality signals as raw (unrounded) double columns over
    * a `text` column, shared by the per-doc score and the per-source
    * gate so both derive from ONE formula definition.
    */
  private def qualitySignals: (Column, Column, Column) = {
    val toks = wsTokens(col("text"))
    val nToks = size(toks).cast("double")
    val stopHits = size(expr(
      s"filter(split(trim(text), '\\\\s+'), t -> t in (${StopwordsEn.map("'" + _ + "'").mkString(",")}))"))
      .cast("double")
    val punct = regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("double")
    val len = length(col("text")).cast("double")
    (stopHits / nToks, punct / len, least(nToks / lit(64.0), lit(1.0)))
  }

  /** Raw composite quality score (unrounded). */
  private def rawQuality: Column = {
    val (stopRatio, punctRatio, lengthFactor) = qualitySignals
    lit(0.3) * stopRatio + lit(0.3) * (lit(1.0) - least(punctRatio * 4.0, lit(1.0))) +
      lit(0.4) * lengthFactor
  }

  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val (stopRatio, punctRatio, lengthFactor) = qualitySignals
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        rnd4(stopRatio).as("stop_ratio"),
        rnd4(punctRatio).as("punct_ratio"),
        rnd4(lengthFactor).as("length_factor"),
        rnd4(rawQuality).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Per-SOURCE quality gating (the RefinedWeb/C4 "domain filter"
    * shape): aggregate each source's document count, language spread,
    * mean quality and within-source exact-duplicate rate, then gate.
    * Sources, like web domains, are a tiny keyspace next to the
    * corpus, so this is one scan + one hash agg on `source` (the two
    * DISTINCTs expand the scan 3× before the partial agg — still one
    * shuffle whose volume is ~3×|sources|, not the corpus).
    *
    * Cross-engine mean: the per-doc score is fixed to integer
    * ten-thousandths BEFORE summing, so the sum is exact integer math
    * and the final division is the only float op — summation order
    * cannot flip last bits between engines.
    */
  def sourceStats(s: SparkSession, dir: String,
                  minQuality: Double = 0.61, maxDupRate: Double = 0.2): DataFrame = {
    val q4 = floor(rawQuality * lit(10000.0) + lit(0.5)).cast("long")
    val meanQ = floor(sum(col("q4")).cast("double") / count(lit(1)).cast("double") /
      lit(10000.0) * lit(10000.0) + lit(0.5)) / lit(10000.0)
    val dupRate = floor((lit(1.0) - countDistinct(col("fp")).cast("double") /
      count(lit(1)).cast("double")) * lit(10000.0) + lit(0.5)) / lit(10000.0)
    Tables.documents(s, dir)
      .select(col("source"), col("lang"), fingerprint(col("text")).as("fp"),
        q4.as("q4"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        meanQ.as("mean_quality"),
        dupRate.as("dup_rate"))
      .withColumn("keep",
        col("mean_quality") >= minQuality && col("dup_rate") <= maxDupRate)
      .orderBy(col("source"))
  }

  /** Language-ID heuristic: script detection (CJK ranges) first, then
    * diacritic profiles, defaulting to English. Returns the confusion
    * matrix against the labeled `lang` column. (On this synthetic
    * corpus every language shares one vocabulary, so the interesting
    * output IS the confusion matrix; on real text the script +
    * diacritic tiers do the work.)
    */
  def langIdConfusion(s: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    val predicted =
      when(regexp_count(t, lit("[\\x{4e00}-\\x{9fff}]")) > 0, "zh")
        .when(regexp_count(t, lit("[äöüß]")) > 0, "de")
        .when(regexp_count(t, lit("[éèêàçœ]")) > 0, "fr")
        .when(regexp_count(t, lit("[ñáíóú¿¡]")) > 0, "es")
        .otherwise("en")
    Tables.documents(s, dir)
      .select(col("lang"), predicted.as("predicted_lang"))
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted_lang"))
  }

  /** Canonical content fingerprint: md5 over whitespace-normalized,
    * lowercased text. Identical builtin exists in DuckDB, so exact
    * dedup is fully oracle-checkable.
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  /** Corpus token frequencies via a generator (explode): the flatMap
    * row shape — one row in, N token rows out — then a hash agg and
    * distributed top-N. The generate + partial-agg pipeline stays in
    * one stage before the single shuffle.
    */
  def topTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(wsTokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(50)

  /** BPE merge-candidate mining — round one of byte-pair-encoding
    * tokenizer training (Sennrich et al. 2016,
    * https://arxiv.org/abs/1508.07909): count adjacent character
    * pairs and surface the top merges. The scale trick is the
    * standard one: pairs are counted over the VOCABULARY (distinct
    * word × its corpus frequency), never over the raw corpus — the
    * first hash agg collapses 100 TB of text to a vocab-sized
    * relation, and the pair expansion (a generator over
    * `sequence(1, len-1)`, all codegen'd) multiplies only that.
    * Two shuffles total, both vocabulary-bounded.
    */
  def bpePairs(s: SparkSession, dir: String, topK: Int = 30): DataFrame =
    Tables.documents(s, dir)
      .select(explode(wsTokens(lower(col("text")))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .filter(length(col("word")) >= 2)
      .select(col("word"), col("n"),
        explode(expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
          .as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("n")).as("n_occurrences"),
        countDistinct(col("word")).as("n_words"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(topK)

  /** FULL BPE training loop (Sennrich et al. 2016) — the iterated
    * merge-select → merge-apply → pair-recount cycle [[bpePairs]]
    * only runs round one of. Returns the merge table: (step, pair,
    * merged symbol, count at selection time).
    *
    * Scale shape: the corpus is scanned ONCE to build the (word,
    * freq) vocabulary; every later step runs on that vocab-bounded
    * relation (persisted), so M merges cost M small shuffles over at
    * most |vocab| rows regardless of corpus size. Only the selected
    * top-1 pair row reaches the driver per step (model parameters,
    * the k-means discipline).
    *
    * State encoding: a word's symbol sequence is a string with
    * DOUBLE-space separators and single-space boundaries
    * (` h  e  l  l  o `). Merging pair (a,b) is then one literal
    * `replace(seq, ' a  b ', ' ab ')` — replace scans left-to-right
    * over non-overlapping matches, which is exactly BPE's merge
    * discipline, and the doubled separator makes boundary sharing
    * between adjacent matches impossible while the single-space
    * pattern anchors both symbol edges (no partial-symbol false
    * matches). The DuckDB twin runs the identical representation, so
    * parity is structural, not coincidental.
    */
  def bpeMerges(s: SparkSession, dir: String, merges: Int = 10): DataFrame =
    s.read.parquet(s"${bpeIndexIfAbsent(s, dir, merges)}/merges")
      .orderBy(col("step"))

  /** PERSISTED BPE training artifact — the merge table and the
    * post-merge vocabulary STATE, once per (corpus content, M) under
    * the [[graft.operators.IndexCache]] discipline: the M-round train
    * loop is inherently sequential (M driver-synchronized jobs), and
    * BOTH its consumers (the merge-table report and the tokenizer
    * application) used to pay it independently. A tokenizer is a
    * write-once artifact in any real pipeline; training it once per
    * consumer was the waste.
    */
  private def bpeIndexIfAbsent(s: SparkSession, dir: String,
                               merges: Int): String = {
    val docs = Tables.documents(s, dir)
    val row = docs
      .select(xxhash64(col("doc_id").cast("string"), col("text")).as("h"))
      .agg(expr("coalesce(bit_xor(h), 0L)").as("x"), count(lit(1)).as("cnt")).head()
    val fp = f"${row.getLong(0)}%016x-${row.getLong(1)}x-m$merges"
    IndexCache.getOrBuild(
      s"${System.getProperty("java.io.tmpdir")}/graft-bpe-cache", "bpe", fp) {
      scratch =>
        val vocab = bpeVocab(docs).persist()
        try {
          val (out, state) = bpeLoop(vocab, merges)
          import s.implicits._
          out.toDF("step", "left_sym", "right_sym", "merged", "n_occurrences")
            .write.parquet(scratch.resolve("merges").toString)
          state.write.parquet(scratch.resolve("vocab").toString)
        } finally vocab.unpersist()
    }
  }

  /** The shared train loop: persisted vocab in, merge table plus the
    * post-merge vocab STATE (a lazy projection chain over `vocab`) out.
    * Callers own the persist/release of `vocab` and must materialize
    * anything derived from the returned state before unpersisting.
    */
  private def bpeLoop(vocab: DataFrame, merges: Int)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    var state = vocab
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    for (step <- 1 to merges) {
      // single-symbol words carry no pairs (and Spark's sequence(1, 0)
      // would generate a DESCENDING range, not an empty one)
      val top = state
        .select(split(trim(col("seq")), "  ").as("syms"), col("n"))
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .head() // ONE row: the selected merge — model-parameter scale
      val (l, r, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
      out += ((step.toLong, l, r, l + r, cnt))
      state = state.withColumn("seq",
        expr(s"replace(seq, ' $l  $r ', ' $l$r ')"))
    }
    (out.result(), state)
  }

  private def bpeVocab(docs: DataFrame): DataFrame = docs
    .select(explode(wsTokens(lower(col("text")))).as("word"))
    .filter(col("word").rlike("^[a-z]+$"))
    .groupBy(col("word")).agg(count(lit(1)).as("n"))
    .filter(length(col("word")) >= 2)
    .select(expr("' ' || array_join(transform(sequence(1, length(word)), i -> substring(word, i, 1)), '  ') || ' '").as("seq"),
      col("n"))

  /** [[bpeMerges]] over any (doc_id, text) frame — spec entry point. */
  def bpeMergesFrom(docs: DataFrame, merges: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val vocab = bpeVocab(docs).persist()
    try {
      val (out, _) = bpeLoop(vocab, merges)
      out.toDF("step", "left_sym", "right_sym", "merged", "n_occurrences")
    } finally vocab.unpersist()
  }

  /** TOKENIZE with the learned merges: the vocabulary after the full
    * train loop, exploded back to per-token corpus frequencies — the
    * artifact that certifies the merged STATE itself (the merge table
    * alone can't: a wrong replace order would leave the right merges
    * with the wrong survivors). Multi-char tokens surface exactly
    * where the merge table promises them.
    */
  def bpeEncodeTop(s: SparkSession, dir: String, merges: Int = 10,
                   topK: Int = 30): DataFrame =
    s.read.parquet(s"${bpeIndexIfAbsent(s, dir, merges)}/vocab")
      .select(explode(split(trim(col("seq")), "  ")).as("token"), col("n"))
      .groupBy(col("token"))
      .agg(sum(col("n")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(topK)

  /** [[bpeEncodeTop]] over any (doc_id, text) frame — spec entry point. */
  def bpeEncodeTopFrom(docs: DataFrame, merges: Int, topK: Int): DataFrame = {
    val vocab = bpeVocab(docs).persist()
    try {
      val (_, state) = bpeLoop(vocab, merges)
      state
        .select(explode(split(trim(col("seq")), "  ")).as("token"), col("n"))
        .groupBy(col("token"))
        .agg(sum(col("n")).as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("token"))
        .limit(topK)
        .localCheckpoint(true) // materialize before the vocab cache drops
    } finally vocab.unpersist()
  }

  /** TOKENIZER FERTILITY — the evaluation metric for the trained BPE
    * tokenizer itself (how many tokens a word costs, how many
    * characters a token carries): the number that decides whether a
    * vocabulary/merge budget suits a corpus BEFORE training pays for
    * it, and the standard cross-lingual tokenizer-fairness readout.
    * One row per distinct tokens-per-word count (bounded by max word
    * length) with type/occurrence tallies and the corpus share;
    * corpus-level tokens-per-word and chars-per-token ride every row
    * in exact 1e-4 integers (the q39 psi_total discipline). Measured
    * over the trainer's own vocabulary contract (lowercase a–z words,
    * length ≥ 2 — the [[bpeMerges]] discipline).
    *
    * Third consumer of the persisted BPE artifact (merge table,
    * tokenizer application, now the fertility audit) — the
    * train-once/serve-many contract; the audit itself is one
    * vocab-sized map + two aggs.
    */
  def bpeFertility(s: SparkSession, dir: String, merges: Int = 10): DataFrame =
    bpeFertilityOfState(
      s.read.parquet(s"${bpeIndexIfAbsent(s, dir, merges)}/vocab"))

  /** The audit core over any post-merge (seq, n) vocabulary state —
    * spec entry point (feed it `bpeLoop`'s state via
    * [[bpeEncodeTopFrom]]'s path or a hand-built state). */
  def bpeFertilityOfState(state: DataFrame): DataFrame = {
    val words = state.select(
      size(split(trim(col("seq")), "  ")).cast("long").as("n_tokens"),
      length(regexp_replace(col("seq"), " ", "")).cast("long").as("n_chars"),
      col("n"))
    val tot = words.agg(sum(col("n")).as("tw"),
      sum(col("n") * col("n_tokens")).as("tt"),
      sum(col("n") * col("n_chars")).as("tc"))
    words.groupBy(col("n_tokens"))
      .agg(count(lit(1)).as("n_word_types"),
        sum(col("n")).as("n_occurrences"))
      .crossJoin(broadcast(tot))
      .withColumn("share_1e4", expr("(n_occurrences * 10000L) DIV tw"))
      .withColumn("tokens_per_word_1e4", expr("(tt * 10000L) DIV tw"))
      .withColumn("chars_per_token_1e4", expr("(tc * 10000L) DIV tt"))
      .select(col("n_tokens"), col("n_word_types"), col("n_occurrences"),
        col("share_1e4"), col("tokens_per_word_1e4"),
        col("chars_per_token_1e4"))
      .orderBy(col("n_tokens"))
  }

  /** DuckDB twin of [[bpeFertility]]: the same unrolled merge chain,
    * final state measured instead of exploded. */
  def bpeFertilityOracleSql(merges: Int = 10): String =
    bpeOracleCtes(merges) + s"""
      |, wrd AS MATERIALIZED (
      |  SELECT CAST(len(string_split(trim(seq), '  ')) AS BIGINT) AS n_tokens,
      |    CAST(length(replace(seq, ' ', '')) AS BIGINT) AS n_chars, n
      |  FROM v$merges),
      |tot AS (
      |  SELECT sum(n) AS tw, sum(n * n_tokens) AS tt, sum(n * n_chars) AS tc
      |  FROM wrd)
      |SELECT n_tokens, CAST(count(*) AS BIGINT) AS n_word_types,
      |  CAST(sum(n) AS BIGINT) AS n_occurrences,
      |  CAST((sum(n) * 10000) // tw AS BIGINT) AS share_1e4,
      |  CAST((tt * 10000) // tw AS BIGINT) AS tokens_per_word_1e4,
      |  CAST((tc * 10000) // tt AS BIGINT) AS chars_per_token_1e4
      |FROM wrd CROSS JOIN tot
      |GROUP BY n_tokens, tw, tt, tc
      |ORDER BY n_tokens""".stripMargin

  /** The M-step unrolled DuckDB twin of [[bpeMerges]] — identical
    * state string representation, identical replace-based merge, so
    * the hash compare checks the whole loop, not just round one.
    * CTEs are MATERIALIZED: DuckDB inlines CTEs by default and the
    * step chain would otherwise expand exponentially.
    */
  def bpeMergesOracleSql(merges: Int = 10): String =
    bpeOracleCtes(merges) + "\nSELECT * FROM (" +
      (1 to merges).map(k =>
        s"SELECT CAST($k AS BIGINT) AS step, l AS left_sym, r AS right_sym, merged, cnt AS n_occurrences FROM t$k")
        .mkString(" UNION ALL ") +
      ") ORDER BY step"

  /** DuckDB twin of [[bpeEncodeTop]]: the same unrolled merge chain,
    * final state exploded to token frequencies.
    */
  def bpeEncodeOracleSql(merges: Int = 10, topK: Int = 30): String =
    bpeOracleCtes(merges) + s"""
      |SELECT token, CAST(sum(n) AS BIGINT) AS n_occurrences
      |FROM (SELECT unnest(string_split(trim(seq), '  ')) AS token, n FROM v$merges)
      |GROUP BY token
      |ORDER BY n_occurrences DESC, token
      |LIMIT $topK""".stripMargin

  private def bpeOracleCtes(merges: Int): String = {
    val sb = new StringBuilder(
      """WITH words AS MATERIALIZED (
        |  SELECT tok AS word, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok FROM documents)
        |  WHERE regexp_matches(tok, '^[a-z]+$') GROUP BY tok),
        |v0 AS MATERIALIZED (
        |  SELECT ' ' || array_to_string(list_transform(generate_series(1, length(word)), i -> substring(word, i, 1)), '  ') || ' ' AS seq, n
        |  FROM words WHERE length(word) >= 2)""".stripMargin)
    for (k <- 1 to merges) {
      val p = k - 1
      sb ++= s""",
        |p$k AS MATERIALIZED (
        |  SELECT syms[CAST(i AS INT)] AS l, syms[CAST(i AS INT)+1] AS r, CAST(sum(n) AS BIGINT) AS cnt
        |  FROM (SELECT string_split(trim(seq), '  ') AS syms, n FROM v$p),
        |       LATERAL (SELECT unnest(range(1, len(syms))) AS i) g
        |  GROUP BY 1, 2),
        |t$k AS MATERIALIZED (SELECT l, r, l || r AS merged, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
        |v$k AS MATERIALIZED (SELECT replace(seq, ' ' || (SELECT l FROM t$k) || '  ' || (SELECT r FROM t$k) || ' ',
        |                     ' ' || (SELECT merged FROM t$k) || ' ') AS seq, n FROM v$p)""".stripMargin
    }
    sb.toString
  }

  /** Word co-occurrence PMI — the word2vec/SGNS-era corpus statistic
    * (pointwise mutual information over document-level co-occurrence)
    * behind embedding training data and collocation mining.
    * Restricted to the top-`topV` vocabulary (a broadcast-able set),
    * co-occurrence counts come from the basket shape, NOT a
    * self-join: one exchange on doc_id, `collect_set` of the doc's
    * in-vocabulary tokens, then a<b pairs expand map-side bounded by
    * topV per doc. PMI = ln(N·n_ab / (n_a·n_b)) fixed to micro
    * precision (the bm25 ln-parity discipline), and the top-k orders
    * by the ROUNDED pmi with a pair tiebreak.
    */
  def pmiPairs(s: SparkSession, dir: String, topV: Int = 100,
               minPair: Long = 5L, topK: Int = 25): DataFrame = {
    val docs = Tables.documents(s, dir)
    // Baskets FIRST: one explode pass + one exchange on doc_id, with
    // collect_set doing the per-doc dedup the old shape paid a
    // separate corpus-wide distinct shuffle for — and the vocabulary
    // counts then derive from the compact basket relation (1 row/doc)
    // instead of re-running the explode+regex+distinct a second time.
    val baskets = docs
      .select(col("doc_id"), explode(wsTokens(lower(col("text")))).as("tok"))
      .filter(col("tok").rlike("^[a-z]+$"))
      .groupBy(col("doc_id")).agg(collect_set(col("tok")).as("ts"))
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val tokN = baskets.select(explode(col("ts")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
    // top-V vocabulary WITH its counts to the driver (model-scale:
    // topV rows, the centroid-collect discipline): the basket filter
    // becomes a map-side array_intersect against a literal, and the
    // n_a/n_b lookups a broadcast LocalRelation — pair members are
    // all in the top-V by construction, so no path recomputes the
    // corpus-wide token counts
    val vocabRows = tokN.orderBy(col("n_tok").desc, col("tok"))
      .limit(topV).collect().map(r => (r.getString(0), r.getLong(1)))
    val vocab = vocabRows.map(_._1)
    val sp = s
    import sp.implicits._
    val vocabDf = vocabRows.toSeq.toDF("tok", "n_tok")
    val pairs = baskets
      .select(array_intersect(col("ts"),
        lit(vocab.asInstanceOf[Array[String]])).as("ts"))
      .select(explode(col("ts")).as("ta"), col("ts"))
      .select(col("ta"), explode(col("ts")).as("tb"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPair)
    pairs
      .join(broadcast(vocabDf.toDF("ta", "n_a")), "ta")
      .join(broadcast(vocabDf.toDF("tb", "n_b")), "tb")
      .crossJoin(broadcast(nDocs))
      .select(col("ta"), col("tb"), col("n_ab"),
        (floor(log(col("n_docs").cast("double") * col("n_ab").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double")))
          * lit(1000000.0) + lit(0.5)) / lit(1000000.0)).as("pmi"))
      .orderBy(col("pmi").desc, col("ta"), col("tb"))
      .limit(topK)
  }

  /** Inverted-index construction — the posting lists themselves
    * (token → sorted (doc, tf) list), the artifact behind the BM25 /
    * TF-IDF scorers above. tf is one hash agg on (token, doc); the
    * posting list is one more agg on token, with the list rendered in
    * a canonical zero-padded `doc:tf` form so the cross-engine
    * compare is exact (Spark's `collect_list` order is
    * partition-dependent; `array_sort` on the padded form fixes it,
    * and the oracle's `string_agg ... ORDER BY` matches). Restricted
    * to the `topK` highest-df tokens for the driver check; the
    * unrestricted index is the same two aggregations. Posting lists
    * of web-scale stopwords are the classic skew point — a real
    * deployment shards postings beyond a length cap (doc-id range
    * splits), which composes with this plan as a post-agg repartition.
    */
  def invertedIndex(s: SparkSession, dir: String, topK: Int = 20): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(wsTokens(lower(col("text")))).as("token"))
      .groupBy(col("token"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        array_join(array_sort(collect_list(
          // width 12 holds any realistic doc_id: both Spark and DuckDB
          // lpad silently TRUNCATE inputs wider than the pad, which at
          // width 6 would corrupt postings identity from doc_id 1e6 up
          concat(lpad(col("doc_id").cast("string"), 12, "0"), lit(":"), col("tf")))), ",")
          .as("postings"))
      .orderBy(col("df").desc, col("token"))
      .limit(topK)

  /** Smoothed TF-IDF over whitespace tokens, top-`topK` terms:
    * tf per (doc, token) and df per token are two hash aggregations
    * with map-side combine; the corpus size joins in as a broadcast
    * 1-row aggregate (never a driver-side collect); idf =
    * ln((N+1)/(df+1))+1. The scan→explode→partial-agg front half is
    * one stage — at 100 TB this is the standard two-shuffle vocab
    * pipeline.
    */
  def tfidfTop(s: SparkSession, dir: String, topK: Int = 100): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tok = docs.select(col("doc_id"), explode(wsTokens(col("text"))).as("token"))
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        rnd4(col("tf") * (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))))
      .select(col("doc_id"), col("token"), col("tf"), col("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id"), col("token"))
      .limit(topK)
  }

  /** Deterministic train/validation/test assignment: bucket =
    * first-4-hex-chars of md5(doc_id) mod 1000 → 90/5/5. Hash-based
    * (not random) so the split is stable under reruns, re-partitioning
    * and incremental ingest — the only split discipline that survives
    * a 100 TB pipeline; md5 exists identically in the oracle engine so
    * the assignment itself is verified, not just the counts' shape.
    */
  def splitCounts(s: SparkSession, dir: String): DataFrame = {
    val bucket =
      conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long") % 1000
    val split = when(bucket < 900, "train")
      .when(bucket < 950, "validation")
      .otherwise("test")
    Tables.documents(s, dir)
      .select(col("lang"), split.as("split"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("split"))
  }

  /** Fixed-window document chunking with overlap — the standard prep
    * for context-bounded training/embedding: windows of `chunkChars`
    * starting every `chunkChars − overlap` characters. A generator
    * (explode over the start sequence) + substring: pure map stage,
    * 0..N rows out per row in, no shuffle until the final sort. The
    * chunk text itself is emitted as an md5 fingerprint so the
    * cross-engine compare stays cell-hashable.
    */
  def chunks(s: SparkSession, dir: String,
             chunkChars: Int = 200, overlap: Int = 50): DataFrame = {
    val step = chunkChars - overlap
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), greatest(lit(1), length(col("text"))), lit(step))).as("start"))
      .select(
        col("doc_id"),
        ((col("start") - 1) / step).cast("long").as("chunk_idx"),
        length(col("text").substr(col("start"), lit(chunkChars))).cast("long").as("n_chars"),
        md5(col("text").substr(col("start"), lit(chunkChars))).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** PII-style scrubbing: count and redact emails, URLs and long
    * digit runs (the cheap regex tier of a training-data privacy
    * pass). Pure map stage; the scrubbed text round-trips as an md5
    * fingerprint so the oracle verifies the REPLACEMENT itself, not
    * just the counts.
    */
  def scrub(s: SparkSession, dir: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    val url = "https?://[^ \\t\\n]+"
    val longNum = "[0-9]{6,}"
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), email, "<EMAIL>"),
          url, "<URL>"),
        longNum, "<NUM>")
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit(email)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(url)).cast("long").as("n_urls"),
        regexp_count(col("text"), lit(longNum)).cast("long").as("n_longnums"),
        md5(scrubbed).as("scrubbed_fp"))
      .orderBy(col("doc_id"))
  }

  /** Self-trained bigram language-model scoring — the in-pipeline
    * stand-in for a KenLM-style perplexity quality filter: train
    * add-one-smoothed bigram probabilities ON the corpus itself, then
    * score every document by its mean bigram log-probability. Docs
    * whose word transitions are unusual for the corpus (boilerplate,
    * wrong language, garbled text) score low and fall to a filter.
    *
    * Determinism discipline (same as bm25): each bigram's log-prob is
    * floored to integer MICROS before any aggregation, so the per-doc
    * sums are exact integers and aggregation order can't drift the
    * doubles on either engine.
    *
    * Plan shape: explode → two hash-agg count tables (bigram,
    * context) → re-join the bigram stream against both — three
    * shuffles, all data-sized with map-side partial aggregation, plus
    * one broadcast vocabulary scalar. The model IS two count
    * relations: nothing model-sized ever reaches the driver.
    */
  def lmScore(s: SparkSession, dir: String): DataFrame = {
    val toks = wsTokens(col("text"))
    val base = Tables.documents(s, dir).select(col("doc_id"), toks.as("toks"))
    val bigrams = base.select(col("doc_id"),
      explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(0), size(col("toks")) - 2),
          i => struct(element_at(col("toks"), i + 1).as("w1"),
            element_at(col("toks"), i + 2).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c12 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = broadcast(base.select(explode(col("toks")).as("w"))
      .agg(countDistinct(col("w")).as("v")))
    bigrams
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(vocab)
      .withColumn("micro",
        floor(log((col("c12") + lit(1.0)) / (col("c1") + col("v"))) * lit(1000000.0)
          + lit(0.5)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("micro")).as("sum_micro"))
      .select(col("doc_id"), col("n_bigrams"),
        rnd4(col("sum_micro").cast("double") / col("n_bigrams") / lit(1000000.0))
          .as("avg_logp"))
      .orderBy(col("doc_id"))
  }

  /** Char-n-gram LANGUAGE IDENTIFICATION (Cavnar & Trenkle 1994) —
    * the real rank-profile classifier beside the heuristic
    * script/diacritic tiers of `txt_langid`: each language's TRAIN
    * split builds a top-`prof` character-trigram RANK profile, and a
    * held-out doc is classified to the profile minimizing the
    * out-of-place distance Σ|rank_doc − rank_lang| (missing trigram
    * costs the full profile width). Every quantity is an integer —
    * counts, ranks, the penalty, the distance — so the confusion
    * matrix hashes with no float anywhere; ties break (count desc,
    * gram asc) and (distance asc, lang asc), spelled identically in
    * the oracle.
    *
    * Scale shape: one trigram explode (the corpus-sized stage),
    * language profiles collapse to a ≤ langs·prof relation that
    * BROADCASTS; per-doc profiles are a doc-keyed window over
    * ≤ prof rows; the candidate grid is doc-grams × langs (vocabulary
    * of languages, not corpus) and the argmin window partitions by
    * doc. Train/eval membership is the md5 split discipline, so the
    * evaluation is honest and rerun-stable.
    */
  def langIdNgram(s: SparkSession, dir: String, prof: Int = 50): DataFrame =
    langIdNgramFrom(Tables.documents(s, dir), prof)

  /** [[langIdNgram]] over any (doc_id, lang, text) frame — spec
    * entry point for planted separable corpora. */
  def langIdNgramFrom(docsIn: DataFrame, prof: Int = 50): DataFrame = {
    val docs = docsIn
      .select(col("doc_id"), col("lang"), lower(trim(col("text"))).as("t"))
      .withColumn("is_train",
        conv(substring(md5(concat(lit("lid:"), col("doc_id").cast("string"))),
          1, 4), 16, 10).cast("long") % 1000L < 700L)
    val grams = docs.select(col("doc_id"), col("lang"), col("is_train"),
      explode(when(length(col("t")) >= 3,
        expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))"))
        .otherwise(array().cast("array<string>"))).as("g"))
    val wLang = Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("g").asc)
    val langProf = grams.filter(col("is_train"))
      .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("c"))
      .withColumn("rl", row_number().over(wLang).cast("long"))
      .filter(col("rl") <= prof)
      .select(col("lang"), col("g"), col("rl"))
    val wDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("c").desc, col("g").asc)
    val docProf = grams.filter(!col("is_train"))
      .groupBy(col("doc_id"), col("lang"), col("g")).agg(count(lit(1)).as("c"))
      .withColumn("rd", row_number().over(wDoc).cast("long"))
      .filter(col("rd") <= prof)
      .select(col("doc_id"), col("lang").as("true_lang"), col("g"), col("rd"))
    // Candidate languages = those with a profile. Deriving them from
    // langProf re-ran the whole corpus-sized explode → count → rank
    // branch a THIRD time (the plan showed 3 scans + 3 Generates for
    // 2 logical passes — r14, guide §2.4); a lang has a profile row
    // iff it has ≥1 train trigram iff it has a train doc of length
    // ≥ 3 (the tokenizer emits len−2 ≥ 1 grams for such a doc), so
    // the distinct over the doc frame is EXACTLY the same set at
    // doc-scan cost, no explode.
    val langs = docs.filter(col("is_train") && length(col("t")) >= 3)
      .select(col("lang").as("cand")).distinct()
    val dist = docProf.crossJoin(broadcast(langs))
      .join(broadcast(langProf.select(col("lang").as("cand"), col("g"), col("rl"))),
        Seq("cand", "g"), "left")
      .withColumn("d", when(col("rl").isNotNull, abs(col("rd") - col("rl")))
        .otherwise(lit(prof.toLong)))
      .groupBy(col("doc_id"), col("true_lang"), col("cand"))
      .agg(sum(col("d")).as("dist"))
    val wPred = Window.partitionBy(col("doc_id"))
      .orderBy(col("dist").asc, col("cand").asc)
    dist.withColumn("rn", row_number().over(wPred))
      .filter(col("rn") === 1)
      .groupBy(col("true_lang"), col("cand").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("true_lang"), col("pred_lang"))
  }

  /** HEAPS'-LAW vocabulary-growth fit — [[zipfFit]]'s companion
    * corpus diagnostic: natural text grows vocabulary as V(N) ≈ K·N^β
    * with β ≈ 0.4–0.6 (Heaps 1978), and a corpus whose growth curve
    * bends away from a power law (β drifting toward 0 = template
    * repetition; toward 1 = ID/noise floods) earns a look before
    * training — it is also the estimator for "how much new vocabulary
    * will 10× more data buy". Ten cumulative checkpoints along the
    * doc_id order (boundaries from ONE exact-percentile aggregate,
    * the q41 contract), V via per-token FIRST-occurrence doc (a token
    * counts from the checkpoint that first saw it — no per-checkpoint
    * distinct), N via per-doc token counts; both ln'd to integer
    * micros once, then the log-log OLS runs on exact longs with q42's
    * division order. β and K ride every row (the zipf_slope
    * discipline).
    *
    * Scale shape: one explode pass → vocab-sized first-doc relation +
    * doc-sized length relation; each crosses only the broadcast
    * 10-row checkpoint frame. No window, no sort, nothing
    * occurrence-sized past the first agg.
    */
  def heapsFit(s: SparkSession, dir: String): DataFrame =
    heapsFrom(Tables.documents(s, dir))

  /** [[heapsFit]] over any (doc_id, text) frame — spec entry point. */
  def heapsFrom(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), wsTokens(col("text")).as("toks"))
    val dlen = base.select(col("doc_id"), size(col("toks")).cast("long").as("nt"))
    val firstDoc = base.select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
    val ks = dlen.agg(expr(
      "percentile(doc_id, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0))").as("ts"))
      .select(posexplode(col("ts")).as(Seq("k0", "thr")))
      .select((col("k0") + 1).cast("long").as("k"), col("thr"))
    val vk = firstDoc.crossJoin(broadcast(ks))
      .filter(col("fd") <= col("thr"))
      .groupBy(col("k")).agg(count(lit(1)).as("vocab_cum"))
    val nk = dlen.crossJoin(broadcast(ks))
      .filter(col("doc_id") <= col("thr"))
      .groupBy(col("k")).agg(sum(col("nt")).as("n_tokens_cum"))
    val pts = nk.join(vk, "k")
      .withColumn("x", floor(log(col("n_tokens_cum").cast("double"))
        * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("y", floor(log(col("vocab_cum").cast("double"))
        * lit(1000000.0) + lit(0.5)).cast("long"))
    val fit = pts.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val d = (c: String) => col(c).cast("double")
    pts.crossJoin(broadcast(fit))
      .withColumn("beta", (d("n") * d("sxy") - d("sx") * d("sy")) /
        (d("n") * d("sxx") - d("sx") * d("sx")))
      .select(col("k"), col("n_tokens_cum"), col("vocab_cum"),
        rnd4(col("beta")).as("heaps_beta"),
        rnd4(exp((d("sy") - col("beta") * d("sx")) / d("n") / lit(1000000.0)))
          .as("heaps_k"))
      .orderBy(col("k"))
  }

  /** Interpolated KNESER-NEY bigram scoring — the production-grade
    * smoothing upgrade over [[lmScore]]'s add-one baseline (Kneser &
    * Ney 1995; Chen & Goodman 1998 found interpolated KN the
    * strongest n-gram smoother, and perplexity filters built on it
    * sort corpora better than add-k, whose mass assignment punishes
    * frequent-context bigrams): p(w|v) = max(c(vw)−D, 0)/c(v) +
    * D·N₁₊(v·)/c(v) · N₁₊(·w)/T, with D = 0.75 and the CONTINUATION
    * count N₁₊(·w) — "how many contexts does w complete" — replacing
    * raw frequency in the backoff, which is the insight that stops
    * "Francisco" (frequent, one context) from stealing mass from
    * genuinely versatile words.
    *
    * Determinism: the whole per-TYPE log-probability is fixed to
    * integer micros once (single ln, the [[lmScore]] discipline, with
    * a pinned operation order shared by the oracle), so per-doc sums
    * are exact integer arithmetic; scored bigrams all have c ≥ 1 >
    * D, so the max(·,0) branch never fires and the formula is
    * division-safe.
    *
    * Plan shape improvement over lmScore: the model joins resolve on
    * the TYPE relation (bigram vocabulary), and the corpus-sized
    * occurrence stream pays exactly ONE equi-join against the scored
    * types — not one join per count table.
    */
  def knLmScore(s: SparkSession, dir: String): DataFrame =
    knLmFrom(Tables.documents(s, dir))

  /** [[knLmScore]] over any (doc_id, text) frame — spec entry point. */
  def knLmFrom(docs: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    val base = docs.select(col("doc_id"), toks.as("toks"))
    val bigrams = base.select(col("doc_id"),
      explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(0), size(col("toks")) - 2),
          i => struct(element_at(col("toks"), i + 1).as("w1"),
            element_at(col("toks"), i + 2).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c12 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val n1f = c12.groupBy(col("w1")).agg(count(lit(1)).as("n1f"))
    val nc = c12.groupBy(col("w2")).agg(count(lit(1)).as("nc"))
    val t = broadcast(c12.agg(count(lit(1)).as("t")))
    val typeScore = c12
      .join(c1, "w1").join(n1f, "w1").join(nc, "w2").crossJoin(t)
      .withColumn("micro", floor(log(
        ((col("c12").cast("double") - lit(0.75)) +
          lit(0.75) * col("n1f") * col("nc") / col("t")) / col("c1"))
        * lit(1000000.0) + lit(0.5)).cast("long"))
      .select(col("w1"), col("w2"), col("micro"))
    bigrams.join(typeScore, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("micro")).as("sum_micro"))
      .select(col("doc_id"), col("n_bigrams"),
        rnd4(col("sum_micro").cast("double") / col("n_bigrams") / lit(1000000.0))
          .as("avg_logp"),
        rnd4(exp(-(col("sum_micro").cast("double") / col("n_bigrams")
          / lit(1000000.0)))).as("ppl"))
      .orderBy(col("doc_id"))
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how target-domain-like its HASHED n-gram profile is.
    * Features are md5-bucketed bigrams (hashing bounds the model at
    * `buckets` cells regardless of vocabulary — the trick that makes
    * the method run at web scale); the target distribution is
    * estimated from the in-corpus slice matching `targetLang` and the
    * raw distribution from everything, both add-one smoothed. A doc's
    * importance log-weight is the sum over its bigram OCCURRENCES of
    * log p_target(bucket) − log p_raw(bucket); resampling by this
    * weight shifts the corpus toward the target domain.
    *
    * Determinism: each bucket's log-ratio is floored to integer
    * micros once, so per-doc sums are exact integer arithmetic on
    * both engines (the [[lmScore]] discipline).
    *
    * Plan shape: explode bigrams → ONE hash-agg builds both count
    * tables (conditional sums per bucket) → broadcast the
    * buckets-sized weight relation back onto the bigram stream →
    * per-doc hash-agg. The model is `buckets` rows — broadcastable at
    * any corpus size; docs with <2 tokens have no features and drop
    * out (no weight evidence either way).
    */
  def dsirWeights(docs: DataFrame, targetLang: String = "en",
                  buckets: Int = 4096): DataFrame = {
    val base = docs.select(col("doc_id"), col("lang"), wsTokens(col("text")).as("toks"))
    val feats = base.select(col("doc_id"), (col("lang") === targetLang).as("is_t"),
        explode(when(size(col("toks")) >= 2,
          transform(sequence(lit(0), size(col("toks")) - 2),
            i => concat(element_at(col("toks"), i + 1), lit(" "),
              element_at(col("toks"), i + 2))))
          .otherwise(array().cast("array<string>"))).as("bg"))
      .select(col("doc_id"), col("is_t"),
        (conv(substring(md5(col("bg")), 1, 4), 16, 10).cast("long") % buckets).as("b"))
    // The count model is ≤ `buckets` rows. localCheckpoint it EAGERLY:
    // totals, the weight relation and its broadcast all branch off the
    // model, and without truncation each branch re-runs the full
    // explode + md5 pass over the corpus — the model-fit scan must
    // happen exactly once (scoring is the one other pass; two scans is
    // the honest cost of fit-then-score at any corpus size).
    val counts = feats.groupBy(col("b")).agg(
        count(lit(1)).as("c_raw"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("c_tgt"))
      .localCheckpoint()
    val totals = broadcast(counts.agg(
      sum(col("c_raw")).as("n_raw"), sum(col("c_tgt")).as("n_tgt")))
    val lam = broadcast(counts.crossJoin(totals).select(col("b"),
      floor((log((col("c_tgt").cast("double") + lit(1.0))
          / (col("n_tgt").cast("double") + lit(buckets.toDouble)))
        - log((col("c_raw").cast("double") + lit(1.0))
          / (col("n_raw").cast("double") + lit(buckets.toDouble))))
        * lit(1000000.0) + lit(0.5)).cast("long").as("lam_micro")))
    feats.join(lam, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lam_micro")).as("s_micro"))
      .select(col("doc_id"), col("n_bigrams"),
        rnd4(col("s_micro").cast("double") / lit(1000000.0)).as("logw"),
        rnd4(col("s_micro").cast("double") / col("n_bigrams") / lit(1000000.0))
          .as("logw_per_bigram"))
      .orderBy(col("doc_id"))
  }

  def dsirQuery(s: SparkSession, dir: String): DataFrame =
    dsirWeights(Tables.documents(s, dir))

  /** Deterministic STRATIFIED sampling: per-language keep rates in
    * per-mille, assignment by salted md5 bucket (salt decorrelates it
    * from the train/val/test split's buckets, so sampling within a
    * split stays unbiased). Hash-based membership is rerun- and
    * ingest-stable like [[splitCounts]] — the only sampling that
    * composes across incremental 100 TB pipeline runs. The kept-id
    * sum certifies exact MEMBERSHIP cross-engine, not just counts.
    * Pure map stage + one hash agg.
    */
  def stratifiedSample(s: SparkSession, dir: String,
                       rates: Map[String, Int] = Map("en" -> 900, "de" -> 500),
                       defaultRate: Int = 250): DataFrame = {
    val bucket = conv(substring(md5(concat(lit("sample:"), col("doc_id").cast("string"))),
      1, 4), 16, 10).cast("long") % 1000
    val rate = rates.foldLeft(lit(defaultRate): Column) {
      case (acc, (l, r)) => when(col("lang") === l, lit(r)).otherwise(acc)
    }
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"), (bucket < rate).as("kept"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("doc_id"))).as("kept_id_sum"))
      .orderBy(col("lang"))
  }

  /** Deterministic MIXTURE sampling: hit a target domain composition
    * (the training-data "data mixing" step — e.g. 40 % en / 20 % de …)
    * regardless of how skewed the raw corpus is. Per-language accept
    * thresholds derive from the corpus's own counts — threshold_l =
    * min(1000, ⌊w_l · T · 1000 / n_l⌋) per-mille, T the overall target
    * size — then membership is the same salted-md5-bucket test as
    * [[stratifiedSample]], so the sample is rerun- and ingest-stable
    * and composes across incremental runs. Languages scarcer than
    * their target weight saturate at keep-all (threshold 1000) rather
    * than upsampling, which is the standard single-epoch behavior.
    *
    * Plan shape: one tiny per-language count agg (≤ #langs rows,
    * broadcast back), then a pure map-stage membership test and one
    * final hash agg — two data-sized shuffles total at any scale. The
    * kept-id sum certifies exact membership cross-engine.
    */
  def mixtureSample(s: SparkSession, dir: String,
                    weights: Map[String, Double] = Map(
                      "en" -> 0.40, "de" -> 0.20, "fr" -> 0.15,
                      "es" -> 0.15, "zh" -> 0.10),
                    targetFrac: Double = 0.5): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("lang"), col("doc_id"))
    val total = docs.count() // scalar corpus size (driver-side by design)
    val target = math.floor(targetFrac * total).toLong
    val w = weights.foldLeft(lit(0.0): Column) {
      case (acc, (l, v)) => when(col("lang") === l, lit(v)).otherwise(acc)
    }
    val thresholds = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("lang"), col("n_docs"),
        least(lit(1000L),
          floor(w * lit(target.toDouble) * lit(1000.0) / col("n_docs")))
          .cast("long").as("threshold"))
    val bucket = conv(substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))),
      1, 4), 16, 10).cast("long") % 1000
    docs
      .join(broadcast(thresholds), Seq("lang"))
      .select(col("lang"), col("n_docs"), col("threshold"), col("doc_id"),
        (bucket < col("threshold")).as("kept"))
      .groupBy(col("lang"), col("n_docs"), col("threshold"))
      .agg(
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("kept"), col("doc_id"))).as("sampled_id_sum"))
      .orderBy(col("lang"))
  }

  /** C4-style SENTENCE-LEVEL corpus dedup: every sentence is kept
    * only at its FIRST occurrence corpus-wide (ordered by doc_id,
    * then position — deterministic and ingest-stable), all later
    * occurrences are dropped, and each document is reassembled from
    * its surviving sentences in original order. This is the span
    * dedup C4/RefinedWeb run between exact and fuzzy dedup: it kills
    * boilerplate (cookie banners, license headers) that document-level
    * dedup can't see because the surrounding text differs.
    *
    * Plan shape: split+posexplode (map stage) → a MAP-SIDE-COMBINABLE
    * `min(struct(doc_id, pos))` aggregate per sentence (each map
    * partition pre-reduces its own occurrences, so a boilerplate
    * sentence with 10⁹ copies shuffles one row per partition, not 10⁹
    * rows to one reducer) → join back on sentence to flag keepers →
    * one hash agg to doc_id reassembling kept spans. A row_number
    * window keyed on the sentence would be the obvious plan, but a
    * window CANNOT pre-aggregate and AQE cannot split a skewed window
    * partition — the agg+join shape is both combinable and
    * AQE-skew-splittable, which is what survives a hot span at
    * 100 TB. The reassembled text leaves as an md5 fingerprint.
    */
  def sentenceDedup(s: SparkSession, dir: String): DataFrame =
    sentenceDedupOn(Tables.documents(s, dir))

  /** [[sentenceDedup]] over an arbitrary (doc_id, text) frame. */
  def sentenceDedupOn(docs: DataFrame): DataFrame = {
    val sents = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\\.")).as(Seq("pos", "raw")))
      .select(col("doc_id"), col("pos"), trim(col("raw")).as("sent"))
      .filter(col("sent") =!= "")
    // struct comparison is lexicographic (doc_id, then pos): min ≡
    // the row_number()=1 row of ORDER BY doc_id, pos
    val firstOcc = sents.groupBy(col("sent"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    sents.join(firstOcc, "sent")
      .withColumn("kept",
        col("doc_id") === col("first.doc_id") && col("pos") === col("first.pos"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_sentences"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(".",
          transform(
            array_sort(collect_list(when(col("kept"),
              struct(col("pos"), col("sent"))))),
            x => x.getField("sent"))).as("kept_text"))
      .select(col("doc_id"), col("n_sentences"), col("n_kept"),
        when(col("n_kept") > 0, md5(col("kept_text"))).as("kept_fp"))
      .orderBy(col("doc_id"))
  }

  /** Content-defined chunking (CDC) dedup: token-hash-selected
    * boundaries cut every document into variable chunks whose edges
    * depend only on LOCAL content, so a boilerplate passage repeated
    * at different offsets in different documents still yields
    * byte-identical interior chunks — the property fixed-window
    * chunking fundamentally lacks (any offset shift breaks alignment).
    * This is the rsync/LBFS chunking discipline applied to corpus
    * boilerplate mining.
    *
    * Plan shape: tokenize+posexplode (map), one window pass per doc
    * for the running boundary count, one hash agg to assemble chunks,
    * one hash agg on the chunk fingerprint — two shuffle keys
    * (doc_id, then fingerprint), both data-sized, no joins.
    *
    * Output: every chunk fingerprint seen in ≥ 2 distinct documents
    * (the cross-corpus boilerplate), with its spread and an example
    * location. Deterministic: planted boilerplate (inserted at
    * DIFFERENT token offsets per doc) guarantees non-empty output on
    * the synthetic corpus.
    */
  def cdcDedup(s: SparkSession, dir: String, modulus: Int = 16): DataFrame = {
    val docs = plantedBoilerplateDocs(s, dir)
    val tok = docs.select(col("doc_id"),
      posexplode(wsTokens(col("text"))).as(Seq("pos", "token")))
    // a token opens a new chunk when its salted md5 bucket hits 0 —
    // expected chunk length = modulus tokens
    val isBoundary = (conv(substring(md5(col("token")), 1, 4), 16, 10)
      .cast("long") % modulus === 0).cast("int")
    val runW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val chunks = tok
      .withColumn("chunk_id", sum(isBoundary).over(runW))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("token")))),
          x => x.getField("token")), " ").as("chunk_text"),
        count(lit(1)).as("n_tokens"))
    chunks
      .groupBy(md5(col("chunk_text")).as("chunk_fp"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("example_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("chunk_fp"))
  }

  /** A fixed 32-token boilerplate passage spliced into the first ten
    * documents at a doc-dependent offset (5 + doc_id tokens in), so
    * chunk-alignment-sensitive methods would miss it but CDC must
    * not. It contains three interior boundary tokens under the
    * default modulus ("reserved", "granted", "please"), guaranteeing
    * two byte-identical interior chunks across all ten docs. Public:
    * the oracle SQL and the spec reproduce it verbatim.
    */
  val BoilerplateText: String =
    "this content is provided under the standard license agreement all rights " +
      "reserved worldwide permission is granted to view the material for personal " +
      "use only please contact the publisher for any other use"

  def plantedBoilerplateDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val toks = wsTokens(col("text"))
    val cut = lit(5) + (col("doc_id") % 10).cast("int")
    docs.filter(col("doc_id") >= 10)
      .unionByName(docs.filter(col("doc_id") < 10)
        .select(col("doc_id"),
          concat_ws(" ",
            array_join(slice(toks, lit(1), cut), " "),
            lit(BoilerplateText),
            array_join(slice(toks, cut + 1, greatest(size(toks) - cut, lit(0))), " "))
            .as("text")))
  }

  /** Exact dedup via fingerprint: one hash-aggregate keyed on the
    * digest (map-side combine, no row comparison), keeping the lowest
    * doc_id per group — the scalable exact-dedup shape at any volume.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(fingerprint(col("text")).as("fingerprint"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("fingerprint"))

  /** Benchmark DECONTAMINATION: n-gram containment of an eval set
    * against the training corpus — the standard check that evaluation
    * data did not leak into training data. For each eval document,
    * containment = |sh(eval) ∩ sh(train)| / |sh(eval)| against its
    * best-matching train document; ≥ `threshold` flags contamination.
    * (Containment, not Jaccard: a short eval item fully embedded in a
    * long train document must still flag, so no length filter applies.)
    *
    * Scale design: the EVAL side is small by nature (benchmarks are
    * thousands of items, the corpus is the 100 TB side), so its
    * exploded shingle index broadcasts; the train corpus streams ONCE
    * through a map-side broadcast-hash join keyed on shingle hash, and
    * the only shuffle is the partial-aggregated (eval_id, doc_id)
    * overlap count — rows bounded by actual shingle collisions, never
    * corpus × eval. The demo eval set is planted: the first 5 docs,
    * mutated with the same 'xq ' prefix the near-dup queries use, ids
    * shifted by 1e6 — so ground truth is contamination ≈ (L−2)/(L−1).
    *
    * The kernel dedups shingles and the oracle uses `list_distinct`,
    * so intersect counts match the string-set oracle exactly (hash
    * collisions aside, P ≈ |sh|²/2⁶⁵).
    */
  def decontaminate(s: SparkSession, dir: String, n: Int = 3,
                    threshold: Double = 0.8): DataFrame = {
    val docs = Tables.documents(s, dir)
    val eval = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000000L).as("eval_id"),
        concat(lit("xq "), col("text")).as("text"))
    val evalSh = eval.select(col("eval_id"),
      graft.functions.ShingleHashes(col("text"), n).as("sh"))
    val evalTok = evalSh.select(col("eval_id"),
      size(col("sh")).cast("long").as("eval_len"), explode(col("sh")).as("t"))
    val trainTok = docs.select(col("doc_id"),
      explode(graft.functions.ShingleHashes(col("text"), n)).as("t"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("eval_id"))
      .orderBy(col("containment_raw").desc, col("doc_id").asc)
    trainTok.join(broadcast(evalTok), "t")
      .groupBy(col("eval_id"), col("doc_id"))
      .agg(count(lit(1)).cast("double").as("inter"), max(col("eval_len")).as("eval_len"))
      .withColumn("containment_raw", col("inter") / col("eval_len").cast("double"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("eval_id"), col("doc_id").as("train_doc_id"),
        rnd4(col("containment_raw")).as("containment"),
        (col("containment_raw") >= lit(threshold)).as("contaminated"))
      .orderBy(col("eval_id"))
  }

  /** BM25 top-k retrieval (k1 = 1.2, b = 0.75, Lucene-style idf) —
    * the lexical relevance scorer of a training-data curation loop
    * (mining documents relevant to a seed query set). Corpus-side
    * stats (tf, df, dl, avgdl, N) are the same two-shuffle vocab
    * pipeline as [[tfidfTop]]; the query terms (with their idf) are a
    * broadcast-joined small side, so scoring touches only rows whose
    * token appears in some query, and the per-(query, doc) sum is a
    * partial-aggregated shuffle on bounded rows.
    *
    * Per-term scores are micro-scaled to BIGINT (⌊x·10⁶+0.5⌋) BEFORE
    * summation: integer partial sums are associative, so the
    * aggregated score is bit-identical regardless of partitioning or
    * engine — float summation order can never flip the ranking against
    * the oracle.
    */
  def bm25(docs: DataFrame, queries: DataFrame, topK: Int = 5): DataFrame = {
    val (tf, dl) = bm25Corpus(docs)
    bm25From(tf, dl,
      tf.groupBy(col("token")).agg(count(lit(1)).as("df")),
      docs.agg(count(lit(1)).as("n_docs")),
      dl.agg(avg(col("dl")).as("avgdl")), // exact: integer-valued partials < 2^53
      queries, topK)
  }

  /** Corpus-side BM25 inputs — the relations a persisted lexical index
    * materializes: per-(doc, token) term frequencies and per-doc
    * lengths, from the same tokenizer the scorer uses.
    */
  def bm25Corpus(docs: DataFrame): (DataFrame, DataFrame) = {
    val tok = docs.select(col("doc_id"), explode(wsTokens(col("text"))).as("token"))
    (tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf")),
      tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl")))
  }

  /** The BM25 scoring tail, shared by the inline path and the
    * collection lexical tier ([[graft.catalog.CollectionData]]):
    * identical integer-micro math over whatever (tf, dl, dfreq,
    * nDocs 1-row, avgdl 1-row) relations the caller supplies — so an
    * INDEXED serve is bitwise-equal to the inline computation BY
    * CONSTRUCTION whenever its inputs are (tf may be pre-pruned to
    * the query terms: the qTerms join prunes to them anyway).
    */
  def bm25From(tf: DataFrame, dl: DataFrame, dfreq: DataFrame,
               nDocs: DataFrame, avgdl: DataFrame,
               queries: DataFrame, topK: Int): DataFrame = {
    val qTok = queries.select(col("query_id"),
      explode(array_distinct(wsTokens(col("query_text")))).as("token"))
    // restrict df to query terms FIRST (tiny), then broadcast the
    // (query_id, token, df) side against the corpus-wide tf relation
    val qTerms = qTok.join(dfreq, "token")
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
    tf.join(broadcast(qTerms), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(nDocs))
      .crossJoin(broadcast(avgdl))
      .select(col("query_id"), col("doc_id"),
        floor(termScore * lit(1000000.0) + lit(0.5)).cast("long").as("micro"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("micro")).as("score_micro"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        (col("score_micro").cast("double") / lit(1000000.0)).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Driver query wrapper: queries are the first 8 whitespace tokens
    * of docs 0-2 searched against the whole corpus.
    */
  def bm25TopK(s: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    val docs = Tables.documents(s, dir)
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        array_join(slice(wsTokens(col("text")), 1, 8), " ").as("query_text"))
    bm25(docs, queries, topK)
  }

  /** Intra-document REPETITION metrics — the MassiveText/Gopher-style
    * quality filter that catches boilerplate and degenerate generation
    * loops: the fraction of tokens that are duplicates of an earlier
    * token, and the fraction of bigram slots occupied by the single
    * most-repeated bigram. Per-row array math plus one (doc, bigram)
    * hash aggregation — map-side combine keeps the shuffle at distinct
    * bigrams, and nothing is corpus-global, so the operator is pure
    * scan parallelism at any corpus size.
    */
  def repetition(s: SparkSession, dir: String): DataFrame =
    repetitionOf(Tables.documents(s, dir))

  def repetitionOf(docs: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    val base = docs
      .select(col("doc_id"), toks.as("toks"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
    // guard: sequence(0, -1) would be DESCENDING for 1-token docs —
    // emit no bigram rows instead (explode drops the empty array)
    val bigrams = base.select(col("doc_id"),
      explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(0), size(col("toks")) - 2),
          i => concat_ws(" ", element_at(col("toks"), i + 1), element_at(col("toks"), i + 2))))
        .otherwise(array().cast("array<string>")))
        .as("bigram"))
    val topBigram = bigrams
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id")).agg(max(col("n")).as("top_bigram_n"))
    base.join(topBigram, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"),
        rnd4(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("dup_token_frac"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        // a 1-token doc has zero bigram slots → frac 0 by convention
        rnd4(when(col("n_tokens") > 1,
          coalesce(col("top_bigram_n"), lit(0L)).cast("double") /
            (col("n_tokens") - 1).cast("double")).otherwise(lit(0.0)))
          .as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  /** End-to-end curation FUNNEL — the composition every training-data
    * pipeline runs: ingest → quality floor → language agreement →
    * exact-dedup keeper → train split, reported as per-stage survivor
    * counts (each stage is the conjunction of everything before it).
    * One corpus scan computes all stage flags (the dedup-keeper flag
    * is the only shuffle: a min-over-fingerprint window, hash
    * partitioned), a single 1-row aggregation sums the survivors, and
    * the row explodes into the funnel table — no per-stage rescans, so
    * at 100 TB the funnel costs one pass + one window, not five jobs.
    * Every stage predicate mirrors its standalone oracled operator
    * ([[qualityScore]], [[langIdConfusion]], [[fingerprint]],
    * [[splitCounts]]) expression-for-expression.
    */
  def curationFunnel(s: SparkSession, dir: String,
                     minQuality: Double = 0.5): DataFrame = {
    val toks = wsTokens(col("text"))
    val nToks = size(toks).cast("double")
    val stopHits = size(expr(
      s"filter(split(trim(text), '\\\\s+'), t -> t in (${StopwordsEn.map("'" + _ + "'").mkString(",")}))"))
      .cast("double")
    val punct = regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("double")
    val len = length(col("text")).cast("double")
    val quality = lit(0.3) * (stopHits / nToks) +
      lit(0.3) * (lit(1.0) - least((punct / len) * 4.0, lit(1.0))) +
      lit(0.4) * least(nToks / lit(64.0), lit(1.0))
    val predicted =
      when(regexp_count(col("text"), lit("[\\x{4e00}-\\x{9fff}]")) > 0, "zh")
        .when(regexp_count(col("text"), lit("[äöüß]")) > 0, "de")
        .when(regexp_count(col("text"), lit("[éèêàçœ]")) > 0, "fr")
        .when(regexp_count(col("text"), lit("[ñáíóú¿¡]")) > 0, "es")
        .otherwise("en")
    val bucket =
      conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long") % 1000
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val flags = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        (quality >= lit(minQuality)).as("q"),
        (predicted === col("lang")).as("l"),
        fingerprint(col("text")).as("fp"),
        (bucket < 900).as("tr"))
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
    def survivors(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    flags.agg(
      count(lit(1)).as("n0"),
      survivors(col("q")).as("n1"),
      survivors(col("q") && col("l")).as("n2"),
      survivors(col("q") && col("l") && col("keep")).as("n3"),
      survivors(col("q") && col("l") && col("keep") && col("tr")).as("n4"))
      .select(explode(array(
        struct(lit(1L).as("stage"), lit("ingest").as("stage_name"), col("n0").as("n_docs")),
        struct(lit(2L).as("stage"), lit("quality").as("stage_name"), col("n1").as("n_docs")),
        struct(lit(3L).as("stage"), lit("lang_agreement").as("stage_name"), col("n2").as("n_docs")),
        struct(lit(4L).as("stage"), lit("dedup_keeper").as("stage_name"), col("n3").as("n_docs")),
        struct(lit(5L).as("stage"), lit("train_split").as("stage_name"), col("n4").as("n_docs"))))
        .as("st"))
      .select(col("st.stage").as("stage"), col("st.stage_name").as("stage_name"),
        col("st.n_docs").as("n_docs"))
      .orderBy(col("stage"))
  }

  /** SEQUENCE PACKING summary — the concat-and-chunk discipline that
    * turns variable-length documents into fixed-`maxTokens` training
    * sequences. Documents are sharded by the same stable md5 bucketing
    * as [[splitCounts]] (pack-parallelism = shards; at 100 TB each
    * shard packs independently on its executor), ordered by doc_id
    * within a shard, and a document starts sequence
    * ⌊(tokens before it) / maxTokens⌋. Emits per-sequence document and
    * token counts. The running sum is a per-shard window — Spark never
    * sees a global (single-partition) ordering, which is the only way
    * packing survives at scale.
    */
  def packSequences(s: SparkSession, dir: String, maxTokens: Int = 512,
                    shards: Int = 8): DataFrame =
    packSequencesOf(Tables.documents(s, dir), maxTokens, shards)

  def packSequencesOf(docs: DataFrame, maxTokens: Int = 512,
                      shards: Int = 8): DataFrame = {
    val tokc = size(wsTokens(col("text"))).cast("long")
    val shard =
      (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long")
        % shards).as("shard")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
      .orderBy(col("doc_id")).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), shard, tokc.as("n_tok"))
      .withColumn("seq_id",
        floor(coalesce(sum(col("n_tok")).over(w), lit(0L)) / lit(maxTokens)).cast("long"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .orderBy(col("shard"), col("seq_id"))
  }

  /** Contiguous global ids 0..N-1 in (lang, doc_id) order WITHOUT a
    * global single-partition window — the scalable zipWithIndex
    * idiom. A naive `row_number() OVER (ORDER BY ...)` funnels 100 TB
    * through one reducer (Spark itself warns "No Partition Defined
    * for Window"); instead: range-partition on the order key (order
    * slices stay contiguous across partitions), count rows per
    * partition (tiny driver-side offsets — one long per partition),
    * then local rank + partition offset. Two linear jobs, no
    * partition ever holds more than its slice. The range boundaries
    * come from Spark's deterministic sampler, and wherever they land
    * the ids are identical — only the slicing moves. (The local-rank
    * window declares hashpartitioning(pid), so the plan carries one
    * extra narrow 3-column exchange after the range partition — the
    * price of staying in pure DataFrame ops instead of mapPartitions;
    * both shuffles move only (lang, doc_id, pid).) The oracle IS the
    * naive global row_number, proving the sharded derivation exactly
    * equals it.
    */
  def globalIds(s: SparkSession, dir: String, partitions: Int = 32): DataFrame = {
    val base = Tables.documents(s, dir).select(col("lang"), col("doc_id"))
    val (ranked, _) =
      withShardedRank(base, "g1", partitions, Seq(col("lang"), col("doc_id")))
    ranked
      .select(col("doc_id"), col("lang"), (col("g1") - lit(1L)).as("global_id"))
      .orderBy(col("global_id"))
  }

  /** The sharded global-rank construction shared by [[globalIds]] and
    * [[quantileNorm]]: attach a 1-based dense global rank over
    * `orderCols` to `df` WITHOUT an unpartitioned window.
    * Range-partition on the order key (order slices stay contiguous
    * across partitions), count rows per partition (a partitions-sized
    * driver collect — one long per partition, model-scale by
    * construction), broadcast the prefix-sum offsets back, and add
    * local `row_number` + offset. Also returns the total row count
    * (the sum of the same per-partition counts — no extra job beyond
    * the counts pass). `orderCols` must be a total order (unique key
    * in the tail) for the rank to be well-defined.
    */
  private[operators] def withShardedRank(
      df: DataFrame, rankCol: String, partitions: Int,
      orderCols: Seq[org.apache.spark.sql.Column]): (DataFrame, Long) = {
    val s = df.sparkSession
    import s.implicits._
    val parted = df
      .repartitionByRange(partitions, orderCols: _*)
      .withColumn("_sr_pid", spark_partition_id())
    val counts = parted.groupBy(col("_sr_pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    val offsetOf = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
      .toSeq.toDF("_sr_pid", "_sr_offset")
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_sr_pid")).orderBy(orderCols: _*)
    val out = parted
      .withColumn("_sr_local", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsetOf), "_sr_pid")
      .withColumn(rankCol, col("_sr_offset") + col("_sr_local"))
      .drop("_sr_pid", "_sr_local", "_sr_offset")
    (out, total)
  }

  /** Fixed typo passage for [[spellPairs]]: five distance-1
    * misspellings of corpus words at low frequency, plus `costumer`
    * (distance 2 from `customer` — two substitutions) as the NEGATIVE
    * control: it must never pair, proving the bound is exact edit
    * distance, not similarity vibes. Word counts sit above the
    * `minFreq` floor and far below the true words' ~900, so every
    * planted pair clears the frequency-ratio direction test.
    */
  private[operators] val plantedTypoText: String =
    (Seq.fill(6)("tabl") ++ Seq.fill(5)("costumer") ++
      Seq.fill(5)("filtar") ++ Seq.fill(7)("streem") ++
      Seq.fill(6)("colum") ++ Seq.fill(5)("vecter")).mkString(" ")

  /** The documents table plus the planted-typo doc — built from the
    * same literal the oracle splices in, so both engines mine the
    * identical corpus.
    */
  def plantedTypoDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .unionByName(Seq((9000001L, plantedTypoText)).toDF("doc_id", "text"))
  }

  /** Spell-correction candidate mining (the SymSpell discipline):
    * find vocabulary pairs at edit distance EXACTLY 1 where one side
    * is ≥ `ratio`× more frequent — the frequent side is the
    * correction, the rare side the misspelling.
    *
    * Scale shape: never the V² all-pairs join. Each word emits its
    * DELETION NEIGHBORHOOD — itself plus every delete-one-char
    * variant, O(len) keys per word — and candidates come from ONE
    * equi-join on the shared key: any two words at distance ≤ 1
    * share a key by construction (substitution → both drop the
    * differing position; insert/delete → the shorter word IS one of
    * the longer's variants), so the blocking is lossless and the
    * exact `levenshtein == 1` verify runs only on hash collisions.
    * A shared key can also join distance-2 pairs (`ab`/`ba` both
    * emit `a` and `b`), which is exactly what the verify filter is
    * for. The oracle runs the NAIVE quadratic join over the same
    * bounded vocabulary — the blocked plan must reproduce it row for
    * row ([[TextAnalysisSpec]] additionally pins the planted pairs
    * and the distance-2 negative control).
    */
  def spellPairs(docs: DataFrame, minLen: Int = 4, maxLen: Int = 20,
                 minFreq: Int = 5, vocabSize: Int = 2000,
                 ratio: Int = 4, topK: Int = 50): DataFrame = {
    val vocab = docs
      .select(explode(wsTokens(lower(col("text")))).as("tok"))
      .filter(col("tok").rlike("^[a-z]+$") &&
        length(col("tok")).between(minLen, maxLen))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minFreq)
      .orderBy(col("n").desc, col("tok"))
      .limit(vocabSize)
      .select(col("tok").as("word"), col("n"))
    val keyed = vocab.select(col("word"), col("n"),
      explode(array_distinct(concat(
        array(col("word")),
        expr("transform(sequence(1, length(word)), i -> concat(substring(word, 1, i - 1), substring(word, i + 1)))"))))
        .as("key"))
    keyed.as("a").join(keyed.as("b"),
        col("a.key") === col("b.key") && col("a.word") < col("b.word"))
      .select(col("a.word").as("w1"), col("a.n").as("n1"),
        col("b.word").as("w2"), col("b.n").as("n2"))
      .distinct() // a pair can collide on several deletion keys
      .filter(levenshtein(col("w1"), col("w2")) === 1)
      .select(
        when(col("n1") <= col("n2"), col("w1")).otherwise(col("w2")).as("wrong_word"),
        when(col("n1") <= col("n2"), col("w2")).otherwise(col("w1")).as("right_word"),
        least(col("n1"), col("n2")).as("wrong_n"),
        greatest(col("n1"), col("n2")).as("right_n"))
      .filter(col("right_n") >= col("wrong_n") * ratio)
      .orderBy(col("right_n").desc, col("right_word"), col("wrong_word"))
      .limit(topK)
  }

  /** Driver query: spell-pair mining over [[plantedTypoDocs]]. */
  def spellPairsQuery(s: SparkSession, dir: String): DataFrame =
    spellPairs(plantedTypoDocs(s, dir))

  /** QUANTILE NORMALIZATION of quality scores across sources — the
    * rank-based calibration that makes heterogeneous-source scores
    * comparable before mixture sampling: a web domain whose scorer
    * runs hot and a curated source whose scorer runs cold land on the
    * same scale by mapping each document to the GLOBAL score
    * distribution's value at its WITHIN-SOURCE rank (the
    * microarray-normalization construction, applied to corpus
    * curation). Gating on the normalized score then takes the same
    * top fraction of every source instead of letting one source's
    * score inflation crowd out the rest.
    *
    * Determinism: per-doc quality is fixed to integer 1e-4ths BEFORE
    * any ranking (the [[sourceStats]] discipline — raw float sums
    * never order anything); within-source percentile is
    * `(r−1)·10⁶ DIV (n_s−1)` exact integer micro-units; the global
    * target position is integer-rounded from it; and the normalized
    * value is fetched by an exact integer join on that position.
    *
    * Scale: the within-source windows partition by source; the global
    * ranking IS the sharded [[withShardedRank]] construction shared
    * with [[globalIds]] (range-partition on the rank key +
    * per-partition broadcast offsets — spec-proven ≡ the naive
    * unpartitioned window, which never appears in this plan), the
    * corpus total rides in from the same partitions-sized counts
    * pass as a literal, and the position fetch stays an equi-join
    * against the same sharded rank relation.
    */
  def quantileNorm(s: SparkSession, dir: String): DataFrame = {
    val qi4 = floor(rawQuality * lit(10000.0) + lit(0.5)).cast("long")
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), qi4.as("q_i4"))
    val wSrc = Window.partitionBy(col("source")).orderBy(col("q_i4"), col("doc_id"))
    // staged before the sharded rank: its per-partition counts pass
    // would otherwise re-run the quality tokenization + source
    // windows a second time (the annSq materialize-before-fan-out
    // discipline — measured 2.05 s → 1.2 s at sf0.1)
    val withSrcRank = t
      .withColumn("r", row_number().over(wSrc).cast("long"))
      .withColumn("n_s", count(lit(1)).over(Window.partitionBy(col("source"))))
      .localCheckpoint(true)
    val (sharded, nTotal) =
      withShardedRank(withSrcRank, "g", 32, Seq(col("q_i4"), col("doc_id")))
    val ranked = sharded.withColumn("n_total", lit(nTotal))
    val pct = ranked
      .withColumn("pct_micro",
        when(col("n_s") > 1, expr("((r - 1) * 1000000L) DIV (n_s - 1)"))
          .otherwise(lit(500000L)))
      .withColumn("gpos",
        expr("1L + ((pct_micro * (n_total - 1) + 500000L) DIV 1000000L)"))
    val globalVals = pct.select(col("g").as("gpos"), col("q_i4").as("norm_i4"))
    pct.join(globalVals, "gpos")
      .select(col("doc_id"), col("source"),
        (col("q_i4").cast("double") / lit(10000.0)).as("quality"),
        col("pct_micro"),
        (col("norm_i4").cast("double") / lit(10000.0)).as("norm_quality"))
      .orderBy(col("doc_id"))
  }

  /** RAKE keyword extraction (Rose et al. 2010) at corpus scale:
    * candidate phrases are the maximal runs of non-stopword tokens
    * (the classic gaps-and-islands window — island id = pos −
    * row_number over surviving tokens), word statistics are
    * freq(w) = phrase instances containing w and degree(w) = Σ phrase
    * length over those instances, and a phrase scores
    * Σ_w degree(w)/freq(w). Words that mostly appear inside longer
    * multi-word phrases score high (high degree per occurrence), so
    * the top phrases are the corpus's load-bearing collocations — the
    * cheap unsupervised keyword signal a curation pipeline logs next
    * to TF-IDF.
    *
    * Determinism discipline: word scores are INTEGER floor-divisions
    * on the 1e-4 grid (`degree·10000 DIV freq`), phrase scores are
    * exact bigint sums of those, and the top-k cut orders by the
    * integer score with a phrase-text tiebreak — no float enters the
    * ordering; the emitted score is one division by 10⁴.
    *
    * Scale: tokenize+island is one window per doc (partitioned by
    * doc_id, never global); word stats and phrase stats are
    * map-side-combinable hash aggs on vocab-bounded keys; the scoring
    * join is phrase-words (≤ maxLen per phrase) against the
    * vocab-sized word-stat relation.
    */
  def keywords(s: SparkSession, dir: String,
               maxLen: Int = 4, topK: Int = 20): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+")).as(Seq("pos", "token")))
    val wIsl = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val phrases = toks
      .filter(col("token") =!= "" && !col("token").isInCollection(StopwordsEn))
      .withColumn("grp", col("pos") - row_number().over(wIsl))
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("token")))),
          x => x("token")), " ").as("phrase"),
        count(lit(1)).as("n_words"))
      .filter(col("n_words") <= maxLen)
    val wordStats = phrases
      .select(col("n_words"), explode(split(col("phrase"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(expr("sum(n_words) * 10000L DIV count(1)").as("wscore_i4"))
    val distinctPhrases = phrases
      .groupBy(col("phrase"), col("n_words"))
      .agg(count(lit(1)).as("n_occ"))
    distinctPhrases
      .select(col("phrase"), col("n_words"), col("n_occ"),
        explode(split(col("phrase"), " ")).as("word"))
      .join(wordStats, "word")
      .groupBy(col("phrase"), col("n_words"), col("n_occ"))
      .agg(sum(col("wscore_i4")).as("score_i4"))
      .orderBy(col("score_i4").desc, col("phrase"))
      .limit(topK)
      .select(col("phrase"), col("n_words"), col("n_occ"),
        (col("score_i4").cast("double") / lit(10000.0)).as("rake_score"))
  }

  /** DuckDB twin of [[spellPairsQuery]]: the NAIVE all-pairs
    * levenshtein join over the same bounded vocabulary — the oracle
    * deliberately runs the quadratic plan the Spark side exists to
    * avoid, proving the deletion-neighborhood blocking lossless.
    */
  def spellPairsOracleSql(minLen: Int = 4, maxLen: Int = 20,
                          minFreq: Int = 5, vocabSize: Int = 2000,
                          ratio: Int = 4, topK: Int = 50): String =
    s"""WITH docs AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT CAST(9000001 AS BIGINT), '$plantedTypoText'),
       |words AS MATERIALIZED (
       |  SELECT tok AS word, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok FROM docs)
       |  WHERE regexp_matches(tok, '^[a-z]+$$') AND length(tok) BETWEEN $minLen AND $maxLen
       |  GROUP BY tok HAVING count(*) >= $minFreq),
       |vocab AS MATERIALIZED (
       |  SELECT word, n FROM words ORDER BY n DESC, word LIMIT $vocabSize)
       |SELECT wrong_word, right_word, wrong_n, right_n FROM (
       |  SELECT CASE WHEN a.n <= b.n THEN a.word ELSE b.word END AS wrong_word,
       |         CASE WHEN a.n <= b.n THEN b.word ELSE a.word END AS right_word,
       |         least(a.n, b.n) AS wrong_n, greatest(a.n, b.n) AS right_n
       |  FROM vocab a JOIN vocab b
       |    ON a.word < b.word AND levenshtein(a.word, b.word) = 1)
       |WHERE right_n >= $ratio * wrong_n
       |ORDER BY right_n DESC, right_word, wrong_word LIMIT $topK""".stripMargin

  /** N-GRAM NOVELTY scoring — the memorization/overlap audit: for each
    * document, the fraction of its DISTINCT word trigrams that occur in
    * no other document. Low novelty = the document is assembled from
    * corpus-common phrasing (boilerplate, near-dup tail); high novelty =
    * genuinely new text. The same statistic, run against a held-out
    * eval set instead of the corpus, is the memorization probe.
    *
    * Scale: explode to (doc, distinct-trigram), one hash agg counting
    * document frequency per trigram (map-side combine; shuffle volume
    * is the distinct-shingle table, same cost class as the inverted
    * index), one join back, one count-if agg per doc. The ratio divides
    * two exact integers, so both engines produce the identical double
    * before the 1e-4 rounding.
    */
  def novelty(s: SparkSession, dir: String): DataFrame = {
    // tokenize ONCE into a projected column — a lambda that re-split
    // the text per trigram would be O(tokens²) regex work per doc
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), wsTokens(col("text")).as("tks"))
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, greatest(size(tks) - 3, 0)), " +
          "i -> concat_ws(' ', slice(tks, i + 1, 3)))"))).as("gram"))
    // a doc shorter than 3 tokens contributes its full (short) prefix
    // once; harmless for the df count and keeps the relation non-empty.
    // (doc_id, gram) is distinct per doc, so count(*) IS the document
    // frequency — and a df=1 gram's min(doc_id) IS its only owner, so
    // the per-doc novel count needs NO join back through the corpus-
    // sized gram relation: one gram-keyed agg + two narrow doc-keyed
    // aggs + a doc-doc join.
    val perGram = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("doc_id"))
    val novelPerDoc = perGram.filter(col("df") === 1L)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    val totalPerDoc = grams.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"))
    totalPerDoc.join(novelPerDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        rnd4(col("n_novel").cast("double") / col("n_grams").cast("double"))
          .as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** TEMPERATURE-SCALED language mixture (the multilingual-sampling
    * recipe of XLM-R / multilingual NMT): resampling weights
    * `p_temp ∝ p_raw^α` with α = 0.5 — square-root sampling, which
    * upsamples low-resource languages without letting them dominate.
    * Emits per-language token shares, the reweighted sampling
    * probability, the upsample factor, and the expected document count
    * under a 10k-document budget.
    *
    * Determinism: α is fixed at 0.5 BECAUSE IEEE-754 `sqrt` is
    * correctly rounded (unlike `pow`, which may differ by an ulp
    * between engines): the raw share is first fixed to integer
    * micro-units, `sqrt` of that exact value is bit-identical on both
    * engines, the result is re-fixed to micros, and the normalizing
    * sum is then EXACT INTEGER math — no float summation order
    * anywhere.
    *
    * Scale: one hash agg on `lang` (a tiny keyspace) + a broadcast
    * singleton total — the same shape as [[sourceStats]]; scan-bound
    * at any corpus size.
    */
  def mixTemperature(s: SparkSession, dir: String): DataFrame = {
    val perLang = Tables.documents(s, dir)
      .select(col("lang"), size(wsTokens(col("text"))).cast("long").as("n_toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val total = perLang.agg(sum(col("n_tokens")).as("total_tokens"))
    val withQ = perLang.crossJoin(broadcast(total))
      .withColumn("q", floor(col("n_tokens").cast("double") * lit(1000000.0) /
        col("total_tokens").cast("double") + lit(0.5)).cast("long"))
      .withColumn("sroot", floor(sqrt(col("q").cast("double") / lit(1000000.0)) *
        lit(1000000.0) + lit(0.5)).cast("long"))
    val sTotal = withQ.agg(sum(col("sroot")).as("s_total"))
    withQ.crossJoin(broadcast(sTotal))
      .select(
        col("lang"), col("n_docs"), col("n_tokens"),
        (floor(col("q").cast("double") / lit(100.0) + lit(0.5)) / lit(10000.0))
          .as("p_raw"),
        (floor(col("sroot").cast("double") / col("s_total").cast("double") *
          lit(10000.0) + lit(0.5)) / lit(10000.0)).as("p_temp"),
        (floor(col("sroot").cast("double") / col("s_total").cast("double") /
          (col("q").cast("double") / lit(1000000.0)) * lit(10000.0) + lit(0.5)) /
          lit(10000.0)).as("upsample"),
        floor(col("sroot").cast("double") / col("s_total").cast("double") *
          lit(10000.0) + lit(0.5)).cast("long").as("docs_per_10k"))
      .orderBy(col("lang"))
  }

  /** Gopher-style RULE-BASED quality filter (Rae et al. 2021 §A1.1) —
    * the published boolean pre-filter battery, distinct from the scalar
    * [[qualityScore]]: word-count bounds, mean-word-length bounds,
    * symbol-to-word ratio, alphabetic-word ratio, a stopword-presence
    * requirement, and a duplicate-bigram cap. Emits every per-rule
    * verdict (so a curator can see WHICH rule killed a document), the
    * failed-rule count, and the final keep flag.
    *
    * Determinism: every threshold is evaluated in cross-multiplied
    * INTEGER arithmetic (e.g. `symbols * 10 <= n_words` instead of
    * `symbols / n_words <= 0.1`) — there is no float anywhere, so no
    * engine can disagree at a boundary.
    *
    * Scale: one map stage over (doc_id, text); counts come from
    * higher-order array functions inside whole-stage codegen, the only
    * shuffle is the output sort. At 100 TB this is scan-bound, which is
    * the entire point of running the rule battery BEFORE dedup and
    * embedding stages.
    */
  def gopherRules(s: SparkSession, dir: String,
                  minWords: Long = 20L, maxWords: Long = 80L): DataFrame = {
    val stopArr = array(StopwordsEn.map(lit): _*)
    val counts = Tables.documents(s, dir)
      .select(col("doc_id"), wsTokens(col("text")).as("tks"), col("text"))
      .select(
        col("doc_id"),
        size(col("tks")).cast("long").as("n_words"),
        expr("aggregate(tks, 0L, (a, t) -> a + CAST(length(t) AS LONG))")
          .as("word_chars"),
        size(expr("filter(tks, t -> t rlike '[A-Za-z]')")).cast("long")
          .as("alpha_words"),
        regexp_count(col("text"), lit("[#]|\\.\\.\\.")).cast("long").as("symbols"),
        size(array_intersect(array_distinct(col("tks")), stopArr)).cast("long")
          .as("stop_distinct"),
        when(size(col("tks")) >= 2,
          size(array_distinct(expr(
            "transform(sequence(0, size(tks) - 2), i -> concat(tks[i], ' ', tks[i + 1]))"))))
          .otherwise(lit(0)).cast("long").as("distinct_bigrams"))
    val rules = counts.select(
      col("doc_id"), col("n_words"),
      (col("n_words") >= minWords && col("n_words") <= maxWords).as("r_word_count"),
      (col("word_chars") >= lit(3L) * col("n_words") &&
        col("word_chars") <= lit(10L) * col("n_words")).as("r_mean_word_len"),
      (col("symbols") * lit(10L) <= col("n_words")).as("r_symbol_ratio"),
      (col("alpha_words") * lit(10L) >= col("n_words") * lit(8L)).as("r_alpha_words"),
      (col("stop_distinct") >= lit(2L)).as("r_stopwords"),
      (col("distinct_bigrams") * lit(2L) >= greatest(col("n_words") - lit(1L), lit(0L)))
        .as("r_dup_bigram"))
    val ruleCols = Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
      "r_alpha_words", "r_stopwords", "r_dup_bigram")
    rules
      .withColumn("n_failed",
        ruleCols.map(r => when(col(r), lit(0L)).otherwise(lit(1L))).reduce(_ + _))
      .withColumn("keep", ruleCols.map(col).reduce(_ && _))
      .orderBy(col("doc_id"))
  }

  /** Zipf-law fit of the token frequency distribution — the classic
    * corpus-health diagnostic: natural language has log(freq) ≈
    * a + s·log(rank) with s ≈ −1, and a corpus whose slope or fit
    * departs hard from that (template spam, generated filler, OCR
    * noise) earns a second look before training. One vocabulary
    * aggregation (map-side combinable, vocab-bounded), then the top N
    * tokens via `orderBy(desc).limit(topN)` — TakeOrderedAndProject,
    * per-partition top-k heaps, so a 10⁹-token web vocabulary never
    * sorts in one partition (the `q10_sort_limit`/`txt_wsample`
    * shape). Ranks over the bounded-topN result come from ONE
    * single-row `sort_array(collect_list(struct))` aggregate +
    * `posexplode` — no window operator anywhere in the plan (an
    * unpartitioned rank window here, even over N rows, is the exact
    * shape this construction exists to kill). The OLS closed form
    * folds over the same bounded array with `aggregate`/`zip_with`
    * HOFs, so the corpus is scanned exactly once.
    * Slope and R² ride every emitted row (the q39 psi_total
    * discipline) so the driver compare certifies the fit, not just
    * the head of the distribution.
    */
  def zipfFit(s: SparkSession, dir: String,
              topN: Int = 200, show: Int = 20): DataFrame =
    zipfFitFrom(Tables.documents(s, dir), topN, show)

  /** [[zipfFit]] over any (doc_id, text) frame — spec entry point. */
  def zipfFitFrom(docs: DataFrame, topN: Int, show: Int): DataFrame = {
    val freq = docs
      .select(explode(wsTokens(lower(col("text")))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
    // TakeOrderedAndProject: only topN-sized heaps cross the network.
    val top = freq.orderBy(col("freq").desc, col("token")).limit(topN)
    // Rank WITHOUT a window: struct field order (-freq, token) makes
    // sort_array ascending ≡ (freq desc, token asc); posexplode's
    // position is rank-1. The OLS sums fold over the SAME bounded
    // array (rank = index+1 inside transform), so the corpus is
    // scanned exactly once and the plan has no window, no crossJoin,
    // and no second aggregate lineage.
    val fitted = top
      .agg(sort_array(collect_list(struct(
        (-col("freq")).as("nf"), col("token").as("token"),
        col("freq").as("freq")))).as("arr"))
      .withColumn("xs",
        expr("transform(arr, (p, i) -> ln(cast(i + 1 as double)))"))
      .withColumn("ys",
        expr("transform(arr, p -> ln(cast(p.freq as double)))"))
      .withColumn("g_n", size(col("arr")).cast("double"))
      .withColumn("g_sx",
        expr("aggregate(xs, cast(0 as double), (a, v) -> a + v)"))
      .withColumn("g_sy",
        expr("aggregate(ys, cast(0 as double), (a, v) -> a + v)"))
      .withColumn("g_sxy",
        expr("aggregate(zip_with(xs, ys, (x, y) -> x * y), cast(0 as double), (a, v) -> a + v)"))
      .withColumn("g_sxx",
        expr("aggregate(xs, cast(0 as double), (a, v) -> a + v * v)"))
      .withColumn("g_syy",
        expr("aggregate(ys, cast(0 as double), (a, v) -> a + v * v)"))
      .withColumn("cov_xy", col("g_sxy") - col("g_sx") * col("g_sy") / col("g_n"))
      .withColumn("var_x", col("g_sxx") - col("g_sx") * col("g_sx") / col("g_n"))
      .withColumn("var_y", col("g_syy") - col("g_sy") * col("g_sy") / col("g_n"))
      .select(col("cov_xy"), col("var_x"), col("var_y"),
        posexplode(col("arr")).as(Seq("pos", "p")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("p.token").as("token"), col("p.freq").as("freq"),
        col("cov_xy"), col("var_x"), col("var_y"))
    fitted
      .filter(col("rank") <= show)
      .select(col("rank"), col("token"), col("freq"),
        rnd4(col("cov_xy") / col("var_x")).as("zipf_slope"),
        rnd4(col("cov_xy") * col("cov_xy") / (col("var_x") * col("var_y")))
          .as("zipf_r2"))
      .orderBy(col("rank"))
  }

  /** Weighted sampling without replacement, probability proportional
    * to size (PPS): the exponential-clock formulation of
    * Efraimidis–Spirakis A-ES — each doc draws an exponential arrival
    * time `-ln(u)/w` (weight w = `n_chars`, so long documents win
    * proportionally more often) and the k EARLIEST arrivals form the
    * sample. The uniform u is hash-derived (md5 of the doc id, the
    * same discipline as [[splitCounts]]), never `rand()`: the sample
    * is identical under reruns, re-partitioning and incremental
    * ingest, which is what makes a 100 TB curation run auditable.
    * The plan is a pure map stage feeding TakeOrderedAndProject —
    * each partition keeps its local k, only k-row heaps cross the
    * network, nothing shuffles corpus-sized. The arrival key is
    * floored to an integer at 1e12 (with doc_id tie-break) so the
    * cross-engine cutoff is deterministic per the CrossEngine
    * discipline.
    */
  def weightedSample(s: SparkSession, dir: String, k: Int = 200): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double")
    val u = (h + lit(0.5)) / lit(4294967296.0)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        floor((-log(u) / col("n_chars").cast("double")) * lit(1.0e12))
          .cast("long").as("key_micro"))
      .orderBy(col("key_micro"), col("doc_id"))
      .limit(k)
  }

  /** Exact integer floor division (`Math.floorDiv` semantics) — the
    * `pmod` construction from the bootstrap fix: subtracting the
    * positive remainder makes the numerator an exact multiple of `b`,
    * so the division is exact and truncation equals floor for
    * negative numerators too. Magnitude contract: |a| < 2^53 (every
    * caller's operands are integer micros of bounded stats), so the
    * double division is exact, not just deterministic.
    */
  private def floorDivExact(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** ITERATIVELY-TRAINED quality classifier — the CCNet/fastText
    * shape (train a linear model on cheap per-doc signals, score the
    * corpus with it) as a certified distributed trainer: full-batch
    * subgradient descent on the linear-SVM hinge loss, every step in
    * exact fixed-point integer arithmetic so the whole training RUN —
    * not just the final scores — replays bitwise in the DuckDB
    * oracle (the reproducible-model discipline that certified the
    * k-means/PQ families, applied to gradient descent).
    *
    * Task: recover a PLANTED linear concept over three per-doc
    * quality signals (stopword ratio, distinct-token ratio, length
    * factor — integer 1e-4 fixed-point). Planted-concept recovery is
    * this repo's standard trainer certification (recall_planted, the
    * ER corruption): the deliverable is the LEARNER, and the output
    * trace proves it learns — accuracy climbs from 0 (all-zero
    * weights score margin 0 = wrong) to ≥0.9 against a ~0.5 majority
    * class in `iters`=6 epochs at every SF.
    *
    * Determinism: features are STANDARDIZED in fixed point — centered
    * by `n·f − Σf` (exact integers) and scaled by
    * `floor(sqrt(n·Σf² − (Σf)²))` (IEEE sqrt of the same integer on
    * both engines) via [[floorDivExact]] — without which the
    * raw-feature conditioning (stop_ratio std ≈ 0.04 vs length ≈
    * 0.28) stalls batch descent at the majority class. Weights live
    * in integer micros; the hinge margin `y·⟨w,x⟩` is a pure BIGINT
    * expression; the per-epoch update is
    * `w += floorDiv(η·Σ_{margin<1} y·x, n)` with η fixed at
    * `etaNum`/100 = 4.
    *
    * Scale shape: the canonical distributed full-batch trainer. The
    * feature pass is one scan (cached across epochs — at 100 TB
    * you'd checkpoint it); each epoch is one scan producing d+2 = 6
    * map-side-combinable integer partial sums (the shuffle moves
    * 6 longs per partition); the updated weight vector returns to the
    * executors as plan literals, the broadcast-model pattern. Driver
    * collects are 7-long stat rows — model-scale, never data-scale.
    *
    * Output: one row per epoch — violation count and accuracy under
    * the PRE-update weights, then the POST-update weights (micros
    * rendered as doubles at 1e-6, same integer → same double on both
    * engines).
    */
  def svmClassifier(s: SparkSession, dir: String,
                    iters: Int = 6, etaNum: Long = 400L): DataFrame = {
    val (feat, _, trace) = trainSvm(s, dir, iters, etaNum)
    feat.unpersist()
    val sp = s
    import sp.implicits._
    trace.toDF("iter", "n_viol", "acc", "w0", "w1", "w2", "w3")
      .orderBy(col("iter"))
  }

  /** The train→score→filter pipeline completed: run the
    * [[svmClassifier]] training loop, then ONE more corpus scan
    * applies the final weights to every document — the actual
    * quality-filter step a curation run executes. Per doc: the raw
    * margin as a score (fixed-point 1e-10 → double), the model's
    * keep/drop call, the planted label, and whether they agree. Same
    * exact-integer discipline throughout, so the per-doc scores — not
    * just the training trace — replay bitwise in the oracle.
    */
  def svmScores(s: SparkSession, dir: String,
                iters: Int = 6, etaNum: Long = 400L): DataFrame = {
    val (feat, w, _) = trainSvm(s, dir, iters, etaNum)
    // unpersist BEFORE building the output: the scoring plan
    // recomputes the feature map stage once from source (pure
    // scan-bound map — the right trade vs holding corpus-sized cache
    // past the operator's lifetime)
    feat.unpersist()
    val m = lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
    feat.select(col("doc_id"),
        (m.cast("double") / lit(1.0e10)).as("score"),
        when(m > 0, 1L).otherwise(-1L).as("keep"),
        col("y").as("label"))
      .withColumn("agree", col("keep") === col("label"))
      .orderBy(col("doc_id"))
  }

  /** CALIBRATION / reliability table for the trained quality
    * classifier — the third model-evaluation harness (retrieval has
    * `txt_ndcg`, regression `q59_cv_ols`, clustering
    * `vec_silhouette`): margins from the SAME certified training run
    * as [[svmScores]] bucket into `bins` equi-width cells, and each
    * cell reports its observed positive-label rate next to its score
    * range — the table behind a reliability diagram, and the evidence
    * for whether a margin threshold shift would trade precision for
    * recall predictably. A well-ranked model shows pos_rate
    * monotone in bin; the spec pins top-vs-bottom separation.
    *
    * All exact: margins are the trainer's BIGINTs, the bin law is
    * `min(bins−1, (m−mn)·bins DIV (mx−mn+1))` on non-negative
    * operands, rates are integer floorDivs, and the score-range
    * columns divide exact longs once before the rnd4 floor — the
    * whole table hashes. One extra corpus scan over the feature map
    * beyond training (the svmScores cost shape).
    */
  def svmCalibration(s: SparkSession, dir: String,
                     iters: Int = 6, etaNum: Long = 400L,
                     bins: Int = 10): DataFrame = {
    val (feat, w, _) = trainSvm(s, dir, iters, etaNum)
    val m = lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
    // materialize the 1-row margin extrema WHILE feat is persisted
    // (review finding: aggregating after unpersist re-ran the whole
    // feature pipeline, doubling the documented one-extra-scan cost);
    // the bounds then re-enter the plan as literals
    val ext = feat.select(m.as("m")).agg(min(col("m")), max(col("m"))).head()
    val (mn, mx) = (ext.getLong(0), ext.getLong(1))
    feat.unpersist()
    val scored = feat.select(m.as("m"), col("y"))
    scored
      .withColumn("bin", least(lit((bins - 1).toLong),
        expr(s"((m - ${mn}L) * ${bins}L) DIV (${mx}L - ${mn}L + 1L)")).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        rnd4(min(col("m")).cast("double") / lit(1.0e10)).as("lo_score"),
        rnd4(max(col("m")).cast("double") / lit(1.0e10)).as("hi_score"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("m") > 0L, 1L).otherwise(0L)).as("n_pred_pos"))
      .withColumn("pos_rate_1e4", expr("(n_pos * 10000L) DIV n_docs"))
      .select(col("bin"), col("n_docs"), col("lo_score"), col("hi_score"),
        col("n_pos"), col("n_pred_pos"), col("pos_rate_1e4"))
      .orderBy(col("bin"))
  }

  /** Shared trainer behind [[svmClassifier]] / [[svmScores]]: builds
    * the standardized fixed-point feature frame (persisted — caller
    * unpersists), runs `iters` full-batch epochs, and returns the
    * frame, the final weight micros and the per-epoch trace.
    */
  private def trainSvm(s: SparkSession, dir: String, iters: Int,
                       etaNum: Long): (DataFrame, Array[Long],
                         Seq[(Long, Long, Double, Double, Double, Double, Double)]) = {
    val toks = wsTokens(col("text"))
    val nToks = size(toks).cast("double")
    val stopHits = size(expr(
      s"filter(split(trim(text), '\\\\s+'), t -> t in (${StopwordsEn.map("'" + _ + "'").mkString(",")}))"))
      .cast("double")
    val f1 = floor(stopHits / nToks * lit(10000.0) + lit(0.5)).cast("long")
    val f2 = floor(size(array_distinct(toks)).cast("double") / nToks *
      lit(10000.0) + lit(0.5)).cast("long")
    val f3 = floor(least(nToks / lit(64.0), lit(1.0)) * lit(10000.0) +
      lit(0.5)).cast("long")
    val labeled = Tables.documents(s, dir)
      .select(col("doc_id"), f1.as("f1"), f2.as("f2"), f3.as("f3"))
      .withColumn("y", when(lit(20L) * col("f1") + lit(5L) * col("f2") +
        lit(3L) * col("f3") > lit(60000L), 1L).otherwise(-1L))
    // standardization stats: exact integer sums (order-free), one scan
    val st = labeled.agg(
      count(lit(1)).as("n"),
      sum(col("f1")).as("s1"), sum(col("f1") * col("f1")).as("q1"),
      sum(col("f2")).as("s2"), sum(col("f2") * col("f2")).as("q2"),
      sum(col("f3")).as("s3"), sum(col("f3") * col("f3")).as("q3"))
      .head() // model-scale collect: 7 longs
    val n = st.getAs[Long]("n")
    def sdOf(sIdx: Int, qIdx: Int): Long =
      math.max(math.floor(math.sqrt(
        (n * st.getAs[Long](qIdx) - st.getAs[Long](sIdx) * st.getAs[Long](sIdx))
          .toDouble)).toLong, 1L)
    val (sd1, sd2, sd3) = (sdOf(1, 2), sdOf(3, 4), sdOf(5, 6))
    def z(f: String, sSum: Long, sd: Long): Column =
      floorDivExact((lit(n) * col(f) - lit(sSum)) * lit(10000L), lit(sd))
    val feat = labeled.select(col("doc_id"), col("y"), lit(10000L).as("x0"),
      z("f1", st.getAs[Long]("s1"), sd1).as("x1"),
      z("f2", st.getAs[Long]("s2"), sd2).as("x2"),
      z("f3", st.getAs[Long]("s3"), sd3).as("x3"))
      .persist()
    val w = Array(0L, 0L, 0L, 0L)
    val trace = (1 to iters).map { t =>
      val m = col("y") * (lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
        lit(w(2)) * col("x2") + lit(w(3)) * col("x3"))
      val viol = m < lit(10000000000L) // hinge margin 1.0 at 1e-10 scale
      val r = feat.agg(
        sum(when(viol, 1L).otherwise(0L)).as("nv"),
        sum(when(m > 0, 1L).otherwise(0L)).as("nc"),
        sum(when(viol, col("y") * col("x0")).otherwise(0L)).as("g0"),
        sum(when(viol, col("y") * col("x1")).otherwise(0L)).as("g1"),
        sum(when(viol, col("y") * col("x2")).otherwise(0L)).as("g2"),
        sum(when(viol, col("y") * col("x3")).otherwise(0L)).as("g3"))
        .head() // model-scale collect: 6 longs per epoch
      for (j <- 0 to 3)
        w(j) = w(j) + Math.floorDiv(etaNum * r.getAs[Long](s"g$j"), n)
      (t.toLong, r.getAs[Long]("nv"),
        Math.floorDiv(r.getAs[Long]("nc") * 10000L, n) / 10000.0,
        w(0) / 1.0e6, w(1) / 1.0e6, w(2) / 1.0e6, w(3) / 1.0e6)
    }
    (feat, w, trace)
  }

}
