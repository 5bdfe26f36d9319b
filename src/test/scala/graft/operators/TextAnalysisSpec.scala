package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint is invariant to case and whitespace layout") {
    val df = Seq(
      "Hello   world",
      "hello world",
      " HELLO\tWORLD \n"
    ).toDF("text").select(TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(df.distinct().count() === 1)
  }

  test("fingerprint separates different content") {
    val df = Seq("alpha beta", "alpha gamma").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(df.distinct().count() === 2)
  }

  test("exact dedup groups planted duplicates under min doc_id") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "THE  QUICK  BROWN  FOX"), // dup of 1 after normalization
      (3L, "something else entirely"),
      (4L, "the quick brown fox")     // dup of 1 verbatim
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("planted")
    val out = docs
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")
      .collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("keep_id") === 1L)
    assert(out(0).getAs[Long]("n_copies") === 3L)
    assert(out(1).getAs[Long]("keep_id") === 3L)
  }

  test("dsir weights pull target-domain-like docs above off-domain ones") {
    // Target (en) docs share the bigram vocabulary "alpha beta gamma";
    // off-domain docs live on "omega psi chi". Two probe docs in a
    // THIRD lang (neither boosts the target counts) — the one written
    // in the target's bigram vocabulary must get the higher weight.
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", "en"),
      (2L, "beta gamma alpha beta gamma", "en"),
      (3L, "omega psi chi omega psi", "de"),
      (4L, "psi chi omega psi chi", "de"),
      (10L, "alpha beta gamma alpha", "xx"), // target-like probe
      (11L, "omega psi chi omega", "xx")     // off-domain probe
    ).toDF("doc_id", "text", "lang")
    val w = TextAnalysis.dsirWeights(docs, targetLang = "en", buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("logw_per_bigram")).toMap
    assert(w(10L) > w(11L),
      s"target-like probe ${w(10L)} must outrank off-domain probe ${w(11L)}")
    // and the raw target docs themselves score above the off-domain set
    assert(Seq(1L, 2L).map(w).min > Seq(3L, 4L).map(w).max)
  }

  test("dsir drops docs with no bigram evidence instead of guessing") {
    val docs = Seq(
      (1L, "alpha beta", "en"),
      (2L, "single", "en") // one token → no bigrams → no row
    ).toDF("doc_id", "text", "lang")
    val ids = TextAnalysis.dsirWeights(docs).collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L))
  }

  test("langid picks script/diacritic tiers before defaulting to en") {
    val docs = Seq(
      (1L, "plain english text", "en"),
      (2L, "texte français avec é", "fr"),
      (3L, "deutscher text mit ü", "de"),
      (4L, "texto español con ñ", "es"),
      (5L, "中文文本", "zh")
    ).toDF("doc_id", "text", "lang")
    val predicted = docs.select(
      col("lang"),
      when(regexp_count(col("text"), lit("[\\x{4e00}-\\x{9fff}]")) > 0, "zh")
        .when(regexp_count(col("text"), lit("[äöüß]")) > 0, "de")
        .when(regexp_count(col("text"), lit("[éèêàçœ]")) > 0, "fr")
        .when(regexp_count(col("text"), lit("[ñáíóú¿¡]")) > 0, "es")
        .otherwise("en").as("predicted"))
      .collect()
    predicted.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("decontaminate flags the planted eval docs against their sources") {
    val out = TextAnalysis.decontaminate(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 5)
    out.foreach { r =>
      val evalId = r.getAs[Long]("eval_id")
      // best match is the unmutated source document
      assert(r.getAs[Long]("train_doc_id") === evalId - 1000000L)
      // 'xq ' prefix adds one token: shared shingles (L-2) of (L-1)
      assert(r.getAs[Double]("containment") > 0.8)
      assert(r.getAs[Boolean]("contaminated"))
    }
  }

  test("decontaminate containment stays below 1 (the prefix shingle is novel)") {
    val out = TextAnalysis.decontaminate(spark, "/root/testdata/sf0.001").collect()
    out.foreach(r => assert(r.getAs[Double]("containment") < 1.0))
  }

  test("bm25 favors short docs with both terms, weights rare terms, drops non-matches") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple apple apple"),
      (3L, "dog egg fig"),
      (4L, "apple banana")
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "apple banana")).toDF("query_id", "query_text")
    val out = TextAnalysis.bm25(docs, queries, topK = 10).collect()
    val ranked = out.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id")).toSeq
    // doc 4 (both terms, shortest) > doc 1 (both terms, longer) >
    // doc 2 (only the common term, tf-saturated); doc 3 matches nothing
    assert(ranked === Seq(4L, 1L, 2L))
    val scores = out.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a > b })
  }

  test("repetition computes duplicate-token and top-bigram fractions") {
    val docs = Seq(
      (1L, "a a a b"),        // dup_token_frac 1 - 2/4 = .5; top bigram "a a" x2 of 3 slots
      (2L, "w x y z"),        // no repetition
      (3L, "solo")            // 1 token: zero bigram slots
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionOf(docs).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Double]("dup_token_frac") === 0.5)
    assert(byId(1L).getAs[Long]("top_bigram_n") === 2L)
    assert(byId(1L).getAs[Double]("top_bigram_frac") === 0.6667)
    assert(byId(2L).getAs[Double]("dup_token_frac") === 0.0)
    assert(byId(2L).getAs[Long]("top_bigram_n") === 1L)
    assert(byId(3L).getAs[Long]("top_bigram_n") === 0L)
    assert(byId(3L).getAs[Double]("top_bigram_frac") === 0.0)
  }

  test("sequence packing chunks shards at the token budget, conserving docs and tokens") {
    // single shard (shards=1) with 5 docs of 300 tokens each, budget
    // 512: doc starts at cumulative 0,300,600,900,1200 → seqs 0,0,1,1,2
    val text = Seq.fill(300)("tok").mkString(" ")
    val docs = (0L until 5L).map(i => (i, text)).toDF("doc_id", "text")
    val out = TextAnalysis.packSequencesOf(docs, maxTokens = 512, shards = 1)
      .collect().sortBy(_.getAs[Long]("seq_id"))
    assert(out.map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_tokens"))).toSeq ===
      Seq((0L, 2L, 600L), (1L, 2L, 600L), (2L, 1L, 300L)))
    // conservation: every doc and every token lands in exactly one seq
    assert(out.map(_.getAs[Long]("n_docs")).sum === 5L)
    assert(out.map(_.getAs[Long]("n_tokens")).sum === 1500L)
  }

  test("curation funnel stages are monotone and anchored at the corpus size") {
    val dir = "/root/testdata/sf0.001"
    val out = TextAnalysis.curationFunnel(spark, dir).collect()
    assert(out.map(_.getAs[String]("stage_name")).toSeq ===
      Seq("ingest", "quality", "lang_agreement", "dedup_keeper", "train_split"))
    val counts = out.map(_.getAs[Long]("n_docs"))
    assert(counts.head === graft.Tables.documents(spark, dir).count())
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a }) // each stage filters
    assert(counts.last > 0) // something survives end-to-end
  }

  test("bm25 driver query has 3 full result sets with positive descending scores") {
    val out = TextAnalysis.bm25TopK(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 15) // 3 queries x top-5
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet === Set(0L, 1L, 2L))
    byQuery.values.foreach { rows =>
      val ranked = rows.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq === (1L to 5L))
      val scores = ranked.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(_ > 0.0))
    }
  }

  test("stratified sample is deterministic, honors per-lang rates, and certifies membership") {
    val dir = "/root/testdata/sf0.001"
    val a = TextAnalysis.stratifiedSample(spark, dir).collect()
    val b = TextAnalysis.stratifiedSample(spark, dir).collect()
    assert(a.toSeq === b.toSeq) // rerun-stable, not random
    val byLang = a.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2)))).toMap
    // en keeps ~90%, fr (default) ~25% — exact counts are oracle-pinned,
    // here just the ordering of aggressiveness
    val (enTotal, enKept) = byLang("en")
    val (frTotal, frKept) = byLang("fr")
    assert(enKept.toDouble / enTotal > frKept.toDouble / frTotal)
    assert(a.forall(r => r.getLong(2) <= r.getLong(1)))
  }

  test("cdc dedup finds the planted boilerplate in all ten docs despite shifted offsets") {
    val out = TextAnalysis.cdcDedup(spark, "/root/testdata/sf0.001").collect()
    // the passage has three interior boundary tokens -> two interior
    // chunks shared verbatim by the ten planted docs
    val planted = out.filter(r => r.getLong(1) === 10L && r.getLong(4) === 0L)
    assert(planted.length >= 2, s"boilerplate chunks missing: ${out.take(5).mkString(";")}")
    // each spans every planted doc exactly once
    planted.foreach(r => assert(r.getLong(2) === 10L))
  }

  test("cdc chunk boundaries are content-defined: chunks cover all tokens exactly once") {
    val docs = TextAnalysis.plantedBoilerplateDocs(spark, "/root/testdata/sf0.001")
    val totalTokens = docs
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    // re-run the chunker's internal shape: sum of chunk n_tokens over
    // ALL chunks (not just repeated ones) must equal the token count
    val tok = docs.select(col("doc_id"),
      posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "token")))
    val isBoundary = (conv(substring(md5(col("token")), 1, 4), 16, 10)
      .cast("long") % 16 === 0).cast("int")
    val runW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val chunkTokens = tok.withColumn("chunk_id", sum(isBoundary).over(runW))
      .groupBy(col("doc_id"), col("chunk_id")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(chunkTokens === totalTokens)
  }

  test("sentence dedup keeps a shared sentence only in its first document") {
    val docs = Seq(
      (1L, "unique one. shared banner text. tail one"),
      (2L, "shared banner text. unique two"),
      (3L, "unique three. shared banner text. shared banner text")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.sentenceDedupOn(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_sentences") === 3 && out(1L).getAs[Long]("n_kept") === 3)
    // doc 2 loses the banner (first seen in doc 1)
    assert(out(2L).getAs[Long]("n_sentences") === 2 && out(2L).getAs[Long]("n_kept") === 1)
    // doc 3 loses BOTH banner copies (cross-doc AND in-doc repeat)
    assert(out(3L).getAs[Long]("n_kept") === 1)
  }

  test("sentence dedup reassembles surviving spans in original order") {
    val docs = Seq(
      (1L, "b span. z span"),
      (2L, "a keep. b span. c keep")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.sentenceDedupOn(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("kept_fp")).toMap
    // doc 2 keeps "a keep" and "c keep" IN THAT ORDER (not sorted by text)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("a keep.c keep".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(2L) === expected)
  }

  test("sentence dedup emits null fingerprint for a fully-deduped document") {
    val docs = Seq((1L, "only sentence"), (2L, "only sentence")).toDF("doc_id", "text")
    val out = TextAnalysis.sentenceDedupOn(docs).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("kept_fp"))).toMap
    assert(out(1L).isDefined && out(2L).isEmpty)
  }

  test("source stats partition the corpus and the gate is exactly the declared predicate") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sfDir)
    val out = TextAnalysis.sourceStats(spark, sfDir).collect()
    assert(out.map(_.getString(0)).distinct.length === out.length)
    assert(out.map(_.getLong(1)).sum === docs.count(), "n_docs must tile the corpus")
    out.foreach { r =>
      val (q, dup, keep) = (r.getDouble(3), r.getDouble(4), r.getBoolean(5))
      assert(q >= 0.0 && q <= 1.0 && dup >= 0.0 && dup <= 1.0)
      assert(keep === (q >= 0.61 && dup <= 0.2), s"gate mismatch on ${r.getString(0)}")
    }
  }

  test("bpe pair counts equal a brute-force recount of the same vocabulary") {
    val sfDir = "/root/testdata/sf0.001"
    val words = graft.Tables.documents(spark, sfDir)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .collect().map(_.getString(0)).filter(_.matches("^[a-z]+$"))
    val brute = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
      .toSeq.flatMap { case (w, n) =>
        w.sliding(2).filter(_.length == 2).toSeq.distinct.map(p => (p, n, w))
      }
      .groupBy(_._1)
      .map { case (p, xs) =>
        // a pair repeated inside one word counts once per position
        val occ = xs.map { case (_, n, w) =>
          n * w.sliding(2).count(_ == p)
        }.sum
        p -> ((occ, xs.map(_._3).distinct.length.toLong))
      }
    val out = TextAnalysis.bpePairs(spark, sfDir, topK = 10).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (occ, nw) = brute(r.getString(0))
      assert(r.getLong(1) === occ && r.getLong(2) === nw, s"pair ${r.getString(0)}")
    }
    // descending by count, pair as tiebreak
    assert(out.map(r => (-r.getLong(1), r.getString(0))).toSeq ===
      out.map(r => (-r.getLong(1), r.getString(0))).sortBy(identity).toSeq)
  }

  test("bpe merge loop reproduces hand-computed merges on the Sennrich corpus") {
    // freqs: low=3, lower=2, newest=4, widest=1
    val docs = Seq((1L, "low low low lower lower newest newest newest newest widest"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bpeMergesFrom(docs, merges = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    // round 1: w-e appears in lower(2) + newest(4) = 6 — the max
    // round 2: after the we merge, l-o (3+2=5) ties s-t (4+1=5);
    //          lexicographic tie-break selects (l, o)
    assert(out.toSeq === Seq(
      (1L, "w", "e", "we", 6L),
      (2L, "l", "o", "lo", 5L)))
  }

  test("bpe encode reflects the merged state on the Sennrich corpus") {
    val docs = Seq((1L, "low low low lower lower newest newest newest newest widest"))
      .toDF("doc_id", "text")
    // after merges [we, lo]: low=lo,w; lower=lo,we,r; newest=n,e,we,s,t;
    // widest=w,i,d,e,s,t — hand-count each token weighted by word freq
    val out = TextAnalysis.bpeEncodeTopFrom(docs, merges = 2, topK = 100).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out === Map(
      "we" -> 6L, "lo" -> 5L, "e" -> 5L, "s" -> 5L, "t" -> 5L,
      "w" -> 4L, "n" -> 4L, "r" -> 2L, "i" -> 1L, "d" -> 1L))
  }

  test("spell pairs: planted typos pair with their corrections, distance-2 control stays out") {
    val out = TextAnalysis.spellPairsQuery(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out.toSet === Set(
      ("tabl", "table"), ("filtar", "filter"), ("vecter", "vector"),
      ("streem", "stream"), ("colum", "column")))
    // costumer/customer differ by TWO substitutions — the planted
    // negative control for the exact distance bound
    assert(!out.exists(p => p._1 == "costumer" || p._2 == "costumer"))
  }

  test("spell-pair deletion blocking is lossless vs the naive all-pairs join") {
    // every edit class at distance 1 (sub/insert/delete), a distance-2
    // shared-key pair (ab/ba-style), and frequency direction flips
    val docs = Seq((1L, Seq.fill(40)("sparkle").mkString(" ")),
      (2L, Seq.fill(8)("sparkly sparkles sparle barkle").mkString(" ")),
      (3L, Seq.fill(9)("grab brag garb").mkString(" "))).toDF("doc_id", "text")
    val blocked = TextAnalysis.spellPairs(docs, minFreq = 5).collect().toSeq
    val vocab = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n")).filter(col("n") >= 5)
    val naive = vocab.as("a").join(vocab.as("b"),
        col("a.w") < col("b.w") && levenshtein(col("a.w"), col("b.w")) === 1)
      .select(
        when(col("a.n") <= col("b.n"), col("a.w")).otherwise(col("b.w")).as("wrong_word"),
        when(col("a.n") <= col("b.n"), col("b.w")).otherwise(col("a.w")).as("right_word"),
        least(col("a.n"), col("b.n")).as("wrong_n"),
        greatest(col("a.n"), col("b.n")).as("right_n"))
      .filter(col("right_n") >= col("wrong_n") * 4)
      .orderBy(col("right_n").desc, col("right_word"), col("wrong_word"))
      .collect().toSeq
    assert(blocked === naive)
    assert(blocked.nonEmpty)
  }

  test("global ids are dense 0..N-1 in (lang, doc_id) order for any partition count") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(identity)
    for (parts <- Seq(1, 4, 32)) {
      val out = TextAnalysis.globalIds(spark, dir, partitions = parts).collect()
      assert(out.map(_.getLong(2)).toSeq === (0L until docs.length.toLong),
        s"ids not dense with $parts partitions")
      assert(out.map(r => (r.getString(1), r.getLong(0))).toSeq === docs.toSeq,
        s"order broken with $parts partitions")
    }
  }

  test("inverted index postings are sorted, df-consistent and tf-consistent") {
    val out = TextAnalysis.invertedIndex(spark, "/root/testdata/sf0.001", topK = 15).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val postings = r.getString(3).split(",").map { e =>
        val Array(d, tf) = e.split(":"); (d, tf.toLong)
      }
      assert(postings.length === r.getLong(1), "df = posting count")
      assert(postings.map(_._2).sum === r.getLong(2), "total_tf = sum of posting tf")
      assert(postings.map(_._1).toSeq === postings.map(_._1).sorted.toSeq,
        "postings sorted by padded doc id")
    }
  }

  test("quantile normalization: calibrated values come from the global distribution and are rank-monotone") {
    val rows = TextAnalysis.quantileNorm(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val globalQ = rows.map(_._3).toSet
    rows.foreach { case (_, _, _, pct, nq) =>
      assert(pct >= 0L && pct <= 1000000L)
      assert(globalQ.contains(nq), s"normalized value $nq not in the global quality multiset")
    }
    // within a source, normalized score is monotone in the percentile
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val byPct = rs.sortBy(r => (r._4, r._1)).map(_._5)
      assert(byPct.sameElements(byPct.sorted), s"source $src: norm not rank-monotone")
      // the top-ranked doc of every source calibrates to the global max
      assert(rs.maxBy(r => (r._4, r._1))._5 === rows.map(_._3).max,
        s"source $src: top rank must map to the global max quality")
    }
  }

  test("keywords: phrases are stopword-free islands with non-increasing integer-ranked scores") {
    val out = TextAnalysis.keywords(spark, "/root/testdata/sf0.001").collect()
    assert(out.length > 0 && out.length <= 20)
    val scores = out.map(_.getDouble(3))
    assert(scores.sameElements(scores.sortBy(-(_: Double))), "scores must be non-increasing")
    out.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.length == r.getLong(1) && words.length <= 4)
      assert(words.forall(w => !TextAnalysis.StopwordsEn.contains(w)),
        s"stopword leaked into phrase '${r.getString(0)}'")
      assert(r.getLong(2) >= 1 && r.getDouble(3) > 0.0)
      // a phrase's score is bounded by Σ max-possible word score: each
      // word's degree counts phrases of length ≤ 4, so degree/freq ≤ 4
      assert(r.getDouble(3) <= 4.0 * words.length + 1e-9)
    }
  }

  test("gopher rules: verdicts match a scala recomputation and keep == AND of rules") {
    val out = TextAnalysis.gopherRules(spark, "/root/testdata/sf0.001").collect()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length === docs.size)
    var failedSomeRule = 0
    out.foreach { r =>
      val (id, nWords) = (r.getLong(0), r.getLong(1))
      val toks = docs(id).trim.split("\\s+").toSeq
      assert(nWords === toks.length.toLong)
      val rules = (2 to 7).map(r.getBoolean)
      val wordChars = toks.map(_.length.toLong).sum
      val stopDistinct = toks.distinct.count(TextAnalysis.StopwordsEn.contains)
      val bigrams = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val expected = Seq(
        nWords >= 20 && nWords <= 80,
        wordChars >= 3 * nWords && wordChars <= 10 * nWords,
        0L * 10 <= nWords, // corpus has no '#'/'...' symbols
        toks.count(_.exists(_.isLetter)) * 10 >= nWords * 8,
        stopDistinct >= 2,
        bigrams.distinct.length * 2 >= bigrams.length)
      assert(rules === expected, s"doc $id rule verdicts")
      assert(r.getLong(8) === rules.count(!_).toLong, s"doc $id n_failed")
      assert(r.getBoolean(9) === rules.forall(identity), s"doc $id keep")
      if (!rules.forall(identity)) failedSomeRule += 1
    }
    assert(failedSomeRule > 0, "thresholds should actually reject some documents")
    assert(out.exists(_.getBoolean(9)), "and keep others")
  }

  test("sqrt-temperature mixture: flattens toward uniform without inverting rank") {
    val out = TextAnalysis.mixTemperature(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.length >= 2)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-2, "raw shares sum to ~1")
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-2, "temp shares sum to ~1")
    val byTokens = out.sortBy(_._2)
    // sqrt compresses: low-resource langs gain mass, high-resource lose,
    // but the size ORDER of the temperature shares is preserved
    assert(byTokens.map(_._4).sameElements(byTokens.map(_._4).sorted),
      "p_temp must stay monotone in corpus size")
    val (loRaw, loTemp) = (byTokens.head._3, byTokens.head._4)
    val (hiRaw, hiTemp) = (byTokens.last._3, byTokens.last._4)
    assert(loTemp > loRaw, "smallest language must be upsampled")
    assert(hiTemp < hiRaw, "largest language must be downsampled")
    out.foreach { case (lang, _, raw, temp, up) =>
      assert(math.abs(up - temp / raw) < 5e-3, s"$lang upsample factor consistency")
    }
  }

  test("novelty: matches a brute-force trigram df recomputation") {
    val sfDir = "/root/testdata/sf0.001"
    val out = TextAnalysis.novelty(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    def grams(toks: Seq[String]): Set[String] =
      if (toks.length < 3) Set(toks.take(3).mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    val dfCount = docs.flatMap { case (_, t) => grams(t) }
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(out.size === docs.length)
    docs.foreach { case (id, toks) =>
      val g = grams(toks)
      val novel = g.count(dfCount(_) == 1)
      val (nGrams, nNovel, ratio) = out(id)
      assert(nGrams === g.size.toLong, s"doc $id gram count")
      assert(nNovel === novel.toLong, s"doc $id novel count")
      assert(math.abs(ratio - novel.toDouble / g.size) < 1e-4 + 1e-9, s"doc $id ratio")
    }
    assert(out.values.exists(_._3 < 1.0), "some trigrams must repeat across docs")
  }

  test("zipfFit recovers slope -1 on a planted Zipfian corpus, flags uniform text") {
    import spark.implicits._
    // token w_i appears round(10000/i) times: freq ∝ 1/rank exactly
    val zipfText = (1 to 50)
      .flatMap(i => Seq.fill(math.round(10000.0 / i).toInt)(s"w$i"))
      .mkString(" ")
    val zipf = TextAnalysis.zipfFitFrom(
      Seq((1L, zipfText)).toDF("doc_id", "text"), topN = 50, show = 5).collect()
    assert(zipf.head.getDouble(3) > -1.05 && zipf.head.getDouble(3) < -0.95,
      s"slope ${zipf.head.getDouble(3)}")
    assert(zipf.head.getDouble(4) > 0.999, s"r2 ${zipf.head.getDouble(4)}")
    // top rank is the most frequent planted token
    assert(zipf.head.getString(1) === "w1" && zipf.head.getLong(2) === 10000L)
    // a uniform vocabulary is maximally non-Zipfian: slope ~ 0
    val uniText = (1 to 50).flatMap(i => Seq.fill(100)(s"u$i")).mkString(" ")
    val uni = TextAnalysis.zipfFitFrom(
      Seq((1L, uniText)).toDF("doc_id", "text"), topN = 50, show = 1).collect()
    assert(math.abs(uni.head.getDouble(3)) < 0.01, s"uniform slope ${uni.head.getDouble(3)}")
  }

  test("weightedSample keys are the exact A-ES exponential clocks, and long docs win") {
    val sfDir = "/root/testdata/sf0.001"
    val out = TextAnalysis.weightedSample(spark, sfDir, k = 100).collect()
    assert(out.length === 100)
    // every emitted key is the bit-exact recomputation from doc_id
    val md = java.security.MessageDigest.getInstance("MD5")
    out.foreach { r =>
      val id = r.getLong(0)
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
      val key = math.floor((-math.log(u) / r.getLong(3).toDouble) * 1.0e12).toLong
      assert(r.getLong(4) === key, s"doc $id")
    }
    // keys ascend (earliest exponential arrivals first)
    val keys = out.map(_.getLong(4)).toSeq
    assert(keys === keys.sorted)
    // PPS bias: the length-weighted sample over-represents long docs
    val corpusMean = graft.Tables.documents(spark, sfDir)
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head.getDouble(0)
    val sampleMean = out.map(_.getLong(3)).sum.toDouble / out.length
    assert(sampleMean > corpusMean, s"sample mean $sampleMean vs corpus $corpusMean")
    // hash-determinism: a rerun returns the identical sample
    val again = TextAnalysis.weightedSample(spark, sfDir, k = 100).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("svmClassifier learns the planted quality concept: accuracy beats majority, violations shrink") {
    val sfDir = "/root/testdata/sf0.001"
    val trace = TextAnalysis.svmClassifier(spark, sfDir).collect()
    assert(trace.length === 6)
    assert(trace.map(_.getLong(0)).toSeq === (1L to 6L))
    // zero init: every margin is 0 < 1, so epoch 1 sees ALL rows
    // violating and classifies none correctly
    val n = Tables.documents(spark, sfDir).count()
    assert(trace.head.getLong(1) === n)
    assert(trace.head.getDouble(2) === 0.0)
    // the trainer LEARNS: the planted concept's classes are ~52/48,
    // so majority-class guessing sits near 0.52 — the final epoch
    // must clear 0.85, and active hinge violations must have
    // collapsed to under half the corpus
    val last = trace.last
    assert(last.getDouble(2) >= 0.85, s"final accuracy ${last.getDouble(2)}")
    assert(last.getLong(1) < n / 2, s"final violations ${last.getLong(1)} of $n")
    // the recovered direction matches the concept: the stop-ratio
    // signal carries planted weight 20 vs 5/3, so its learned weight
    // dominates the other two
    val (w1, w2, w3) = (last.getDouble(4), last.getDouble(5), last.getDouble(6))
    assert(w1 > w2 && w1 > w3 && w1 > 0, s"weights ($w1, $w2, $w3)")
    // fixed-point determinism: a rerun replays the identical trace
    val again = TextAnalysis.svmClassifier(spark, sfDir).collect()
    assert(trace.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("svmScores applies the trained filter to every document, consistently with the margin") {
    val sfDir = "/root/testdata/sf0.001"
    val out = TextAnalysis.svmScores(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).count()
    assert(out.length === n) // one verdict per doc, none dropped
    out.foreach { r =>
      val (score, keep, label, agree) =
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(keep === (if (score > 0) 1L else -1L), s"doc ${r.getLong(0)}")
      assert(agree === (keep == label))
    }
    // the filter the final model applies matches the planted concept
    // on >= 85% of the corpus (same floor as the training trace)
    val agreeRate = out.count(_.getBoolean(4)).toDouble / n
    assert(agreeRate >= 0.85, s"agree rate $agreeRate")
  }

  test("knLm: exact replay of the interpolated KN law; continuation counting discounts one-context words") {
    import spark.implicits._
    // crafted corpus: 'san francisco' appears often but 'francisco'
    // only ever follows 'san' (continuation count 1); 'go' follows
    // many contexts. Replay the whole formula driver-side.
    val docs = Seq(
      (0L, "san francisco san francisco san francisco"),
      (1L, "we go they go you go dogs go"),
      (2L, "san francisco we go they run you run")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.knLmFrom(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // driver replay
    val corpus = Seq(
      0L -> "san francisco san francisco san francisco",
      1L -> "we go they go you go dogs go",
      2L -> "san francisco we go they run you run")
    val bigrams = corpus.flatMap { case (id, t) =>
      val w = t.split("\\s+"); w.sliding(2).map(p => (id, p(0), p(1))).toSeq }
    val c12 = bigrams.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n1f = c12.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nc = c12.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val t = c12.size.toLong
    def micro(v: String, w: String): Long =
      math.floor(math.log(((c12((v, w)) - 0.75) +
        0.75 * n1f(v) * nc(w) / t) / c1(v)) * 1e6 + 0.5).toLong
    corpus.foreach { case (id, _) =>
      val ms = bigrams.filter(_._1 == id).map(b => micro(b._2, b._3))
      val r = out(id)
      assert(r.getLong(1) === ms.length.toLong)
      val avg = ms.sum.toDouble / ms.length / 1e6
      assert(r.getDouble(2) === math.floor(avg * 1e4 + 0.5) / 1e4, s"avg_logp doc $id")
      assert(r.getDouble(3) === math.floor(math.exp(-avg) * 1e4 + 0.5) / 1e4, s"ppl doc $id")
    }
    // the KN insight: 'francisco' completes ONE context, 'go' four —
    // continuation mass must rank them accordingly even though
    // 'francisco' is the more frequent token after its context
    assert(nc("francisco") === 1L && nc("go") >= 3L)
  }

  test("calibration: bins partition the corpus; margin ranking separates label rates; sign bookkeeping exact") {
    val sfDir = "/root/testdata/sf0.001"
    val out = TextAnalysis.svmCalibration(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 10)
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum === nDocs, "bins must partition the corpus")
    // the trained margin ranks the planted concept: the top bin's
    // observed positive rate clears the bottom bin's by a wide band
    val byBin = out.sortBy(_.getLong(0))
    assert(byBin.last.getLong(6) >= byBin.head.getLong(6) + 5000L,
      s"top ${byBin.last.getLong(6)} vs bottom ${byBin.head.getLong(6)}")
    out.foreach { r =>
      // rate law and sign bookkeeping are exact
      assert(r.getLong(6) === Math.floorDiv(r.getLong(4) * 10000L, r.getLong(1)))
      if (r.getDouble(3) < 0.0) assert(r.getLong(5) === 0L, "neg-range bin predicted pos")
      if (r.getDouble(2) > 0.0) assert(r.getLong(5) === r.getLong(1), "pos-range bin not all-pos")
      assert(r.getDouble(2) <= r.getDouble(3), "lo must not exceed hi")
    }
    // determinism
    val again = TextAnalysis.svmCalibration(spark, sfDir).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("bpeFertility: hand-built state replays every law; distribution covers the vocab") {
    import spark.implicits._
    // state rows use the trainer's string representation: tokens are
    // double-space separated inside single-space padding
    val state = Seq(
      (" th  e ", 10L),   // 2 tokens, 3 chars, 10 occurrences
      (" a  b  c ", 5L),  // 3 tokens, 3 chars
      (" xy ", 2L),       // 1 token, 2 chars
      (" d  e ", 3L)      // 2 tokens, 2 chars
    ).toDF("seq", "n")
    val out = TextAnalysis.bpeFertilityOfState(state).collect()
      .map(r => r.getLong(0) -> r).toMap
    val tw = 20L; val tt = 10L * 2 + 5 * 3 + 2 * 1 + 3 * 2; val tc = 30L + 15 + 4 + 6
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L).getLong(1) === 1L && out(1L).getLong(2) === 2L)
    assert(out(2L).getLong(1) === 2L && out(2L).getLong(2) === 13L)
    assert(out(3L).getLong(1) === 1L && out(3L).getLong(2) === 5L)
    out.values.foreach { r =>
      assert(r.getLong(3) === Math.floorDiv(r.getLong(2) * 10000L, tw))
      assert(r.getLong(4) === Math.floorDiv(tt * 10000L, tw))
      assert(r.getLong(5) === Math.floorDiv(tc * 10000L, tt))
    }
    // shares cover the vocabulary (floor loss < one grid step per row)
    assert(out.values.map(_.getLong(2)).sum === tw)
  }

  test("langIdNgram: disjoint-alphabet languages classify to the diagonal; distance law replays") {
    import spark.implicits._
    // three planted 'languages' with disjoint character inventories —
    // a rank-profile classifier must put essentially every held-out
    // doc on the confusion diagonal
    def doc(lang: String, alphabet: String, i: Long) = {
      val words = (0 until 12).map(j => alphabet.drop((i + j).toInt % 3).take(3))
      (lang.hashCode.toLong * 1000 + i, lang, words.mkString(" "))
    }
    val docs = (0L until 30L).flatMap(i => Seq(
      doc("aa", "abcde", i), doc("bb", "mnopq", i), doc("cc", "xyzuv", i)))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langIdNgramFrom(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = out.map(_._3).sum
    val diag = out.filter(t => t._1 == t._2).map(_._3).sum
    assert(total > 0L, "eval split must be non-empty")
    assert(diag === total,
      s"disjoint alphabets must classify perfectly: $diag/$total (${out.toSeq})")
    // determinism
    val again = TextAnalysis.langIdNgramFrom(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(again.toSeq === out.toSeq)
  }

  test("heaps: planted sublinear vocabulary growth fits beta in the power-law band") {
    import spark.implicits._
    // doc i introduces ~10/sqrt(i+1) fresh tokens and pads to 20 with
    // a stopword: V(N) grows ~ sqrt(N), so the log-log fit must land
    // near beta = 0.5 and far from 0 or 1
    var fresh = 0
    val docs = (0 until 100).map { i =>
      val nNew = math.max(1, math.floor(10.0 / math.sqrt(i + 1.0)).toInt)
      val words = (0 until nNew).map { j => fresh += 1; s"w$fresh" } ++
        Seq.fill(20 - nNew)("the")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val out = TextAnalysis.heapsFrom(docs).collect()
    assert(out.length === 10)
    // checkpoints are cumulative and cover the corpus at k=10
    val vocab = out.map(_.getLong(2))
    assert(vocab.sliding(2).forall(p => p(0) <= p(1)))
    assert(out.map(_.getLong(1)).sliding(2).forall(p => p(0) < p(1)))
    assert(vocab.last === fresh.toLong + 1L, "k=10 must see the whole vocabulary")
    val betas = out.map(_.getDouble(3)).distinct
    assert(betas.length === 1, "beta must ride every row identically")
    assert(betas.head > 0.25 && betas.head < 0.75,
      s"planted sqrt growth must fit in the power-law band, got ${betas.head}")
    // determinism
    val again = TextAnalysis.heapsFrom(docs).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }
}
