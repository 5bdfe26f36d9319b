package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.catalog.CollectionMeta
import graft.operators.{Dedup, VectorOps, WhereFilter}

/** Property-based invariants (SURVEY.md §5): metadata round-trip,
  * deterministic ids, metric identities, filter-compiler/SQL
  * equivalence. Spark-touching properties batch their cases into one
  * job; pure-JVM properties run the full default 100 cases.
  */
object PropertySpec extends Properties("graft") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("PropertySpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft-test-warehouse")
    .getOrCreate()

  // ---- pure-JVM properties ----

  private val keyGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val valGen = Gen.asciiPrintableStr // includes quotes/backslashes
  private val metadataGen =
    Gen.choose(0, 8).flatMap(n => Gen.mapOfN(n, Gen.zip(keyGen, valGen)))

  property("metadata map → sorted json → map round-trips") =
    forAll(metadataGen) { m =>
      val parsed = JsonMethods.parse(CollectionMeta.sortedJson(m)) match {
        case JObject(fields) => fields.map { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty[String, String]
      }
      parsed == m
    }

  property("sorted json is canonical: equal maps serialize identically") =
    forAll(metadataGen) { m =>
      val shuffled = scala.util.Random.shuffle(m.toSeq).toMap
      CollectionMeta.sortedJson(m) == CollectionMeta.sortedJson(shuffled)
    }

  property("deterministic ids: stable, and distinct names ⇒ distinct ids") =
    forAll(keyGen, keyGen) { (a, b) =>
      val ida = CollectionMeta.deterministicId("t", "d", a)
      (ida == CollectionMeta.deterministicId("t", "d", a)) &&
        ((a == b) == (ida == CollectionMeta.deterministicId("t", "d", b)))
    }

  property("hyperplanes are seed-deterministic") =
    forAll(Gen.choose(0L, 1000L)) { seed =>
      VectorOps.hyperplanes(4, 8, seed) == VectorOps.hyperplanes(4, 8, seed)
    }

  // The cross-engine contract of the md5-derived plane family: every
  // component is an EXACT multiple of 2^-15 in [-1, 1) (so products
  // against float32 vector components are exact in double — the
  // property the LSH/graph/semantic oracles' sign parity rests on),
  // derivable from the seed string alone, and distinct across
  // (table, seed).
  property("hashHyperplanes: exact 2^-15 grid, seed-derived, distinct per table") =
    forAll(Gen.choose(0, 7), Gen.choose(0L, 100L)) { (table, seed) =>
      val p = VectorOps.hashHyperplanes(3, 16, table, seed)
      val onGrid = p.flatten.forall { x =>
        val scaled = x * 32768.0
        scaled == math.rint(scaled) && x >= -1.0 && x < 1.0
      }
      val redo = VectorOps.hashHyperplanes(3, 16, table, seed)
      val otherTable = VectorOps.hashHyperplanes(3, 16, table + 8, seed)
      onGrid && p == redo && p != otherTable
    }

  // ---- Spark-batched properties ----

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(8, Gen.choose(-10.0f, 10.0f)).suchThat(v => v.exists(x => math.abs(x) > 0.01))

  property("cosine: symmetric, self≈1, bounded") = {
    import spark.implicits._
    val pairs = Gen.listOfN(60, Gen.zip(vecGen, vecGen)).sample.get
    val df = pairs.toDF("a", "b").select(
      VectorOps.cosine(col("a"), col("b")).as("ab"),
      VectorOps.cosine(col("b"), col("a")).as("ba"),
      VectorOps.cosine(col("a"), col("a")).as("aa"))
    val rows = df.collect()
    Prop(rows.forall { r =>
      r.getDouble(0) == r.getDouble(1) && // bitwise symmetric (same fold order)
        math.abs(r.getDouble(2) - 1.0) < 1e-9 &&
        math.abs(r.getDouble(0)) <= 1.0 + 1e-12
    }) :| "cosine identities over 60 random pairs"
  }

  property("Int8Encode kernel ≡ HOF chain on arbitrary vectors (incl. extremes)") = {
    import spark.implicits._
    // mixes magnitudes across 8 orders, exact-boundary values, an
    // all-zero vector (the s=1.0 fallback) and varying dims — anything
    // where clamp/floor/cast order could diverge between formulations
    val compGen = Gen.oneOf(
      Gen.choose(-10.0f, 10.0f),
      Gen.choose(-1e6f, 1e6f),
      Gen.choose(-1e-4f, 1e-4f),
      Gen.oneOf(0.0f, -0.0f, 127.0f, -127.0f, 126.5f, -126.5f))
    val vGen = Gen.choose(1, 16).flatMap(n => Gen.listOfN(n, compGen))
    val vecs = (Gen.listOfN(80, vGen).sample.get :+ List.fill(8)(0.0f))
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vecs.toDF("id", "v")
    val k = VectorOps.sqEncodeAll(df, "v").select("id", "_s", "_c8", "_n")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Byte](2), r.getDouble(3)))).toMap
    val h = VectorOps.sqEncodeAllHof(df, "v").select("id", "_s", "_c8", "_n")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Byte](2), r.getDouble(3)))).toMap
    Prop(k.keySet == h.keySet && k.forall { case (id, t) => h(id) == t }) :|
      "kernel/HOF scale+codes+norm bitwise equal over 81 adversarial vectors"
  }

  property("AdcScore kernel ≡ HOF lookup-sum on arbitrary codes/LUTs") = {
    import spark.implicits._
    val kCodes = 16
    val rowGen = for {
      m <- Gen.choose(1, 12)
      codes <- Gen.listOfN(m, Gen.choose(0, kCodes - 1))
      lut <- Gen.listOfN(m * kCodes, Gen.choose(-1e3, 1e3))
    } yield (codes, lut, m)
    val rows = Gen.listOfN(60, rowGen).sample.get
    Prop(rows.groupBy(_._3).forall { case (m, group) =>
      val df = group.map(t => (t._1, t._2)).toDF("codes", "lut")
      df.select(
        graft.functions.AdcScore(col("codes"), col("lut"), kCodes).as("k"),
        VectorOps.adcScoreHof(col("codes"), col("lut"), m, kCodes).as("h"))
        .collect().forall(r => r.getDouble(0) == r.getDouble(1))
    }) :| "kernel/HOF ADC sums bitwise equal over 60 random (codes, lut) rows"
  }

  property("jaccard: self=1, bounded, symmetric") = {
    import spark.implicits._
    val setGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f")).map(_.distinct)
    val pairs = Gen.listOfN(60, Gen.zip(setGen, setGen)).sample.get
    val rows = pairs.toDF("a", "b").select(
      Dedup.jaccard(col("a"), col("b")).as("ab"),
      Dedup.jaccard(col("b"), col("a")).as("ba"),
      Dedup.jaccard(col("a"), col("a")).as("aa")).collect()
    Prop(rows.forall { r =>
      r.getDouble(0) == r.getDouble(1) && r.getDouble(2) == 1.0 &&
        r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0
    }) :| "jaccard identities over 60 random pairs"
  }

  property("where-filter compiles to the same rows as hand-written SQL") = {
    import spark.implicits._
    val docs = (1L to 50L).map(i =>
      (i, Seq("en", "fr", "de")(i.toInt % 3), s"src${i % 5}", i * 10))
      .toDF("doc_id", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("prop_docs")

    def ids(c: org.apache.spark.sql.Column): Seq[Long] =
      docs.filter(c).select("doc_id").as[Long].collect().toSeq.sorted

    val cases: Seq[(String, String)] = Seq(
      ("""{"lang": "en"}""", "lang = 'en'"),
      ("""{"n_chars": {"$gt": 250}}""", "n_chars > 250"),
      ("""{"n_chars": {"$gte": 100, "$lte": 300}}""", "n_chars >= 100 AND n_chars <= 300"),
      ("""{"lang": {"$in": ["en", "de"]}}""", "lang IN ('en','de')"),
      ("""{"source": {"$nin": ["src0"]}}""", "source NOT IN ('src0')"),
      ("""{"$or": [{"lang": "fr"}, {"n_chars": {"$lt": 60}}]}""", "lang = 'fr' OR n_chars < 60"),
      ("""{"$and": [{"lang": {"$ne": "de"}}, {"source": "src1"}]}""", "lang <> 'de' AND source = 'src1'"))
    Prop(cases.forall { case (json, sql) =>
      ids(WhereFilter.compile(json)) == ids(expr(sql))
    }) :| "7 filter-grammar cases match their SQL twins"
  }

  property("text kernels match their HOF references on random text") = {
    import spark.implicits._
    val textGen = Gen.nonEmptyListOf(Gen.oneOf(
      "spark", "query", "vector", "hash", "join", "scan", "merge", "sort",
      "a", "the", "xq")).map(_.mkString(" "))
    // genuine forAll: fresh texts generated (and shrunk) per trial
    Prop.forAll(Gen.listOfN(2, textGen)) { texts =>
      val rows = texts.toDF("text").select(
        graft.functions.ShingleHashes(col("text"), 3).as("ksh"),
        transform(Dedup.shingles(col("text"), 3), s => xxhash64(s)).as("hsh"),
        graft.functions.SimHash64(col("text")).as("ksim"),
        Dedup.simhashColumn(col("text")).as("hsim")).collect()
      rows.forall(r => r.getSeq[Long](0).toSet == r.getSeq[Long](1).toSet) &&
        rows.forall(r => r.getLong(2) == r.getLong(3))
    }
  }

  property("media codecs round-trip arbitrary sample grids exactly") = {
    val bmpGen = for {
      w <- Gen.choose(1, 9)
      h <- Gen.choose(1, 6)
      px <- Gen.listOfN(w * h, Gen.choose(0, 255))
    } yield (w, h, px.toArray)
    val wavGen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      n <- Gen.choose(1, 64)
      sm <- Gen.listOfN(n, Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
    } yield (rate, sm.toArray)
    Prop.forAll(bmpGen, wavGen) { case ((w, h, px), (rate, samples)) =>
      val img = graft.operators.MediaCodec.decodeBmp(
        graft.operators.MediaCodec.encodeBmp(w, h, px))
      val aud = graft.operators.MediaCodec.decodeWav(
        graft.operators.MediaCodec.encodeWav(samples, rate))
      img.width == w && img.height == h && img.samples.toSeq == px.toSeq &&
        aud.sampleRate == rate && aud.samples.toSeq == samples.toSeq
    }
  }

  property("simhash: 64-bit signatures use the full width and match a JVM-side oracle") = {
    import spark.implicits._
    val textGen = Gen.nonEmptyListOf(Gen.oneOf(
      "spark", "query", "vector", "hash", "join", "scan", "merge", "sort")).map(_.mkString(" "))
    val texts = Gen.listOfN(40, textGen).sample.get
    val rows = texts.toDF("text")
      .select(col("text"), Dedup.simhashColumn(col("text")).as("sig")).collect()
    // ANSI-safe packing claim: both 32-bit halves populated somewhere
    // in a random sample (i.e. the signature genuinely spans 64 bits)
    val sigs = rows.map(_.getLong(1))
    val usesHigh = sigs.exists(s => (s >>> 32) != 0L)
    val usesLow = sigs.exists(s => (s & 0xffffffffL) != 0L)
    // identical text ⇒ identical signature (determinism across rows)
    val deterministic = rows.groupBy(_.getString(0))
      .forall { case (_, rs) => rs.map(_.getLong(1)).distinct.length == 1 }
    (Prop(usesHigh && usesLow) :| "signature spans both 32-bit halves") &&
      (Prop(deterministic) :| "same text, same signature")
  }

  property("sentence dedup: every distinct sentence survives exactly once corpus-wide") = {
    import spark.implicits._
    // small vocab of sentences forces heavy cross-document duplication
    val sentGen = Gen.oneOf("alpha beta", "gamma delta", "epsilon zeta",
      "eta theta", "iota kappa", "lambda mu")
    val docGen = Gen.choose(1, 5).flatMap(k => Gen.listOfN(k, sentGen))
      .map(_.mkString(". "))
    val docs = Gen.listOfN(12, docGen).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.sentenceDedupOn(df).collect()
    val distinctSents = docs.flatMap(_._2.split("\\.")).map(_.trim)
      .filter(_.nonEmpty).distinct.length
    val totalKept = out.map(_.getAs[Long]("n_kept")).sum
    val perDocBounded = out.forall(r =>
      r.getAs[Long]("n_kept") <= r.getAs[Long]("n_sentences"))
    (Prop(totalKept == distinctSents) :|
      s"kept $totalKept != distinct $distinctSents") &&
      (Prop(perDocBounded) :| "kept exceeds sentence count in a doc")
  }

  property("pagerank conserves probability mass on random symmetric multigraphs") = {
    import spark.implicits._
    val edgeGen = for {
      n <- Gen.choose(3, 8)
      m <- Gen.choose(n, 3 * n)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield es.filter { case (a, b) => a != b }
    val raw = edgeGen.sample.get
    if (raw.isEmpty) Prop.passed
    else {
      val sym = (raw ++ raw.map(_.swap)).toDF("src", "dst")
      val out = graft.operators.Graph.pagerankOnEdges(sym, iters = 3, topK = 1000)
        .collect()
      val n = out.length.toDouble
      // rank_x_n is rank·N rounded to 1e-4, so the mean must be 1
      // within the rounding budget, and every rank positive
      val mean = out.map(_.getAs[Double]("rank_x_n")).sum / n
      val positive = out.forall(_.getAs[Double]("rank_x_n") > 0.0)
      (Prop(math.abs(mean - 1.0) <= 1e-3) :| s"mean rank*N $mean drifted from 1") &&
        (Prop(positive) :| "non-positive rank")
    }
  }

  property("count-min estimates never undercount on random keys") = {
    import spark.implicits._
    val keysGen = Gen.listOfN(300, Gen.choose(0L, 40L))
    val keys = keysGen.sample.get
    val df = keys.toDF("k")
    val sk = df.agg(expr("count_min_sketch(k, 0.01d, 0.9d, 7)").as("cms"))
    val out = df.groupBy($"k").count().crossJoin(broadcast(sk))
      .select($"k", $"count", graft.functions.CmsEstimate($"cms", $"k").as("est"))
      .collect()
    Prop(out.forall(r => r.getAs[Long]("est") >= r.getAs[Long]("count"))) :|
      "CMS undercounted a key"
  }
}
