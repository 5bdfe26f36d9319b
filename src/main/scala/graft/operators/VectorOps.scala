package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Vector similarity operators over `embeddings.embedding:
  * array<float>` — the data-plane capability the reference's vector
  * store implies but delegates to its server (SURVEY.md §0, §7.1
  * items 3-4).
  *
  * All math uses built-in higher-order functions (`zip_with` +
  * `aggregate`) computed in DOUBLE with left-to-right folds, so
  * results are bitwise deterministic and the whole pipeline stays in
  * whole-stage codegen — no UDF boxing per row.
  *
  * Scale design:
  *  - Brute-force kNN broadcasts the (small) query set and streams
  *    the corpus once: a map-only stage plus one shuffle for the
  *    per-query top-k window. 100 TB of corpus = pure scan
  *    parallelism; cost is linear, no candidate blowup.
  *  - The LSH path buckets the corpus by a 16-bit random-hyperplane
  *    signature (seeded, coordination-free), turning kNN into an
  *    equi-join on signature — the index build is one column
  *    derivation, incremental-friendly, and the probe touches
  *    1/2^bits of the data in expectation.
  *  - The IVF path uses learned coarse centroids (here: per-label
  *    means) and probes the nearest `nprobe` partitions.
  */
object VectorOps {

  /** Distance kernels: the public entry points delegate to the
    * codegen'd Catalyst expressions in [[graft.functions.VectorExpressions]];
    * the `*Hof` variants keep the original higher-order-function
    * formulation (CodegenFallback, interpreted) — retained as the
    * executable spec the kernels are proven bitwise-equal against.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.dot(a, b)

  def cosine(a: Column, b: Column): Column = graft.functions.VectorExpressions.cosine(a, b)

  def l2(a: Column, b: Column): Column = graft.functions.VectorExpressions.l2(a, b)

  /** Sequential-fold dot product in double precision (reference impl). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normHof(a: Column): Column = sqrt(dotHof(a, a))

  def cosineHof(a: Column, b: Column): Column = dotHof(a, b) / (normHof(a) * normHof(b))

  def l2Hof(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, x) => acc + x))

  private def rnd4(c: Column): Column = CrossEngine.rnd4(c)

  /** Exact top-k per query by cosine: broadcast(queries) ⋈ corpus →
    * score map stage → ranking window on query_id. The broadcast join
    * is mandatory here — a shuffle join on a cross-product key would
    * be catastrophic; with broadcast the corpus is read exactly once.
    */
  def knnBrute(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("query_id"), col("qvec")))
    val scored = corpus.select(col("vec_id"), col("vec"))
      .join(q) // broadcast nested loop over the tiny query side
      .select(col("query_id"), col("vec_id"),
        cosine(col("qvec"), col("vec")).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), rnd4(col("score")).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Matryoshka (MRL-style) truncation evaluation: retrieval quality
    * when only the first `d` embedding components are used, for each
    * d in `dims` — the storage/latency ladder a production system
    * tunes when its embedder was trained with matryoshka losses
    * (coarse prefixes for cheap first-pass retrieval, the full vector
    * for re-ranking). Per (dim, query): exact cosine top-k over the
    * length-d prefixes, scored against the full-dimension top-k as
    * truth.
    *
    * Plan shape: ONE corpus scan — broadcast(queries) ⋈ corpus, each
    * pair fanned out ×|dims| by a literal-array explode (map stage,
    * no shuffle), then a single ranking window partitioned by
    * (dim, query_id). The truth side is the same broadcast-join scan
    * at full dimension. At 100 TB this is the brute-force evaluation
    * harness (run on a sample or behind the ANN tiers), so the cost
    * model is |corpus| × |dims| map work and one k-bounded window —
    * nothing quadratic, nothing driver-side.
    */
  def matryoshkaRecall(queries: DataFrame, corpus: DataFrame,
                       dims: Seq[Int], k: Int): DataFrame = {
    val q = broadcast(queries.select(col("query_id"), col("qvec")))
    val joined = corpus.select(col("vec_id"), col("vec")).join(q)
    val w = Window.partitionBy(col("dim"), col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    val topk = joined
      .select(col("query_id"), col("vec_id"), col("qvec"), col("vec"),
        explode(typedLit(dims.map(_.toLong))).as("dim"))
      .select(col("dim"), col("query_id"), col("vec_id"),
        cosine(slice(col("qvec"), lit(1), col("dim").cast("int")),
          slice(col("vec"), lit(1), col("dim").cast("int"))).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
    val wT = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    val truth = joined
      .select(col("query_id"), col("vec_id"),
        cosine(col("qvec"), col("vec")).as("score"))
      .withColumn("tr", row_number().over(wT))
      .filter(col("tr") <= k)
      .select(col("query_id"), col("vec_id"))
    // truth and hits are |queries|·k-sized (model-scale, never
    // corpus-scale) — broadcast both joins so the tail of the plan
    // stays shuffle-free regardless of corpus size
    val hits = topk.join(broadcast(truth), Seq("query_id", "vec_id"))
      .groupBy(col("dim"), col("query_id")).agg(count(lit(1)).as("h"))
    topk.filter(col("rank") === 1)
      .select(col("dim"), col("query_id"),
        col("vec_id").as("top1_vec_id"), rnd4(col("score")).as("top1_score"))
      .join(broadcast(hits), Seq("dim", "query_id"), "left")
      .select(col("dim"), col("query_id"), col("top1_vec_id"), col("top1_score"),
        (coalesce(col("h"), lit(0L)).cast("double") / lit(k.toDouble))
          .as("recall_at_k"))
      .orderBy(col("dim"), col("query_id"))
  }

  /** Deterministic random hyperplanes: fixed seed, JVM-stable gaussian
    * sequence — every executor derives identical planes, no broadcast
    * of state needed.
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** MD5-derived hyperplanes — the CROSS-ENGINE-REPRODUCIBLE twin of
    * [[hyperplanes]]: component (t, b, i) is the first 16 md5 hex bits
    * of "lsh:seed:t:b:i" mapped to [−1, 1). Each component is an exact
    * multiple of 2⁻¹⁵, so its product with a float32 vector component
    * is EXACT in double (24 + 16 mantissa bits < 53) and both engines
    * accumulate identical partial sums in identical order — the sign
    * test can't flip between engines. Uniform components are a
    * standard sign-LSH plane family (any component law symmetric about
    * 0 gives unbiased sign hashes); trading the gaussian for
    * hash-derived uniforms is what lets the DuckDB oracle re-derive
    * the planes — and therefore the buckets, the candidate set, the
    * answer AND the recall — from nothing but the seed string.
    */
  def hashHyperplanes(nPlanes: Int, dim: Int, table: Int,
                      seed: Long = 42L): Seq[Seq[Double]] =
    (0 until nPlanes).map(b => (0 until dim).map { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"lsh:$seed:$table:$b:$i".getBytes("UTF-8"))
      (((d(0) & 0xff) << 8) | (d(1) & 0xff)) / 32768.0 - 1.0
    })

  /** 16-bit signature: bit i = sign(v · plane_i), packed by a left
    * fold — one derived column, no shuffle: this IS the index build.
    */
  def lshSignature(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val planesLit = typedLit(planes)
    val bits = transform(planesLit, p =>
      when(aggregate(zip_with(vec, p, (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x) >= 0, lit(1L)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)
  }

  /** Multi-table LSH ANN: `tables` independent signatures of
    * `bitsPerTable` hyperplane bits each. Each side derives one
    * (table, signature) pair per table (an array column + posexplode
    * — still a map stage), candidates come from ONE equi-join on
    * (table, sig), are deduped, then exact re-ranked. Expected
    * candidates per query ≈ tables × corpus / 2^bits — tune the two
    * knobs for the recall/cost point; the join stays a plain hash
    * join at any corpus size and never degenerates into a cross
    * product.
    */
  def annLsh(queries: DataFrame, corpus: DataFrame, k: Int,
             tables: Int = 16, bitsPerTable: Int = 6, dim: Int = 64,
             seed: Long = 42L, multiProbe: Boolean = true): DataFrame = {
    val allPlanes = (0 until tables).map(t =>
      hashHyperplanes(bitsPerTable, dim, t, seed))

    // One compiled pass for all tables' signatures (bitwise equal to
    // the per-plane HOF fold; parity in VectorOpsSpec).
    def sigArray(vec: Column): Column =
      graft.functions.LshSignatures(vec, allPlanes)

    // Multi-probe: the QUERY side also probes every hamming-1
    // neighbor of its signature (vectors near a hyperplane land on
    // either side). Probes multiply only the tiny broadcast side —
    // bits+1 probes/table — while the corpus keeps exactly one bucket
    // per table, so recall rises with NO extra corpus-side cost.
    def probeSigs(sig: Column): Column =
      if (!multiProbe) array(sig)
      else array(sig +: (0 until bitsPerTable).map(b => sig.bitwiseXOR(lit(1L << b))): _*)

    val qSig = broadcast(
      queries.select(col("query_id"), col("qvec"), posexplode(sigArray(col("qvec"))).as(Seq("t", "sig0")))
        .select(col("query_id"), col("qvec"), col("t"),
          explode(probeSigs(col("sig0"))).as("sig")))
    val cSig = corpus.select(col("vec_id"), col("vec"), posexplode(sigArray(col("vec"))).as(Seq("t", "sig")))

    val candidates = cSig.join(qSig, Seq("t", "sig"))
      .select(col("query_id"), col("qvec"), col("vec_id"), col("vec"))
      .dropDuplicates("query_id", "vec_id") // same pair can collide in several tables

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    candidates
      .select(col("query_id"), col("vec_id"),
        cosine(col("qvec"), col("vec")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), rnd4(col("score")).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-style ANN: coarse centroids (one per corpus partition label)
    * are broadcast; each query probes its `nprobe` nearest centroids
    * and exact-searches only those partitions. At scale the corpus is
    * laid out partitioned-by-label (bucketed parquet), so the probe
    * prunes file reads, not just rows.
    */
  /** Per-label mean centroid with ORDER-INDEPENDENT fixed-point
    * arithmetic: components are floored to 1e-6 micro-units and
    * summed as longs — exact and associative, where a double `avg`
    * depends on partition/merge order and can flip a probe-ranking
    * near-tie between runs (and between engines). One division at
    * the end reproduces the identical double everywhere, so the IVF
    * probe order is bit-reproducible in the DuckDB oracle. The 1e-6
    * grid on unit-scale components is far below any real centroid
    * separation. Expects columns (label, vec).
    */
  private[operators] def labelMeanCentroids(corpus: DataFrame): DataFrame =
    corpus.select(col("label"), posexplode(col("vec")).as(Seq("pos", "comp")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(floor(col("comp").cast("double") * lit(1000000.0))).as("s_micro"),
        count(lit(1)).as("n"))
      .withColumn("mean_comp",
        col("s_micro").cast("double") / col("n").cast("double") / lit(1000000.0))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mean_comp")))).as("pairs"))
      .select(col("label").as("c_label"),
        transform(col("pairs"), p => p.getField("mean_comp")).as("centroid"))

  def annIvf(queries: DataFrame, corpus: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val exploded = labelMeanCentroids(corpus.select(col("label"), col("vec")))

    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("c_score").desc, col("c_label").asc)
    val probes = queries.select(col("query_id"), col("qvec"))
      .join(broadcast(exploded))
      .select(col("query_id"), col("qvec"), col("c_label"),
        cosine(col("qvec"), col("centroid")).as("c_score"))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nprobe)
      .select(col("query_id"), col("qvec"), col("c_label"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    corpus.select(col("vec_id"), col("vec"), col("label"))
      .join(broadcast(probes), col("label") === col("c_label"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qvec"), col("vec")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), rnd4(col("score")).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Nearest-centroid id for `vec` against a driver-side codebook —
    * a MAP-STAGE argmin, zero shuffles: reuses the compiled
    * [[graft.functions.PqEncode]] kernel with m=1 (one block spanning
    * the whole vector) and maps the codebook INDEX back to the
    * surviving centroid id (ids need not be contiguous once an empty
    * cluster drops out). The kernel's strict `<` keeps the lowest
    * index on exact distance ties and the codebook is laid out in
    * ascending c_id order, so ties break to the lowest c_id — the
    * same tie discipline as a join + min_by(struct(d, c_id))
    * formulation (argmin over squared L2 equals argmin over L2: sqrt
    * is monotone). Parity with the join formulation is spec-proven.
    */
  def nearestCentroidId(vec: Column, cents: Seq[(Int, Seq[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    val dim = sorted.head._2.length
    val idx = graft.functions.PqEncode(vec, sorted.flatMap(_._2), 1, sorted.length, dim)
      .getItem(0)
    element_at(typedLit(sorted.map(_._1)), idx + 1)
  }

  /** Distributed Lloyd's k-means for IVF coarse centroids. Assignment
    * is a pure map stage ([[nearestCentroidId]] — nearest centroid is
    * a function of (vec, broadcast codebook) alone), so the ONLY
    * shuffle per Lloyd iteration is the per-(centroid, position)
    * mean aggregation, whose partial aggregation reduces each map
    * partition to ≤ k·dim rows before the exchange — the corpus
    * itself is never shuffled (the round-2 shape re-shuffled all
    * corpus rows through a groupBy(vec_id) min_by every iteration).
    * Only the k centroid vectors (model parameters, not data rows)
    * round-trip through the driver per iteration — k·dim doubles, the
    * standard distributed-ML discipline. Seeds are the k vectors with
    * the lowest (md5(vec_id), vec_id): deterministic (the vec_id
    * tie-break makes hash collisions harmless), corpus-order
    * independent, and — unlike the round-2 xxhash64 ordering — an
    * ordering ANY engine can re-derive, which is what lets the DuckDB
    * oracle replay the whole training loop (vec_ann_kmeans). Iteration
    * means use the [[labelMeanCentroids]] fixed-point discipline:
    * per-(cluster, position) sums of 1e-6-floored micros are exact
    * integers, so the trained model is bit-identical regardless of
    * partitioning, merge order, or engine. A centroid that loses
    * every member drops out (k shrinks) rather than being re-seeded
    * nondeterministically.
    */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    var cents: Seq[(Int, Seq[Double])] = corpus
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(k)
      .select(col("vec")).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Float](0).map(_.toDouble)) }.toSeq
    for (_ <- 1 to iters) {
      cents = corpus
        .select(nearestCentroidId(col("vec"), cents).as("c_id"),
          posexplode(col("vec")).as(Seq("pos", "comp")))
        .groupBy(col("c_id"), col("pos"))
        .agg(sum(floor(col("comp").cast("double") * lit(1000000.0))).as("s_micro"),
          count(lit(1)).as("n"))
        .withColumn("m",
          col("s_micro").cast("double") / col("n").cast("double") / lit(1000000.0))
        .groupBy(col("c_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pairs"))
        .select(col("c_id"), transform(col("pairs"), p => p.getField("m")).as("centroid"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
        .sortBy(_._1).toSeq // collect() order is not guaranteed
    }
    cents
  }

  /** [[kmeansCentroids]] memoized on the SAME content fingerprint the
    * persisted-index path keys its on-disk artifacts by
    * ([[VectorIndex.fingerprint]]) — train-once/serve-many at
    * driver-session granularity. Several queries in the suite train
    * coarse centroids over the identical corpus with identical
    * params (k-means IVF, the recall curve, IVF-PQ's coarse stage,
    * semantic dedup); proving the corpus unchanged costs one
    * map-side-partial hash pass vs `iters` full train passes.
    * Centroids are model parameters (k·dim doubles), so the cache is
    * bytes-sized; cleared wholesale if it ever grows past 64 models.
    */
  private val centroidCache =
    new scala.collection.concurrent.TrieMap[String, Seq[(Int, Seq[Double])]]
  def kmeansCentroidsCached(corpus: DataFrame, k: Int,
                            iters: Int): Seq[(Int, Seq[Double])] = {
    val key = VectorIndex.fingerprint(corpus, k, iters)
    if (centroidCache.size > 64) centroidCache.clear()
    centroidCache.getOrElseUpdate(key, kmeansCentroids(corpus, k, iters))
  }

  /** IVF over LEARNED k-means clusters (vs [[annIvf]]'s supplied
    * partition labels): train coarse centroids, assign the corpus
    * once, then run the same probe-and-search tail — at scale the
    * assignment is a write-time step (corpus laid out bucketed by
    * cluster) and queries prune whole partitions.
    */
  def annIvfKmeans(queries: DataFrame, corpus: DataFrame, k: Int,
                   kClusters: Int = 16, iters: Int = 2, nprobe: Int = 12): DataFrame = {
    val cents = kmeansCentroidsCached(corpus, kClusters, iters)
    // final assignment is the same map-stage argmin as training — at
    // scale this is the write-time bucketing step, still zero shuffles
    val labeled = corpus.select(col("vec_id"),
      nearestCentroidId(col("vec"), cents).as("label"), col("vec"))
    annIvf(queries, labeled, k, nprobe)
  }

  /** SIMPLIFIED SILHOUETTE clustering-quality score over the trained
    * k-means model — the evaluation harness for the engine's
    * clustering family (the retrieval side already has `txt_ndcg`,
    * regression has `q59_cv_ols`): per point, a = distance to the
    * ASSIGNED centroid, b = distance to the nearest OTHER centroid,
    * s = (b−a)/max(a,b) ∈ [−1, 1] (Kaufman & Rousseeuw's
    * centroid-based simplification — O(N·k) instead of the O(N²)
    * full silhouette, the only version that exists at corpus scale).
    * Negative mean silhouette in a cluster = its members sit closer
    * to a neighboring centroid — the "k is wrong / clusters overlap"
    * diagnostic.
    *
    * Shares [[kmeansCentroidsCached]]'s certified trained model (the
    * vec_ann_kmeans oracle replays the identical training), so the
    * oracle re-derives seeds → both Lloyd rounds → labels, then the
    * distance table. Per-point silhouettes fix to the 1e-4 grid
    * before summing (the rnd4 boundary contract), so cluster means
    * are exact integer floorDivs.
    *
    * Scale shape: distances to all k centroids are ONE map stage
    * (k literal-vector kernels, whole-stage codegen'd); the only
    * shuffle is the final per-cluster agg — k·stats rows.
    */
  def silhouetteQuery(s: SparkSession, dir: String,
                      kClusters: Int = 16, iters: Int = 2): DataFrame =
    silhouetteOf(corpusSet(s, dir), kClusters, iters)

  /** The score table over any (vec_id, vec) corpus — spec entry
    * point for planted cluster geometries. */
  def silhouetteOf(c: DataFrame, kClusters: Int, iters: Int): DataFrame = {
    val cents = kmeansCentroidsCached(c, kClusters, iters).sortBy(_._1)
    val dCols = cents.map { case (id, ctr) =>
      graft.functions.VectorExpressions.l2(col("vec"), typedLit(ctr)).as(s"d$id") }
    val wd = c.select(Seq(col("vec_id"),
      nearestCentroidId(col("vec"), cents).as("c_id")) ++ dCols: _*)
    val aCol = cents.map { case (id, _) => (col("c_id") === id, col(s"d$id")) }
      .foldLeft(lit(Double.NaN)) { case (acc, (p, d)) => when(p, d).otherwise(acc) }
    val bCol = least(cents.map { case (id, _) =>
      when(col("c_id") === id, lit(Double.PositiveInfinity))
        .otherwise(col(s"d$id")) }: _*)
    wd.select(col("c_id"), aCol.as("a"), bCol.as("b"))
      .withColumn("s4", when(greatest(col("a"), col("b")) > 0.0,
        floor((col("b") - col("a")) / greatest(col("a"), col("b"))
          * lit(10000.0) + lit(0.5)).cast("long")).otherwise(0L))
      .groupBy(col("c_id"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("s4")).as("ssil"),
        min(col("s4")).as("min_sil_1e4"), max(col("s4")).as("max_sil_1e4"))
      .withColumn("mean_sil_1e4",
        expr("(ssil - pmod(ssil, n_vecs)) DIV n_vecs"))
      .select(col("c_id").cast("long").as("c_id"), col("n_vecs"),
        col("mean_sil_1e4"), col("min_sil_1e4"), col("max_sil_1e4"))
      .orderBy(col("c_id"))
  }

  /** Symmetric int8 quantization quality stats — the storage-shrink
    * step of an embedding pipeline (float32 → int8 is 4× smaller and
    * what most ANN index formats store). Per vector: scale =
    * 127/max|x|, elementwise error |x − dequant(quant(x))| computed
    * without materializing the quantized array (err is a pure
    * function of x and the scalar scale). Map stage; the floor-based
    * half-up rounding matches the oracle bit-for-bit.
    */
  def quantizeStats(s: SparkSession, dir: String): DataFrame = {
    val v = col("embedding")
    val maxAbs = array_max(transform(v, x => abs(x.cast("double"))))
    val scale = lit(127.0) / col("max_abs")
    val err = transform(v, x =>
      abs(x.cast("double") - floor(x.cast("double") * scale + lit(0.5)) / scale))
    Tables.embeddings(s, dir)
      .select(col("vec_id"), v.as("embedding"), maxAbs.as("max_abs"))
      .filter(col("max_abs") > 0) // a zero vector has no scale
      .select(
        col("vec_id"),
        rnd4(scale).as("scale"),
        rnd4(array_max(err)).as("max_err"),
        rnd4(aggregate(err, lit(0.0), (a, x) => a + x) / size(col("embedding"))).as("mean_err"))
      .orderBy(col("vec_id"))
  }

  /** Signed integer dot product of two int8 code arrays — the
    * codegen'd [[graft.functions.Int8Dot]] kernel (the interpreted
    * HOF fold below is retained as its executable spec; parity in
    * VectorOpsSpec).
    */
  private[graft] def intDot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.int8Dot(a, b)

  /** Append symmetric-int8 SQ columns to `df`, PRESERVING every
    * existing column: `_s` (dequant scale), `_c8` (int8 codes), `_n`
    * (norm reconstructed from the codes) — one compiled pass per
    * vector via the codegen'd [[graft.functions.Int8Encode]] kernel
    * (the interpreted HOF chain below is retained as its executable
    * spec; bitwise parity in VectorOpsSpec). Shared by [[annSq]] and
    * [[Dedup.semanticNearDup]]'s code-carrying candidate join.
    */
  private[graft] def sqEncodeAll(df: DataFrame, vec: String): DataFrame =
    df.withColumn("_e", graft.functions.Int8Encode(col(vec)))
      .withColumn("_s", col("_e._s"))
      .withColumn("_c8", col("_e._c8"))
      .withColumn("_n", col("_e._n"))
      .drop("_e")

  /** HOF reference formulation of [[sqEncodeAll]] (interpreted;
    * parity pinned in VectorOpsSpec). The staged projections keep the
    * encode O(dim) — see the trap note in [[annSq]].
    */
  private[graft] def sqEncodeAllHof(df: DataFrame, vec: String): DataFrame =
    df.withColumn("_ma", array_max(transform(col(vec), x => abs(x.cast("double")))))
      .withColumn("_s", when(col("_ma") > 0, col("_ma") / lit(127.0)).otherwise(lit(1.0)))
      .withColumn("_c8", transform(col(vec), x =>
        greatest(lit(-127.0), least(lit(127.0),
          floor(x.cast("double") / col("_s") + lit(0.5)))).cast("tinyint")))
      .withColumn("_n", sqrt(intDot(col("_c8"), col("_c8")).cast("double")) * col("_s"))
      .drop("_ma")

  /** HOF reference formulation of [[intDot]] (CodegenFallback). */
  private[operators] def intDotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** HOF reference formulation of [[graft.functions.AdcScore]]
    * (interpreted; parity pinned in VectorOpsSpec).
    */
  private[graft] def adcScoreHof(codes: Column, lut: Column,
                                     m: Int, kCodes: Int): Column =
    aggregate(
      zip_with(codes, sequence(lit(0), lit(m - 1)),
        (code, b) => element_at(lut, b * kCodes + code + 1)),
      lit(0.0), (acc, x) => acc + x)

  /** ANN via scalar int8 quantization + exact re-rank: the corpus is
    * carried through the scoring join as int8 codes plus two floats
    * per vector (4× less memory/bandwidth than float32 — the point of
    * SQ at 100 TB: the hot scoring scan reads a quarter of the
    * bytes), approximate cosine is an INTEGER dot product rescaled by
    * the two scalar factors, and only the `shortlist` survivors fetch
    * their float vectors for the exact top-k. Same
    * broadcast-queries / one-corpus-scan / per-query-window shape as
    * [[knnBrute]] — no shuffle touches the corpus beyond the
    * shortlist window.
    */
  def annSq(queries: DataFrame, corpus: DataFrame, k: Int,
            shortlist: Int = 50, release: Boolean = true): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) or results are silently truncated")
    // scale materializes as a COLUMN before the quantize lambda — if
    // the lambda referenced the scale expression tree directly, the
    // array_max sub-expression would re-evaluate per element (O(dim²)
    // per row); staged projections keep the encode O(dim)
    def enc(df: DataFrame, idCol: String, vec: String): DataFrame =
      sqEncodeAll(df.select(col(idCol), col(vec).as("_v")), "_v").drop("_v")
    // the coded corpus MUST materialize before the scoring join: the
    // encode is a chain of interpreted `transform` HOFs, and
    // CollapseProject would otherwise inline it past the join so the
    // O(dim) encode re-runs per (query, vector) OUTPUT pair — observed
    // 5× the whole query's cost at |Q|=10. Caching is also the scale
    // shape: codes are computed once per corpus row and the Q-way
    // scoring fan-out reads bytes, never re-quantizes.
    val c = enc(corpus, "vec_id", "vec").persist()
    val q = broadcast(enc(queries.withColumnRenamed("qvec", "_qv"), "query_id", "_qv")
      .withColumnsRenamed(Map("_c8" -> "_qc8", "_s" -> "_qs", "_n" -> "_qn")))
    val approx = intDot(col("_qc8"), col("_c8")).cast("double") *
      col("_qs") * col("_s") / (col("_qn") * col("_n"))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").desc, col("vec_id").asc)
    val shortlisted = c.join(q)
      .filter(col("_n") > 0 && col("_qn") > 0)
      .select(col("query_id"), col("vec_id"), approx.as("adist"))
      .withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    val out = shortlisted
      .join(corpus.select(col("vec_id"), col("vec")), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qvec"))), "query_id")
      .select(col("query_id"), col("vec_id"),
        cosine(col("qvec"), col("vec")).as("score"))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), rnd4(col("score")).as("score"))
      .orderBy(col("query_id"), col("rank"))
    if (!release) out
    else { val m = out.localCheckpoint(true); c.unpersist(); m }
  }

  /** Product quantization: split each vector into `m` subvectors,
    * train a k-codeword k-means codebook per block (blocked Lloyd's —
    * same seeding/tie-break discipline as [[kmeansCentroids]], but
    * all blocks train together in one exploded relation), and store
    * each vector as `m` small codes — 64 float32 dims become 8 bytes
    * (32× compression), the standard memory shape for billion-vector
    * ANN.
    *
    * Returns the flat codebook array laid out
    * [block][codeword][dim], failing loudly if any block lost a
    * cluster (uniform k is required for LUT indexing).
    */
  def pqTrain(corpus: DataFrame, m: Int, kCodes: Int, iters: Int,
              dim: Int): Array[Double] = {
    val subDim = dim / m
    require(m * subDim == dim, s"dim $dim not divisible into $m blocks")
    def flatOf(cs: Seq[(Int, Int, Seq[Double])]): Array[Double] = {
      val arr = new Array[Double](m * kCodes * subDim)
      for ((b, c, centroid) <- cs) centroid.copyToArray(arr, (b * kCodes + c) * subDim)
      arr
    }
    def requireUniform(cs: Seq[(Int, Int, Seq[Double])]): Unit =
      require(cs.length == m * kCodes,
        s"PQ trained ${cs.length}/${m * kCodes} codewords (empty cluster) — lower kCodes")
    // Deterministic seeds: every block seeds from the subvectors of
    // the SAME kCodes lowest-(md5(vec_id), vec_id) vectors (the
    // round-2 per-block seed window ordered identically for every
    // block), so ONE driver-side fetch of those vectors, sliced per
    // block on the driver, replaces the persisted exploded seed
    // relation entirely. md5 ordering (not xxhash64) for the same
    // reason as [[kmeansCentroids]]: any engine can re-derive it, so
    // the whole PQ training loop is oracle-replayable (vec_ann_pq).
    val seedVecs = corpus
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(kCodes)
      .select(col("vec")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
    var cents: Seq[(Int, Int, Seq[Double])] =
      (for { b <- 0 until m; c <- seedVecs.indices }
        yield (b, c, seedVecs(c).slice(b * subDim, (b + 1) * subDim).toSeq)).toSeq
    // All m blocks train TOGETHER, and assignment is a pure map stage:
    // the compiled PqEncode kernel emits all m block codes in ONE pass
    // over each vector (the round-2 shape shuffled the exploded
    // subvector relation through a groupBy(vec_id, block) min_by every
    // Lloyd iteration). The only shuffle per iteration is the
    // per-(block, codeword, position) mean aggregation — partial
    // aggregation reduces each map partition to ≤ m·k·subDim rows
    // before the exchange. The flat codebook layout needs uniform k
    // per block, so an empty cluster fails loudly at the iteration it
    // first appears (it can never recover — a dropped codeword stays
    // dropped) with the same message the final layout check uses.
    for (_ <- 1 to iters) {
      requireUniform(cents)
      cents = corpus
        .select(col("vec"),
          posexplode(graft.functions.PqEncode(col("vec"), flatOf(cents).toSeq, m, kCodes, subDim))
            .as(Seq("block", "c_id")))
        .select(col("block"), col("c_id"),
          posexplode(slice(col("vec"), col("block") * subDim + 1, lit(subDim)))
            .as(Seq("pos", "comp")))
        .groupBy(col("block"), col("c_id"), col("pos"))
        // fixed-point micro means (the kmeansCentroids discipline):
        // exact integer sums → order-independent, engine-independent
        .agg(sum(floor(col("comp").cast("double") * lit(1000000.0))).as("s_micro"),
          count(lit(1)).as("n"))
        .withColumn("mval",
          col("s_micro").cast("double") / col("n").cast("double") / lit(1000000.0))
        .groupBy(col("block"), col("c_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mval")))).as("pairs"))
        .select(col("block"), col("c_id"),
          transform(col("pairs"), p => p.getField("mval")).as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
        .sortBy(t => (t._1, t._2)).toSeq
    }
    requireUniform(cents)
    flatOf(cents)
  }

  /** [[pqTrain]] memoized on content fingerprint + EVERY training
    * parameter (the [[kmeansCentroidsCached]] discipline, and the
    * graph-ANN advice fix applied from the start: a parameter left
    * out of the key is a silent stale-model serve waiting to happen).
    * The codebook is m·kCodes·subDim doubles — model-scale. Callers
    * whose training frame is DERIVED from a cheaper-to-hash source
    * (OPQ's rotated corpus, IVF-PQ's residuals) pass `keyBase` of the
    * SOURCE fingerprint plus the deterministic derivation tag, so the
    * warm path never re-materializes the derived frame just to hash
    * it — sound because the derivation is a pure function of the
    * source content and the keyed parameters.
    */
  private val pqModelCache =
    new scala.collection.concurrent.TrieMap[String, Array[Double]]
  def pqTrainCached(corpus: => DataFrame, m: Int, kCodes: Int, iters: Int,
                    dim: Int, keyBase: String): Array[Double] = {
    val key = s"$keyBase-pq-m$m-k$kCodes-i$iters-d$dim"
    if (pqModelCache.size > 64) pqModelCache.clear()
    pqModelCache.getOrElseUpdate(key, pqTrain(corpus, m, kCodes, iters, dim))
  }

  /** PQ-ADC approximate nearest neighbors with exact re-rank: encode
    * the corpus once (per-block argmin against the codebook — at
    * production scale this is a write-time step and only the m-byte
    * codes are resident), precompute each query's asymmetric-distance
    * lookup table (m×k codeword distances — tiny, broadcast), score
    * every corpus code by m table lookups, shortlist per query, and
    * re-rank the shortlist EXACTLY by cosine. The expensive exact
    * math touches only `shortlist` candidates per query; everything
    * before it reads compressed codes, never the float vectors.
    *
    * `shortlist` is the recall knob and is CONSTANT per query — ADC
    * noise doesn't shrink as the corpus grows, so on corpora without
    * low-dimensional structure the recall at a fixed shortlist decays
    * slowly with N; size it to the recall target (the swept defaults
    * hold recall@10 ≥ 0.9 mean on the 500-vector test corpus).
    */
  /** HOF reference formulation of PQ encoding — the executable spec
    * the codegen kernel is proven bitwise-equal against.
    */
  def pqEncodeHof(vec: Column, flat: Array[Double], m: Int, kCodes: Int,
                  subDim: Int): Column = {
    val cbLit = typedLit(flat.toSeq)
    def dist(b: Column, c: Column): Column =
      aggregate(sequence(lit(0), lit(subDim - 1)), lit(0.0), (acc, i) => {
        val x = element_at(vec, b * subDim + i + 1).cast("double")
        val w = element_at(cbLit, (b * lit(kCodes) + c) * subDim + i + 1)
        acc + (x - w) * (x - w)
      })
    transform(sequence(lit(0), lit(m - 1)), b =>
      element_at(array_sort(transform(sequence(lit(0), lit(kCodes - 1)), c =>
        struct(dist(b, c).as("d"), c.as("c")))), 1).getField("c"))
  }

  /** ADC shortlist stage shared by the flat-PQ family ([[annPq]],
    * [[annOpq]]): encode the corpus (compiled one-pass kernel),
    * broadcast each query's m×kCodes distance lookup table, score
    * every code row with m table lookups, keep the `shortlist` best
    * per query. Carries ONLY (query_id, vec_id, codes-derived score)
    * — the float vectors are fetched afterwards for just the
    * shortlisted ids, preserving PQ's memory premise.
    */
  private def pqAdcShortlist(queries: DataFrame, corpus: DataFrame,
                             flat: Array[Double], m: Int, kCodes: Int,
                             subDim: Int, shortlist: Int): DataFrame = {
    val cbLit = typedLit(flat.toSeq)

    // per-block squared distance between a slice of `v` and codeword c
    def blockDist(v: Column, b: Column, c: Column): Column =
      aggregate(sequence(lit(0), lit(subDim - 1)), lit(0.0), (acc, i) => {
        val x = element_at(v, b * subDim + i + 1).cast("double")
        val w = element_at(cbLit, (b * lit(kCodes) + c) * subDim + i + 1)
        acc + (x - w) * (x - w)
      })

    // corpus encoding: one compiled pass per vector (distance ties
    // break to the lower code — bitwise parity with the HOF
    // formulation in pqEncodeHof is spec-proven)
    val encoded = corpus.select(col("vec_id"),
      graft.functions.PqEncode(col("vec"), flat.toSeq, m, kCodes, subDim).as("codes"))

    // query LUT: distance from the query's block b slice to codeword c,
    // laid out [b*kCodes + c]
    val lutExpr = transform(sequence(lit(0), lit(m * kCodes - 1)), idx =>
      blockDist(col("qvec"), (idx / kCodes).cast("int"), idx % kCodes))
    val q = broadcast(queries.select(col("query_id"), lutExpr.as("lut")))

    val adcScore = graft.functions.AdcScore(col("codes"), col("lut"), kCodes)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    encoded.select(col("vec_id"), col("codes"))
      .join(q)
      .select(col("query_id"), col("vec_id"), adcScore.as("adist"))
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= shortlist)
      .select(col("query_id"), col("vec_id"))
  }

  /** Exact-cosine re-rank of a (query_id, vec_id) shortlist against
    * the ORIGINAL float vectors — the final stage of every
    * compressed-domain path.
    */
  private[operators] def exactRerank(shortlisted: DataFrame, queries: DataFrame,
                          corpus: DataFrame, k: Int): DataFrame = {
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    shortlisted
      .join(corpus.select(col("vec_id"), col("vec")), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qvec"))), "query_id")
      .select(col("query_id"), col("vec_id"),
        cosine(col("qvec"), col("vec")).as("score"))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), rnd4(col("score")).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  def annPq(queries: DataFrame, corpus: DataFrame, k: Int,
            m: Int = 8, kCodes: Int = 32, iters: Int = 2,
            dim: Int = 64, shortlist: Int = 200): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) or results are silently truncated")
    val flat = pqTrainCached(corpus, m, kCodes, iters, dim,
      VectorIndex.fingerprint(corpus, kCodes, iters))
    val shortlisted = pqAdcShortlist(queries, corpus, flat, m, kCodes, dim / m, shortlist)
    exactRerank(shortlisted, queries, corpus, k)
  }

  /** OPQ: flat PQ on PCA-ROTATED coordinates ([[OpqRotation]] — the
    * parametric OPQ solution: decorrelate, then deal the principal
    * directions into blocks balancing per-block variance). Train,
    * encode, and LUT all run in the rotated basis; the exact re-rank
    * reads the ORIGINAL floats, because rotation-about-the-mean
    * preserves L2 but NOT cosine, and the certified output contract
    * is cosine on the source vectors. The rotated corpus is
    * localCheckpoint'd once — train iterates over it and encode reads
    * it again, and re-deriving a dim² expression per pass would be
    * the classic re-evaluation trap (the [[annSq]] staging note).
    * At production scale the rotation is a write-time map stage and
    * only rotated codes are resident, exactly like flat PQ.
    */
  /** OPQ's frozen rotation model (PCA + balanced eigenvalue
    * allocation into `m` blocks, then micro-quantized) — the same
    * freeze-and-share discipline as [[bqMicroModel]], so the DuckDB
    * oracle replays the rotated-basis PQ pipeline with the identical
    * constants (r14).
    */
  private[graft] def opqMicroModel(corpus: DataFrame, m: Int, dim: Int)
      : (Array[Long], Array[Array[Long]]) = {
    val (mean, cov) = OpqRotation.meanCovarianceCached(corpus, "vec", dim)
    val (vals, vecs) = OpqRotation.jacobiEigen(cov)
    OpqRotation.microModel(mean, OpqRotation.allocatedRotation(vals, vecs, m))
  }

  def annOpq(queries: DataFrame, corpus: DataFrame, k: Int,
             m: Int = 8, kCodes: Int = 32, iters: Int = 2,
             dim: Int = 64, shortlist: Int = 200): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) or results are silently truncated")
    val (meanM, rotM) = opqMicroModel(corpus, m, dim)
    val mean = OpqRotation.fromMicros(meanM)
    val rot = rotM.map(OpqRotation.fromMicros)
    val corpusR = corpus
      .select(col("vec_id"), OpqRotation.rotateExpr(col("vec"), rot, mean).as("vec"))
      .localCheckpoint(true)
    // materialized for the same reason: the LUT expression reads
    // element_at(qvec, ·) m·kCodes·subDim times, and an unmaterialized
    // projection would re-inline the dim² rotation into every read
    val queriesR = queries
      .select(col("query_id"), OpqRotation.rotateExpr(col("qvec"), rot, mean).as("qvec"))
      .localCheckpoint(true)
    // keyed by SOURCE content + the deterministic rotation derivation —
    // the rotated checkpoint never needs hashing on the warm path
    val flat = pqTrainCached(corpusR, m, kCodes, iters, dim,
      VectorIndex.fingerprint(corpus, kCodes, iters) + "-opqrot")
    val shortlisted = pqAdcShortlist(queriesR, corpusR, flat, m, kCodes, dim / m, shortlist)
    exactRerank(shortlisted, queries, corpus, k)
  }

  /** Sign-bit packing of a (centered/rotated) vector into ONE 64-bit
    * word: bit i = 1 iff component i > 0, MSB-first. Requires
    * dim ≤ 64; wider embeddings generalize to an array of words (one
    * per 64 dims) with summed per-word Hamming.
    */
  private[operators] def signPack(vec: Column, dim: Int): Column = {
    require(dim <= 64, s"signPack packs one 64-bit word; dim $dim > 64")
    aggregate(sequence(lit(0), lit(dim - 1)), lit(0L), (acc, i) =>
      shiftleft(acc, 1).bitwiseOR(
        when(element_at(vec, i + 1) > lit(0.0f), lit(1L)).otherwise(lit(0L))))
  }

  /** BINARY-quantization ANN: PCA-rotate about the mean
    * ([[OpqRotation]] — ITQ's initialization, so the sign bits cut
    * the top variance directions), pack each vector's signs into one
    * long (dim=64 → 8 bytes/vector, 32× under int8 SQ and 256× under
    * float32), shortlist by Hamming distance (`bit_count(xor)` — one
    * codegen'd instruction pair per comparison), and re-rank the
    * survivors exactly on the source floats. The Hamming scan is the
    * cheapest compressed-domain pass this engine has: at 100 TB the
    * resident working set is 8 bytes/vector and the scan is pure
    * sequential xor/popcount, the same shape vector stores ship as
    * their "binary quantization" tier. Sign bits are the coarsest
    * code here, so the shortlist oversample is the recall knob, and
    * the driver-visible recall column prices that honestly.
    */
  /** The BQ family's frozen rotation model for `corpus`: PCA order
    * (eigenvalue descending, index tiebreak), micro-quantized
    * ([[OpqRotation.microModel]]) so the inline search, the persisted
    * index, AND the DuckDB oracle all apply the identical constants —
    * the r14 change that turns `vec_ann_bq`/`vec_ann_bq_index` from
    * rows-only into hash-certified: the oracle interpolates these
    * micros as literals and replays the whole post-rotation pipeline.
    */
  private[graft] def bqMicroModel(corpus: DataFrame, dim: Int)
      : (Array[Long], Array[Array[Long]]) = {
    val (mean, cov) = OpqRotation.meanCovarianceCached(corpus, "vec", dim)
    val (vals, vecs) = OpqRotation.jacobiEigen(cov)
    OpqRotation.microModel(mean,
      vals.indices.sortBy(i => (-vals(i), i)).map(vecs).toArray)
  }

  def annBq(queries: DataFrame, corpus: DataFrame, k: Int,
            dim: Int = 64, shortlist: Int = 320): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) or results are silently truncated")
    val (meanM, rotM) = bqMicroModel(corpus, dim)
    val mean = OpqRotation.fromMicros(meanM)
    val rot = rotM.map(OpqRotation.fromMicros)
    // STAGED: materialize the rotated array BEFORE sign extraction —
    // signPack reads element_at(·, i) dim times, and an unmaterialized
    // rotation would re-inline the dim² expression into every read
    // (the [[annOpq]] localCheckpoint barrier; measured 140 s → ~2 s
    // at sf0.1 when un-staged). Codes at rest: (vec_id, one long); at
    // production scale this is a write-time column and the floats stay
    // on disk until re-rank.
    val codes = corpus
      .select(col("vec_id"), OpqRotation.rotateExpr(col("vec"), rot, mean).as("rvec"))
      .localCheckpoint(true)
      .select(col("vec_id"), signPack(col("rvec"), dim).as("code"))
    val qCodes = broadcast(queries
      .select(col("query_id"), OpqRotation.rotateExpr(col("qvec"), rot, mean).as("rq"))
      .localCheckpoint(true)
      .select(col("query_id"), signPack(col("rq"), dim).as("qcode")))
    val wHam = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
    val shortlisted = codes.join(qCodes)
      .select(col("query_id"), col("vec_id"),
        Dedup.hamming(col("code"), col("qcode")).as("hamming"))
      .withColumn("hrank", row_number().over(wHam))
      .filter(col("hrank") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    exactRerank(shortlisted, queries, corpus, k)
  }

  /** IVF-PQ with RESIDUAL encoding — the composition the
    * billion-vector serving stacks standardize on (FAISS
    * `IndexIVFPQ`): coarse k-means cells bound the search to `nprobe`
    * partitions, and each vector stores only the PQ codes of its
    * RESIDUAL (vec − cell centroid). Residuals concentrate near the
    * origin, so the same code budget quantizes them far more finely
    * than raw vectors — the "residual refinement" upgrade over flat
    * [[annPq]]. Scoring is ADC per (query, probed cell): the query's
    * residual against THAT cell yields an m×kCodes lookup table
    * (tiny, broadcast with the probe list), every code row in the
    * cell scores with m table lookups, and only the `shortlist`
    * survivors fetch float vectors for the exact cosine re-rank.
    * At rest the index is codes + one label per vector (the
    * [[VectorIndex]] layout with codes instead of floats): the hot
    * scan reads m bytes per vector, floats only for shortlists.
    */
  /** Train both IVF-PQ stages: coarse centroids, then a PQ codebook
    * over the RESIDUALS against them.
    */
  private[operators] def ivfPqTrain(corpus: DataFrame, kClusters: Int,
                                    coarseIters: Int, m: Int, kCodes: Int,
                                    pqIters: Int, dim: Int)
      : (Seq[(Int, Seq[Double])], Array[Double]) = {
    val cents = kmeansCentroidsCached(corpus, kClusters, coarseIters)
    val flat = pqTrainCached(ivfPqResiduals(corpus, cents), m, kCodes, pqIters, dim,
      VectorIndex.fingerprint(corpus, kClusters, coarseIters) + "-resid")
    (cents, flat)
  }

  /** (vec_id, label, vec=residual-as-float32): the residual
    * materializes as an ATTRIBUTE before PQ training/encoding so the
    * per-element kernels never re-evaluate the zip_with (O(dim²) trap).
    */
  private[operators] def ivfPqResiduals(corpus: DataFrame,
                                        cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val centLit = typedLit(cents.sortBy(_._1).map(_._2))
    // position of the (possibly non-contiguous) surviving cell id
    val posMap = typedLit(cents.sortBy(_._1).map(_._1).zipWithIndex.toMap)
    corpus
      .select(col("vec_id"), col("vec"), nearestCentroidId(col("vec"), cents).as("label"))
      .select(col("vec_id"), col("label"),
        zip_with(col("vec"), element_at(centLit, element_at(posMap, col("label")) + 1),
          (x, c) => x.cast("double") - c).cast("array<float>").as("vec"))
  }

  /** (vec_id, label, codes): the at-rest shape of an IVF-PQ index. */
  private[operators] def ivfPqEncode(corpus: DataFrame, cents: Seq[(Int, Seq[Double])],
                                     flat: Array[Double], m: Int, kCodes: Int,
                                     dim: Int): DataFrame =
    ivfPqResiduals(corpus, cents).select(col("vec_id"), col("label"),
      graft.functions.PqEncode(col("vec"), flat.toSeq, m, kCodes, dim / m).as("codes"))

  /** Probe list: `nprobe` nearest cells per query, each row carrying
    * the query-residual ADC lookup table against THAT cell.
    */
  private[operators] def ivfPqProbes(queries: DataFrame, cents: Seq[(Int, Seq[Double])],
                                     flat: Array[Double], nprobe: Int, m: Int,
                                     kCodes: Int, dim: Int): DataFrame = {
    val subDim = dim / m
    val cbLit = typedLit(flat.toSeq)
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("c_score").desc, col("c_label").asc)
    val centDf = broadcast(
      queries.sparkSession.createDataFrame(
        cents.map { case (id, c) => (id, c) }
      ).toDF("c_label", "centroid"))
    def blockDist(v: Column, b: Column, c: Column): Column =
      aggregate(sequence(lit(0), lit(subDim - 1)), lit(0.0), (acc, i) => {
        val x = element_at(v, b * subDim + i + 1)
        val w = element_at(cbLit, (b * lit(kCodes) + c) * subDim + i + 1)
        acc + (x - w) * (x - w)
      })
    queries.select(col("query_id"), col("qvec"))
      .join(centDf)
      .select(col("query_id"), col("qvec"), col("c_label"),
        cosine(col("qvec"), col("centroid")).as("c_score"), col("centroid"))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nprobe)
      .select(col("query_id"), col("c_label").as("label"),
        zip_with(col("qvec"), col("centroid"), (x, c) => x.cast("double") - c).as("qres"))
      .select(col("query_id"), col("label"),
        transform(sequence(lit(0), lit(m * kCodes - 1)), idx =>
          blockDist(col("qres"), (idx / kCodes).cast("int"), idx % kCodes)).as("lut"))
  }

  /** ADC score + shortlist + exact-cosine re-rank over any
    * (vec_id, label, codes) relation — shared by the inline path and
    * the persisted [[VectorIndex]] layout (which feeds a
    * partition-pruned codes scan). `floats` supplies (vec_id, vec)
    * for the shortlist re-rank only.
    */
  private[operators] def ivfPqSearch(queries: DataFrame, codes: DataFrame,
                                     floats: DataFrame, probes: DataFrame,
                                     k: Int, m: Int, kCodes: Int,
                                     shortlist: Int): DataFrame = {
    val adcScore = graft.functions.AdcScore(col("codes"), col("lut"), kCodes)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    val shortlisted = codes
      .join(broadcast(probes), "label")
      .select(col("query_id"), col("vec_id"), adcScore.as("adist"))
      .withColumn("arank", row_number().over(wAdc))
      .filter(col("arank") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    shortlisted
      .join(floats.select(col("vec_id"), col("vec")), "vec_id")
      .join(broadcast(queries.select(col("query_id"), col("qvec"))), "query_id")
      .select(col("query_id"), col("vec_id"),
        cosine(col("qvec"), col("vec")).as("score"))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), rnd4(col("score")).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  def annIvfPq(queries: DataFrame, corpus: DataFrame, k: Int,
               kClusters: Int = 16, coarseIters: Int = 2, nprobe: Int = 12,
               m: Int = 8, kCodes: Int = 32, pqIters: Int = 2,
               dim: Int = 64, shortlist: Int = 100): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) or results are silently truncated")
    val (cents, flat) = ivfPqTrain(corpus, kClusters, coarseIters, m, kCodes, pqIters, dim)
    val encoded = ivfPqEncode(corpus, cents, flat, m, kCodes, dim)
    val probes = ivfPqProbes(queries, cents, flat, nprobe, m, kCodes, dim)
    ivfPqSearch(queries, encoded, corpus, probes, k, m, kCodes, shortlist)
  }

  /** Greedy k-center (farthest-point-first) coreset selection —
    * Gonzalez (1985), the 2-approximation every diverse-subset /
    * data-pruning recipe builds on: pick a budgeted subset whose
    * covering radius over the corpus is provably within 2× of
    * optimal, the primitive a training-data pipeline uses to prune a
    * near-duplicate-heavy corpus down to a coverage-maximizing
    * sample (complements the dedup family: dedup removes the
    * near-identical, k-center picks the spread-out survivors).
    *
    * Fully deterministic and cross-engine replayable: the seed is
    * the minimum (md5('kc:'‖id), id) hash rank — content-independent
    * — and every later round's argmax ties break by id, so a DuckDB
    * oracle unrolls the identical selection CTE-by-CTE.
    *
    * Scale shape: the running min-distance-to-selected column updates
    * INCREMENTALLY — each round is one map over the corpus
    * (`least(md, dist-to-new-center)`, the new center's vector a
    * literal) plus one 1-row argmax reduce; k rounds total, so cost
    * is k linear scans with NO shuffle of the corpus and nothing
    * pairwise. Each round's state is localCheckpointed so round i+1
    * scans the materialized round-i frame instead of re-running the
    * whole lineage (k scans, not k²). Distances are cosine
    * (1 − cos), computed in DOUBLE by the codegen'd kernel.
    *
    * Output: one row per selected center — (rank, vec_id, sel_dist)
    * where sel_dist is the center's distance to the previously
    * selected set at the moment of selection (the covering radius
    * sequence — non-increasing by construction; NULL for the seed),
    * rounded to 4 decimals for the cross-engine hash.
    *
    * Degenerate-input edge, mirrored by the oracle on purpose: if
    * k exceeds the number of DISTINCT non-zero vectors, every
    * remaining min-distance is 0 and the argmax (ties by id) re-emits
    * the lowest-id exhausted point — callers selecting a coreset
    * larger than their corpus get visible repeats, not a crash, and
    * both engines emit the identical sequence.
    */
  def kcenterSelect(embeddings: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val spark = embeddings.sparkSession
    import spark.implicits._
    // zero vectors have no cosine — excluded upfront (NaN would
    // otherwise win every DESC argmax, in both engines)
    val c = embeddings.select(col("vec_id"), col("embedding").as("vec"))
      .filter(dot(col("vec"), col("vec")) > 0)
    val seedId = c.select(col("vec_id"),
        md5(concat(lit("kc:"), col("vec_id").cast("string"))).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(1)
      .collect().head.getLong(0)
    def vecLit(v: Seq[Float]): Column = array(v.map(x => lit(x)): _*)
    val seedVec = c.filter(col("vec_id") === seedId)
      .select(col("vec")).head().getSeq[Float](0)
    val out = scala.collection.mutable.ListBuffer[(Long, Long, Option[Double])](
      (1L, seedId, None))
    var state = c.select(col("vec_id"), col("vec"),
        (lit(1.0) - cosine(vecLit(seedVec), col("vec"))).as("md"))
      .localCheckpoint(true)
    var round = 2
    while (round <= k) {
      val next = state.filter(col("md").isNotNull)
        .orderBy(col("md").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("md"), col("vec")).collect().head
      val nid = next.getLong(0)
      out += ((round.toLong, nid,
        Some(math.floor(next.getDouble(1) * 10000.0 + 0.5) / 10000.0)))
      val nv = next.getSeq[Float](2)
      state = state.select(col("vec_id"), col("vec"),
          least(col("md"), lit(1.0) - cosine(vecLit(nv), col("vec"))).as("md"))
        .localCheckpoint(true)
      round += 1
    }
    out.toSeq.toDF("rank", "vec_id", "sel_dist")
      .orderBy(col("rank"))
  }

  /** Per-query recall@k vs exact brute force on the same frames,
    * attached as a constant `recall_at_k` column — the driver's
    * rows-only artifact then certifies retrieval QUALITY, not just
    * row counts (ScalaTest asserts the floors). The truth set is one
    * extra broadcast-kNN pass; the per-query hit counts are a tiny
    * aggregation broadcast back onto the ANN result.
    */
  def withRecallAt(ann: DataFrame, queries: DataFrame, corpus: DataFrame,
                   k: Int): DataFrame = {
    val truth = truthFor(queries, corpus, k)
    val hits = ann.select(col("query_id"), col("vec_id"))
      .join(truth, Seq("query_id", "vec_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("_hits"))
    ann.join(broadcast(hits), Seq("query_id"), "left")
      .withColumn(s"recall_at_$k",
        coalesce(col("_hits"), lit(0L)).cast("double") / lit(k.toDouble))
      .drop("_hits")
      .orderBy(col("query_id"), col("rank"))
  }

  /** Brute-force truth memo for [[withRecallAt]]: every ANN family
    * member certifies against the SAME (queries, corpus, k) truth
    * set, so one bench/driver pass otherwise recomputes an identical
    * broadcast-kNN dozens of times. Keyed by the canonicalized plans'
    * semantic hashes with a `sameResult` guard (a hash collision must
    * degrade to a rebuild, never to the wrong truth), weakly per
    * session, and the value is materialized — k·|Q| rows — so reuse
    * costs nothing. The truth is certification scaffolding: the SERVE
    * path's cost is untouched, and correctness is unaffected because
    * the memoized frame is the same deterministic result the inline
    * computation produces.
    */
  private val truthMemo =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(Int, Int, Int),
        List[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
              org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame)]]]()

  private def truthFor(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val perSession = truthMemo.synchronized {
      var m = truthMemo.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int),
          List[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame)]]()
        truthMemo.put(spark, m)
      }
      m
    }
    val (qp, cp) = (queries.queryExecution.analyzed, corpus.queryExecution.analyzed)
    val key = (qp.semanticHash(), cp.semanticHash(), k)
    perSession.compute(key, { (_, prev) =>
      val bucket = if (prev == null) Nil else prev
      if (bucket.exists { case (q0, c0, _) => q0.sameResult(qp) && c0.sameResult(cp) }) bucket
      else (qp, cp,
        knnBrute(queries, corpus, k).select(col("query_id"), col("vec_id"))
          .localCheckpoint(true)) :: bucket
    }).collectFirst {
      case (q0, c0, df) if q0.sameResult(qp) && c0.sameResult(cp) => df
    }.get
  }

  // ---- SparkEntry query wrappers over the embeddings table ----

  private def querySet(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  private def corpusSet(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"), col("label"))

  /** Oracle-checked exact kNN: 10 queries × corpus, top-10 cosine. */
  def knnQuery(s: SparkSession, dir: String): DataFrame =
    knnBrute(querySet(s, dir), corpusSet(s, dir), k = 10)

  /** Oracle-checked matryoshka ladder: recall@10 of prefix-dim
    * retrieval at 8/16/32/64 of the 64 components. Fully
    * cross-engine-certified — prefixes, both rankings, the truth set
    * and the recall column all re-derive in DuckDB (list_slice +
    * list_cosine_similarity), like [[annSq]]'s certification.
    */
  def matryoshkaQuery(s: SparkSession, dir: String): DataFrame =
    matryoshkaRecall(querySet(s, dir), corpusSet(s, dir),
      dims = Seq(8, 16, 32, 64), k = 10)
      .withColumnRenamed("recall_at_k", "recall_at_10")

  /** LSH ANN over the same query set (rows check + driver-visible
    * recall_at_10 column; floors asserted in ScalaTest).
    */
  def annLshQuery(s: SparkSession, dir: String): DataFrame = {
    val (q, c) = (querySet(s, dir), corpusSet(s, dir))
    withRecallAt(annLsh(q, c, k = 10), q, c, k = 10)
  }

  /** IVF ANN probing 8 of the 10 label partitions. The supplied
    * `label` column is a WEAK partitioner for cosine proximity on
    * this corpus (labels weren't learned from the geometry), so the
    * production recall floor costs a high probe fraction here; the
    * learned-centroid paths ([[annIvfKmeans]], [[VectorIndex]]) are
    * the fair cost/recall points.
    */
  def annIvfQuery(s: SparkSession, dir: String): DataFrame = {
    val (q, c) = (querySet(s, dir), corpusSet(s, dir))
    withRecallAt(annIvf(q, c, k = 10, nprobe = 8), q, c, k = 10)
  }

  /** IVF ANN over learned k-means clusters. */
  def annKmeansQuery(s: SparkSession, dir: String): DataFrame = {
    val (q, c) = (querySet(s, dir), corpusSet(s, dir))
    withRecallAt(annIvfKmeans(q, c, k = 10), q, c, k = 10)
  }

  /** PQ-ADC ANN with exact re-rank (compression asserted in
    * ScalaTest).
    */
  def annPqQuery(s: SparkSession, dir: String): DataFrame = {
    val (q, c) = (querySet(s, dir), corpusSet(s, dir))
    withRecallAt(annPq(q, c, k = 10), q, c, k = 10)
  }

  /** OPQ ANN (PCA rotation + eigenvalue allocation ahead of PQ) over
    * the same query set — rows + driver-visible recall_at_10; the
    * spec floors it and pins the rotation's isometry/orthogonality.
    */
  def annOpqQuery(s: SparkSession, dir: String): DataFrame = {
    val (q, c) = (querySet(s, dir), corpusSet(s, dir))
    withRecallAt(annOpq(q, c, k = 10), q, c, k = 10)
  }

  /** Binary-quantization ANN (PCA-rotated sign bits, Hamming
    * shortlist) — rows + driver-visible recall_at_10; spec floors it
    * and pins the packing.
    */
  def annBqQuery(s: SparkSession, dir: String): DataFrame = {
    val (q, c) = (querySet(s, dir), corpusSet(s, dir))
    withRecallAt(annBq(q, c, k = 10), q, c, k = 10)
  }

  /** Scalar-quantized int8 ANN with exact re-rank. */
  def annSqQuery(s: SparkSession, dir: String): DataFrame = {
    val (q, c) = (querySet(s, dir), corpusSet(s, dir))
    withRecallAt(annSq(q, c, k = 10), q, c, k = 10)
  }

  /** IVF-PQ residual ANN (rows + recall_at_10; floor in ScalaTest),
    * served from the PERSISTED codes-at-rest layout — spec-proven
    * equal to the inline-trained [[annIvfPq]] (VectorIndexSpec), so
    * the recall certification covers both; the first run builds the
    * fingerprint-keyed index, every later run is a metadata check +
    * pruned codes scan.
    */
  def annIvfPqQuery(s: SparkSession, dir: String): DataFrame = {
    val (q, c) = (querySet(s, dir), corpusSet(s, dir))
    val idx = VectorIndex.buildPqIfAbsent(c,
      s"${System.getProperty("java.io.tmpdir")}/graft-ivfpq-cache")
    withRecallAt(VectorIndex.queryPq(s, idx, q, c, k = 10), q, c, k = 10)
  }

  /** The nprobe-vs-recall CURVE of the learned-k-means IVF path — the
    * cost/recall tradeoff as a driver-visible artifact instead of a
    * hand-run sweep. ONE train + ONE truth pass produce every point:
    * each true top-k neighbor is tagged with the RANK its cell holds
    * in its query's probe order (= the minimum nprobe that reaches
    * it), and recall@nprobe for all nprobe at once is a cumulative
    * count over that rank — never one search per curve point. The
    * artifact certifies itself: probing every cell IS brute force, so
    * the last row must read exactly 1.0 (spec-pinned), and the curve
    * must be nondecreasing in nprobe.
    */
  def annRecallCurve(queries: DataFrame, corpus: DataFrame, k: Int,
                     kClusters: Int = 16, iters: Int = 2): DataFrame = {
    val cents = kmeansCentroidsCached(corpus, kClusters, iters)
    val labeledFull = corpus.select(col("vec_id"), col("vec"),
      nearestCentroidId(col("vec"), cents).as("label"))
    val labeled = labeledFull.select(col("vec_id"), col("label"))
    val spark = queries.sparkSession
    // probe ranking must mirror the SEARCH path exactly: annIvf ranks
    // cells by the per-label MEAN of the labeled corpus (not the
    // k-means training centroids), so the curve's point at the shipped
    // nprobe equals the measured recall of the real query by
    // construction
    val meanCents = labelMeanCentroids(labeledFull.select(col("label"), col("vec")))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("c_score").desc, col("c_label").asc)
    val cellRank = queries.select(col("query_id"), col("qvec"))
      .join(broadcast(meanCents))
      .select(col("query_id"), col("c_label"),
        cosine(col("qvec"), col("centroid")).as("c_score"))
      .withColumn("c_rank", row_number().over(probeW))
      .select(col("query_id"), col("c_label").as("label"), col("c_rank"))
    // every true neighbor tagged with the minimum nprobe reaching it
    val truthRanked = knnBrute(queries, corpus, k)
      .select(col("query_id"), col("vec_id"))
      .join(labeled, "vec_id")
      .join(cellRank, Seq("query_id", "label"))
    val nQueries = queries.count().toDouble
    // hits at EXACTLY rank r, then one cumulative window over the ≤
    // kClusters aggregated rows gives the whole curve
    val perRank = truthRanked.groupBy(col("c_rank")).agg(count(lit(1)).as("h"))
    val full = spark.createDataFrame((1 to kClusters).map(Tuple1(_))).toDF("nprobe")
      .join(perRank.withColumnRenamed("c_rank", "nprobe"), Seq("nprobe"), "left")
      .select(col("nprobe"), coalesce(col("h"), lit(0L)).as("h"))
    val cum = Window.orderBy(col("nprobe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full
      .select(col("nprobe").cast("long").as("nprobe"),
        rnd4(sum(col("h")).over(cum).cast("double") / lit(k.toDouble) / lit(nQueries))
          .as("recall_at_k"))
      .orderBy(col("nprobe"))
  }

  /** Driver query: the kmeans-IVF recall curve over the standard
    * frames (rows-only; the 1.0 endpoint and monotonicity are the
    * in-row certification, spec-pinned).
    */
  def annCurveQuery(s: SparkSession, dir: String): DataFrame =
    annRecallCurve(querySet(s, dir), corpusSet(s, dir), k = 10)
}
