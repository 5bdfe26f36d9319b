package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PERSISTED IVF index — the build-once / query-many serving shape
  * the inline ANN paths only simulate. `build` learns k-means coarse
  * centroids (map-stage argmin training, [[VectorOps.kmeansCentroids]])
  * and writes the corpus PARTITIONED BY cluster label, so the index
  * directory layout IS the inverted file: a query's `nprobe` cluster
  * filter is a static partition predicate and Spark prunes the
  * unprobed directories out of the scan entirely — at 100 TB a
  * 16-of-1024-cluster probe reads ~1.6 % of the files, not all of
  * them (the spec asserts `inputFiles` shrinks). Centroids persist
  * beside the vectors as the (tiny) model table.
  *
  * Ids: only probe LABELS (≤ kClusters ints — model metadata, not
  * data rows) ever reach the driver, to become the literal partition
  * filter; vectors never do.
  */
object VectorIndex {

  /** Learn centroids and lay the corpus out as an inverted file.
    * `corpus` needs (vec_id, vec); any OTHER columns (metadata the
    * filtered-query path predicates on) ride along into the partition
    * layout, so a metadata filter over the index is a column-pruned
    * parquet predicate, never a join back to a side table.
    */
  def build(corpus: DataFrame, indexDir: String,
            kClusters: Int = 16, iters: Int = 2): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = VectorOps.kmeansCentroids(corpus, kClusters, iters)
    // cluster by label before the partitioned write: one file per
    // cell instead of cells x upstream-partitions tiny files (see
    // CollectionData.buildAnnIndex - same layout rationale)
    corpus.withColumn("label", VectorOps.nearestCentroidId(col("vec"), cents))
      .repartition(col("label"))
      .write.mode("overwrite").partitionBy("label")
      .parquet(s"$indexDir/vectors")
    cents.toDF("c_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
  }

  /** Content fingerprint of (corpus, build params): an order-independent
    * XOR of per-row hashes plus the row count, in ONE map-side-partial
    * aggregation pass. Build-once/query-many is the whole point of a
    * persisted index — rebuilding because the caller can't prove the
    * corpus is unchanged wastes a full training + write pass, and at
    * 100 TB that's the difference between a metadata check and a
    * multi-hour job.
    */
  def contentHash(corpus: DataFrame): String = {
    val row = corpus
      .select(xxhash64(col("vec_id").cast("string"), col("vec").cast("string")).as("h"))
      .agg(expr("coalesce(bit_xor(h), 0L)").as("x"), count(lit(1)).as("n"))
      .head()
    f"${row.getLong(0)}%016x-${row.getLong(1)}x"
  }

  def fingerprint(corpus: DataFrame, kClusters: Int, iters: Int): String = {
    // the column set is part of the identity: the same vectors with
    // and without metadata columns are DIFFERENT layouts on disk, and
    // resolving one for the other would break the filtered-query path.
    // AlgoVersion versions the TRAINING ALGORITHM — a
    // parameter-identical index built by an older trainer must never
    // be served for the new one.
    val cols = f"${corpus.columns.mkString(",").hashCode}%08x"
    s"${contentHash(corpus)}-c$cols-k$kClusters-i$iters-$AlgoVersion"
  }

  /** Version tag of the model trainers baked into every index cache
    * key that depends on trained centroids or codebooks. Bump
    * whenever [[VectorOps.kmeansCentroids]]'s or
    * [[VectorOps.pqTrain]]'s math changes (seeding, mean arithmetic)
    * — content+params alone cannot distinguish two trainers, and a
    * stale hit silently serves the old model's artifact. a2 =
    * md5-seeded fixed-point k-means; a3 = the same discipline in the
    * PQ codebook trainer (both r7). a4 = cluster-by-label physical
    * layout (one file per cell, r8) — results are identical, but the
    * old many-files-per-cell artifacts must not be served as if they
    * had the new layout's scan cost. a5 = corpus-derived graph search
    * budget recorded in the artifact (`params` table + log-law entry
    * count, r9) and the lexical tier's filter-evaluable `docs` table
    * — pre-a5 artifacts lack both relations and must rebuild. a6 =
    * the lexical stats table gains `tok_docs` (token-bearing doc
    * count, avgdl's exact denominator under empty documents, r9) —
    * an a5 stats file lacks the column and must rebuild. a7 = the
    * graph tier becomes a LAYERED hierarchy (r10): `levels` +
    * `edges_l*` relations, `entries` = top-layer membership instead
    * of centroid-nearest ids, `params` gains `maxlevel` — an a6
    * graph artifact has none of these and must rebuild. a8 = the
    * base layer gains the symmetrize + 3M-recap navigability pass
    * and the collgraph key gains the effective layer count (r10
    * calibration) — mid-r10 a7 artifacts predate both. a9 = the
    * graph tier's DEDUP-AWARE build (r11): the hierarchy is built
    * over near-dup group representatives, the artifact gains the
    * `groups` relation and `params` gains `ngroups` — an a8 serve
    * reading an a9 artifact (or vice versa) would miss whole groups.
    * a10 = banded leave-one-out grouping candidacy + adaptive
    * signature width in the kNN build (r12) — an a9 graph artifact
    * groups strictly less and, past 8,192 rows, has a degenerate
    * base layer.
    *
    * r12 split: the GRAPH tier versions independently as
    * [[GraphAnn.GraphAlgoVersion]] — graph-only changes (a7..a10
    * were all graph work) were retiring every trained-model artifact
    * (IVF/lex/PQ) for no reason, and at a 50-minute 10⁶-row k-means
    * rebuild that ops cost is real. This value now versions ONLY the
    * trained-model tiers (IVF coarse quantizer, lexical stats, PQ
    * codebooks); bump it when THEIR math changes — which it has NOT
    * since a9 (a10's banded-candidacy bump was graph-only too, the
    * r12 review caught the residue), so existing a9 trained
    * artifacts stay valid. r13's sampled-k-means change is scoped
    * the same way in the OTHER direction: it touches only the
    * collection IVF trainer, so it versions through the collivf
    * key's own trainer segment
    * ([[graft.catalog.CollectionData.IvfTrainerVersion]]) instead of
    * retiring every lexical/PQ/dedup/flat-ANN artifact through this
    * shared value — the identical mistake the r12 split fixed for
    * graph bumps.
    */
  val AlgoVersion = "a9"

  /** INCREMENTAL maintenance: assign `delta` to the FROZEN coarse
    * centroids and append to the label partitions — an O(delta)
    * ingest with no retrain and no rewrite of resident postings,
    * pairing with the incremental dedup path for the end-to-end
    * "new data arrives daily" story. Frozen centroids are the
    * standard IVF append contract: the partition function must stay
    * stable or every resident vector would need reassignment; recall
    * drifts only as the DATA distribution drifts, and the rebuild
    * threshold is an ops policy, not an engine constraint. The
    * completion marker is rewritten with the appended-state
    * fingerprint so the directory self-describes; append is for
    * caller-owned index dirs — a cache entry under [[buildIfAbsent]]
    * is addressed by its ORIGINAL corpus content and must not be
    * mutated in place.
    */
  def appendDelta(spark: SparkSession, indexDir: String, delta: DataFrame): Unit = {
    val cents = IndexCache.readCached(spark, s"$indexDir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    delta.withColumn("label", VectorOps.nearestCentroidId(col("vec"), cents))
      .repartition(col("label")) // one file per touched cell per delta
      .write.mode("append").partitionBy("label")
      .parquet(s"$indexDir/vectors")
    IndexCache.invalidate(s"$indexDir/vectors") // appended: cached file index is stale
    val marker = java.nio.file.Paths.get(indexDir, "_INDEX_OK")
    if (java.nio.file.Files.exists(marker)) {
      val prev = new String(java.nio.file.Files.readAllBytes(marker))
      java.nio.file.Files.write(marker,
        s"$prev+delta:${contentHash(delta)}".getBytes)
    }
  }

  /** Idempotent build: derives the index directory from the corpus
    * fingerprint under `indexRoot` and builds ONLY if that exact
    * (content, params) index is not already present and complete
    * (marker file). Returns the index dir. Crash-safe: builds into a
    * scratch dir and renames into place, marker written last.
    */
  def buildIfAbsent(corpus: DataFrame, indexRoot: String,
                    kClusters: Int = 16, iters: Int = 2): String =
    IndexCache.getOrBuild(indexRoot, "ivf", fingerprint(corpus, kClusters, iters)) {
      scratch => build(corpus, scratch.toString, kClusters, iters)
    }

  /** The probed scan: vectors of the union of every query's `nprobe`
    * nearest clusters, with the partition filter applied as LITERALS
    * so directory pruning happens at planning time.
    */
  private[operators] def probedVectors(spark: SparkSession, indexDir: String,
                                       queries: DataFrame, nprobe: Int): DataFrame = {
    val cents = broadcast(IndexCache.readCached(spark, s"$indexDir/centroids"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("c_score").desc, col("c_id").asc)
    val probeLabels = queries.select(col("query_id"), col("qvec"))
      .join(cents)
      .select(col("query_id"), col("c_id"),
        VectorOps.cosine(col("qvec"), col("centroid")).as("c_score"))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nprobe)
      .select(col("c_id")).distinct()
      .collect().map(_.getInt(0)).sorted // model-scale: ≤ kClusters ints
    IndexCache.readCached(spark, s"$indexDir/vectors")
      .filter(col("label").isin(probeLabels: _*))
  }

  /** Top-k by cosine over only the probed partitions — the same
    * probe-rank-window tail as the inline IVF path.
    */
  def query(spark: SparkSession, indexDir: String, queries: DataFrame,
            k: Int, nprobe: Int = 12): DataFrame = {
    val cents = broadcast(IndexCache.readCached(spark, s"$indexDir/centroids"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("c_score").desc, col("c_id").asc)
    // ONE execution of the probe ranking (r14, guide §2.4): the
    // per-query cell ranking used to run twice — once inside
    // [[probedVectors]]'s label collect, once more in-plan as the
    // scoring join's broadcast build. Collect the model-scale
    // (query_id, c_id) assignment once, derive the literal partition
    // filter from the same rows, and re-inject them as a LOCAL
    // relation; qvec re-attaches from the (already tiny) queries
    // frame. Values identical — one materialization of one
    // deterministic plan.
    val probes = queries.select(col("query_id"), col("qvec"))
      .join(cents)
      .select(col("query_id"), col("c_id"),
        VectorOps.cosine(col("qvec"), col("centroid")).as("c_score"))
      .withColumn("c_rank", row_number().over(probeW))
      .filter(col("c_rank") <= nprobe)
      .select(col("query_id"), col("c_id"))
    val probeRows = probes.collect()
    val probeLabels = probeRows.map(_.getInt(1)).distinct.sorted
    val probesLocal = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probes.schema)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    IndexCache.readCached(spark, s"$indexDir/vectors")
      .filter(col("label").isin(probeLabels.map(_.asInstanceOf[Any]): _*))
      .join(broadcast(probesLocal), col("label") === col("c_id"))
      .join(broadcast(queries.select(col("query_id"), col("qvec"))), "query_id")
      .select(col("query_id"), col("vec_id"),
        VectorOps.cosine(col("qvec"), col("vec")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        CrossEngine.rnd4(col("score")).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** FILTERED ANN probe plan: per query, the shortest prefix of its
    * centroid-ranked cells whose cumulative count of PREDICATE-MATCHING
    * vectors reaches `need` — with zero-match cells skipped outright.
    * The per-cell match counts come from one count-only scan of the
    * index that reads just the filter columns (parquet column pruning;
    * the vectors never leave disk) and returns ≤ kClusters rows — at
    * production scale this is the per-segment posting-stats pass a
    * serving layer runs at ingest, amortized across every query that
    * reuses the predicate. Probe depth then ADAPTS to selectivity:
    * loose filters probe the usual few cells, selective filters probe
    * deeper, and an ultra-selective filter (total matches ≤ `need`)
    * degenerates to exact search over exactly the matching cells —
    * the brute-force-the-survivors hybrid, reached by construction
    * rather than by a special case.
    */
  private[operators] def filteredProbePlan(spark: SparkSession, indexDir: String,
                                           queries: DataFrame, predicate: org.apache.spark.sql.Column,
                                           need: Long, minCells: Int = 4): DataFrame = {
    val cellStats = IndexCache.readCached(spark, s"$indexDir/vectors")
      .filter(predicate)
      .groupBy(col("label").as("c_id")).agg(count(lit(1)).as("n_match"))
    val cents = broadcast(IndexCache.readCached(spark, s"$indexDir/centroids"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("c_score").desc, col("c_id").asc)
    val cumW = Window.partitionBy(col("query_id"))
      .orderBy(col("c_rank").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    queries.select(col("query_id"), col("qvec"))
      .join(cents)
      .select(col("query_id"), col("c_id"),
        VectorOps.cosine(col("qvec"), col("centroid")).as("c_score"))
      .join(broadcast(cellStats), Seq("c_id"), "left")
      .withColumn("n_match", coalesce(col("n_match"), lit(0L)))
      .filter(col("n_match") > 0) // a cell with no survivors has no candidates
      .withColumn("c_rank", row_number().over(probeW))
      .withColumn("cum_before", coalesce(sum(col("n_match")).over(cumW), lit(0L)))
      // first prefix reaching `need`, but never fewer than `minCells`
      // matching cells: when the filter decimates a query's own
      // neighborhood, its true neighbors scatter across cells and a
      // count-satisfied 1-cell probe would miss them
      .filter(col("cum_before") < need || col("c_rank") <= minCells)
      .select(col("query_id"), col("c_id"))
  }

  /** Metadata-filtered top-k over the persisted index — the
    * `collection.query(where=..., n_results=k)` shape at IVF scale.
    * The predicate (compile Chroma `where` JSON via
    * [[WhereFilter.compile]], or pass any Column) is pushed into the
    * SAME pruned scan that the probe plan restricts: partition
    * pruning drops unprobed cell directories at planning time, the
    * row predicate prunes within them, and only then do vectors get
    * scored. `oversample` sets the candidate target per query
    * (`need = oversample × k`) — the recall knob, certified by the
    * driver-visible recall column vs filtered brute force.
    */
  def queryFiltered(spark: SparkSession, indexDir: String, queries: DataFrame,
                    predicate: org.apache.spark.sql.Column, k: Int,
                    oversample: Int = 16): DataFrame = {
    val plan = filteredProbePlan(spark, indexDir, queries, predicate,
      need = oversample.toLong * k)
    // ONE execution of the adaptive probe plan (r14, guide §2.4): it
    // used to run twice — collected for the literal partition filter
    // and re-executed in-plan (match-count scan included) as the
    // candidate join's broadcast build. Collect the model-scale
    // (query_id, c_id) rows once and re-inject them as a LOCAL
    // relation; values identical by construction.
    val planRows = plan.collect()
    val probeLabels = planRows.map(_.getInt(1)).distinct.sorted // ≤ kClusters ints
    val planLocal = spark.createDataFrame(
      java.util.Arrays.asList(planRows: _*), plan.schema)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    IndexCache.readCached(spark, s"$indexDir/vectors")
      .filter(col("label").isin(probeLabels.map(_.asInstanceOf[Any]): _*))
      .filter(predicate)
      .join(broadcast(planLocal.join(queries.select(col("query_id"), col("qvec")), "query_id")),
        col("label") === col("c_id"))
      .select(col("query_id"), col("vec_id"),
        VectorOps.cosine(col("qvec"), col("vec")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        CrossEngine.rnd4(col("score")).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Persisted IVF-PQ index: the [[build]] layout with CODES at rest
    * instead of floats — each label partition stores (vec_id, codes)
    * at m bytes of payload per vector (32× less than float32), and
    * the two model tables (centroids + flat PQ codebook) persist
    * beside them. The serving shape of the billion-vector stacks:
    * queries prune to `nprobe` partition DIRECTORIES at planning
    * time, scan only codes, and fetch floats (from the caller's base
    * table) for the shortlist re-rank alone.
    */
  def buildPq(corpus: DataFrame, indexDir: String,
              kClusters: Int = 16, coarseIters: Int = 2,
              m: Int = 8, kCodes: Int = 32, pqIters: Int = 2,
              dim: Int = 64): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (cents, flat) =
      VectorOps.ivfPqTrain(corpus, kClusters, coarseIters, m, kCodes, pqIters, dim)
    VectorOps.ivfPqEncode(corpus, cents, flat, m, kCodes, dim)
      .repartition(col("label")) // one file per cell (see build())
      .write.mode("overwrite").partitionBy("label")
      .parquet(s"$indexDir/codes")
    cents.toDF("c_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    Seq((m, kCodes, dim, flat.toSeq))
      .toDF("m", "k_codes", "dim", "flat")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebook")
  }

  /** Idempotent [[buildPq]]: fingerprint-keyed under `indexRoot`, the
    * codes twin of [[buildIfAbsent]] — built once per (corpus content,
    * model params), resolved by metadata check ever after.
    */
  def buildPqIfAbsent(corpus: DataFrame, indexRoot: String,
                      kClusters: Int = 16, coarseIters: Int = 2,
                      m: Int = 8, kCodes: Int = 32, pqIters: Int = 2,
                      dim: Int = 64): String = {
    // AlgoVersion is part of the identity: this index embeds BOTH
    // trained models (coarse centroids + PQ codebook), and a
    // parameter-identical artifact from an older trainer must miss —
    // the stale-serve this exact key once caused when the trainers
    // changed under it.
    val fp = s"${contentHash(corpus)}-k$kClusters-i$coarseIters" +
      s"-m$m-c$kCodes-p$pqIters-$AlgoVersion"
    IndexCache.getOrBuild(indexRoot, "ivfpq", fp) { scratch =>
      buildPq(corpus, scratch.toString, kClusters, coarseIters, m, kCodes,
        pqIters, dim)
    }
  }

  /** Query the persisted IVF-PQ layout: probe labels collect to the
    * driver (model metadata) and prune the codes scan to `nprobe`
    * partition directories at planning time; ADC + shortlist + exact
    * re-rank run through the shared [[VectorOps.ivfPqSearch]] tail.
    * `floats` supplies (vec_id, vec) for the re-rank — the base
    * table, not the index.
    */
  def queryPq(spark: SparkSession, indexDir: String, queries: DataFrame,
              floats: DataFrame, k: Int, nprobe: Int = 12,
              shortlist: Int = 100): DataFrame = {
    val cents = IndexCache.readCached(spark, s"$indexDir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val cb = IndexCache.readCached(spark, s"$indexDir/codebook").head()
    val (m, kCodes, dim) = (cb.getInt(0), cb.getInt(1), cb.getInt(2))
    val flat = cb.getSeq[Double](3).toArray
    val probes = VectorOps.ivfPqProbes(queries, cents, flat, nprobe, m, kCodes, dim)
    // ONE execution of the probe + ADC-table plan (r14, guide §2.4):
    // it used to run twice — collected for the literal partition
    // filter and re-executed in-plan inside ivfPqSearch. The rows are
    // |Q| × nprobe with an m·kCodes LUT each — model metadata — so
    // collect once and re-inject as a LOCAL relation; values
    // identical by construction.
    val probeRows = probes.collect()
    val probeLabels = probeRows.map(_.getInt(1)).distinct.sorted // ≤ kClusters ints
    val probesLocal = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probes.schema)
    val codes = IndexCache.readCached(spark, s"$indexDir/codes")
      .filter(col("label").isin(probeLabels.map(_.asInstanceOf[Any]): _*))
    VectorOps.ivfPqSearch(queries, codes, floats, probesLocal, k, m, kCodes, shortlist)
  }

  /** Incremental maintenance for the PQ layout: encode `delta`
    * against the FROZEN centroids AND the frozen codebook, append to
    * the label partitions — the codes twin of [[appendDelta]], same
    * O(delta) contract.
    */
  def appendDeltaPq(spark: SparkSession, indexDir: String, delta: DataFrame): Unit = {
    val cents = IndexCache.readCached(spark, s"$indexDir/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val cb = IndexCache.readCached(spark, s"$indexDir/codebook").head()
    val (m, kCodes, dim) = (cb.getInt(0), cb.getInt(1), cb.getInt(2))
    VectorOps.ivfPqEncode(delta, cents, cb.getSeq[Double](3).toArray, m, kCodes, dim)
      .repartition(col("label")) // one file per touched cell per delta
      .write.mode("append").partitionBy("label")
      .parquet(s"$indexDir/codes")
    IndexCache.invalidate(s"$indexDir/codes") // appended: cached file index is stale
  }

  /** PERSISTED BINARY-QUANTIZATION index — codes at rest for the
    * cheapest compressed-domain tier the engine has (8 bytes/vector,
    * sequential xor/popcount scan; see [[VectorOps.annBq]]). The
    * inline path re-derives the PCA rotation per session; at 100 TB
    * the build-once/query-many discipline [[buildPq]] demonstrates
    * must cover these sign-bit codes too, because BQ is the most
    * likely production scan tier. Layout: `codes` parquet
    * (vec_id, code LONG) + a one-row `model` table carrying the
    * centering mean and the row-major PCA rotation — queries and
    * delta appends encode against that FROZEN model, so persisted
    * search is bit-for-bit the inline search (spec) and appends never
    * shift resident codes.
    */
  def buildBq(corpus: DataFrame, indexDir: String, dim: Int = 64): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // the inline [[VectorOps.annBq]] rotation EXACTLY — PCA order,
    // micro-frozen (r14): the persisted model must be the same
    // constants the inline search and the DuckDB oracle apply
    val (meanM, rotM) = VectorOps.bqMicroModel(corpus, dim)
    val mean = OpqRotation.fromMicros(meanM)
    val rot = rotM.map(OpqRotation.fromMicros)
    encodeBq(corpus, rot, mean, dim)
      .write.mode("overwrite").parquet(s"$indexDir/codes")
    Seq((dim, mean.toSeq, rot.flatten.toSeq))
      .toDF("dim", "mean", "rot_flat")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/model")
  }

  /** Sign-pack `df`'s vectors under a FIXED rotation/mean. The
    * localCheckpoint is the same staging barrier as the inline path:
    * signPack reads element_at(rvec, i) dim times and an
    * unmaterialized rotation would re-inline the dim² matVec into
    * every read.
    */
  private def encodeBq(df: DataFrame, rot: Array[Array[Double]],
                       mean: Array[Double], dim: Int): DataFrame =
    df.select(col("vec_id"), OpqRotation.rotateExpr(col("vec"), rot, mean).as("rvec"))
      .localCheckpoint(true)
      .select(col("vec_id"), VectorOps.signPack(col("rvec"), dim).as("code"))

  private def readBqModel(spark: SparkSession,
                          indexDir: String): (Array[Array[Double]], Array[Double], Int) = {
    val m = IndexCache.readCached(spark, s"$indexDir/model").head()
    val dim = m.getInt(0)
    val mean = m.getSeq[Double](1).toArray
    val rot = m.getSeq[Double](2).toArray.grouped(dim).toArray
    (rot, mean, dim)
  }

  /** Idempotent [[buildBq]]: fingerprint-keyed under `indexRoot`.
    * AlgoVersion-tagged like every trained-model artifact key. */
  def buildBqIfAbsent(corpus: DataFrame, indexRoot: String, dim: Int = 64): String =
    // `q1` = the micro-frozen rotation model (r14) — scoped to the BQ
    // key so the model change retires only BQ artifacts, never the
    // PQ/IVF tiers that share AlgoVersion (the r12 version lesson)
    IndexCache.getOrBuild(indexRoot, "bq",
      s"${contentHash(corpus)}-d$dim-q1-$AlgoVersion") {
      scratch => buildBq(corpus, scratch.toString, dim)
    }

  /** Hamming shortlist over the STORED longs + exact re-rank on the
    * base table's floats — the [[VectorOps.annBq]] tail against the
    * at-rest codes and the frozen persisted model.
    */
  def queryBq(spark: SparkSession, indexDir: String, queries: DataFrame,
              floats: DataFrame, k: Int, shortlist: Int = 320): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) or results are silently truncated")
    val (rot, mean, dim) = readBqModel(spark, indexDir)
    val qCodes = broadcast(queries
      .select(col("query_id"), OpqRotation.rotateExpr(col("qvec"), rot, mean).as("rq"))
      .localCheckpoint(true)
      .select(col("query_id"), VectorOps.signPack(col("rq"), dim).as("qcode")))
    val wHam = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
    val shortlisted = IndexCache.readCached(spark, s"$indexDir/codes")
      .join(qCodes)
      .select(col("query_id"), col("vec_id"),
        Dedup.hamming(col("code"), col("qcode")).as("hamming"))
      .withColumn("hrank", row_number().over(wHam))
      .filter(col("hrank") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    VectorOps.exactRerank(shortlisted, queries, floats, k)
  }

  /** Incremental maintenance: encode `delta` with the FROZEN
    * persisted rotation and append — O(delta), resident codes
    * untouched, the [[appendDelta]]/[[appendDeltaPq]] contract for
    * the sign-bit tier.
    */
  def appendDeltaBq(spark: SparkSession, indexDir: String, delta: DataFrame): Unit = {
    val (rot, mean, dim) = readBqModel(spark, indexDir)
    encodeBq(delta, rot, mean, dim)
      .write.mode("append").parquet(s"$indexDir/codes")
    IndexCache.invalidate(s"$indexDir/codes") // appended: cached file index is stale
  }

  /** Driver query: build the index over the standard corpus in a
    * scratch dir, query the standard query set through the pruned
    * layout, and carry the same driver-visible recall column as the
    * other ANN queries.
    */
  /** The standard query/corpus frames for the index queries. The
    * embeddings table's own `label` column rides into the index as
    * metadata under the name `tag` — `label` is taken by the cluster
    * partition column, and the rename keeps the two namespaces
    * honest.
    */
  private def indexFrames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val emb = graft.Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"), col("label").as("tag"))
    (queries, corpus)
  }

  /** ONE index serves both the plain and the filtered query — the
    * mine-once/serve-many contract the co-purchase index set.
    */
  private def sharedIndexDir(corpus: DataFrame): String =
    buildIfAbsent(corpus,
      s"${System.getProperty("java.io.tmpdir")}/graft-ivf-cache")

  def annIvfIndexQuery(s: SparkSession, dir: String): DataFrame = {
    val (queries, corpus) = indexFrames(s, dir)
    // fingerprint-keyed cache root: the first run builds, every later
    // run (and every bench rep) resolves to the same completed index —
    // the build-once/query-many contract, exercised for real
    val indexDir = sharedIndexDir(corpus)
    VectorOps.withRecallAt(query(s, indexDir, queries, k = 10), queries, corpus, k = 10)
  }

  /** Driver query: metadata-filtered ANN over the shared persisted
    * index, predicate written in the Chroma `where` grammar and
    * compiled by [[WhereFilter]] — the reference's
    * `collection.query(where=..., n_results=k)` composition, served
    * at IVF scale. Recall is certified against FILTERED brute force
    * (the truth a post-filtering implementation degrades against).
    */
  def annIvfFilteredQuery(s: SparkSession, dir: String): DataFrame = {
    val (queries, corpus) = indexFrames(s, dir)
    val indexDir = sharedIndexDir(corpus)
    val pred = WhereFilter.compile("""{"tag": {"$in": [1, 3, 5, 7]}}""")
    val ann = queryFiltered(s, indexDir, queries, pred, k = 10)
    VectorOps.withRecallAt(ann, queries, corpus.filter(pred), k = 10)
  }

  /** Driver query: persisted-BQ search over the standard corpus,
    * fingerprint-cached build, recall certified the same way as the
    * inline `vec_ann_bq` (and by construction equal to it — the
    * persisted model IS the inline model, spec-pinned bit-for-bit).
    */
  def annBqIndexQuery(s: SparkSession, dir: String): DataFrame = {
    val (queries, corpus) = indexFrames(s, dir)
    val base = corpus.select(col("vec_id"), col("vec"))
    val indexDir = buildBqIfAbsent(base,
      s"${System.getProperty("java.io.tmpdir")}/graft-ivf-cache")
    VectorOps.withRecallAt(queryBq(s, indexDir, queries, base, k = 10),
      queries, corpus, k = 10)
  }
}
