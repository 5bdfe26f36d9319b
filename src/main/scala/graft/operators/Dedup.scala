package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection for training-data pipelines, in the four
  * standard flavors: MinHash+LSH, SimHash, exact thresholded n-gram
  * Jaccard (prefix filtering), and embedding-cosine near-dup. (Exact
  * dedup lives in [[TextAnalysis.dedupExact]].)
  *
  * Scale shape shared by all four: derive a compact per-document
  * signature in a map stage (codegen'd kernels / HOFs — no UDFs),
  * generate candidate pairs with ONE equi-join on a sparse key, then
  * verify candidates exactly. Nothing here ever compares all pairs:
  * the quadratic step is confined to key collisions, and every key
  * (LSH band of ≥16 bits, rarest-first prefix token) is sized so
  * collision groups stay small as the corpus grows.
  */
object Dedup {

  /** Which hash family signs the MinHash/SimHash pipelines.
    *
    *  - [[HashFamily.Md5Grid]] (the DEFAULT): 60-bit md5 base hashes,
    *    universal-hash permutations over p = 2³¹−1 with md5-grid
    *    constants, md5 band keys. Every signature, band key, estimate
    *    and verified pair is replayable in plain ANSI SQL — the
    *    certification family (the driver's DuckDB oracle replays the
    *    full pipeline). Cost: one md5 per shingle instead of one
    *    xxhash64 (the map stage only; the permutation inner loop is
    *    multiply-mod, CHEAPER than the xx family's per-perm hashLong).
    *  - [[HashFamily.Xx64]]: the original xxhash64 kernels — cheapest
    *    base hash, JVM-only signatures (no external replay). For
    *    operators who re-sign petabytes and don't need cross-engine
    *    certification.
    * Both families share every pipeline stage past the signing map;
    * the emitted pair sets differ only through LSH candidate
    * randomness, and each family's planted-duplicate recovery is
    * spec-floored.
    */
  sealed trait HashFamily
  object HashFamily {
    case object Xx64 extends HashFamily
    case object Md5Grid extends HashFamily
  }

  /** Distinct word n-gram shingles; short docs fall back to one
    * whole-doc shingle so no document vanishes from the pipeline.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** 64-permutation MinHash signature — delegates to the codegen'd
    * kernel ([[graft.functions.MinHashSignature]]); permutation i is
    * seeded re-hashing (`xxhash64(i, xxhash64(s))`) rather than
    * (a*x+b) mod p arithmetic, which would overflow-throw under ANSI
    * mode.
    */
  def minhashSignature(sh: Column, perms: Int = 64): Column =
    graft.functions.MinHashSignature(sh, perms)

  /** HOF reference formulation — retained as the executable spec the
    * codegen kernel is proven bitwise-equal against.
    */
  def minhashSignatureHof(sh: Column, perms: Int = 64): Column = {
    val hashes = transform(sh, s => xxhash64(s))
    transform(sequence(lit(0), lit(perms - 1)),
      i => array_min(transform(hashes, h => xxhash64(i, h))))
  }

  /** LSH band hashes: split the signature into `bands` rows of
    * `signature/bands` values; equal band-hash = candidate pair.
    */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",",
        transform(slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
          v => v.cast("string")))))

  /** Cross-engine band keys: md5 of the band's comma-joined decimal
    * values (all non-negative under the grid family, so the decimal
    * rendering is engine-independent). String keys join exactly like
    * the xx family's long keys; DuckDB replays them with the same
    * md5-of-joined-string formula.
    */
  def bandKeysMd5(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws(",",
        transform(slice(sig, b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
          v => v.cast("string")))))

  /** Cross-engine MinHash signature — delegates to the codegen'd grid
    * kernel ([[graft.functions.MinHashGridSignature]]); see there for
    * the md5-grid permutation law.
    */
  def minhashSignatureGrid(sh: Column, perms: Int = 64): Column =
    graft.functions.MinHashGridSignature(sh, perms)

  /** HOF reference formulation of the grid signature — derives the
    * permutation constants IN-PLAN from Spark's own `md5`/`conv`
    * builtins, i.e. from the exact SQL formula the DuckDB oracle
    * runs. The parity spec (kernel ≡ this) therefore proves the
    * kernel's JVM MessageDigest grid matches the SQL derivation bit
    * for bit — the cross-engine contract, executable.
    */
  def minhashSignatureGridHof(sh: Column, perms: Int = 64): Column = {
    val p = lit(graft.functions.MinHashGridSignature.P)
    def md60(s: Column): Column =
      conv(substring(md5(s), 1, 15), 16, 10).cast("long")
    val xs = transform(sh, h => h % p)
    transform(sequence(lit(0), lit(perms - 1)), i => {
      val a = md60(concat(lit("mh:a:"), i.cast("string"))) % (p - lit(1L)) + lit(1L)
      val b = md60(concat(lit("mh:b:"), i.cast("string"))) % p
      array_min(transform(xs, x => (a * x + b) % p))
    })
  }

  /** HOF reference for the md5 shingle hashes: the string shingle
    * chain hashed with the oracle's own `md5`/`conv` formula.
    */
  def shingleHashesMd5Hof(text: Column, n: Int): Column =
    array_distinct(transform(shingles(text, n),
      s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))

  /** HOF reference for the 60-bit SimHash — same md5-60 base hash and
    * little-endian `1 << b` packing as the kernel and the SQL twin.
    */
  def simhash60Column(text: Column): Column = {
    val toks = array_distinct(split(trim(text), "\\s+"))
    val hashes = transform(toks,
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val bits = array((0 until 60).map { b =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)) >= 0,
        shiftleft(lit(1L), b)).otherwise(lit(0L))
    }: _*)
    aggregate(bits, lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Exact Jaccard over two distinct-shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a).cast("double") + size(b).cast("double") - inter)
  }

  private def rnd4(c: Column): Column = CrossEngine.rnd4(c)

  // Family-dispatched kernels for the MinHash pipelines — the only
  // stage the families differ in; everything downstream is shared.
  private def shingleKernel(h: HashFamily, text: Column, n: Int): Column = h match {
    case HashFamily.Xx64    => graft.functions.ShingleHashes(text, n)
    case HashFamily.Md5Grid => graft.functions.ShingleHashesMd5(text, n)
  }
  private def signatureKernel(h: HashFamily, sh: Column, perms: Int): Column = h match {
    case HashFamily.Xx64    => minhashSignature(sh, perms)
    case HashFamily.Md5Grid => minhashSignatureGrid(sh, perms)
  }
  private def bandKernel(h: HashFamily, sig: Column, bands: Int,
                         rowsPerBand: Int): Column = h match {
    case HashFamily.Xx64    => bandHashes(sig, bands, rowsPerBand)
    case HashFamily.Md5Grid => bandKeysMd5(sig, bands, rowsPerBand)
  }

  /** Cache scope for the signature relation every pair pipeline
    * self-joins against. The persist() is load-bearing (without it
    * CollapseProject inlines the signature expression tree into every
    * downstream reference — a ~1000× expression blowup observed as a
    * 10-minute stall — and the self-join recomputes the whole
    * derivation once per side). With `release` (the default) the
    * small pair result is eagerly materialized via localCheckpoint
    * and the cache dropped before returning, so repeated invocations
    * in a long-lived session leave no cached blocks behind. Pass
    * `release = false` to get the lazy, fully-inspectable plan
    * instead (plan audits); the caller then owns cache cleanup.
    */
  private def withSigCache(release: Boolean)(caches: DataFrame*)
                          (build: => DataFrame): DataFrame = {
    caches.foreach(_.persist())
    val out = build
    if (!release) out
    else {
      val materialized = out.localCheckpoint(true)
      caches.foreach(_.unpersist())
      materialized
    }
  }

  /** MinHash+LSH near-dup pairs: shingle → sign → band → ONE
    * self-equi-join on (band, hash) → dedup → signature-estimate
    * prune → exact-Jaccard verify. `docs` needs (doc_id, text).
    */
  def minhashPairs(docs: DataFrame, n: Int = 3, bands: Int = 16,
                   rowsPerBand: Int = 4, threshold: Double = 0.7,
                   estimateMargin: Double = 0.2,
                   release: Boolean = true,
                   hasher: HashFamily = HashFamily.Md5Grid): DataFrame = {
    val perms = bands * rowsPerBand
    // Shingle + long-input MinHash kernels: one compiled pass per
    // document (tokenize → slide → hash → sign), no interpreted HOFs
    // anywhere in the map stage — both hash families.
    val signed = docs
      .select(col("doc_id"), shingleKernel(hasher, col("text"), n).as("sh"))
      .withColumn("sig", signatureKernel(hasher, col("sh"), perms))
    withSigCache(release)(signed) {
      val banded = signed.select(col("doc_id"),
        posexplode(bandKernel(hasher, col("sig"), bands, rowsPerBand))
          .as(Seq("band", "bhash")))
      val candidates = banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      estimateVerify(candidates, signed, perms, threshold, estimateMargin)
    }
  }

  /** Shared estimate-then-verify tail for the MinHash pipelines: the
    * fraction of agreeing signature components is an unbiased Jaccard
    * estimate (σ ≈ √(j(1−j)/64) ≤ 0.063 at 64 perms); candidates
    * whose estimate falls more than `estimateMargin` (>3σ by default)
    * below the threshold are pruned BEFORE the expensive
    * shingle-carrying joins — the wide shingle arrays travel only for
    * near-threshold pairs. A true pair needs an estimate error >
    * margin to be mis-pruned (P < 1e-3 per pair at the default);
    * survivors are verified exactly, so the emitted set matches the
    * verify-everything pipeline (margin = 1.0 disables pruning;
    * equality proven in DedupSpec).
    */
  private def estimateVerify(candidates: DataFrame, signed: DataFrame, perms: Int,
                             threshold: Double, estimateMargin: Double): DataFrame = {
    val sigs = signed.select(col("doc_id"), col("sig"))
    val estimated = candidates
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .filter(
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / lit(perms.toDouble) >= lit(threshold - estimateMargin))
      .select(col("doc_a"), col("doc_b"))
    val shs = signed.select(col("doc_id"), col("sh"))
    estimated
      .join(shs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), rnd4(jaccard(col("sh_a"), col("sh_b"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Incremental near-dup detection: find pairs where AT LEAST ONE
    * side is a new (`delta`) document — the shape of continuous-ingest
    * dedup, where the corpus is already indexed and only the delta's
    * band collisions cost anything. corpus×corpus pairs are pruned
    * inside the candidate join, so incremental cost scales with the
    * delta's collisions, never with corpus²; at production scale the
    * corpus side of the band join reads a precomputed signature index
    * (bucketed by (band, bhash)) instead of re-signing the corpus.
    * Emits (doc_a, doc_b, jaccard) with the same estimate-then-verify
    * discipline as [[minhashPairs]].
    */
  def minhashPairsIncremental(corpus: DataFrame, delta: DataFrame, n: Int = 3,
                              bands: Int = 16, rowsPerBand: Int = 4,
                              threshold: Double = 0.7,
                              estimateMargin: Double = 0.2,
                              release: Boolean = true,
                              hasher: HashFamily = HashFamily.Md5Grid): DataFrame = {
    val perms = bands * rowsPerBand
    val all = corpus.select(col("doc_id"), col("text")).withColumn("_new", lit(false))
      .unionByName(delta.select(col("doc_id"), col("text")).withColumn("_new", lit(true)))
    val signed = all
      .select(col("doc_id"), col("_new"), shingleKernel(hasher, col("text"), n).as("sh"))
      .withColumn("sig", signatureKernel(hasher, col("sh"), perms))
    withSigCache(release)(signed) {
      val banded = signed.select(col("doc_id"), col("_new"),
        posexplode(bandKernel(hasher, col("sig"), bands, rowsPerBand))
          .as(Seq("band", "bhash")))
      // PROBE-side restriction, not a post-join filter: only delta
      // rows sit on the build side of the band join, so corpus ×
      // corpus collisions are never enumerated — the join's work is
      // genuinely proportional to the delta's collisions. least/
      // greatest canonicalize pair order (a delta-delta pair arrives
      // in both orientations) before the dedup.
      val probe = banded.filter(col("_new"))
      val candidates = banded.as("a")
        .join(probe.as("b"),
          col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
            col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
        .distinct()
      estimateVerify(candidates, signed, perms, threshold, estimateMargin)
    }
  }

  /** Hamming distance between two packed signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  /** SimHash near-dup pairs: candidates from band slices of the
    * 64-bit signature, verified by full hamming distance ≤
    * `maxHamming`. Band count is maxHamming+1 so pigeonhole
    * GUARANTEES every true pair shares at least one untouched band —
    * recall 1.0 within the radius. At the default radius 3 that is
    * 4 bands × 16 bits = 65536 values per band, so expected
    * candidates grow O(N²/2¹⁶) per band — 256× more selective than a
    * 32-bit signature's 8-bit bands.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   release: Boolean = true,
                   hasher: HashFamily = HashFamily.Md5Grid): DataFrame = {
    // One compiled pass per document either way; bitwise parity with
    // the HOF references (simhashColumn / simhash60Column) is proven
    // in DedupSpec. The 60-bit family's top 4 bits are constant zero,
    // which leaves the banded pigeonhole guarantee intact (a flip
    // still lands in exactly one band).
    val sigCol = hasher match {
      case HashFamily.Xx64    => graft.functions.SimHash64(col("text"))
      case HashFamily.Md5Grid => graft.functions.SimHash60(col("text"))
    }
    val signed = docs.select(col("doc_id"), sigCol.as("sig"))
    hammingBandPairs(signed, "doc_id", maxHamming, release)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
  }

  /** Generic Hamming-radius self-join over 64-bit signatures — the
    * banded-pigeonhole core shared by text SimHash and image
    * perceptual-hash dedup. `signed` needs (`idCol`, sig: Long);
    * output is (id_a, id_b, hamming), ordered. Band count is
    * maxHamming+1 so pigeonhole GUARANTEES every pair within the
    * radius shares at least one untouched band — recall 1.0.
    */
  def hammingBandPairs(signed: DataFrame, idCol: String, maxHamming: Int,
                       release: Boolean = true): DataFrame = {
    val bands = math.min(maxHamming + 1, 64)
    val keyed = signed.select(col(idCol).as("_id"), col("sig"))
    withSigCache(release)(keyed) {
      // EVEN CONTIGUOUS PARTITION of the 64 bit positions: band b
      // covers [b·64/bands, (b+1)·64/bands) — every bit belongs to
      // exactly one band, so a flip touches one band and pigeonhole
      // recall is exactly 1 for any radius ≤ 63. The previous
      // fixed-width slicing (width = ⌈64/bands⌉, band b read at shift
      // b·width) was WRONG past radius 7: at radius 8 it made 9 bands
      // of width 8 (72 > 64), the JVM's shift-mod-64 silently aliased
      // band 8 onto band 0, only 8 DISTINCT bands existed, and 8
      // flips could touch them all — pairs at exactly the radius were
      // dropped. Caught by the r8 mm_video_dups brute-force oracle
      // (DuckDB found hamming-8 pairs the banded join missed).
      // shiftright is an arithmetic shift; within-range shifts plus
      // per-band masks make sign-extension irrelevant (the top band's
      // mask covers only real bit positions).
      val bandCols = (0 until bands).map { b =>
        val lo = b * 64 / bands
        val width = (b + 1) * 64 / bands - lo
        val mask = if (width >= 64) -1L else (1L << width) - 1
        shiftright(col("sig"), lo).bitwiseAND(lit(mask))
      }
      val banded = keyed.select(col("_id"), col("sig"),
        posexplode(array(bandCols: _*)).as(Seq("band", "bhash")))
      banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
            col("a._id") < col("b._id"))
        .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
          col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
        .distinct()
        .withColumn("hamming", hamming(col("sig_a"), col("sig_b")))
        .filter(col("hamming") <= maxHamming)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .orderBy(col("id_a"), col("id_b"))
    }
  }

  /** 64-bit SimHash: per bit b (0..63), sum over distinct token
    * hashes of ±1 by bit b of the token's xxhash64; signature bit =
    * vote ≥ 0. Packed as two 32-bit halves — each half's acc*2+x fold
    * stays well below Long.MaxValue, and the final shiftleft/OR are
    * bitwise (sign-safe) ops, so ANSI overflow checking never fires
    * even though the packed value may be negative.
    */
  def simhashColumn(text: Column): Column = {
    val toks = array_distinct(split(trim(text), "\\s+"))
    val hashes = transform(toks, t => xxhash64(t))
    // Bit positions unrolled in Scala (shiftright needs a literal count).
    def half(offset: Int): Column = {
      val bits = array((0 until 32).map { b =>
        when(aggregate(hashes, lit(0L),
          (acc, h) => acc + shiftright(h, offset + b).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)) >= 0,
          lit(1L)).otherwise(lit(0L))
      }: _*)
      aggregate(bits, lit(0L), (acc, x) => acc * 2 + x)
    }
    shiftleft(half(32), 32).bitwiseOR(half(0))
  }

  /** Exact thresholded n-gram Jaccard similarity join via PREFIX
    * FILTERING (the AllPairs/PPJoin family of set-similarity joins):
    * order every shingle set by ascending document frequency (rarest
    * first; ties by hash), and emit each set's first
    * |sh| − max(1, ⌊τ·|sh|⌋) + 1 elements as its prefix. Two sets
    * with Jaccard ≥ τ MUST share a prefix element (pigeonhole on the
    * global order), so an equi-join on prefix tokens has recall
    * EXACTLY 1 — unlike LSH banding — which keeps the brute-force
    * DuckDB oracle hash-identical. Candidate volume stays sparse at
    * any corpus size because prefixes hold the RAREST shingles: a
    * token's candidate group is quadratic only in its document
    * frequency, not in corpus size — this replaces the round-1
    * fixed-block all-pairs design whose blocks grew linearly with the
    * corpus.
    *
    * Prefixes are derived as ROWS — a per-doc `row_number` window
    * over (df, hash) keeps only the `rank ≤ prefixLen` rows for the
    * candidate join — never by re-assembling full df-sorted arrays
    * per document (the round-2 shape, whose collect_list + array_sort
    * + re-explode carried every shingle of every doc through two
    * extra shuffles before a single candidate existed). The verify
    * stage reads the ORIGINAL unsorted hashed-shingle arrays:
    * `array_intersect` is order-independent, so df order is only
    * needed for the prefix pigeonhole, not for the exact Jaccard.
    *
    * Candidate pruning inside the join condition (pure arithmetic,
    * no extra shuffles):
    *  - length filter: τ·|A| ≤ |B| ∧ τ·|B| ≤ |A| (necessary for
    *    Jaccard ≥ τ); the εLen slack keeps the double multiply from
    *    over-pruning exact boundaries.
    *  - PPJoin positional filter: a collision at (1-based) sorted
    *    positions (i, j) bounds the overlap by
    *    1 + min(|A|−i, |B|−j); pairs need overlap ≥ τ·(|A|+|B|)/(1+τ)
    *    for Jaccard ≥ τ. A true pair's FIRST shared prefix token
    *    always passes (no shared tokens precede it in the global
    *    order), so pruning later collision rows never drops a pair —
    *    recall stays exactly 1 while hot-token candidate groups (a
    *    boilerplate shingle whose df grows with the corpus) shrink.
    *
    * Shingles are hashed to longs before the pairwise intersects —
    * integer set-intersection is several times cheaper than string
    * comparison on the verify stage, and |A∩B| matches the string-set
    * oracle unless two shingles of one doc collide (P ≈ |sh|²/2⁶⁵).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.6,
                        topK: Int = 100, release: Boolean = true): DataFrame = {
    val epsLen = 1e-9
    // The only cached relation: the ShingleHashes kernel runs exactly
    // once per document; the prefix derivation and the verify joins
    // both read this cache.
    val hashed = docs.select(col("doc_id"),
      graft.functions.ShingleHashes(col("text"), n).as("sh0"))
    withSigCache(release)(hashed) {
      val tok = hashed.select(col("doc_id"), size(col("sh0")).as("len"),
        explode(col("sh0")).as("t"))
      // floor (not ceil) of τ·len under-estimates the required
      // overlap, which only LENGTHENS the prefix — safe against
      // double-rounding artifacts at exact-integer boundaries.
      val prefixLen = (col("len").cast("double") -
        greatest(lit(1.0), floor(col("len") * lit(threshold))) + lit(1.0)).cast("int")
      // df via an unbounded window over the shingle hash — ONE shuffle
      // of the token relation where groupBy-then-join-back costs two
      // (the join side shuffles every token row again). Skew bound:
      // a key's partition load IS its df, same as the join layout.
      val dfW = org.apache.spark.sql.expressions.Window.partitionBy(col("t"))
      // Then one window shuffle by doc_id ranks tokens rarest-first;
      // rk is the token's 1-based position in the doc's full (df,
      // hash) order, so `rk ≤ prefixLen` rows ARE the prefix — no
      // array re-assembly, no re-explode.
      val rankW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("t"))
      val pre = tok.withColumn("df", count(lit(1)).over(dfW))
        .withColumn("rk", row_number().over(rankW))
        .filter(col("rk") <= prefixLen)
        .select(col("doc_id"), col("len"), col("rk"), col("t").as("p"))
      // overlap ≥ τ/(1+τ)·(|A|+|B|) is necessary for Jaccard ≥ τ
      val minOverlap =
        (col("a.len") + col("b.len")).cast("double") * lit(threshold / (1.0 + threshold))
      val candidates = pre.as("a")
        .join(pre.as("b"),
          col("a.p") === col("b.p") && col("a.doc_id") < col("b.doc_id") &&
            col("b.len") >= col("a.len") * lit(threshold) - lit(epsLen) &&
            col("a.len") >= col("b.len") * lit(threshold) - lit(epsLen) &&
            (least(col("a.len") - col("a.rk"), col("b.len") - col("b.rk")) + lit(1))
              .cast("double") >= minOverlap - lit(epsLen))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val shs = hashed.select(col("doc_id"), col("sh0").as("sh"))
      val verified = candidates
        .join(shs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(shs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("jaccard_raw", jaccard(col("sh_a"), col("sh_b")))
        // threshold on the RAW jaccard (both engines compute the same
        // integer counts, hence bitwise-identical doubles); round only
        // for display
        .filter(col("jaccard_raw") >= lit(threshold))
        .select(col("doc_a"), col("doc_b"), rnd4(col("jaccard_raw")).as("jaccard"))
      // topK ≤ 0 → ALL pairs, unordered (consumers like dedupGroups
      // need the complete edge set and no single-task global sort)
      if (topK <= 0) verified
      else verified.orderBy(col("jaccard").desc, col("doc_a"), col("doc_b")).limit(topK)
    }
  }

  /** CONTAINMENT near-dup — the asymmetric companion to
    * [[ngramJaccardPairs]]: C(A→B) = |A∩B| / |A| with A the smaller
    * shingle set, which catches a fragment living INSIDE a larger
    * document (a quote, a syndicated excerpt, boilerplate wrapped in
    * new content). Jaccard structurally cannot see these: a 40 %
    * prefix of a document has containment 1.0 but Jaccard ≈ 0.4,
    * below any sane threshold. Candidate generation is the same
    * rarest-first prefix-filter discipline, but ASYMMETRIC: only the
    * probe (contained) side prunes to its |A|−⌈τ|A|⌉+1 prefix —
    * pigeonhole needs just one side's order — while the index side
    * keeps all tokens (the contained doc bounds nothing about its
    * container's size). Verification is one exact set-intersect per
    * candidate. Skew and shuffle bounds match the Jaccard pipeline:
    * both sides exchange once on the token hash, candidates are
    * df-bounded.
    */
  def containmentPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.9,
                       topK: Int = 100, release: Boolean = true): DataFrame = {
    val epsLen = 1e-9
    val hashed = docs.select(col("doc_id"),
      graft.functions.ShingleHashes(col("text"), n).as("sh0"))
    withSigCache(release)(hashed) {
      val tok = hashed.select(col("doc_id"), size(col("sh0")).as("len"),
        explode(col("sh0")).as("t"))
      val prefixLen = (col("len").cast("double") -
        greatest(lit(1.0), floor(col("len") * lit(threshold))) + lit(1.0)).cast("int")
      val dfW = org.apache.spark.sql.expressions.Window.partitionBy(col("t"))
      val rankW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("t"))
      val ranked = tok.withColumn("df", count(lit(1)).over(dfW))
        .withColumn("rk", row_number().over(rankW))
      val pre = ranked.filter(col("rk") <= prefixLen)
      // direction: doc_a is the (potentially) contained, smaller set;
      // id-tiebreak keeps exact-duplicate pairs single-direction
      val candidates = pre.as("a")
        .join(ranked.as("b"),
          col("a.t") === col("b.t") &&
            (col("a.len") < col("b.len") ||
              (col("a.len") === col("b.len") && col("a.doc_id") < col("b.doc_id"))))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val shs = hashed.select(col("doc_id"), col("sh0").as("sh"))
      val verified = candidates
        .join(shs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
        .join(shs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
        .withColumn("containment_raw",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
            / size(col("sh_a")).cast("double"))
        .filter(col("containment_raw") >= lit(threshold) - lit(epsLen))
        .select(col("doc_a"), col("doc_b"),
          size(col("sh_a")).cast("long").as("len_a"),
          size(col("sh_b")).cast("long").as("len_b"),
          rnd4(col("containment_raw")).as("containment"))
      if (topK <= 0) verified
      else verified.orderBy(col("containment").desc, col("doc_a"), col("doc_b"))
        .limit(topK)
    }
  }

  /** Documents plus planted FRAGMENTS: the first 40 % of the tokens
    * of docs 0-4 as new docs (ids +2000000) — contained near-verbatim
    * in their sources (containment 1.0) yet invisible to Jaccard
    * (≈ 0.4). The demonstration corpus for [[containmentPairs]].
    */
  def plantedFragmentDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val frags = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat_ws(" ", slice(split(trim(col("text")), "\\s+"), lit(1),
          greatest(floor(size(split(trim(col("text")), "\\s+")) * lit(0.4)), lit(3.0))
            .cast("int"))).as("text"))
    docs.unionByName(frags)
  }

  def containmentQuery(s: SparkSession, dir: String): DataFrame =
    containmentPairs(plantedFragmentDocs(s, dir), threshold = 0.9, topK = 30)

  /** Embedding-cosine near-dup: multi-table LSH self-join for
    * candidates (never all-pairs), exact cosine re-rank, top pairs.
    *
    * bitsPerTable is wider here than in query-time ANN (10 vs 6): a
    * self-join's candidate count grows with the SQUARE of bucket
    * occupancy, so near-dup mining wants many small buckets — truly
    * similar vectors still collide, random ones mostly don't.
    */
  def embeddingNearDupTop(embeddings: DataFrame, topK: Int = 50,
                          tables: Int = 8, bitsPerTable: Int = 10,
                          dim: Int = 64, release: Boolean = true): DataFrame = {
    // md5-derived planes ([[VectorOps.hashHyperplanes]]) so the DuckDB
    // oracle re-derives the whole index — buckets, candidates, pairs
    // AND recall_planted — from the seed string (the vec_ann_lsh
    // certification discipline applied to the self-join miner)
    val allPlanes = (0 until tables).map(t =>
      VectorOps.hashHyperplanes(bitsPerTable, dim, t, 42L))
    def sigArray(vec: Column): Column =
      graft.functions.LshSignatures(vec, allPlanes)
    // cache: both self-join sides read the signatures; without it the
    // 80 hyperplane dot-products per vector run twice.
    val signed = embeddings.select(col("vec_id"), col("embedding").as("vec"))
      .withColumn("sigs", sigArray(col("vec")))
    withSigCache(release)(signed) {
      val banded = signed.select(col("vec_id"), col("vec"),
        posexplode(col("sigs")).as(Seq("t", "sig")))
      banded.as("a")
        .join(banded.as("b"),
          col("a.t") === col("b.t") && col("a.sig") === col("b.sig") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          col("a.vec").as("va"), col("b.vec").as("vb"))
        .distinct()
        .select(col("vec_a"), col("vec_b"),
          rnd4(VectorOps.cosine(col("va"), col("vb"))).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
        .limit(topK)
    }
  }

  /** Connected components over a near-dup pair graph — the "keeper
    * selection" stage of a dedup pipeline: every document gets the
    * MINIMUM doc_id reachable through near-dup edges as its group id
    * (keep one doc per group, drop the rest). Iterative min-label
    * propagation: each round, every node takes the min of its own and
    * its neighbors' labels — converges in O(component diameter)
    * rounds, and near-dup components are shallow (duplicates of a
    * common source), so the driver-side loop runs a handful of
    * O(|edges|) shuffle rounds at ANY corpus size; `maxIters` bounds
    * pathological chains. Only the per-round CHANGED count reaches
    * the driver (one long), never rows.
    */
  /** Both directions of every pair — the adjacency the propagation
    * joins against. Public (with [[initialLabels]]) so plan audits
    * inspect exactly the construction the operator runs.
    */
  def symmetrizedEdges(pairs: DataFrame): DataFrame =
    pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))

  /** Every node starts labeled with itself. */
  def initialLabels(edges: DataFrame): DataFrame =
    edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))

  def dedupGroups(pairs: DataFrame, maxIters: Int = 25,
                  release: Boolean = true): DataFrame = {
    val edges = symmetrizedEdges(pairs).persist()
    val initial = initialLabels(edges)
      .persist() // materialized by the first round's action
    // ONE Spark job per TWO propagation rounds: the changed-count
    // action materializes the persisted double-stepped frame, and the
    // next iteration's labels are a lazy projection of that cache —
    // per-round scheduler overhead is what dominates on small graphs,
    // so job count is the knob. Checking change only on the SECOND
    // sub-step is a sound fixpoint test: labels are monotone
    // non-increasing and the step is idempotent at the fixpoint, so
    // "sub-step 2 changed nothing" means its input already was the
    // fixpoint — regardless of what sub-step 1 did.
    var prevCache: DataFrame = initial
    var labels: DataFrame = initial
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val mid = labelPropagationStep(edges, labels)
        .select(col("doc_id"), col("next_label").as("label"))
      val stepped = labelPropagationStep(edges, mid).persist()
      changed = stepped.filter(col("next_label") =!= col("label")).count()
      prevCache.unpersist() // safe: stepped is materialized now
      prevCache = stepped
      labels = stepped.select(col("doc_id"), col("next_label").as("label"))
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"dedupGroups did not converge in $maxIters double-rounds (component " +
          s"diameter too large) — raise maxIters; refusing to emit partial groups")
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("group_size"))
    val out = labels
      .join(sizes, "label")
      .select(col("doc_id"), col("label").as("group_id"), col("group_size"))
      .orderBy(col("group_id"), col("doc_id"))
    if (!release) out
    else {
      val materialized = out.localCheckpoint(true)
      prevCache.unpersist()
      edges.unpersist()
      materialized
    }
  }

  /** One min-label propagation round over (src,dst) edges and
    * (doc_id,label) assignments: every node takes the min of its own
    * and its neighbors' labels. Public so plan audits can inspect the
    * per-round shape — the converged loop's lazy lineage nests every
    * round and is not a useful artifact.
    */
  def labelPropagationStep(edges: DataFrame, labels: DataFrame): DataFrame = {
    val neighborMin = edges
      .join(labels.select(col("doc_id").as("dst"), col("label").as("nlabel")), "dst")
      .groupBy(col("src")).agg(min(col("nlabel")).as("nmin"))
    labels
      .join(neighborMin.select(col("src").as("doc_id"), col("nmin")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("label"),
        least(col("label"), coalesce(col("nmin"), col("label"))).as("next_label"))
  }

  // ---- SparkEntry query wrappers ----

  /** Per-doc MinHash/SimHash signature digests from the certified
    * md5-grid family — deterministic index-build output whose every
    * value (the md5 digest of the 64-perm grid signature, the 60-bit
    * SimHash, the shingle count) the DuckDB oracle re-derives from
    * the documents table alone.
    */
  def signaturesQuery(s: SparkSession, dir: String): DataFrame = {
    val sh = graft.functions.ShingleHashesMd5(col("text"), 3)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(concat_ws(",", transform(minhashSignatureGrid(sh), v => v.cast("string"))))
          .as("minhash_digest"),
        graft.functions.SimHash60(col("text")).as("simhash60"),
        size(sh).cast("long").as("n_shingles"))
      .orderBy(col("doc_id"))
  }

  /** Documents plus deterministic planted near-dups (a token prepended
    * to the first five docs) — lets the pair-finding queries emit
    * verifiable non-empty output on a corpus that has no natural
    * near-dups.
    */
  def plantedDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val planted = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("xq "), col("text")).as("text"))
    docs.unionByName(planted)
  }

  def minhashPairsQuery(s: SparkSession, dir: String): DataFrame =
    minhashPairs(plantedDocs(s, dir), threshold = 0.4)

  /** Incremental dedup query: the corpus is the documents table, the
    * delta is the planted near-dups — every emitted pair must involve
    * a delta doc.
    */
  def incrementalPairsQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val delta = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("xq "), col("text")).as("text"))
    minhashPairsIncremental(docs, delta, threshold = 0.4)
  }

  def simhashPairsQuery(s: SparkSession, dir: String): DataFrame =
    simhashPairs(plantedDocs(s, dir), maxHamming = 3)

  /** PERSISTED n-gram pair-set index: the UNTRUNCATED verified pair
    * set materialized once per (corpus content, n, threshold) under
    * the [[IndexCache]] discipline. Pair mining is the expensive half
    * of every dedup consumer (top-pairs report, grouping, keeper
    * selection) and is a pure function of the corpus — at 100 TB you
    * mine once and every consumer (and every incremental rerun over
    * unchanged data) reads the artifact; re-mining per query is the
    * difference between a metadata check and re-shuffling the corpus.
    */
  def ngramPairsIndexIfAbsent(docs: DataFrame, indexRoot: String,
                              n: Int = 3, threshold: Double = 0.6): String = {
    val row = docs
      .select(xxhash64(col("doc_id").cast("string"), col("text")).as("h"))
      .agg(expr("coalesce(bit_xor(h), 0L)").as("x"), count(lit(1)).as("cnt"))
      .head()
    val fp = f"${row.getLong(0)}%016x-${row.getLong(1)}x-n$n-t${math.round(threshold * 1000)}"
    IndexCache.getOrBuild(indexRoot, "ngrampairs", fp) { scratch =>
      ngramJaccardPairs(docs, n, threshold, topK = 0)
        .write.parquet(scratch.resolve("pairs").toString)
    }
  }

  private def plantedPairsIndexed(s: SparkSession, dir: String): DataFrame = {
    val idx = ngramPairsIndexIfAbsent(plantedDocs(s, dir),
      s"${System.getProperty("java.io.tmpdir")}/graft-ngram-cache")
    IndexCache.readCached(s, s"$idx/pairs")
  }

  def ngramTopQuery(s: SparkSession, dir: String): DataFrame =
    plantedPairsIndexed(s, dir)
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(100)

  /** Dedup groups over the UNTRUNCATED n-gram pair set (no topK — the
    * grouping must see every edge or components split). Reads the
    * same persisted pair-set index as [[ngramTopQuery]]: one mining
    * pass feeds both consumers.
    */
  /** PERSISTED label store: the converged connected-components output
    * (doc_id, group_id, group_size) materialized once per pair-set
    * content under the [[IndexCache]] discipline. The pair set is
    * itself a content-addressed artifact, so `fpKey` is derived from
    * its directory identity — no data scan to decide freshness. Every
    * grouping consumer (the groups report, keeper selection, the
    * incremental maintenance base) reads this artifact; running the
    * O(diameter) propagation loop once per CONSUMER instead of once
    * per corpus is exactly the waste the index discipline exists to
    * remove.
    */
  def labelsIndexIfAbsent(pairs: => DataFrame, fpKey: String,
                          indexRoot: String): String =
    IndexCache.getOrBuild(indexRoot, "labels", fpKey) { scratch =>
      dedupGroups(pairs, release = false)
        .write.parquet(scratch.resolve("labels").toString)
    }

  private def labelsRoot: String =
    s"${System.getProperty("java.io.tmpdir")}/graft-dedup-labels"

  private def plantedLabelsIndexed(s: SparkSession, dir: String): DataFrame = {
    val pairsDir = ngramPairsIndexIfAbsent(plantedDocs(s, dir),
      s"${System.getProperty("java.io.tmpdir")}/graft-ngram-cache")
    val fp = java.nio.file.Paths.get(pairsDir).getFileName.toString
    val idx = labelsIndexIfAbsent(
      s.read.parquet(s"$pairsDir/pairs").select(col("doc_a"), col("doc_b")),
      fp, labelsRoot)
    IndexCache.readCached(s, s"$idx/labels")
  }

  def dedupGroupsQuery(s: SparkSession, dir: String): DataFrame =
    plantedLabelsIndexed(s, dir).orderBy(col("group_id"), col("doc_id"))

  /** INCREMENTAL group maintenance — the ingest-time path that keeps
    * the dedup-group labeling current WITHOUT re-running connected
    * components over the corpus: quotient the delta's pairs through
    * the existing labels (an endpoint inside an existing group IS its
    * group id; a new doc is itself), run components on that
    * GROUP-level graph — whose size is bounded by the delta's pair
    * count, never the corpus — and push the resulting relabel map
    * back over the stored labels as a broadcast join. Cost is
    * O(delta + touched groups): the corpus-sized label relation is
    * scanned (twice: endpoint lookup restricted by a broadcast
    * endpoint set, then the relabel projection) but never shuffled.
    * Sound because stored group ids are component-min doc ids, so
    * components of the quotient graph reproduce exactly the min-label
    * components of the full union graph.
    */
  def dedupGroupsIncremental(oldLabels: DataFrame,
                             deltaPairs: DataFrame): DataFrame = {
    val touched = deltaPairs.select(col("doc_a").as("doc_id"))
      .unionByName(deltaPairs.select(col("doc_b").as("doc_id"))).distinct()
    // delta-sized slice of the stored labels; the corpus side is
    // probed by a broadcast of the touched endpoints, never shuffled
    val relevant = oldLabels.join(broadcast(touched), "doc_id")
      .localCheckpoint(true)
    val la = relevant.select(col("doc_id").as("doc_a"), col("group_id").as("ga"))
    val lb = relevant.select(col("doc_id").as("doc_b"), col("group_id").as("gb"))
    val quotient = deltaPairs
      .join(broadcast(la), Seq("doc_a"), "left")
      .join(broadcast(lb), Seq("doc_b"), "left")
      .select(coalesce(col("ga"), col("doc_a")).as("qa"),
        coalesce(col("gb"), col("doc_b")).as("qb"))
      .filter(col("qa") =!= col("qb"))
      .select(least(col("qa"), col("qb")).as("doc_a"),
        greatest(col("qa"), col("qb")).as("doc_b"))
      .distinct()
    // components over the group graph: old_id → merged group id. The
    // quotient is delta-bounded; below the threshold it is MODEL-
    // PARAMETER scale (group-merge edges, not documents) and solves
    // driver-side as union-find — one job instead of the propagation
    // loop's per-round actions. A large delta falls back to the
    // distributed loop; either way nothing corpus-sized moves.
    val quotientP = quotient.persist()
    val nq = quotientP.count()
    val m = (if (nq <= 10000) {
      val edges = quotientP.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map[Long, Long]()
      // iterative find (walk to root, then path-compress): union-by-min
      // has no rank balancing, so an adversarial edge order can chain
      // parents ~nq deep and recursive find would overflow the stack
      // right at the driver-side threshold
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (c != r) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
        r
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // min-id root keeps group ids = component minima
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val nodes = edges.flatMap(t => Seq(t._1, t._2)).distinct
      val sess = oldLabels.sparkSession
      import sess.implicits._
      nodes.map(n => (n, find(n))).toSeq.toDF("old_id", "new_id")
    } else dedupGroups(quotientP, release = false)
      .select(col("doc_id").as("old_id"), col("group_id").as("new_id")))
      .localCheckpoint(true)
    quotientP.unpersist()
    val relabel = m.filter(col("old_id") =!= col("new_id"))
      .withColumnRenamed("old_id", "group_id")
    val updatedOld = oldLabels
      .join(broadcast(relabel), Seq("group_id"), "left")
      .select(col("doc_id"),
        coalesce(col("new_id"), col("group_id")).as("group_id"))
    // endpoints with no stored label: new docs, plus previously
    // singleton (unlabeled) corpus docs first touched by the delta
    val emergent = touched
      .join(broadcast(relevant.select(col("doc_id"))), Seq("doc_id"), "left_anti")
      .join(broadcast(m.withColumnRenamed("old_id", "doc_id")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("new_id"), col("doc_id")).as("group_id"))
    val labels = updatedOld.unionByName(emergent)
    val sizes = labels.groupBy(col("group_id")).agg(count(lit(1)).as("group_size"))
    labels
      .join(sizes, "group_id")
      .select(col("doc_id"), col("group_id"), col("group_size"))
      .orderBy(col("group_id"), col("doc_id"))
  }

  /** Driver query: the base corpus's labels are a PERSISTED artifact
    * (built once per base pair-set content under the [[IndexCache]]
    * discipline — in production the label store survives between
    * ingests), and the planted docs arrive as the delta; their pairs
    * quotient + relabel in O(delta). The output is the full current
    * labeling, which must equal [[dedupGroupsQuery]]'s full recompute
    * — the dd_groups recursive-CTE oracle verifies exactly that.
    */
  def dedupGroupsIncrQuery(s: SparkSession, dir: String): DataFrame = {
    val pairsDir = ngramPairsIndexIfAbsent(plantedDocs(s, dir),
      s"${System.getProperty("java.io.tmpdir")}/graft-ngram-cache")
    def all = s.read.parquet(s"$pairsDir/pairs").select(col("doc_a"), col("doc_b"))
    // the pair set is content-addressed, so the base label artifact's
    // freshness key is the pair dir's identity plus the base/delta
    // split boundary — the artifact's CONTENT depends on both, and a
    // key without the boundary would silently serve a stale labeling
    // if the split constant ever moved
    val splitAt = 1000000L
    val fp = java.nio.file.Paths.get(pairsDir).getFileName.toString +
      s"-base-lt$splitAt"
    val idx = labelsIndexIfAbsent(
      all.filter(col("doc_a") < splitAt && col("doc_b") < splitAt),
      fp, labelsRoot)
    dedupGroupsIncremental(
      IndexCache.readCached(s, s"$idx/labels").select("doc_id", "group_id"),
      all.filter(col("doc_a") >= splitAt || col("doc_b") >= splitAt))
  }

  /** KEEPER SELECTION over the near-dup groups — the policy step that
    * turns "these documents are duplicates of each other" into "this
    * one survives": per connected component, keep the LONGEST document
    * (the C4/CCNet convention — the longest copy is usually the least
    * truncated) with a doc-id tiebreak, and report what was removed.
    * The ranking key is the exact integer text length, so the winner
    * is engine-deterministic with no float anywhere.
    *
    * Scale: one row_number window partitioned by group label over the
    * (already label-propagated) group table joined to a (doc, length)
    * projection — the heavy lifting (candidate pairs, components) is
    * the shared persisted index + [[dedupGroups]]; this policy pass
    * adds one window on a relation the size of the DUPLICATED subset,
    * not the corpus.
    */
  def dedupKeepersQuery(s: SparkSession, dir: String): DataFrame = {
    val groups = dedupGroupsQuery(s, dir)
    val lens = plantedDocs(s, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group_id")).orderBy(col("text_len").desc, col("doc_id"))
    groups.join(lens, "doc_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("group_id"), col("group_size"),
        col("doc_id").as("keeper_doc_id"),
        col("text_len").as("keeper_len"),
        (col("group_size") - lit(1L)).as("n_removed"))
      .orderBy(col("group_id"))
  }

  /** Repeated-substring mining — the suffix-array-class exact-dedup
    * signal (longest token span shared between two documents, with
    * exact offsets), found with joins instead of suffix structures:
    *
    *  1. every k-token window becomes an anchor row (doc, pos, win) —
    *     one generator pass, rows linear in corpus token count;
    *  2. candidate anchor pairs come from ONE equi-join on the window
    *     content across documents (`doc_a < doc_b`);
    *  3. maximal shared spans are the classic gaps-and-islands
    *     grouping on the match DIAGONAL (pa − pb): r consecutive
    *     anchors on a diagonal = one shared span of k + r − 1 tokens,
    *     recovered by a window function — the text is never re-read.
    *
    * The join key is the 128-bit md5 of the window content — 4-6×
    * smaller than the window string it digests, computed identically
    * by both engines (so the oracle runs the same plan), with a
    * collision probability (~2⁻¹²⁸ per pair) far below any hardware
    * error rate; a paranoid deployment adds a final slice-compare
    * verify join on the surviving spans — same shape, one more join.
    */
  def repeatedSubstrings(docs: DataFrame, k: Int = 20, topK: Int = 40,
                         release: Boolean = true): DataFrame = {
    val wins = docs
      .select(col("doc_id"), TextAnalysis.wsTokens(lower(col("text"))).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(toks) - $k + 1), i -> md5(concat_ws(' ', slice(toks, i, $k))))"))
        .as(Seq("pos", "win")))
    withSigCache(release)(wins) {
      val anchors = wins.as("a")
        .join(wins.as("b"),
          col("a.win") === col("b.win") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.pos").as("pa"), col("b.pos").as("pb"),
          (col("a.pos") - col("b.pos")).as("diag"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_a"), col("doc_b"), col("diag")).orderBy(col("pa"))
      anchors
        .withColumn("grp", col("pa") - row_number().over(w))
        .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("grp"))
        .agg(min(col("pa")).cast("long").as("start_a"),
          min(col("pb")).cast("long").as("start_b"),
          (lit(k) + count(lit(1)) - 1).cast("long").as("match_len"))
        .select(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"), col("match_len"))
        .orderBy(col("match_len").desc, col("doc_a"), col("doc_b"),
          col("start_a"), col("start_b"))
        .limit(if (topK > 0) topK else Int.MaxValue)
    }
  }

  /** PERSISTED repeated-substring span index: the UNTRUNCATED mined
    * span set, once per (corpus content, window k) — the suffix-scan
    * half of cross-document repetition removal is a pure function of
    * the corpus, and every consumer (top-spans report, scrubbing,
    * boilerplate stats) reads spans at rest instead of re-joining the
    * anchor windows. Same [[IndexCache]] discipline as the n-gram
    * pair-set index.
    */
  def repeatsIndexIfAbsent(docs: DataFrame, indexRoot: String,
                           k: Int = 20): String = {
    val row = docs
      .select(xxhash64(col("doc_id").cast("string"), col("text")).as("h"))
      .agg(expr("coalesce(bit_xor(h), 0L)").as("x"), count(lit(1)).as("cnt"))
      .head()
    val fp = f"${row.getLong(0)}%016x-${row.getLong(1)}x-k$k"
    IndexCache.getOrBuild(indexRoot, "repeats", fp) { scratch =>
      repeatedSubstrings(docs, k, topK = 0)
        .write.parquet(scratch.resolve("spans").toString)
    }
  }

  /** The documents table plus two constructed docs embedding doc 0's
    * first 30 tokens at KNOWN offsets (after 10 tokens of doc 1 /
    * after 5 tokens of doc 2) — the planted truth for
    * [[repeatedSubstrings]]: the miner must surface the shared spans
    * at exactly those offsets. Built with token slices, no driver
    * collects; the oracle constructs the identical docs in SQL.
    */
  def plantedRepeatDocs(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
    def toksOf(id: Long, alias: String): DataFrame =
      base.filter(col("doc_id") === id)
        .select(TextAnalysis.wsTokens(lower(col("text"))).as(alias))
    val p1 = toksOf(1L, "tA").crossJoin(toksOf(0L, "t0"))
      .select(lit(3000001L).as("doc_id"),
        concat_ws(" ", concat(slice(col("tA"), 1, 10), slice(col("t0"), 1, 30))).as("text"))
    val p2 = toksOf(2L, "tB").crossJoin(toksOf(0L, "t0"))
      .select(lit(3000002L).as("doc_id"),
        concat_ws(" ", concat(slice(col("tB"), 1, 5), slice(col("t0"), 1, 30))).as("text"))
    base.unionByName(p1).unionByName(p2)
  }

  /** Driver query: repeated-substring spans over [[plantedRepeatDocs]],
    * served top-40 from the persisted span index (the mined order is
    * total — five tie-break columns — so the read-back ranking is
    * bit-identical to the inline path the oracle mirrors).
    */
  def repeatedSubstringsQuery(s: SparkSession, dir: String): DataFrame = {
    val idx = repeatsIndexIfAbsent(plantedRepeatDocs(s, dir),
      s"${System.getProperty("java.io.tmpdir")}/graft-repeats-cache")
    IndexCache.readCached(s, s"$idx/spans")
      .orderBy(col("match_len").desc, col("doc_a"), col("doc_b"),
        col("start_a"), col("start_b"))
      .limit(40)
  }

  /** ACT on the mined repeated spans — cross-document repetition
    * REMOVAL, the second half of the suffix-scan dedup loop (the
    * published long-dedup discipline: mine exact repeats, then delete
    * every occurrence except the first): each span's covered token
    * positions are scrubbed from the LATER copy (`doc_b` — the mined
    * direction keeps the earliest doc intact), overlapping spans
    * merging for free through the position-set distinct. One explode
    * of the span set (rows ∝ repeated tokens, not corpus tokens), one
    * anti-join against the token-position relation, and an ordered
    * reassembly per affected doc; the scrubbed text round-trips as an
    * md5 fingerprint so the driver compare stays cell-hashable — the
    * [[graft.operators.TextAnalysis]] sentence-dedup contract.
    */
  def spanScrubQuery(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val docs = plantedRepeatDocs(s, dir)
    val idx = repeatsIndexIfAbsent(docs,
      s"${System.getProperty("java.io.tmpdir")}/graft-repeats-cache", k)
    val spans = IndexCache.readCached(s, s"$idx/spans")
    val remove = spans.select(col("doc_b").as("doc_id"),
        explode(sequence(col("start_b"),
          col("start_b") + col("match_len") - 1)).as("pos"))
      .distinct()
    val tokens = docs.select(col("doc_id"),
      TextAnalysis.wsTokens(lower(col("text"))).as("toks"))
    val toks = tokens.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("pos", "tok")))
    val keptAgg = toks
      .join(remove, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            p => p.getField("tok")))).as("scrubbed_fp"))
    tokens.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("scrubbed_fp"), md5(lit(""))).as("scrubbed_fp"))
      .filter(col("n_removed") > 0)
      .orderBy(col("doc_id"))
  }

  /** Exact all-pairs cosine pairs at/above `minCosine` — the truth
    * set for certifying the LSH path's recall. One broadcast
    * nested-loop join (the whole vector table broadcasts at
    * certification scale); quadratic BY DESIGN and only ever run as a
    * certification artifact, never as the production dedup path.
    */
  def embeddingExactPairs(embeddings: DataFrame, minCosine: Double): DataFrame = {
    val v = embeddings.select(col("vec_id"), col("embedding").as("vec"))
    v.as("a").join(broadcast(v.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        VectorOps.cosine(col("a.vec"), col("b.vec")).as("cosine_raw"))
      .filter(col("cosine_raw") >= lit(minCosine))
      .select(col("vec_a"), col("vec_b"), rnd4(col("cosine_raw")).as("cosine"))
  }

  /** The embeddings table plus perturbed copies of the first 5
    * vectors (one component scaled by 1.01, ids shifted by 1e6) — the
    * vector-side analogue of [[plantedDocs]]: the synthetic embedding
    * table has NO true near-dup pairs (max pairwise cosine ≈ 0.5), so
    * near-dup recall is only measurable against planted ones.
    */
  def plantedEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    emb.unionByName(
      emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i === 0, x * lit(1.01f)).otherwise(x)).as("embedding")))
  }

  /** Corpus-derived cluster count for [[semanticNearDup]]:
    * k = ⌈n / targetClusterSize⌉ (min 2), CAPPED at `maxClusters`.
    * Fixing the MEAN cluster cardinality as the corpus grows keeps
    * the within-cluster candidate count Σ cluster² ≈
    * n·targetClusterSize — LINEAR in n — where a fixed k (the round-4
    * shape) made it n²/k. The cap bounds the OTHER cost axis:
    * nearest-centroid assignment is O(n·k·dim), so an uncapped k ∝ n
    * would turn assignment itself quadratic. Past the cap, clusters
    * exceed the size cap and the LSH-band re-bucketing guard takes
    * over candidate bounding — both axes stay linear at any n.
    */
  def semanticK(n: Long, targetClusterSize: Int, maxClusters: Int = 16): Int =
    math.min(maxClusters,
      math.max(2, math.ceil(n.toDouble / targetClusterSize).toInt))

  /** SemDeDup-style SEMANTIC dedup (Abbas et al. 2023's discipline):
    * k-means-cluster the embedding space, then search for near-dups
    * EXACTLY but only WITHIN each cluster — truly similar vectors
    * share a cluster by construction. Complementary to the LSH path
    * ([[embeddingNearDupTop]]): LSH bounds candidates by hash
    * collisions, SemDeDup by the learned partition — the latter is
    * what the published semantic-dedup pipelines run at scale.
    *
    * Scale guards (all three by construction, not by tuning):
    *  - k is CORPUS-DERIVED ([[semanticK]]): mean cluster cardinality
    *    stays `targetClusterSize` at any n, so Σ cluster² grows
    *    linearly with the corpus — capped so the O(n·k·dim)
    *    assignment stays linear too (past the cap the band guard
    *    below owns candidate bounding).
    *  - a cluster that still exceeds `targetClusterSize ×
    *    maxClusterFactor` (skewed data — k-means gives no size bound)
    *    is NOT exact-searched: its members are re-bucketed by
    *    multi-table LSH bands WITHIN the cluster (the
    *    [[embeddingNearDupTop]] signature machinery), so a
    *    pathological mega-cluster contributes band-bucket collisions,
    *    never cluster².
    *  - the candidate join carries int8 SQ codes (`VectorOps.annSq`'s
    *    encoder — 4× smaller than the float vectors), scores
    *    approximately with the codegen'd integer dot kernel, prunes at
    *    `minCosine − sqMargin`, and fetches float vectors ONLY for the
    *    verify-survivors. The shuffle that pairs vectors up never
    *    moves a float array.
    *
    * Plan: training is [[VectorOps.kmeansCentroids]] (map-stage
    * argmin, centroid-only aggregates), assignment a broadcast map
    * stage, candidates from equi-joins on (label) / (label, band) —
    * no all-pairs anywhere.
    */
  def semanticNearDup(embeddings: DataFrame,
                      targetClusterSize: Int = 32,
                      maxClusterFactor: Int = 4,
                      iters: Int = 2,
                      minCosine: Double = 0.9,
                      topK: Int = 50,
                      sqMargin: Double = 0.05,
                      bandOversized: Boolean = true,
                      tables: Int = 8, bitsPerTable: Int = 10, dim: Int = 64,
                      release: Boolean = true): DataFrame = {
    val v = embeddings.select(col("vec_id"), col("embedding").as("vec"))
    val (assigned, coded) = semanticCoded(v, targetClusterSize,
      maxClusterFactor, iters, bandOversized, tables, bitsPerTable, dim)
    withSigCache(release)(assigned, coded) {
      semanticPairs(coded, v, minCosine, topK, sqMargin)
    }
  }

  /** The SemDeDup model applied to the corpus: train, assign, flag
    * oversized clusters, SQ-encode, band-sign the oversized rows.
    * Returns (assigned, coded) — callers cache or persist; `coded` is
    * the pair-join payload ([[semanticPairs]]'s input) and the float
    * vector is dropped from it, never entering a shuffle again.
    */
  private def semanticCoded(v: DataFrame, targetClusterSize: Int,
                            maxClusterFactor: Int, iters: Int,
                            bandOversized: Boolean, tables: Int,
                            bitsPerTable: Int, dim: Int): (DataFrame, DataFrame) = {
    val k = semanticK(v.count(), targetClusterSize)
    val cap = targetClusterSize.toLong * maxClusterFactor
    val cents = VectorOps.kmeansCentroidsCached(v, k, iters)
    // md5-derived planes (the certification-sweep discipline): the
    // oversized-cluster band guard stays oracle-replayable
    val allPlanes = (0 until tables).map(t =>
      VectorOps.hashHyperplanes(bitsPerTable, dim, t, 42L))
    val assigned = v.withColumn("label", VectorOps.nearestCentroidId(col("vec"), cents))
    val sizes = assigned.groupBy(col("label")).agg(count(lit(1)).as("_csize"))
    // the pair-join payload: cluster label, oversize flag, int8 codes,
    // and (oversized rows only) the LSH band signatures — the float
    // vector is DROPPED here and never enters a shuffle again
    val coded = VectorOps.sqEncodeAll(
        assigned.join(broadcast(sizes), "label")
          .withColumn("_big", lit(bandOversized) && col("_csize") > cap), "vec")
      .withColumn("sigs", when(col("_big"), graft.functions.LshSignatures(col("vec"), allPlanes)))
      .select(col("vec_id"), col("label"), col("_big"),
        col("_c8"), col("_s"), col("_n"), col("sigs"))
    (assigned, coded)
  }

  /** The candidate-mine + exact-verify tail over a coded table (from
    * [[semanticCoded]] inline or read back from a persisted index).
    */
  private def semanticPairs(coded: DataFrame, v: DataFrame,
                            minCosine: Double, topK: Int,
                            sqMargin: Double): DataFrame = {
    // approximate cosine from the int8 codes alone (annSq's scoring)
    def pairSel(joined: DataFrame): DataFrame = joined.select(
      col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
      col("a.label").as("cluster"),
      when(col("a._n") > 0 && col("b._n") > 0,
        VectorOps.intDot(col("a._c8"), col("b._c8")).cast("double") *
          col("a._s") * col("b._s") / (col("a._n") * col("b._n")))
        .otherwise(lit(-1.0)).as("approx"))
    val normal = coded.filter(!col("_big"))
    val normalCand = pairSel(normal.as("a").join(normal.as("b"),
      col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id")))
    val big = coded.filter(col("_big"))
      .select(col("vec_id"), col("label"), col("_c8"), col("_s"), col("_n"),
        posexplode(col("sigs")).as(Seq("t", "sig")))
    val bigCand = pairSel(big.as("a").join(big.as("b"),
        col("a.label") === col("b.label") && col("a.t") === col("b.t") &&
          col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id")))
      .dropDuplicates("vec_a", "vec_b") // a pair can collide in several bands
    val cand = normalCand.unionByName(bigCand)
      .filter(col("approx") >= lit(minCosine - sqMargin))
    // exact verify: floats fetched for survivors only
    cand
      .join(v.as("fa"), col("vec_a") === col("fa.vec_id"))
      .join(v.as("fb"), col("vec_b") === col("fb.vec_id"))
      .select(col("vec_a"), col("vec_b"), col("cluster"),
        VectorOps.cosine(col("fa.vec"), col("fb.vec")).as("cosine_raw"))
      .filter(col("cosine_raw") >= lit(minCosine))
      .select(col("vec_a"), col("vec_b"), col("cluster"),
        rnd4(col("cosine_raw")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
      .limit(topK)
  }

  /** PERSISTED SemDeDup index: the trained model APPLIED to the corpus
    * — cluster assignment, int8 codes, and the oversized-cluster band
    * signatures — materialized once per (corpus content, build params)
    * under the [[IndexCache]] discipline, partitioned by cluster
    * label. Training + assignment is the expensive, pure-function-of-
    * the-corpus half of semantic dedup; at 100 TB you encode once and
    * every dedup pass (and every downstream consumer of the cluster
    * structure) reads codes at rest — the same build-once/query-many
    * contract as the IVF and n-gram pair-set indexes.
    */
  def semanticIndexIfAbsent(embeddings: DataFrame, indexRoot: String,
                            targetClusterSize: Int = 32,
                            maxClusterFactor: Int = 4, iters: Int = 2,
                            bandOversized: Boolean = true,
                            tables: Int = 8, bitsPerTable: Int = 10,
                            dim: Int = 64): String = {
    val v = embeddings.select(col("vec_id"), col("embedding").as("vec"))
    val row = v
      .select(xxhash64(col("vec_id").cast("string"), col("vec").cast("string")).as("h"))
      .agg(expr("coalesce(bit_xor(h), 0L)").as("x"), count(lit(1)).as("cnt"))
      .head()
    // AlgoVersion: this artifact embeds the trained k-means assignment
    // (and band signatures) — the trainer version is part of identity
    val fp = f"${row.getLong(0)}%016x-${row.getLong(1)}x" +
      s"-c$targetClusterSize-f$maxClusterFactor-i$iters" +
      s"-g$bandOversized-t$tables-b$bitsPerTable" +
      s"-${graft.operators.VectorIndex.AlgoVersion}"
    IndexCache.getOrBuild(indexRoot, "semdedup", fp) { scratch =>
      val (assigned, coded) = semanticCoded(v, targetClusterSize,
        maxClusterFactor, iters, bandOversized, tables, bitsPerTable, dim)
      assigned.persist()
      try coded.write.partitionBy("label")
        .parquet(scratch.resolve("coded").toString)
      finally assigned.unpersist()
    }
  }

  /** [[semanticNearDup]] served from the persisted [[semanticIndexIfAbsent]]
    * artifact: the candidate tail runs over codes at rest; `embeddings`
    * supplies the float vectors for the exact verify only.
    */
  def semanticNearDupIndexed(embeddings: DataFrame, indexRoot: String,
                             minCosine: Double = 0.9, topK: Int = 50,
                             sqMargin: Double = 0.05): DataFrame = {
    val idx = semanticIndexIfAbsent(embeddings, indexRoot)
    val coded = IndexCache.readCached(embeddings.sparkSession, s"$idx/coded")
    val v = embeddings.select(col("vec_id"), col("embedding").as("vec"))
    semanticPairs(coded, v, minCosine, topK, sqMargin).localCheckpoint(true)
  }

  /** The cosine ≥ `minCosine` truth pairs that involve a PLANTED copy
    * (vec_id ≥ 1e6): one broadcast of the handful of planted vectors
    * against the corpus — O(N·planted) instead of
    * [[embeddingExactPairs]]'s O(N²). By [[plantedEmbeddings]]'s
    * construction the synthetic corpus has no organic pair above
    * ~0.5 cosine, so at the 0.95 bar this IS the full truth set —
    * DedupSpec asserts that equality against the quadratic
    * formulation, which stays the general-purpose certification tool.
    */
  def plantedTruthPairs(embeddings: DataFrame, minCosine: Double = 0.95): DataFrame = {
    val v = embeddings.select(col("vec_id"), col("embedding").as("vec"))
    val planted = v.filter(col("vec_id") >= 1000000L)
    v.as("a").join(broadcast(planted.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        VectorOps.cosine(col("a.vec"), col("b.vec")).as("cosine_raw"))
      .filter(col("cosine_raw") >= lit(minCosine))
      .select(col("vec_a"), col("vec_b"), rnd4(col("cosine_raw")).as("cosine"))
  }

  /** Driver query: semantic near-dup pairs over [[plantedEmbeddings]]
    * with the same driver-visible `recall_planted` certification
    * column as the LSH path — a planted pair is only found if both
    * copies land in the same learned cluster AND pass the exact
    * cosine bar.
    */
  def semanticNearDupQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = plantedEmbeddings(s, dir)
    val top = semanticNearDupIndexed(emb,
      s"${System.getProperty("java.io.tmpdir")}/graft-semdedup-cache")
    val truth = plantedTruthPairs(emb, minCosine = 0.95)
      .select(col("vec_a"), col("vec_b"))
    val stats = top.select(col("vec_a"), col("vec_b")).join(truth, Seq("vec_a", "vec_b"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("_hits"))
      .crossJoin(broadcast(truth.agg(
        org.apache.spark.sql.functions.count(lit(1)).as("_truth"))))
    top.crossJoin(broadcast(stats))
      .withColumn("recall_planted",
        col("_hits").cast("double") / greatest(col("_truth").cast("double"), lit(1.0)))
      .drop("_hits", "_truth")
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
  }

  /** Driver query: LSH near-dup top pairs over [[plantedEmbeddings]]
    * carrying a constant `recall_planted` column — the fraction of the
    * brute-force cosine ≥ 0.95 truth set (= the planted pairs) that
    * the LSH index surfaced. The rows-only artifact thereby certifies
    * retrieval quality the same way the `vec_ann_*` queries do.
    */
  def embedNearDupQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = plantedEmbeddings(s, dir)
    val top = embeddingNearDupTop(emb)
    val truth = plantedTruthPairs(emb, minCosine = 0.95)
      .select(col("vec_a"), col("vec_b"))
    val stats = top.select(col("vec_a"), col("vec_b")).join(truth, Seq("vec_a", "vec_b"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("_hits"))
      .crossJoin(broadcast(truth.agg(
        org.apache.spark.sql.functions.count(lit(1)).as("_truth"))))
    top.crossJoin(broadcast(stats))
      .withColumn("recall_planted",
        col("_hits").cast("double") / greatest(col("_truth").cast("double"), lit(1.0)))
      .drop("_hits", "_truth")
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
  }
}
