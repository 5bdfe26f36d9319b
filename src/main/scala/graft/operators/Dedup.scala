package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection for training-data pipelines, in the four
  * standard flavors: MinHash+LSH, SimHash, blocked exact n-gram
  * Jaccard, and embedding-cosine near-dup. (Exact dedup lives in
  * [[TextAnalysis.dedupExact]].)
  *
  * Scale shape shared by all four: derive a compact per-document
  * signature in a map stage (HOFs over token/shingle arrays — no
  * UDFs), generate candidate pairs with ONE equi-join on a bucket
  * key, then verify candidates exactly. Nothing here ever compares
  * all pairs: the quadratic step is confined to within-bucket
  * collisions, which the signature width tunes.
  */
object Dedup {

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

  /** Exact Jaccard over two distinct-shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a).cast("double") + size(b).cast("double") - inter)
  }

  private def rnd4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** MinHash+LSH near-dup pairs: shingle → sign → band → ONE
    * self-equi-join on (band, hash) → dedup → exact-Jaccard verify.
    * `docs` needs (doc_id, text).
    */
  def minhashPairs(docs: DataFrame, n: Int = 3, bands: Int = 16,
                   rowsPerBand: Int = 4, threshold: Double = 0.7): DataFrame = {
    // Materialize (shingles, signature) ONCE. Without the persist(),
    // CollapseProject inlines the signature tree into all 16 band
    // slices and the plan recomputes it for every downstream join —
    // a ~1000× expression blowup observed as a 10-minute stall at
    // sf0.01. The cached relation is tiny: one 64-long array + one
    // shingle array per doc.
    val signed = docs
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), bands * rowsPerBand))
      .persist()
    val banded = signed.select(col("doc_id"),
      posexplode(bandHashes(col("sig"), bands, rowsPerBand)).as(Seq("band", "bhash")))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val withShingles = candidates
      .join(signed.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(signed.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
    withShingles
      .select(col("doc_a"), col("doc_b"), rnd4(jaccard(col("sh_a"), col("sh_b"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Hamming distance between two packed signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  /** SimHash near-dup pairs: candidates from band slices of the
    * 32-bit signature, verified by full hamming distance ≤
    * `maxHamming`. Band count is maxHamming+1 so pigeonhole
    * GUARANTEES every true pair shares at least one untouched band —
    * recall 1.0 within the radius, selectivity from the remaining
    * bits.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bands = math.min(maxHamming + 1, 32)
    val width = (32 + bands - 1) / bands
    val mask = (1L << width) - 1
    // persist: the signature feeds both sides of the self-join (see
    // the expression-blowup note in minhashPairs).
    val signed = docs.select(col("doc_id"), simhashColumn(col("text")).as("sig")).persist()
    val banded = signed.select(col("doc_id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * width).bitwiseAND(lit(mask))): _*)).as(Seq("band", "bhash")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", hamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 32-bit SimHash: per bit b (0..31), sum over distinct token
    * hashes of ±1 by bit b; signature bit = vote ≥ 0. 32 bits keeps
    * the packed value positive in a long under ANSI arithmetic.
    */
  def simhashColumn(text: Column): Column = {
    val toks = array_distinct(split(trim(text), "\\s+"))
    val hashes = transform(toks, t => xxhash64(t))
    // Bit positions unrolled in Scala (shiftright needs a literal count).
    val bits = array((0 until 32).map { b =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)) >= 0,
        lit(1L)).otherwise(lit(0L))
    }: _*)
    aggregate(bits, lit(0L), (acc, x) => acc * 2 + x)
  }

  /** Blocked exact n-gram Jaccard: all pairs within (lang,
    * length-bucket) blocks — the exact-verification path when blocking
    * keys exist. Quadratic ONLY within a block; block sizing is the
    * scale knob. Fully oracle-expressible (no hashing involved).
    */
  def ngramJaccardTop(docs: DataFrame, n: Int = 3, topK: Int = 100): DataFrame = {
    // Shingles are hashed to longs BEFORE the pairwise intersects:
    // |A∩B| over 64-bit hashes equals the string intersection unless
    // two distinct shingles of one doc collide (P ≈ |sh|²/2⁶⁵ ≈ 1e-14)
    // — integer set-intersection is several times cheaper than string
    // comparison on the quadratic verify stage. The DuckDB oracle
    // intersects the strings directly; the counts agree.
    val d = docs.select(col("doc_id"), col("lang"),
      floor(col("n_chars") / 50).cast("long").as("bucket"),
      transform(shingles(col("text"), n), s => xxhash64(s)).as("sh"))
    d.as("a").join(d.as("b"),
        col("a.lang") === col("b.lang") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        rnd4(jaccard(col("a.sh"), col("b.sh"))).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(topK)
  }

  /** Embedding-cosine near-dup: multi-table LSH self-join for
    * candidates (never all-pairs), exact cosine re-rank, top pairs.
    */
  /** bitsPerTable is wider here than in query-time ANN (10 vs 6): a
    * self-join's candidate count grows with the SQUARE of bucket
    * occupancy, so near-dup mining wants many small buckets — truly
    * similar vectors still collide, random ones mostly don't.
    */
  def embeddingNearDupTop(embeddings: DataFrame, topK: Int = 50,
                          tables: Int = 8, bitsPerTable: Int = 10,
                          dim: Int = 64): DataFrame = {
    val allPlanes = (0 until tables).map(t => VectorOps.hyperplanes(bitsPerTable, dim, 42L + t))
    def sigArray(vec: Column): Column =
      array(allPlanes.map(p => VectorOps.lshSignature(vec, p)): _*)
    // persist: both self-join sides read the signatures; without it the
    // 80 hyperplane dot-products per vector run twice.
    val signed = embeddings.select(col("vec_id"), col("embedding").as("vec"))
      .withColumn("sigs", sigArray(col("vec")))
      .persist()
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

  // ---- SparkEntry query wrappers ----

  /** Per-doc MinHash/SimHash signature digests (deterministic,
    * always-nonempty index-build output; pair-finding is verified on
    * planted duplicates in ScalaTest).
    */
  def signaturesQuery(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(col("text"), 3)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        xxhash64(concat_ws(",", transform(minhashSignature(sh), v => v.cast("string"))))
          .as("minhash_digest"),
        simhashColumn(col("text")).as("simhash32"),
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

  def simhashPairsQuery(s: SparkSession, dir: String): DataFrame =
    simhashPairs(plantedDocs(s, dir), maxHamming = 3)

  def ngramTopQuery(s: SparkSession, dir: String): DataFrame =
    ngramJaccardTop(Tables.documents(s, dir))

  def embedNearDupQuery(s: SparkSession, dir: String): DataFrame =
    embeddingNearDupTop(Tables.embeddings(s, dir))
}
