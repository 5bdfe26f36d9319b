package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.KmvSketch

/** Distinct-set ALGEBRA from mergeable KMV sketches — the estimator
  * family the HLL tier can't serve: HLL unions losslessly but cannot
  * intersect, while a KMV sketch is a uniform bottom-k sample of the
  * hashed universe, so sketch PAIRS alone yield Jaccard similarity
  * and distinct-intersection estimates (Beyer et al., SIGMOD 2007).
  *
  * The driver query measures cross-source VOCABULARY overlap over the
  * documents corpus: one token-explode pass reduces (map-side) to
  * twenty 8k-byte sketches, and every pairwise estimate is computed
  * from those sketches — never from a corpus-sized join. The exact
  * intersection/union/Jaccard ride along as in-row certification
  * (the `recall_at_10` honesty discipline): at 100 TB you would drop
  * the exact columns and keep ONLY the sketch path, whose cost is one
  * scan plus 20·k longs of state; the certified error columns price
  * what that buys.
  *
  * Cross-engine determinism: hashes are the established 15-hex-digit
  * md5 prefix (60-bit, positive in BIGINT for both engines), the
  * sketch is a pure function of the hash SET (ordered-set semantics —
  * insertion, partitioning, and merge order all cancel), and every
  * derived estimate uses the same IEEE double expression shape on
  * both engines, rounded rnd4 at the boundary.
  */
object DistinctSketch {

  /** 2^60 — the hash space size; exactly representable in double. */
  private val HSPACE = 1152921504606846976.0

  /** 60-bit md5-prefix hash, the suite's cross-engine uniform hash. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Per-source KMV vocabulary sketches: (source, sk ascending
    * array<bigint> of ≤ k hashes, n_distinct exact certification).
    */
  private[operators] def sourceSketches(docs: DataFrame, k: Int): DataFrame = {
    val hashed = docs
      .select(col("source"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("source"), h60(col("tok")).as("h"))
    // exact distinct per source rides along for certification only
    val dist = hashed.distinct()
    val sk = dist.groupBy(col("source")).agg(
      KmvSketch(col("h"), k).as("sk"),
      count(lit(1)).as("n_distinct"))
    sk
  }

  /** Pairwise source-overlap estimates from sketches + exact
    * certification columns. Output one row per unordered source pair.
    */
  def vocabOverlap(docs: DataFrame, k: Int = 256): DataFrame = {
    val sk = sourceSketches(docs, k).localCheckpoint(true)
    val a = sk.select(col("source").as("src_a"), col("sk").as("ska"),
      col("n_distinct").as("nda"))
    val b = sk.select(col("source").as("src_b"), col("sk").as("skb"),
      col("n_distinct").as("ndb"))
    // 190 pair rows of ≤k-long arrays: broadcast, no shuffle
    val pairs = a.join(broadcast(b), col("src_a") < col("src_b"))
      .withColumn("combined",
        array_sort(array_distinct(concat(col("ska"), col("skb")))))
      .withColumn("kp", least(lit(k), size(col("combined"))))
      .withColumn("u", expr("slice(combined, 1, kp)"))
      .withColumn("theta", element_at(col("u"), col("kp")))
      .withColumn("n_common_sketch", size(expr(
        "filter(u, h -> array_contains(ska, h) AND array_contains(skb, h))")))
      .withColumn("jaccard_est",
        col("n_common_sketch").cast("double") / col("kp").cast("double"))
      // union estimate: exact when BOTH sketches saw their whole set,
      // else the KMV cardinality estimator on the combined sketch
      .withColumn("union_est",
        when(size(col("ska")) < k && size(col("skb")) < k,
          size(col("combined")).cast("double"))
          .otherwise((col("kp") - 1).cast("double") * lit(HSPACE) /
            col("theta").cast("double")))
      .withColumn("inter_est", col("jaccard_est") * col("union_est"))
    // exact intersection via the hash-distinct relation (certification)
    val dist = docs
      .select(col("source"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("source"), h60(col("tok")).as("h")).distinct()
    val exact = dist.as("x").join(dist.as("y"),
        col("x.h") === col("y.h") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val rnd4 = CrossEngine.rnd4 _
    pairs.join(exact, Seq("src_a", "src_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .withColumn("exact_union", col("nda") + col("ndb") - col("exact_inter"))
      .select(
        col("src_a"), col("src_b"),
        col("kp").cast("long").as("k_combined"),
        col("n_common_sketch").cast("long").as("n_common_sketch"),
        rnd4(col("jaccard_est")).as("jaccard_est"),
        rnd4(col("inter_est")).as("inter_est"),
        col("exact_inter"),
        col("exact_union"),
        rnd4(col("exact_inter").cast("double") /
          col("exact_union").cast("double")).as("jaccard_exact"),
        rnd4(abs(col("inter_est") - col("exact_inter").cast("double")) /
          greatest(col("exact_inter"), lit(1L)).cast("double")).as("inter_rel_err"))
      .orderBy(col("src_a"), col("src_b"))
  }

  def vocabOverlapQuery(s: SparkSession, dir: String): DataFrame =
    vocabOverlap(Tables.documents(s, dir))
}
