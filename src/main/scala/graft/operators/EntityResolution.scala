package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Entity resolution (record linkage): match "dirty" records back to a
  * clean registry without ever comparing all pairs — the blocking +
  * scoring discipline every large-scale dedup/linkage system uses
  * (Fellegi–Sunter framing; the data-pipeline cousin of the document
  * near-dup family in [[Dedup]], but over STRUCTURED records with typed
  * attributes instead of text shingles).
  *
  * Shape, and why it scales:
  *   - Candidate generation is MULTI-PASS BLOCKING: each pass is a pure
  *     equi-join on a cheap deterministic key (here pass A =
  *     (nation, market segment), pass B = (nation, account-balance
  *     bucket)), so candidates are bounded by Σ block_size², never
  *     N² — the same sparse-key contract as the MinHash band join.
  *     Multiple passes exist because real dirty data corrupts blocking
  *     attributes too: a record whose segment is mangled is invisible
  *     to pass A but pass B still lands it (the demo perturbs every
  *     7th record's segment precisely so the second pass is
  *     load-bearing, and the spec proves those records still match).
  *   - Pair scoring is a codegen'd `levenshtein` on the name plus the
  *     blocking-attribute agreement implied by the join — map-side
  *     work on the candidate set only.
  *   - Match selection is a per-dirty-record `row_number` window
  *     ordered by (distance, candidate id) — distance ranking with a
  *     deterministic tiebreak, partitioned by the dirty id so there is
  *     no global sort.
  *   - The emitted `correct` column certifies accuracy against the
  *     planted ground truth (dirty ids ARE the source custkeys) in the
  *     driver-visible result, the same honesty contract as the ANN
  *     `recall_at_10` columns.
  *
  * At 100 TB: blocking keys are chosen so block sizes stay bounded
  * (add salting or a size cap per block exactly as [[SkewJoin]] does
  * for hot keys); passes union BEFORE dedup so the distinct lands on
  * (dirty, candidate) pairs, not raw rows; and the scoring scan is
  * pure map-side over candidates, so the whole operator is two
  * equi-joins + one distinct + one window.
  */
object EntityResolution {

  /** The deterministic "dirty" registry derived from `customer`:
    * the name drops its 10th character (one edit from the original —
    * unrecoverable by equality, trivially recoverable by edit
    * distance), and every 7th record's market segment is corrupted to
    * `UNKNOWN` so single-pass segment blocking provably misses it.
    */
  private[operators] def dirtyRecords(clean: DataFrame): DataFrame =
    clean.select(
      col("c_custkey").as("d_id"),
      concat(substring(col("c_name"), 1, 9), substring(col("c_name"), 11, 64))
        .as("d_name"),
      when(col("c_custkey") % 7 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("d_seg"),
      col("c_nationkey").as("d_nat"),
      col("c_acctbal").as("d_bal"))

  private def balBucket(c: Column): Column =
    floor(c / lit(500.0)).cast("long")

  /** Match every dirty record to its best clean candidate. Output:
    * one row per dirty record with the matched custkey, the edit
    * distance, and the ground-truth `correct` flag.
    */
  def erMatches(s: SparkSession, dir: String): DataFrame = {
    val clean = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_nationkey"), col("c_acctbal"))
    val dirty = dirtyRecords(clean)

    // pass A: (nation, segment) — misses the segment-corrupted rows
    val passA = clean.join(dirty,
      clean("c_nationkey") === dirty("d_nat") &&
        clean("c_mktsegment") === dirty("d_seg"))
    // pass B: (nation, balance bucket) — catches what A missed
    val passB = clean.join(dirty,
      clean("c_nationkey") === dirty("d_nat") &&
        balBucket(clean("c_acctbal")) === balBucket(dirty("d_bal")))

    // cheap-reject tier BEFORE the O(|a|·|b|) DP kernel — the standard
    // length/suffix filter of edit-distance similarity joins: the
    // modeled corruption deletes one character from the name's first
    // half, which cannot touch the last 4 characters, so requiring
    // suffix agreement is LOSSLESS for true pairs and kills the ~99 %
    // of block-mates whose key digits differ. Levenshtein then runs on
    // survivors only (~1 per dirty record instead of ~100).
    val cand = passA.select(col("d_id"), col("d_name"), col("c_custkey"), col("c_name"))
      .unionByName(passB.select(col("d_id"), col("d_name"), col("c_custkey"), col("c_name")))
      .filter(substring(col("c_name"), -4, 4) === substring(col("d_name"), -4, 4))
      .distinct()

    val w = Window.partitionBy(col("d_id"))
      .orderBy(col("lev").asc, col("c_custkey").asc)
    cand
      .withColumn("lev", levenshtein(col("d_name"), col("c_name")).cast("long"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("d_id").as("dirty_id"),
        col("c_custkey").as("matched"),
        col("lev"),
        (col("c_custkey") === col("d_id")).cast("long").as("correct"))
      .orderBy(col("dirty_id"))
  }
}
