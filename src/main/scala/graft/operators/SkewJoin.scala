package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for key-skewed inputs — the manual escape hatch
  * when AQE's skew splitting isn't enough (e.g. one key holding >50%
  * of a 100 TB fact table, where even a split partition set all lands
  * on the same joined key).
  *
  * Mechanics: the skewed (large) side gets a deterministic salt in
  * [0, buckets) derived by hashing its whole row; the replicated
  * (small) side is exploded ×buckets so every (key, salt) bucket finds
  * its match. The hot key's rows now spread over `buckets` reducers.
  * Result set is identical to the unsalted join (verified by spec);
  * cost is buckets× duplication of the small side — pick buckets ≈
  * skew factor, not more.
  */
object SkewJoin {

  /** @param skewed    large side with hot keys
    * @param replicated small side (each row duplicated `buckets`×)
    * @param key       equi-join column present on both sides
    * @param buckets   salt fan-out (≥1)
    */
  def saltedInner(skewed: DataFrame, replicated: DataFrame, key: String,
                  buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val saltedLeft = skewed.withColumn("_salt",
      pmod(hash(skewed.columns.map(col): _*), lit(buckets)))
    val saltedRight = replicated.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
