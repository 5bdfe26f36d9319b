package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join under heavy skew") {
    // 90% of the left side hits one key
    val skewed = ((1 to 900).map(i => (1L, s"row$i")) ++ (1 to 100).map(i => ((i % 7 + 2).toLong, s"tail$i")))
      .toDF("k", "payload")
    val small = (1L to 10L).map(i => (i, s"dim$i")).toDF("k", "attr")

    val plain = skewed.join(small, "k")
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedInner(skewed, small, "k", buckets = 8)
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted

    assert(salted.toSeq === plain.toSeq)
  }

  test("salt actually spreads the hot key across buckets") {
    val skewed = (1 to 1000).map(i => (1L, s"row$i")).toDF("k", "payload")
    val salts = skewed.withColumn("_salt", pmod(hash(skewed.columns.map(col): _*), lit(8)))
      .select("_salt").distinct().count()
    assert(salts >= 6, s"expected the hot key spread over ~8 salts, got $salts")
  }

  test("buckets=1 degenerates to the plain join") {
    val l = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val r = Seq((1L, "x")).toDF("k", "w")
    assert(SkewJoin.saltedInner(l, r, "k", 1).count() === 1)
  }
}
