package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("integrity audit covers every FK edge and finds no orphans in clean data") {
    val out = Relational.qIntegrity(spark, sf).collect()
    assert(out.length === 7)
    out.foreach { r =>
      assert(r.getAs[Long]("n_orphans") === 0L, r.getAs[String]("constraint_name"))
      assert(r.getAs[Long]("n_child") > 0L)
    }
  }

  test("integrity audit counts planted orphans (and NULL keys) as violations") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-fk").toString
    // copy the tiny sf dir's dims, then corrupt lineitem
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders"))
      Tables.table(spark, sf, t).write.parquet(s"$dir/$t.parquet")
    Tables.lineitem(spark, sf)
      .withColumn("l_orderkey",
        when(col("l_linenumber") === 3, lit(-999L)).otherwise(col("l_orderkey")))
      .withColumn("l_partkey",
        when(col("l_linenumber") === 4, lit(null).cast("long")).otherwise(col("l_partkey")))
      .write.parquet(s"$dir/lineitem.parquet")
    val li = Tables.lineitem(spark, dir)
    val expectedOrderOrphans = li.filter(col("l_orderkey") === -999L).count()
    val expectedPartOrphans = li.filter(col("l_partkey").isNull).count()
    assert(expectedOrderOrphans > 0 && expectedPartOrphans > 0)
    val out = Relational.qIntegrity(spark, dir).collect()
      .map(r => r.getAs[String]("constraint_name") -> r.getAs[Long]("n_orphans")).toMap
    assert(out("lineitem.l_orderkey->orders") === expectedOrderOrphans)
    assert(out("lineitem.l_partkey->part") === expectedPartOrphans)
  }

  test("salted two-phase aggregate equals the plain aggregate") {
    val plain = Tables.lineitem(spark, sf)
      .select(
        when(col("l_quantity") <= 25, lit("bulk"))
          .otherwise(concat(lit("s"), pmod(col("l_suppkey"), lit(100)).cast("string")))
          .as("grp"),
        col("l_quantity"))
      .groupBy("grp").agg(count(lit(1)).as("n_rows"))
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_rows")).toMap
    val salted = Relational.qSkewAgg(spark, sf).collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("n_rows")).toMap
    assert(salted === plain)
  }

  test("the synthetic hot key is actually hot") {
    val out = Relational.qSkewAgg(spark, sf).collect()
    val bulk = out.find(_.getAs[String]("grp") == "bulk").get.getAs[Long]("n_rows")
    val total = out.map(_.getAs[Long]("n_rows")).sum
    assert(bulk.toDouble / total > 0.3, s"bulk=$bulk of $total")
  }

  test("mixture thresholds follow the weight formula and saturate at keep-all") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count()
    val target = math.floor(0.5 * total).toLong
    val weights = Map("en" -> 0.40, "de" -> 0.20, "fr" -> 0.15, "es" -> 0.15, "zh" -> 0.10)
    val perLang = docs.groupBy("lang").count()
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val out = TextAnalysis.mixtureSample(spark, sf).collect()
    assert(out.map(_.getAs[String]("lang")).toSet === perLang.keySet)
    out.foreach { r =>
      val lang = r.getAs[String]("lang")
      val expected = math.min(1000L,
        math.floor(weights(lang) * target * 1000.0 / perLang(lang)).toLong)
      assert(r.getAs[Long]("threshold") === expected, lang)
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
    }
  }

  test("mixture membership is rerun-stable") {
    val a = TextAnalysis.mixtureSample(spark, sf).collect().toSeq
    val b = TextAnalysis.mixtureSample(spark, sf).collect().toSeq
    assert(a === b)
  }

  test("cv-OLS: folds partition the data leakage-free; fold-0 training and held-out MAE replay exactly") {
    val out = Relational.q59CvOls(spark, sf).collect()
    assert(out.length === 5, "five folds expected")
    val nAll = Tables.lineitem(spark, sf).count()
    // the folds PARTITION the rows: test sizes sum to the corpus, and
    // every fold's train size is its exact complement
    assert(out.map(_.getLong(2)).sum === nAll)
    out.foreach(r => assert(r.getLong(1) === nAll - r.getLong(2)))
    // cluster folding: whole orders stay in one fold (leakage law)
    val crossFold = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        (conv(substring(md5(concat(lit("cv:"), col("l_orderkey").cast("string"))),
          1, 4), 16, 10).cast("long") % 5).as("fold"))
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("fold")).as("nf"))
      .filter(col("nf") > 1).count()
    assert(crossFold === 0L)
    // exact driver-side replay of fold 0's leave-out training and
    // held-out MAE from the raw rows (the integer law end to end)
    val rows = Tables.lineitem(spark, sf)
      .select(
        (conv(substring(md5(concat(lit("cv:"), col("l_orderkey").cast("string"))),
          1, 4), 16, 10).cast("long") % 5).as("fold"),
        floor(col("l_quantity") * 100.0 + 0.5).cast("long").as("x"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tr = rows.filter(_._1 != 0L); val te = rows.filter(_._1 == 0L)
    val (n, sx, sy) = (tr.length.toLong, tr.map(_._2).sum, tr.map(_._3).sum)
    val sxy = tr.map(t => t._2 * t._3).sum; val sxx = tr.map(t => t._2 * t._2).sum
    val b = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val aC = (sy.toDouble - b * sx.toDouble) / n.toDouble
    val sae = te.map(t => math.abs(t._3 -
      math.floor(aC + b * t._2 + 0.5).toLong)).sum
    val f0 = out.find(_.getLong(0) == 0L).get
    assert(f0.getDouble(3) === math.floor(b * 10000.0 + 0.5) / 10000.0, "slope replay")
    assert(f0.getDouble(4) ===
      math.floor(aC / 100.0 * 10000.0 + 0.5) / 10000.0, "intercept replay")
    assert(f0.getLong(5) === Math.floorDiv(sae * 10000L, te.length.toLong), "mae replay")
    out.foreach(r => assert(r.getLong(5) > 0L))
    // determinism
    val again = Relational.q59CvOls(spark, sf).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("skyline: dominated points drop, the tie law is strict, counts survive the collapse") {
    import spark.implicits._
    // planted front on (maximize qty, minimize price_c):
    //   (10, 500) dominated by (20, 400) — higher qty AND cheaper;
    //   (20, 400) dominated by (30, 400) by the STRICT tie law (equal
    //   price, higher qty); (25, 900) dominated by (30, 400);
    //   (40, 650) front (no higher qty is cheaper-or-equal);
    //   (50, 700) front (nothing above it)
    val rows = Seq(
      (10L, 500L), (10L, 800L), (20L, 400L), (30L, 400L), (30L, 450L),
      (25L, 900L), (40L, 650L), (50L, 700L), (50L, 950L)
    ).toDF("qty", "price_c")
    val out = Relational.q61SkylineOf(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((30L, 400L, 2L),
      (40L, 650L, 1L), (50L, 700L, 2L)),
      s"front mismatch: ${out.toSeq}")
    // brute-force dominance replay over the collapsed points
    val pts = Seq((10L, 500L, 2L), (20L, 400L, 1L), (25L, 900L, 1L),
      (30L, 400L, 2L), (40L, 650L, 1L), (50L, 700L, 2L))
    val expect = pts.filter { case (q, p, _) =>
      !pts.exists { case (q2, p2, _) => q2 > q && p2 <= p } }
    assert(out.map(t => (t._1, t._2)).toSeq ===
      expect.map(t => (t._1, t._2)))
  }

  test("RFM: quintile populations balance per dimension; cell accounting is exact") {
    val out = Relational.q60Rfm(spark, sf).collect()
    val nCust = Tables.orders(spark, sf).select(col("o_custkey")).distinct().count()
    assert(out.map(_.getLong(3)).sum === nCust, "cells must partition customers")
    // per-dimension quintile populations: each of the 5 buckets holds
    // 20% +- interpolation ties (freq is heavily tied, so allow wide
    // slack there; recency/money are near-continuous)
    def dimCounts(i: Int) = out.groupBy(_.getLong(i)).view
      .mapValues(_.map(_.getLong(3)).sum).toMap
    val r = dimCounts(0)
    val m = dimCounts(2)
    assert(r.keySet.subsetOf((1L to 5L).toSet) && m.keySet.subsetOf((1L to 5L).toSet))
    Seq(r, m).foreach { dc =>
      dc.values.foreach(v => assert(v >= nCust / 10 && v <= nCust * 4 / 10,
        s"quintile badly unbalanced: $dc"))
    }
    // exact integer cell mean law
    out.foreach(row => assert(row.getLong(5) ===
      Math.floorDiv(row.getLong(4), row.getLong(3))))
    // determinism
    val again = Relational.q60Rfm(spark, sf).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }
}
