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
}
