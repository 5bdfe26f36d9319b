package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint is invariant to case and whitespace layout") {
    val df = Seq(
      "Hello   world",
      "hello world",
      " HELLO\tWORLD \n"
    ).toDF("text").select(TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(df.distinct().count() === 1)
  }

  test("fingerprint separates different content") {
    val df = Seq("alpha beta", "alpha gamma").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(df.distinct().count() === 2)
  }

  test("exact dedup groups planted duplicates under min doc_id") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "THE  QUICK  BROWN  FOX"), // dup of 1 after normalization
      (3L, "something else entirely"),
      (4L, "the quick brown fox")     // dup of 1 verbatim
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("planted")
    val out = docs
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")
      .collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("keep_id") === 1L)
    assert(out(0).getAs[Long]("n_copies") === 3L)
    assert(out(1).getAs[Long]("keep_id") === 3L)
  }

  test("langid picks script/diacritic tiers before defaulting to en") {
    val docs = Seq(
      (1L, "plain english text", "en"),
      (2L, "texte français avec é", "fr"),
      (3L, "deutscher text mit ü", "de"),
      (4L, "texto español con ñ", "es"),
      (5L, "中文文本", "zh")
    ).toDF("doc_id", "text", "lang")
    val predicted = docs.select(
      col("lang"),
      when(regexp_count(col("text"), lit("[\\x{4e00}-\\x{9fff}]")) > 0, "zh")
        .when(regexp_count(col("text"), lit("[äöüß]")) > 0, "de")
        .when(regexp_count(col("text"), lit("[éèêàçœ]")) > 0, "fr")
        .when(regexp_count(col("text"), lit("[ñáíóú¿¡]")) > 0, "es")
        .otherwise("en").as("predicted"))
      .collect()
    predicted.foreach(r => assert(r.getString(0) === r.getString(1)))
  }
}
