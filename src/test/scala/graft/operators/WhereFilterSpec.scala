package graft.operators

import graft.SparkSpec

class WhereFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "srcA", 100L),
    (2L, "fr", "srcB", 250L),
    (3L, "de", "srcA", 300L),
    (4L, "en", "srcB", 400L)
  ).toDF("doc_id", "lang", "source", "n_chars")

  private def ids(json: String): Seq[Long] =
    docs.filter(WhereFilter.compile(json)).select("doc_id")
      .as[Long].collect().toSeq.sorted

  test("implicit $eq") { assert(ids("""{"lang": "en"}""") === Seq(1L, 4L)) }

  test("comparison operators") {
    assert(ids("""{"n_chars": {"$gt": 250}}""") === Seq(3L, 4L))
    assert(ids("""{"n_chars": {"$gte": 250}}""") === Seq(2L, 3L, 4L))
    assert(ids("""{"n_chars": {"$lt": 250}}""") === Seq(1L))
    assert(ids("""{"n_chars": {"$lte": 250}}""") === Seq(1L, 2L))
    assert(ids("""{"lang": {"$ne": "en"}}""") === Seq(2L, 3L))
  }

  test("$in / $nin") {
    assert(ids("""{"lang": {"$in": ["en", "de"]}}""") === Seq(1L, 3L, 4L))
    assert(ids("""{"lang": {"$nin": ["en", "de"]}}""") === Seq(2L))
  }

  test("$and / $or / nesting") {
    assert(ids("""{"$and": [{"lang": "en"}, {"n_chars": {"$gt": 200}}]}""") === Seq(4L))
    assert(ids("""{"$or": [{"lang": "de"}, {"n_chars": {"$lt": 150}}]}""") === Seq(1L, 3L))
    assert(ids("""{"$or": [{"$and": [{"lang": "en"}, {"source": "srcA"}]}, {"lang": "fr"}]}""")
      === Seq(1L, 2L))
  }

  test("multiple top-level fields are implicit $and") {
    assert(ids("""{"lang": "en", "source": "srcB"}""") === Seq(4L))
  }

  test("range via multiple ops on one field") {
    assert(ids("""{"n_chars": {"$gte": 200, "$lte": 350}}""") === Seq(2L, 3L))
  }

  test("unsupported operator rejected") {
    assertThrows[IllegalArgumentException] { WhereFilter.compile("""{"lang": {"$regex": "x"}}""") }
  }

  test("non-object filter rejected") {
    assertThrows[IllegalArgumentException] { WhereFilter.compile("""["not", "an", "object"]""") }
  }

  // ---- where_document (document-content) grammar ----

  private lazy val contentDocs = Seq(
    (1L, "the quick brown fox"),
    (2L, "lazy dog sleeps"),
    (3L, "quick quick slow"),
    (4L, null.asInstanceOf[String])
  ).toDF("doc_id", "document")

  private def docIds(json: String): Seq[Long] =
    contentDocs.filter(WhereFilter.compileDocument(json,
      org.apache.spark.sql.functions.col("document")))
      .select("doc_id").as[Long].collect().toSeq.sorted

  test("where_document $contains / $not_contains") {
    assert(docIds("""{"$contains": "quick"}""") === Seq(1L, 3L))
    assert(docIds("""{"$not_contains": "quick"}""") === Seq(2L))
  }

  test("where_document null documents match nothing, even $not_contains") {
    assert(!docIds("""{"$not_contains": "zzz"}""").contains(4L))
  }

  test("where_document $and / $or nesting") {
    assert(docIds("""{"$and": [{"$contains": "quick"}, {"$contains": "fox"}]}""") === Seq(1L))
    assert(docIds("""{"$or": [{"$contains": "fox"}, {"$contains": "dog"}]}""") === Seq(1L, 2L))
    assert(docIds(
      """{"$or": [{"$and": [{"$contains": "quick"}, {"$not_contains": "fox"}]},
        |{"$contains": "lazy"}]}""".stripMargin) === Seq(2L, 3L))
  }

  test("where_document rejects metadata-style clauses and non-objects") {
    assertThrows[IllegalArgumentException] {
      WhereFilter.compileDocument("""{"field": "x"}""",
        org.apache.spark.sql.functions.col("document"))
    }
    assertThrows[IllegalArgumentException] {
      WhereFilter.compileDocument("""{"$contains": 7}""",
        org.apache.spark.sql.functions.col("document"))
    }
    assertThrows[IllegalArgumentException] {
      WhereFilter.compileDocument(""""just a string"""",
        org.apache.spark.sql.functions.col("document"))
    }
  }
}
