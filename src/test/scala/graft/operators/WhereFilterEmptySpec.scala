package graft.operators

import graft.SparkSpec

class WhereFilterEmptySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "en"), (2L, "fr")).toDF("doc_id", "lang")

  test("empty where object matches everything") {
    assert(docs.filter(WhereFilter.compile("{}")).count() === 2)
  }

  test("empty $and matches everything; empty $or matches nothing") {
    assert(docs.filter(WhereFilter.compile("""{"$and": []}""")).count() === 2)
    assert(docs.filter(WhereFilter.compile("""{"$or": []}""")).count() === 0)
  }
}
