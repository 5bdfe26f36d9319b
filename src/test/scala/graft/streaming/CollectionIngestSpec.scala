package graft.streaming

import graft.SparkSpec
import graft.catalog.{ChromaSpark, CollectionData}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class CollectionIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streamed micro-batches upsert into a collection and are query-visible") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val client = new ChromaSpark(spark, wh)
    client.createCollection("live")
    val data = new CollectionData(client)
    val input = MemoryStream[(String, Seq[Float], String, String)]
    val stream = input.toDF().toDF("id", "embedding", "document", "metadata_json")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-ckpt").toString
    val q = CollectionIngest.start(data, "live", stream, ckpt)
    try {
      input.addData(("a", Seq(1f, 0f), "doc a", "{}"), ("b", Seq(0f, 1f), "doc b", "{}"))
      q.processAllAvailable()
      assert(data.count("live") === 2)
      // a later micro-batch upserting an existing id replaces it
      input.addData(("a", Seq(0f, 1f), "doc a v2", "{}"))
      q.processAllAvailable()
      assert(data.count("live") === 2)
      assert(data.get("live", ids = Seq("a")).collect().head.getString(1) === "doc a v2")
      // and the vector search sees the ingested state immediately
      val qdf = Seq((1L, Seq(0f, 1f))).toDF("query_id", "qvec")
      val top = data.query("live", qdf, nResults = 1).collect()
      assert(top.head.getString(1) === "a") // moved onto the query vector
    } finally q.stop()
  }

  test("document-only streamed items auto-embed and become text-queryable") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-ingest-ae").toString
    val client = new ChromaSpark(spark, wh)
    client.createCollection("live")
    val data = new CollectionData(client)
    val input = MemoryStream[(String, String)]
    val stream = input.toDF().toDF("id", "document")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-ae-ckpt").toString
    val q = CollectionIngest.start(data, "live", stream, ckpt)
    try {
      input.addData(("a", "alpha beta gamma"), ("b", "delta epsilon zeta"))
      q.processAllAvailable()
      // the ingest path derived embeddings; query-by-text finds the
      // identical document at distance 0 (same embedder both sides)
      val top = data.queryTexts("live", Seq("alpha beta gamma"), nResults = 1).collect()
      assert(top.head.getString(1) === "a")
      assert(top.head.getAs[Double]("distance") < 1e-12)
    } finally q.stop()
  }

  test("a micro-batch with duplicate ids does not poison the query") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft-ingest-dup").toString
    val client = new ChromaSpark(spark, wh)
    client.createCollection("live")
    val data = new CollectionData(client)
    val input = MemoryStream[(String, Seq[Float], String, String)]
    val stream = input.toDF().toDF("id", "embedding", "document", "metadata_json")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ingest-dup-ckpt").toString
    val q = CollectionIngest.start(data, "live", stream, ckpt)
    try {
      // two versions of 'a' inside ONE trigger interval: without the
      // per-batch dedup this trips the log's duplicate-id rejection
      // and the replayed batch fails forever
      input.addData(("a", Seq(1f, 0f), "v1", "{}"), ("a", Seq(1f, 0f), "v2", "{}"))
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"query died: ${q.exception}")
      assert(data.count("live") === 1)
    } finally q.stop()
  }

  test("stream_collection driver query is the byte-exact twin of the batch-ingested serve") {
    // The streaming write path (readStream file source → AvailableNow
    // → foreachBatch upsert) must land the collection in EXACTLY the
    // state a batch add produces: same live rows, same content
    // fingerprint, same persisted-tier serve, same ranked output.
    // This is what lets stream_collection share collection_ann_index's
    // DuckDB oracle verbatim.
    val streamed = graft.SparkEntry
      .streamCollectionIngest(spark, "/root/testdata/sf0.001").collect()
    val batch = graft.SparkEntry
      .collectionAnnIndex(spark, "/root/testdata/sf0.001").collect()
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq,
      "stream-ingested collection serve diverged from the batch twin")
  }
}
