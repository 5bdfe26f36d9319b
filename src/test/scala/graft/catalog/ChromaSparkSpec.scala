package graft.catalog

import java.nio.file.Files
import graft.SparkSpec
import graft.catalog.EngineError._

class ChromaSparkSpec extends SparkSpec {

  private def freshClient(allowReset: Boolean = false,
                          tenant: String = ChromaSpark.DefaultTenant,
                          database: String = ChromaSpark.DefaultDatabase): ChromaSpark = {
    val dir = Files.createTempDirectory("graft-warehouse").toString
    new ChromaSpark(spark, dir, tenant, database, allowReset)
  }

  test("lifecycle golden replay of reference tests/end-to-en.rs:5-45") {
    val c = freshClient()
    val meta = Map(
      "description" -> "my first collection into a vector db",
      "other-metadata" -> "testing get or create fn with metadata...")

    c.createCollection("collection-1")                       // :8
    c.getOrCreateCollection("collection-2", Some(meta))      // :10-24
    c.createCollection("collection-3")                       // :26
    assert(c.listCollections().length === 3)                 // :31
    c.deleteCollection("collection-1")                       // :33
    c.deleteCollection("collection-2")                       // :34
    assert(c.listCollections().length === 1)                 // :37
    assert(c.getCollection("collection-3").name === "collection-3") // :39-40
    c.deleteCollection("collection-3")                       // :42
    assert(c.listCollections().isEmpty)
  }

  test("tenant/database names with path traversal are rejected at construction") {
    assertThrows[InvalidPathError] { freshClient(tenant = "../escape") }
    assertThrows[InvalidPathError] { freshClient(database = "a/b") }
    assertThrows[InvalidPathError] { freshClient(tenant = "..") }
  }

  test("create enforces name uniqueness (§2.2 semantic 1)") {
    val c = freshClient()
    c.createCollection("dup")
    assertThrows[CollectionStateError] { c.createCollection("dup") }
  }

  test("getOrCreate on hit returns ORIGINAL metadata (§2.2 semantic 2)") {
    val c = freshClient()
    val original = Map("k" -> "v1")
    c.createCollection("gc", Some(original))
    val got = c.getOrCreateCollection("gc", Some(Map("k" -> "v2", "extra" -> "x")))
    assert(got.metadata === Some(original))
  }

  test("tenant/database isolation (§2.2 semantic 3)") {
    val dir = Files.createTempDirectory("graft-warehouse").toString
    val a = new ChromaSpark(spark, dir, "tenant_a", "db_a")
    val b = new ChromaSpark(spark, dir, "tenant_b", "db_b")
    a.createCollection("same-name")
    b.createCollection("same-name") // no collision across scopes
    assert(a.listCollections().map(_.name) === Seq("same-name"))
    assert(b.listCollections().map(_.name) === Seq("same-name"))
    a.deleteCollection("same-name")
    assert(a.listCollections().isEmpty)
    assert(b.listCollections().map(_.name) === Seq("same-name"))
  }

  test("reset is gated (§2.2 semantic 4) and global when allowed") {
    val c = freshClient(allowReset = false)
    c.createCollection("x")
    assertThrows[CollectionStateError] { c.reset() }
    assert(c.listCollections().length === 1)

    val c2 = freshClient(allowReset = true)
    c2.createCollection("y")
    c2.reset()
    assert(c2.listCollections().isEmpty)
  }

  test("reset never resurrects rows into a long-lived client's cache") {
    val wh = Files.createTempDirectory("graft-reset-cache").toString
    val resetter = new ChromaSpark(spark, wh, allowReset = true)
    val longLived = new ChromaSpark(spark, wh)
    resetter.createCollection("old-1")
    resetter.createCollection("old-2")
    resetter.createCollection("old-3")
    // longLived caches the pre-reset snapshot at its version number
    assert(longLived.listCollections().map(_.name).sorted ===
      Seq("old-1", "old-2", "old-3"))
    resetter.reset()
    // rebuild until the catalog's version count passes the pre-reset
    // max — an implementation that DELETED version files (restarting
    // numbering at 1) would now serve longLived its stale cached rows
    (1 to 4).foreach(i => resetter.createCollection(s"new-$i"))
    assert(longLived.listCollections().map(_.name).sorted ===
      Seq("new-1", "new-2", "new-3", "new-4"))
    assert(resetter.listCollections().map(_.name).sorted ===
      Seq("new-1", "new-2", "new-3", "new-4"))
  }

  test("list reflects mutations immediately (§2.2 semantic 5)") {
    val c = freshClient()
    assert(c.listCollections().isEmpty)
    c.createCollection("a")
    assert(c.listCollections().map(_.name) === Seq("a"))
    c.createCollection("b")
    assert(c.listCollections().map(_.name) === Seq("a", "b"))
    c.deleteCollection("a")
    assert(c.listCollections().map(_.name) === Seq("b"))
  }

  test("get/delete of missing collection raise typed errors") {
    val c = freshClient()
    assertThrows[CollectionStateError] { c.getCollection("nope") }
    assertThrows[CollectionStateError] { c.deleteCollection("nope") }
  }

  test("invalid names rejected") {
    val c = freshClient()
    assertThrows[InvalidPathError] { c.createCollection("") }
    assertThrows[InvalidPathError] { c.createCollection("a/b") }
    assertThrows[InvalidPathError] { c.getCollection("..") }
  }

  test("metadata round-trips through the catalog parquet") {
    val c = freshClient()
    val meta = Map("k1" -> "v1", "weird \"chars\"\n" -> "tab\there")
    c.createCollection("rt", Some(meta))
    assert(c.getCollection("rt").metadata === Some(meta))
    // JSON column is sorted-key canonical form
    val row = c.collectionsDF().collect().head
    assert(row.metadataJson.get.startsWith("{"))
  }

  test("ids are deterministic name-based UUIDs") {
    val c1 = freshClient()
    val c2 = freshClient()
    assert(c1.createCollection("same").id === c2.createCollection("same").id)
    assert(c1.getCollection("same").id ===
      CollectionMeta.deterministicId(c1.tenant, c1.database, "same"))
  }

  test("modify renames (moving data + re-deriving id) and replaces metadata") {
    val c = freshClient()
    c.createCollection("old-name", Some(Map("k" -> "v")))
    val d = new CollectionData(c)
    d.upsert("old-name", {
      import spark.implicits._
      Seq(("a", Seq(1f, 0f), "doc", "{}")).toDF("id", "embedding", "document", "metadata_json")
    })
    val modified = c.modifyCollection("old-name", newName = Some("new-name"))
    assert(modified.name === "new-name")
    assert(modified.id === CollectionMeta.deterministicId(c.tenant, c.database, "new-name"))
    assert(modified.metadata === Some(Map("k" -> "v"))) // metadata untouched on rename
    assertThrows[CollectionStateError] { c.getCollection("old-name") }
    assert(d.count("new-name") === 1) // data moved with the rename

    val remeta = c.modifyCollection("new-name", newMetadata = Some(Map("k2" -> "v2")))
    assert(remeta.metadata === Some(Map("k2" -> "v2"))) // whole-map replace
    // rename onto an existing name is rejected
    c.createCollection("taken")
    assertThrows[CollectionStateError] {
      c.modifyCollection("new-name", newName = Some("taken"))
    }
  }

  test("two concurrent writers both survive: CAS catalog loses no mutation") {
    // The server serializes catalog writes (reference src/client.rs:94-133);
    // the engine's CAS'd versioned log must match that: N sessions racing
    // create/delete on ONE warehouse, every mutation visible at the end.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = Files.createTempDirectory("graft-warehouse").toString
    val writers = 8
    // several rounds over ONE warehouse: later rounds run with a
    // populated version history, which is what exposes the
    // pruned-slot reclaim race (a deleted old version letting a stale
    // writer link below the current max and lose its row — caught
    // live by this spec; slots are tombstoned now, never deleted)
    for (round <- 0 until 3) {
      val pool = Executors.newFixedThreadPool(writers)
      try {
        val start = new CountDownLatch(1)
        val futures = (0 until writers).map { i =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = {
              val c = new ChromaSpark(spark, dir) // own session object per writer
              start.await(10, TimeUnit.SECONDS)
              c.createCollection(s"col-$round-$i")
              c.createCollection(s"col-$round-$i-victim")
              c.deleteCollection(s"col-$round-$i-victim")
            }
          })
        }
        start.countDown()
        futures.foreach(_.get(120, TimeUnit.SECONDS))
      } finally pool.shutdown()
    }
    val survivor = new ChromaSpark(spark, dir)
    assert(survivor.listCollections().map(_.name).sorted ===
      (for (r <- 0 until 3; i <- 0 until writers) yield s"col-$r-$i").sorted)

    // Concurrent same-name getOrCreate: exactly one row, both callers
    // get the SAME collection (idempotent under the race, §2.2.2).
    val pool2 = Executors.newFixedThreadPool(2)
    try {
      val start2 = new CountDownLatch(1)
      val fs = (0 until 2).map { i =>
        pool2.submit(new java.util.concurrent.Callable[Collection] {
          def call(): Collection = {
            val c = new ChromaSpark(spark, dir)
            start2.await(10, TimeUnit.SECONDS)
            c.getOrCreateCollection("shared", Some(Map("from" -> s"w$i")))
          }
        })
      }
      start2.countDown()
      val got = fs.map(_.get(60, TimeUnit.SECONDS))
      assert(got.map(_.id).distinct.length === 1)
      assert(survivor.listCollections().count(_.name == "shared") === 1)
    } finally pool2.shutdown()
  }

  test("heartbeat returns nanos and version names spark") {
    val c = freshClient()
    assert(c.heartbeat() > 0L)
    assert(c.version().contains("spark"))
  }
}
