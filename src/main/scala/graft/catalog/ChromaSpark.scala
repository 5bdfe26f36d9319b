package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Behavior-compatible Spark analogue of the reference's
  * `ChromaClient` (reference: src/client.rs:12-35): the collection
  * catalog surface of a vector store, backed by a `_collections`
  * parquet table under a warehouse directory instead of a remote
  * server. Tenant/database scoping mirrors the reference's
  * `?tenant&database` query params (src/client.rs:58-67) as catalog
  * columns.
  *
  * Faithfully reproduced server-side semantics (SURVEY.md §2.2):
  * name uniqueness per tenant+database; `getOrCreateCollection`
  * returns the EXISTING collection with its original metadata;
  * `reset` is global, destructive, and gated (the server's
  * `ALLOW_RESET=TRUE`, src/client.rs:277). The reference's per-call
  * pre-flight round trip (src/client.rs:37-52) collapses into one
  * check at construction — re-issuing it per call is pure overhead
  * in-process (SURVEY.md §4).
  *
  * Scale note: catalog rows are the ONLY place this engine may
  * `collect()` — a catalog is O(thousands) of rows regardless of
  * data volume. Collection ids are deterministic name-based UUIDs so
  * a 1000-executor job never needs a catalog round trip to locate a
  * collection's data directory.
  */
class ChromaSpark(
    val spark: SparkSession,
    val warehouseDir: String,
    val tenant: String = ChromaSpark.DefaultTenant,
    val database: String = ChromaSpark.DefaultDatabase,
    val allowReset: Boolean = false) {

  import spark.implicits._
  import EngineError._

  // tenant/database become path segments of dataDir — the same
  // traversal rules as collection names apply (a tenant of "../x"
  // would escape the warehouse root).
  validateName(tenant)
  validateName(database)
  checkPreFlight()

  /** reference src/client.rs:37-52 — here: warehouse reachable + session alive. */
  private def checkPreFlight(): Unit = {
    if (spark == null || spark.sparkContext.isStopped)
      throw PreflightError("Spark session is not active")
    val p = Paths.get(warehouseDir)
    try Files.createDirectories(p)
    catch { case e: Exception => throw PreflightError(s"warehouse '$warehouseDir' not writable: ${e.getMessage}") }
  }

  private def catalogPath: String = s"$warehouseDir/_collections.json"

  private def versionedPath(v: Long): Path =
    Paths.get(f"$warehouseDir%s/_collections.$v%016d.json")

  private def validateName(name: String): Unit = {
    if (name == null || name.isEmpty)
      throw InvalidPathError(String.valueOf(name), "collection name must be non-empty")
    if (name.contains('/') || name.contains('\\') || name == "." || name == "..")
      throw InvalidPathError(name, "collection name must not contain path separators")
  }

  /** Directory holding a collection's data; derivable executor-side
    * without reading the catalog.
    */
  def dataDir(name: String): String = s"$warehouseDir/$tenant/$database/$name"

  /** The catalog itself is a JSON file, not a parquet table: it is
    * O(collections) metadata mutated per operation, and a Spark job
    * per read-modify-write costs ~300 ms where a file read costs ~1 ms
    * — the same reasoning that makes transaction-log table formats
    * keep their metadata in JSON. The DataFrame view for joining
    * against data ([[collectionsDF]]) is derived on demand. Catalog
    * throughput thereby matches the reference's 2-RTT-per-op cost
    * model (BASELINE.md) instead of losing 100× to job overhead.
    *
    * MULTI-WRITER SAFETY (the transaction-log discipline, same spirit
    * as the data-log batch minting in [[CollectionData]]): the
    * catalog state lives at a monotonically-versioned path
    * `_collections.<v>.json`, and every mutation is a CAS —
    * read version v, compute the new row set, PUBLISH at v+1 via
    * `Files.createLink` (hard-link of a fully-written temp file:
    * the version file appears atomically with complete content, and
    * link() fails with FileAlreadyExists if any other writer claimed
    * v+1 first). A losing writer re-reads the fresh snapshot and
    * re-applies its mutation — so two sessions creating different
    * collections both survive, mirroring the server-serialized
    * catalog semantics the reference assumes (src/client.rs:94-133).
    * A crash before publish leaves only an orphan temp file, never a
    * stale lock or a burned version. Readers take the max version
    * present; superseded versions are TRUNCATED to zero-byte
    * tombstones rather than deleted — a deleted slot could be
    * re-claimed by an arbitrarily stale writer's late link, silently
    * losing its mutation below the current max, so slots stay
    * occupied forever (one empty inode per DDL, bounded by the
    * human-scale catalog mutation rate). A reader that catches a
    * version mid-truncation re-lists: a newer max exists by
    * construction. The legacy unversioned `_collections.json` reads
    * as version 0.
    */
  private def listVersions(): Seq[Long] = {
    val dir = Paths.get(warehouseDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .map(_.getFileName.toString)
        .collect {
          case n if n.startsWith("_collections.") && n.endsWith(".json") &&
            n.length == "_collections.".length + 16 + ".json".length &&
            n.slice("_collections.".length, "_collections.".length + 16).forall(_.isDigit) =>
            n.slice("_collections.".length, "_collections.".length + 16).toLong
        }
        .toSeq
    } finally s.close()
  }

  /** Last parsed snapshot, keyed by its version: a version file's
    * content is IMMUTABLE by the CAS construction (createLink either
    * publishes a complete file or fails — nothing ever rewrites
    * `_collections.<v>.json`), so when the directory's max version
    * matches the cached one, the cached rows ARE the current catalog
    * and the JSON reparse is skipped. Catalog reads stay
    * freshness-correct across concurrent writers (a new version
    * changes the max and forces the reread) while a read-heavy
    * lifecycle pays one `Files.list` instead of list+read+parse.
    * Version −1 = nothing cached; the legacy unversioned file is
    * never cached (it predates the immutability guarantee).
    */
  @volatile private var cachedSnapshot: (Long, Seq[CollectionMeta]) = (-1L, Seq.empty)

  /** Freshest catalog snapshot: (version, rows). */
  private def readVersioned(): (Long, Seq[CollectionMeta]) = {
    val versions = listVersions()
    if (versions.isEmpty) {
      if (!Files.exists(Paths.get(catalogPath))) return (0L, Seq.empty)
      try (0L, CatalogCodec.fromJson(new String(Files.readAllBytes(Paths.get(catalogPath)), "UTF-8")))
      catch { case e: Exception => throw StorageError(s"reading catalog at $catalogPath", e) }
    } else {
      val v = versions.max
      val cached = cachedSnapshot
      if (cached._1 == v) return cached
      try {
        val bytes = Files.readAllBytes(versionedPath(v))
        // truncated to a tombstone between our list and our read — a
        // newer max exists by construction; take it
        if (bytes.isEmpty) return readVersioned()
        val snap = (v, CatalogCodec.fromJson(new String(bytes, "UTF-8")))
        cachedSnapshot = snap
        snap
      } catch {
        // removed under us (reset) between list and read — re-list
        case _: java.nio.file.NoSuchFileException => readVersioned()
        case e: Exception => throw StorageError(s"reading catalog at ${versionedPath(v)}", e)
      }
    }
  }

  private def readCatalog(): Seq[CollectionMeta] = readVersioned()._2

  /** CAS mutation: `f` maps the freshest row set to (new row set,
    * result) and is re-applied from scratch on every publish conflict
    * — all validation (dup-name, not-found) therefore runs against
    * the snapshot that actually wins. Returning the SAME (eq) row
    * set skips the write (the getOrCreate hit path stays read-only).
    */
  private def casMutate[A](f: Seq[CollectionMeta] => (Seq[CollectionMeta], A)): A = {
    var attempts = 0
    while (true) {
      val (v, rows) = readVersioned()
      val (newRows, result) = f(rows)
      if (newRows eq rows) return result
      val tmp = Paths.get(s"$catalogPath.tmp-${java.util.UUID.randomUUID()}")
      try {
        Files.write(tmp, CatalogCodec.toJson(newRows).getBytes("UTF-8"))
        try {
          Files.createLink(versionedPath(v + 1), tmp)
          // won the CAS — the published rows are the fresh snapshot
          cachedSnapshot = (v + 1, newRows)
          // Reclaim superseded rows WITHOUT reopening their CAS slots:
          // old version files are TRUNCATED to zero-byte tombstones,
          // never deleted. Deleting version o would let a writer that
          // read snapshot o-1 long ago — and has been stalled since —
          // succeed a late createLink at o BELOW the current max: its
          // "published" mutation would be invisible to every reader
          // (they take the max) and silently lost, which is exactly
          // the lost-update the CAS exists to prevent (the 8-writer
          // race spec catches this). A tombstone keeps the slot
          // occupied forever — the stale link fails FileAlreadyExists
          // and the writer retries on the fresh snapshot — at the
          // cost of one empty inode per catalog mutation, bounded by
          // the inherently human-scale DDL rate. Bounded window: every
          // successful publish truncates, so only stragglers from
          // crashed writers sit below it.
          // Reclaim runs AFTER the commit point and is best-effort:
          // the createLink above already durably published the
          // mutation, so an I/O hiccup truncating old versions must
          // not surface as a failed op (the caller would retry an op
          // that succeeded and hit a spurious 'already exists').
          try {
            (math.max(1L, v - 10) to v - 2).foreach { o =>
              val p = versionedPath(o)
              if (Files.exists(p) && Files.size(p) > 0)
                Files.write(p, Array.emptyByteArray,
                  java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
            }
            if (v >= 2) Files.deleteIfExists(Paths.get(catalogPath))
          } catch { case _: java.io.IOException => /* next publish retries */ }
          return result
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => // lost the race
            attempts += 1
            if (attempts > 1000)
              throw StorageError(s"catalog CAS at $catalogPath: >1000 conflicts",
                new IllegalStateException("livelock"))
        }
      } catch {
        case e: EngineError => throw e
        case e: Exception   => throw StorageError(s"writing catalog at $catalogPath", e)
      } finally Files.deleteIfExists(tmp)
    }
    throw new IllegalStateException("unreachable")
  }

  private def scoped(rows: Seq[CollectionMeta]): Seq[CollectionMeta] =
    rows.filter(r => r.tenant == tenant && r.database == database)

  /** reference src/client.rs:70-91 — liveness probe returning nanoseconds. */
  def heartbeat(): Long = {
    if (spark.sparkContext.isStopped) throw PreflightError("Spark session stopped")
    spark.range(1).count() // exercises the scheduler end to end
    System.nanoTime()
  }

  /** reference src/client.rs:285-303 — raw version string. */
  def version(): String = s"graft 0.1.0 (spark ${spark.version})"

  /** reference src/client.rs:94-133. Unlike the reference client —
    * which forwards a duplicate-name create to the server and
    * surfaces the rejection as an opaque parse error
    * (src/client.rs:148-156 pattern) — the engine checks the catalog
    * first and raises a typed [[EngineError.CollectionStateError]].
    */
  def createCollection(name: String, metadata: Option[Map[String, String]] = None): Collection = {
    validateName(name)
    val meta = CollectionMeta(
      name = name,
      id = CollectionMeta.deterministicId(tenant, database, name),
      metadata = metadata,
      metadataJson = metadata.map(CollectionMeta.sortedJson),
      tenant = tenant,
      database = database)
    casMutate[Unit] { rows =>
      if (scoped(rows).exists(_.name == name))
        throw CollectionStateError(s"collection '$name' already exists in $tenant/$database")
      (rows :+ meta, ())
    }
    Files.createDirectories(Paths.get(dataDir(name)))
    meta.toCollection
  }

  /** reference src/client.rs:136-157 — point lookup by name. */
  def getCollection(name: String): Collection = {
    validateName(name)
    scoped(readCatalog()).find(_.name == name)
      .getOrElse(throw CollectionStateError(s"collection '$name' not found in $tenant/$database"))
      .toCollection
  }

  /** reference src/client.rs:160-199 — idempotent create. On hit the
    * EXISTING collection (original metadata) is returned and the new
    * metadata is ignored — §2.2 semantic 2.
    */
  def getOrCreateCollection(name: String, metadata: Option[Map[String, String]] = None): Collection = {
    validateName(name)
    // One CAS covers both arms: a concurrent same-name create between
    // our read and our publish makes the retry take the hit path and
    // return the EXISTING row — never a duplicate, never an error.
    val meta = casMutate[CollectionMeta] { rows =>
      scoped(rows).find(_.name == name) match {
        case Some(existing) => (rows, existing)
        case None =>
          val fresh = CollectionMeta(
            name = name,
            id = CollectionMeta.deterministicId(tenant, database, name),
            metadata = metadata,
            metadataJson = metadata.map(CollectionMeta.sortedJson),
            tenant = tenant,
            database = database)
          (rows :+ fresh, fresh)
      }
    }
    Files.createDirectories(Paths.get(dataDir(name)))
    meta.toCollection
  }

  /** reference src/client.rs:202-226 — status-checked delete. */
  def deleteCollection(name: String): Unit = {
    validateName(name)
    casMutate[Unit] { rows =>
      if (!scoped(rows).exists(_.name == name))
        throw CollectionStateError(s"collection '$name' not found in $tenant/$database")
      (rows.filterNot(r => r.tenant == tenant && r.database == database && r.name == name), ())
    }
    deleteRecursively(Paths.get(dataDir(name)))
  }

  /** reference src/client.rs:229-258 — list within tenant/database
    * scope; sorted by name for determinism (the server's order is
    * unspecified).
    */
  def listCollections(): Seq[Collection] =
    scoped(readCatalog()).sortBy(_.name).map(_.toCollection)

  /** Chroma server's `modify` (rename and/or replace metadata) — not
    * surfaced by the reference client but part of the implied server
    * API (SURVEY.md §0). Rename moves the data directory and re-derives
    * the deterministic id; metadata replacement is whole-map (the
    * server's PUT semantics).
    */
  def modifyCollection(name: String, newName: Option[String] = None,
                       newMetadata: Option[Map[String, String]] = None): Collection = {
    validateName(name)
    newName.foreach(validateName)
    val rows = readCatalog()
    val existing = scoped(rows).find(_.name == name)
      .getOrElse(throw CollectionStateError(s"collection '$name' not found in $tenant/$database"))
    newName.filter(_ != name).foreach { nn =>
      if (scoped(rows).exists(_.name == nn))
        throw CollectionStateError(s"collection '$nn' already exists in $tenant/$database")
    }
    val renamed = newName.getOrElse(name)
    // Move the data FIRST: if the move fails (stale destination dir,
    // I/O error) the catalog still points at the old, intact name. A
    // catalog-write failure after the move is recoverable by retrying
    // (we move back on failure); the reverse order would orphan the
    // data under a name the catalog no longer knows.
    val moved = renamed != name && Files.exists(Paths.get(dataDir(name)))
    if (moved) {
      if (Files.exists(Paths.get(dataDir(renamed))))
        throw CollectionStateError(
          s"rename '$name' -> '$renamed': destination data dir already exists")
      Files.move(Paths.get(dataDir(name)), Paths.get(dataDir(renamed)))
    }
    try {
      // Re-validate against the winning snapshot inside the CAS: a
      // concurrent delete of `name` or create of `renamed` between
      // our pre-read and the publish surfaces as a typed error (and
      // the data move is rolled back below).
      val updated = casMutate[CollectionMeta] { fresh =>
        val cur = scoped(fresh).find(_.name == name)
          .getOrElse(throw CollectionStateError(s"collection '$name' not found in $tenant/$database"))
        if (renamed != name && scoped(fresh).exists(_.name == renamed))
          throw CollectionStateError(s"collection '$renamed' already exists in $tenant/$database")
        val up = cur.copy(
          name = renamed,
          id = CollectionMeta.deterministicId(tenant, database, renamed),
          metadata = newMetadata.orElse(cur.metadata),
          metadataJson = newMetadata.map(CollectionMeta.sortedJson).orElse(cur.metadataJson))
        (fresh.filterNot(r =>
          r.tenant == tenant && r.database == database && r.name == name) :+ up, up)
      }
      updated.toCollection
    } catch {
      case e: Throwable =>
        if (moved) Files.move(Paths.get(dataDir(renamed)), Paths.get(dataDir(name)))
        throw e
    }
  }

  /** Catalog as a DataFrame — the engine-native view the reference
    * can't offer; lets catalog metadata join against data tables.
    */
  def collectionsDF(): Dataset[CollectionMeta] =
    spark.createDataset(scoped(readCatalog()))

  /** reference src/client.rs:261-282 — global destructive reset,
    * gated like the server's ALLOW_RESET=TRUE (hint at
    * src/client.rs:277).
    */
  def reset(): Unit = {
    if (!allowReset)
      throw CollectionStateError(
        "Reset is disabled. Construct ChromaSpark with allowReset=true (mirrors ALLOW_RESET=TRUE)")
    val all = readCatalog()
    all.foreach { r =>
      deleteRecursively(Paths.get(s"$warehouseDir/${r.tenant}/${r.database}/${r.name}"))
    }
    // Publish the wipe THROUGH the CAS rather than deleting version
    // files: deletion would (a) reopen superseded CAS slots for
    // in-flight stale writers — the lost-update race the tombstone
    // design exists to prevent — and (b) restart version numbering at
    // 1, so a long-lived client whose cachedSnapshot carries a
    // pre-reset version number would silently serve resurrected rows
    // once the rebuilt catalog climbs back to it. One more version
    // with an empty row set keeps numbering monotone forever and
    // updates every CAS invariant (cache, tombstones, legacy file)
    // on the normal path.
    casMutate { rows => (if (rows.isEmpty) rows else Seq.empty, ()) }
    if (listVersions().isEmpty) deleteRecursively(Paths.get(catalogPath))
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      require(p.toAbsolutePath.startsWith(Paths.get(warehouseDir).toAbsolutePath),
        s"refusing to delete outside warehouse: $p")
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
    }
  }
}

object ChromaSpark {
  /** reference src/client.rs:336-337 defaults. */
  val DefaultTenant = "default_tenant"
  val DefaultDatabase = "default_database"
}
