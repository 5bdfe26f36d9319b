package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Shared build-once / reuse-forever discipline for persisted,
  * content-fingerprinted index artifacts (the IVF inverted file, the
  * n-gram pair set): derive the directory from the fingerprint, build
  * ONLY if that exact (content, params) artifact isn't already
  * complete, and make the build crash-safe — scratch dir, completion
  * marker written last, atomic rename into place, concurrent-builder
  * race resolved by keeping the winner (both built the identical
  * artifact, so dropping ours is free).
  */
private[graft] object IndexCache {

  /** Resolved-relation memo for IMMUTABLE artifact directories: a
    * `spark.read.parquet(dir)` on a cold path costs a leaf-file
    * listing job plus footer-driven schema inference EVERY call —
    * observed as ~0.2-0.5 s of the warm collection-serve latency,
    * pure planning overhead re-paid per query. An IndexCache artifact
    * never changes once `_INDEX_OK` lands, so the resolved DataFrame
    * (whose InMemoryFileIndex and schema are baked in) is reusable
    * verbatim; partition-pruning filters still apply per query
    * against the in-memory partition spec. Keyed per (session, path)
    * because a plan is tied to its SparkSession; bounded so stopped
    * test sessions can't accumulate.
    */
  private val relationMemo =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.Map[String, org.apache.spark.sql.DataFrame]]()

  /** Per-dir invalidation generation (r13, closing an r12 advisory):
    * the relation is BUILT outside the lock, so a writer that appends
    * and calls [[invalidate]] between this reader's miss and its put
    * would otherwise have its invalidation silently lost — the stale
    * file index gets cached and later serves miss the appended rows.
    * The reader records the dir's generation at the miss and skips
    * the put (under the same lock invalidate bumps under) if it
    * moved; skipping a put is always safe — the next read rebuilds.
    * Bounded: entries exist only for dirs that were ever invalidated,
    * and an overflow clear bumps the EPOCH first — a clear alone
    * would reset a dir's generation to the same 0 an in-flight
    * reader recorded (for a dir never invalidated before), letting
    * it cache a pre-append index; with the epoch folded into every
    * recorded generation, a post-clear check can only mismatch, and
    * skipping a put is always safe.
    */
  private val generation =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  @volatile private var genEpoch = 0L

  private def genOf(dir: String): (Long, Long) =
    (genEpoch, generation.getOrDefault(dir, 0L))

  def readCached(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    // Per-session access-order LRU bounded at 256 relations (r11
    // advisory #2: the old full `clear()` past the cap evicted hot
    // shared-index relations with the cold). The plan-building
    // `spark.read.parquet` runs outside the lock; a lost race merely
    // rebuilds a pure relation.
    val perSession = relationMemo.synchronized {
      var m = relationMemo.get(spark)
      if (m == null) {
        m = graft.Lru.bounded[String, org.apache.spark.sql.DataFrame](256)
        relationMemo.put(spark, m)
      }
      m
    }
    val hit = perSession.get(dir)
    if (hit != null) hit
    else {
      val gen0 = genOf(dir)
      val built = spark.read.parquet(dir)
      relationMemo.synchronized {
        if (genOf(dir) == gen0) perSession.put(dir, built)
      }
      built
    }
  }

  /** Drop cached relations for `dir` across every session — REQUIRED
    * after any `mode("append")` into an artifact subdirectory (the
    * delta-append index paths), or a cached file index would silently
    * miss the new files. Writers that only ever create fresh
    * fingerprint-keyed directories never need this. Bumps the dir's
    * generation under the same lock so a concurrent reader that
    * resolved the PRE-append file index can never cache it (see
    * [[generation]]).
    */
  def invalidate(dir: String): Unit = relationMemo.synchronized {
    if (generation.size > 4096) { genEpoch += 1; generation.clear() }
    generation.merge(dir, 1L, (a, b) => java.lang.Long.valueOf(a + b))
    relationMemo.values.forEach(m => { m.remove(dir); () })
  }

  /** Returns the directory of the completed artifact named
    * `prefix-fingerprint` under `root`, building it via `build`
    * (called with the scratch path) only when absent.
    */
  def getOrBuild(root: String, prefix: String, fingerprint: String)
                (build: Path => Unit): String = {
    val dir = Paths.get(root, s"$prefix-$fingerprint")
    val marker = dir.resolve("_INDEX_OK")
    if (Files.exists(marker)) return dir.toString
    Files.createDirectories(Paths.get(root))
    val scratch = Paths.get(root,
      s"$prefix-$fingerprint.building-${java.util.UUID.randomUUID}")
    build(scratch)
    Files.write(scratch.resolve("_INDEX_OK"), fingerprint.getBytes)
    try Files.move(scratch, dir, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.DirectoryNotEmptyException =>
        // another builder won the race with an identical artifact —
        // keep theirs, drop ours
        import java.util.Comparator
        Files.walk(scratch)
          .sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.delete(f))
    }
    dir.toString
  }
}
