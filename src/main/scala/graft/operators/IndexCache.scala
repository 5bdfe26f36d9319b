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
