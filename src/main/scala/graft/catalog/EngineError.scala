package graft.catalog

/** Error taxonomy mirroring the reference's `ChromaClientError` 1:1
  * (reference: src/error.rs:4-17). The HTTP-flavored variants map to
  * their in-process causes: transport errors become storage I/O
  * errors, HTTP status errors become catalog-state errors.
  */
sealed abstract class EngineError(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

object EngineError {
  /** reference UrlParseError (error.rs:6) — bad warehouse/collection path. */
  final case class InvalidPathError(path: String, detail: String)
    extends EngineError(s"Invalid path '$path': $detail")

  /** reference RequestError (error.rs:8) — underlying storage I/O failed. */
  final case class StorageError(detail: String, cause: Throwable)
    extends EngineError(s"Storage operation failed: $detail", cause)

  /** reference ResponseError (error.rs:10) — operation produced no usable result. */
  final case class OperationError(detail: String)
    extends EngineError(s"Operation failed: $detail")

  /** reference ResponseParseError (error.rs:12) — stored metadata unreadable. */
  final case class MetadataParseError(detail: String)
    extends EngineError(s"Failed to parse metadata: $detail")

  /** reference ResponseStatusError (error.rs:14) — catalog-state conflict
    * (duplicate name on create, missing name on get/delete, gated reset). */
  final case class CollectionStateError(detail: String)
    extends EngineError(detail)

  /** reference PreflightError (error.rs:16) — engine/session not ready. */
  final case class PreflightError(detail: String)
    extends EngineError(s"Pre-flight check failed: $detail")
}
