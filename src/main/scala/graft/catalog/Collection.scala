package graft.catalog

import java.nio.charset.StandardCharsets
import java.util.UUID

/** User-facing collection handle, mirroring the reference's
  * `Collection { name, id, metadata }` (reference:
  * src/collection.rs:4-9). Like the reference, tenant/database are
  * captured by the client and dropped from the returned value
  * (reference: src/client.rs:128-132).
  */
final case class Collection(
    name: String,
    id: String,
    metadata: Option[Map[String, String]])

object Collection {
  /** reference src/collection.rs:12-19 — ctor with empty id. */
  def apply(name: String, metadata: Option[Map[String, String]]): Collection =
    Collection(name, id = "", metadata)
}

/** Catalog-row schema for the `_collections` table (FIXTURES.md §1).
  * `metadataJson` round-trips the write-side map through JSON with
  * sorted keys, mirroring the reference's read-side dynamic
  * `serde_json::Value` (reference: src/collection.rs:8).
  */
final case class CollectionMeta(
    name: String,
    id: String,
    metadata: Option[Map[String, String]],
    metadataJson: Option[String],
    tenant: String,
    database: String) {
  def toCollection: Collection = Collection(name, id, metadata)
}

object CollectionMeta {
  /** Deterministic, coordination-free id: a name-based (v3) UUID over
    * the fully-qualified collection name. At cluster scale any
    * executor can derive the id without a catalog round trip, and
    * re-creation after delete yields a stable id (the reference's
    * server assigns ids opaquely; determinism is our local choice).
    */
  def deterministicId(tenant: String, database: String, name: String): String =
    UUID.nameUUIDFromBytes(s"$tenant/$database/$name".getBytes(StandardCharsets.UTF_8)).toString

  def sortedJson(metadata: Map[String, String]): String =
    metadata.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${quote(k)}:${quote(v)}" }
      .mkString("{", ",", "}")

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
