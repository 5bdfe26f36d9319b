package graft.catalog

import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON (de)serialization for the `_collections.json` catalog file.
  * Canonical form: array of objects with sorted-key metadata, so
  * equal catalogs serialize byte-identically.
  */
object CatalogCodec {

  def toJson(rows: Seq[CollectionMeta]): String =
    rows.map { r =>
      val fields = Seq(
        "name" -> q(r.name),
        "id" -> q(r.id),
        "metadata" -> r.metadata.map(CollectionMeta.sortedJson).getOrElse("null"),
        "metadataJson" -> r.metadataJson.map(q).getOrElse("null"),
        "tenant" -> q(r.tenant),
        "database" -> q(r.database))
      fields.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")

  def fromJson(json: String): Seq[CollectionMeta] =
    JsonMethods.parse(json) match {
      case JArray(items) => items.map {
        case JObject(fields) =>
          val m = fields.toMap
          def str(k: String): String = m(k) match {
            case JString(s) => s
            case other      => throw new IllegalArgumentException(s"catalog field $k: $other")
          }
          val metadata = m.get("metadata") match {
            case Some(JObject(kvs)) =>
              Some(kvs.map { case (k, JString(v)) => k -> v
                             case (k, other) => throw new IllegalArgumentException(s"metadata $k: $other") }.toMap)
            case _ => None
          }
          val metadataJson = m.get("metadataJson") match {
            case Some(JString(s)) => Some(s)
            case _                => None
          }
          CollectionMeta(str("name"), str("id"), metadata, metadataJson,
            str("tenant"), str("database"))
        case other => throw new IllegalArgumentException(s"catalog entry: $other")
      }
      case other => throw new IllegalArgumentException(s"catalog must be a JSON array, got $other")
    }

  /** Parse a string→string metadata map from its canonical
    * [[CollectionMeta.sortedJson]] form (the export `_meta` payload).
    */
  def mapFromSortedJson(json: String): Map[String, String] =
    JsonMethods.parse(json) match {
      case JObject(kvs) => kvs.map {
        case (k, JString(v)) => k -> v
        case (k, other) => throw new IllegalArgumentException(s"metadata $k: $other")
      }.toMap
      case other => throw new IllegalArgumentException(s"metadata must be a JSON object, got $other")
    }

  private def q(s: String): String =
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
