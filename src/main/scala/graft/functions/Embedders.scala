package graft.functions

import org.apache.spark.sql.Column

/** Per-collection pluggable embedder registry — the engine analogue
  * of Chroma's per-collection `embedding_function` (the reference
  * ships collection metadata opaquely, reference src/client.rs:97,351;
  * upstream Chroma resolves the embedder per collection server-side).
  * A collection opts in via the `graft:embedder` metadata key; absent
  * metadata means the default md5 feature-hash embedder at the
  * historical dim 16, so every pre-existing collection and oracle is
  * byte-for-byte unchanged.
  *
  * An embedder is a NAME plus a pure `Column => Column` from document
  * text to `array<float>` — it must be a Catalyst expression (codegen
  * or HOF), never a driver-side function, so auto-embedding stays a
  * map stage inside the ingest scan at any corpus size. Registration
  * is process-wide (executors re-resolve nothing: the expression tree
  * itself ships with the plan, the registry is consulted only at plan
  * build time on the driver).
  *
  * Re-embed semantics ride on top: [[graft.catalog.CollectionData]]
  * normalize()/update() call [[embedOf]] wherever they previously
  * hard-wired [[HashEmbed]], so a document update on a collection
  * with a custom embedder re-embeds with THAT embedder.
  */
object Embedders {
  /** Name under which the built-in md5 feature-hash embedder (dim 16)
    * is registered; also the default when a collection carries no
    * `graft:embedder` metadata.
    */
  val Default = "hash16"

  /** Collection-metadata key selecting the embedder. */
  val MetadataKey = "graft:embedder"

  final case class Embedder(name: String, dim: Int, embed: Column => Column)

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Embedder]()

  /** Register (or replace) an embedder; latest registration wins. */
  def register(e: Embedder): Unit = registry.put(e.name, e)

  def resolve(name: String): Option[Embedder] = Option(registry.get(name))

  def names: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet().asScala.toSeq.sorted
  }

  // Built-ins: the historical dim-16 hash embedder (the default), and
  // a dim-32 sibling proving the registry is genuinely pluggable
  // (two embedders of the same family with observably different
  // output shapes — CollectionDataSpec pins both).
  register(Embedder(Default, 16, t => HashEmbed(t, 16)))
  register(Embedder("hash32", 32, t => HashEmbed(t, 32)))
}
