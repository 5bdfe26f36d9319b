package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.catalog.CollectionData

/** Continuous ingestion into a collection: a Structured Streaming
  * sink that upserts every micro-batch into the item log — the write
  * path a live vector store needs (documents arriving on a stream,
  * immediately visible to `query`/`get` via merge-on-read).
  *
  * Delivery semantics: foreachBatch is at-least-once across failures;
  * a replayed micro-batch re-appends the same rows under a NEW batch
  * number, and latest-wins resolution makes the replay invisible to
  * readers — upsert ingestion is effectively idempotent. The log's
  * single-writer assumption holds: ONE streaming query owns a
  * collection (Spark runs foreachBatch serially per query).
  */
object CollectionIngest {

  /** Start upserting `stream` (id, embedding, document, metadata_json
    * — missing columns null like any upsert) into `collection`.
    *
    * The batch is deduplicated per id first: a trigger interval that
    * delivered two versions of one document would otherwise trip the
    * log's in-batch duplicate rejection and poison the query (the
    * replayed batch fails identically forever). Streams carry no
    * intra-batch order, so the surviving row per id is arbitrary but
    * the ingest never wedges; sources that need last-writer-wins
    * within a trigger should carry a version column and pre-aggregate.
    * The batch is cached for its two passes (dedup-check + write).
    */
  def start(data: CollectionData, collection: String, stream: DataFrame,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cached = batch.dropDuplicates("id").persist()
        try {
          if (!cached.isEmpty) data.upsert(collection, cached)
        } finally cached.unpersist()
      }
      .start()
}
