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
    */
  def start(data: CollectionData, collection: String, stream: DataFrame,
            checkpointDir: String,
            trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) data.upsert(collection, batch)
      }
      .start()
}
