package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.Row

/** Driver-side single-file parquet writer for SMALL collection-log
  * batches (the item-API lifecycle path: adds/upserts of a handful of
  * rows). A distributed `DataFrame.write` costs a full Spark job plus
  * the file-commit protocol (~250 ms of scheduler + rename overhead
  * per mutation) regardless of batch size; a catalog-style mutation of
  * a few rows should cost what the reference's one HTTP round trip
  * costs (BASELINE.md's 2-RTT cost model). Large/distributed batches
  * never come here — [[CollectionData.appendBatch]] routes them
  * through the normal executor write path.
  *
  * The file uses the standard 3-level LIST encoding, so Spark's
  * vectorized reader consumes it exactly like an executor-written
  * file; both kinds coexist in one log directory.
  */
private[catalog] object DriverParquet {
  import scala.jdk.CollectionConverters._

  /** parquet-mr schema mirroring CollectionData.LogSchema. */
  private val Schema = MessageTypeParser.parseMessageType(
    """message spark_schema {
      |  optional binary id (STRING);
      |  optional group embedding (LIST) { repeated group list { optional float element; } }
      |  optional binary document (STRING);
      |  optional binary metadata_json (STRING);
      |  required int64 _batch;
      |  required boolean _deleted;
      |}""".stripMargin)

  /** Writes `rows` (id, embedding, document, metadata_json) as one
    * snappy parquet file under `logDir`, tagged with the batch number
    * and tombstone flag. File name is unique per call so appends
    * never collide.
    */
  /** Driver-side read of every row in a log directory (both
    * driver-written and executor-written files — each uses the
    * standard 3-level LIST encoding, so one reader serves both).
    * Mirrors [[writeBatch]]: only for SMALL logs, where a distributed
    * scan's job+schedule overhead dwarfs the bytes; the caller gates
    * on total file size. Returns (id, embedding, document,
    * metadata_json, _batch, _deleted) tuples in file order.
    */
  def readLog(conf: org.apache.hadoop.conf.Configuration,
              logDir: String): Seq[(String, Seq[Float], String, String, Long, Boolean)] = {
    import org.apache.parquet.hadoop.example.GroupReadSupport
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.example.data.Group
    val dir = java.nio.file.Paths.get(logDir)
    if (!java.nio.file.Files.isDirectory(dir)) return Nil
    val files = {
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }
    val out = Seq.newBuilder[(String, Seq[Float], String, String, Long, Boolean)]
    files.foreach { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), new Path(f.toUri.toString))
        .withConf(conf).build()
      try {
        var g: Group = reader.read()
        while (g != null) {
          def str(field: String): String =
            if (g.getFieldRepetitionCount(field) > 0) g.getString(field, 0) else null
          val emb: Seq[Float] =
            if (g.getFieldRepetitionCount("embedding") > 0) {
              val lst = g.getGroup("embedding", 0)
              (0 until lst.getFieldRepetitionCount("list")).map { i =>
                lst.getGroup("list", i).getFloat("element", 0)
              }
            } else null
          out += ((str("id"), emb, str("document"), str("metadata_json"),
            g.getLong("_batch", 0), g.getBoolean("_deleted", 0)))
          g = reader.read()
        }
      } finally reader.close()
    }
    out.result()
  }

  def writeBatch(conf: org.apache.hadoop.conf.Configuration, logDir: String,
                 rows: Seq[Row], batch: Long, deleted: Boolean): Unit = {
    val file = new Path(logDir,
      f"part-driver-$batch%05d-${java.util.UUID.randomUUID}.snappy.parquet")
    val writer = ExampleParquetWriter.builder(file)
      .withConf(conf)
      .withType(Schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    val factory = new SimpleGroupFactory(Schema)
    try rows.foreach { r =>
      val g = factory.newGroup()
      if (!r.isNullAt(0)) g.append("id", r.getString(0))
      if (!r.isNullAt(1)) {
        val lst = g.addGroup("embedding")
        r.getSeq[Float](1).foreach(v => lst.addGroup("list").append("element", v))
      }
      if (!r.isNullAt(2)) g.append("document", r.getString(2))
      if (!r.isNullAt(3)) g.append("metadata_json", r.getString(3))
      g.append("_batch", batch)
      g.append("_deleted", deleted)
      writer.write(g)
    } finally writer.close()
  }
}
