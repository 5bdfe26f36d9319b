package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed metadata traveling with every binary payload. */
final case class MediaMeta(width: Int, height: Int, channels: Int,
                           sample_rate: Int, n_frames: Int, format: String)

/** One media asset: opaque bytes + typed metadata. The engine never
  * interprets `content` except inside the explicitly-stubbed decode
  * step.
  */
final case class MediaRecord(media_id: Long, kind: String,
                             content: Array[Byte], meta: MediaMeta)

final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                               mean_intensity: Double, entropy: Double,
                               histogram: Array[Long])

final case class FrameSample(media_id: Long, frame_idx: Int, frame: Array[Byte])

/** Multimodal-column plumbing for a training-data pipeline: treat
  * image/audio/video as `binary` columns with typed metadata, and run
  * decode / feature-extraction / resize / frame-sampling as
  * per-partition batch transforms (`mapPartitions` over typed
  * Datasets — the Scala analogue of arrow-batched UDFs: one iterator
  * per partition, streaming through rows without materializing the
  * partition).
  *
  * DECODE IS STUBBED: this container has no image/audio codecs, so
  * [[decodeStub]] derives a deterministic fake pixel buffer from the
  * payload bytes. The Spark-side mechanics — schema, partitioning,
  * batch iteration, binary-in/binary-out transforms — are real and
  * tested; swapping [[decodeStub]] for a JNI/javax.imageio call is a
  * one-function change.
  *
  * Scale notes: binaries shuffle at most once (the initial
  * `repartition` by media_id); every transform after that is a map
  * stage. Feature rows are small, so the expensive columns (content)
  * are dropped as early as the pipeline allows — never carry payloads
  * through an aggregation.
  */
object Multimodal {

  /** Deterministic fake "media" synthesized from the documents table —
    * stands in for an ingest of real binary columns; same text ⇒ same
    * bytes ⇒ reproducible downstream assertions.
    */
  def synthesize(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val bytes = text.getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val width = math.max(4, (nChars % 32).toInt)
        val meta = kind match {
          case "image" => MediaMeta(width, math.max(1, bytes.length / math.max(width, 1)), 1, 0, 1, "fake-gray8")
          case "audio" => MediaMeta(0, 0, 1, 16000, 1, "fake-pcm8")
          case _       => MediaMeta(width, 4, 1, 0, math.max(1, bytes.length / math.max(width * 4, 1)), "fake-rawvid")
        }
        MediaRecord(id, kind, bytes, meta)
      }
  }

  /** STUB decode — deterministic fake: treats payload bytes as an
    * unsigned-8bit sample/pixel stream. A real implementation decodes
    * `content` with an image/audio codec here; everything downstream
    * is agnostic to the difference.
    */
  def decodeStub(r: MediaRecord): Array[Int] =
    r.content.map(b => b & 0xff)

  /** Per-partition feature extraction: 16-bin histogram, mean
    * intensity, byte entropy. One pass per partition, iterator-to-
    * iterator — constant memory regardless of partition size.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val px = decodeStub(r)
        val hist = new Array[Long](16)
        var sum = 0L
        px.foreach { v => hist(v >> 4) += 1; sum += v }
        val n = px.length.toDouble
        val mean = if (px.isEmpty) 0.0 else sum / n
        val entropy = if (px.isEmpty) 0.0 else {
          var e = 0.0
          hist.foreach { c =>
            if (c > 0) { val p = c / n; e -= p * math.log(p) / math.log(2.0) }
          }
          e
        }
        MediaFeatures(r.media_id, r.kind, px.length.toLong, mean, entropy, hist)
      }
    }
  }

  /** Binary-in/binary-out transform: nearest-neighbor "resize" of the
    * fake pixel grid to `targetWidth` columns (keeps every row's
    * metadata consistent with its new payload).
    */
  def resize(media: Dataset[MediaRecord], targetWidth: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val w = math.max(1, r.meta.width)
        val h = math.max(1, r.content.length / w)
        val scale = w.toDouble / targetWidth
        val out = new Array[Byte](targetWidth * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < targetWidth) {
            val srcX = math.min(w - 1, (x * scale).toInt)
            val srcIdx = y * w + srcX
            out(y * targetWidth + x) =
              if (srcIdx < r.content.length) r.content(srcIdx) else 0
            x += 1
          }
          y += 1
        }
        r.copy(content = out, meta = r.meta.copy(width = targetWidth, height = h))
      }
    }
  }

  /** Frame sampling for "video" rows: split the payload into
    * meta.width*4-byte frames and keep every `stride`-th one — the
    * flatMap shape (0..n rows out per row in) used for real video
    * frame extraction.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val frameSize = math.max(1, r.meta.width * 4)
      r.content.grouped(frameSize).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (bytes, i) => FrameSample(r.media_id, i, bytes) }
    }
  }

  /** SparkEntry wrapper: full pipeline — synthesize → repartition once
    * → features, joined with sampled-frame counts. Deterministic
    * output, rows-only check (binary ops aren't DuckDB-expressible).
    */
  def featuresQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = synthesize(s, dir).repartition(col("media_id"))
    val feats = extractFeatures(media)
      .select(col("media_id"), col("kind"), col("n_bytes"),
        (floor(col("mean_intensity") * 10000.0 + 0.5) / 10000.0).as("mean_intensity"),
        (floor(col("entropy") * 10000.0 + 0.5) / 10000.0).as("entropy"))
    val frameCounts = sampleFrames(media, stride = 2)
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_sampled_frames"))
    feats.join(frameCounts, Seq("media_id"), "left")
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("mean_intensity"), col("entropy"),
        coalesce(col("n_sampled_frames"), lit(0L)).as("n_sampled_frames"))
      .orderBy(col("media_id"))
  }
}
