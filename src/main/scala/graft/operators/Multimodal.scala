package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed metadata traveling with every binary payload. */
final case class MediaMeta(width: Int, height: Int, channels: Int,
                           sample_rate: Int, n_frames: Int, format: String)

/** One media asset: opaque bytes + typed metadata. The engine never
  * interprets `content` except inside [[Multimodal.decode]].
  */
final case class MediaRecord(media_id: Long, kind: String,
                             content: Array[Byte], meta: MediaMeta)

final case class MediaFeatures(media_id: Long, kind: String, n_samples: Long,
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
  * Decode is REAL for all three modalities via the pure-JVM
  * [[MediaCodec]]: uncompressed 24-bit BMP images, 16-bit PCM WAV
  * audio, and YUV4MPEG2 (Y4M) video — frame sampling and resize
  * decode actual FRAME-delimited luma planes and re-encode real
  * streams. Swapping in further codecs is one new case in [[decode]].
  *
  * Scale notes: binaries shuffle at most once (the initial
  * `repartition` by media_id); every transform after that is a map
  * stage. Feature rows are small, so the expensive columns (content)
  * are dropped as early as the pipeline allows — never carry payloads
  * through an aggregation.
  */
object Multimodal {

  /** Deterministic media synthesized from the documents table — real
    * BMP/WAV binary payloads derived from the text bytes; same text ⇒
    * same bytes ⇒ reproducible downstream assertions.
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
        kind match {
          case "image" =>
            // text bytes as a gray pixel grid, zero-padded to the last row
            val height = math.max(1, (bytes.length + width - 1) / width)
            val gray = new Array[Int](width * height)
            var i = 0
            while (i < bytes.length) { gray(i) = bytes(i) & 0xff; i += 1 }
            MediaRecord(id, kind, MediaCodec.encodeBmp(width, height, gray),
              MediaMeta(width, height, 1, 0, 1, "bmp"))
          case "audio" =>
            // text bytes as centered 16-bit samples
            val samples = bytes.map(b => ((b & 0xff) - 128) * 256)
            MediaRecord(id, kind, MediaCodec.encodeWav(samples, 16000),
              MediaMeta(0, 0, 1, 16000, 1, "wav"))
          case _ =>
            // text bytes as mono luma frames of a real Y4M stream,
            // zero-padded to the last frame
            val fh = 4
            val frameSize = width * fh
            val nFrames = math.max(1, (bytes.length + frameSize - 1) / frameSize)
            val frames = (0 until nFrames).map { f =>
              val arr = new Array[Int](frameSize)
              var i = 0
              while (i < frameSize && f * frameSize + i < bytes.length) {
                arr(i) = bytes(f * frameSize + i) & 0xff; i += 1
              }
              arr
            }
            MediaRecord(id, kind, MediaCodec.encodeY4m(width, fh, frames),
              MediaMeta(width, fh, 1, 0, nFrames, "y4m"))
        }
      }
  }

  /** Format-dispatched decode to a 0..255 intensity stream: BMP →
    * grayscale pixels, WAV → 16-bit samples rescaled to unsigned 8-bit
    * (so histogram/entropy binning is uniform across modalities),
    * Y4M → concatenated per-frame luma planes, anything else → raw
    * bytes (legacy passthrough for unknown formats).
    */
  def decode(r: MediaRecord): Array[Int] = r.meta.format match {
    case "bmp" => MediaCodec.decodeBmp(r.content).samples
    case "wav" => MediaCodec.decodeWav(r.content).samples.map(sm => (sm >> 8) + 128)
    case "y4m" => MediaCodec.decodeY4m(r.content).frames.flatten
    case _     => r.content.map(b => b & 0xff)
  }

  /** Per-partition feature extraction: 16-bin histogram, mean
    * intensity, byte entropy. One pass per partition, iterator-to-
    * iterator — constant memory regardless of partition size.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val px = decode(r)
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

  /** Binary-in/binary-out transform: nearest-neighbor resize to
    * `targetWidth` columns. BMP payloads are decoded, resampled, and
    * RE-ENCODED (true decode→transform→encode round trip); other
    * formats resample their raw byte grid (keeps every row's metadata
    * consistent with its new payload).
    */
  def resize(media: Dataset[MediaRecord], targetWidth: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    def nearest(src: Array[Int], w: Int, h: Int): Array[Int] = {
      val scale = w.toDouble / targetWidth
      val out = new Array[Int](targetWidth * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < targetWidth) {
          val srcIdx = y * w + math.min(w - 1, (x * scale).toInt)
          out(y * targetWidth + x) = if (srcIdx < src.length) src(srcIdx) else 0
          x += 1
        }
        y += 1
      }
      out
    }
    media.mapPartitions { it =>
      it.map { r =>
        if (r.meta.format == "bmp") {
          val img = MediaCodec.decodeBmp(r.content)
          val out = nearest(img.samples, img.width, img.height)
          r.copy(content = MediaCodec.encodeBmp(targetWidth, img.height, out),
            meta = r.meta.copy(width = targetWidth, height = img.height))
        } else if (r.meta.format == "y4m") {
          // per-frame decode → resample → re-encode a real stream
          val vid = MediaCodec.decodeY4m(r.content)
          val out = vid.frames.map(f => nearest(f, vid.width, vid.height)).toSeq
          r.copy(content = MediaCodec.encodeY4m(targetWidth, vid.height, out),
            meta = r.meta.copy(width = targetWidth, height = vid.height))
        } else {
          val w = math.max(1, r.meta.width)
          val h = math.max(1, r.content.length / w)
          val out = nearest(r.content.map(_ & 0xff), w, h).map(_.toByte)
          r.copy(content = out, meta = r.meta.copy(width = targetWidth, height = h))
        }
      }
    }
  }

  /** Frame sampling for "video" rows: decode the Y4M stream's
    * FRAME-delimited luma planes and keep every `stride`-th one — the
    * flatMap shape (0..n rows out per row in) used for real video
    * frame extraction. Unknown formats fall back to a fixed-size byte
    * split so the plumbing stays format-agnostic.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      r.meta.format match {
        case "y4m" =>
          MediaCodec.decodeY4m(r.content).frames.iterator.zipWithIndex
            .filter { case (_, i) => i % stride == 0 }
            .map { case (luma, i) =>
              FrameSample(r.media_id, i, luma.map(v => (v & 0xff).toByte)) }
        case _ =>
          val frameSize = math.max(1, r.meta.width * 4)
          r.content.grouped(frameSize).zipWithIndex
            .filter { case (_, i) => i % stride == 0 }
            .map { case (bytes, i) => FrameSample(r.media_id, i, bytes) }
      }
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
      .select(col("media_id"), col("kind"), col("n_samples"),
        CrossEngine.rnd4(col("mean_intensity")).as("mean_intensity"),
        CrossEngine.rnd4(col("entropy")).as("entropy"))
    val frameCounts = sampleFrames(media, stride = 2)
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_sampled_frames"))
    feats.join(frameCounts, Seq("media_id"), "left")
      .select(col("media_id"), col("kind"), col("n_samples"),
        col("mean_intensity"), col("entropy"),
        coalesce(col("n_sampled_frames"), lit(0L)).as("n_sampled_frames"))
      .orderBy(col("media_id"))
  }

  /** Rows-only driver query exercising the full binary-in/binary-out
    * chain on real payloads: synthesize BMP images → decode → resize
    * (up- AND down-scale: source widths straddle the target) →
    * RE-ENCODE → decode again for features. Deterministic output;
    * up/down-scale golden checks and a stability check live in
    * MultimodalSpec.
    */
  def resizeQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val images = synthesize(s, dir).filter(_.kind == "image")
    extractFeatures(resize(images, targetWidth = 8))
      .select(col("media_id"), col("kind"), col("n_samples"),
        CrossEngine.rnd4(col("mean_intensity")).as("mean_intensity"),
        CrossEngine.rnd4(col("entropy")).as("entropy"))
      .orderBy(col("media_id"))
  }

  /** 64-bit perceptual difference hash (dHash) of a grayscale image:
    * box-mean downsample to a 9×8 grid, then bit r*8+c = 1 iff
    * grid(r,c+1) > grid(r,c) — the standard row-gradient fingerprint.
    * Box-averaging (not point sampling) makes single-pixel
    * perturbations move a cell mean by at most Δ/boxArea, so visually
    * near-identical images land within a small Hamming radius.
    * Upsampled cells (source narrower than 9 columns) fall back to the
    * nearest source pixel.
    */
  def dHash(samples: Array[Int], w: Int, h: Int): Long = {
    val cols = 9; val rows = 8
    val grid = Array.ofDim[Double](rows, cols)
    var r = 0
    while (r < rows) {
      val y0 = r * h / rows
      val y1 = math.max(y0 + 1, (r + 1) * h / rows)
      var c = 0
      while (c < cols) {
        val x0 = c * w / cols
        val x1 = math.max(x0 + 1, (c + 1) * w / cols)
        var sum = 0L; var n = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) { sum += samples(y * w + x); n += 1; x += 1 }
          y += 1
        }
        grid(r)(c) = if (n == 0) 0.0 else sum.toDouble / n
        c += 1
      }
      r += 1
    }
    var sig = 0L
    r = 0
    while (r < rows) {
      var c = 0
      while (c < cols - 1) {
        if (grid(r)(c + 1) > grid(r)(c)) sig |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    sig
  }

  /** (media_id, sig) perceptual hashes for the image rows — decode +
    * dHash in one iterator-to-iterator map stage; payloads never leave
    * the stage.
    */
  def imageHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { it =>
      it.map { r =>
        val img = MediaCodec.decodeBmp(r.content)
        (r.media_id, dHash(img.samples, img.width, img.height))
      }
    }.toDF("media_id", "sig")
  }

  /** Images plus planted perturbed copies (ids shifted by 1e6, one
    * pixel brightened by 8): the image-side analogue of
    * [[Dedup.plantedDocs]] — the synthetic corpus has no natural
    * near-dup images, so near-dup recall is only measurable against
    * planted ones.
    */
  def plantedImages(s: SparkSession, dir: String, nPlanted: Int = 5): Dataset[MediaRecord] = {
    import s.implicits._
    val images = synthesize(s, dir).filter(_.kind == "image")
    val planted = images.filter(_.media_id < nPlanted * 3L).map { r =>
      val img = MediaCodec.decodeBmp(r.content)
      val px = img.samples.clone()
      px(0) = math.min(255, px(0) + 8)
      r.copy(media_id = r.media_id + 1000000L,
        content = MediaCodec.encodeBmp(img.width, img.height, px))
    }
    images.unionByName(planted)
  }

  /** Driver query: perceptual-hash near-dup image pairs over
    * [[plantedImages]] — decode → dHash map stage, then the same
    * banded-pigeonhole Hamming join as text SimHash
    * ([[Dedup.hammingBandPairs]]). Carries a constant
    * `recall_planted` column (fraction of planted original/perturbed
    * pairs surfaced within the radius) so the rows-only artifact
    * certifies retrieval quality. Fully DuckDB-oracled since r8: the
    * payloads are pure functions of the documents table, dHash is
    * exact integer box-mean arithmetic, and the banded join's
    * recall-1 pigeonhole lets a brute-force per-bit Hamming twin
    * replay the identical pair set.
    */
  def imageDupsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = plantedImages(s, dir)
    val hashes = imageHashes(media)
    val pairs = Dedup.hammingBandPairs(hashes, "media_id", maxHamming = 6)
      .select(col("id_a").as("media_a"), col("id_b").as("media_b"), col("hamming"))
    val truth = hashes.filter(col("media_id") >= 1000000L)
      .select((col("media_id") - 1000000L).as("media_a"),
        col("media_id").as("media_b"))
    val stats = pairs.select(col("media_a"), col("media_b"))
      .join(truth, Seq("media_a", "media_b"))
      .agg(count(lit(1)).as("_hits"))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("_truth"))))
    pairs.crossJoin(broadcast(stats))
      .withColumn("recall_planted",
        col("_hits").cast("double") / greatest(col("_truth").cast("double"), lit(1.0)))
      .drop("_hits", "_truth")
      .orderBy(col("media_a"), col("media_b"))
  }

  /** 64-bit spectral-delta audio fingerprint (chromaprint's shape at
    * toy scale): frame the PCM into 9 time slices, measure energy in
    * 8 DFT bands per slice, and set bit (band, slice) when the band's
    * energy RISES into the next slice — the same gradient-sign
    * discipline as [[dHash]], so the two modalities share the banded
    * Hamming join. Energy ratios are invariant under uniform gain
    * (g² scales every cell), so re-levelled copies hash identically
    * and small additive noise lands within a few bits.
    */
  def aHash(samples: Array[Int]): Long = {
    val frames = 9; val bands = 8
    val n = samples.length
    if (n == 0) return 0L
    val grid = Array.ofDim[Double](bands, frames)
    var f = 0
    while (f < frames) {
      val s0 = f * n / frames
      val s1 = math.max(s0 + 1, (f + 1) * n / frames)
      val len = s1 - s0
      var b = 0
      while (b < bands) {
        var re = 0.0; var im = 0.0
        var i = s0
        while (i < s1 && i < n) {
          val ang = -2.0 * math.Pi * (b + 1) * (i - s0) / len
          re += samples(i) * math.cos(ang)
          im += samples(i) * math.sin(ang)
          i += 1
        }
        grid(b)(f) = re * re + im * im
        b += 1
      }
      f += 1
    }
    var sig = 0L
    var b = 0
    while (b < bands) {
      var ff = 0
      while (ff < frames - 1) {
        if (grid(b)(ff + 1) > grid(b)(ff)) sig |= 1L << (b * 8 + ff)
        ff += 1
      }
      b += 1
    }
    sig
  }

  /** (media_id, sig) spectral hashes for the audio rows — decode +
    * aHash in one iterator-to-iterator map stage.
    */
  def audioHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { it =>
      it.map { r => (r.media_id, aHash(MediaCodec.decodeWav(r.content).samples)) }
    }.toDF("media_id", "sig")
  }

  /** Audio corpus with planted perturbed copies: gain 0.9 (exactly
    * hash-invariant) plus small additive noise (a few bits of drift)
    * — the copy a loudness-normalized re-encode would produce.
    */
  def plantedAudio(s: SparkSession, dir: String, nPlanted: Int = 5): Dataset[MediaRecord] = {
    import s.implicits._
    val audio = synthesize(s, dir).filter(_.kind == "audio")
    val planted = audio.filter(_.media_id < nPlanted * 3L).map { r =>
      val pcm = MediaCodec.decodeWav(r.content).samples.zipWithIndex.map { case (x, i) =>
        val noisy = x * 9 / 10 + ((i * 31) % 13 - 6) * 8
        math.max(-32768, math.min(32767, noisy))
      }
      r.copy(media_id = r.media_id + 1000000L,
        content = MediaCodec.encodeWav(pcm, 16000))
    }
    audio.unionByName(planted)
  }

  /** Driver query: spectral-hash near-dup audio pairs over
    * [[plantedAudio]] — decode → aHash map stage, then the SAME
    * banded-pigeonhole Hamming join as image dHash and text SimHash.
    * Carries the `recall_planted` certification column. Fully
    * DuckDB-oracled since r8 (samples, truncating-division gain law,
    * ordered DFT-term sums and gradient bits all replayed; the trig
    * parity the replay leans on is verified by the hash-match).
    */
  def audioDupsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = plantedAudio(s, dir)
    val hashes = audioHashes(media)
    val pairs = Dedup.hammingBandPairs(hashes, "media_id", maxHamming = 8)
      .select(col("id_a").as("media_a"), col("id_b").as("media_b"), col("hamming"))
    val truth = hashes.filter(col("media_id") >= 1000000L)
      .select((col("media_id") - 1000000L).as("media_a"),
        col("media_id").as("media_b"))
    val stats = pairs.select(col("media_a"), col("media_b"))
      .join(truth, Seq("media_a", "media_b"))
      .agg(count(lit(1)).as("_hits"))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("_truth"))))
    pairs.crossJoin(broadcast(stats))
      .withColumn("recall_planted",
        col("_hits").cast("double") / greatest(col("_truth").cast("double"), lit(1.0)))
      .drop("_hits", "_truth")
      .orderBy(col("media_a"), col("media_b"))
  }

  /** 64-bit video fingerprint: per-frame [[dHash]] collapsed by
    * PER-BIT MAJORITY vote across frames — a bit survives if set in
    * more than half the frames, so single-frame corruption, dropped
    * frames or re-encoded noise move few bits while the temporal
    * gradient structure persists. Completes the modality set: text
    * SimHash, image dHash, audio aHash and video vHash all land in
    * the SAME banded-pigeonhole Hamming join.
    */
  def vHash(frames: Array[Array[Int]], w: Int, h: Int): Long = {
    if (frames.isEmpty) return 0L
    val counts = new Array[Int](64)
    frames.foreach { f =>
      val sig = dHash(f, w, h)
      var b = 0
      while (b < 64) { if (((sig >> b) & 1L) == 1L) counts(b) += 1; b += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) * 2 > frames.length) out |= 1L << b; b += 1 }
    out
  }

  /** (media_id, sig) majority-vote hashes for the video rows. */
  def videoHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(r => r.kind == "video" && r.meta.format == "y4m").mapPartitions { it =>
      it.map { r =>
        val v = MediaCodec.decodeY4m(r.content)
        (r.media_id, vHash(v.frames, v.width, v.height))
      }
    }.toDF("media_id", "sig")
  }

  /** Video corpus with planted perturbed copies: per-pixel noise on
    * every frame — the copy a re-encode would produce.
    */
  def plantedVideos(s: SparkSession, dir: String, nPlanted: Int = 5): Dataset[MediaRecord] = {
    import s.implicits._
    val vids = synthesize(s, dir).filter(_.kind == "video")
    val planted = vids.filter(_.media_id < nPlanted * 3L).map { r =>
      val v = MediaCodec.decodeY4m(r.content)
      val noisy = v.frames.map(_.zipWithIndex.map { case (px, i) =>
        math.max(0, math.min(255, px + ((i * 7) % 3) - 1))
      })
      r.copy(media_id = r.media_id + 1000000L,
        content = MediaCodec.encodeY4m(v.width, v.height, noisy.toSeq))
    }
    vids.unionByName(planted)
  }

  /** Driver query: majority-vote video near-dup pairs over
    * [[plantedVideos]] with the `recall_planted` certification column
    * — the third modality over the one shared Hamming join. Fully
    * DuckDB-oracled since r8 — and the brute-force twin caught a real
    * bug on arrival: the old fixed-width band slicing lost pigeonhole
    * coverage past radius 7 and dropped boundary pairs
    * ([[Dedup.hammingBandPairs]] now partitions bits contiguously).
    */
  def videoDupsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = videoHashes(plantedVideos(s, dir))
    val pairs = Dedup.hammingBandPairs(hashes, "media_id", maxHamming = 8)
      .select(col("id_a").as("media_a"), col("id_b").as("media_b"), col("hamming"))
    val truth = hashes.filter(col("media_id") >= 1000000L)
      .select((col("media_id") - 1000000L).as("media_a"),
        col("media_id").as("media_b"))
    val stats = pairs.select(col("media_a"), col("media_b"))
      .join(truth, Seq("media_a", "media_b"))
      .agg(count(lit(1)).as("_hits"))
      .crossJoin(broadcast(truth.agg(count(lit(1)).as("_truth"))))
    pairs.crossJoin(broadcast(stats))
      .withColumn("recall_planted",
        col("_hits").cast("double") / greatest(col("_truth").cast("double"), lit(1.0)))
      .drop("_hits", "_truth")
      .orderBy(col("media_a"), col("media_b"))
  }

  /** Oracle-checked codec round trip: golden BMP/WAV/Y4M payloads
    * built by [[MediaCodec]], decoded DISTRIBUTED through the same
    * `mapPartitions` feature path as the main pipeline; the expected
    * stats are hand-computed constants (a VALUES-table oracle). Case
    * 2 exercises BMP row padding (width 3 ⇒ 9-byte rows padded to
    * 12); case 3 exercises the full 16-bit WAV sample range; case 4
    * exercises multi-FRAME Y4M luma decoding.
    */
  def codecRoundtripQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recs = Seq(
      MediaRecord(1L, "image", MediaCodec.encodeBmp(2, 2, Array(10, 20, 30, 40)),
        MediaMeta(2, 2, 1, 0, 1, "bmp")),
      MediaRecord(2L, "image", MediaCodec.encodeBmp(3, 1, Array(1, 2, 3)),
        MediaMeta(3, 1, 1, 0, 1, "bmp")),
      MediaRecord(3L, "audio", MediaCodec.encodeWav(Array(-32768, 0, 32767, 256), 16000),
        MediaMeta(0, 0, 1, 16000, 1, "wav")),
      MediaRecord(4L, "video", MediaCodec.encodeY4m(2, 2,
        Seq(Array(0, 16, 32, 48), Array(64, 80, 96, 112))),
        MediaMeta(2, 2, 1, 0, 2, "y4m")))
    extractFeatures(s.createDataset(recs))
      .select(col("media_id").as("case_id"), col("kind"), col("n_samples"),
        CrossEngine.rnd4(col("mean_intensity")).as("mean_intensity"),
        CrossEngine.rnd4(col("entropy")).as("entropy"))
      .orderBy(col("case_id"))
  }
}
