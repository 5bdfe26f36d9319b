package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("synthesis is deterministic and kinds partition by id") {
    val a = Multimodal.synthesize(spark, sfDir).collect().sortBy(_.media_id)
    val b = Multimodal.synthesize(spark, sfDir).collect().sortBy(_.media_id)
    assert(a.length === b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) =>
      assert(x.media_id === y.media_id && x.kind === y.kind)
      assert(x.content.toSeq === y.content.toSeq)
    }
    assert(a.map(_.kind).toSet === Set("image", "audio", "video"))
  }

  test("feature extraction computes histogram/mean/entropy correctly") {
    val rec = MediaRecord(1L, "image",
      Array[Byte](0, 0, 16, 16, 32, 32, 48, 48), MediaMeta(4, 2, 1, 0, 1, "fake-gray8"))
    val out = Multimodal.extractFeatures(Seq(rec).toDS()).collect().head
    assert(out.n_samples === 8L)
    assert(out.mean_intensity === (0 + 0 + 16 + 16 + 32 + 32 + 48 + 48) / 8.0)
    assert(out.histogram.toSeq.take(4) === Seq(2L, 2L, 2L, 2L)) // bins 0..3
    assert(math.abs(out.entropy - 2.0) < 1e-12) // 4 equal bins → 2 bits
  }

  test("resize produces width*height payload and updates metadata") {
    val rec = MediaRecord(1L, "image",
      Array.tabulate[Byte](32)(i => i.toByte), MediaMeta(8, 4, 1, 0, 1, "fake-gray8"))
    val out = Multimodal.resize(Seq(rec).toDS(), targetWidth = 4).collect().head
    assert(out.meta.width === 4 && out.meta.height === 4)
    assert(out.content.length === 16)
    // nearest-neighbor: row 0 of src [0..7] sampled at x*2 → 0,2,4,6
    assert(out.content.take(4).toSeq === Seq[Byte](0, 2, 4, 6))
  }

  test("frame sampling keeps every stride-th frame of video rows only") {
    val vid = MediaRecord(7L, "video",
      Array.tabulate[Byte](40)(_.toByte), MediaMeta(2, 4, 1, 0, 5, "fake-rawvid"))
    val img = MediaRecord(8L, "image", Array[Byte](1, 2), MediaMeta(2, 1, 1, 0, 1, "fake-gray8"))
    val out = Multimodal.sampleFrames(Seq(vid, img).toDS(), stride = 2).collect()
    // frame size = width*4 = 8 bytes → 5 frames; stride 2 → idx 0,2,4
    assert(out.map(_.media_id).toSet === Set(7L))
    assert(out.map(_.frame_idx).sorted.toSeq === Seq(0, 2, 4))
    assert(out.forall(f => f.frame.length <= 8))
  }

  test("BMP encode/decode round-trips pixels exactly (incl. row padding)") {
    // width 3 → 9-byte rows padded to 12: exercises stride handling
    val gray = Array(0, 1, 127, 128, 254, 255)
    val img = MediaCodec.decodeBmp(MediaCodec.encodeBmp(3, 2, gray))
    assert(img.width === 3 && img.height === 2)
    assert(img.samples.toSeq === gray.toSeq)
  }

  test("WAV encode/decode round-trips 16-bit samples and the sample rate") {
    val samples = Array(-32768, -1, 0, 1, 32767, 256)
    val audio = MediaCodec.decodeWav(MediaCodec.encodeWav(samples, 44100))
    assert(audio.sampleRate === 44100 && audio.channels === 1)
    assert(audio.samples.toSeq === samples.toSeq)
  }

  test("codecs reject malformed payloads instead of mis-decoding") {
    intercept[IllegalArgumentException] {
      MediaCodec.decodeBmp("definitely not a bitmap at all .......".getBytes)
    }
    intercept[IllegalArgumentException] {
      MediaCodec.decodeWav("RIFFxxxxNOPE".getBytes)
    }
    // a chunk declaring a NEGATIVE size must fail, not loop forever
    val evil = java.nio.ByteBuffer.allocate(20).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes).putInt(12).put("WAVE".getBytes)
      .put("junk".getBytes).putInt(-8)
    intercept[IllegalArgumentException] { MediaCodec.decodeWav(evil.array()) }
    // a truncated fmt chunk must fail the size check, not read past it
    val shortFmt = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    shortFmt.put("RIFF".getBytes).putInt(16).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(4).putInt(1)
    intercept[IllegalArgumentException] { MediaCodec.decodeWav(shortFmt.array()) }
  }

  test("synthesized image/audio records decode with the real codecs") {
    val recs = Multimodal.synthesize(spark, sfDir).collect()
    val img = recs.find(_.kind === "image").get
    val decodedImg = MediaCodec.decodeBmp(img.content)
    assert(decodedImg.width === img.meta.width && decodedImg.height === img.meta.height)
    val aud = recs.find(_.kind === "audio").get
    assert(MediaCodec.decodeWav(aud.content).sampleRate === 16000)
  }

  test("bmp resize re-encodes a valid, narrower BMP") {
    val rec = MediaRecord(1L, "image",
      MediaCodec.encodeBmp(8, 2, Array.tabulate(16)(i => i * 10 % 256)),
      MediaMeta(8, 2, 1, 0, 1, "bmp"))
    val out = Multimodal.resize(Seq(rec).toDS(), targetWidth = 4).collect().head
    val img = MediaCodec.decodeBmp(out.content)
    assert(img.width === 4 && img.height === 2)
    // nearest-neighbor: row 0 of src [0,10,…,70] sampled at x*2
    assert(img.samples.take(4).toSeq === Seq(0, 20, 40, 60))
  }

  test("bmp resize UPSCALES correctly (nearest-neighbor, scale < 1)") {
    val rec = MediaRecord(1L, "image",
      MediaCodec.encodeBmp(4, 1, Array(0, 30, 60, 90)),
      MediaMeta(4, 1, 1, 0, 1, "bmp"))
    val out = Multimodal.resize(Seq(rec).toDS(), targetWidth = 8).collect().head
    val img = MediaCodec.decodeBmp(out.content)
    assert(img.width === 8 && img.height === 1)
    // scale = 0.5: srcX = (x*0.5).toInt → each source pixel doubled
    assert(img.samples.toSeq === Seq(0, 0, 30, 30, 60, 60, 90, 90))
  }

  test("resize query output is stable across runs and non-empty") {
    val a = Multimodal.resizeQuery(spark, sfDir).collect()
    val b = Multimodal.resizeQuery(spark, sfDir).collect()
    assert(a.length > 0)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // every resized image decodes to exactly 8 columns per row
    assert(a.forall(r => r.getAs[Long]("n_samples") % 8 === 0))
  }

  test("features query output is stable across runs and non-empty") {
    val a = Multimodal.featuresQuery(spark, sfDir).collect()
    val b = Multimodal.featuresQuery(spark, sfDir).collect()
    assert(a.length > 0)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }
}
