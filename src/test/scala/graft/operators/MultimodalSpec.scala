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

  test("synthesized image/audio/video records decode with the real codecs") {
    val recs = Multimodal.synthesize(spark, sfDir).collect()
    val img = recs.find(_.kind === "image").get
    val decodedImg = MediaCodec.decodeBmp(img.content)
    assert(decodedImg.width === img.meta.width && decodedImg.height === img.meta.height)
    val aud = recs.find(_.kind === "audio").get
    assert(MediaCodec.decodeWav(aud.content).sampleRate === 16000)
    val vid = recs.find(_.kind === "video").get
    val decodedVid = MediaCodec.decodeY4m(vid.content)
    assert(decodedVid.width === vid.meta.width && decodedVid.height === vid.meta.height)
    assert(decodedVid.frames.length === vid.meta.n_frames)
  }

  test("Y4M encode/decode round-trips luma frames exactly") {
    val frames = Seq(Array(0, 1, 127, 255), Array(16, 32, 64, 128), Array(5, 6, 7, 8))
    val vid = MediaCodec.decodeY4m(MediaCodec.encodeY4m(2, 2, frames))
    assert(vid.width === 2 && vid.height === 2)
    assert(vid.frames.length === 3)
    vid.frames.zip(frames).foreach { case (got, want) => assert(got.toSeq === want.toSeq) }
  }

  test("Y4M decoder reads the luma plane of C420 streams and skips chroma") {
    // hand-build a 2x2 C420 stream: 4 luma + 2*1 chroma bytes per frame
    val header = "YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
    val frame = "FRAME\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40) ++ Array[Byte](99, 98) // luma ++ Cb,Cr
    val vid = MediaCodec.decodeY4m(header ++ frame ++ frame)
    assert(vid.frames.length === 2)
    assert(vid.frames.head.toSeq === Seq(10, 20, 30, 40))
  }

  test("Y4M decoder rejects malformed payloads instead of mis-decoding") {
    intercept[IllegalArgumentException] {
      MediaCodec.decodeY4m("MPEG4YUV2 W2 H2\nFRAME\nxxxx".getBytes("US-ASCII"))
    }
    // truncated frame: header promises 2x2 but only 2 luma bytes follow
    intercept[IllegalArgumentException] {
      MediaCodec.decodeY4m("YUV4MPEG2 W2 H2 Cmono\nFRAME\nab".getBytes("US-ASCII"))
    }
    // implausible dimensions must fail the Long-math bound, not allocate
    intercept[IllegalArgumentException] {
      MediaCodec.decodeY4m(
        "YUV4MPEG2 W1000000 H1000000 Cmono\nFRAME\nxx".getBytes("US-ASCII"))
    }
    // unsupported colorspace named explicitly
    intercept[IllegalArgumentException] {
      MediaCodec.decodeY4m("YUV4MPEG2 W2 H2 C444\nFRAME\nxxxxxxxxxxxx".getBytes("US-ASCII"))
    }
  }

  test("video frame sampling decodes real Y4M frames") {
    val frames = (0 until 5).map(f => Array.fill(8)(f * 10))
    val vid = MediaRecord(7L, "video", MediaCodec.encodeY4m(4, 2, frames),
      MediaMeta(4, 2, 1, 0, 5, "y4m"))
    val out = Multimodal.sampleFrames(Seq(vid).toDS(), stride = 2).collect()
    assert(out.map(_.frame_idx).sorted.toSeq === Seq(0, 2, 4))
    out.sortBy(_.frame_idx).zip(Seq(0, 20, 40)).foreach { case (f, v) =>
      assert(f.frame.toSeq === Seq.fill(8)(v.toByte))
    }
  }

  test("y4m resize re-encodes a valid stream with resampled frames") {
    val vid = MediaRecord(9L, "video",
      MediaCodec.encodeY4m(4, 1, Seq(Array(0, 30, 60, 90))),
      MediaMeta(4, 1, 1, 0, 1, "y4m"))
    val narrowed = Multimodal.resize(Seq(vid).toDS(), targetWidth = 2).collect().head
    val dec = MediaCodec.decodeY4m(narrowed.content)
    assert(dec.width === 2 && narrowed.meta.width === 2)
    assert(dec.frames.head.toSeq === Seq(0, 60)) // x*2 sampling
    val widened = Multimodal.resize(Seq(vid).toDS(), targetWidth = 8).collect().head
    assert(MediaCodec.decodeY4m(widened.content).frames.head.toSeq
      === Seq(0, 0, 30, 30, 60, 60, 90, 90))
  }

  test("BMP decoder rejects overflow-crafted headers cleanly") {
    // huge width*height whose int arithmetic wraps: must reject via
    // the Long-math require, not crash with a runtime array error
    val evil = MediaCodec.encodeBmp(2, 2, Array(1, 2, 3, 4))
    val buf = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(18, 0x40000000) // width 2^30 → width*3 wraps negative
    buf.putInt(22, 0x40000000)
    intercept[IllegalArgumentException] { MediaCodec.decodeBmp(evil) }
    val neg = MediaCodec.encodeBmp(2, 2, Array(1, 2, 3, 4))
    java.nio.ByteBuffer.wrap(neg).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, -500) // negative pixel-array offset
    intercept[IllegalArgumentException] { MediaCodec.decodeBmp(neg) }
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

  test("dHash: gradient structure, determinism, invariance to brightness shift") {
    // left-to-right ramp: every row-gradient bit set
    val ramp = Array.tabulate(9 * 8)(i => (i % 9) * 28)
    val sig = Multimodal.dHash(ramp, 9, 8)
    assert(java.lang.Long.bitCount(sig) === 64)
    // flat image: no gradients
    assert(Multimodal.dHash(Array.fill(9 * 8)(128), 9, 8) === 0L)
    // dHash compares ADJACENT cells, so a uniform brightness shift
    // preserves every bit
    val brighter = ramp.map(v => math.min(255, v + 40))
    assert(Multimodal.dHash(brighter, 9, 8) === sig)
    // deterministic on a real synthesized BMP
    val img = Multimodal.synthesize(spark, sfDir).filter(_.kind == "image").head()
    val d = MediaCodec.decodeBmp(img.content)
    assert(Multimodal.dHash(d.samples, d.width, d.height) ===
      Multimodal.dHash(d.samples, d.width, d.height))
  }

  test("perturbed images stay within the Hamming radius of their originals") {
    val hashes = Multimodal.imageHashes(Multimodal.plantedImages(spark, sfDir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = hashes.keys.filter(_ >= 1000000L)
    assert(planted.nonEmpty)
    planted.foreach { pid =>
      val orig = hashes(pid - 1000000L)
      val ham = java.lang.Long.bitCount(hashes(pid) ^ orig)
      assert(ham <= 6, s"planted $pid drifted $ham bits from its original")
    }
  }

  test("image near-dup query surfaces every planted pair (recall_planted = 1)") {
    val rows = Multimodal.imageDupsQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val recall = rows.head.getAs[Double]("recall_planted")
    assert(recall >= 0.8, s"recall_planted $recall below floor")
    val pairs = rows.map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    // the five planted (original, original+1e6) pairs must be present
    // whenever their signatures are within the radius — cross-checked
    // against the hash map rather than assumed
    val hashes = Multimodal.imageHashes(Multimodal.plantedImages(spark, sfDir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    hashes.keys.filter(_ >= 1000000L).foreach { pid =>
      if (java.lang.Long.bitCount(hashes(pid) ^ hashes(pid - 1000000L)) <= 6)
        assert(pairs.contains((pid - 1000000L, pid)), s"missing planted pair for $pid")
    }
  }

  test("audio spectral hash is exactly gain-invariant and noise moves few bits") {
    val pcm = (0 until 320).map(i =>
      (math.sin(i * 0.21) * 8000 + math.sin(i * 0.045) * 4000).toInt).toArray
    val base = Multimodal.aHash(pcm)
    val gained = Multimodal.aHash(pcm.map(x => x * 7 / 10))
    assert(base === gained, "uniform gain must not move any bit")
    val noisy = Multimodal.aHash(pcm.zipWithIndex.map { case (x, i) =>
      x + ((i * 17) % 11 - 5) * 16
    })
    assert(java.lang.Long.bitCount(base ^ noisy) <= 8,
      "small additive noise drifted too many bits")
  }

  test("video majority hash shrugs off single-frame corruption and per-pixel noise") {
    val w = 8; val h = 8
    val frames = Array.tabulate(6)(f =>
      Array.tabulate(w * h)(i => (i * 3 + f * 5) % 256))
    val base = Multimodal.vHash(frames, w, h)
    // corrupt ONE frame completely: majority across the other 5 holds
    val oneBad = frames.updated(2, Array.fill(w * h)(255))
    assert(java.lang.Long.bitCount(base ^ Multimodal.vHash(oneBad, w, h)) <= 8)
    // light per-pixel noise on every frame: few bits move
    val noisy = frames.map(_.zipWithIndex.map { case (px, i) =>
      math.max(0, math.min(255, px + ((i * 13) % 7) - 3))
    })
    assert(java.lang.Long.bitCount(base ^ Multimodal.vHash(noisy, w, h)) <= 8)
  }

  test("video near-dup query certifies planted recall over the shared hamming join") {
    val rows = Multimodal.videoDupsQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val recall = rows.head.getAs[Double]("recall_planted")
    assert(recall >= 0.8, s"recall_planted $recall below floor")
  }

  test("audio near-dup query certifies planted recall over the shared hamming join") {
    val rows = Multimodal.audioDupsQuery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val recall = rows.head.getAs[Double]("recall_planted")
    assert(recall >= 0.8, s"recall_planted $recall below floor")
    val hashes = Multimodal.audioHashes(Multimodal.plantedAudio(spark, sfDir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = rows.map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"))).toSet
    hashes.keys.filter(_ >= 1000000L).foreach { pid =>
      if (java.lang.Long.bitCount(hashes(pid) ^ hashes(pid - 1000000L)) <= 8)
        assert(pairs.contains((pid - 1000000L, pid)), s"missing planted pair for $pid")
    }
  }
}
