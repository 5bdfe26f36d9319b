package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

final case class DecodedImage(width: Int, height: Int, samples: Array[Int])
final case class DecodedAudio(sampleRate: Int, channels: Int, samples: Array[Int])
final case class DecodedVideo(width: Int, height: Int, frames: Array[Array[Int]])

/** Pure-JVM codecs for the three self-describing formats the
  * multimodal pipeline decodes for real (no native/codec dependencies
  * exist in this environment): uncompressed 24-bit BMP, 16-bit PCM
  * WAV, and YUV4MPEG2 (Y4M) video — all trivial, fully-public
  * container formats whose layouts are re-implemented here from their
  * well-known public structure. Executors call these inside
  * `mapPartitions`; everything is allocation-lean single-pass code
  * over the payload bytes.
  */
object MediaCodec {

  // ---- BMP: BITMAPFILEHEADER (14B) + BITMAPINFOHEADER (40B), 24bpp, no compression ----

  /** Encode a grayscale sample grid as a bottom-up 24-bit BMP (each
    * sample replicated to B=G=R), rows padded to 4-byte boundaries.
    */
  def encodeBmp(width: Int, height: Int, gray: Array[Int]): Array[Byte] = {
    require(gray.length == width * height,
      s"encodeBmp: ${gray.length} samples for ${width}x$height")
    val rowSize = (width * 3 + 3) / 4 * 4
    val pixelBytes = rowSize * height
    val fileSize = 54 + pixelBytes
    val buf = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(pixelBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val v = (gray(y * width + x) & 0xff).toByte
        buf.put(v).put(v).put(v) // B G R
        x += 1
      }
      var p = width * 3
      while (p < rowSize) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode an uncompressed 24-bit BMP (top-down or bottom-up) to a
    * row-major grayscale grid (integer mean of B,G,R per pixel).
    */
  def decodeBmp(bytes: Array[Byte]): DecodedImage = {
    require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      "decodeBmp: not a BMP payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val hdrSize = buf.getInt(14)
    require(hdrSize >= 40, s"decodeBmp: unsupported header size $hdrSize")
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val topDown = rawHeight < 0
    // math.abs(Int.MinValue) is Int.MinValue — the explicit > 0 check
    // below rejects it either way
    val height = math.abs(rawHeight)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(bpp == 24 && compression == 0,
      s"decodeBmp: unsupported bpp=$bpp compression=$compression (24bpp uncompressed only)")
    // All size math in Long BEFORE any bound check: header-supplied
    // width/height/dataOffset are attacker-ish inputs, and int
    // arithmetic (width*3+3, rowSize*height, dataOffset+...) can wrap
    // past a naive require and then crash with NegativeArraySize /
    // ArrayIndexOutOfBounds instead of the intended clean rejection.
    require(width > 0 && height > 0, s"decodeBmp: implausible dimensions ${width}x$rawHeight")
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"decodeBmp: implausible pixel-array offset $dataOffset")
    val rowSizeL = (width.toLong * 3 + 3) / 4 * 4
    require(dataOffset.toLong + rowSizeL * height <= bytes.length,
      "decodeBmp: truncated pixel array")
    val rowSize = rowSizeL.toInt // bounded by bytes.length above
    val out = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val rowStart = dataOffset + srcRow * rowSize
      var x = 0
      while (x < width) {
        val i = rowStart + x * 3
        val b = bytes(i) & 0xff; val g = bytes(i + 1) & 0xff; val r = bytes(i + 2) & 0xff
        out(y * width + x) = (r + g + b) / 3
        x += 1
      }
      y += 1
    }
    DecodedImage(width, height, out)
  }

  // ---- WAV: RIFF container, PCM 16-bit ----

  /** Encode 16-bit mono PCM samples as a canonical 44-byte-header WAV. */
  def encodeWav(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(sm => buf.putShort(sm.toShort))
    buf.array()
  }

  /** Decode a PCM 16-bit WAV by walking its RIFF chunks (word-aligned;
    * unknown chunks skipped), returning signed samples as-is.
    */
  def decodeWav(bytes: Array[Byte]): DecodedAudio = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "decodeWav: not a RIFF/WAVE payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = 0
    var channels = 0
    var samples: Array[Int] = null
    while (pos + 8 <= bytes.length) {
      val id = tag(bytes, pos)
      val sz = buf.getInt(pos + 4)
      // a negative or overlong declared size would loop forever /
      // read out of bounds — fail like any other malformed payload
      require(sz >= 0 && pos + 8 + sz <= bytes.length,
        s"decodeWav: chunk '$id' declares $sz bytes at offset $pos (payload ${bytes.length})")
      id match {
        case "fmt " =>
          require(sz >= 16, s"decodeWav: fmt chunk too short ($sz bytes)")
          val fmt = buf.getShort(pos + 8)
          require(fmt == 1, s"decodeWav: unsupported format code $fmt (PCM only)")
          channels = buf.getShort(pos + 10)
          rate = buf.getInt(pos + 12)
          val bits = buf.getShort(pos + 22)
          require(bits == 16, s"decodeWav: unsupported bit depth $bits (16-bit only)")
        case "data" =>
          val n = sz / 2
          val arr = new Array[Int](n)
          var i = 0
          while (i < n) { arr(i) = buf.getShort(pos + 8 + i * 2).toInt; i += 1 }
          samples = arr
        case _ => () // LIST/INFO/etc: skip
      }
      pos += 8 + sz + (sz & 1)
    }
    require(samples != null && rate > 0, "decodeWav: missing fmt /data chunk")
    DecodedAudio(rate, channels, samples)
  }

  private def tag(bytes: Array[Byte], off: Int): String =
    new String(bytes, off, 4, "US-ASCII")

  // ---- Y4M (YUV4MPEG2): plain-text stream header + FRAME-delimited raw planar frames ----

  /** Encode grayscale frames as a Y4M stream with the `Cmono`
    * colorspace (luma plane only — the natural container for the
    * pipeline's intensity grids): one `YUV4MPEG2 W.. H.. ..` header
    * line, then `FRAME\n` + width×height luma bytes per frame.
    */
  def encodeY4m(width: Int, height: Int, frames: Seq[Array[Int]]): Array[Byte] = {
    require(width > 0 && height > 0, s"encodeY4m: implausible dimensions ${width}x$height")
    frames.foreach(f => require(f.length == width * height,
      s"encodeY4m: frame has ${f.length} samples for ${width}x$height"))
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 Cmono\n".getBytes("US-ASCII")
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    val buf = ByteBuffer.allocate(
      header.length + frames.length * (frameHdr.length + width * height))
    buf.put(header)
    frames.foreach { f =>
      buf.put(frameHdr)
      f.foreach(v => buf.put((v & 0xff).toByte))
    }
    buf.array()
  }

  /** Decode a Y4M stream to per-frame luma grids: `Cmono` frames are
    * read whole; `C420*` frames read the luma plane and skip the two
    * quarter-size chroma planes (grayscale analysis needs luma only).
    * Header-supplied dimensions are validated with Long size math
    * before any allocation, like [[decodeBmp]].
    */
  def decodeY4m(bytes: Array[Byte]): DecodedVideo = {
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n'.toByte) i += 1
      require(i < bytes.length, "decodeY4m: unterminated header line")
      i
    }
    require(bytes.length >= 10 &&
      new String(bytes, 0, 9, "US-ASCII") == "YUV4MPEG2",
      "decodeY4m: not a YUV4MPEG2 payload")
    val hdrEnd = lineEnd(0)
    val header = new String(bytes, 0, hdrEnd, "US-ASCII")
    var w = -1
    var h = -1
    var cs = "420" // Y4M default colorspace when no C tag is present
    header.split(' ').drop(1).filter(_.nonEmpty).foreach { t =>
      t.charAt(0) match {
        case 'W' => w = t.drop(1).toInt
        case 'H' => h = t.drop(1).toInt
        case 'C' => cs = t.drop(1)
        case _   => () // F/I/A/X params don't affect decoding
      }
    }
    require(w > 0 && h > 0, s"decodeY4m: implausible dimensions ${w}x$h")
    val lumaLen = w.toLong * h
    val frameLen: Long =
      if (cs == "mono") lumaLen
      else if (cs.startsWith("420")) lumaLen + 2L * ((w + 1) / 2) * ((h + 1) / 2)
      else throw new IllegalArgumentException(
        s"decodeY4m: unsupported colorspace C$cs (mono | 420*)")
    // a header-only stream (zero frames) is valid at any declared
    // size, so truncation is checked per-frame BEFORE each allocation
    require(lumaLen <= Int.MaxValue,
      s"decodeY4m: frame size $frameLen implausible for payload ${bytes.length}")
    val frames = Array.newBuilder[Array[Int]]
    var pos = hdrEnd + 1
    while (pos < bytes.length) {
      val fEnd = lineEnd(pos)
      require(fEnd - pos >= 5 && new String(bytes, pos, 5, "US-ASCII") == "FRAME",
        s"decodeY4m: expected FRAME marker at offset $pos")
      pos = fEnd + 1
      require(pos + frameLen <= bytes.length, "decodeY4m: truncated frame")
      val luma = new Array[Int](lumaLen.toInt)
      var i = 0
      while (i < luma.length) { luma(i) = bytes(pos + i) & 0xff; i += 1 }
      frames += luma
      pos += frameLen.toInt // ≤ bytes.length, Int-safe
    }
    DecodedVideo(w, h, frames.result())
  }
}
