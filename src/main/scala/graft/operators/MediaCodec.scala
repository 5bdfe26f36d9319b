package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

final case class DecodedImage(width: Int, height: Int, samples: Array[Int])
final case class DecodedAudio(sampleRate: Int, channels: Int, samples: Array[Int])

/** Pure-JVM codecs for the two self-describing formats the multimodal
  * pipeline decodes for real (no native/codec dependencies exist in
  * this environment): uncompressed 24-bit BMP and 16-bit PCM WAV —
  * both trivial, fully-public container formats whose layouts are
  * re-implemented here from their well-known public structure.
  * Executors call these inside `mapPartitions`; everything is
  * allocation-lean single-pass code over the payload bytes.
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
    val height = math.abs(rawHeight)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(bpp == 24 && compression == 0,
      s"decodeBmp: unsupported bpp=$bpp compression=$compression (24bpp uncompressed only)")
    val rowSize = (width * 3 + 3) / 4 * 4
    require(bytes.length >= dataOffset + rowSize * height, "decodeBmp: truncated pixel array")
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
}
