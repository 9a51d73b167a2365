package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata travelling beside them. The Spark
  * side — schema, batch shape, partition-parallel decode, typed output — is
  * real and tested; the codec itself is STUBBED behind [[StubCodec]]
  * (image/audio libraries are not in this container): it parses a
  * deterministic fake header instead of running libjpeg, so every byte of
  * the pipeline around the codec is exercised.
  */
object Multimodal {

  /** Typed metadata extracted from a binary payload. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      magic: String,      // container signature (first 4 bytes as hex)
      width: Int,         // fake header fields (see StubCodec)
      height: Int,
      ok: Boolean)

  /** Deterministic fake payloads: UTF-8 bytes of the text column. Real
    * deployments read the bytes from the lake; the engine only requires
    * `binary`. */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decoder — the seam where libjpeg/ffmpeg would sit. Parses a fake
    * header: magic = first 4 bytes hex; width/height = byte values at
    * offsets 0-1 and 2-3 (big-endian pairs). Pure function of the bytes, so
    * tests and the SQL oracle can mirror it exactly. */
  object StubCodec {
    def decode(bytes: Array[Byte]): (String, Int, Int, Boolean) = {
      if (bytes == null || bytes.length < 4) ("", 0, 0, false)
      else {
        val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
        val width = ((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff)
        val height = ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)
        (magic, width, height, true)
      }
    }
  }

  /** Typed metadata from a REAL container parse. */
  final case class ContainerMeta(
      doc_id: Long,
      format: String,  // "png" | "wav" | "jpeg" | "stub"
      d1: Long,        // png/jpeg: width  | wav: channels
      d2: Long,        // png/jpeg: height | wav: sample rate
      n_bytes: Long,
      ok: Boolean)

  /** Real pure-JVM container parsers — the decode seam carries real bytes
    * for three ubiquitous formats (PNG IHDR, WAV RIFF/fmt, JPEG SOF);
    * [[StubCodec]] remains the fallback for containers whose decoders
    * aren't in this environment (mp4/webm would slot in here). Reference
    * capability analogue: arbitrary-payload ingest (indexing.go:299-369). */
  object MediaCodec {
    private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def be16(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 8) | (b(o + 1) & 0xffL)
    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def le16(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8)
    private def ascii(b: Array[Byte], o: Int, n: Int): String =
      new String(b, o, n, "US-ASCII")

    def isPng(b: Array[Byte]): Boolean =
      b != null && b.length >= 8 && (0 until 8).forall(i => b(i) == PngSig(i))

    def isWav(b: Array[Byte]): Boolean =
      b != null && b.length >= 12 &&
        ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WAVE"

    /** PNG: 8-byte signature, then the IHDR chunk
      * (len 4BE = 13, "IHDR", width 4BE, height 4BE, ...). */
    def parsePng(b: Array[Byte]): Option[(Long, Long)] =
      if (!isPng(b) || b.length < 24 || ascii(b, 12, 4) != "IHDR" ||
          be32(b, 8) < 13) None
      else Some((be32(b, 16), be32(b, 20)))

    /** WAV: RIFF/WAVE header, then walk chunks to "fmt " for
      * (channels 2LE @+2, sampleRate 4LE @+4). */
    def parseWav(b: Array[Byte]): Option[(Long, Long)] = {
      if (!isWav(b)) return None
      var o = 12
      while (o + 8 <= b.length) {
        val id = ascii(b, o, 4)
        val size = le32(b, o + 4) // unsigned 32-bit
        if (id == "fmt " && o + 16 <= b.length)
          return Some((le16(b, o + 10), le32(b, o + 12)))
        // corrupt chunk size (negative after cast / past the payload) must
        // reject the container, not crash the task
        if (size > b.length.toLong) return None
        o += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      None
    }

    // SOF0-SOF15 frame markers carry the image dimensions; C4/C8/CC in the
    // same range are DHT/JPG/DAC and are plain length-prefixed segments
    private val SofMarkers: Set[Int] = (0xc0 to 0xcf).toSet -- Set(0xc4, 0xc8, 0xcc)

    def isJpeg(b: Array[Byte]): Boolean =
      b != null && b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

    /** JPEG: SOI, then walk the length-prefixed metadata segments (APPn,
      * DQT, DHT, COM, ...) to the first SOF frame header, which carries
      * (height 2BE @+5, width 2BE @+7). Standalone RST/TEM markers only
      * occur inside entropy-coded data, so stopping at SOS keeps the walk
      * purely length-driven; any misaligned or undersized segment rejects
      * the container rather than crashing the task. Returns (width, height)
      * to match [[parsePng]]'s orientation. */
    def parseJpeg(b: Array[Byte]): Option[(Long, Long)] = {
      if (!isJpeg(b)) return None
      var o = 2
      while (o + 4 <= b.length) {
        if ((b(o) & 0xff) != 0xff) return None
        val m = b(o + 1) & 0xff
        if (m == 0xff) o += 1 // fill byte before a marker
        else if (m == 0xd9 || m == 0xda) return None // EOI/SOS before any SOF
        else if (SofMarkers(m))
          return if (o + 9 <= b.length) Some((be16(b, o + 7), be16(b, o + 5))) else None
        else {
          val len = be16(b, o + 2)
          if (len < 2) return None
          o += 2 + len.toInt
        }
      }
      None
    }

    def decode(doc_id: Long, b: Array[Byte]): ContainerMeta = {
      val n = if (b == null) 0L else b.length.toLong
      parsePng(b).map { case (w, h) => ContainerMeta(doc_id, "png", w, h, n, ok = true) }
        .orElse(parseWav(b).map { case (c, r) => ContainerMeta(doc_id, "wav", c, r, n, ok = true) })
        .orElse(parseJpeg(b).map { case (w, h) => ContainerMeta(doc_id, "jpeg", w, h, n, ok = true) })
        .getOrElse {
          val (_, w, h, ok) = StubCodec.decode(b)
          ContainerMeta(doc_id, "stub", w.toLong, h.toLong, n, ok)
        }
    }

    // ---- deterministic synthetic payload writers (tests + driver queries;
    //      real deployments read payload bytes from the lake) ----

    def pngBytes(width: Long, height: Long): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + 25)
      out.put(PngSig)
      out.putInt(13).put("IHDR".getBytes("US-ASCII"))
      out.putInt(width.toInt).putInt(height.toInt)
      out.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      out.putInt(0) // CRC not validated by header parse
      out.array()
    }

    /** Minimal JFIF container: SOI, APP0, SOF0 (baseline) frame header with
      * the given dimensions, EOI. Header-parse valid; no scan data. */
    def jpegBytes(width: Long, height: Long): Array[Byte] = {
      require(width >= 1 && width <= 0xffff && height >= 1 && height <= 0xffff,
        s"JPEG dimensions are 16-bit: got ${width}x$height")
      val out = java.nio.ByteBuffer.allocate(2 + 18 + 19 + 2)
      out.put(0xff.toByte).put(0xd8.toByte) // SOI
      out.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0, len 16
      out.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      out.put(1.toByte).put(1.toByte).put(0.toByte) // version 1.1, no units
      out.putShort(1).putShort(1).put(0.toByte).put(0.toByte) // density, no thumb
      out.put(0xff.toByte).put(0xc0.toByte).putShort(17) // SOF0, len 17
      out.put(8.toByte) // precision
      out.putShort(height.toShort).putShort(width.toShort)
      out.put(3.toByte) // 3 components: (id, sampling, quant table)
      out.put(1.toByte).put(0x22.toByte).put(0.toByte)
      out.put(2.toByte).put(0x11.toByte).put(1.toByte)
      out.put(3.toByte).put(0x11.toByte).put(1.toByte)
      out.put(0xff.toByte).put(0xd9.toByte) // EOI
      out.array()
    }

    def wavBytes(channels: Long, sampleRate: Long): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(12 + 8 + 16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(28).put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      out.putShort(1) // PCM
      out.putShort(channels.toShort)
      out.putInt(sampleRate.toInt)
      out.putInt((sampleRate * channels * 2).toInt) // byte rate
      out.putShort((channels * 2).toShort)          // block align
      out.putShort(16)                              // bits/sample
      out.array()
    }
  }

  /** Container metadata over real PNG/WAV bytes, partition-parallel. */
  def extractContainerMeta(payloads: DataFrame): Dataset[ContainerMeta] = {
    import payloads.sparkSession.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => MediaCodec.decode(id, bytes) })
  }

  /** Partition-parallel metadata extraction through the stub codec. A typed
    * mapPartitions keeps the decode batched per partition (the same shape a
    * vectorized/Arrow UDF would have) and returns a typed Dataset. */
  def extractMeta(payloads: DataFrame): Dataset[MediaMeta] = {
    import payloads.sparkSession.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (magic, w, h, ok) = StubCodec.decode(bytes)
          MediaMeta(id, if (bytes == null) 0L else bytes.length.toLong, magic, w, h, ok)
        }
      }
  }

  /** Frame-sampling plumbing for video-like payloads: slices the payload
    * into fixed-size "frames" and keeps every `stride`-th — the partition
    * and schema shape of real frame extraction, with the codec stubbed.
    * Output: (doc_id, frame_idx, frame_bytes). */
  def sampleFrames(payloads: DataFrame, frameSize: Int = 16,
                   stride: Int = 4): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = if (bytes == null) 0 else bytes.length / frameSize
        (0 until nFrames by stride).iterator.map { f =>
          (id, f, java.util.Arrays.copyOfRange(bytes, f * frameSize, (f + 1) * frameSize))
        }
      }.toDF("doc_id", "frame_idx", "frame_bytes")
  }
}
