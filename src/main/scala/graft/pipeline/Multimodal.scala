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
