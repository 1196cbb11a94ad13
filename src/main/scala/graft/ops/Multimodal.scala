package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * run batched inside `mapPartitions` so a real decoder (JNI/FFI or a
  * model runtime) can amortize per-batch setup.
  *
  * ==== PARTIAL-STUB NOTICE ====
  * IMAGE decode is REAL: `decodeImage` parses PNG/BMP/GIF/JPEG headers
  * via `javax.imageio` (JDK built-in, offline) and `decode` dispatches
  * to it for image-typed payloads. Audio/video decoding and feature
  * extraction remain DETERMINISTIC FAKES (`decodeStub`/`extractStub`:
  * dimensions/fingerprint derived from the bytes) because no such codecs
  * ship in this container. The Spark-side contract — schema, binary
  * transport, partition-batched execution, feature vector shape — is
  * real and tested either way.
  */
object Multimodal {

  /** Typed metadata emitted by decode. */
  final case class MediaMeta(width: Int, height: Int, channels: Int,
      byteLen: Long, sha256Head: String)

  final case class MediaRow(id: Long, mediaType: String, blob: Array[Byte])
  final case class DecodedRow(id: Long, mediaType: String, width: Int,
      height: Int, channels: Int, byteLen: Long, sha256Head: String)

  /** STUB decoder: deterministic pseudo-dimensions from the payload. A
    * real implementation would parse the container header here.
    */
  def decodeStub(blob: Array[Byte]): MediaMeta = {
    val len = blob.length.toLong
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(blob)
    val head = d.take(8).map(b => f"${b & 0xff}%02x").mkString
    MediaMeta(
      width = (len % 640).toInt + 1,
      height = ((len * 7) % 480).toInt + 1,
      channels = 3,
      byteLen = len,
      sha256Head = head)
  }

  /** STUB feature extractor: deterministic pseudo-embedding (dim floats
    * from the payload hash). A real implementation would run a vision /
    * audio encoder over the decoded tensor, batched per partition.
    */
  def extractStub(blob: Array[Byte], dim: Int = 16): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(blob)
    Array.tabulate(dim) { i =>
      val b = d(i % d.length) & 0xff
      (b - 128) / 128.0f
    }
  }

  /** REAL image decode via javax.imageio (PNG/BMP/GIF/JPEG — the readers
    * the JDK ships): parses the container header for width/height without
    * materializing the raster when the reader exposes a raw type, full
    * decode fallback otherwise. None when no installed reader claims the
    * payload (caller falls back to the stub).
    */
  def decodeImage(blob: Array[Byte]): Option[MediaMeta] = {
    val iis = javax.imageio.ImageIO
      .createImageInputStream(new java.io.ByteArrayInputStream(blob))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (iis == null || !readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val bands = Option(r.getRawImageType(0)).map(_.getNumBands)
            .getOrElse(r.read(0).getRaster.getNumBands)
          val md = java.security.MessageDigest.getInstance("SHA-256")
          val head = md.digest(blob).take(8).map(b => f"${b & 0xff}%02x").mkString
          Some(MediaMeta(w, h, bands, blob.length.toLong, head))
        } catch {
          case _: Exception => None // truncated/corrupt payload → stub
        } finally r.dispose()
      }
    } finally if (iis != null) iis.close()
  }

  /** Attach raw binary payloads (real image bytes) as media columns. */
  def asBinaryMedia(df: DataFrame, idCol: String, blobCol: String,
      mediaType: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(blobCol).as("blob"))
      .withColumn("mediaType", lit(mediaType))
      .select("id", "mediaType", "blob").as[MediaRow]
  }

  /** Attach text payloads as binary media columns (demo path: utf-8
    * bytes stand in for image bytes; the pipeline shape is identical).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        encode(col(payloadCol), "UTF-8").as("blob"))
      .withColumn("mediaType", lit(mediaType))
      .select("id", "mediaType", "blob").as[MediaRow]
  }

  /** Batched decode over partitions — the mapInPandas/mapPartitions shape
    * for heavyweight decoders: one decoder instance per partition, rows
    * streamed through it.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition decoder setup would happen HERE (load codec once);
      // image/* payloads go through the REAL javax.imageio header parse,
      // everything else (and unreadable bytes) through the disclosed stub
      it.map { r =>
        val m =
          if (r.mediaType != null && r.mediaType.startsWith("image/"))
            decodeImage(r.blob).getOrElse(decodeStub(r.blob))
          else decodeStub(r.blob)
        DecodedRow(r.id, r.mediaType, m.width, m.height, m.channels,
          m.byteLen, m.sha256Head)
      }
    }
  }

  final case class FeatureRow(id: Long, features: Array[Float])

  /** Batched feature extraction (same per-partition amortization shape). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map(r => FeatureRow(r.id, extractStub(r.blob, dim)))
    }
  }

  /** Frame-sample: pick every `stride`-th chunk of `frameBytes` bytes —
    * the video-frame-sampling plumbing (chunk boundaries, order, ids)
    * with the stub "frame" being a byte slice.
    */
  final case class FrameRow(id: Long, frameIdx: Int, frame: Array[Byte])

  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64,
      stride: Int = 4): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      r.blob.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (chunk, i) => FrameRow(r.id, i, chunk) }
    }
  }
}
