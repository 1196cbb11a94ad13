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
  * to it for image-typed payloads. AUDIO/VIDEO container metadata is
  * REAL too: `parseWav` walks RIFF chunks (fmt + data → format,
  * channels, sample rate, bit depth, duration) and `parseMp4` walks ISO
  * BMFF boxes (ftyp brand, moov/mvhd timescale + duration, trak count)
  * — pure byte parsing, no codecs needed. Only SAMPLE DECODE and
  * FEATURE EXTRACTION remain DETERMINISTIC FAKES
  * (`decodeStub`/`extractStub`) because no media codecs ship in this
  * container. The Spark-side contract — schema, binary transport,
  * partition-batched execution, feature vector shape — is real and
  * tested either way.
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

  /** Parsed WAV/RIFF metadata (fmt chunk + declared data size). */
  final case class AudioMeta(format: Int, channels: Int, sampleRate: Int,
      bitsPerSample: Int, dataBytes: Long, durationSec: Double)

  /** REAL WAV header parse — RIFF chunk walk, no codec: 'RIFF'<size>
    * 'WAVE' then <id><le-size> chunks; 'fmt ' yields audioFormat /
    * channels / sampleRate / byteRate / bitsPerSample, 'data' the
    * payload size; duration = dataBytes / byteRate. Chunks are
    * word-aligned (odd sizes pad one byte). None for non-RIFF or
    * malformed headers. Header-only: a declared data size past the
    * buffer still parses (truncated transport, intact header).
    */
  def parseWav(blob: Array[Byte]): Option[AudioMeta] = {
    if (blob.length < 12) return None
    def ascii(o: Int): String =
      if (o + 4 <= blob.length) new String(blob, o, 4, "US-ASCII") else ""
    if (ascii(0) != "RIFF" || ascii(8) != "WAVE") return None
    val bb = java.nio.ByteBuffer.wrap(blob)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12L
    var fmt: Option[(Int, Int, Int, Int, Int)] = None
    var dataBytes = -1L
    while (off + 8 <= blob.length && (fmt.isEmpty || dataBytes < 0)) {
      val id = ascii(off.toInt)
      val size = bb.getInt(off.toInt + 4).toLong & 0xffffffffL
      if (id == "fmt " && off + 8 + 16 <= blob.length) {
        val o = off.toInt + 8
        fmt = Some((bb.getShort(o) & 0xffff, bb.getShort(o + 2) & 0xffff,
          bb.getInt(o + 4), bb.getInt(o + 8), bb.getShort(o + 14) & 0xffff))
      } else if (id == "data") dataBytes = size
      off += 8 + size + (size & 1)
    }
    fmt.flatMap { case (af, ch, sr, byteRate, bits) =>
      if (dataBytes < 0 || byteRate <= 0 || ch <= 0 || sr <= 0) None
      else Some(AudioMeta(af, ch, sr, bits, dataBytes,
        dataBytes.toDouble / byteRate))
    }
  }

  /** Parsed MP4/ISO-BMFF metadata (ftyp brand + moov/mvhd + trak count). */
  final case class VideoMeta(brand: String, timescale: Long,
      durationUnits: Long, durationSec: Double, tracks: Int)

  /** REAL MP4 box-header parse — ISO BMFF walk, no codec: top-level
    * <be-size><type> boxes (size 1 = 64-bit largesize) until `moov`;
    * inside it `mvhd` (version 0: 32-bit timescale at body+12, duration
    * at body+16; version 1: 64-bit fields after 64-bit timestamps) and
    * the number of `trak` children. None for non-ftyp or malformed
    * boxes.
    */
  def parseMp4(blob: Array[Byte]): Option[VideoMeta] = {
    if (blob.length < 16) return None
    val bb = java.nio.ByteBuffer.wrap(blob) // big-endian default
    def ascii(o: Long): String =
      if (o + 4 <= blob.length) new String(blob, o.toInt, 4, "US-ASCII") else ""
    if (ascii(4) != "ftyp") return None
    val brand = ascii(8)
    // (start, size) of each box in [from, to); size 0 = "to end of file"
    def boxes(lo: Long, hi: Long): Iterator[(Long, Long, String)] =
      new Iterator[(Long, Long, String)] {
        private var off = lo
        def hasNext: Boolean = off + 8 <= hi
        def next(): (Long, Long, String) = {
          val size0 = bb.getInt(off.toInt).toLong & 0xffffffffL
          val typ = ascii(off + 4)
          val (hdr, size) =
            if (size0 == 1 && off + 16 <= hi) (16L, bb.getLong(off.toInt + 8))
            else if (size0 == 0) (8L, hi - off)
            else (8L, size0)
          val r = (off + hdr, math.max(size - hdr, 0L), typ)
          off = if (size < 8) hi else off + size // malformed → stop
          r
        }
      }
    val moov = boxes(0, blob.length)
      .collectFirst { case (s, len, "moov") => (s, math.min(s + len, blob.length)) }
    moov.flatMap { case (s, e) =>
      var ts = -1L
      var dur = -1L
      var tracks = 0
      boxes(s, e).foreach {
        case (bs, _, "mvhd") if bs + 4 <= e =>
          val version = blob(bs.toInt) & 0xff
          if (version == 1 && bs + 32 <= e) {
            ts = bb.getInt(bs.toInt + 20).toLong & 0xffffffffL
            dur = bb.getLong(bs.toInt + 24)
          } else if (version == 0 && bs + 24 <= e) {
            ts = bb.getInt(bs.toInt + 12).toLong & 0xffffffffL
            dur = bb.getInt(bs.toInt + 16).toLong & 0xffffffffL
          }
        case (_, _, "trak") => tracks += 1
        case _ => ()
      }
      if (ts > 0 && dur >= 0)
        Some(VideoMeta(brand, ts, dur, dur.toDouble / ts, tracks))
      else None
    }
  }

  final case class AudioRow(id: Long, format: Int, channels: Int,
      sampleRate: Int, bitsPerSample: Int, dataBytes: Long,
      durationSec: Double, parsed: Boolean)

  /** Batched audio-metadata decode: real WAV/RIFF parse, with the
    * disclosed deterministic fallback for payloads no parser claims
    * (`parsed = false` marks fallback rows — callers can filter).
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        parseWav(r.blob) match {
          case Some(m) => AudioRow(r.id, m.format, m.channels, m.sampleRate,
            m.bitsPerSample, m.dataBytes, m.durationSec, parsed = true)
          case None =>
            val s = decodeStub(r.blob)
            AudioRow(r.id, 0, s.channels, 8000, 16, s.byteLen, 0.0,
              parsed = false)
        }
      }
    }
  }

  final case class VideoRow(id: Long, brand: String, timescale: Long,
      durationSec: Double, tracks: Int, parsed: Boolean)

  /** Batched video-metadata decode: real MP4 box walk, disclosed
    * deterministic fallback for unclaimed payloads.
    */
  def decodeVideo(media: Dataset[MediaRow]): Dataset[VideoRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        parseMp4(r.blob) match {
          case Some(m) =>
            VideoRow(r.id, m.brand, m.timescale, m.durationSec, m.tracks,
              parsed = true)
          case None =>
            VideoRow(r.id, "none", 0L, 0.0, 0, parsed = false)
        }
      }
    }
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
