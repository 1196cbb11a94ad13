package graft.core

/** Lossy byte encoding of field lengths, matching the reference's norm
  * quantization exactly (semantics of
  * `lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:81-105`:
  * floatToByte with 3 mantissa bits, zero exponent 15, truncating).
  *
  * Rank-identity of BM25 scores depends on reproducing this quantization
  * bit-for-bit: the engine stores `floatToByte315(1/sqrt(fieldLength))`
  * per doc and decodes through [[Norms.NORM_TABLE]]
  * (`BM25Similarity.java:103-143`).
  */
object SmallFloat {

  /** floatToByte(f, mantissaBits=3, zeroExp=15). Negative/zero → 0,
    * underflow → 1, overflow → 255 (-1 as byte), else truncated 8-bit
    * exponent+mantissa.
    */
  def floatToByte315(f: Float): Byte = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val smallfloat = bits >> (24 - 3)
    if (smallfloat <= ((63 - 15) << 3)) {
      if (bits <= 0) 0.toByte else 1.toByte
    } else if (smallfloat >= ((63 - 15) << 3) + 0x100) {
      (-1).toByte
    } else {
      (smallfloat - ((63 - 15) << 3)).toByte
    }
  }

  /** Inverse of [[floatToByte315]] (byteToFloat, mantissaBits=3, zeroExp=15). */
  def byte315ToFloat(b: Byte): Float = {
    if (b == 0) return 0.0f
    var bits = (b & 0xff) << (24 - 3)
    bits += (63 - 15) << 24
    java.lang.Float.intBitsToFloat(bits)
  }
}

/** The 256-entry decoded-norm cache of the reference
  * (`BM25Similarity.java:134-143`): NORM_TABLE(i) ≈ fieldLength for the
  * quantized byte i.
  */
object Norms {

  /** NORM_TABLE(i) = 1/(byte315ToFloat(i))^2; NORM_TABLE(0) = 1/NORM_TABLE(255). */
  val NORM_TABLE: Array[Float] = {
    val t = new Array[Float](256)
    var i = 1
    while (i < 256) {
      val f = SmallFloat.byte315ToFloat(i.toByte)
      t(i) = 1.0f / (f * f)
      i += 1
    }
    t(0) = 1.0f / t(255)
    t
  }

  /** Index-time norm byte for a field of `length` tokens (boost = 1). */
  def normByte(length: Int): Byte =
    SmallFloat.floatToByte315(1.0f / math.sqrt(length.toDouble).toFloat)

  /** Quantized field length a stored norm byte decodes to. */
  def decodedLength(b: Byte): Float = NORM_TABLE(b & 0xff)

  /** length → quantized length, as seen end-to-end through encode+decode.
    * Used both by the scorer and to emit the oracle-SQL lookup table.
    */
  def quantizedLength(length: Int): Float = decodedLength(normByte(length))

  /** Contiguous ranges [lo, hi] of raw field lengths that share one
    * quantized length, for lengths in [0, maxLen]. Emitted into oracle SQL
    * as a 256-ish-row join table so DuckDB reproduces the quantization.
    */
  def lengthRanges(maxLen: Int = 1 << 22): Seq[(Long, Long, Double)] =
    rangesOf(l => quantizedLength(l).toDouble, maxLen)

  /** Classic-similarity fieldNorm a stored byte decodes to: the RAW
    * byte315 float (`ClassicSimilarity` NORM_TABLE = byte315ToFloat(i),
    * i.e. ≈ 1/sqrt(length)) — NOT the BM25 length table.
    */
  def decodedNorm(length: Int): Float =
    SmallFloat.byte315ToFloat(normByte(length))

  /** length → decoded Classic fieldNorm ranges, for oracle SQL. */
  def decodedNormRanges(maxLen: Int = 1 << 22): Seq[(Long, Long, Double)] =
    rangesOf(l => decodedNorm(l).toDouble, maxLen)

  /** SweetSpotSimilarity lengthNorm
    * (lucene/misc SweetSpotSimilarity.java:137-152):
    * 1/sqrt(steepness·(|l−min|+|l−max|−(max−min)) + 1), float ops in the
    * reference's order (float multiply-add, then 1.0f / double sqrt cast
    * back to float). The plateau [min, max] norms to exactly 1.
    */
  def sweetSpotNorm(length: Int, min: Int, max: Int, steep: Float): Float = {
    val inner =
      steep * (math.abs(length - min) + math.abs(length - max) - (max - min)).toFloat + 1.0f
    (1.0f / math.sqrt(inner.toDouble)).toFloat
  }

  /** Index-time SweetSpot norm byte (the index-time Similarity determines
    * the stored byte, as in Lucene).
    */
  def sweetSpotNormByte(length: Int, min: Int, max: Int, steep: Float): Byte =
    SmallFloat.floatToByte315(sweetSpotNorm(length, min, max, steep))

  /** length → decoded SweetSpot fieldNorm ranges, for oracle SQL. */
  def sweetSpotNormRanges(min: Int, max: Int, steep: Float,
      maxLen: Int = 1 << 22): Seq[(Long, Long, Double)] =
    rangesOf(l =>
      SmallFloat.byte315ToFloat(sweetSpotNormByte(l, min, max, steep)).toDouble,
      maxLen)

  private def rangesOf(f: Int => Double,
      maxLen: Int): Seq[(Long, Long, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var lo = 0L
    var cur = f(0)
    var len = 1L
    while (len <= maxLen) {
      val q = f(len.toInt)
      if (q != cur) {
        out += ((lo, len - 1, cur))
        lo = len
        cur = q
      }
      len += 1
    }
    out += ((lo, Long.MaxValue, cur))
    out.toSeq
  }
}
