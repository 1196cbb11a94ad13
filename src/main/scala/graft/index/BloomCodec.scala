package graft.index

/** BloomFilteringPostingsFormat analog (`lucene/codecs/src/java/org/
  * apache/lucene/codecs/bloom/BloomFilteringPostingsFormat.java:83-120`):
  * a per-bucket bloom filter over the segment's terms lets term lookups
  * answer "definitely NOT in this bucket" without touching the term
  * dictionary or stats relation — at 10¹²-file vocabulary most absent
  * term probes (misspellings, foreign keys, cold identifiers) fail fast
  * against a few KB of bits instead of a pruned parquet read.
  *
  * The set is the reference's FuzzySet (`bloom/FuzzySet.java:40-306`),
  * transcribed: single MurmurHash2 probe (`bloom/MurmurHash2.java:40-99`,
  * seed 0x9747b28c, abs, AND-mask modulo), all-ones bitset sizes so a
  * recorded set DOWNSIZES by masking each set bit into the smaller size
  * (`FuzzySet.downsize:251-283`), initial size chosen for ~10%
  * saturation from the doc count (`DefaultBloomFilterFactory.java:33-36`
  * assumes one unique term per doc) and right-sized at flush to the
  * factory's 0.1 target (`BloomFilterFactory.java:47-52`). `contains`
  * can return MAYBE (true here) or a definitive NO — never a false
  * negative.
  */
object BloomCodec {

  /** MurmurHash2 32-bit (`bloom/MurmurHash2.java:44-85` with the
    * BytesRef wrapper's seed 0x9747b28c, :93).
    */
  def murmur2(data: Array[Byte]): Int = {
    val m = 0x5bd1e995
    val r = 24
    val len = data.length
    var h = 0x9747b28c ^ len
    val len4 = len >> 2
    var i = 0
    while (i < len4) {
      val i4 = i << 2
      var k = data(i4 + 3).toInt
      k = k << 8
      k = k | (data(i4 + 2) & 0xff)
      k = k << 8
      k = k | (data(i4 + 1) & 0xff)
      k = k << 8
      k = k | (data(i4 + 0) & 0xff)
      k *= m
      k ^= k >>> r
      k *= m
      h *= m
      h ^= k
      i += 1
    }
    val left = len - (len4 << 2)
    if (left != 0) {
      if (left >= 3) h ^= data(len - 3).toInt << 16
      if (left >= 2) h ^= data(len - 2).toInt << 8
      if (left >= 1) h ^= data(len - 1).toInt
      h *= m
    }
    h ^= h >>> 13
    h *= m
    h ^= h >>> 15
    h
  }

  /** The reference's usable all-ones sizes (`FuzzySet.java:84-94`). */
  val usableSizes: Array[Int] = {
    val out = new Array[Int](30)
    var size = 1
    var i = 0
    while (i < out.length) {
      size = (size << 1) | 1
      out(i) = size
      i += 1
    }
    out
  }

  /** `FuzzySet.getEstimatedNumberUniqueValuesAllowingForCollisions`
    * (`FuzzySet.java:294-301`).
    */
  def estimatedUniqueValues(setSize: Int, numRecordedBits: Int): Int = {
    val saturation = numRecordedBits.toDouble / setSize.toDouble
    (setSize.toDouble * (math.log(1 - saturation) * -1)).toInt
  }

  /** `FuzzySet.getNearestSetSize(maxNumberOfValuesExpected,
    * desiredSaturation)` (`FuzzySet.java:113-131`): smallest usable size
    * whose estimated capacity at the target saturation exceeds the
    * expected value count; -1 when none fits.
    */
  def sizeForQuality(maxValues: Int, desiredSaturation: Float): Int = {
    var i = 0
    while (i < usableSizes.length) {
      val numSetBits = (usableSizes(i) * desiredSaturation).toInt
      if (estimatedUniqueValues(usableSizes(i), numSetBits) > maxValues)
        return usableSizes(i)
      i += 1
    }
    -1
  }

  /** FuzzySet over (bloomSize = all-ones mask, long-word bitset). */
  final class FuzzySet(val bloomSize: Int, val bits: Array[Long]) {

    private def posOf(term: String): Int = {
      var h = murmur2(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (h < 0) h = h * -1
      h & bloomSize
    }

    /** MAYBE (true) or definitively-absent NO (false) —
      * `FuzzySet.contains/mayContainValue` (`FuzzySet.java:161-230`).
      */
    def mightContain(term: String): Boolean = {
      val pos = posOf(term)
      (bits(pos >> 6) & (1L << pos)) != 0
    }

    def add(term: String): Unit = {
      val pos = posOf(term)
      bits(pos >> 6) |= (1L << pos)
    }

    def cardinality: Int = {
      var c = 0
      var i = 0
      while (i < bits.length) { c += java.lang.Long.bitCount(bits(i)); i += 1 }
      c
    }

    def saturation: Float = cardinality.toFloat / bloomSize.toFloat

    /** `FuzzySet.downsize` (`FuzzySet.java:251-283`): smallest usable
      * size whose saturation stays under target; set bits re-project by
      * AND-masking with the smaller all-ones size.
      */
    def downsize(targetMaxSaturation: Float): FuzzySet = {
      val numBitsSet = cardinality
      var rightSize = bloomSize
      var i = 0
      var found = false
      while (i < usableSizes.length && !found) {
        val cand = usableSizes(i)
        if (numBitsSet.toFloat / cand.toFloat <= targetMaxSaturation) {
          rightSize = cand
          found = true
        }
        i += 1
      }
      if (rightSize >= bloomSize) this
      else {
        val out = new FuzzySet(rightSize,
          new Array[Long]((rightSize + 1 + 63) >> 6))
        var w = 0
        while (w < bits.length) {
          var word = bits(w)
          while (word != 0) {
            val b = java.lang.Long.numberOfTrailingZeros(word)
            val bitIndex = (w << 6) + b
            val down = bitIndex & rightSize
            out.bits(down >> 6) |= (1L << down)
            word &= word - 1
          }
          w += 1
        }
        out
      }
    }
  }

  object FuzzySet {
    /** The write-path set: sized like `DefaultBloomFilterFactory
      * .getSetForField` (doc count at 0.10 saturation; the largest
      * usable size as the memory-capped fallback when the quality search
      * fails, `createSetBasedOnMaxMemory`).
      */
    def forDocCount(docCount: Long): FuzzySet = {
      val sz0 = sizeForQuality(
        math.min(docCount, Int.MaxValue.toLong).toInt, 0.10f)
      val sz = if (sz0 <= 0) usableSizes.last else sz0
      new FuzzySet(sz, new Array[Long]((sz + 1 + 63) >> 6))
    }
  }
}
