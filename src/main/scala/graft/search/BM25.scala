package graft.search

import graft.core.Norms

/** BM25 exactly as the reference computes it — float pipeline, same
  * operation order (`lucene/core/src/java/org/apache/lucene/search/
  * similarities/BM25Similarity.java`):
  *
  *  - idf  = (float) ln(1 + (docCount − df + 0.5)/(df + 0.5))   [:72-74]
  *  - avgdl = (float)(sumTotalTermFreq / (double) docCount)     [:89-97]
  *  - cache(i) = k1 * ((1−b) + b * NORM_TABLE(i) / avgdl)       [:213-217]
  *  - weightValue = boost * idf * (k1+1)                        [:229,235]
  *  - score(freq, normByte) = weightValue * freq / (freq + cache(normByte))
  *                                                              [:240-245]
  *
  * Rank identity depends on keeping all of these in 32-bit float with this
  * exact association; do not "clean up" to double.
  */
final case class BM25Params(k1: Float = 1.2f, b: Float = 0.75f) {
  require(k1 >= 0 && !k1.isNaN && !k1.isInfinite, s"illegal k1: $k1")
  require(b >= 0 && b <= 1 && !b.isNaN, s"illegal b: $b")
}

object BM25 {

  val Default: BM25Params = BM25Params()

  def idf(df: Long, docCount: Long): Float =
    math.log(1 + (docCount - df + 0.5d) / (df + 0.5d)).toFloat

  def avgFieldLength(sumTotalTermFreq: Long, docCount: Long): Float =
    if (sumTotalTermFreq <= 0) 1f
    else (sumTotalTermFreq / docCount.toDouble).toFloat

  /** Freq-independent denominator per possible norm byte (256 entries). */
  def normCache(params: BM25Params, avgdl: Float): Array[Float] = {
    val c = new Array[Float](256)
    var i = 0
    while (i < 256) {
      c(i) = params.k1 * ((1 - params.b) + params.b * Norms.NORM_TABLE(i) / avgdl)
      i += 1
    }
    c
  }

  def weightValue(idf: Float, params: BM25Params, boost: Float = 1f): Float =
    boost * idf * (params.k1 + 1)

  /** Per-(term, doc) score. `cacheEntry` = normCache(normByte & 0xff). */
  @inline def score(weightValue: Float, freq: Float, cacheEntry: Float): Float =
    weightValue * freq / (freq + cacheEntry)

  /** Scalar convenience (tests / UDF): full pipeline for one posting. */
  def scoreOne(tf: Int, normByte: Byte, df: Long, docCount: Long,
      sumTotalTermFreq: Long, params: BM25Params = Default,
      boost: Float = 1f): Float = {
    val avgdl = avgFieldLength(sumTotalTermFreq, docCount)
    val cache =
      params.k1 * ((1 - params.b) + params.b * Norms.NORM_TABLE(normByte & 0xff) / avgdl)
    val w = weightValue(idf(df, docCount), params, boost)
    score(w, tf.toFloat, cache)
  }
}
