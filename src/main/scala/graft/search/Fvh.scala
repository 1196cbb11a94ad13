package graft.search

/** FastVectorHighlighter's multi-fragment pipeline
  * (`lucene/highlighter/src/java/org/apache/lucene/search/vectorhighlight/`)
  * re-expressed over the row store: term-match occurrences with char
  * offsets → greedy fragment windows (BaseFragListBuilder.java:48-103)
  * → weighted fragment scores (WeightedFieldFragList.java:45-77) →
  * score-ordered tagged fragment strings with word-boundary adjustment
  * (ScoreOrderFragmentsBuilder.java:60-80, BaseFragmentsBuilder.java:
  * 139-178, SimpleBoundaryScanner.java:59-90).
  *
  * Scope: term queries (each occurrence is a single-term phrase with
  * boost 1 — the FieldQuery flattening of a term/boolean query). Term
  * weight = (float)(ln(numDocs / (docFreq + 1.0)) + 1.0), the
  * FieldTermStack law (FieldTermStack.java:110).
  *
  * All functions are pure and executor-safe: the batch path maps them
  * over a row-store join, nothing per-request touches the driver.
  */
object Fvh {

  val DefaultMargin = 6 // BaseFragListBuilder.MARGIN_DEFAULT
  val DefaultMaxScan = 20 // SimpleBoundaryScanner.DEFAULT_MAX_SCAN
  // SimpleBoundaryScanner.DEFAULT_BOUNDARY_CHARS
  private val BoundaryChars = Set('.', ',', '!', '?', ' ', '\t', '\n')

  /** One matched term occurrence: [so, eo) char offsets + the term's
    * FieldTermStack weight.
    */
  final case class Occ(so: Int, eo: Int, weight: Float)

  /** One selected fragment: window [start, end), members in offset
    * order, WeightedFieldFragList totalBoost.
    */
  final case class Frag(start: Int, end: Int, occs: Seq[Occ],
      totalBoost: Float)

  /** FieldTermStack.TermInfo weight (FieldTermStack.java:110). */
  def termWeight(numDocs: Long, docFreq: Long): Float =
    (math.log(numDocs / (docFreq + 1).toDouble) + 1.0).toFloat

  /** The greedy fragment windows (BaseFragListBuilder.createFieldFragList,
    * BaseFragListBuilder.java:48-103) over single-term phrases, where
    * acceptPhrase is always true (termsOffsets.size <= 1,
    * BaseFragListBuilder.java:112-113). `occs` must be sorted by start
    * offset. Scoring is WeightedFieldFragList.add
    * (WeightedFieldFragList.java:45-77): per occurrence, boost = the
    * term's weight the FIRST time the term appears in the fragment else
    * 0; norm = length · (1 / √length) over the fragment's occurrence
    * count; totalBoost = float Σ (boost · norm).
    */
  def fragList(occs: Seq[Occ], terms: Seq[String], fragCharSize: Int,
      margin: Int = DefaultMargin): Seq[Frag] = {
    require(fragCharSize >= math.max(1, margin * 3),
      s"fragCharSize($fragCharSize) must be >= ${math.max(1, margin * 3)}")
    require(occs.length == terms.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[Frag]
    var floor = 0 // `startOffset` of the reference loop
    var i = 0
    while (i < occs.length) {
      if (occs(i).so < floor) i += 1 // violates the previous border
      else {
        val firstSo = occs(i).so
        var lastEo = occs(i).eo
        var spanStart = math.max(firstSo - margin, floor)
        val provEnd = math.max(lastEo, spanStart + fragCharSize)
        val first = i
        i += 1
        while (i < occs.length && occs(i).eo <= provEnd) {
          lastEo = occs(i).eo
          i += 1
        }
        val members = occs.slice(first, i)
        val memberTerms = terms.slice(first, i)
        val matchLen = lastEo - firstSo
        val newMargin = math.max(0, (fragCharSize - matchLen) / 2)
        spanStart = firstSo - newMargin
        if (spanStart < floor) spanStart = floor
        val spanEnd = spanStart + math.max(matchLen, fragCharSize)
        floor = spanEnd
        // WeightedFieldFragList.add — float ops in reference order
        val seen = scala.collection.mutable.HashSet.empty[String]
        val n = members.length
        val norm = n.toFloat * (1f / math.sqrt(n.toDouble).toFloat)
        var total = 0f
        var j = 0
        while (j < n) {
          val b = if (seen.add(memberTerms(j))) members(j).weight else 0f
          total += b * norm
          j += 1
        }
        out += Frag(spanStart, spanEnd, members, total)
      }
    }
    out.toSeq
  }

  /** SimpleBoundaryScanner.findStartOffset (SimpleBoundaryScanner.java:
    * 59-74): largest offset ≤ start whose PRECEDING char is a boundary,
    * scanning at most maxScan steps; text start counts as a boundary if
    * reached; else `start` unchanged.
    */
  def findStartOffset(text: String, start: Int,
      maxScan: Int = DefaultMaxScan): Int = {
    if (start > text.length || start < 1) return start
    var offset = start
    var count = maxScan
    while (offset > 0 && count > 0) {
      if (BoundaryChars.contains(text.charAt(offset - 1))) return offset
      offset -= 1
      count -= 1
    }
    if (offset == 0) 0 else start
  }

  /** SimpleBoundaryScanner.findEndOffset (SimpleBoundaryScanner.java:
    * 76-90): smallest offset ≥ start holding a boundary char, at most
    * maxScan steps forward; else `start` unchanged.
    */
  def findEndOffset(text: String, start: Int,
      maxScan: Int = DefaultMaxScan): Int = {
    if (start > text.length || start < 0) return start
    var offset = start
    var count = maxScan
    while (offset < text.length && count > 0) {
      if (BoundaryChars.contains(text.charAt(offset))) return offset
      offset += 1
      count -= 1
    }
    start
  }

  /** BaseFragmentsBuilder.makeFragment (BaseFragmentsBuilder.java:
    * 147-166) over a single-valued field: boundary-adjusted window
    * slice with pre/post tags around each member occurrence.
    */
  def makeFragment(text: String, frag: Frag, preTag: String = "<b>",
      postTag: String = "</b>"): String = {
    val eo =
      if (text.length < frag.end) text.length
      else findEndOffset(text, frag.end)
    val mso = findStartOffset(text, frag.start)
    val src = text.substring(mso, eo)
    val sb = new java.lang.StringBuilder(src.length + 16)
    var srcIndex = 0
    frag.occs.foreach { o =>
      sb.append(src, srcIndex, o.so - mso)
        .append(preTag)
        .append(src, o.so - mso, o.eo - mso)
        .append(postTag)
      srcIndex = o.eo - mso
    }
    sb.append(src, srcIndex, src.length)
    sb.toString
  }

  /** The full per-doc pipeline: token bounds (flat [start, len] pairs
    * indexing the ORIGINAL text, the row store's offsets sidecar law) →
    * matched occurrences → fragments → score-ordered tagged strings
    * (boost desc, startOffset asc — ScoreOrderFragmentsBuilder
    * .ScoreComparator), top maxNumFragments. Returns (fragment,
    * totalBoost) pairs in emission order.
    */
  def highlightDoc(text: String, bounds: Array[Int],
      weights: Map[String, Float], fragCharSize: Int,
      maxNumFragments: Int): Seq[(String, Float)] = {
    val occs = scala.collection.mutable.ArrayBuffer.empty[Occ]
    val terms = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i + 1 < bounds.length) {
      val s = bounds(i); val l = bounds(i + 1)
      val t = text.substring(s, s + l).toLowerCase(java.util.Locale.ROOT)
      weights.get(t).foreach { w =>
        occs += Occ(s, s + l, w)
        terms += t
      }
      i += 2
    }
    fragList(occs.toSeq, terms.toSeq, fragCharSize)
      .sortBy(f => (-f.totalBoost, f.start))
      .take(maxNumFragments)
      .map(f => (makeFragment(text, f), f.totalBoost))
  }
}
