package graft.core

/** ReversedWildcardFilter semantics (`solr/core/src/java/org/apache/solr/
  * analysis/ReversedWildcardFilter.java:53-79` and
  * `ReversedWildcardFilterFactory.java:97-133`): index-time, every token
  * is re-emitted REVERSED with the U+0001 start-of-heading marker
  * (appended, then the whole buffer reversed — so the marker lands
  * FIRST); query-time, a wildcard pattern whose leading wildcard would
  * otherwise force a full term-dictionary scan is reversed too and run
  * against the marker-prefixed terms, turning the leading wildcard into
  * a LITERAL-PREFIX scan. At 100 TB the difference is a pruned
  * range-partitioned dictionary read versus touching the whole
  * vocabulary.
  *
  * `shouldReverse` transcribes the factory defaults: withOriginal=true,
  * maxPosAsterisk=2, maxPosQuestion=1, minTrailing=2,
  * maxFractionAsterisk=0.
  */
object ReversedWildcard {

  /** `ReverseStringFilter.START_OF_HEADING_MARKER` (`analysis/common/
    * .../reverse/ReverseStringFilter.java:42`).
    */
  final val Marker: Char = 1.toChar // U+0001 START OF HEADING

  /** Is this IndexBuilder tokenizer spec a reversed-wildcard field
    * (possibly behind a '!'-composed charfilter chain)?
    */
  def isRevWildSpec(tokenizer: String): Boolean = {
    val base = tokenizer.substring(tokenizer.lastIndexOf('!') + 1)
    base == "revwild" || base == "revwild_noorig"
  }

  /** Index-time form: reverse(token + marker) — the marker ends up first.
    * `StringBuilder.reverse` keeps surrogate pairs ordered, same contract
    * as the reference's Harmony-derived in-place reverse
    * (`ReversedWildcardFilter.java:88-130`).
    */
  def reverseToken(t: String): String =
    new java.lang.StringBuilder(t).append(Marker).reverse.toString

  /** The factory's query-reversal eligibility test, transcribed from
    * `ReversedWildcardFilterFactory.shouldReverse`
    * (`ReversedWildcardFilterFactory.java:97-133`): never reverse a
    * wildcard-free token; require >= minTrailing chars from the LAST
    * wildcard (inclusive) to the end; reverse on a '?' before position
    * maxPosQuestion or a '*' before position maxPosAsterisk; else the
    * optional leading-fraction rule.
    */
  def shouldReverse(token: String, maxPosAsterisk: Int = 2,
      maxPosQuestion: Int = 1, minTrailing: Int = 2,
      maxFractionAsterisk: Float = 0f): Boolean = {
    val posQ = token.indexOf('?')
    val posA = token.indexOf('*')
    if (posQ == -1 && posA == -1) return false
    var lastPos = token.lastIndexOf('?')
    val lastA = token.lastIndexOf('*')
    if (lastA > lastPos) lastPos = lastA
    val pos =
      if (posQ != -1) { if (posA != -1) math.min(posQ, posA) else posQ }
      else posA
    val len = token.length
    if (len - lastPos < minTrailing) return false
    if (posQ != -1 && posQ < maxPosQuestion) return true
    if (posA != -1 && posA < maxPosAsterisk) return true
    maxFractionAsterisk > 0f && pos < len * maxFractionAsterisk
  }

  /** Query-time pattern reversal — the string-level equivalent of the
    * parser's automaton form (`parser/SolrQueryParserBase.java:781-784`:
    * concatenate the marker onto the wildcard automaton, then reverse
    * it). `*` and `?` denote direction-symmetric languages (any string /
    * any single code point), so reversing the pattern UNIT-wise — an
    * escape pair `\x` or a surrogate pair stays one unit — accepts
    * exactly the reversed language; the marker becomes a literal first
    * char, i.e. a prunable prefix.
    */
  def reversePattern(p: String): String = {
    val units = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '\\' && i + 1 < p.length) {
        units += p.substring(i, i + 2); i += 2
      } else if (Character.isHighSurrogate(c) && i + 1 < p.length &&
          Character.isLowSurrogate(p.charAt(i + 1))) {
        units += p.substring(i, i + 2); i += 2
      } else {
        units += c.toString; i += 1
      }
    }
    Marker.toString + units.reverseIterator.mkString
  }
}
