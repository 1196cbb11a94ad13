package graft.search

import scala.collection.mutable

/** Levenshtein automaton: a DFA over (pattern, maxEdits) accepting
  * exactly the strings within plain Levenshtein distance `maxEdits` of
  * the pattern — the reference's FuzzyQuery expansion machinery
  * (`search/FuzzyQuery.java:53`, `util/automaton/LevenshteinAutomata
  * .java:33-60`; the reference compiles Schulz-Mihov parametric tables,
  * this builds the same DFA by direct subset construction over the
  * (position, edits) NFA — identical language, no precomputed tables).
  *
  * The alphabet is reduced to the pattern's distinct characters plus one
  * "other" class (every char not in the pattern transitions identically
  * — the reference's `getVocabulary` trick). States are canonical
  * subsumption-reduced NFA state sets: (i,e) subsumes (j,f) when
  * f ≥ e + |j−i|, which bounds the DFA to O(|t|·maxEdits) states —
  * a few dozen for the e ≤ 2 the reference supports
  * (`FuzzyQuery.java MAXIMUM_SUPPORTED_DISTANCE`).
  *
  * Packed flat-array transitions make `accepts` an O(len) table walk —
  * the per-term cost the distributed dictionary scan pays, replacing the
  * O(len·|t|) banded dynamic program.
  */
final class LevDfa private[search] (
    private val sigma: Array[Char],
    private val trans: Array[Int],
    private val acceptState: Array[Boolean]) extends Serializable {

  private val width = sigma.length + 1

  @inline private def classOf(c: Char): Int = {
    val i = java.util.Arrays.binarySearch(sigma, c)
    if (i >= 0) i else sigma.length
  }

  /** True iff levenshtein(w, pattern) ≤ maxEdits. */
  def accepts(w: CharSequence): Boolean = {
    var s = 0
    var i = 0
    val n = w.length
    while (i < n) {
      s = trans(s * width + classOf(w.charAt(i)))
      if (s < 0) return false
      i += 1
    }
    acceptState(s)
  }

  /** Number of DFA states (spec introspection). */
  def numStates: Int = acceptState.length
}

object LevDfa {

  /** Reference cap (`FuzzyQuery.java:40` MAXIMUM_SUPPORTED_DISTANCE). */
  val MaxSupportedEdits = 2

  /** Build the DFA for `pattern` at `maxEdits` ≥ 0 (small: the subset
    * construction is exponential in maxEdits, linear in |pattern|).
    */
  def build(pattern: String, maxEdits: Int): LevDfa = {
    require(maxEdits >= 0 && maxEdits <= MaxSupportedEdits,
      s"maxEdits must be in [0, $MaxSupportedEdits]: $maxEdits")
    val m = pattern.length
    val w = maxEdits + 1
    @inline def enc(i: Int, e: Int): Int = i * w + e
    @inline def posOf(s: Int): Int = s / w
    @inline def edOf(s: Int): Int = s % w

    // ε-closure (deletions: (i,e) → (i+k, e+k)) + subsumption reduction
    // ((i,e) subsumes (j,f) when f ≥ e + |j−i|) + canonical sort
    def canon(states: Iterable[Int]): Array[Int] = {
      val all = mutable.Set.empty[Int]
      states.foreach { s =>
        val i = posOf(s); val e = edOf(s)
        var k = 0
        while (e + k <= maxEdits && i + k <= m) { all += enc(i + k, e + k); k += 1 }
      }
      val arr = all.toArray
      val kept = arr.filter { s =>
        val i = posOf(s); val e = edOf(s)
        !arr.exists { o =>
          o != s && {
            val j = posOf(o); val f = edOf(o)
            e >= f + math.abs(i - j)
          }
        }
      }
      java.util.Arrays.sort(kept)
      kept
    }

    val sigma = pattern.toCharArray.distinct.sorted
    val nClasses = sigma.length + 1

    val start = canon(Seq(enc(0, 0)))
    val ids = mutable.HashMap.empty[mutable.ArraySeq[Int], Int]
    val statesList = mutable.ArrayBuffer.empty[Array[Int]]
    def idOf(set: Array[Int]): Int = {
      if (set.isEmpty) return -1
      val key = mutable.ArraySeq.make(set)
      ids.getOrElseUpdate(key, { statesList += set; statesList.length - 1 })
    }
    val startId = idOf(start)
    val transBuf = mutable.ArrayBuffer.empty[Int]
    var next = 0
    while (next < statesList.length) {
      val cur = statesList(next)
      // re-expand the stored antichain along the deletion diagonal before
      // taking moves — the subsumption-reduced set alone would miss
      // delete-then-match paths (e.g. pattern "ab", word "b")
      val closed = mutable.Set.empty[Int]
      cur.foreach { s =>
        val i = posOf(s); val e = edOf(s)
        var k = 0
        while (e + k <= maxEdits && i + k <= m) { closed += enc(i + k, e + k); k += 1 }
      }
      var cls = 0
      while (cls < nClasses) {
        val isOther = cls == sigma.length
        val out = mutable.ArrayBuffer.empty[Int]
        closed.foreach { s =>
          val i = posOf(s); val e = edOf(s)
          // match
          if (!isOther && i < m && pattern.charAt(i) == sigma(cls))
            out += enc(i + 1, e)
          if (e < maxEdits) {
            out += enc(i, e + 1) // insertion (extra char in the word)
            if (i < m) out += enc(i + 1, e + 1) // substitution
          }
        }
        transBuf += idOf(canon(out))
        cls += 1
      }
      next += 1
    }
    val accept = statesList.map(_.exists(s => m - posOf(s) <= maxEdits - edOf(s))).toArray
    assert(startId == 0)
    new LevDfa(sigma, transBuf.toArray, accept)
  }
}
