package graft.search

import graft.index.PostingsCodec.PostingsIterator

/** Positional phrase matching over the segment path — the ExactPhrase /
  * SloppyPhrase scorers of the reference
  * (`lucene/core/src/java/org/apache/lucene/search/ExactPhraseScorer.java:27`,
  * `SloppyPhraseScorer.java:32`), running on the positions sidecar of the
  * posting blobs (no re-tokenization at query time).
  */
object PhraseFreq {

  /** Exact-phrase frequency for ONE doc: the number of positions p such
    * that term i occurs at p + offsets(i) for every i — the reference's
    * int freq (`ExactPhraseScorer.java:112-150` counting loop).
    * `positions(i)` strictly ascending.
    */
  def exact(positions: Array[Array[Int]], offsets: Array[Int]): Int = {
    val n = positions.length
    if (n == 1) return positions(0).length
    val idx = new Array[Int](n)
    var cnt = 0
    var done = false
    while (!done && idx(0) < positions(0).length) {
      // candidate base position (adjusted to offset 0)
      val cand = positions(0)(idx(0)) - offsets(0)
      var i = 1
      var restart = false
      while (i < n && !restart) {
        val a = positions(i)
        val want = cand + offsets(i)
        var k = idx(i)
        while (k < a.length && a(k) < want) k += 1
        idx(i) = k
        if (k == a.length) { done = true; restart = true }
        else if (a(k) > want) {
          // advance the base stream to the first candidate that could align
          val newBase = a(k) - offsets(i) + offsets(0)
          var k0 = idx(0)
          while (k0 < positions(0).length && positions(0)(k0) < newBase) k0 += 1
          idx(0) = k0
          restart = true
        }
        i += 1
      }
      if (!restart) { cnt += 1; idx(0) += 1 }
    }
    cnt
  }

  /** Sloppy-phrase frequency for ONE doc — the reference's greedy sweep
    * (`SloppyPhraseScorer.java:92-126` phraseFreq): PhrasePositions are
    * kept in a queue ordered by (adjusted position, offset, ord)
    * (`PhraseQueue.java:28-39`); the least pp is advanced, minimizing the
    * current match length until it hops past the runner-up, at which point
    * a match of length `matchLength` contributes
    * `1/(matchLength+1)` (computeSlopFactor = sloppyFreq,
    * `BM25Similarity.java:77,253`) when within `slop`. Float accumulation
    * like the reference.
    *
    * REPEATED terms (`"ho my my"~2`): pass `rptGroup` — same id for
    * offsets sharing a term, -1 otherwise. Mirrors the reference's
    * single-term repeating-pp machinery (`SloppyPhraseScorer.java:
    * 148-200, advanceRepeatGroups/collide/lesser`): at doc init, the j-th
    * group member (offset order) advances j occurrences; during the
    * sweep, a collision (two group members on the same RAW token) is
    * resolved by advancing the lesser (adjusted position, then offset).
    * Multi-term-per-position repeats (the hasMultiTermRpts case) are out
    * of scope and rejected upstream.
    */
  def sloppy(positions: Array[Array[Int]], offsets: Array[Int],
      slop: Int, rptGroup: Array[Int] = null): Float = {
    val n = positions.length
    val idx = new Array[Int](n)
    val cur = new Array[Int](n) // adjusted position of each pp
    val inQ = new Array[Boolean](n)
    var i = 0
    // doc init: j-th member of each repeat group starts at its j-th
    // occurrence (advanceRepeatGroups, single-term case) — members in
    // offset order, which is ascending pp index here
    i = 0
    while (i < n) {
      var steps = 0
      if (rptGroup != null && rptGroup(i) >= 0) {
        var j = 0
        while (j < i) {
          if (rptGroup(j) == rptGroup(i)) steps += 1
          j += 1
        }
      }
      if (steps >= positions(i).length) return 0f // PPs exhausted at init
      idx(i) = steps
      i += 1
    }
    var end = Int.MinValue
    i = 0
    while (i < n) {
      cur(i) = positions(i)(idx(i)) - offsets(i)
      if (cur(i) > end) end = cur(i)
      inQ(i) = true
      i += 1
    }
    // queue order: (position, offset, ord) — PhraseQueue.lessThan
    def less(a: Int, b: Int): Boolean =
      cur(a) < cur(b) || (cur(a) == cur(b) &&
        (offsets(a) < offsets(b) || (offsets(a) == offsets(b) && a < b)))
    def minIdx(): Int = {
      var best = -1
      var j = 0
      while (j < n) {
        if (inQ(j) && (best == -1 || less(j, best))) best = j
        j += 1
      }
      best
    }
    // advance pp by one occurrence; false at exhaustion (advancePP)
    def advancePP(p: Int): Boolean = {
      idx(p) += 1
      if (idx(p) >= positions(p).length) return false
      cur(p) = positions(p)(idx(p)) - offsets(p)
      if (cur(p) > end) end = cur(p)
      true
    }
    // resolve repeat collisions after advancing `pp0` (advanceRpts/
    // collide/lesser): two group members on the same raw token → advance
    // the lesser; false at exhaustion
    def advanceRpts(pp0: Int): Boolean = {
      if (rptGroup == null || rptGroup(pp0) < 0) return true
      var p = pp0
      var k = -1
      def collide(q: Int): Int = {
        val raw = cur(q) + offsets(q)
        var j = 0
        while (j < n) {
          if (j != q && rptGroup(j) == rptGroup(q) &&
              cur(j) + offsets(j) == raw) return j
          j += 1
        }
        -1
      }
      k = collide(p)
      while (k >= 0) {
        p = if (cur(p) < cur(k) ||
            (cur(p) == cur(k) && offsets(p) < offsets(k))) p else k
        if (!advancePP(p)) return false
        k = collide(p)
      }
      true
    }

    var freq = 0f
    var pp = minIdx(); inQ(pp) = false
    var matchLength = end - cur(pp)
    var next = cur(minIdx())
    var exhausted = false
    while (!exhausted) {
      if (!advancePP(pp) || !advanceRpts(pp)) exhausted = true
      else {
        if (cur(pp) > next) { // done minimizing the current match length
          if (matchLength <= slop) freq += 1f / (matchLength + 1)
          inQ(pp) = true
          pp = minIdx(); inQ(pp) = false
          next = cur(minIdx())
          matchLength = end - cur(pp)
        } else {
          val ml2 = end - cur(pp)
          if (ml2 < matchLength) matchLength = ml2
        }
      }
    }
    if (matchLength <= slop) freq += 1f / (matchLength + 1)
    freq
  }
}

/** Conjunction + position-verify scorer: docs stream from the leapfrog
  * intersection of the term iterators; positions decode lazily only on
  * aligned docs (two-phase iteration, `ExactPhraseScorer.java:27,75-90`).
  * Scored as ONE pseudo-term: idf = Σ constituent idfs (float, term
  * order — `BM25Similarity.java:194-205` idfExplain), freq = phrase
  * frequency, norm = the doc's norm byte.
  */
final class PhraseScorer(its: Array[PostingsIterator], offsets: Array[Int],
    slop: Int, w: Float, cache: Array[Float],
    rptGroup: Array[Int] = null) extends DocScorer {
  require(its.length == offsets.length && its.length >= 2)
  var doc: Long = -1L
  private var freqV = 0f
  private var normB: Byte = 0

  /** First doc ≥ t0 where all iterators align (no position check). */
  private def alignFrom(t0: Long): Long = {
    var target = t0
    var agreed = false
    while (!agreed && target != DocScorer.NO_MORE) {
      agreed = true
      var i = 0
      while (i < its.length && agreed) {
        val it = its(i)
        if (it.doc < target) it.advance(target)
        if (it.doc > target) { target = it.doc; agreed = false }
        i += 1
      }
    }
    target
  }

  private def computeFreq(): Float = {
    val pos = new Array[Array[Int]](its.length)
    var i = 0
    while (i < its.length) { pos(i) = its(i).positions(); i += 1 }
    if (slop == 0) PhraseFreq.exact(pos, offsets).toFloat
    else PhraseFreq.sloppy(pos, offsets, slop, rptGroup)
  }

  private def settle(t0: Long): Long = {
    var target = alignFrom(t0)
    while (target != DocScorer.NO_MORE) {
      val f = computeFreq()
      if (f > 0f) {
        freqV = f; normB = its(0).norm; doc = target
        return doc
      }
      target = alignFrom(target + 1)
    }
    doc = DocScorer.NO_MORE
    doc
  }

  def nextDoc(): Long = settle(if (doc < 0) 0L else doc + 1)
  def advance(target: Long): Long =
    if (target <= doc) doc else settle(target)
  def score: Float = BM25.score(w, freqV, cache(normB & 0xff))
  def cost: Long = its.map(_.cost).min
  /** BM25 is bounded above by w as freq → ∞. */
  def maxScore: Float = w
}

/** MultiPhraseQuery scorer (`MultiPhraseQuery.java:49`,
  * UnionPostingsEnum semantics): each phrase offset accepts a SET of
  * terms; an offset's matching positions in a doc are the UNION of its
  * members' positions. Doc matching = conjunction over offsets of member
  * unions; freq = PhraseFreq over the merged per-offset position arrays.
  */
final class MultiPhraseScorer(members: Array[Array[PostingsIterator]],
    offsets: Array[Int], slop: Int, w: Float, cache: Array[Float])
    extends DocScorer {
  require(members.length == offsets.length && members.length >= 2)
  require(members.forall(_.nonEmpty))
  var doc: Long = -1L
  private var freqV = 0f
  private var normB: Byte = 0

  /** Min doc ≥ target across the offset's members (union semantics). */
  private def unionAdvance(o: Int, target: Long): Long = {
    var min = DocScorer.NO_MORE
    val its = members(o)
    var i = 0
    while (i < its.length) {
      if (its(i).doc < target) its(i).advance(target)
      if (its(i).doc < min) min = its(i).doc
      i += 1
    }
    min
  }

  private def alignFrom(t0: Long): Long = {
    var target = t0
    var agreed = false
    while (!agreed && target != DocScorer.NO_MORE) {
      agreed = true
      var o = 0
      while (o < members.length && agreed) {
        val d = unionAdvance(o, target)
        if (d > target) { target = d; agreed = false }
        o += 1
      }
    }
    target
  }

  /** Sorted distinct union of the offset's member positions at `target`. */
  private def mergedPositions(o: Int, target: Long): Array[Int] = {
    val live = members(o).filter(_.doc == target)
    if (live.length == 1) return live(0).positions()
    val arrs = live.map(_.positions())
    val idx = new Array[Int](arrs.length)
    val out = scala.collection.mutable.ArrayBuilder.make[Int]
    var last = Int.MinValue
    var remaining = arrs.map(_.length).sum
    while (remaining > 0) {
      var best = -1
      var bestV = Int.MaxValue
      var i = 0
      while (i < arrs.length) {
        if (idx(i) < arrs(i).length && arrs(i)(idx(i)) < bestV) {
          bestV = arrs(i)(idx(i)); best = i
        }
        i += 1
      }
      idx(best) += 1
      remaining -= 1
      if (bestV != last) { out += bestV; last = bestV }
    }
    out.result()
  }

  private def settle(t0: Long): Long = {
    var target = alignFrom(t0)
    while (target != DocScorer.NO_MORE) {
      val pos = new Array[Array[Int]](members.length)
      var o = 0
      while (o < members.length) { pos(o) = mergedPositions(o, target); o += 1 }
      val f =
        if (slop == 0) PhraseFreq.exact(pos, offsets).toFloat
        else PhraseFreq.sloppy(pos, offsets, slop)
      if (f > 0f) {
        freqV = f
        normB = members(0).find(_.doc == target).get.norm
        doc = target
        return doc
      }
      target = alignFrom(target + 1)
    }
    doc = DocScorer.NO_MORE
    doc
  }

  def nextDoc(): Long = settle(if (doc < 0) 0L else doc + 1)
  def advance(target: Long): Long =
    if (target <= doc) doc else settle(target)
  def score: Float = BM25.score(w, freqV, cache(normB & 0xff))
  def cost: Long = members.map(_.map(_.cost).sum).min
  def maxScore: Float = w
}
