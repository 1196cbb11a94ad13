package graft.search

import graft.index.PostingsCodec.PostingsIterator

/** Positional phrase matching over the segment path — the ExactPhrase /
  * SloppyPhrase scorers of the reference
  * (`lucene/core/src/java/org/apache/lucene/search/ExactPhraseScorer.java:27`,
  * `SloppyPhraseScorer.java:32`), running on the positions sidecar of the
  * posting blobs (no re-tokenization at query time).
  */
object PhraseFreq {

  /** Repeat groups for a multi-phrase's per-offset member sets —
    * (rptGroup, hasMultiTermRpts). rptGroup(i) = group id of offset i (-1
    * when none); null when no term repeats across offsets. Groups connect
    * offsets through shared repeating terms (union-find over the
    * term↔offset bipartite graph — `SloppyPhraseScorer.java:336-356`
    * gatherRptGroups + unionTermGroups); hasMultiTermRpts is true when a
    * repeating offset has >1 member (`SloppyPhraseScorer.java:459-470`).
    */
  def multiPhraseRptGroups(ps: Seq[Seq[String]]): (Array[Int], Boolean) = {
    val memberSets = ps.map(_.distinct)
    val rptTerms = memberSets.flatten.groupBy(identity)
      .filter(_._2.size >= 2).keySet
    if (rptTerms.isEmpty) return (null, false)
    val multiTerm = memberSets.exists(ms =>
      ms.size > 1 && ms.exists(rptTerms.contains))
    val tSeq = rptTerms.toSeq.sorted
    val parent = Array.tabulate(tSeq.length)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    memberSets.foreach { ms =>
      val in = ms.filter(rptTerms.contains).map(tSeq.indexOf)
      in.sliding(2).foreach {
        case Seq(a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        case _ => ()
      }
    }
    val byOffset = memberSets.map { ms =>
      val in = ms.filter(rptTerms.contains)
      if (in.isEmpty) -1 else find(tSeq.indexOf(in.head))
    }
    // normalize group ids to the first offset carrying them
    (byOffset.map(g => if (g < 0) -1 else byOffset.indexOf(g)).toArray,
      multiTerm)
  }

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
    * repeating-pp machinery (`SloppyPhraseScorer.java:148-200,
    * advanceRepeatGroups/collide/lesser`). Doc init:
    *
    *  - single-term groups (`multiTerm = false`): the j-th group member
    *    (offset order) advances j occurrences — the exact advance count is
    *    known because members share ONE positions stream
    *    (`SloppyPhraseScorer.java:311-318`).
    *  - multi-term groups (`multiTerm = true`, the hasMultiTermRpts case —
    *    an offset's UNION stream shares a term with another offset):
    *    the advance count is data-dependent, so init resolves collisions
    *    directly — while a group member shares a RAW token with another,
    *    advance the lesser (adjusted position, then offset), restarting
    *    the scan when an earlier member moved
    *    (`SloppyPhraseScorer.java:292-310`).
    *
    * During the sweep both cases resolve a collision (two group members on
    * the same RAW token) by advancing the lesser.
    */
  def sloppy(positions: Array[Array[Int]], offsets: Array[Int],
      slop: Int, rptGroup: Array[Int] = null,
      multiTerm: Boolean = false): Float = {
    val n = positions.length
    val idx = new Array[Int](n)
    val cur = new Array[Int](n) // adjusted position of each pp
    val inQ = new Array[Boolean](n)
    var end = Int.MinValue
    // placeFirstPositions
    var i = 0
    while (i < n) {
      if (positions(i).isEmpty) return 0f
      idx(i) = 0
      cur(i) = positions(i)(0) - offsets(i)
      i += 1
    }
    // advancePP/collide/lesser shared by init (multi-term) and the sweep
    def advancePPEarly(p: Int): Boolean = {
      idx(p) += 1
      if (idx(p) >= positions(p).length) return false
      cur(p) = positions(p)(idx(p)) - offsets(p)
      if (cur(p) > end) end = cur(p)
      true
    }
    def collideWith(q: Int): Int = {
      val raw = cur(q) + offsets(q)
      var j = 0
      while (j < n) {
        if (j != q && rptGroup(j) == rptGroup(q) &&
            cur(j) + offsets(j) == raw) return j
        j += 1
      }
      -1
    }
    def lesserOf(a: Int, b: Int): Int =
      if (cur(a) < cur(b) || (cur(a) == cur(b) && offsets(a) < offsets(b))) a
      else b
    // doc init (advanceRepeatGroups)
    if (rptGroup != null) {
      if (!multiTerm) {
        // j-th member of each repeat group starts at its j-th occurrence —
        // members in offset order, which is ascending pp index here
        i = 0
        while (i < n) {
          if (rptGroup(i) >= 0) {
            var steps = 0
            var j = 0
            while (j < i) {
              if (rptGroup(j) == rptGroup(i)) steps += 1
              j += 1
            }
            while (steps > 0) {
              if (!advancePPEarly(i)) return 0f // PPs exhausted at init
              steps -= 1
            }
          }
          i += 1
        }
      } else {
        // multi-term: resolve collisions member-by-member, restarting when
        // an earlier member advanced (SloppyPhraseScorer.java:292-310)
        val groupIds = rptGroup.filter(_ >= 0).distinct.sorted
        var gi = 0
        while (gi < groupIds.length) {
          val rg = (0 until n).filter(rptGroup(_) == groupIds(gi)).toArray
          var ri = 0
          while (ri < rg.length) {
            var incr = 1
            val pp = rg(ri) // FIXED inside the collision loop: the
            // reference re-collides from rg[i] each iteration and only
            // ADVANCES lesser(pp, rg[k]) (SloppyPhraseScorer.java:292-310)
            var k = collideWith(pp)
            var stop = false
            while (k >= 0 && !stop) {
              val adv = lesserOf(pp, k)
              if (!advancePPEarly(adv)) return 0f // PPs exhausted
              val ind = rg.indexOf(adv)
              if (ind >= 0 && ind < ri) { incr = 0; stop = true }
              else k = collideWith(pp)
            }
            ri += incr
          }
          gi += 1
        }
      }
    }
    // fillQueue
    i = 0
    while (i < n) {
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
    // resolve repeat collisions after advancing `pp0` (advanceRpts/
    // collide/lesser): two group members on the same raw token → advance
    // the lesser; false at exhaustion
    def advanceRpts(pp0: Int): Boolean = {
      if (rptGroup == null || rptGroup(pp0) < 0) return true
      var p = pp0
      var k = collideWith(p)
      while (k >= 0) {
        p = lesserOf(p, k)
        if (!advancePPEarly(p)) return false
        k = collideWith(p)
      }
      true
    }

    var freq = 0f
    var pp = minIdx(); inQ(pp) = false
    var matchLength = end - cur(pp)
    var next = cur(minIdx())
    var exhausted = false
    while (!exhausted) {
      if (!advancePPEarly(pp) || !advanceRpts(pp)) exhausted = true
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

  /** Ordered span-near frequency for ONE doc, single-term (width-1)
    * clauses (`search/spans/NearSpansOrdered.java`): matches enumerate by
    * advancing clause 0 one position at a time; stretchToOrder advances
    * each later clause MONOTONICALLY to its first position ≥ the previous
    * clause's end; total gap ≤ slop is a match contributing
    * 1/(1+gap) (the spans SimScorer slop factor over Spans.width()).
    * Because later pointers only move forward, the enumeration equals an
    * independent per-first-position minimum — the law the SQL oracle
    * replicates. Accumulates in double, rounds to float at the boundary.
    */
  def spanNearOrdered(positions: Array[Array[Int]], slop: Int): Float = {
    val n = positions.length
    val idx = new Array[Int](n)
    var freq = 0.0
    var exhausted = false
    var i0 = 0
    while (i0 < positions(0).length && !exhausted) {
      var prevEnd = positions(0)(i0) + 1
      var width = 0
      var k = 1
      var ok = true
      while (k < n && ok) {
        val pk = positions(k)
        while (idx(k) < pk.length && pk(idx(k)) < prevEnd) idx(k) += 1
        if (idx(k) >= pk.length) { ok = false; exhausted = true }
        else {
          width += pk(idx(k)) - prevEnd
          prevEnd = pk(idx(k)) + 1
        }
        k += 1
      }
      if (ok && width <= slop) freq += 1.0 / (1 + width)
      i0 += 1
    }
    freq.toFloat
  }

  /** Unordered span-near frequency (`search/spans/NearSpansUnordered
    * .java`): walk all clause position lists by repeatedly advancing the
    * clause with the smallest current position (tie: lowest clause
    * index); each visited state with
    * width = (max+1) − min − n ≤ slop is a match contributing
    * 1/(1+max(width,0)) (width clamped — overlapping same-term clauses
    * would otherwise divide by zero).
    */
  def spanNearUnordered(positions: Array[Array[Int]], slop: Int): Float = {
    val n = positions.length
    val idx = new Array[Int](n)
    var freq = 0.0
    var done = false
    while (!done) {
      var minK = 0
      var minPos = Int.MaxValue
      var maxPos = Int.MinValue
      var k = 0
      while (k < n) {
        val p = positions(k)(idx(k))
        if (p < minPos) { minPos = p; minK = k }
        if (p > maxPos) maxPos = p
        k += 1
      }
      val width = (maxPos + 1) - minPos - n
      if (width <= slop) freq += 1.0 / (1 + math.max(width, 0))
      idx(minK) += 1
      if (idx(minK) >= positions(minK).length) done = true
    }
    freq.toFloat
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
  *
  * `rptGroup`/`multiTerm`: repeat groups over offsets sharing a term
  * (union-find on the term↔offset bipartite graph — the hasMultiTermRpts
  * machinery, `SloppyPhraseScorer.java:336-356,410-427`); null when no
  * term repeats across offsets.
  */
final class MultiPhraseScorer(members: Array[Array[PostingsIterator]],
    offsets: Array[Int], slop: Int, w: Float, cache: Array[Float],
    rptGroup: Array[Int] = null, multiTerm: Boolean = false)
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
        else PhraseFreq.sloppy(pos, offsets, slop, rptGroup, multiTerm)
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

/** SpanNearQuery scorer over single-term clauses
  * (`search/spans/SpanNearQuery.java:41`): conjunction on docs (every
  * clause term must appear), then span enumeration over the positions
  * sidecar via PhraseFreq.spanNearOrdered/Unordered. Weight = float idf
  * sum over DISTINCT terms in sorted order (SpanWeight collects terms
  * into a TreeSet) × (k1+1).
  */
/** SpanFirst over one term's positions sidecar
  * (`search/spans/SpanFirstQuery.java:30-40`): a doc matches when the
  * term occurs at a position p with p+1 ≤ end; freq = the count of such
  * occurrences (width-0 spans, slop factor 1 each), scored like a term
  * with the restricted freq.
  */
final class SpanFirstScorer(it: PostingsIterator, end: Int, w: Float,
    cache: Array[Float]) extends DocScorer {
  var doc: Long = -1L
  private var freqV = 0f
  private var normB: Byte = 0

  private def qualifying(): Int = {
    val ps = it.positions()
    var n = 0
    var i = 0
    while (i < ps.length && ps(i) + 1 <= end) { n += 1; i += 1 }
    n
  }

  private def settle(t0: Long): Long = {
    if (t0 > it.doc || it.doc == -1L) it.advance(t0)
    while (it.doc != DocScorer.NO_MORE) {
      val n = qualifying()
      if (n > 0) {
        freqV = n.toFloat; normB = it.norm; doc = it.doc
        return doc
      }
      it.nextDoc()
    }
    doc = DocScorer.NO_MORE
    doc
  }

  def nextDoc(): Long = settle(if (doc < 0) 0L else doc + 1)
  def advance(target: Long): Long =
    if (target <= doc) doc else settle(target)
  def score: Float = BM25.score(w, freqV, cache(normB & 0xff))
  def cost: Long = it.cost
  def maxScore: Float = w
}

/** SpanOr over term clauses (`search/spans/SpanOrQuery.java:36`): union
  * of the members' docs; freq = Σ member tf in the doc (each width-0
  * span adds slop factor 1), ONE score per doc with the shared weight.
  * Positions are not consulted — a term span exists per occurrence.
  */
final class SpanOrScorer(its: Array[PostingsIterator], w: Float,
    cache: Array[Float]) extends DocScorer {
  require(its.nonEmpty)
  var doc: Long = -1L
  private var freqV = 0f
  private var normB: Byte = 0

  private def settle(target: Long): Long = {
    var min = DocScorer.NO_MORE
    var i = 0
    while (i < its.length) {
      if (its(i).doc < target && its(i).doc != DocScorer.NO_MORE)
        its(i).advance(target)
      if (its(i).doc < min) min = its(i).doc
      i += 1
    }
    if (min == DocScorer.NO_MORE) { doc = min; return doc }
    var f = 0f
    i = 0
    while (i < its.length) {
      if (its(i).doc == min) {
        f += its(i).tf.toFloat
        normB = its(i).norm
      }
      i += 1
    }
    freqV = f
    doc = min
    doc
  }

  def nextDoc(): Long = settle(if (doc < 0) 0L else doc + 1)
  def advance(target: Long): Long =
    if (target <= doc) doc else settle(target)
  def score: Float = BM25.score(w, freqV, cache(normB & 0xff))
  def cost: Long = its.map(_.cost).sum
  def maxScore: Float = w
}

/** SpanNot over term include/exclude clauses
  * (`search/spans/SpanNotQuery.java:34-37,169-181`): keeps include
  * occurrences with no exclude occurrence within `pre` tokens before or
  * `post` tokens after. For width-0 term spans the reference's window
  * test (exclude.end > include.start - pre AND exclude.start <
  * include.end + post) reduces to: reject p iff ∃ exclude q with
  * p - pre ≤ q ≤ p + post. freq = accepted count; weight comes from the
  * include term only (SpanNotWeight.extractTerms delegates to
  * includeWeight, SpanNotQuery.java:186-189). `exc == null` ⇒ the
  * exclude term is absent from the segment — plain term scoring
  * (ScoringWrapperSpans branch, SpanNotQuery.java:128-130).
  */
final class SpanNotScorer(inc: PostingsIterator, exc: PostingsIterator,
    pre: Int, post: Int, w: Float, cache: Array[Float]) extends DocScorer {
  var doc: Long = -1L
  private var freqV = 0f
  private var normB: Byte = 0

  private def accepted(): Int = {
    if (exc == null) return inc.tf
    if (exc.doc < inc.doc) exc.advance(inc.doc)
    if (exc.doc != inc.doc) return inc.tf
    val ip = inc.positions()
    val ep = exc.positions()
    var n = 0
    var i = 0
    var j = 0
    while (i < ip.length) {
      val p = ip(i)
      while (j < ep.length && ep(j) < p - pre) j += 1
      if (j >= ep.length || ep(j) > p + post) n += 1
      i += 1
    }
    n
  }

  private def settle(t0: Long): Long = {
    if (t0 > inc.doc || inc.doc == -1L) inc.advance(t0)
    while (inc.doc != DocScorer.NO_MORE) {
      val n = accepted()
      if (n > 0) {
        freqV = n.toFloat; normB = inc.norm; doc = inc.doc
        return doc
      }
      inc.nextDoc()
    }
    doc = DocScorer.NO_MORE
    doc
  }

  def nextDoc(): Long = settle(if (doc < 0) 0L else doc + 1)
  def advance(target: Long): Long =
    if (target <= doc) doc else settle(target)
  def score: Float = BM25.score(w, freqV, cache(normB & 0xff))
  def cost: Long = inc.cost
  def maxScore: Float = w
}

/** Span-near over UNION clauses (`spans/SpanNearQuery.java:41` with
  * `SpanOrQuery.java:36` subclauses): clause k's spans in a doc are the
  * union of its members' width-0 occurrences; docs stream from the
  * conjunction-over-clauses of member unions (MultiPhraseScorer's
  * UnionPostingsEnum shape), freq = the SpanNearScorer enumeration over
  * the merged per-clause position arrays. Distinct terms occupy
  * distinct positions, so the per-clause merge needs no dedup — but it
  * dedups anyway to stay safe under analyzer chains that stack terms.
  */
final class SpanNearOrScorer(clauses: Array[Array[PostingsIterator]],
    slop: Int, inOrder: Boolean, w: Float, cache: Array[Float])
    extends DocScorer {
  require(clauses.length >= 2 && clauses.forall(_.nonEmpty))
  var doc: Long = -1L
  private var freqV = 0f
  private var normB: Byte = 0

  /** Min doc ≥ target across the clause's members (union semantics). */
  private def unionAdvance(k: Int, target: Long): Long = {
    var min = DocScorer.NO_MORE
    val its = clauses(k)
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
      var k = 0
      while (k < clauses.length && agreed) {
        val d = unionAdvance(k, target)
        if (d > target) { target = d; agreed = false }
        k += 1
      }
    }
    target
  }

  /** Sorted distinct union of the clause's member positions at `target`. */
  private def mergedPositions(k: Int, target: Long): Array[Int] = {
    val live = clauses(k).filter(_.doc == target)
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
      val pos = new Array[Array[Int]](clauses.length)
      var k = 0
      while (k < clauses.length) { pos(k) = mergedPositions(k, target); k += 1 }
      val f =
        if (inOrder) PhraseFreq.spanNearOrdered(pos, slop)
        else PhraseFreq.spanNearUnordered(pos, slop)
      if (f > 0f) {
        freqV = f
        normB = clauses(0).find(_.doc == target).get.norm
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
  def cost: Long = clauses.map(_.map(_.cost).sum).min
  def maxScore: Float = w
}

final class SpanNearScorer(its: Array[PostingsIterator], slop: Int,
    inOrder: Boolean, w: Float, cache: Array[Float]) extends DocScorer {
  require(its.length >= 2)
  var doc: Long = -1L
  private var freqV = 0f
  private var normB: Byte = 0

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
    if (inOrder) PhraseFreq.spanNearOrdered(pos, slop)
    else PhraseFreq.spanNearUnordered(pos, slop)
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
  def maxScore: Float = w
}
