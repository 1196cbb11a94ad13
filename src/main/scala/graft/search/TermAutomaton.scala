package graft.search

import graft.index.PostingsCodec.PostingsIterator

/** TermAutomatonQuery (`lucene/sandbox/src/java/org/apache/lucene/search/
  * TermAutomatonQuery.java:68`): a proximity query expressed as an
  * automaton whose transitions are TERMS — the generalization of
  * PhraseQuery / MultiPhraseQuery / SpanNearQuery the reference ships in
  * its sandbox. Build with [[TermAutomatonBuilder]]
  * (createState/setAccept/addTransition/addAnyTransition/finish — the
  * reference's exact surface, TermAutomatonQuery.java:82-120), then run
  * via [[TermAutomatonQ]].
  *
  * Semantics re-derived from `TermAutomatonScorer.countMatches`
  * (TermAutomatonScorer.java:227-345):
  *   - the query acts as a DISJUNCTION over its terms (docs containing
  *     any term are candidates), then per doc the automaton is run over
  *     the merged position stream;
  *   - each term token at position p steps every live state at p into
  *     p+1 (`pos` is the state the token LEAVES from) and additionally
  *     tries to START a new match from the DFA start state;
  *   - `freq` counts every step that LANDS on an accept state — per
  *     state-instance, so converging paths count multiply (PosState.add
  *     keeps a multiset, TermAutomatonScorer.java:381-386);
  *   - ANY transitions (addAnyTransition) are expanded pre-determinize
  *     to match EVERY known term id plus the ANY symbol itself
  *     (TermAutomatonQuery.java:155-180), and between consecutive query
  *     tokens the live states advance through the position gap via
  *     ANY-symbol steps, petering out at the first empty position past
  *     the gap start (TermAutomatonScorer.java:266-292). A consequence
  *     the spec pins: a query-term token both term-steps AND (when the
  *     next token triggers the gap walk) ANY-steps from its position, so
  *     a state with an ANY arc forks duplicate instances — faithful to
  *     the reference, which never dedupes PosState entries.
  *
  * The automaton must not lead with ANY (no ANY arc out of state 0) and
  * must not end with ANY (no ANY arc into an accept state) — the
  * reference's IllegalStateException laws (TermAutomatonQuery.java:
  * 134-151). Matches can therefore only start and end on term steps.
  *
  * Scale: evaluation is per-doc local (positions sidecar, one pass over
  * the doc's merged positions with live-state sets bounded by the DFA
  * size × local fork factor) — the operator distributes exactly like the
  * span tree scorers: shard tasks run the same DocScorer over their
  * shard's postings, partial top-k merge via the usual treeReduce.
  */
final case class TermAutomaton(
    terms: Array[String], // termID -> term text, dense 0..n-1
    numStates: Int, // DFA states, 0 = start
    accept: Array[Boolean], // per DFA state
    table: Array[Int], // (state × (n+1)) -> next state or -1; col n = ANY
    hasAny: Boolean) {
  def numSyms: Int = terms.length + 1
  @inline def step(state: Int, sym: Int): Int = table(state * numSyms + sym)
  @inline def anySym: Int = terms.length
  override def toString: String =
    s"TermAutomaton(${terms.mkString(",")}, $numStates states)"
}

/** Builder mirroring the reference surface. States are NFA states until
  * [[finish]] runs the subset construction (the reference delegates to
  * `Operations.determinize`; this builder re-derives the standard
  * construction directly — the same approach LevAutomaton.scala uses for
  * the Levenshtein DFA).
  */
final class TermAutomatonBuilder {
  private val termToId = scala.collection.mutable.LinkedHashMap.empty[String, Int]
  private var nStates = 0
  private val acceptSet = scala.collection.mutable.BitSet.empty
  // (src, sym, dst); sym == -1 is ANY until finish assigns it an id
  private val arcs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
  private var anyUsed = false

  def createState(): Int = { nStates += 1; nStates - 1 }

  def setAccept(state: Int, accept: Boolean): Unit = {
    require(state >= 0 && state < nStates, s"no such state: $state")
    if (accept) acceptSet += state else acceptSet -= state
  }

  def addTransition(source: Int, dest: Int, term: String): Unit = {
    require(source >= 0 && source < nStates && dest >= 0 && dest < nStates,
      s"no such state: $source -> $dest")
    require(term != null && term.nonEmpty, "empty term")
    val id = termToId.getOrElseUpdate(term, termToId.size)
    arcs += ((source, id, dest))
  }

  /** ANY transition: matches every token (TermAutomatonQuery.java:105). */
  def addAnyTransition(source: Int, dest: Int): Unit = {
    require(source >= 0 && source < nStates && dest >= 0 && dest < nStates,
      s"no such state: $source -> $dest")
    anyUsed = true
    arcs += ((source, -1, dest))
  }

  /** Determinize. The reference's leading/trailing-ANY laws
    * (TermAutomatonQuery.java:134-151) are enforced on the NFA.
    */
  def finish(): TermAutomaton = {
    require(nStates > 0, "automaton has no states (createState first)")
    val n = termToId.size
    require(n > 0, "automaton has no term transitions")
    arcs.foreach { case (src, sym, dst) =>
      if (sym == -1) {
        require(src != 0, "automaton cannot lead with an ANY transition")
        require(!acceptSet.contains(dst),
          "automaton cannot end with an ANY transition")
      }
    }
    val anySymId = n // symbol ids: 0..n-1 real terms, n = ANY
    // NFA adjacency: per source state, list of (sym, dst) with ANY
    // expanded to every symbol (the reference's [0, termCount-1]
    // interval rewrite, TermAutomatonQuery.java:155-180)
    val adj = Array.fill(nStates)(
      scala.collection.mutable.ArrayBuffer.empty[(Int, Int)])
    arcs.foreach { case (src, sym, dst) =>
      if (sym >= 0) adj(src) += ((sym, dst))
      else {
        var s = 0
        while (s <= anySymId) { adj(src) += ((s, dst)); s += 1 }
      }
    }
    // subset construction over symbols 0..n (inclusive = ANY)
    val dfaStates = scala.collection.mutable.ArrayBuffer.empty[Set[Int]]
    val index = scala.collection.mutable.HashMap.empty[Set[Int], Int]
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    def stateOf(set: Set[Int]): Int = index.getOrElseUpdate(set, {
      dfaStates += set
      rows += null
      dfaStates.size - 1
    })
    val start = stateOf(Set(0))
    var i = 0
    while (i < dfaStates.size) {
      val cur = dfaStates(i)
      val row = Array.fill(n + 1)(-1)
      var sym = 0
      while (sym <= n) {
        var next = Set.empty[Int]
        cur.foreach { s =>
          adj(s).foreach { case (a, d) => if (a == sym) next += d }
        }
        row(sym) = if (next.isEmpty) -1 else stateOf(next)
        sym += 1
      }
      rows(i) = row
      i += 1
    }
    val numDfa = dfaStates.size
    val accept = new Array[Boolean](numDfa)
    var j = 0
    while (j < numDfa) {
      accept(j) = dfaStates(j).exists(acceptSet.contains)
      j += 1
    }
    val table = new Array[Int](numDfa * (n + 1))
    j = 0
    while (j < numDfa) {
      System.arraycopy(rows(j), 0, table, j * (n + 1), n + 1)
      j += 1
    }
    require(start == 0, "subset construction must seed state 0 first")
    TermAutomaton(termToId.keys.toArray, numDfa, accept, table, anyUsed)
  }
}

object TermAutomaton {

  /** The countMatches law (TermAutomatonScorer.java:227-345) over one
    * doc's merged (position, termId) stream, sorted by position (ties in
    * any order — same-position tokens read the same live set and write
    * the next, so tie order is immaterial; the reference's position
    * queue guarantees no more). Returns the accept-landing count.
    *
    * `live` maps position -> multiset of DFA states (ArrayBuffer —
    * duplicates kept like PosState.add, TermAutomatonScorer.java:381).
    */
  def countFreq(ta: TermAutomaton, pos: Array[Int], sym: Array[Int]): Int = {
    var freq = 0
    val live = scala.collection.mutable.HashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[Int]]
    def at(p: Int): scala.collection.mutable.ArrayBuffer[Int] =
      live.getOrElse(p, null)
    def add(p: Int, s: Int): Unit =
      live.getOrElseUpdate(p, scala.collection.mutable.ArrayBuffer.empty[Int]) += s
    var lastPos = -1
    var i = 0
    while (i < pos.length) {
      val p = pos(i)
      val t = sym(i)
      // gap walk: advance live states from lastPos (the previous token's
      // own position — it forks via ANY too) up to p via ANY steps,
      // petering out at the first empty position past the walk start
      if (lastPos != -1 && ta.hasAny && lastPos < p) {
        val startLastPos = lastPos
        var q = lastPos
        var done = false
        while (q < p && !done) {
          val states = at(q)
          if ((states == null || states.isEmpty) && q > startLastPos) {
            done = true // petered out (TermAutomatonScorer.java:270-274)
          } else {
            if (states != null) {
              var k = 0
              val cnt = states.length // states added to q+1, not q — safe
              while (k < cnt) {
                val ns = ta.step(states(k), ta.anySym)
                if (ns != -1) add(q + 1, ns)
                k += 1
              }
            }
            q += 1
          }
        }
      }
      // term step: every live state at p consumes this token (same-
      // position tokens re-read the same live set — tie order immaterial)
      val states = at(p)
      if (states != null) {
        var k = 0
        val cnt = states.length
        while (k < cnt) {
          val ns = ta.step(states(k), t)
          if (ns != -1) {
            add(p + 1, ns)
            if (ta.accept(ns)) freq += 1
          }
          k += 1
        }
      }
      // start a new match from this token (TermAutomatonScorer.java:321)
      val s0 = ta.step(0, t)
      if (s0 != -1) {
        add(p + 1, s0)
        if (ta.accept(s0)) freq += 1
      }
      lastPos = p
      i += 1
    }
    freq
  }
}

/** Doc-at-a-time scorer: disjunction over the automaton's present terms
  * (the reference visits any doc having any term,
  * TermAutomatonQuery.java:61-64), per-doc merged-position DP, freq > 0
  * docs scored BM25 with tf = freq and the doc's field norm
  * (`docScorer.score(docID, freq)`, TermAutomatonScorer.java:363-366).
  * `its(i)` is the posting iterator for term id `ids(i)`.
  */
final class TermAutomatonScorer(ta: TermAutomaton,
    its: Array[PostingsIterator], ids: Array[Int], w: Float,
    cache: Array[Float]) extends DocScorer {
  require(its.nonEmpty)
  var doc: Long = -1L
  private var freqV = 0f
  private var normB: Byte = 0
  // scratch for the per-doc merged stream
  private var mPos = new Array[Int](16)
  private var mSym = new Array[Int](16)

  private def settle(target0: Long): Long = {
    var target = target0
    while (true) {
      var min = DocScorer.NO_MORE
      var i = 0
      while (i < its.length) {
        if (its(i).doc < target && its(i).doc != DocScorer.NO_MORE)
          its(i).advance(target)
        if (its(i).doc < min) min = its(i).doc
        i += 1
      }
      if (min == DocScorer.NO_MORE) { doc = min; return doc }
      // merge this doc's (pos, termId) pairs
      var cnt = 0
      i = 0
      while (i < its.length) {
        if (its(i).doc == min) {
          normB = its(i).norm
          val ps = its(i).positions()
          if (cnt + ps.length > mPos.length) {
            val ncap = math.max(mPos.length * 2, cnt + ps.length)
            mPos = java.util.Arrays.copyOf(mPos, ncap)
            mSym = java.util.Arrays.copyOf(mSym, ncap)
          }
          var k = 0
          while (k < ps.length) {
            mPos(cnt) = ps(k); mSym(cnt) = ids(i); cnt += 1; k += 1
          }
        }
        i += 1
      }
      // sort by position (insertion sort on the merged tail — lists are
      // already sorted per term, counts are small per doc)
      var a = 1
      while (a < cnt) {
        val vp = mPos(a); val vs = mSym(a)
        var b = a - 1
        while (b >= 0 && mPos(b) > vp) {
          mPos(b + 1) = mPos(b); mSym(b + 1) = mSym(b); b -= 1
        }
        mPos(b + 1) = vp; mSym(b + 1) = vs
        a += 1
      }
      val f = TermAutomaton.countFreq(ta,
        java.util.Arrays.copyOf(mPos, cnt), java.util.Arrays.copyOf(mSym, cnt))
      if (f > 0) {
        freqV = f.toFloat
        doc = min
        return doc
      }
      target = min + 1
    }
    doc
  }

  def nextDoc(): Long = settle(if (doc < 0) 0L else doc + 1)
  def advance(target: Long): Long =
    if (target <= doc) doc else settle(target)
  def score: Float = BM25.score(w, freqV, cache(normB & 0xff))
  def cost: Long = its.map(_.cost).sum
  def maxScore: Float = w
}
