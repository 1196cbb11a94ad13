package graft.search

import graft.index.PostingsCodec
import graft.index.PostingsCodec.PostingsIterator
import graft.search.SegmentSearcher.SegRow

/** Per-doc interval algebra for composed [[Span]] trees — the
  * reference's spans package (`search/spans/Spans.java`,
  * `NearSpansOrdered.java`, `NearSpansUnordered.java`,
  * `SpanOrQuery.java`, `SpanNotQuery.java`, `SpanFirstQuery.java`)
  * re-expressed over the positions sidecar. Every compiled node yields,
  * for a candidate doc, its matching intervals as (start, end, width)
  * triples in emission order; combinators consume subclause intervals
  * forward-only exactly like the reference's streaming spans (matches a
  * backward pointer would reach are skipped there too). The root's
  * intervals score as freq = Σ 1/(1+width) with width clamped ≥ 0 at
  * emission — the laws the flat single-level scorers already implement
  * and the gate proves; SpansTreeSpec pins this evaluator to them.
  */
object Spans {

  /** One matching interval: token span [start, end) with the slop width
    * its emitting combinator measured (0 for term spans). `pays` is null
    * except under payload collection ([[compile]] collectPays=true): one
    * float per collected term leaf in the reference's SpanCollector
    * visit order (`TermSpans.java:120` leaf → `NearSpansOrdered.java:147`
    * subspans in clause order → `ContainSpans.java:56-58` big then
    * little; Or/Not/First/PosRange pass the underlying span through,
    * FilterSpans.collect). NaN = the leaf had no payload (the
    * reference's null payload).
    */
  final case class Sp(start: Int, end: Int, width: Int,
      pays: Array[Float] = null)

  private val NoSp = Array.empty[Sp]

  /** Concatenate leaf payloads of two collected intervals (null-safe —
    * null only pairs with null outside collect mode, where the result is
    * unused).
    */
  private def catPays(a: Array[Float], b: Array[Float]): Array[Float] =
    if (a == null) b
    else if (b == null) a
    else {
      val out = new Array[Float](a.length + b.length)
      System.arraycopy(a, 0, out, 0, a.length)
      System.arraycopy(b, 0, out, a.length, b.length)
      out
    }

  /** Compiled node: doc-skeleton alignment + per-doc interval eval.
    * `advanceDoc` returns the smallest doc ≥ target where the node's
    * REQUIRED postings align (a necessary condition — positions may
    * still fail); `eval` lazily advances subtree leaves to `doc` and
    * returns the intervals there.
    */
  sealed trait CNode {
    def advanceDoc(target: Long): Long
    def eval(doc: Long): Array[Sp]
    def cost: Long
  }

  private final class CTerm(it: PostingsIterator,
      collectPays: Boolean = false) extends CNode {
    def advanceDoc(target: Long): Long = {
      if (it.doc < target) it.advance(target)
      it.doc
    }
    def eval(doc: Long): Array[Sp] = {
      if (it.doc < doc) it.advance(doc)
      if (it.doc != doc) NoSp
      else {
        val ps = it.positions()
        val pay = if (collectPays) it.payloads() else null
        val out = new Array[Sp](ps.length)
        var i = 0
        while (i < ps.length) {
          out(i) = Sp(ps(i), ps(i) + 1, 0,
            if (pay == null) null else Array(pay(i)))
          i += 1
        }
        out
      }
    }
    def cost: Long = it.cost
  }

  /** Ordered near (`NearSpansOrdered.java`): per first-clause interval
    * in order, stretch later clauses forward (pointers persist within
    * the doc) until start_k ≥ end_{k−1}; width = Σ gaps; emit
    * (firstStart, lastEnd, width) when width ≤ slop. A later clause
    * exhausting ends the doc's enumeration (forward-only, as the
    * reference).
    */
  private final class CNearOrdered(cls: Array[CNode], slop: Int)
      extends CNode {
    def advanceDoc(target0: Long): Long = conjunctionAlign(cls, target0)
    def eval(doc: Long): Array[Sp] = {
      val sub = evalAll(cls, doc)
      if (sub == null) return NoSp
      val idx = new Array[Int](cls.length)
      val out = Array.newBuilder[Sp]
      var exhausted = false
      var i0 = 0
      while (i0 < sub(0).length && !exhausted) {
        var prevEnd = sub(0)(i0).end
        var width = 0
        var k = 1
        var ok = true
        while (k < cls.length && ok) {
          val sk = sub(k)
          while (idx(k) < sk.length && sk(idx(k)).start < prevEnd) idx(k) += 1
          if (idx(k) >= sk.length) { ok = false; exhausted = true }
          else {
            width += sk(idx(k)).start - prevEnd
            prevEnd = sk(idx(k)).end
          }
          k += 1
        }
        if (ok && width <= slop) {
          var pays = sub(0)(i0).pays
          if (pays != null) {
            var j = 1
            while (j < cls.length) { pays = catPays(pays, sub(j)(idx(j)).pays); j += 1 }
          }
          out += Sp(sub(0)(i0).start, prevEnd, width, pays)
        }
        i0 += 1
      }
      out.result()
    }
    def cost: Long = cls.map(_.cost).min
  }

  /** Unordered near (`NearSpansUnordered.java`): walk all clause
    * interval lists by advancing the cell with the least (start, end,
    * clause index); each state with width = maxEnd − minStart − Σlen ≤
    * slop emits (minStart, maxEnd, max(width, 0)) — the same
    * min-advancing law as the flat scorer, generalized from width-1
    * term spans to intervals.
    */
  private final class CNearUnordered(cls: Array[CNode], slop: Int)
      extends CNode {
    def advanceDoc(target0: Long): Long = conjunctionAlign(cls, target0)
    def eval(doc: Long): Array[Sp] = {
      val sub = evalAll(cls, doc)
      if (sub == null) return NoSp
      val idx = new Array[Int](cls.length)
      val out = Array.newBuilder[Sp]
      var done = false
      while (!done) {
        var minK = 0
        var minStart = Int.MaxValue
        var minEnd = Int.MaxValue
        var maxEnd = Int.MinValue
        var totalLen = 0
        var k = 0
        while (k < cls.length) {
          val sp = sub(k)(idx(k))
          if (sp.start < minStart ||
              (sp.start == minStart && sp.end < minEnd)) {
            minStart = sp.start; minEnd = sp.end; minK = k
          }
          if (sp.end > maxEnd) maxEnd = sp.end
          totalLen += sp.end - sp.start
          k += 1
        }
        val width = maxEnd - minStart - totalLen
        if (width <= slop) {
          var pays = sub(0)(idx(0)).pays
          if (pays != null) {
            var j = 1
            while (j < cls.length) { pays = catPays(pays, sub(j)(idx(j)).pays); j += 1 }
          }
          out += Sp(minStart, maxEnd, math.max(width, 0), pays)
        }
        idx(minK) += 1
        if (idx(minK) >= sub(minK).length) done = true
      }
      out.result()
    }
    def cost: Long = cls.map(_.cost).min
  }

  /** Union in (start, end) order, duplicates kept (`SpanOrQuery.java:36`
    * — the by-position queue emits every member interval).
    */
  private final class COr(cls: Array[CNode]) extends CNode {
    def advanceDoc(target: Long): Long = {
      var min = DocScorer.NO_MORE
      var k = 0
      while (k < cls.length) {
        val d = cls(k).advanceDoc(target)
        if (d < min) min = d
        k += 1
      }
      min
    }
    def eval(doc: Long): Array[Sp] = {
      val sub = cls.map(_.eval(doc)).filter(_.nonEmpty)
      if (sub.isEmpty) return NoSp
      if (sub.length == 1) return sub(0)
      val idx = new Array[Int](sub.length)
      var remaining = 0
      sub.foreach(remaining += _.length)
      val out = new Array[Sp](remaining)
      var o = 0
      while (remaining > 0) {
        var best = -1
        var bs = Int.MaxValue
        var be = Int.MaxValue
        var i = 0
        while (i < sub.length) {
          if (idx(i) < sub(i).length) {
            val sp = sub(i)(idx(i))
            if (sp.start < bs || (sp.start == bs && sp.end < be)) {
              bs = sp.start; be = sp.end; best = i
            }
          }
          i += 1
        }
        out(o) = sub(best)(idx(best)); o += 1
        idx(best) += 1
        remaining -= 1
      }
      out
    }
    def cost: Long = cls.map(_.cost).sum
  }

  /** Include intervals with no exclude interval overlapping the
    * [start−pre, end+post) window (`SpanNotQuery.java:34-37`); a
    * None exclude (absent from the segment) vetoes nothing.
    */
  private final class CNot(inc: CNode, exc: Option[CNode], pre: Int,
      post: Int) extends CNode {
    def advanceDoc(target: Long): Long = inc.advanceDoc(target)
    def eval(doc: Long): Array[Sp] = {
      val is = inc.eval(doc)
      if (is.isEmpty) return NoSp
      val es = exc.map(_.eval(doc)).getOrElse(NoSp)
      if (es.isEmpty) return is
      is.filter(sp => !es.exists(e =>
        e.end > sp.start - pre && e.start < sp.end + post))
    }
    def cost: Long = inc.cost
  }

  /** Intervals ending at or before `end` (`SpanFirstQuery.java:30-40`). */
  private final class CFirst(inner: CNode, end: Int) extends CNode {
    def advanceDoc(target: Long): Long = inner.advanceDoc(target)
    def eval(doc: Long): Array[Sp] = inner.eval(doc).filter(_.end <= end)
    def cost: Long = inner.cost
  }

  /** Big intervals containing a little — the reference's FORWARD-ONLY
    * streaming law, transcribed (`SpanContainingQuery.java:80-94`): per
    * big in (start, end) order, advance the little cursor while
    * little.start < big.start; only the CURRENT little is tested
    * (big.end ≥ little.end). A big whose first candidate little is too
    * long is skipped even if a later little would fit — matching the
    * reference exactly, not set-containment. Emits the BIG span
    * (`ContainSpans.width()` reads sourceSpans = big).
    */
  private final class CContaining(big: CNode, little: CNode) extends CNode {
    private val both = Array(big, little)
    def advanceDoc(target: Long): Long = conjunctionAlign(both, target)
    def eval(doc: Long): Array[Sp] = {
      val bs = big.eval(doc)
      if (bs.isEmpty) return NoSp
      val ls = little.eval(doc)
      if (ls.isEmpty) return NoSp
      val out = Array.newBuilder[Sp]
      var li = 0
      var bi = 0
      var exhausted = false
      while (bi < bs.length && !exhausted) {
        while (li < ls.length && ls(li).start < bs(bi).start) li += 1
        if (li >= ls.length) exhausted = true
        else if (bs(bi).end >= ls(li).end) {
          val b = bs(bi)
          // ContainSpans.collect: big's leaves then little's (lines 56-58)
          out += (if (b.pays == null) b
            else Sp(b.start, b.end, b.width, catPays(b.pays, ls(li).pays)))
        }
        bi += 1
      }
      out.result()
    }
    def cost: Long = math.min(big.cost, little.cost)
  }

  /** Little intervals enclosed by a big — forward-only streaming law
    * (`SpanWithinQuery.java:77-92`): per little in order, advance the
    * big cursor while big.end < little.end; only the current big is
    * tested (big.start ≤ little.start). Emits the LITTLE span.
    */
  private final class CWithin(little: CNode, big: CNode) extends CNode {
    private val both = Array(little, big)
    def advanceDoc(target: Long): Long = conjunctionAlign(both, target)
    def eval(doc: Long): Array[Sp] = {
      val ls = little.eval(doc)
      if (ls.isEmpty) return NoSp
      val bs = big.eval(doc)
      if (bs.isEmpty) return NoSp
      val out = Array.newBuilder[Sp]
      var li = 0
      var bi = 0
      var exhausted = false
      while (li < ls.length && !exhausted) {
        while (bi < bs.length && bs(bi).end < ls(li).end) bi += 1
        if (bi >= bs.length) exhausted = true
        else if (bs(bi).start <= ls(li).start) {
          val l = ls(li)
          // shared ContainSpans.collect law: big's leaves first
          out += (if (l.pays == null) l
            else Sp(l.start, l.end, l.width, catPays(bs(bi).pays, l.pays)))
        }
        li += 1
      }
      out.result()
    }
    def cost: Long = math.min(little.cost, big.cost)
  }

  /** Intervals with start ≥ rStart and end ≤ rEnd
    * (`SpanPositionRangeQuery.java:41-48` acceptPosition; a span with
    * start ≥ rEnd yields NO_MORE_IN_CURRENT_DOC — with starts sorted,
    * every later span fails too, so the early stop is a filter).
    */
  private final class CPosRange(inner: CNode, rStart: Int, rEnd: Int)
      extends CNode {
    def advanceDoc(target: Long): Long = inner.advanceDoc(target)
    def eval(doc: Long): Array[Sp] =
      inner.eval(doc).filter(sp => sp.start >= rStart && sp.end <= rEnd)
    def cost: Long = inner.cost
  }

  /** Conjunction doc alignment shared by both near forms. */
  private def conjunctionAlign(cls: Array[CNode], target0: Long): Long = {
    var target = target0
    var agreed = false
    while (!agreed && target != DocScorer.NO_MORE) {
      agreed = true
      var k = 0
      while (k < cls.length && agreed) {
        val d = cls(k).advanceDoc(target)
        if (d > target) { target = d; agreed = false }
        k += 1
      }
    }
    target
  }

  /** All clause evals, or null when any clause has no interval at doc
    * (the conjunction can't match there).
    */
  private def evalAll(cls: Array[CNode], doc: Long): Array[Array[Sp]] = {
    val sub = new Array[Array[Sp]](cls.length)
    var k = 0
    while (k < cls.length) {
      sub(k) = cls(k).eval(doc)
      if (sub(k).isEmpty) return null
      k += 1
    }
    sub
  }

  /** Compile a span tree against the segment's blobs. Returns the root
    * node plus the include-side leaf iterators (norm lookup), or None
    * when a required subtree has no present term (the tree can never
    * match). Iterators are NOT shared across leaves — a term appearing
    * twice gets two independently-positioned streams.
    */
  def compile(root: Span, blobs: Map[String, SegRow],
      collectPays: Boolean = false,
      normLeaf: String => Boolean = _ => true)
      : Option[(CNode, Array[PostingsIterator])] = {
    val incIts = Array.newBuilder[PostingsIterator]
    def leaf(t: String, scoring: Boolean): Option[CNode] =
      blobs.get(t).map { r =>
        val it = PostingsCodec.iterator(r.docBlocks, r.skipData, r.posBlocks,
          r.payBlocks)
        if (!it.hasPositions)
          sys.error("span queries require an index built with positions " +
            "(BuildConfig.positions = true)")
        if (collectPays && !it.hasPayloads)
          sys.error("payload queries require an index built with payloads " +
            "(BuildConfig.payloads = Some(policy))")
        // norm-bearing leaves only (masked spans read norms from the
        // PRIMARY field's leaves — SpanWeight.getSimScorer over
        // query.getField())
        if (scoring && normLeaf(t)) incIts += it
        new CTerm(it, collectPays)
      }
    def go(s: Span, scoring: Boolean): Option[CNode] = s match {
      case Span.Term(t) => leaf(t, scoring)
      case Span.Near(cs, slop, inOrder) =>
        val sub = cs.map(go(_, scoring))
        if (cs.isEmpty || sub.exists(_.isEmpty)) None
        else if (sub.size == 1) sub.head
        else Some(
          if (inOrder) new CNearOrdered(sub.map(_.get).toArray, slop)
          else new CNearUnordered(sub.map(_.get).toArray, slop))
      case Span.Or(cs) =>
        val sub = cs.flatMap(go(_, scoring))
        if (sub.isEmpty) None
        else if (sub.size == 1) Some(sub.head)
        else Some(new COr(sub.toArray))
      case Span.Not(i, e, pre, post) =>
        go(i, scoring).map(ci => new CNot(ci, go(e, scoring = false),
          math.max(pre, 0), math.max(post, 0)))
      case Span.First(i, end) =>
        go(i, scoring).map(new CFirst(_, end))
      case Span.Containing(b, l) =>
        // conjunction: both sides required AND both contribute to the
        // weight (SpanContainWeight folds big's and little's contexts)
        for (cb <- go(b, scoring); cl <- go(l, scoring))
          yield new CContaining(cb, cl)
      case Span.Within(l, b) =>
        for (cl <- go(l, scoring); cb <- go(b, scoring))
          yield new CWithin(cl, cb)
      case Span.PosRange(i, s0, e0) =>
        go(i, scoring).map(new CPosRange(_, s0, e0))
      case Span.Multi(inner) =>
        sys.error(s"unexpanded Span.Multi($inner) reached the span " +
          "evaluator — expandMultiTerm must run before compile")
      case m: Span.FieldMasked =>
        sys.error(s"unresolved $m reached the span evaluator — masked " +
          "spans run through MultiField.searchMaskedSpan, which rebinds " +
          "masked leaves before compile")
    }
    go(root, scoring = true).map(c => (c, incIts.result()))
  }

  /** Whether the compiled tree's doc stream is already restricted to
    * the current shard (some salted postings bound it) — generalizes
    * the flat scorers' salt checks: a conjunction is restricted when
    * ANY clause is, a union only when ALL members are.
    */
  def shardRestricted(root: Span, blobs: Map[String, SegRow]): Boolean = {
    def go(s: Span): Boolean = s match {
      case Span.Term(t) => blobs.get(t).exists(_.salt >= 0)
      case Span.Near(cs, _, _) => cs.exists(go)
      case Span.Or(cs) => cs.nonEmpty && {
        // absent members contribute no docs — only present ones bound
        val present = cs.filter(c =>
          Span.allTerms(c).exists(blobs.contains))
        present.nonEmpty && present.forall(go)
      }
      case Span.Not(i, _, _, _) => go(i)
      case Span.First(i, _) => go(i)
      // conjunctions: restricted when EITHER side is
      case Span.Containing(b, l) => go(b) || go(l)
      case Span.Within(l, b) => go(l) || go(b)
      case Span.PosRange(i, _, _) => go(i)
      case Span.Multi(_) => false
      case Span.FieldMasked(_, i) => go(i)
    }
    go(root)
  }
}

/** DocScorer over a compiled span tree: skeleton-align candidate docs,
  * evaluate root intervals, freq = Σ 1/(1+width) in double rounded to
  * float at the boundary (`SpanScorer.java setFreqCurrentDoc`), scored
  * as one pseudo-term with the tree's fold weight.
  */
final class SpanTreeScorer(root: Spans.CNode,
    incIts: Array[PostingsIterator], w: Float, cache: Array[Float])
    extends DocScorer {
  var doc: Long = -1L
  private var freqV = 0f
  private var normB: Byte = 0

  private def settle(t0: Long): Long = {
    var target = root.advanceDoc(t0)
    while (target != DocScorer.NO_MORE) {
      val spans = root.eval(target)
      if (spans.nonEmpty) {
        var f = 0d
        spans.foreach(sp => f += 1.0 / (1 + sp.width))
        freqV = f.toFloat
        var i = 0
        while (incIts(i).doc != target) i += 1
        normB = incIts(i).norm
        doc = target
        return doc
      }
      target = root.advanceDoc(target + 1)
    }
    doc = DocScorer.NO_MORE
    doc
  }

  def nextDoc(): Long = settle(if (doc < 0) 0L else doc + 1)
  def advance(target: Long): Long =
    if (target <= doc) doc else settle(target)
  def score: Float = BM25.score(w, freqV, cache(normB & 0xff))
  def cost: Long = root.cost
  def maxScore: Float = w
}

object PayloadFns {
  /** PayloadFunction selectors (`queries/payloads/MinPayloadFunction.java`,
    * `MaxPayloadFunction.java`, `AveragePayloadFunction.java`).
    */
  val Min = 0
  val Max = 1
  val Avg = 2

  def of(name: String): Int = name match {
    case "min" => Min
    case "max" => Max
    case "avg" => Avg
    case other => sys.error(s"unknown payload function: $other (min|max|avg)")
  }
}

/** PayloadScoreQuery scorer (`queries/payloads/PayloadScoreQuery.java`):
  * per candidate doc, enumerate the wrapped span tree's intervals
  * (compiled with payload collection on); every collected leaf payload
  * folds through the payload function in collection order — a NaN
  * payload (absent) is SKIPPED, the reference's `payload == null` check
  * in PayloadSpans.collectLeaf (line 203). Doc score =
  * spanScore × fn.docScore (includeSpanScore, `PayloadSpanScorer
  * .scoreCurrentDoc`) or fn.docScore alone (where boost has no effect,
  * like the reference — the sim score is simply not used). Zero
  * payloads seen → docScore = 1.
  */
final class PayloadScoreScorer(root: Spans.CNode,
    incIts: Array[PostingsIterator], w: Float, cache: Array[Float],
    fn: Int, includeSpanScore: Boolean) extends DocScorer {
  var doc: Long = -1L
  private var freqV = 0f
  private var normB: Byte = 0
  private var payV = 1f

  private def settle(t0: Long): Long = {
    var target = root.advanceDoc(t0)
    while (target != DocScorer.NO_MORE) {
      val spans = root.eval(target)
      if (spans.nonEmpty) {
        var f = 0d
        var paySeen = 0
        var payScore = 0f
        spans.foreach { sp =>
          f += 1.0 / (1 + sp.width)
          val ps = sp.pays
          var i = 0
          while (i < ps.length) {
            val p = ps(i)
            if (PostingsCodec.hasPayload(p)) {
              // currentScore(numSeen, accumulated, NEW) per function
              payScore = fn match {
                case PayloadFns.Min =>
                  if (paySeen == 0) p else math.min(p, payScore)
                case PayloadFns.Max =>
                  if (paySeen == 0) p else math.max(p, payScore)
                case _ => payScore + p
              }
              paySeen += 1
            }
            i += 1
          }
        }
        freqV = f.toFloat
        payV =
          if (paySeen == 0) 1f
          else if (fn == PayloadFns.Avg) payScore / paySeen
          else payScore
        var i = 0
        while (incIts(i).doc != target) i += 1
        normB = incIts(i).norm
        doc = target
        return doc
      }
      target = root.advanceDoc(target + 1)
    }
    doc = DocScorer.NO_MORE
    doc
  }

  def nextDoc(): Long = settle(if (doc < 0) 0L else doc + 1)
  def advance(target: Long): Long =
    if (target <= doc) doc else settle(target)
  def score: Float =
    if (includeSpanScore) BM25.score(w, freqV, cache(normB & 0xff)) * payV
    else payV
  def cost: Long = root.cost
  // payloads are unbounded floats — no usable max; callers must not WAND
  def maxScore: Float = Float.PositiveInfinity
}

/** SpanPayloadCheckQuery scorer (`queries/payloads/SpanPayloadCheckQuery
  * .java:127-152` PayloadChecker): keep only spans whose collected leaf
  * payload sequence EQUALS the expected list — entry-wise in collection
  * order, same length, where an expected NaN matches exactly an absent
  * payload (the reference's null-matches-null branch) and values compare
  * by their canonical float bits (bytesEquals on the 4-byte encoding).
  * Surviving spans score like a plain span tree (FilterSpans + SpanScorer:
  * freq = Σ 1/(1+width) over accepted spans).
  */
final class SpanPayloadCheckScorer(root: Spans.CNode,
    incIts: Array[PostingsIterator], w: Float, cache: Array[Float],
    expected: Array[Float]) extends DocScorer {
  var doc: Long = -1L
  private var freqV = 0f
  private var normB: Byte = 0

  private def accepts(sp: Spans.Sp): Boolean = {
    val ps = sp.pays
    if (ps.length != expected.length) return false
    var i = 0
    while (i < ps.length) {
      if (java.lang.Float.floatToIntBits(ps(i)) !=
          java.lang.Float.floatToIntBits(expected(i))) return false
      i += 1
    }
    true
  }

  private def settle(t0: Long): Long = {
    var target = root.advanceDoc(t0)
    while (target != DocScorer.NO_MORE) {
      val spans = root.eval(target)
      var f = 0d
      var any = false
      spans.foreach { sp =>
        if (accepts(sp)) { f += 1.0 / (1 + sp.width); any = true }
      }
      if (any) {
        freqV = f.toFloat
        var i = 0
        while (incIts(i).doc != target) i += 1
        normB = incIts(i).norm
        doc = target
        return doc
      }
      target = root.advanceDoc(target + 1)
    }
    doc = DocScorer.NO_MORE
    doc
  }

  def nextDoc(): Long = settle(if (doc < 0) 0L else doc + 1)
  def advance(target: Long): Long =
    if (target <= doc) doc else settle(target)
  def score: Float = BM25.score(w, freqV, cache(normB & 0xff))
  def cost: Long = root.cost
  def maxScore: Float = w
}
