package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.PostingsCodec
import graft.search.PhraseFreq
import graft.search.{BM25, DataFrameSearcher, Searcher, SegmentSearcher, SpanFirstQ, SpanNearOrQ, SpanNearQ, SpanNotQ, SpanOrQ}

/** Positions codec round-trip + phrase-frequency semantics vs brute force.
  * Sloppy expectations follow the reference's greedy sweep
  * (`SloppyPhraseScorer.java:92-126`), validated two ways: hand-traced
  * examples and an independent run-boundary formulation for 2-term
  * phrases (each queue crossing emits one candidate match whose length is
  * the gap across the crossing).
  */
class PhraseSpec extends AnyFunSuite {

  // ---------- positions codec ----------

  test("positions round-trip (block boundaries, random tfs)") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 127, 128, 129, 300, 1000)) {
      val docs = Array.tabulate(n)(i => i.toLong * 3 + (i % 2))
      val tfs = Array.tabulate(n)(_ => 1 + rnd.nextInt(5))
      val norms = Array.tabulate(n)(i => (i % 250).toByte)
      val positions = Array.tabulate(n) { i =>
        var p = rnd.nextInt(4)
        Array.fill(tfs(i)) { val v = p; p += 1 + rnd.nextInt(9); v }
      }
      val (body, skip) = PostingsCodec.encode(docs, tfs, norms)
      val posBlob = PostingsCodec.encodePositions(positions)
      val dec = PostingsCodec.decodePositions(posBlob, tfs)
      assert(dec.map(_.toSeq).toSeq === positions.map(_.toSeq).toSeq)
      // iterator-side lazy per-block decode agrees, incl. after advance
      val it = PostingsCodec.iterator(body, skip, posBlob)
      var i = 0
      while (it.nextDoc()) {
        assert(it.positions().toSeq === positions(i).toSeq, s"doc $i")
        i += 1
      }
      val it2 = PostingsCodec.iterator(body, skip, posBlob)
      val probe = Seq(n / 3, n / 2, n - 1).map(docs)
      probe.foreach { d =>
        it2.advance(d)
        val idx = docs.indexOf(it2.doc)
        assert(it2.positions().toSeq === positions(idx).toSeq)
      }
    }
  }

  // ---------- exact freq ----------

  private def tokensToPositions(tokens: Array[String],
      terms: Seq[String]): Option[Array[Array[Int]]] = {
    val arrs = terms.map(t => tokens.indices.filter(tokens(_) == t).toArray)
    if (arrs.exists(_.isEmpty)) None else Some(arrs.toArray)
  }

  private def bruteExact(tokens: Array[String], terms: Seq[String]): Int =
    (0 to tokens.length - terms.length).count(p =>
      terms.indices.forall(i => tokens(p + i) == terms(i)))

  test("exact freq == brute-force scan (random corpora, incl. repeats)") {
    val rnd = new scala.util.Random(11)
    val alphabet = Array("a", "b", "c", "d")
    for (_ <- 1 to 300) {
      val tokens = Array.fill(3 + rnd.nextInt(40))(alphabet(rnd.nextInt(4)))
      val len = 2 + rnd.nextInt(2)
      val terms = Seq.fill(len)(alphabet(rnd.nextInt(4)))
      tokensToPositions(tokens, terms).foreach { pos =>
        val got = PhraseFreq.exact(pos, terms.indices.toArray)
        assert(got === bruteExact(tokens, terms),
          s"tokens=${tokens.mkString(" ")} terms=$terms")
      }
    }
  }

  // ---------- sloppy freq ----------

  /** Independent 2-term check: two-pointer CYCLE simulation. Each sweep
    * cycle pops the lesser stream P (tie → lower offset), minimizes the
    * match length while P ≤ other.current, and emits exactly one candidate
    * match with gap = other.current − (largest P element ≤ other.current);
    * the sweep ends when a stream exhausts (its final cycle still emits).
    * This is the closed form of SloppyPhraseScorer's loop for 2 streams
    * (end == max(curA, curB) because both streams only move forward).
    * `a`/`b` are RAW positions; b is adjusted by its offset (1).
    */
  private def sloppy2Cycles(aRaw: Array[Int], bRaw: Array[Int], slop: Int): Float = {
    val a = aRaw
    val b = bRaw.map(_ - 1)
    var ia = 0
    var ib = 0
    var freq = 0f
    var alive = true
    while (alive) {
      if (a(ia) <= b(ib)) {
        var last = ia
        while (last + 1 < a.length && a(last + 1) <= b(ib)) last += 1
        val gap = b(ib) - a(last)
        if (gap <= slop) freq += 1f / (gap + 1)
        ia = last + 1
        if (ia >= a.length) alive = false
      } else {
        var last = ib
        while (last + 1 < b.length && b(last + 1) <= a(ia)) last += 1
        val gap = a(ia) - b(last)
        if (gap <= slop) freq += 1f / (gap + 1)
        ib = last + 1
        if (ib >= b.length) alive = false
      }
    }
    freq
  }

  test("sloppy freq: hand-traced reference sweep examples") {
    def f(a: Seq[Int], b: Seq[Int], slop: Int): Float =
      PhraseFreq.sloppy(Array(a.toArray, b.toArray), Array(0, 1), slop)
    // "x a b a y": query "a b"~2 scores a-b (d=0) and b-a (d=2)
    // (SloppyPhraseScorer.java:84-86 javadoc example) — tokens a@1 b@2 a@3
    assert(f(Seq(1, 3), Seq(2), 2) === 1f + 1f / 3)
    // single pair at adjusted distance 2
    assert(f(Seq(5), Seq(8), 2) === 1f / 3)
    // greedy minimization picks the closer a
    assert(f(Seq(5, 6), Seq(8), 2) === 1f / 2)
    // two independent matches
    assert(f(Seq(5, 18), Seq(21), 2) === 1f / 3)
    // out of slop → no match
    assert(f(Seq(0), Seq(10), 2) === 0f)
    // exact adjacency scores 1.0 under slop too
    assert(f(Seq(4), Seq(5), 2) === 1f)
  }

  test("sloppy freq (2 terms) == two-pointer cycle closed form, randomized") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 2000) {
      def mkPos(n: Int): Array[Int] = {
        var p = rnd.nextInt(3)
        Array.fill(n) { val v = p; p += 1 + rnd.nextInt(6); v }
      }
      val a = mkPos(1 + rnd.nextInt(6))
      val b = mkPos(1 + rnd.nextInt(6))
      val slop = rnd.nextInt(4)
      val got = PhraseFreq.sloppy(Array(a, b.map(_ - 1)), Array(0, 0), slop)
      val gotOffs = PhraseFreq.sloppy(Array(a, b), Array(0, 1), slop)
      val want = sloppy2Cycles(a, b, slop)
      assert(math.abs(gotOffs - want) < 1e-6f,
        s"a=${a.toSeq} b=${b.toSeq} slop=$slop got=$gotOffs want=$want")
      // offset handling == pre-adjusted positions (ties break by offset
      // which coincides with ord here)
      assert(got === gotOffs)
    }
  }

  test("sloppy freq with REPEATED terms: hand-traced reference behavior") {
    // doc "ho my my" (ho@0 my@1 my@2), query "ho my my"~2:
    // init advances the 2nd 'my' to its 2nd occurrence → exact alignment
    assert(PhraseFreq.sloppy(
      Array(Array(0), Array(1, 2), Array(1, 2)),
      Array(0, 1, 2), 2, Array(-1, 1, 1)) === 1f)
    // query "my ho my"~2 on the same doc: one match, length 2
    assert(PhraseFreq.sloppy(
      Array(Array(1, 2), Array(0), Array(1, 2)),
      Array(0, 1, 2), 2, Array(0, -1, 0)) === 1f / 3)
    // too few occurrences for the repeat group → no match (init exhausts)
    assert(PhraseFreq.sloppy(
      Array(Array(5), Array(6), Array(5)),
      Array(0, 1, 2), 3, Array(0, -1, 0)) === 0f)
  }

  test("sloppy freq with repeats == pq transcription (randomized)") {
    val rnd = new scala.util.Random(47)
    // direct transcription with a PriorityQueue + the reference's
    // advanceRepeatGroups / collide / lesser control flow
    def reference(pos: Array[Array[Int]], offsets: Array[Int], slop: Int,
        rpt: Array[Int]): Float = {
      val n = pos.length
      val idx = new Array[Int](n)
      var i = 0
      while (i < n) {
        var steps = 0
        var j = 0
        while (j < i) { if (rpt(j) >= 0 && rpt(j) == rpt(i)) steps += 1; j += 1 }
        if (steps >= pos(i).length) return 0f
        idx(i) = steps
        i += 1
      }
      def cur(p: Int) = pos(p)(idx(p)) - offsets(p)
      var end = (0 until n).map(cur).max
      def adv(p: Int): Boolean = {
        idx(p) += 1
        if (idx(p) >= pos(p).length) false
        else { end = math.max(end, cur(p)); true }
      }
      def collide(p: Int): Int =
        (0 until n).find(j => j != p && rpt(p) >= 0 && rpt(j) == rpt(p) &&
          cur(j) + offsets(j) == cur(p) + offsets(p)).getOrElse(-1)
      def advRpts(p0: Int): Boolean = {
        if (rpt(p0) < 0) return true
        var p = p0
        var k = collide(p)
        while (k >= 0) {
          p = if (cur(p) < cur(k) || (cur(p) == cur(k) && offsets(p) < offsets(k))) p else k
          if (!adv(p)) return false
          k = collide(p)
        }
        true
      }
      val pqOrd: Ordering[Int] =
        Ordering.by((p: Int) => (-cur(p), -offsets(p), -p))
      val pq = scala.collection.mutable.PriorityQueue.empty[Int](pqOrd)
      (0 until n).foreach(pq.enqueue(_))
      var freq = 0f
      var pp = pq.dequeue()
      var ml = end - cur(pp)
      var next = cur(pq.head)
      var run = true
      while (run) {
        if (!adv(pp) || !advRpts(pp)) run = false
        else {
          // requeue members the collision loop may have moved (Lucene's
          // bits/rptStack machinery); `next` stays deliberately stale,
          // exactly like the reference's captured pq.top()
          val live = pq.dequeueAll
          live.foreach(pq.enqueue(_))
          if (cur(pp) > next) {
            if (ml <= slop) freq += 1f / (ml + 1)
            pq.enqueue(pp)
            pp = pq.dequeue()
            next = cur(pq.head)
            ml = end - cur(pp)
          } else ml = math.min(ml, end - cur(pp))
        }
      }
      if (ml <= slop) freq += 1f / (ml + 1)
      freq
    }
    for (_ <- 1 to 1000) {
      def mkPos(cnt: Int): Array[Int] = {
        var p = rnd.nextInt(3)
        Array.fill(cnt) { val v = p; p += 1 + rnd.nextInt(4); v }
      }
      // 3 offsets, terms drawn from {A, B}: at least one repeat likely
      val terms = Array.fill(3)(rnd.nextInt(2))
      val posByTerm = Map(0 -> mkPos(1 + rnd.nextInt(5)), 1 -> mkPos(1 + rnd.nextInt(5)))
      val pos = terms.map(posByTerm)
      val rpt = terms.indices.toArray.map { i =>
        if (terms.count(_ == terms(i)) > 1) terms.indexOf(terms(i)) else -1
      }
      val offsets = Array(0, 1, 2)
      val slop = rnd.nextInt(5)
      val got = PhraseFreq.sloppy(pos, offsets, slop, rpt)
      val want = reference(pos, offsets, slop, rpt)
      assert(math.abs(got - want) < 1e-6f,
        s"terms=${terms.toSeq} pos=${pos.map(_.toSeq).toSeq} slop=$slop got=$got want=$want")
    }
  }

  test("multi-term repeats (hasMultiTermRpts): hand-traced examples") {
    // query "a (a|b)"~1 over "a a b" (a@0 a@1 b@2): stream0 = pos(a),
    // stream1 = union(pos(a), pos(b)); init collision at raw 0 advances
    // the union stream; matches "a a" (len 0) and "a b" (len 0) → 2.0
    assert(PhraseFreq.sloppy(
      Array(Array(0, 1), Array(0, 1, 2)), Array(0, 1), 1,
      Array(0, 0), multiTerm = true) === 2f)
    // "a b" (a@0 b@1): one exact match
    assert(PhraseFreq.sloppy(
      Array(Array(0), Array(0, 1)), Array(0, 1), 2,
      Array(0, 0), multiTerm = true) === 1f)
    // doc "a" alone: the two offsets need two tokens → init exhausts
    assert(PhraseFreq.sloppy(
      Array(Array(0), Array(0)), Array(0, 1), 2,
      Array(0, 0), multiTerm = true) === 0f)
  }

  test("multiPhraseRptGroups: union-find over shared terms") {
    // no repeats
    assert(PhraseFreq.multiPhraseRptGroups(Seq(Seq("a"), Seq("b", "c")))
      === ((null, false)))
    // single-term repeat: "a ... a"
    val (g1, mt1) = PhraseFreq.multiPhraseRptGroups(Seq(Seq("a"), Seq("b"), Seq("a")))
    assert(g1.toSeq === Seq(0, -1, 0) && !mt1)
    // multi-term repeat: a shared with a union offset
    val (g2, mt2) = PhraseFreq.multiPhraseRptGroups(Seq(Seq("a"), Seq("a", "b")))
    assert(g2.toSeq === Seq(0, 0) && mt2)
    // transitive connection: {a,b} and {b,c} and {c} form ONE group
    val (g3, mt3) = PhraseFreq.multiPhraseRptGroups(
      Seq(Seq("a", "b"), Seq("b", "c"), Seq("c")))
    assert(g3.toSeq === Seq(0, 0, 0) && mt3)
    // two disjoint groups
    val (g4, _) = PhraseFreq.multiPhraseRptGroups(
      Seq(Seq("a"), Seq("b"), Seq("a"), Seq("b")))
    assert(g4.toSeq === Seq(0, 1, 0, 1))
  }

  test("multi-term repeat sweep == pq transcription (randomized)") {
    val rnd = new scala.util.Random(59)
    // direct transcription of the reference with PP term sets: union
    // streams per offset, multi-term init (advanceRepeatGroups case 2,
    // SloppyPhraseScorer.java:292-310), collide/lesser during the sweep
    def reference(pos: Array[Array[Int]], offsets: Array[Int], slop: Int,
        rpt: Array[Int]): Float = {
      val n = pos.length
      val idx = new Array[Int](n)
      var end = Int.MinValue
      var i = 0
      while (i < n) {
        if (pos(i).isEmpty) return 0f
        idx(i) = 0
        i += 1
      }
      def cur(p: Int) = pos(p)(idx(p)) - offsets(p)
      def adv(p: Int): Boolean = {
        idx(p) += 1
        if (idx(p) >= pos(p).length) false
        else { end = math.max(end, cur(p)); true }
      }
      def collide(p: Int): Int =
        (0 until n).find(j => j != p && rpt(p) >= 0 && rpt(j) == rpt(p) &&
          cur(j) + offsets(j) == cur(p) + offsets(p)).getOrElse(-1)
      def lesser(a: Int, b: Int): Int =
        if (cur(a) < cur(b) || (cur(a) == cur(b) && offsets(a) < offsets(b))) a else b
      // advanceRepeatGroups, multi-term case
      val gids = rpt.filter(_ >= 0).distinct.sorted
      for (g <- gids) {
        val rg = (0 until n).filter(rpt(_) == g).toArray
        var ri = 0
        while (ri < rg.length) {
          var incr = 1
          // pp stays FIXED at rg(ri): the reference's collision loop is
          // `while ((k = collide(pp)) >= 0) { pp2 = lesser(pp, rg[k]);
          // advancePP(pp2); if (pp2.rptInd < i) ... }` — it re-collides
          // from rg[i], never from the advanced pp2 (round-3 advisor:
          // the transcription previously encoded the engine's variant,
          // which made the property test circular on this nuance)
          val pp = rg(ri)
          var k = collide(pp)
          var stop = false
          while (k >= 0 && !stop) {
            val pp2 = lesser(pp, k)
            if (!adv(pp2)) return 0f
            val ind = rg.indexOf(pp2)
            if (ind >= 0 && ind < ri) { incr = 0; stop = true }
            else k = collide(pp)
          }
          ri += incr
        }
      }
      def advRpts(p0: Int): Boolean = {
        if (rpt(p0) < 0) return true
        var p = p0
        var k = collide(p)
        while (k >= 0) {
          p = lesser(p, k)
          if (!adv(p)) return false
          k = collide(p)
        }
        true
      }
      (0 until n).foreach(p => end = math.max(end, cur(p)))
      val pqOrd: Ordering[Int] =
        Ordering.by((p: Int) => (-cur(p), -offsets(p), -p))
      val pq = scala.collection.mutable.PriorityQueue.empty[Int](pqOrd)
      (0 until n).foreach(pq.enqueue(_))
      var freq = 0f
      var pp = pq.dequeue()
      var ml = end - cur(pp)
      var next = cur(pq.head)
      var run = true
      while (run) {
        if (!adv(pp) || !advRpts(pp)) run = false
        else {
          val live = pq.dequeueAll // re-heapify after collision moves
          live.foreach(pq.enqueue(_))
          if (cur(pp) > next) {
            if (ml <= slop) freq += 1f / (ml + 1)
            pq.enqueue(pp)
            pp = pq.dequeue()
            next = cur(pq.head)
            ml = end - cur(pp)
          } else ml = math.min(ml, end - cur(pp))
        }
      }
      if (ml <= slop) freq += 1f / (ml + 1)
      freq
    }
    var multiTermCases = 0
    for (_ <- 1 to 2000) {
      // token stream over a 3-letter alphabet; offsets get 1-2 member sets
      val alphabet = Array("a", "b", "c")
      val tokens = Array.fill(3 + rnd.nextInt(15))(alphabet(rnd.nextInt(3)))
      val nOff = 2 + rnd.nextInt(2)
      val ps: Seq[Seq[String]] = (0 until nOff).map { _ =>
        val sz = 1 + rnd.nextInt(2)
        rnd.shuffle(alphabet.toSeq).take(sz)
      }
      val (rpt, mt) = PhraseFreq.multiPhraseRptGroups(ps)
      val posByTerm = alphabet.map(t =>
        t -> tokens.indices.filter(tokens(_) == t).toArray).toMap
      val pos: Array[Array[Int]] = ps.map(ms =>
        ms.flatMap(t => posByTerm(t).toSeq).distinct.sorted.toArray).toArray
      if (pos.forall(_.nonEmpty) && rpt != null && mt) {
        multiTermCases += 1
        val offsets = Array.range(0, nOff)
        val slop = rnd.nextInt(5)
        val got = PhraseFreq.sloppy(pos, offsets, slop, rpt, multiTerm = true)
        val want = reference(pos, offsets, slop, rpt)
        assert(math.abs(got - want) < 1e-6f,
          s"tokens=${tokens.mkString} ps=$ps slop=$slop got=$got want=$want")
      }
    }
    assert(multiTermCases > 300, s"only $multiTermCases multi-term cases hit")
  }

  test("sloppy freq: 3-term sweep matches a direct pq transcription") {
    val rnd = new scala.util.Random(31)
    // independent transcription using a scala PriorityQueue
    def reference(pos: Array[Array[Int]], offsets: Array[Int], slop: Int): Float = {
      case class PP(var idx: Int, ord: Int) {
        def position: Int = pos(ord)(idx) - offsets(ord)
      }
      implicit val ord: Ordering[PP] = Ordering.by(pp => (-pp.position, -offsets(pp.ord), -pp.ord))
      val pq = scala.collection.mutable.PriorityQueue.empty[PP]
      var end = Int.MinValue
      pos.indices.foreach { i =>
        val pp = PP(0, i)
        end = math.max(end, pp.position)
        pq.enqueue(pp)
      }
      var freq = 0f
      var pp = pq.dequeue()
      var matchLength = end - pp.position
      var next = pq.head.position
      var run = true
      while (run) {
        pp.idx += 1
        if (pp.idx >= pos(pp.ord).length) run = false
        else {
          end = math.max(end, pp.position)
          if (pp.position > next) {
            if (matchLength <= slop) freq += 1f / (matchLength + 1)
            pq.enqueue(pp)
            pp = pq.dequeue()
            next = pq.head.position
            matchLength = end - pp.position
          } else {
            matchLength = math.min(matchLength, end - pp.position)
          }
        }
      }
      if (matchLength <= slop) freq += 1f / (matchLength + 1)
      freq
    }
    for (_ <- 1 to 500) {
      def mkPos(n: Int): Array[Int] = {
        var p = rnd.nextInt(3)
        Array.fill(n) { val v = p; p += 1 + rnd.nextInt(5); v }
      }
      val n = 2 + rnd.nextInt(2)
      val pos = Array.fill(n)(mkPos(1 + rnd.nextInt(5)))
      val offsets = Array.range(0, n)
      val slop = rnd.nextInt(5)
      val got = PhraseFreq.sloppy(pos, offsets, slop)
      val want = reference(pos, offsets, slop)
      assert(math.abs(got - want) < 1e-6f,
        s"pos=${pos.map(_.toSeq).toSeq} slop=$slop got=$got want=$want")
    }
  }

  test("spanNearOrdered: hand-traced NearSpansOrdered enumeration") {
    // doc "a x b", span_near(a, b, slop): a@0, b@2 -> gap 1
    assert(PhraseFreq.spanNearOrdered(Array(Array(0), Array(2)), 1) === 0.5f)
    assert(PhraseFreq.spanNearOrdered(Array(Array(0), Array(2)), 0) === 0f)
    // adjacent: "a b" -> gap 0 -> 1.0
    assert(PhraseFreq.spanNearOrdered(Array(Array(0), Array(1)), 0) === 1f)
    // enumeration advances clause 0 per position: "a a b" a@{0,1} b@2:
    // p0=0 -> b@2 gap 1; p0=1 -> b@2 gap 0 -> 1/2 + 1 = 1.5
    assert(PhraseFreq.spanNearOrdered(Array(Array(0, 1), Array(2)), 1) === 1.5f)
    // later pointers are MONOTONE: "b a b a" pattern a@{1,3} b-clause-
    // second with b@{0,2}: p0(a)=1 -> b>=2 -> 2 gap 0; p0(a)=3 -> b
    // exhausted after 2? b@2 < 4 -> advance past end -> no match
    assert(PhraseFreq.spanNearOrdered(Array(Array(1, 3), Array(0, 2)), 2) === 1f)
    // 3 clauses: "a b c" exact chain gap 0+0
    assert(PhraseFreq.spanNearOrdered(
      Array(Array(0), Array(1), Array(2)), 0) === 1f)
    // "a x b y c": gaps 1+1 = 2
    assert(PhraseFreq.spanNearOrdered(
      Array(Array(0), Array(2), Array(4)), 2) === (1f / 3))
    assert(PhraseFreq.spanNearOrdered(
      Array(Array(0), Array(2), Array(4)), 1) === 0f)
  }

  test("spanNearUnordered: min-advancing walk with clamped width") {
    // "b a": unordered matches both states (b@0,a@1): width 0 -> 1.0;
    // then advance b -> exhausted. a@1,b@0 visited once.
    assert(PhraseFreq.spanNearUnordered(Array(Array(1), Array(0)), 0) === 1f)
    // ordered would reject the same doc
    assert(PhraseFreq.spanNearOrdered(Array(Array(1), Array(0)), 0) === 0f)
    // "a x b" either order: width 1
    assert(PhraseFreq.spanNearUnordered(Array(Array(2), Array(0)), 1) === 0.5f)
    // overlapping same positions clamp to width 0, no divide-by-zero
    assert(PhraseFreq.spanNearUnordered(Array(Array(0), Array(0)), 0) === 1f)
    // walk enumerates once per min-advance: a@{0,4} b@{1}:
    // state(0,1) w0 match; advance a; state(4,1) w2; advance b -> done.
    assert(PhraseFreq.spanNearUnordered(Array(Array(0, 4), Array(1)), 2)
      === (1f + 1f / 3))
  }

  test("span-near: segment path == DataFrame path (dual-path law)") {
    import graft.core.Corpus
    import graft.index.IndexBuilder
    import graft.index.IndexBuilder.BuildConfig
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-span").toString
    val docs = spark.createDataset(Corpus.generate(200, 23L)).toDF()
    val ix = IndexBuilder.buildLogical(docs, "content", None,
      Seq("repo", "path", "commit"), BuildConfig(numBuckets = 4, numDocShards = 2))
    IndexBuilder.writeIndex(ix, tmp, "sp1", 1)
    val seg = new Searcher(spark, SegmentSearcher.load(tmp))
    for (q <- Seq(
        SpanNearQ(Seq("def", "val"), 3),
        SpanNearQ(Seq("def", "val"), 3, inOrder = false),
        SpanNearQ(Seq("index", "merge", "segment"), 20),
        SpanNearQ(Seq("index", "merge", "segment"), 20, inOrder = false),
        SpanNearQ(Seq("def", "def"), 2),
        // nested: SpanOr union subclauses inside the near
        SpanNearOrQ(Seq(Seq("def", "merge"), Seq("val")), 4),
        SpanNearOrQ(Seq(Seq("def", "merge"), Seq("val", "index")), 6,
          inOrder = false),
        SpanNearOrQ(Seq(Seq("index", "segment"), Seq("merge"),
          Seq("def", "val")), 20))) {
      val a = seg.search(q, 10).toSeq.map(h => (h.docId, h.score))
      val b = DataFrameSearcher.search(ix, q, 10).collect().toSeq
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(a.nonEmpty, s"fixture has no hits for $q")
      assert(a === b, s"dual-path divergence for $q")
    }
    ix.unpersistCached()
    ix.postings.unpersist()
  }

  test("span-first and span-or scores match a token-scan recompute") {
    import graft.core.{Corpus, Analysis, Norms}
    import graft.index.IndexBuilder
    import graft.index.IndexBuilder.BuildConfig
    val spark = TestSpark.spark
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-spanfo").toString
    val files = Corpus.generate(150, 31L)
    val docs = spark.createDataset(files).toDF()
    val ix = IndexBuilder.buildLogical(docs, "content", None,
      Seq("repo", "path", "commit"), BuildConfig(numBuckets = 4, numDocShards = 2))
    IndexBuilder.writeIndex(ix, tmp, "sp2", 1)
    val seg = new Searcher(spark, SegmentSearcher.load(tmp))
    val toks = ix.docs.select("docId", "content").collect()
      .map(r => r.getLong(0) -> Analysis.simpleTokens(r.getString(1))).toMap
    val n = toks.size.toLong
    def df(t: String) = toks.count(_._2.contains(t)).toLong
    def w(ts: Seq[String]): Float = {
      var s = 0f
      ts.distinct.sorted.foreach(t => s += BM25.idf(df(t), n))
      BM25.weightValue(s, BM25.Default)
    }
    val sumTtf = toks.values.map(_.length.toLong).sum
    val cache = BM25.normCache(BM25.Default, BM25.avgFieldLength(sumTtf, n))
    def expect(freqOf: Array[String] => Float, wv: Float): Seq[(Long, Double)] =
      toks.toSeq.flatMap { case (id, tk) =>
        val f = freqOf(tk)
        if (f <= 0f) None
        else Some((id, BM25.score(wv, f,
          cache(Norms.normByte(tk.length) & 0xff)).toDouble))
      }.sortBy { case (id, s) => (-s, id) }.take(10)

    // span-first: occurrences of 'def' in the first 10 positions
    val gotFirst = seg.search(SpanFirstQ("def", 10), 10).toSeq
      .map(h => (h.docId, h.score))
    val expFirst = expect(
      tk => tk.take(10).count(_ == "def").toFloat, w(Seq("def")))
    assert(gotFirst.nonEmpty && gotFirst === expFirst)

    // span-or: total occurrences of either member
    val gotOr = seg.search(SpanOrQ(Seq("def", "merge")), 10).toSeq
      .map(h => (h.docId, h.score))
    val expOr = expect(
      tk => tk.count(t => t == "def" || t == "merge").toFloat,
      w(Seq("def", "merge")))
    assert(gotOr.nonEmpty && gotOr === expOr)

    // span-not: 'def' with no 'merge' within 2 positions either side;
    // weight from the include term only (SpanNotQuery.java:186-189)
    val gotNot = seg.search(SpanNotQ("def", "merge", 2, 2), 10).toSeq
      .map(h => (h.docId, h.score))
    val expNot = expect(
      tk => tk.indices.count { i =>
        tk(i) == "def" && !((math.max(0, i - 2) to
          math.min(tk.length - 1, i + 2)).exists(j => tk(j) == "merge"))
      }.toFloat,
      w(Seq("def")))
    assert(gotNot.nonEmpty && gotNot === expNot)
    // the exclusion must actually bite somewhere in this corpus
    val gotPlain = seg.search(graft.search.TermQ("def"), 150).toSeq
    val gotNotAll = seg.search(SpanNotQ("def", "merge", 2, 2), 150).toSeq
    assert(gotNotAll.size < gotPlain.size ||
      gotNotAll.map(_.score).sum < gotPlain.map(_.score).sum)

    // absent exclude term degrades to plain term scoring
    // (ScoringWrapperSpans branch, SpanNotQuery.java:128-130)
    val gotNoExc = seg.search(SpanNotQ("def", "zzznotaterm"), 10).toSeq
      .map(h => (h.docId, h.score))
    val gotTerm = seg.search(graft.search.TermQ("def"), 10).toSeq
      .map(h => (h.docId, h.score))
    assert(gotNoExc === gotTerm)

    // nested span-near (or-union clauses): independent chain-of-minimums
    // recompute per start position — NOT the engine's pointer loop
    def nearOrFreq(tk: Array[String], cls: Seq[Seq[String]],
        slop: Int): Float = {
      val pos = cls.map(c => tk.indices.filter(i => c.contains(tk(i))).toArray)
      if (pos.exists(_.isEmpty)) 0f
      else {
        var freq = 0.0
        for (p0 <- pos.head) {
          var prev = p0; var ok = true; var width = 0
          for (k <- 1 until cls.size if ok) {
            pos(k).find(_ >= prev + 1) match {
              case Some(p) => width += p - prev - 1; prev = p
              case None => ok = false
            }
          }
          if (ok && width <= slop) freq += 1.0 / (1 + width)
        }
        freq.toFloat
      }
    }
    val nestedCls = Seq(Seq("def", "merge"), Seq("val"))
    val gotNested = seg.search(SpanNearOrQ(nestedCls, 3), 10).toSeq
      .map(h => (h.docId, h.score))
    val expNested = expect(tk => nearOrFreq(tk, nestedCls, 3),
      w(Seq("def", "merge", "val")))
    assert(gotNested.nonEmpty && gotNested === expNested)

    // an ABSENT union member folds as +0 in the weight: identical output
    // to the query without it (and to the all-singleton SpanNearQ form)
    val gotAbsent = seg.search(
      SpanNearOrQ(Seq(Seq("def", "zzznotaterm"), Seq("val")), 3), 10).toSeq
      .map(h => (h.docId, h.score))
    val gotPlainNear = seg.search(
      SpanNearQ(Seq("def", "val"), 3), 10).toSeq
      .map(h => (h.docId, h.score))
    assert(gotAbsent === gotPlainNear)

    ix.unpersistCached()
    ix.postings.unpersist()
  }
}
