package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Analysis, Corpus, Norms}
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._
import graft.search.Span.{Containing, First, Multi, Near, Not, Or, PosRange, Term, Within}

/** The composed span tree ([[Spans]] interval algebra) against three
  * independent sources of truth: (1) the flat single-level span scorers
  * (gate-proven bit-exact) on every shape both can express; (2) an
  * independent per-doc recompute over raw token arrays for NESTED
  * shapes (chain-of-minimums closed form, valid because subclause
  * emission keeps ends monotone); (3) hand-traced interval examples
  * for the combinator laws themselves.
  */
class SpansTreeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private lazy val (searcher, docsToks) = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-spantree").toString
    val files = Corpus.generate(250, seed = 47L)
    val ix = IndexBuilder.buildLogical(
      spark.createDataset(files).repartition(4).toDF(),
      "content", None, Seq("repo", "path", "commit"),
      BuildConfig(numBuckets = 4, numDocShards = 2))
    IndexBuilder.writeIndex(ix, tmp, "spt", 1)
    val toks = ix.docs.select("docId", "content").collect()
      .map(r => r.getLong(0) -> Analysis.simpleTokens(r.getString(1)))
      .toMap
    ix.unpersistCached(); ix.postings.unpersist()
    (new Searcher(spark, SegmentSearcher.load(tmp)), toks)
  }

  private def got(q: Query, k: Int = 10): Seq[(Long, Double)] =
    searcher.search(q, k).toSeq.map(h => (h.docId, h.score))

  test("SpanQ over flat shapes == the dedicated flat scorers, bit-exact") {
    val cases: Seq[(Query, Query)] = Seq(
      SpanQ(Near(Seq(Term("def"), Term("val")), 3)) ->
        SpanNearQ(Seq("def", "val"), 3),
      SpanQ(Near(Seq(Term("def"), Term("val")), 3, inOrder = false)) ->
        SpanNearQ(Seq("def", "val"), 3, inOrder = false),
      SpanQ(Near(Seq(Term("index"), Term("merge"), Term("segment")), 20)) ->
        SpanNearQ(Seq("index", "merge", "segment"), 20),
      SpanQ(Near(Seq(Term("index"), Term("merge"), Term("segment")), 20,
        inOrder = false)) ->
        SpanNearQ(Seq("index", "merge", "segment"), 20, inOrder = false),
      // repeated term: two independently-positioned leaf streams
      SpanQ(Near(Seq(Term("def"), Term("def")), 2)) ->
        SpanNearQ(Seq("def", "def"), 2),
      SpanQ(Or(Seq(Term("def"), Term("merge")))) ->
        SpanOrQ(Seq("def", "merge")),
      // absent member drops from the union AND the weight fold
      SpanQ(Or(Seq(Term("def"), Term("zzznotaterm")))) ->
        SpanOrQ(Seq("def", "zzznotaterm")),
      SpanQ(First(Term("def"), 10)) -> SpanFirstQ("def", 10),
      SpanQ(Not(Term("def"), Term("merge"), 2, 2)) ->
        SpanNotQ("def", "merge", 2, 2),
      // absent exclude vetoes nothing
      SpanQ(Not(Term("def"), Term("zzznotaterm"))) ->
        SpanNotQ("def", "zzznotaterm"),
      // near over unions == the dedicated SpanNearOrQ
      SpanQ(Near(Seq(Or(Seq(Term("def"), Term("merge"))), Term("val")), 4)) ->
        SpanNearOrQ(Seq(Seq("def", "merge"), Seq("val")), 4),
      SpanQ(Near(Seq(Or(Seq(Term("def"), Term("merge"))),
        Or(Seq(Term("val"), Term("index")))), 6, inOrder = false)) ->
        SpanNearOrQ(Seq(Seq("def", "merge"), Seq("val", "index")), 6,
          inOrder = false))
    for ((tree, flat) <- cases) {
      val a = got(tree, 20)
      val b = got(flat, 20)
      assert(a == b, s"tree=$tree flat=$flat")
    }
    // and the shapes are actually matched by the fixture
    assert(got(SpanQ(Near(Seq(Term("def"), Term("val")), 3))).nonEmpty)
  }

  /** Interval-level hand traces of the combinator laws. */
  test("combinator laws on hand-traced token streams") {
    // tokens:  a b a c b  (a@0, b@1, a@2, c@3, b@4)
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-spanht").toString
    val docs = Seq(
      ("r", "p0", "c", "s", "a b a c b"),
      ("r", "p1", "c", "s", "a c c b a b"),
      ("r", "p2", "c", "s", "b a")).toDF(
      "repo", "path", "commit", "lang", "content")
    val ix = IndexBuilder.buildLogical(docs, "content", None,
      Seq("repo", "path", "commit"), BuildConfig(numBuckets = 2, numDocShards = 1))
    IndexBuilder.writeIndex(ix, tmp, "ht", 1)
    val s = new Searcher(spark, SegmentSearcher.load(tmp))
    val byPath = ix.docs.select("docId", "path").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    ix.unpersistCached(); ix.postings.unpersist()
    def freqs(q: Query): Map[Long, Float] = {
      // invert score → freq via the known weight/cache: instead, rely on
      // rank-free doc membership + per-doc freq through a k=10 search on
      // a 3-doc corpus: recompute freq from the score is fragile; assert
      // via DOC SETS and relative equalities below
      s.search(q, 10).map(h => h.docId -> h.score.toFloat).toMap
    }
    val d0 = byPath("p0"); val d1 = byPath("p1"); val d2 = byPath("p2")

    // ordered Near(Near(a,b,slop1), a): doc0: inner spans per a-occ:
    //   a@0→b@1 gap0 (w0, end 2); a@2→b@4 gap1 (w1, end 5).
    //   outer: inner(0,2)→next a ≥ 2: a@2 gap0 → span w0 ✓;
    //   inner(2,5)→next a ≥ 5: none → exhausted. freq = 1.
    // doc1 (a@0 c@1 c@2 b@3 a@4 b@5): inner: a@0→b@3 gaps 2 (w2 ≤2, end 4);
    //   a@4→b@5 gap0 (w0, end 6). outer: inner(0,4)→a ≥ 4: a@4 gap 0 →
    //   emit w0; inner(4,6)→a ≥ 6: none. freq = 1.
    // doc2 (b@0 a@1): inner needs a before b: none. no match.
    val nested = SpanQ(Near(Seq(Near(Seq(Term("a"), Term("b")), 2), Term("a")), 3))
    val nf = freqs(nested)
    assert(nf.keySet == Set(d0, d1))
    // equal freq (1.0 each) ⇒ scores differ only through the norm; doc1
    // is longer ⇒ doc0 outranks
    assert(nf(d0) > nf(d1))

    // unordered Near over (Or(a,c), b): doc2 b@0 a@1: min-walk states:
    //   (a@1,b@0) w0 → match. freq ≥ 1
    val uno = SpanQ(Near(Seq(Or(Seq(Term("a"), Term("c"))), Term("b")), 1,
      inOrder = false))
    assert(freqs(uno).keySet == Set(d0, d1, d2))

    // First(Near(a,b),2): only doc0's a@0→b@1 span (end 2) survives
    // end ≤ 2; doc1's earliest inner span ends at 4
    val fn = SpanQ(First(Near(Seq(Term("a"), Term("b")), 2), 2))
    assert(freqs(fn).keySet == Set(d0))

    // Not(Near(a,b), c, pre=0, post=1): veto spans with a c in
    // [start, end+1). doc0 span(0,2) w0: c@3 not in [0,3) → wait, post=1
    // ⇒ window [0−0, 2+1) = [0,3): c@3 outside → kept; span(2,5): window
    // [2,6): c@3 inside → vetoed. doc1 span(0,4): c@1 in [0,5) → vetoed;
    // span(4,6): c∈[4,7)? none (c@1,2) → kept.
    val nn = SpanQ(Not(Near(Seq(Term("a"), Term("b")), 2), Term("c"), 0, 1))
    val nnf = freqs(nn)
    assert(nnf.keySet == Set(d0, d1))
    s.close()
  }

  /** Independent chain-of-minimums recompute over raw tokens for nested
    * ordered shapes (valid: term-leaf subclause emission keeps both
    * starts and ends monotone, so the engine's forward pointers equal
    * the independent per-first-position minimum).
    */
  test("nested ordered shapes match an independent token recompute") {
    val n = docsToks.size.toLong
    def df(t: String) = docsToks.count(_._2.contains(t)).toLong
    def weight(ts: Seq[String]): Float = {
      var s = 0f
      ts.distinct.sorted.foreach(t => if (df(t) > 0) s += BM25.idf(df(t), n))
      BM25.weightValue(s, BM25.Default)
    }
    val sumTtf = docsToks.values.map(_.length.toLong).sum
    val cache = BM25.normCache(BM25.Default, BM25.avgFieldLength(sumTtf, n))
    def expect(freqOf: Array[String] => Float, wv: Float): Seq[(Long, Double)] =
      docsToks.toSeq.flatMap { case (id, tk) =>
        val f = freqOf(tk)
        if (f <= 0f) None
        else Some((id, BM25.score(wv, f,
          cache(Norms.normByte(tk.length) & 0xff)).toDouble))
      }.sortBy { case (id, s) => (-s, id) }.take(10)

    // inner ordered near spans (term clauses) via independent minimums:
    // (start, end, width) per first-clause occurrence
    def nearSpans(tk: Array[String], ts: Seq[String],
        slop: Int): Seq[(Int, Int, Int)] = {
      val pos = ts.map(t => tk.indices.filter(i => tk(i) == t))
      if (pos.exists(_.isEmpty)) return Nil
      pos.head.flatMap { p0 =>
        var prevEnd = p0 + 1
        var width = 0
        var ok = true
        for (ps <- pos.tail if ok) {
          ps.find(_ >= prevEnd) match {
            case Some(p) => width += p - prevEnd; prevEnd = p + 1
            case None => ok = false
          }
        }
        if (ok && width <= slop) Some((p0, prevEnd, width)) else None
      }
    }

    // First(Near([def, val], 4), 30)
    val gotF = got(SpanQ(First(Near(Seq(Term("def"), Term("val")), 4), 30)))
    val expF = expect(tk => {
      var f = 0d
      nearSpans(tk, Seq("def", "val"), 4).foreach { case (_, e, w) =>
        if (e <= 30) f += 1.0 / (1 + w)
      }
      f.toFloat
    }, weight(Seq("def", "val")))
    assert(gotF.nonEmpty && gotF == expF)

    // Not(Near([def, val], 4), merge, 1, 2) — weight from include only
    val gotN = got(SpanQ(Not(Near(Seq(Term("def"), Term("val")), 4),
      Term("merge"), 1, 2)))
    val expN = expect(tk => {
      val excl = tk.indices.filter(i => tk(i) == "merge")
      var f = 0d
      nearSpans(tk, Seq("def", "val"), 4).foreach { case (s, e, w) =>
        if (!excl.exists(q => q + 1 > s - 1 && q < e + 2)) f += 1.0 / (1 + w)
      }
      f.toFloat
    }, weight(Seq("def", "val")))
    assert(gotN.nonEmpty && gotN == expN)

    // Near([Near([def, val], 3), index], 10): outer chains from the
    // inner spans' (monotone) ends; outer width counts only the new gap
    val gotD = got(SpanQ(Near(Seq(Near(Seq(Term("def"), Term("val")), 3),
      Term("index")), 10)))
    val expD = expect(tk => {
      val ip = tk.indices.filter(i => tk(i) == "index")
      var f = 0d
      var lastIdx = 0
      val inner = nearSpans(tk, Seq("def", "val"), 3)
      var exhausted = false
      inner.foreach { case (_, e, _) =>
        if (!exhausted) {
          while (lastIdx < ip.length && ip(lastIdx) < e) lastIdx += 1
          if (lastIdx >= ip.length) exhausted = true
          else {
            val gap = ip(lastIdx) - e
            if (gap <= 10) f += 1.0 / (1 + gap)
          }
        }
      }
      f.toFloat
    }, weight(Seq("def", "val", "index")))
    assert(gotD.nonEmpty && gotD == expD)
  }

  test("forced-distributed == driver-local for composed span trees") {
    val dist = new Searcher(spark, searcher.index, cacheSegments = false,
      maxLocalBytes = 0)
    try {
      for (q <- Seq[Query](
          SpanQ(First(Near(Seq(Term("def"), Term("val")), 4), 30)),
          SpanQ(Near(Seq(Near(Seq(Term("def"), Term("val")), 3),
            Term("index")), 10)),
          SpanQ(Not(Near(Seq(Term("def"), Term("val")), 4),
            Term("merge"), 1, 2)))) {
        val local = got(q)
        val forced = dist.search(q, 10).toSeq.map(h => (h.docId, h.score))
        assert(local.nonEmpty && local == forced, s"q=$q")
      }
    } finally dist.close()
  }

  /** Hand-traced Containing/Within/PosRange, including the reference's
    * FORWARD-ONLY streaming subtlety: ContainSpans tests only the first
    * little with start ≥ big.start (`SpanContainingQuery.java:80-94`), so
    * a big whose first candidate little is too long is skipped even when
    * a LATER little is set-contained.
    */
  test("Containing/Within/PosRange hand-traced, incl. forward-only law") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-spancw").toString
    // p0: a@0 c@1 e@2 d@3 x@4 b@5 f@6 — big Near(a,b,4) = (0,6,w4);
    //     littles Or(Near(c,f,10), Near(e,d,10)) = (1,7,w4), (2,4,w0):
    //     first little (1,7) has end 7 > 6 → big NOT emitted (the later
    //     (2,4) IS set-contained — the forward-only law drops it)
    // p1: a@0 c@1 e@2 d@3 f@4 b@5 — big (0,6,w4); littles (1,5,w2),(2,4):
    //     first little (1,5) fits → emitted, freq = 1/(1+4)
    // p2: d@0 a@1 b@2 — big (1,3,w0); no little member present → no match
    val docs = Seq(
      ("r", "p0", "c", "s", "a c e d x b f"),
      ("r", "p1", "c", "s", "a c e d f b"),
      ("r", "p2", "c", "s", "d a b")).toDF(
      "repo", "path", "commit", "lang", "content")
    val ix = IndexBuilder.buildLogical(docs, "content", None,
      Seq("repo", "path", "commit"), BuildConfig(numBuckets = 2, numDocShards = 1))
    IndexBuilder.writeIndex(ix, tmp, "cw", 1)
    val s = new Searcher(spark, SegmentSearcher.load(tmp))
    val byPath = ix.docs.select("docId", "path").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    ix.unpersistCached(); ix.postings.unpersist()
    def docsOf(q: Query): Set[Long] = s.search(q, 10).map(_.docId).toSet
    val (d0, d1, d2) = (byPath("p0"), byPath("p1"), byPath("p2"))

    val big = Near(Seq(Term("a"), Term("b")), 4)
    val little = Or(Seq(Near(Seq(Term("c"), Term("f")), 10),
      Near(Seq(Term("e"), Term("d")), 10)))
    assert(docsOf(SpanQ(Containing(big, little))) == Set(d1),
      "forward-only law: p0's set-contained (2,4) must NOT rescue the big")

    // Within(d, big): p0 d@3 → (3,4) inside (0,6) ✓; p1 d@3 ✓;
    // p2 d@0 → (0,1): only big is (1,3), start 1 > 0 → not enclosed
    assert(docsOf(SpanQ(Within(Term("d"), big))) == Set(d0, d1))

    // PosRange(big, 1, 4): only p2's (1,3) has start ≥ 1 and end ≤ 4
    assert(docsOf(SpanQ(PosRange(big, 1, 4))) == Set(d2))
    // range that excludes everything prunes to MatchNone
    assert(Query.rewrite(SpanQ(PosRange(big, 3, 3))) == MatchNoneQ)
    s.close()
  }

  test("Span.Multi expands like the explicit union (SpanMultiTermQueryWrapper)") {
    val matching = docsToks.values.flatten.toSeq.distinct
      .filter(_.startsWith("m")).sorted
    assert(matching.size >= 2, s"fixture needs ≥2 'm*' terms: $matching")
    val explicit = got(SpanQ(Near(Seq(
      Or(matching.map(Term(_))), Term("val")), 6)), 20)
    val prefix = got(SpanQ(Near(Seq(
      Multi(PrefixQ("m")), Term("val")), 6)), 20)
    val wildcard = got(SpanQ(Near(Seq(
      Multi(WildcardQ("m*")), Term("val")), 6)), 20)
    assert(explicit.nonEmpty && prefix == explicit && wildcard == explicit)
    // an expansion with no matches prunes the whole tree
    assert(got(SpanQ(Near(Seq(
      Multi(PrefixQ("zzznoprefix")), Term("val")), 6)), 20).isEmpty)
  }

  test("rewrite prunes dead span trees") {
    assert(Query.rewrite(SpanQ(Near(Nil, 2))) == MatchNoneQ)
    assert(Query.rewrite(SpanQ(Or(Nil))) == MatchNoneQ)
    assert(Query.rewrite(SpanQ(Not(Term("a"), Term("a")))) == MatchNoneQ)
    assert(Query.rewrite(SpanQ(First(Term("a"), 0))) == MatchNoneQ)
    // single-clause combinators collapse
    assert(Query.rewrite(SpanQ(Near(Seq(Or(Seq(Term("a")))), 2))) ==
      SpanQ(Term("a")))
  }
}
