package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Analysis, Corpus}
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** TermAutomatonQuery against three independent sources of truth:
  * (1) hand-traced freq cases for the countMatches law
  * (TermAutomatonScorer.java:227-345), including the ANY gap walk and
  * its duplicate-fork consequence; (2) a brute-force per-start-position
  * DFA walk (valid for ANY-free automatons, where the gap walk never
  * runs and each (start, end) window steps the deterministic automaton
  * exactly once); (3) the gate-proven flat scorers on shapes both can
  * express (chain automaton == ordered slop-0 SpanNear). Plus
  * forced-distributed parity.
  */
class TermAutomatonSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // ---------- automaton fixtures ----------

  private def chain(terms: String*): TermAutomaton = {
    val b = new TermAutomatonBuilder
    val states = (0 to terms.size).map(_ => b.createState())
    b.setAccept(states.last, true)
    terms.zipWithIndex.foreach { case (t, i) =>
      b.addTransition(states(i), states(i + 1), t)
    }
    b.finish()
  }

  /** 0 -a-> 1 -ANY-> 2 -b-> 3(acc) */
  private def anyGap(a: String, bTerm: String): TermAutomaton = {
    val b = new TermAutomatonBuilder
    val s = (0 to 3).map(_ => b.createState())
    b.setAccept(s(3), true)
    b.addTransition(s(0), s(1), a)
    b.addAnyTransition(s(1), s(2))
    b.addTransition(s(2), s(3), bTerm)
    b.finish()
  }

  private def freqOf(ta: TermAutomaton, tokens: Seq[String]): Int = {
    val ids = ta.terms.zipWithIndex.toMap
    val pairs = tokens.zipWithIndex.collect {
      case (t, p) if ids.contains(t) => (p, ids(t))
    }
    TermAutomaton.countFreq(ta, pairs.map(_._1).toArray,
      pairs.map(_._2).toArray)
  }

  // ---------- (1) hand-traced countMatches law ----------

  test("chain automaton: adjacency counting, no ANY") {
    val ta = chain("order", "sort")
    assert(freqOf(ta, Seq("order", "sort")) == 1)
    assert(freqOf(ta, Seq("sort", "order")) == 0)
    assert(freqOf(ta, Seq("order", "order", "sort")) == 1)
    assert(freqOf(ta, Seq("order", "sort", "order", "sort")) == 2)
    assert(freqOf(ta, Seq("order", "x", "sort")) == 0)
    // overlapping starts: each start position is its own state instance
    assert(freqOf(chain("a", "a"), Seq("a", "a", "a")) == 2)
  }

  test("union-depth automaton: accepts at multiple path lengths") {
    // 0 -sort-> acc, 0 -order-> 1 -sort-> acc
    val b = new TermAutomatonBuilder
    val s = (0 to 2).map(_ => b.createState())
    b.setAccept(s(2), true)
    b.addTransition(s(0), s(2), "sort")
    b.addTransition(s(0), s(1), "order")
    b.addTransition(s(1), s(2), "sort")
    val ta = b.finish()
    assert(freqOf(ta, Seq("sort")) == 1)
    assert(freqOf(ta, Seq("order", "sort")) == 2) // start-accept + chain
    assert(freqOf(ta, Seq("sort", "sort")) == 2)
    assert(freqOf(ta, Seq("order")) == 0)
  }

  test("ANY gap walk: traversal, petering, and the duplicate fork") {
    val ta = anyGap("order", "sort")
    // gap token not in the term set: exactly one path
    assert(freqOf(ta, Seq("order", "x", "sort")) == 1)
    // adjacent: ANY needs one token between — no match
    assert(freqOf(ta, Seq("order", "sort")) == 0)
    // two gap tokens: automaton has exactly one ANY hop — no match
    assert(freqOf(ta, Seq("order", "x", "x", "sort")) == 0)
    // THE reference quirk (TermAutomatonScorer.java:266-320): a query
    // term in the gap both term-steps (ANY arcs expand to every term id,
    // TermAutomatonQuery.java:155-180) and gap-ANY-steps from the same
    // position, forking a duplicate state instance — freq 2, not 1
    assert(freqOf(ta, Seq("order", "sort", "sort")) == 2)
    // start anchoring: matches only start on term steps
    assert(freqOf(ta, Seq("x", "order", "x", "sort")) == 1)
  }

  test("leading/trailing ANY rejected like the reference") {
    val b1 = new TermAutomatonBuilder
    val s1 = (0 to 1).map(_ => b1.createState())
    b1.setAccept(s1(1), true)
    b1.addAnyTransition(s1(0), s1(1))
    b1.addTransition(s1(0), s1(1), "a")
    intercept[IllegalArgumentException](b1.finish())

    val b2 = new TermAutomatonBuilder
    val s2 = (0 to 2).map(_ => b2.createState())
    b2.setAccept(s2(2), true)
    b2.addTransition(s2(0), s2(1), "a")
    b2.addAnyTransition(s2(1), s2(2))
    intercept[IllegalArgumentException](b2.finish())
  }

  // ---------- (2) brute-force equivalence, ANY-free ----------

  /** Independent law for ANY-free automatons: freq = number of windows
    * (start, end] whose token run lands the NFA-subset simulation in an
    * accepting subset — each window walks once (the DFA is
    * deterministic), and without ANY arcs no gap walk ever forks.
    */
  private def bruteFreq(arcs: Seq[(Int, String, Int)], acc: Set[Int],
      tokens: Seq[String]): Int = {
    var freq = 0
    for (start <- tokens.indices) {
      var cur = Set(0)
      var i = start
      while (cur.nonEmpty && i < tokens.size) {
        cur = arcs.collect {
          case (s, t, d) if cur.contains(s) && t == tokens(i) => d
        }.toSet
        if (cur.exists(acc.contains)) freq += 1
        // a window only continues while the subset is alive; acceptance
        // deeper in is counted by this same walk, and longer windows from
        // the same start are prefixes of it — stop only on death
        i += 1
      }
    }
    freq
  }

  test("countFreq == per-start subset walk on random ANY-free automatons") {
    val rnd = new scala.util.Random(20260819L)
    val alphabet = Vector("a", "b", "c", "d")
    for (trial <- 1 to 300) {
      val nStates = 2 + rnd.nextInt(4)
      val b = new TermAutomatonBuilder
      val states = (0 until nStates).map(_ => b.createState())
      val nArcs = 1 + rnd.nextInt(6)
      val arcs = (1 to nArcs).map { _ =>
        val src = rnd.nextInt(nStates)
        // keep arcs out of state 0 so the brute walk's one-start-per-
        // position framing stays exact (re-entering 0 makes an instance
        // coincide with the unconditional start step — legal, but then
        // the clean per-window law no longer holds; countFreq handles it,
        // the hand-traced suite is the authority there)
        val dst = 1 + rnd.nextInt(nStates - 1)
        (src, alphabet(rnd.nextInt(alphabet.size)), dst)
      }.distinct
      val acc = (1 until nStates).filter(_ => rnd.nextBoolean()).toSet
      if (acc.nonEmpty && arcs.nonEmpty) {
        arcs.foreach { case (s, t, d) => b.addTransition(states(s), states(d), t) }
        acc.foreach(a => b.setAccept(states(a), true))
        val ta = b.finish()
        val tokens = (1 to 3 + rnd.nextInt(12))
          .map(_ => alphabet(rnd.nextInt(alphabet.size)))
        assert(freqOf(ta, tokens) == bruteFreq(arcs, acc, tokens),
          s"trial $trial arcs=$arcs acc=$acc tokens=$tokens")
      }
    }
  }

  // ---------- (3) engine parity on a real index ----------

  private lazy val (searcher, distSearcher, docsToks) = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-tautomaton").toString
    val files = Corpus.generate(250, seed = 53L)
    val ix = IndexBuilder.buildLogical(
      spark.createDataset(files).repartition(4).toDF(),
      "content", None, Seq("repo", "path", "commit"),
      BuildConfig(numBuckets = 4, numDocShards = 2))
    IndexBuilder.writeIndex(ix, tmp, "tas", 1)
    val toks = ix.docs.select("docId", "content").collect()
      .map(r => r.getLong(0) -> Analysis.simpleTokens(r.getString(1)))
      .toMap
    ix.unpersistCached(); ix.postings.unpersist()
    val idx = SegmentSearcher.load(tmp)
    (new Searcher(spark, idx),
      new Searcher(spark, idx, maxLocalBytes = 0), toks)
  }

  test("chain automaton == ordered slop-0 SpanNear, bit-exact") {
    val pairs = Seq(("def", "val"), ("index", "merge"), ("val", "def"))
    for ((a, bT) <- pairs) {
      val auto = searcher.search(TermAutomatonQ(chain(a, bT)), 20).toSeq
        .map(h => (h.docId, h.score))
      val near = searcher.search(SpanNearQ(Seq(a, bT), 0), 20).toSeq
        .map(h => (h.docId, h.score))
      assert(auto == near, s"pair=($a,$bT)")
    }
    assert(searcher.search(TermAutomatonQ(chain("def", "val")), 20).nonEmpty)
  }

  test("branching automaton == independent recompute from raw tokens") {
    // 0 -def-> 1; 1 -val-> 2(acc); 1 -index-> 2(acc)
    val b = new TermAutomatonBuilder
    val s = (0 to 2).map(_ => b.createState())
    b.setAccept(s(2), true)
    b.addTransition(s(0), s(1), "def")
    b.addTransition(s(1), s(2), "val")
    b.addTransition(s(1), s(2), "index")
    val ta = b.finish()
    val hits = searcher.search(TermAutomatonQ(ta), 15)
    assert(hits.nonEmpty)
    val m = searcher.index.manifest
    // expected: freq per doc via the brute subset walk; score via the
    // engine-independent scalar BM25 with the span idf-fold convention
    val arcs = Seq((0, "def", 1), (1, "val", 2), (1, "index", 2))
    val dfs = Seq("def", "val", "index").map { t =>
      t -> docsToks.count(_._2.contains(t)).toLong
    }.toMap
    var idfSum = 0f
    dfs.keys.toSeq.sorted.foreach { t =>
      if (dfs(t) > 0) idfSum += BM25.idf(dfs(t), m.docCount)
    }
    val w = BM25.weightValue(idfSum, searcher.index.bm25)
    val cache = BM25.normCache(searcher.index.bm25,
      BM25.avgFieldLength(m.sumTotalTermFreq, m.docCount))
    val expected = docsToks.toSeq.flatMap { case (id, toks) =>
      val f = bruteFreq(arcs, Set(2), toks.toSeq)
      if (f == 0) None
      else {
        val nb = graft.core.Norms.normByte(toks.length)
        Some((id, BM25.score(w, f.toFloat, cache(nb & 0xff))))
      }
    }.sortBy { case (id, sc) => (-sc, id) }.take(15)
      .map { case (id, sc) => (id, sc.toDouble) }
    assert(hits.toSeq.map(h => (h.docId, h.score)) == expected)
  }

  test("forced-distributed parity (maxLocalBytes = 0)") {
    val ta = chain("def", "val")
    val local = searcher.search(TermAutomatonQ(ta), 20).toSeq
      .map(h => (h.docId, h.score))
    val dist = distSearcher.search(TermAutomatonQ(ta), 20).toSeq
      .map(h => (h.docId, h.score))
    assert(local == dist && local.nonEmpty)
  }

  test("non-BM25 sims rejected loudly") {
    val ex = intercept[Exception] {
      searcher.search(TermAutomatonQ(chain("def", "val")), 5,
        None, true, SegmentSearcher.SimClassic)
    }
    assert(ex.getMessage.contains("BM25") ||
      ex.getMessage.toLowerCase.contains("classic"))
  }
}
