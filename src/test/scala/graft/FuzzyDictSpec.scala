package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search.SegmentSearcher

/** Property tests for the sorted-dict fuzzy expansion (prefix-reuse DP +
  * subtree skip — the FuzzyQuery.java:53 / AutomatonQuery.java:48
  * intersection class): results must equal an INDEPENDENT brute-force
  * Levenshtein filter over the same dictionary.
  */
class FuzzyDictSpec extends AnyFunSuite {

  /** Textbook full-matrix Levenshtein, written independently of the
    * engine's banded/prefix-reuse DP.
    */
  private def lev(a: String, b: String): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) dp(i)(0) = i
    for (j <- 0 to b.length) dp(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val c = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + c)
    }
    dp(a.length)(b.length)
  }

  private def randWord(rnd: scala.util.Random, maxLen: Int): String = {
    val n = 1 + rnd.nextInt(maxLen)
    val sb = new StringBuilder
    // small alphabet → dense shared prefixes → the skip path is exercised
    (1 to n).foreach(_ => sb.append(('a' + rnd.nextInt(4)).toChar))
    sb.toString
  }

  test("fuzzyDictTerms == brute force (500 random dict/query trials)") {
    val meta = new scala.util.Random(20260817L)
    for (trial <- 1 to 500) {
      val rnd = new scala.util.Random(meta.nextLong())
      val dict = Array.fill(50 + rnd.nextInt(300))(randWord(rnd, 8))
        .distinct.sorted
      val t = randWord(rnd, 8)
      val e = rnd.nextInt(3)
      val got = SegmentSearcher.fuzzyDictTerms(dict, t, e, Int.MaxValue)
      val want = dict.filter(w => lev(w, t) <= e).toSeq
      assert(got == want, s"trial=$trial t=$t e=$e")
    }
  }

  test("maxExpansions caps in dictionary order") {
    val dict = Array("aa", "ab", "ac", "ad", "ba").sorted
    val got = SegmentSearcher.fuzzyDictTerms(dict, "aa", 1, 2)
    assert(got == Seq("aa", "ab"))
  }

  test("exact term at edits 0; empty at impossible distance") {
    val dict = Array("alpha", "beta", "gamma")
    assert(SegmentSearcher.fuzzyDictTerms(dict, "beta", 0, 10) == Seq("beta"))
    assert(SegmentSearcher.fuzzyDictTerms(dict, "zzzzzzzz", 1, 10).isEmpty)
  }
}
