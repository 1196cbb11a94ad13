package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.IndexBuilder
import graft.search._

/** Pluggable spell-checker string distances
  * (`DirectSpellChecker.setDistance`, `spell/JaroWinklerDistance.java`,
  * `LevensteinDistance.java`, `LuceneLevenshteinDistance.java`,
  * `NGramDistance.java`) and the WordBreakSpellChecker
  * (`spell/WordBreakSpellChecker.java`) — hand-computed goldens for the
  * reference's documented quirks, then the search-surface laws over a
  * planted corpus with fully controlled document frequencies.
  */
class WordBreakSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  /** Planted corpus: term → df is exact by construction (term appears in
    * docs 1..df, one doc per row).
    */
  private val plantedDf = Map(
    "a" -> 10, "ab" -> 1, "aa" -> 9, "b" -> 8, "aab" -> 5,
    "c" -> 10, "cd" -> 1, "cc" -> 9, "d" -> 8,
    "foo" -> 3, "bar" -> 4, "baz" -> 2, "foobar" -> 1,
    "hello" -> 3, "hallo" -> 1, "help" -> 2, "jello" -> 2,
    "hell" -> 1, "hella" -> 2, "hells" -> 1)

  private lazy val searcher: Searcher = {
    import spark.implicits._
    val docs = (1 to 10).map { i =>
      val text = plantedDf.collect { case (t, df) if i <= df => t }
        .toSeq.sorted.mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val ix = IndexBuilder.buildLogical(docs, "text", Some("doc_id"), Nil)
    val dir = java.nio.file.Files.createTempDirectory("graft-wb").toString
    IndexBuilder.writeIndex(ix, dir, "snap", 1)
    ix.unpersistCached(); ix.postings.unpersist()
    new Searcher(spark, SegmentSearcher.load(dir))
  }

  // ---------------------------------------------------------------- //
  // StringDistances goldens                                          //
  // ---------------------------------------------------------------- //

  test("levenstein: 1 - d/maxLen, equals an independent textbook DP") {
    def lev(a: String, b: String): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 0 to a.length) dp(i)(0) = i
      for (j <- 0 to b.length) dp(0)(j) = j
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) +
            (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val rnd = new scala.util.Random(7L)
    for (_ <- 1 to 300) {
      val a = Seq.fill(rnd.nextInt(8))(('a' + rnd.nextInt(3)).toChar).mkString
      val b = Seq.fill(rnd.nextInt(8))(('a' + rnd.nextInt(3)).toChar).mkString
      val want =
        if (a.isEmpty || b.isEmpty) { if (a.length == b.length) 1f else 0f }
        else 1.0f - lev(a, b).toFloat / math.max(a.length, b.length)
      assert(StringDistances.levenstein(a, b) == want, s"'$a' vs '$b'")
    }
    // empty-string laws (LevensteinDistance.java:52-58)
    assert(StringDistances.levenstein("", "") == 1f)
    assert(StringDistances.levenstein("a", "") == 0f)
  }

  test("luceneLevenshtein: OSA (not unrestricted Damerau), min-len scale") {
    // adjacent transposition costs 1
    assert(StringDistances.luceneLevenshtein("ab", "ba") == 0.5f)
    // ca→abc: unrestricted Damerau = 2 but OSA = 3 (each substring
    // edited at most once) → 1 - 3/2 = -0.5 — negative via the MIN-length
    // divisor (LuceneLevenshteinDistance.java:75)
    assert(StringDistances.luceneLevenshtein("ca", "abc") == -0.5f)
    // code points, not UTF-16 units: a surrogate-pair swap is one
    // transposition over 2 code points (4 chars)
    val s1 = new String(Character.toChars(0x1D552)) + "b"
    val s2 = "b" + new String(Character.toChars(0x1D552))
    assert(StringDistances.luceneLevenshtein(s1, s2) == 0.5f)
    // the reference's own empty-string quirk: returns a DISTANCE here
    // (0 for two empties, max length for one) — transcribed as-is
    assert(StringDistances.luceneLevenshtein("", "") == 0f)
    assert(StringDistances.luceneLevenshtein("abc", "") == 3f)
  }

  test("jaroWinkler: classic goldens + the reference's two deviations") {
    def jw(a: String, b: String) = StringDistances.jaroWinkler(a, b)
    assert(math.abs(jw("martha", "marhta") - 0.9611111f) < 1e-6f)
    assert(math.abs(jw("dwayne", "duane") - 0.84f) < 1e-6f)
    assert(jw("abc", "xyz") == 0f) // zero matches short-circuit
    // deviation 1: prefix bonus NOT capped at 4 (JaroWinklerDistance
    // .java:95 uses the raw shared-prefix length): streams/streamer
    // share 6 — textbook Winkler (cap 4) would give 0.9214286
    assert(math.abs(jw("streams", "streamer") - 0.9476191f) < 1e-6f)
    // deviation 2: bonus only at jaro >= threshold (default 0.7):
    // abcdef/abxxxx shares prefix 2 but jaro = 0.5555556 < 0.7 → raw jaro
    val j = jw("abcdef", "abxxxx")
    assert(math.abs(j - 0.5555556f) < 1e-6f, s"got $j")
  }

  test("ngram: DP goldens incl. prefix-pad discount and short fallback") {
    assert(StringDistances.ngram("abc", "abc") == 1f)
    assert(StringDistances.ngram("ab", "ba") == 0f) // hand-traced DP
    assert(StringDistances.ngram("a", "ab") == 0.5f) // < n fallback path
    assert(StringDistances.ngram("", "") == 1f)
    assert(StringDistances.ngram("ab", "") == 0f)
    val g = StringDistances.ngram("gumbo", "gambol")
    assert(g > 0f && g < 1f)
  }

  // ---------------------------------------------------------------- //
  // suggestDistance surface                                          //
  // ---------------------------------------------------------------- //

  test("suggestDistance: 3-level ranking law (score, df desc, term asc)") {
    val got = searcher.suggestDistance("hello", 10, "levenshtein").toSeq
    // candidates: lev<=2, first char 'h', term itself excluded.
    // hallo/hell/hella/hells all score 1-1/5 = 0.8 → df desc (hella 2)
    // then term asc; help scores 1-2/5 = 0.6.
    assert(got.map(_._1) == Seq("hella", "hallo", "hell", "hells", "help"),
      s"got $got")
    assert(got.map(_._3) == Seq(2L, 1L, 1L, 1L, 2L))
    // expected scores in the engine's own float op order (1 - d/maxLen)
    assert(got.take(4).forall(_._2 == 1.0f - 1.0f / 5) &&
      got.last._2 == 1.0f - 2.0f / 5)
  }

  test("suggestDistance: first-char pin and accuracy cull") {
    val got = searcher.suggestDistance("hello", 10, "levenshtein").toSeq
    // jello is 1 edit away but starts with 'j' — FuzzyTermsEnum is built
    // with prefix >= 1 (DirectSpellChecker.java:394)
    assert(!got.exists(_._1 == "jello"))
    val strict = searcher
      .suggestDistance("hello", 10, "levenshtein", accuracy = 0.7f).toSeq
    assert(strict.map(_._1) == Seq("hella", "hallo", "hell", "hells"))
  }

  test("suggestDistance: jarowinkler reranks where levenshtein ties") {
    val got = searcher.suggestDistance("hello", 10, "jarowinkler").toSeq
    // jw separates the lev-0.8 tie group: hell (jaro .9333, prefix 4 →
    // .96) tops hella/hells (.92, tie broken df desc), then hallo
    // (prefix 1 → .88), then help (.848)
    assert(got.map(_._1) == Seq("hell", "hella", "hells", "hallo", "help"),
      s"got $got")
    val scores = got.map(_._2)
    assert(scores == scores.sorted.reverse)
    got.sliding(2).foreach {
      case Seq((t1, s1, d1), (t2, s2, d2)) =>
        assert(s1 > s2 || (s1 == s2 && (d1 > d2 || (d1 == d2 && t1 < t2))))
      case _ =>
    }
  }

  // ---------------------------------------------------------------- //
  // WordBreakSpellChecker laws                                       //
  // ---------------------------------------------------------------- //

  test("breaks: SUGGEST_WHEN_NOT_IN_INDEX — indexed term yields nothing") {
    assert(searcher.suggestWordBreaks("foobar", 5).isEmpty)
    assert(searcher.suggestWordBreaks("aab", 5).isEmpty)
  }

  test("breaks: 2-word and 3-word parses, fewer-words-first ranking") {
    val got = searcher.suggestWordBreaks("foobarbaz", 5, maxChanges = 2)
      .map(_.toSeq).toSeq
    // foobar IS indexed → the 2-split [foobar baz] emits at level 1; the
    // 3-split [foo bar baz] is reachable only through the NON-indexed
    // right piece "barbaz" (recursion gates on the left piece alone)
    assert(got == Seq(
      Seq(("foobar", 1L), ("baz", 2L)),
      Seq(("foo", 3L), ("bar", 4L), ("baz", 2L))), s"got $got")
    // maxChanges=1 cannot reach the 3-word parse
    val one = searcher.suggestWordBreaks("foobarbaz", 5).map(_.toSeq).toSeq
    assert(one == Seq(Seq(("foobar", 1L), ("baz", 2L))))
  }

  test("breaks: LengthThenMaxFreq vs LengthThenSumFreq orderings") {
    // ccd → [c cd] (max 10, sum 11) and [cc d] (max 9, sum 17)
    val byMax = searcher.suggestWordBreaks("ccd", 5)
      .map(_.map(_._1).mkString(" ")).toSeq
    assert(byMax == Seq("c cd", "cc d"), s"got $byMax")
    val bySum = searcher.suggestWordBreaks("ccd", 5, sumFreqSort = true)
      .map(_.map(_._1).mkString(" ")).toSeq
    assert(bySum == Seq("cc d", "c cd"), s"got $bySum")
  }

  test("breaks: SUGGEST_MORE_POPULAR floors pieces at the term's own df") {
    // aab is indexed (df 5): pieces must reach df 5 → [a ab] dies (ab=1),
    // [aa b] survives (9, 8)
    val got = searcher.suggestWordBreaks("aab", 5, morePopular = true)
      .map(_.toSeq).toSeq
    assert(got == Seq(Seq(("aa", 9L), ("b", 8L))), s"got $got")
  }

  test("breaks: minBreakWordLength bounds the split points") {
    assert(searcher
      .suggestWordBreaks("foobarbaz", 5, minBreakWordLength = 4,
        maxChanges = 2).isEmpty)
    // and a term shorter than 2*minBreakWordLength cannot split at all
    assert(searcher
      .suggestWordBreaks("ccd", 5, minBreakWordLength = 2).isEmpty)
  }

  // ---------------------------------------------------------------- //
  // suggestWordCombinations laws                                     //
  // ---------------------------------------------------------------- //

  test("combine: needs one absent original; separator blocks the window") {
    // foo and bar are BOTH indexed → minFreq > 0 → nothing
    assert(searcher.suggestWordCombinations(Seq("foo", "bar"), 5).isEmpty)
    // fo + obar: fo absent → foobar suggested with its real df
    val got = searcher.suggestWordCombinations(Seq("fo", "obar"), 5).toSeq
    assert(got == Seq(("foobar", 1L, 0, 1)), s"got $got")
    // the empty SEPARATOR term prevents combining across it
    assert(searcher
      .suggestWordCombinations(Seq("fo", "", "obar"), 5).isEmpty)
  }

  test("combine: maxChanges window and maxCombineWordLength cap") {
    val parts = Seq("fo", "ob", "ar")
    assert(searcher.suggestWordCombinations(parts, 5, maxChanges = 1).isEmpty)
    val got = searcher
      .suggestWordCombinations(parts, 5, maxChanges = 2).toSeq
    assert(got == Seq(("foobar", 1L, 0, 2)), s"got $got")
    assert(searcher.suggestWordCombinations(parts, 5, maxChanges = 2,
      maxCombineWordLength = 5).isEmpty)
  }

  test("combine: suggestAlways bypasses the absent-original requirement") {
    val got = searcher
      .suggestWordCombinations(Seq("foo", "bar"), 5, suggestAlways = true)
      .toSeq
    assert(got == Seq(("foobar", 1L, 0, 1)), s"got $got")
  }
}
