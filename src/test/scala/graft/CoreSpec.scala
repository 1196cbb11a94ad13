package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class CoreSpec extends AnyFunSuite {

  test("byte315 golden values from the reference javadoc") {
    // SmallFloat.java:76-79: smallest non-zero = 5.820766E-10,
    // largest = 7.5161928E9
    assert(SmallFloat.byte315ToFloat(1.toByte) === 5.820766e-10f)
    assert(SmallFloat.byte315ToFloat((-1).toByte) === 7.5161928e9f)
    assert(SmallFloat.byte315ToFloat(0.toByte) === 0.0f)
    assert(SmallFloat.floatToByte315(0f) === 0.toByte)
    assert(SmallFloat.floatToByte315(-1f) === 0.toByte)
    assert(SmallFloat.floatToByte315(1e-12f) === 1.toByte)  // underflow
    assert(SmallFloat.floatToByte315(1e12f) === (-1).toByte) // overflow
  }

  test("byte315 round-trip is idempotent (quantization fixpoint)") {
    var i = 0
    while (i < 256) {
      val f = SmallFloat.byte315ToFloat(i.toByte)
      assert(SmallFloat.floatToByte315(f) === i.toByte, s"byte $i")
      i += 1
    }
  }

  test("byte315 truncates toward zero exponent (reference behavior)") {
    // values between two representable points map to the LOWER one
    // (truncating 3-bit mantissa)
    val a = SmallFloat.byte315ToFloat(100.toByte)
    val b = SmallFloat.byte315ToFloat(101.toByte)
    val mid = (a + b) / 2
    assert(SmallFloat.floatToByte315(mid) === 100.toByte)
  }

  test("norm byte of common field lengths") {
    // normByte = floatToByte315(1/sqrt(len)); spot-check monotonicity and
    // distinctness across quantization buckets
    val lens = Seq(1, 2, 3, 4, 5, 8, 16, 64, 256, 1024)
    val unsigned = lens.map(l => Norms.normByte(l) & 0xff)
    assert(unsigned === unsigned.sorted.reverse, "norm byte decreases with length")
    assert(Norms.quantizedLength(1) === 1.0f)
  }

  test("quantizedLength matches NORM_TABLE composition and lengthRanges") {
    val ranges = Norms.lengthRanges(maxLen = 5000)
    // every length in [0, 5000] must fall in exactly one range with the
    // right quantized value
    var len = 0
    while (len <= 5000) {
      val q = Norms.quantizedLength(len)
      val hits = ranges.filter(r => r._1 <= len && len <= r._2)
      assert(hits.size === 1, s"len $len in ${hits.size} ranges")
      assert(hits.head._3 === q.toDouble, s"len $len")
      len += 1
    }
  }

  test("simpleTokens: ASCII alnum runs, lowercased") {
    assert(Analysis.simpleTokens("The fast Fox; jumps-over_2 dogs!").toSeq ===
      Seq("the", "fast", "fox", "jumps", "over", "2", "dogs"))
    assert(Analysis.simpleTokens("").isEmpty)
    assert(Analysis.simpleTokens("   ").isEmpty)
    assert(Analysis.simpleTokens("a").toSeq === Seq("a"))
    // non-ASCII characters act as delimiters
    assert(Analysis.simpleTokens("héllo wörld").toSeq ===
      Seq("h", "llo", "w", "rld"))
    // >255-char tokens dropped (StandardAnalyzer maxTokenLength analog)
    assert(Analysis.simpleTokens("x" * 256).isEmpty)
    assert(Analysis.simpleTokens("x" * 255).head.length === 255)
  }

  test("simpleTokenBounds: lowercase substrings at bounds == simpleTokens") {
    def check(s: String): Unit = {
      val bounds = Analysis.simpleTokenBounds(s)
      assert(bounds.length % 2 == 0)
      val viaBounds = (0 until bounds.length / 2).map { i =>
        s.substring(bounds(2 * i), bounds(2 * i) + bounds(2 * i + 1))
          .toLowerCase(java.util.Locale.ROOT)
      }
      assert(viaBounds == Analysis.simpleTokens(s).toSeq, s"input: $s")
      // encode/decode round-trip
      val blob = graft.index.IndexBuilder.encodeTokenBounds(bounds)
      assert(graft.index.IndexBuilder.decodeTokenBounds(blob).toSeq ==
        bounds.toSeq)
    }
    check("The fast Fox; jumps-over_2 dogs!")
    check("")
    check("   ")
    check("a")
    check("héllo wörld")
    check("x" * 256) // over-long run dropped in both
    check("x" * 255)
    check("A" * 300 + " ok " + "b" * 255)
    // randomized parity over mixed alphabets
    val rnd = new scala.util.Random(7L)
    val alphabet = "aA1 .é-_\tz9Z"
    (1 to 200).foreach { _ =>
      check(Array.fill(rnd.nextInt(80))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
  }

  test("codeTokens: WordDelimiterFilter-style splits") {
    assert(Analysis.codeTokens("getHttpResponse2").toSeq ===
      Seq("get", "http", "response", "2"))
    assert(Analysis.codeTokens("parse_JSON_fast").toSeq ===
      Seq("parse", "json", "fast"))
    assert(Analysis.codeTokens("HTTPServer").toSeq === Seq("http", "server"))
    assert(Analysis.codeTokens("val maxDocs = 42").toSeq ===
      Seq("val", "max", "docs", "42"))
  }

  test("unicodeTokens: UAX#29-subset word break over mixed scripts") {
    import graft.core.Analysis.unicodeTokens
    // ASCII behaves exactly like simpleTokens (runs, lowercase)
    assert(unicodeTokens("Hello, World 42!").toSeq ===
      Seq("hello", "world", "42"))
    // Han + Hiragana: one token per code point; Katakana: runs
    assert(unicodeTokens("Hello, 世界!").toSeq === Seq("hello", "世", "界"))
    assert(unicodeTokens("日本語のテキスト").toSeq ===
      Seq("日", "本", "語", "の", "テキスト"))
    // Katakana breaks against Latin (WB13 boundary)
    assert(unicodeTokens("カタカナabc").toSeq === Seq("カタカナ", "abc"))
    // Hangul syllables form runs like other letters
    assert(unicodeTokens("한국어 text").toSeq === Seq("한국어", "text"))
    // precomposed and combining-mark accents both stay in the token
    assert(unicodeTokens("Café naïve").toSeq === Seq("café", "naïve"))
    assert(unicodeTokens("Café").toSeq === Seq("café"))
    // Cyrillic/Greek lowercase via ROOT locale
    assert(unicodeTokens("Привет МИР").toSeq === Seq("привет", "мир"))
    assert(unicodeTokens("ΩΜΕΓΑ").toSeq === Seq("ωμεγα"))
    // digits attach to letter runs, CJK digits split per ideograph
    assert(unicodeTokens("42度C").toSeq === Seq("42", "度", "c"))
    // supplementary-plane ideograph (surrogate pair) handled by code point
    assert(unicodeTokens("x𣎴y").toSeq === Seq("x", "𣎴", "y"))
    assert(unicodeTokens("").toSeq === Seq())
    assert(unicodeTokens(null).toSeq === Seq())
  }

  test("standardTokens: stopwords removed") {
    assert(Analysis.standardTokens("the quick and THE slow").toSeq ===
      Seq("quick", "slow"))
  }

  test("patternTokens: regex-split tokenizer (PatternTokenizer group=-1)") {
    val tok = Analysis.patternTokens("[,;\\s]+")
    assert(tok("a,b; c  d").toSeq === Seq("a", "b", "c", "d"))
    assert(tok("Foo,BAR").toSeq === Seq("foo", "bar"))
    assert(tok("").toSeq === Seq.empty)
    // usable as a build tokenizer by name
    assert(graft.index.IndexBuilder.tokenizerFn("pattern:[,]+")("x,Y").toSeq
      === Seq("x", "y"))
  }

  test("edgeNGrams: leading-edge grams min..max (EdgeNGramTokenFilter)") {
    assert(Analysis.edgeNGrams(Array("spark"), 2, 4).toSeq
      === Seq("sp", "spa", "spar"))
    assert(Analysis.edgeNGrams(Array("ab", "c"), 2, 3).toSeq === Seq("ab"))
    assert(graft.index.IndexBuilder.tokenizerFn("edge:1:2")("Hi there").toSeq
      === Seq("h", "hi", "t", "th"))
  }

  test("commonGrams: the reference index-side matrix with positions") {
    // stop words "of" "the" "s" — the reference fixture
    // (CommonGramsFilterTest.java:161-248); expected = (term, position)
    // pairs where a posInc-0 gram repeats its first word's position
    val common = Set("of", "the", "s")
    def cg(s: String) =
      Analysis.commonGrams(s.split(" ").filter(_.nonEmpty), common).toSeq
    assert(cg("the") == Seq(("the", 0)))
    assert(cg("foo") == Seq(("foo", 0)))
    assert(cg("brown fox") == Seq(("brown", 0), ("fox", 1)))
    assert(cg("the fox") == Seq(("the", 0), ("the_fox", 0), ("fox", 1)))
    assert(cg("fox of") == Seq(("fox", 0), ("fox_of", 0), ("of", 1)))
    assert(cg("of the") == Seq(("of", 0), ("of_the", 0), ("the", 1)))
    assert(cg("quick brown fox") ==
      Seq(("quick", 0), ("brown", 1), ("fox", 2)))
    assert(cg("quick brown the") ==
      Seq(("quick", 0), ("brown", 1), ("brown_the", 1), ("the", 2)))
    assert(cg("quick the fox") == Seq(("quick", 0), ("quick_the", 0),
      ("the", 1), ("the_fox", 1), ("fox", 2)))
    assert(cg("fox of the") == Seq(("fox", 0), ("fox_of", 0),
      ("of", 1), ("of_the", 1), ("the", 2)))
    assert(cg("the quick brown") ==
      Seq(("the", 0), ("the_quick", 0), ("quick", 1), ("brown", 2)))
    assert(cg("the fox of") == Seq(("the", 0), ("the_fox", 0),
      ("fox", 1), ("fox_of", 1), ("of", 2)))
    assert(cg("of the fox") == Seq(("of", 0), ("of_the", 0),
      ("the", 1), ("the_fox", 1), ("fox", 2)))
    assert(cg("of the of") == Seq(("of", 0), ("of_the", 0),
      ("the", 1), ("the_of", 1), ("of", 2)))
  }

  test("commonGramsQuery: the reference query-side matrix") {
    val common = Set("of", "the", "s")
    def q(s: String) =
      Analysis.commonGramsQuery(s.split(" ").filter(_.nonEmpty), common).toSeq
    // CommonGramsFilterTest.java:90-158 — every case
    assert(q("brown fox") == Seq("brown", "fox"))
    assert(q("the fox") == Seq("the_fox"))
    assert(q("fox of") == Seq("fox_of"))
    assert(q("of the") == Seq("of_the"))
    assert(q("the") == Seq("the"))
    assert(q("foo") == Seq("foo"))
    assert(q("quick brown fox") == Seq("quick", "brown", "fox"))
    assert(q("quick brown the") == Seq("quick", "brown_the"))
    assert(q("quick the brown") == Seq("quick_the", "the_brown"))
    assert(q("fox of the") == Seq("fox_of", "of_the"))
    assert(q("the quick brown") == Seq("the_quick", "quick", "brown"))
    assert(q("the fox of") == Seq("the_fox", "fox_of"))
    assert(q("of the fox") == Seq("of_the", "the_fox"))
    assert(q("of the of") == Seq("of_the", "the_of"))
  }

  test("synonymTokens: expansion overlays, directed replacement, norm law") {
    val rules = Analysis.parseSynonymRules("fast,rapid;column=>col")
    // expansion group: original kept, overlay at the SAME position
    assert(Analysis.synonymTokens(Array("the", "fast", "scan"), rules)
      .toSeq == Seq(("the", 0), ("fast", 1), ("rapid", 1), ("scan", 2)))
    // group is symmetric: rapid also overlays fast
    assert(Analysis.synonymTokens(Array("rapid"), rules)
      .toSeq == Seq(("rapid", 0), ("fast", 0)))
    // directed rule: original REPLACED at its position (keepOrig=false)
    assert(Analysis.synonymTokens(Array("a", "column", "b"), rules)
      .toSeq == Seq(("a", 0), ("col", 1), ("b", 2)))
    // three-member group expands to both others
    val r3 = Analysis.parseSynonymRules("a,b,c")
    assert(Analysis.synonymTokens(Array("b"), r3)
      .toSeq == Seq(("b", 0), ("a", 0), ("c", 0)))
    // directed rule with two outputs at one position
    val r2 = Analysis.parseSynonymRules("x=>y,z")
    assert(Analysis.synonymTokens(Array("x"), r2)
      .toSeq == Seq(("y", 0), ("z", 0)))
    // loud rejections: multi-word, singleton group, expand∩directed
    assertThrows[IllegalArgumentException](
      Analysis.parseSynonymRules("domain name=>dns"))
    assertThrows[IllegalArgumentException](Analysis.parseSynonymRules("solo"))
    assertThrows[IllegalArgumentException](
      Analysis.parseSynonymRules("a,b;a=>c"))
  }

  test("asciiFold: reference mapping matrix, pass-through, idempotence") {
    import graft.core.AsciiFold.fold
    // diacritic strip (NFD path) — capitals stay capitals
    assert(fold("café") == "cafe")
    assert(fold("Étude") == "Etude")
    assert(fold("ÀÁÂÃÄÅ àáâãäå") == "AAAAAA aaaaaa")
    assert(fold("ÈÉÊË èéêë ÌÍÎÏ ìíîï") == "EEEE eeee IIII iiii")
    assert(fold("ÒÓÔÕÖ òóôõö ÙÚÛÜ ùúûü ÝŸ ýÿ Ññ Çç") ==
      "OOOOO ooooo UUUU uuuu YY yy Nn Cc")
    assert(fold("ĀāĒēĪīŌōŪū ČčŠšŽž ĞğŞş") == "AaEeIiOoUu CcSsZz GgSs")
    // non-decomposable specials (the explicit table)
    assert(fold("ß Æ æ Œ œ Ø ø Đ đ Ð ð Þ þ Ł ł Ħ ħ ı ŋ ſ") ==
      "ss AE ae OE oe O o D d D d TH th L l H h i n s")
    // decompose-then-special chains (Ǽ → Æ+acute → AE)
    assert(fold("Ǽǣ") == "AEae")
    // non-Latin scripts byte-identical (incl. precomposed accents)
    for (s <- Seq("Ελλάδα", "ά", "москва", "й", "中文", "한글"))
      assert(fold(s) == s, s)
    // ASCII fast path + idempotence
    assert(fold("plain ascii 42!") == "plain ascii 42!")
    for (s <- Seq("café", "straße", "Þór", "łódź"))
      assert(fold(fold(s)) == fold(s))
    // tokenizer composition: folding precedes the simple chain
    assert(graft.index.IndexBuilder.tokenizerFn("asciifold")(
      "Crème Brûlée straße").toSeq == Seq("creme", "brulee", "strasse"))
  }

  test("BM25 formula spot checks (hand-computed, SURVEY.md §2.5)") {
    // idf = ln(1 + (N - df + 0.5)/(df + 0.5))
    assert(math.abs(graft.search.BM25.idf(1, 2) -
      math.log(1 + (2 - 1 + 0.5) / 1.5).toFloat) < 1e-9)
    // avgdl = (float)(sumTTF / (double) docCount)
    assert(graft.search.BM25.avgFieldLength(10, 4) === 2.5f)
    assert(graft.search.BM25.avgFieldLength(0, 4) === 1f)
    // score monotonic in tf, saturating below weight*(k1+1)... bound
    val p = graft.search.BM25.Default
    val cache = graft.search.BM25.normCache(p, 10f)
    val w = graft.search.BM25.weightValue(graft.search.BM25.idf(2, 100), p)
    val nb = Norms.normByte(10) & 0xff
    val s1 = graft.search.BM25.score(w, 1f, cache(nb))
    val s2 = graft.search.BM25.score(w, 2f, cache(nb))
    val s100 = graft.search.BM25.score(w, 100f, cache(nb))
    assert(s1 < s2 && s2 < s100 && s100 < w)
    // BM25Params validation (TestBM25Similarity.java:37-54)
    assertThrows[IllegalArgumentException](graft.search.BM25Params(Float.NaN, 0.75f))
    assertThrows[IllegalArgumentException](graft.search.BM25Params(1.2f, 2f))
    assertThrows[IllegalArgumentException](graft.search.BM25Params(-1f, 0.75f))
  }
}
