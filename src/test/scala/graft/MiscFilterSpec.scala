package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** Miscellaneous analysis filters (`lucene/analysis/common/.../
  * miscellaneous/`): StemmerOverrideFilter (override wins, Porter skipped
  * on keyword hits), TruncateTokenFilter, LimitTokenCountFilter, and the
  * FilteringTokenFilter pair KeepWordFilter / LengthFilter whose dropped
  * tokens leave position HOLES (`util/FilteringTokenFilter.java:60-75`
  * accumulates skipped position increments).
  */
class MiscFilterSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("stemoverride: dictionary hit replaces and skips Porter") {
    val f = IndexBuilder.tokenizerFn(
      "stemoverride:querying=>interrogation;running=>sprint")
    // overridden tokens take the dictionary output verbatim (keyword set,
    // PorterStemFilter.java:48 skips); the rest porter-stem
    assert(f("querying tables running queries").toSeq ==
      Seq("interrogation", "tabl", "sprint", "queri"))
    // without the override the same tokens porter-stem
    assert(Porter.stem("querying") == "queri")
    assert(Porter.stem("running") == "run")
  }

  test("truncate: prefix cut at n UTF-16 units, shorter tokens intact") {
    val f = IndexBuilder.tokenizerFn("truncate:4")
    assert(f("batch big stream a").toSeq == Seq("batc", "big", "stre", "a"))
  }

  test("limittok: first n tokens only") {
    val f = IndexBuilder.tokenizerFn("limittok:3")
    assert(f("a b c d e").toSeq == Seq("a", "b", "c"))
    assert(f("a b").toSeq == Seq("a", "b"))
  }

  test("keepword: survivors keep ORIGINAL positions; norm counts kept") {
    val f = IndexBuilder.posTokenizerFn("keepword:spark;data").get
    val (norm, toks) = f("spark the big data")
    assert(norm == 2)
    assert(toks.toSeq == Seq(("spark", 0), ("data", 3))) // hole at 1-2
  }

  test("lengthfilter: char-length band with the same hole law") {
    val f = IndexBuilder.posTokenizerFn("lengthfilter:4:6").get
    val (norm, toks) = f("a spark to stream xy filter")
    assert(norm == 3)
    assert(toks.toSeq == Seq(("spark", 1), ("stream", 3), ("filter", 5)))
  }

  test("scandinavian fold: the javadoc equivalence classes conflate") {
    import graft.core.Scandinavian.fold
    // ScandinavianFoldingFilter.java:33-35 documented equalities
    Seq("blåbærsyltetøj", "blåbärsyltetöj", "blaabaarsyltetoej",
      "blaabaersyltetoej", "blabarsyltetoj")
      .foreach(w => assert(fold(w) == "blabarsyltetoj", w))
    Seq("räksmörgås", "ræksmørgås", "ræksmörgaos", "raeksmoergaas",
      "raksmorgas")
      .foreach(w => assert(fold(w) == "raksmorgas", w))
    // one-pass overlap law: "aae" deletes the second 'a' and moves PAST
    // the produced "ae" (a replace-chain would collapse it again)
    assert(fold("aae") == "ae")
    assert(fold("aaaa") == "aa")
    // a mapped å does NOT re-check the digraph rule at the same slot
    assert(fold("åa") == "aa")
  }

  test("scandinavian normalize: digraphs become national letters") {
    import graft.core.Scandinavian.normalize
    Seq("blåbærsyltetøj", "blåbärsyltetöj", "blaabaersyltetoej")
      .foreach(w => assert(normalize(w) == "blåbærsyltetøj", w))
    Seq("räksmörgås", "ræksmørgås", "raeksmoergaas")
      .foreach(w => assert(normalize(w) == "ræksmørgås", w))
    assert(normalize("ao") == "å")
    assert(normalize("oo") == "ø")
  }

  test("porterexcept: pattern-matched tokens skip the stemmer") {
    val f = IndexBuilder.tokenizerFn("porterexcept:quer.*")
    assert(f("querying merged queries").toSeq ==
      Seq("querying", "merg", "queries"))
  }

  test("pathhier: prefixes at one shared position, norm length 1") {
    val f = IndexBuilder.posTokenizerFn("pathhier").get
    val (n1, t1) = f("/a/b/c")
    assert(n1 == 1)
    assert(t1.toSeq == Seq(("/a", 0), ("/a/b", 0), ("/a/b/c", 0)))
    // no leading delimiter; doubled and trailing delimiters keep the
    // reference's endDelimiter forms
    assert(f("a/b")._2.map(_._1).toSeq == Seq("a", "a/b"))
    assert(f("a//b")._2.map(_._1).toSeq == Seq("a", "a/", "a//b"))
    assert(f("a/b/")._2.map(_._1).toSeq == Seq("a", "a/b", "a/b/"))
    val (n0, t0) = f("")
    assert(n0 == 0 && t0.isEmpty)
    // custom delimiter
    assert(IndexBuilder.posTokenizerFn("pathhier:.").get("a.b.c")
      ._2.map(_._1).toSeq == Seq("a", "a.b", "a.b.c"))
  }

  test("capture: groups overlay at the source position, whole-token skip") {
    val f = IndexBuilder.posTokenizerFn("capture:([a-z]+)|([0-9]+)").get
    val (n, toks) = f("file123 spark 99")
    assert(n == 3)
    // originals first, then per-region groups; "spark" and "99" capture
    // only their whole selves — skipped by the preserveOriginal guard
    assert(toks.toSeq == Seq(("file123", 0), ("file", 0), ("123", 0),
      ("spark", 1), ("99", 2)))
  }

  test("core tokenizers: keyword / whitespace / letter laws") {
    assert(IndexBuilder.tokenizerFn("keyword")("Status-OK x").toSeq ==
      Seq("Status-OK x"))
    assert(IndexBuilder.tokenizerFn("keyword")("").isEmpty)
    assert(IndexBuilder.tokenizerFn("whitespace")("Spark  SPARK! y\tz")
      .toSeq == Seq("Spark", "SPARK!", "y", "z"))
    assert(IndexBuilder.tokenizerFn("letter")("file123x Data9Base").toSeq ==
      Seq("file", "x", "data", "base"))
  }

  test("cjkbigram: run bigrams, lone unigram, mixed-script boundaries") {
    import graft.core.Analysis.cjkBigramTokens
    assert(cjkBigramTokens("spark 数据库").toSeq ==
      Seq("spark", "数据", "据库"))
    assert(cjkBigramTokens("库").toSeq == Seq("库"))
    assert(cjkBigramTokens("数据 analysis").toSeq ==
      Seq("数据", "analysis"))
    // katakana runs bigram per codepoint too (the filter buffers the
    // codepoints of run tokens)
    assert(cjkBigramTokens("カタカナ test").toSeq ==
      Seq("カタ", "タカ", "カナ", "test"))
    // an ASCII word ADJACENT to a CJK run still breaks it
    assert(cjkBigramTokens("ab数据cd").toSeq == Seq("ab", "数据", "cd"))
    // four-char run: three bigrams, no unigrams
    assert(cjkBigramTokens("数据库系").toSeq == Seq("数据", "据库", "库系"))
    // pure ASCII equals the simple law
    assert(cjkBigramTokens("The Spark2 row").toSeq ==
      Seq("the", "spark2", "row"))
  }

  test("end-to-end: exact phrase does not match across a keepword hole") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark data fast"),     // adjacent: phrase matches
      (2L, "spark the data fast"), // hole at pos 1: exact must NOT match
      (3L, "data spark")           // transposed: needs slop >= 2
    ).toDF("doc_id", "text")
    val ix = IndexBuilder.buildLogical(docs, "text", Some("doc_id"), Nil,
      BuildConfig(numBuckets = 2, numDocShards = 1,
        saltThreshold = 1000000L, tokenizer = "keepword:spark;data;fast"))
    val d = java.nio.file.Files.createTempDirectory("graft-keepw").toString
    IndexBuilder.writeIndex(ix, d, "snap", 1)
    ix.unpersistCached(); ix.postings.unpersist()
    val s = new Searcher(spark, SegmentSearcher.load(d))
    assert(s.search(PhraseQ(Seq("spark", "data")), 10)
      .map(_.docId).toSet == Set(1L))
    // slop 1 bridges exactly one dropped token's hole
    assert(s.search(PhraseQ(Seq("spark", "data"), slop = 1), 10)
      .map(_.docId).toSet == Set(1L, 2L))
    // norms counted survivors: doc 2 indexed 3 tokens, not 4 — its
    // "spark" norm equals doc 1's ("the" never reached the stream)
    val h1 = s.search(TermQ("fast"), 10).map(h => h.docId -> h.score).toMap
    assert(h1(1L) == h1(2L))
    s.close()
  }
}
