package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{FreeText, Percolator}
import graft.ops.Percolator.PQuery
import graft.search._

/** Percolator matcher laws + FreeTextSuggester model-walk laws beyond
  * what the DuckDB gate pins.
  */
class PercFreeTextSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def mem(s: String) =
    Percolator.buildMem(graft.core.Analysis.simpleTokens(s))

  test("per-doc matcher: term/prefix/wildcard/bool") {
    val m = mem("the quick brown fox jumps")
    assert(Percolator.matches(m, TermQ("fox")))
    assert(!Percolator.matches(m, TermQ("dog")))
    assert(Percolator.matches(m, PrefixQ("qui")))
    assert(Percolator.matches(m, WildcardQ("j?mps")))
    assert(!Percolator.matches(m, WildcardQ("j?mp")))  // whole-term
    assert(Percolator.matches(m, BoolQ(must = Seq(TermQ("fox")),
      mustNot = Seq(TermQ("dog")))))
    assert(!Percolator.matches(m, BoolQ(should = Seq(TermQ("dog"),
      TermQ("cat"), TermQ("fox")), minShouldMatch = 2)))
  }

  test("per-doc matcher: exact and sloppy phrases") {
    val m = mem("alpha beta gamma alpha delta")
    assert(Percolator.matches(m, PhraseQ(Seq("alpha", "beta"))))
    assert(!Percolator.matches(m, PhraseQ(Seq("beta", "alpha"))))
    assert(!Percolator.matches(m, PhraseQ(Seq("alpha", "gamma"))))
    assert(Percolator.matches(m, PhraseQ(Seq("alpha", "gamma"), 1)))
    assert(Percolator.matches(m, PhraseQ(Seq("beta", "delta"), 2)))
    assert(!Percolator.matches(m, PhraseQ(Seq("beta", "delta"), 1)))
    assert(Percolator.matches(m, PhraseQ(Seq("alpha", "beta", "gamma"))))
  }

  test("unsupported query shapes rejected at registration") {
    import spark.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Percolator.percolate(docs, "text", "doc_id",
        Seq(PQuery(1, FuzzyQ("ab", 1)))).collect()
    }
  }

  test("percolate is one pass: pairs match per-doc recompute") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark sorts the order fast"),
      (2L, "order comes before sort order sort"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val qs = Seq(PQuery(10, TermQ("spark")),
      PQuery(11, PhraseQ(Seq("order", "sort"))),
      PQuery(12, PrefixQ("sor")))
    val got = Percolator.percolate(docs, "text", "doc_id", qs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 12L), (2L, 11L), (2L, 12L)))
  }

  // ---------- FreeText ----------

  private lazy val model: FreeText.Model = {
    import spark.implicits._
    val docs = Seq(
      (1L, "order sort order sort order sample"),
      (2L, "order sample sort sample sample"),
      (3L, "sort order sample order sort")).toDF("doc_id", "text")
    val ix = graft.index.IndexBuilder.buildLogical(docs, "text", Some("doc_id"),
      Nil, graft.index.IndexBuilder.BuildConfig(numBuckets = 2, numDocShards = 1,
        saltThreshold = 1000000L))
    val m = FreeText.build(ix.postings)
    ix.unpersistCached(); ix.postings.unpersist()
    m
  }

  test("freetext: bigram scores = c/ctxCount, unigram backoff at ALPHA") {
    // corpus bigrams after 'order': sort×3, sample×3; order count = 6
    // -> equal values, tie broken by key asc ('order sample' first)
    val MaxD = Long.MaxValue.toDouble
    val got = FreeText.lookup(model, "order s", 5)
    val expBi = Seq(
      ("order sort", ((MaxD * 1.0) * 3 / 6).toLong),
      ("order sample", ((MaxD * 1.0) * 3 / 6).toLong))
    // both last-tokens seen by the bigram model -> unigram adds nothing
    assert(got == expBi.sortBy { case (k, v) => (-v, k) })
  }

  test("freetext: unigram completions survive when unseen; trailing space" +
      " upgrades to bigram-only") {
    val MaxD = Long.MaxValue.toDouble
    // key 'sample s': ctx=sample, bigrams after sample: sort×1, sample×1
    // unigram model adds nothing new (both seen); but 'sort s' has ctx
    // sort with bigram (sort, order)+(sort, sample): filter s* keeps
    // sample only -> unigram then contributes 'sort' (unseen)
    val got = FreeText.lookup(model, "sort s", 5).toMap
    assert(got.contains("sort sample"))          // bigram prediction
    assert(got.contains("sort"))                 // unigram backoff, ALPHA
    assert(got("sort") == ((MaxD * FreeText.Alpha) * 5 / 16).toLong)
    // trailing space: bigram-only (no unigram predictions from empty)
    val ended = FreeText.lookup(model, "order ", 5)
    assert(ended.map(_._1).forall(_.startsWith("order ")))
    assert(ended.size == 2)
  }

  test("freetext: unknown context discounts via backoff, empty input rejected") {
    val got = FreeText.lookup(model, "zzz s", 5)
    // bigram model saw no 'zzz' -> ONE backoff discount on unigram scores
    val MaxD = Long.MaxValue.toDouble
    assert(got.toMap.apply("sample") ==
      (((MaxD * FreeText.Alpha) * 5) / 16).toLong)
    intercept[IllegalArgumentException] { FreeText.lookup(model, "  ", 5) }
  }

  // ---------- Shingles ----------

  test("shingles: n-grams, separator, short-input empty") {
    import graft.core.Analysis
    assert(Analysis.shingles(Array("a", "b", "c"), 2).toSeq ==
      Seq("a b", "b c"))
    assert(Analysis.shingles(Array("a", "b", "c", "d"), 3).toSeq ==
      Seq("a b c", "b c d"))
    assert(Analysis.shingles(Array("a"), 2).isEmpty)
    intercept[IllegalArgumentException](Analysis.shingles(Array("a"), 1))
  }

  test("shingle index: TermQ('a b') hit set == exact PhraseQ membership") {
    import spark.implicits._
    val docs = Seq(
      (1L, "order sort order merge"),
      (2L, "sort order and more order sort here"),
      (3L, "order then much later sort"),
      (4L, "merge sort order sort order sort")).toDF("doc_id", "text")
    def build(tok: String) = {
      val ix = graft.index.IndexBuilder.buildLogical(docs, "text",
        Some("doc_id"), Nil, graft.index.IndexBuilder.BuildConfig(
          numBuckets = 2, numDocShards = 1, saltThreshold = 100000L,
          tokenizer = tok))
      val dir = java.nio.file.Files.createTempDirectory(s"graft-sh").toString
      graft.index.IndexBuilder.writeIndex(ix, dir, "snap", 1)
      ix.unpersistCached(); ix.postings.unpersist()
      new Searcher(spark, SegmentSearcher.load(dir))
    }
    val plain = build("simple")
    val shingled = build("shingle:2")
    val viaShingle = shingled.search(TermQ("order sort"), 10)
      .map(_.docId).toSet
    val viaPhrase = plain.search(PhraseQ(Seq("order", "sort")), 10)
      .map(_.docId).toSet
    assert(viaShingle == viaPhrase && viaShingle == Set(1L, 2L, 4L))
  }
}
