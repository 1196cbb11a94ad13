package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search._

/** Classic query-string parser → Query ADT (QueryParserBase.java:106-118
  * surface, subset grammar).
  */
class ParserSpec extends AnyFunSuite {

  def p(s: String): Query = QueryParser.parse(s)

  test("single term, lowered by query-time analysis") {
    assert(p("Spark") === TermQ("spark"))
  }

  test("implicit OR of bare terms") {
    assert(p("spark lucene") ===
      BoolQ(should = Seq(TermQ("spark"), TermQ("lucene")), minShouldMatch = 1))
  }

  test("+must and -mustNot occurs") {
    assert(p("+index -spark merge") ===
      BoolQ(must = Seq(TermQ("index")), should = Seq(TermQ("merge")),
        mustNot = Seq(TermQ("spark"))))
  }

  test("explicit AND / OR operators") {
    assert(p("index AND merge") ===
      BoolQ(must = Seq(TermQ("index"), TermQ("merge"))))
    assert(p("index OR merge OR score") ===
      BoolQ(should = Seq(TermQ("index"), TermQ("merge"), TermQ("score")),
        minShouldMatch = 1))
    assert(p("a && b") === p("a AND b"))
  }

  test("phrase query") {
    assert(p("\"order sort\"") === PhraseQ(Seq("order", "sort")))
    assert(p("\"Order SORT\"") === PhraseQ(Seq("order", "sort")))
  }

  test("prefix, fuzzy, boost") {
    assert(p("scan*") === PrefixQ("scan"))
    assert(p("merge~1") === FuzzyQ("merge", 1))
    assert(p("merge~") === FuzzyQ("merge", 2))
    assert(p("spark^2.5") === BoostQ(TermQ("spark"), 2.5f))
  }

  test("term range") {
    assert(p("[alpha TO beta]") === TermRangeQ("alpha", "beta", true, true))
    assert(p("{alpha TO beta}") === TermRangeQ("alpha", "beta", false, false))
  }

  test("grouping and nesting") {
    assert(p("(index OR merge) AND spark") ===
      BoolQ(must = Seq(
        BoolQ(should = Seq(TermQ("index"), TermQ("merge")), minShouldMatch = 1),
        TermQ("spark"))))
    assert(p("+(a b) -c") ===
      BoolQ(must = Seq(BoolQ(should = Seq(TermQ("a"), TermQ("b")),
        minShouldMatch = 1)), mustNot = Seq(TermQ("c"))))
  }

  test("field prefix accepted and dropped (single-field engine)") {
    assert(p("content:spark") === TermQ("spark"))
  }

  test("errors") {
    assertThrows[QueryParser.ParseError](p(""))
    assertThrows[QueryParser.ParseError](p("-only"))
    assertThrows[QueryParser.ParseError](p("(unclosed"))
    assertThrows[QueryParser.ParseError](p("[a TO"))
  }

  test("parsed query executes like the programmatic one") {
    val ix = {
      import TestSpark.spark.implicits._
      graft.index.IndexBuilder.buildLogical(
        TestSpark.spark.createDataset(graft.core.Corpus.generate(100, 5L)).toDF(),
        "content", None, Seq("repo", "path", "commit"))
    }
    val viaString = DataFrameSearcher.search(ix, p("index AND merge"), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaAdt = DataFrameSearcher.search(ix,
      Query.and(TermQ("index"), TermQ("merge")), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaString === viaAdt)
  }
}
