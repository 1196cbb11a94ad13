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

  test("wildcard terms: trailing * stays prefix, mid-token becomes wildcard") {
    assert(QueryParser.parse("te*") === PrefixQ("te"))
    assert(QueryParser.parse("te*t") === WildcardQ("te*t"))
    assert(QueryParser.parse("te?t") === WildcardQ("te?t"))
    assert(QueryParser.parse("TE?T") === WildcardQ("te?t"))
    assert(QueryParser.parse("a*b*c") === WildcardQ("a*b*c"))
    assert(WildcardQ.toRegex("te*t") === "^te.*t$")
    assert(WildcardQ.toRegex("te?t") === "^te.t$")
  }

  test("AND chains parse flat (one BoolQ, no nested float rounding)") {
    assert(QueryParser.parse("a AND b AND c")
      === BoolQ(must = Seq(TermQ("a"), TermQ("b"), TermQ("c"))))
  }

  test("dismax mm spec resolution (SolrPluginUtils semantics)") {
    assert(QueryParser.resolveMm("3", 5) === 3)
    assert(QueryParser.resolveMm("-2", 5) === 3)
    assert(QueryParser.resolveMm("75%", 4) === 3)
    assert(QueryParser.resolveMm("-25%", 4) === 3)
    assert(QueryParser.resolveMm("100%", 7) === 7)
    assert(QueryParser.resolveMm("9", 4) === 4) // capped at n
    assert(QueryParser.parseDisMax("dup spark key vector", "75%")
      === BoolQ(should = Query.terms("dup", "spark", "key", "vector"),
        minShouldMatch = 3))
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

  test("complex phrase: slots, groups, slop, single-term short-circuit") {
    // single plain-term phrase returns the TermQuery itself
    assert(QueryParser.parseComplexPhrase("\"order\"") === TermQ("order"))
    // wildcard slot -> Span.Multi, term slot -> Span.Term, ~slop
    assert(QueryParser.parseComplexPhrase("\"ord* merge\"~4") ===
      SpanQ(Span.Near(Seq(Span.Multi(PrefixQ("ord")), Span.Term("merge")), 4)))
    // mid-token wildcard and fuzzy slots
    assert(QueryParser.parseComplexPhrase("\"o?der sort~1\"") ===
      SpanQ(Span.Near(Seq(Span.Multi(WildcardQ("o?der")),
        Span.Multi(FuzzyQ("sort", 1))), 0)))
    // (a b) group -> Span.Or
    assert(QueryParser.parseComplexPhrase("\"(order merge) sort\"~2") ===
      SpanQ(Span.Near(Seq(Span.Or(Seq(Span.Term("order"), Span.Term("merge"))),
        Span.Term("sort")), 2)))
    // mixed-sign law: include widened by numNegatives, exclude = all slots
    assert(QueryParser.parseComplexPhrase("\"order -sort merge\"~1") ===
      SpanQ(Span.Not(
        Span.Near(Seq(Span.Term("order"), Span.Term("merge")), 2),
        Span.Near(Seq(Span.Term("order"), Span.Term("sort"),
          Span.Term("merge")), 1))))
    // lone positive include stays unwrapped
    assert(QueryParser.parseComplexPhrase("\"order -sort\"") ===
      SpanQ(Span.Not(Span.Term("order"),
        Span.Near(Seq(Span.Term("order"), Span.Term("sort")), 0))))
    assertThrows[QueryParser.ParseError](
      QueryParser.parseComplexPhrase("\"-a -b\""))
    assertThrows[QueryParser.ParseError](
      QueryParser.parseComplexPhrase("no quotes"))
  }

  test("surround: distance ops, infix/prefix parity, booleans") {
    val sp = QueryParser.parseSurround(_)
    // prefix W: distance k -> slop k-1, ordered
    assert(sp("3w(order, sort)") ===
      SpanQ(Span.Near(Seq(Span.Term("order"), Span.Term("sort")), 2)))
    // default distance 1 -> slop 0 (adjacency)
    assert(sp("w(order, sort)") ===
      SpanQ(Span.Near(Seq(Span.Term("order"), Span.Term("sort")), 0)))
    // N unordered
    assert(sp("4n(order, merge)") ===
      SpanQ(Span.Near(Seq(Span.Term("order"), Span.Term("merge")), 3,
        inOrder = false)))
    // infix chain folds into ONE distance query, LAST operator's distance
    assert(sp("order 4w sort 4w merge") ===
      SpanQ(Span.Near(Seq(Span.Term("order"), Span.Term("sort"),
        Span.Term("merge")), 3)))
    assert(sp("order 2w sort 5w merge") === sp("5w(order, sort, merge)"))
    // truncation inside a distance op -> Span.Multi
    assert(sp("2w(ord*, sort)") ===
      SpanQ(Span.Near(Seq(Span.Multi(PrefixQ("ord")), Span.Term("sort")), 1)))
    // OR group inside a distance op -> Span.Or
    assert(sp("(order OR merge) 3w sort") ===
      SpanQ(Span.Near(Seq(Span.Or(Seq(Span.Term("order"), Span.Term("merge"))),
        Span.Term("sort")), 2)))
    // booleans: AND/OR/NOT above the distance layer
    assert(sp("order AND sort") === Query.and(TermQ("order"), TermQ("sort")))
    assert(sp("order OR sort") ===
      BoolQ(should = Seq(TermQ("order"), TermQ("sort")), minShouldMatch = 1))
    assert(sp("order NOT sort") ===
      BoolQ(must = Seq(TermQ("order")), mustNot = Seq(TermQ("sort"))))
    // a word starting with w/n is a term, not an operator
    assert(sp("window") === TermQ("window"))
    // AND inside a distance op is rejected (distanceSubQueryNotAllowed)
    assertThrows[QueryParser.ParseError](sp("3w(order AND sort, merge)"))
  }

  test("simple query parser: ops, precedence, leniency") {
    val sp = (x: String) => QueryParser.parseSimple(x)
    assert(sp("dup + (spark | key)") === BoolQ(must = Seq(TermQ("dup"),
      BoolQ(should = Seq(TermQ("spark"), TermQ("key")), minShouldMatch = 1))))
    assert(sp("batch + -spark") ===
      BoolQ(must = Seq(TermQ("batch")), mustNot = Seq(TermQ("spark"))))
    // default operator = SHOULD: bare whitespace ORs
    assert(sp("dup spark") ===
      BoolQ(should = Seq(TermQ("dup"), TermQ("spark")), minShouldMatch = 1))
    assert(QueryParser.parseSimple("dup spark", defaultOp = "and") ===
      BoolQ(must = Seq(TermQ("dup"), TermQ("spark"))))
    // '|' binds looser than '+'
    assert(sp("a + b | c") === BoolQ(should = Seq(
      BoolQ(must = Seq(TermQ("a"), TermQ("b"))), TermQ("c")),
      minShouldMatch = 1))
    // phrase with slop, prefix star
    assert(sp("\"order sort\"~2") === PhraseQ(Seq("order", "sort"), 2))
    assert(sp("scan*") === PrefixQ("scan"))
    // leniency: stray trailing operator and unterminated group survive
    assert(sp("dup +") === TermQ("dup"))
    assert(sp("(dup | spark") ===
      BoolQ(should = Seq(TermQ("dup"), TermQ("spark")), minShouldMatch = 1))
  }
}
