package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search._

/** XmlQueryParser → Query AST mapping, element by element against the
  * reference builders (queryparser/xml/builders/). Execution parity is
  * oracle-gated (q_xml_bool / q_xml_dismax / q_xml_span_near); this spec
  * pins the tree shapes, attribute defaults, and rejection laws.
  */
class XmlParserSpec extends AnyFunSuite {

  private def p(xml: String): Query = XmlQueryParser.parse(xml)

  test("TermQuery with and without boost") {
    assert(p("<TermQuery>spark</TermQuery>") == TermQ("spark"))
    assert(p("""<TermQuery boost="2.5">spark</TermQuery>""") ==
      BoostQ(TermQ("spark"), 2.5f))
  }

  test("TermsQuery analyzes text into SHOULD terms with msm") {
    assert(p("""<TermsQuery minimumNumberShouldMatch="2">Spark KEY dup</TermsQuery>""") ==
      BoolQ(should = Seq(TermQ("spark"), TermQ("key"), TermQ("dup")),
        minShouldMatch = 2))
  }

  test("BooleanQuery occurs mapping incl. filter; default should") {
    val q = p("""<BooleanQuery minimumNumberShouldMatch="1">
        <Clause occurs="must"><TermQuery>a</TermQuery></Clause>
        <Clause occurs="mustNot"><TermQuery>b</TermQuery></Clause>
        <Clause occurs="filter"><TermQuery>c</TermQuery></Clause>
        <Clause><TermQuery>d</TermQuery></Clause>
      </BooleanQuery>""")
    assert(q == BoolQ(must = Seq(TermQ("a")), should = Seq(TermQ("d")),
      mustNot = Seq(TermQ("b")), filter = Seq(TermQ("c")),
      minShouldMatch = 1))
  }

  test("RangeQuery include defaults are true (RangeQueryBuilder.java:38-39)") {
    assert(p("""<RangeQuery lowerTerm="aa" upperTerm="bb"/>""") ==
      TermRangeQ("aa", "bb", true, true))
    assert(p("""<RangeQuery lowerTerm="aa" upperTerm="bb" includeUpper="false"/>""") ==
      TermRangeQ("aa", "bb", true, false))
  }

  test("DisjunctionMaxQuery: child elements are disjuncts, tie default 0") {
    assert(p("""<DisjunctionMaxQuery>
        <TermQuery>a</TermQuery><TermQuery>b</TermQuery>
      </DisjunctionMaxQuery>""") ==
      DisMaxQ(Seq(TermQ("a"), TermQ("b")), 0f))
  }

  test("ConstantScoreQuery and MatchAllDocsQuery") {
    assert(p("""<ConstantScoreQuery><TermQuery>a</TermQuery></ConstantScoreQuery>""") ==
      ConstScoreQ(TermQ("a")))
    assert(p("<MatchAllDocsQuery/>") == MatchAllQ)
  }

  test("BoostingQuery: context boost attr on BoostQuery child, default 0.01") {
    assert(p("""<BoostingQuery>
        <Query><TermQuery>a</TermQuery></Query>
        <BoostQuery boost="0.4"><TermQuery>b</TermQuery></BoostQuery>
      </BoostingQuery>""") == BoostingQ(TermQ("a"), TermQ("b"), 0.4f))
    assert(p("""<BoostingQuery>
        <Query><TermQuery>a</TermQuery></Query>
        <BoostQuery><TermQuery>b</TermQuery></BoostQuery>
      </BoostingQuery>""") == BoostingQ(TermQ("a"), TermQ("b"), 0.01f))
  }

  test("BoostingTermQuery = payload-average span term (BoostingTermBuilder)") {
    assert(p("<BoostingTermQuery>a</BoostingTermQuery>") ==
      PayloadScoreQ(Span.Term("a"), "avg", includeSpanScore = true))
  }

  test("UserQuery delegates to the classic parser") {
    assert(p("<UserQuery>+dup spark -window</UserQuery>") ==
      QueryParser.parse("+dup spark -window"))
  }

  test("span tree: Near/Or/OrTerms/First/Not with reference defaults") {
    assert(p("""<SpanNear slop="3">
        <SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm>
      </SpanNear>""") ==
      SpanQ(Span.Near(Seq(Span.Term("a"), Span.Term("b")), 3,
        inOrder = false))) // inOrder default false (SpanNearBuilder)
    assert(p("""<SpanOr><SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanOr>""") ==
      SpanQ(Span.Or(Seq(Span.Term("a"), Span.Term("b")))))
    assert(p("<SpanOrTerms>A b</SpanOrTerms>") ==
      SpanQ(Span.Or(Seq(Span.Term("a"), Span.Term("b")))))
    assert(p("""<SpanFirst end="5"><SpanTerm>a</SpanTerm></SpanFirst>""") ==
      SpanQ(Span.First(Span.Term("a"), 5)))
    assert(p("""<SpanFirst><SpanTerm>a</SpanTerm></SpanFirst>""") ==
      SpanQ(Span.First(Span.Term("a"), 1))) // end default 1
    assert(p("""<SpanNot>
        <Include><SpanTerm>a</SpanTerm></Include>
        <Exclude><SpanTerm>b</SpanTerm></Exclude>
      </SpanNot>""") == SpanQ(Span.Not(Span.Term("a"), Span.Term("b"))))
  }

  test("top-level span boost folds to BoostQ; nested span boost rejected") {
    assert(p("""<SpanNear slop="2" boost="1.5">
        <SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm>
      </SpanNear>""") ==
      BoostQ(SpanQ(Span.Near(Seq(Span.Term("a"), Span.Term("b")), 2,
        inOrder = false)), 1.5f))
    intercept[IllegalArgumentException] {
      p("""<SpanNear slop="2">
          <SpanTerm boost="2">a</SpanTerm><SpanTerm>b</SpanTerm>
        </SpanNear>""")
    }
  }

  test("doctype declarations rejected (untrusted input)") {
    intercept[Exception] {
      p("""<!DOCTYPE foo [<!ENTITY x "y">]><TermQuery>&x;</TermQuery>""")
    }
  }

  test("unknown elements fail loudly") {
    intercept[Exception](p("<FrobnicateQuery>a</FrobnicateQuery>"))
  }
}
