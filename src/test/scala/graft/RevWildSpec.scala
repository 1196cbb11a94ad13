package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.ReversedWildcard
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** ReversedWildcardFilter laws (`solr/core/.../analysis/
  * ReversedWildcardFilter.java:53-79`, `ReversedWildcardFilterFactory
  * .java:97-133`, `parser/SolrQueryParserBase.java:775-793`): the
  * marker-first token reversal, the factory's query-eligibility rules at
  * their defaults, pattern reversal as the string-level equivalent of
  * the parser's automaton reverse, and the end-to-end invisibility of
  * the machinery (same hits as a plain field) including the
  * false-positive subtraction for unreversed patterns.
  */
class RevWildSpec extends AnyFunSuite {

  test("reverseToken: marker first, surrogate pairs stay ordered") {
    assert(ReversedWildcard.reverseToken("spark") ==
      ReversedWildcard.Marker + "kraps")
    val smile = new String(Character.toChars(0x1F600))
    val r = ReversedWildcard.reverseToken("a" + smile + "b")
    assert(r == ReversedWildcard.Marker + "b" + smile + "a")
  }

  test("shouldReverse: the factory's rules at published defaults") {
    assert(ReversedWildcard.shouldReverse("*ark"))   // posA 0 < 2
    assert(ReversedWildcard.shouldReverse("?art"))   // posQ 0 < 1
    assert(ReversedWildcard.shouldReverse("a*rk"))   // posA 1 < 2
    assert(ReversedWildcard.shouldReverse("*k"))     // len-lastPos = 2 passes
    assert(!ReversedWildcard.shouldReverse("sp*rk")) // posA 2
    assert(!ReversedWildcard.shouldReverse("*"))     // len-lastPos = 1 < 2
    assert(!ReversedWildcard.shouldReverse("*kra*")) // trailing wildcard
    assert(!ReversedWildcard.shouldReverse("ab*"))   // no trailing chars
    assert(!ReversedWildcard.shouldReverse("spark")) // no wildcard at all
    assert(!ReversedWildcard.shouldReverse("s?ark")) // posQ 1, no '*'
    // the optional leading-fraction rule (disabled by default)
    assert(ReversedWildcard.shouldReverse("abc*defgh",
      maxPosAsterisk = 1, maxFractionAsterisk = 0.5f))
    assert(!ReversedWildcard.shouldReverse("abc*defgh", maxPosAsterisk = 1))
  }

  test("reversePattern: language equivalence on random token×pattern") {
    val rnd = new scala.util.Random(42)
    val ab = "abc"
    def tok() = (0 until 1 + rnd.nextInt(6))
      .map(_ => ab(rnd.nextInt(ab.length))).mkString
    def pat() = (0 until 1 + rnd.nextInt(5)).map { _ =>
      rnd.nextInt(4) match {
        case 0 => "*"
        case 1 => "?"
        case _ => ab(rnd.nextInt(ab.length)).toString
      }
    }.mkString
    var checked = 0
    for (_ <- 0 until 5000) {
      val t = tok(); val p = pat()
      val direct = t.matches(WildcardQ.toRegex(p))
      val reversed = ReversedWildcard.reverseToken(t)
        .matches(WildcardQ.toRegex(ReversedWildcard.reversePattern(p)))
      assert(direct == reversed, s"pattern '$p' token '$t'")
      if (direct) checked += 1
    }
    assert(checked > 100) // the property saw plenty of positives
  }

  test("reversed pattern exposes a prunable literal prefix") {
    val rp = ReversedWildcard.reversePattern("*ark")
    assert(rp == ReversedWildcard.Marker + "kra*")
    assert(rp.takeWhile(c => c != '*' && c != '?' && c != '\\') ==
      ReversedWildcard.Marker + "kra")
  }

  test("revwild tokenizer: overlay law, norm counts real positions") {
    val fn = IndexBuilder.posTokenizerFn("revwild").get
    val (normLen, toks) = fn("key spark")
    assert(normLen == 2)
    assert(toks.toSeq == Seq(
      (ReversedWildcard.Marker + "yek", 0), ("key", 0),
      (ReversedWildcard.Marker + "kraps", 1), ("spark", 1)))
    val (n2, t2) = IndexBuilder.posTokenizerFn("revwild_noorig").get("key")
    assert(n2 == 1 && t2.toSeq == Seq((ReversedWildcard.Marker + "yek", 0)))
  }

  test("end-to-end: reversal invisible, marker false positives excluded") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "spark landmark fast"),
      (2L, "key value store"),
      (3L, "network artwork"),
      (4L, "okra salad only")).toDF("doc_id", "text")
    def searcherFor(tok: String): Searcher = {
      val ix = IndexBuilder.buildLogical(docs, "text", Some("doc_id"), Nil,
        BuildConfig(tokenizer = tok))
      val dir = java.nio.file.Files.createTempDirectory("graft-rw").toString
      IndexBuilder.writeIndex(ix, dir, "snap", 1)
      ix.unpersistCached(); ix.postings.unpersist()
      new Searcher(spark, SegmentSearcher.load(dir))
    }
    val rw = searcherFor("revwild")
    val plain = searcherFor("simple")
    def ids(s: Searcher, q: Query): Set[Long] =
      s.search(q, 10).map(_.docId).toSet
    // reversed paths (leading * / minimal "*k") — identical to plain
    assert(ids(rw, WildcardQ("*ark")) == ids(plain, WildcardQ("*ark")))
    assert(ids(rw, WildcardQ("*ark")) == Set(1L))
    assert(ids(rw, WildcardQ("*k")) == ids(plain, WildcardQ("*k")))
    assert(ids(rw, WildcardQ("*k")) == Set(1L, 3L))
    // UNreversed path ("*kra*": only 1 trailing char → not eligible) —
    // reverse("spark") = "kraps" CONTAINS "kra", so docs 1 would leak
    // without the marker subtraction; only the real "okra" doc matches
    assert(ids(plain, WildcardQ("*kra*")) == Set(4L))
    assert(ids(rw, WildcardQ("*kra*")) == Set(4L))
    // withOriginal keeps plain term queries working
    assert(ids(rw, TermQ("key")) == Set(2L))
  }
}
