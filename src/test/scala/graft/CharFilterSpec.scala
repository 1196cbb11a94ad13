package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Analysis
import graft.index.IndexBuilder

/** CharFilter stages (`analysis/common/.../charfilter/`): HTMLStrip
  * subset, MappingCharFilter greedy longest-match, PatternReplace, and
  * their '!'-composition ahead of flat AND positional tokenizers.
  */
class CharFilterSpec extends AnyFunSuite {

  test("htmlStrip: tags, comments, script/style, entities") {
    val in = "<html><body class='x'>Hello &amp; <b>world</b>" +
      "<!-- secret comment --><script>var evil = 1;</script>" +
      "<style>p { color: red }</style>&lt;tag&gt; &#65;&#x42; caf&eacute;</body></html>"
    val out = Analysis.htmlStrip(in)
    assert(!out.contains("<b>") && !out.contains("body"))
    assert(!out.contains("secret") && !out.contains("evil"))
    assert(!out.contains("color"))
    assert(out.contains("Hello & "))
    assert(out.contains("<tag>")) // decoded entity is literal text now
    assert(out.contains("AB"))    // numeric refs, decimal + hex
    assert(out.contains("caf&eacute;")) // unknown named entity passes through
    // tags become spaces — adjacent words never merge
    assert(Analysis.simpleTokens("a<br>b".pipe(Analysis.htmlStrip))
      .toSeq === Seq("a", "b"))
  }

  test("mappingFilter: greedy longest match, unmatched copy-through") {
    val f = Analysis.mappingFilter(Seq("ab" -> "X", "a" -> "y", "c" -> ""))
    assert(f("aab") === "yX")     // longest match wins at each position
    assert(f("abc") === "X")      // empty replacement deletes
    assert(f("zzz") === "zzz")
    val multi = Analysis.mappingFilter(Seq("ph" -> "f"))
    assert(multi("photograph") === "fotograf")
  }

  test("patternReplaceFilter") {
    val f = Analysis.patternReplaceFilter("[0-9]+", " ")
    assert(f("abc123def45") === "abc def ")
  }

  test("'!'-composed tokenizer specs: stages left-to-right, then tokenize") {
    val tok = IndexBuilder.tokenizerFn("replace=[0-9]+=> !mapping=a=>4!simple")
    // digits stripped FIRST, so the mapped '4' survives
    assert(tok("Batch batch99 batch").toSeq === Seq("b4tch", "b4tch", "b4tch"))
    val html = IndexBuilder.tokenizerFn("htmlstrip!simple")
    assert(html("<p>Hello &amp; <b>World</b></p>").toSeq ===
      Seq("hello", "world"))
    // positional base (commongrams) composes the same way
    val pos = IndexBuilder.posTokenizerFn("replace=[0-9]+=> !commongrams:the")
      .getOrElse(fail("positional chain did not resolve"))
    val (len, terms) = pos("the99 cat")
    assert(len === 2)
    assert(terms.map(_._1).toSet === Set("the", "cat", "the_cat"))
  }

  test("unknown char filter fails loudly") {
    intercept[RuntimeException] {
      IndexBuilder.tokenizerFn("bogusfilter!simple")
    }
  }

  private implicit class Piped[A](private val a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
