package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.IndexBuilder

/** NGramTokenFilter (`analysis/common/.../ngram/NGramTokenFilter
  * .java:44-84`) and the KeywordRepeat+Porter+RemoveDuplicates recipe
  * (`miscellaneous/KeywordRepeatFilter.java:28`) as position-aware
  * tokenizers.
  */
class TokenFilterSpec extends AnyFunSuite {

  test("ngram: pos-major gram order, sub-min removal, norm counts kept") {
    val fn = IndexBuilder.posTokenizerFn("ngram:2:3").get
    val (normLen, toks) = fn("abcd x of")
    // "x" (1 cp) is removed by the CodepointCountFilter wrap; norm
    // length counts the SURVIVING tokens; grams keep the source
    // token's position (original posInc on the first, 0 after)
    assert(normLen == 2)
    assert(toks.toSeq == Seq(
      ("ab", 0), ("abc", 0), ("bc", 0), ("bcd", 0), ("cd", 0),
      ("of", 2)))
  }

  test("ngram: min == max degenerates to a sliding window") {
    // (the gram cutter itself counts code points; the simple chain in
    // front only passes ASCII runs, so that fidelity is unobservable
    // here and matters only for future non-ASCII tokenizer chains)
    val fn = IndexBuilder.posTokenizerFn("ngram:2:2").get
    val (normLen, toks) = fn("abc ab a")
    assert(normLen == 2)
    assert(toks.toSeq == Seq(("ab", 0), ("bc", 0), ("ab", 1)))
  }

  test("ngram: bad bounds rejected") {
    intercept[IllegalArgumentException](
      IndexBuilder.posTokenizerFn("ngram:3:2").get.apply("x"))
  }

  test("porter_inject: stem overlays only when it differs") {
    val fn = IndexBuilder.posTokenizerFn("porter_inject").get
    val (normLen, toks) = fn("queries sort merged")
    assert(normLen == 3)
    // sort stems to itself → RemoveDuplicates collapses the repeat
    assert(toks.toSeq == Seq(
      ("queries", 0), ("queri", 0), ("sort", 1), ("merged", 2), ("merg", 2)))
  }
}
