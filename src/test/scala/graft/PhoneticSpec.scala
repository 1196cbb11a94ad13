package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Phonetic
import graft.index.IndexBuilder

/** PhoneticFilter + PhoneticFilterFactory laws
  * (`lucene/analysis/phonetic/.../PhoneticFilter.java:30-80`,
  * `PhoneticFilterFactory.java:95-105`): the commons-codec delegation
  * (the reference's own implementation strategy), the inject/replace
  * token laws, the overlay position/norm law, and published NARA
  * Soundex vectors as external goldens.
  */
class PhoneticSpec extends AnyFunSuite {

  test("Soundex: the published NARA coding examples") {
    def sx(w: String) = Phonetic.replaced("soundex", w)
    // the NARA standard's worked examples (HW transparency, vowel
    // separation, first-letter dedup)
    assert(sx("robert") == "R163" && sx("rupert") == "R163")
    assert(sx("ashcraft") == "A261" && sx("ashcroft") == "A261")
    assert(sx("tymczak") == "T522")
    assert(sx("pfister") == "P236")
    assert(sx("honeyman") == "H555")
    // fixture conflation groups the gates rely on
    assert(Seq("merge", "mirage", "murge").map(sx).distinct == Seq("M620"))
    assert(Seq("sort", "sord", "sorte").map(sx).distinct == Seq("S630"))
  }

  test("Metaphone: published vectors + maxCodeLen pass-through") {
    def mp(w: String) = Phonetic.replaced("metaphone", w)
    assert(mp("thompson") == "0MPS") // TH → theta ('0')
    assert(mp("the") == "0")
    assert(mp("merge") == "MRJ" && mp("mirage") == "MRJ")
    assert(mp("vector") == "FKTR")
    // maxCodeLen spec suffix (the factory's maxCodeLength arg)
    assert(Phonetic.replaced("metaphone:2", "thompson") == "0M")
    assert(Phonetic.replaced("doublemetaphone:6", "thompson").nonEmpty)
  }

  test("registry covers the factory's encoder set; unknown rejected") {
    for (enc <- Seq("soundex", "refinedsoundex", "metaphone",
        "doublemetaphone", "caverphone", "colognephonetic", "nysiis"))
      assert(Phonetic.injectCode(enc, "thompson").nonEmpty, enc)
    intercept[IllegalArgumentException](Phonetic.encoderFor("sndx"))
    intercept[IllegalArgumentException](Phonetic.encoderFor("soundex:4"))
  }

  test("filter law: code must be non-empty and differ from the token") {
    // all-digit token: Soundex cleans to "" → pass through unchanged
    assert(Phonetic.injectCode("soundex", "12345").isEmpty)
    assert(Phonetic.replaced("soundex", "12345") == "12345")
    // a token equal to its own code passes through (no self-injection):
    // Metaphone("r") == "R"? codes are uppercase, tokens lowercase —
    // craft the equal case via an uppercase input
    assert(Phonetic.injectCode("metaphone", "R").isEmpty)
    assert(Phonetic.injectCode("soundex", "").isEmpty)
  }

  test("inject tokenizer: code first, original at the same position") {
    val fn = IndexBuilder.posTokenizerFn("phonetic_inject:soundex").get
    val (normLen, toks) = fn("the sort 123")
    // norm length counts REAL positions only (discountOverlaps)
    assert(normLen == 3)
    assert(toks.toSeq == Seq(("T000", 0), ("the", 0),
      ("S630", 1), ("sort", 1), ("123", 2)))
  }

  test("replace index conflates variants; inject index keeps originals") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "merge fast"), (2L, "mirage slow"), (3L, "sort key"))
      .toDF("doc_id", "text")
    def terms(tokenizer: String): Set[String] = {
      val ix = IndexBuilder.buildLogical(docs, "text", Some("doc_id"), Nil,
        IndexBuilder.BuildConfig(tokenizer = tokenizer),
        persistPostings = false)
      val ts = ix.termStats.select("term").as[String].collect().toSet
      ix.unpersistCached()
      ts
    }
    val rep = terms("phonetic:soundex")
    assert(rep.contains("M620") && !rep.contains("merge") &&
      !rep.contains("mirage"))
    val inj = terms("phonetic_inject:soundex")
    assert(inj.contains("M620") && inj.contains("merge") &&
      inj.contains("mirage"))
  }
}
