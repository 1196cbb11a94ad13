package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** BlendedInfixSuggester laws (`suggest/analyzing/BlendedInfixSuggester
  * .java:190-321`): startsWith short-circuit, first-match-position
  * linear/reciprocal blends, (long) truncation, LOOKUP_COMP final order,
  * and the end-offset prefix-vs-exact key law.
  */
class BlendedSuggestSpec extends AnyFunSuite {

  private lazy val searcher: Searcher = {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "sort merge join"),          // w=15, starts with the key
      (2L, "fast sort"),                // w=9,  first match at pos 1
      (3L, "the quick sortable table"), // w=24, prefix match at pos 2
      (4L, "nothing here"))             // no match
      .toDF("doc_id", "text")
    val ix = IndexBuilder.buildLogical(docs, "text", Some("doc_id"), Nil,
      BuildConfig())
    val dir = java.nio.file.Files.createTempDirectory("graft-bis").toString
    IndexBuilder.writeIndex(ix, dir, "snap", 1)
    ix.unpersistCached(); ix.postings.unpersist()
    new Searcher(TestSpark.spark, SegmentSearcher.load(dir))
  }

  test("linear blend: startsWith=1, else 1 - 0.10*firstPos, trunc long") {
    val got = searcher.suggestBlendedInfix("sor", 10).toSeq
    // doc3: 24 * 0.8 = 19.2 → 19; doc1: startsWith → 15; doc2: 9*0.9 → 8
    assert(got == Seq(
      ("the quick sortable table", 19L),
      ("sort merge join", 15L),
      ("fast sort", 8L)))
  }

  test("reciprocal blend: w/(pos+1)") {
    val got = searcher.suggestBlendedInfix("sor", 10, blender = "reciprocal")
      .toSeq
    // doc1: 15; doc3: 24/3 = 8; doc2: 9/2 = 4.5 → 4
    assert(got == Seq(
      ("sort merge join", 15L),
      ("the quick sortable table", 8L),
      ("fast sort", 4L)))
  }

  test("trailing separator makes the last token EXACT, not a prefix") {
    // "sor " analyzes to token "sor" with a trailing separator → exact
    // term "sor", which no doc contains
    assert(searcher.suggestBlendedInfix("sor ", 10).isEmpty)
    // "sort " exact-matches docs 1 and 2 (NOT "sortable" in doc 3)
    val got = searcher.suggestBlendedInfix("sort ", 10).toSeq
    assert(got.map(_._1).toSet ==
      Set("sort merge join", "fast sort"))
  }

  test("local snapshot tier ≡ forced-distributed scan (keys × blenders)") {
    // a fresh handle over the same index, gated OUT of every local tier
    val dist = new Searcher(TestSpark.spark,
      SegmentSearcher.load(searcher.index.dir),
      cacheSegments = false, maxLocalBytes = 0L)
    val stops = graft.core.Analysis.EnglishStopWords
    val cases = Seq(
      ("sor", "linear", Set.empty[String]),
      ("sor", "reciprocal", Set.empty[String]),
      ("sor", "exp_reciprocal", Set.empty[String]),
      ("sort ", "linear", Set.empty[String]),
      ("fast sor", "linear", Set.empty[String]),
      ("quick the", "linear", stops),   // trailing stopword kept as prefix
      ("quick the ", "linear", stops))  // trailing stopword + separator drops
    for ((key, blender, sw) <- cases) {
      val a = searcher.suggestBlendedInfix(key, 10, blender = blender,
        stopWords = sw).toSeq
      val b = dist.suggestBlendedInfix(key, 10, blender = blender,
        stopWords = sw).toSeq
      assert(a == b, s"key='$key' blender=$blender")
    }
    dist.close()
  }

  test("two-token key: MUST term + prefix, candidate cap respected") {
    // "fast sor": doc 2 only (must contain "fast" AND a "sor" prefix)
    val got = searcher.suggestBlendedInfix("fast sor", 10).toSeq
    assert(got.map(_._1) == Seq("fast sort"))
    // numFactor floor: num * numFactor >= 1 still works
    assert(searcher.suggestBlendedInfix("sor", 1, numFactor = 1)
      .length == 1)
  }
}
