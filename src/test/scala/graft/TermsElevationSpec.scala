package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** TermsComponent enumeration and QueryElevationComponent pinned against
  * from-scratch recomputes over the raw token maps.
  */
class TermsElevationSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private lazy val (searcher, docsToks) = {
    import spark.implicits._
    val files = Corpus.generate(150, seed = 2121L)
    val ix = IndexBuilder.buildLogical(
      spark.createDataset(files).repartition(4).toDF(),
      "content", None, Seq("repo", "path", "commit"),
      BuildConfig(numBuckets = 4, numDocShards = 2, saltThreshold = 1000000L))
    val d = java.nio.file.Files.createTempDirectory("graft-tec").toString
    IndexBuilder.writeIndex(ix, d, "snap", 1)
    val toks = ix.docs.select("docId", "content").collect()
      .map(r => r.getLong(0) -> Analysis.simpleTokens(r.getString(1)))
      .toMap
    ix.unpersistCached(); ix.postings.unpersist()
    (new Searcher(spark, SegmentSearcher.load(d)), toks)
  }

  private lazy val df: Map[String, Long] = docsToks.values.toSeq
    .flatMap(_.distinct).groupBy(identity).view
    .mapValues(_.size.toLong).toMap

  test("termsEnum count sort: CountPair (df desc, term asc) law") {
    val got = searcher.termsEnum(limit = 12, prefix = Some("s"), minCount = 3)
    val exp = df.toSeq.filter { case (t, c) => t.startsWith("s") && c >= 3 }
      .sortBy { case (t, c) => (-c, t) }.take(12)
    assert(got.toSeq == exp)
    assert(got.nonEmpty)
  }

  test("termsEnum index sort: bounds with inclusivity flags") {
    val all = df.keys.toSeq.sorted
    val lo = all(all.size / 3)
    val hi = all(2 * all.size / 3)
    val got = searcher.termsEnum(limit = 1000, lower = Some(lo),
      upper = Some(hi), sortByCount = false)
    // lowerIncl default true, upperIncl default false (TermsComponent)
    val exp = all.filter(t => t >= lo && t < hi).map(t => (t, df(t)))
    assert(got.toSeq == exp)
    val gotExcl = searcher.termsEnum(limit = 1000, lower = Some(lo),
      upper = Some(hi), lowerIncl = false, upperIncl = true,
      sortByCount = false)
    assert(gotExcl.toSeq == all.filter(t => t > lo && t <= hi)
      .map(t => (t, df(t))))
  }

  test("termsEnum regexp: whole-term match semantics") {
    val got = searcher.termsEnum(limit = 1000, regexp = Some("[a-z]{3}"),
      sortByCount = false)
    val exp = df.keys.toSeq.filter(_.matches("[a-z]{3}")).sorted
      .map(t => (t, df(t)))
    assert(got.toSeq == exp)
    // a term that merely CONTAINS a match must not slip through
    assert(got.forall(_._1.length == 3))
  }

  test("termsEnum maxCount ceiling excludes hot terms") {
    val cap = df.values.toSeq.sorted.apply(df.size / 2)
    val got = searcher.termsEnum(limit = 10000, maxCount = cap,
      sortByCount = false)
    assert(got.toSeq == df.toSeq.filter(_._2 <= cap).sortBy(_._1))
  }

  test("searchElevated: pinned order, missing-match zero score, exclusion") {
    val q = BoolQ(should = Seq(TermQ("merge"), TermQ("sort")))
    val organic = searcher.search(q, docsToks.size)
    val organicIds = organic.map(_.docId)
    val matchScore = organic.map(h => h.docId -> h.score).toMap
    // pin: one matching doc from mid-ranking, one NON-matching doc
    val pinMatch = organicIds(organicIds.length / 2)
    val pinMiss = docsToks.keys.find(d => !matchScore.contains(d)).get
    val excl = organicIds.head
    val got = searcher.searchElevated(q, 10,
      elevate = Seq(pinMiss, pinMatch), exclude = Set(excl))
    assert(got(0).docId == pinMiss && got(0).score == 0.0)
    assert(got(1).docId == pinMatch && got(1).score == matchScore(pinMatch))
    val expTail = organic
      .filterNot(h => Set(pinMiss, pinMatch, excl).contains(h.docId))
      .take(8).map(h => (h.docId, h.score)).toSeq
    assert(got.drop(2).map(h => (h.docId, h.score)).toSeq == expTail)
    assert(!got.map(_.docId).contains(excl))
  }

  test("searchElevated: excluded pin never surfaces") {
    val q = TermQ("merge")
    val organic = searcher.search(q, 10).map(_.docId)
    val got = searcher.searchElevated(q, 10, elevate = Seq(organic.head),
      exclude = Set(organic.head))
    assert(!got.map(_.docId).contains(organic.head))
    assert(got.map(_.docId).toSeq == searcher.search(q, 11).map(_.docId)
      .filterNot(_ == organic.head).take(10).toSeq)
  }
}
