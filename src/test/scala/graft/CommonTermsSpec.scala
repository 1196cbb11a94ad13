package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** CommonTermsQuery (`queries/CommonTermsQuery.java`), BoostingQuery
  * (`queries/BoostingQuery.java`) and TermsQuery (`queries/
  * TermsQuery.java`) pinned against independent in-spec transcriptions:
  * the common-terms boolean tree is rebuilt here from raw dfs with a
  * fresh transcription of buildQuery; the boosting law is refolded from
  * separate match/context searches; the terms-set membership from the
  * token map.
  */
class CommonTermsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private lazy val (searcher, docsToks) = {
    import spark.implicits._
    val files = Corpus.generate(160, seed = 909L)
    val ix = IndexBuilder.buildLogical(
      spark.createDataset(files).repartition(4).toDF(),
      "content", None, Seq("repo", "path", "commit"),
      BuildConfig(numBuckets = 4, numDocShards = 2, saltThreshold = 1000000L))
    val d = java.nio.file.Files.createTempDirectory("graft-ctq").toString
    IndexBuilder.writeIndex(ix, d, "snap", 1)
    val toks = ix.docs.select("docId", "content").collect()
      .map(r => r.getLong(0) -> Analysis.simpleTokens(r.getString(1)))
      .toMap
    ix.unpersistCached(); ix.postings.unpersist()
    (new Searcher(spark, SegmentSearcher.load(d)), toks)
  }

  private lazy val df: Map[String, Int] = docsToks.values.toSeq
    .flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
  private lazy val maxDoc: Long = docsToks.size.toLong

  /** Independent transcription of CommonTermsQuery.buildQuery
    * (:96-100 rewrite guards, :135-141 minNrShouldMatch, :171-221).
    */
  private def expectedTree(terms: Seq[String], mtf: Float,
      highMust: Boolean, lowMust: Boolean, lowMsmF: Float, highMsmF: Float,
      lowBoost: Float, highBoost: Float): Query = {
    if (terms.isEmpty) return MatchNoneQ
    if (terms.size == 1) return TermQ(terms.head)
    val cutoff = math.ceil((mtf * maxDoc.toFloat).toDouble).toInt
    val (hi, lo) = terms.partition { t =>
      val d = df.getOrElse(t, 0)
      d > 0 && ((mtf >= 1f && d > mtf) || d > cutoff)
    }
    def minNr(f: Float, n: Int): Int =
      if (f >= 1f || f == 0f) f.toInt else math.round(f * n)
    val lMsm = if (!lowMust && lo.nonEmpty) minNr(lowMsmF, lo.size) else 0
    val hMsm = if (!highMust && hi.nonEmpty) minNr(highMsmF, hi.size) else 0
    val hiMust = highMust || (lo.isEmpty && hMsm == 0)
    def grp(ts: Seq[String], must: Boolean, msm: Int, b: Float): Query = {
      val in = if (must) BoolQ(must = ts.map(TermQ))
        else BoolQ(should = ts.map(TermQ), minShouldMatch = msm)
      if (b == 1f) in else BoostQ(in, b)
    }
    BoolQ(
      must = if (lo.isEmpty) Nil else Seq(grp(lo, lowMust, lMsm, lowBoost)),
      should = if (hi.isEmpty) Nil else Seq(grp(hi, hiMust, hMsm, highBoost)))
  }

  test("commonTermsQuery builds the reference tree (fractional cutoff + msms)") {
    // pick a cutoff that actually splits: median df
    val sorted = df.values.toSeq.sorted
    val med = sorted(sorted.size / 2)
    val mtf = med.toFloat / maxDoc // fractional form
    val terms = df.keys.toSeq.sorted.take(5) :+ "zzznotindict"
    val got = searcher.commonTermsQuery(terms, mtf,
      lowFreqMinShouldMatch = 0.5f, highFreqMinShouldMatch = 0.4f,
      lowFreqBoost = 2f, highFreqBoost = 0.3f)
    val exp = expectedTree(terms, mtf, highMust = false, lowMust = false,
      0.5f, 0.4f, 2f, 0.3f)
    assert(got == exp)
    // the split is non-trivial and the absent term landed LOW
    val BoolQ(Seq(BoostQ(BoolQ(_, lowTs, _, _, _), _)), _, _, _, _) = got
    assert(lowTs.contains(TermQ("zzznotindict")))
  }

  test("commonTermsQuery: absolute cutoff (mtf >= 1), MUST low group") {
    val terms = df.keys.toSeq.sorted.take(4)
    val mtf = df(terms.head).toFloat // absolute count form
    val got = searcher.commonTermsQuery(terms, mtf, lowFreqMust = true)
    assert(got == expectedTree(terms, mtf, highMust = false, lowMust = true,
      0f, 0f, 1f, 1f))
  }

  test("commonTermsQuery: empty low group forces high occur to MUST") {
    // every chosen term is frequent vs a tiny cutoff → all high, no msm
    val terms = df.filter(_._2 > 3).keys.toSeq.sorted.take(3)
    assert(terms.size == 3)
    val got = searcher.commonTermsQuery(terms, 2f / maxDoc)
    got match {
      case BoolQ(Nil, Seq(BoolQ(mu, Nil, _, _, _)), _, _, _) =>
        assert(mu.toSet == terms.map(TermQ).toSet)
      case other => fail(s"expected forced-MUST high group, got $other")
    }
    // ... but a high msm keeps SHOULD
    val got2 = searcher.commonTermsQuery(terms, 2f / maxDoc,
      highFreqMinShouldMatch = 2f)
    got2 match {
      case BoolQ(Nil, Seq(BoolQ(Nil, sh, _, _, msm)), _, _, _) =>
        assert(sh.toSet == terms.map(TermQ).toSet && msm == 2)
      case other => fail(s"expected SHOULD high group with msm, got $other")
    }
  }

  test("commonTermsQuery: degenerate inputs") {
    assert(searcher.commonTermsQuery(Nil, 0.5f) == MatchNoneQ)
    assert(searcher.commonTermsQuery(Seq("sort"), 0.5f) == TermQ("sort"))
  }

  test("commonTermsQuery end-to-end: hits match the explicit tree's hits") {
    val sorted = df.values.toSeq.sorted
    val mtf = sorted(sorted.size / 2).toFloat / maxDoc
    val terms = df.keys.toSeq.sorted.take(5)
    val q = searcher.commonTermsQuery(terms, mtf,
      lowFreqMinShouldMatch = 0.5f, highFreqBoost = 0.25f)
    val viaTree = searcher.search(
      expectedTree(terms, mtf, false, false, 0.5f, 0f, 1f, 0.25f), 20)
    val got = searcher.search(q, 20)
    assert(got.map(h => (h.docId, h.score)).toSeq ==
      viaTree.map(h => (h.docId, h.score)).toSeq)
    assert(got.nonEmpty)
  }

  // ---------- BoostingQuery ----------

  private def refold(matchQ: Query, ctx: Query, boost: Float,
      k: Int): Seq[(Long, Float)] = {
    val hits = searcher.search(matchQ, docsToks.size)
    val ctxDocs = searcher.search(ctx, docsToks.size).map(_.docId).toSet
    hits.map { h =>
      // the scorer's one float multiply (BoostingQuery.java:93)
      (h.docId, if (ctxDocs(h.docId)) h.score.toFloat * boost
        else h.score.toFloat)
    }.sortBy { case (d, s) => (-s.toDouble, d) }.take(k).toSeq
  }

  test("BoostingQ: demotion (boost < 1) matches the refold") {
    val mq = BoolQ(should = Seq(TermQ("merge"), TermQ("sort")))
    val got = searcher.search(BoostingQ(mq, TermQ("index"), 0.4f), 15)
    assert(got.map(h => (h.docId, h.score.toFloat)).toSeq ==
      refold(mq, TermQ("index"), 0.4f, 15))
    assert(got.nonEmpty)
  }

  test("BoostingQ: promotion (boost > 1) keeps WAND bounds honest") {
    val mq = BoolQ(should = Seq(TermQ("merge"), TermQ("sort")))
    val ctx = BoolQ(should = Seq(TermQ("index"), TermQ("partition")))
    val got = searcher.search(BoostingQ(mq, ctx, 1.7f), 15)
    assert(got.map(h => (h.docId, h.score.toFloat)).toSeq ==
      refold(mq, ctx, 1.7f, 15))
  }

  test("BoostingQ: unmatched context / boost 1 rewrite to the match query") {
    val mq = TermQ("merge")
    assert(Query.rewrite(BoostingQ(mq, TermQ("zzznotindict2"), 0.5f)) ==
      BoostingQ(mq, TermQ("zzznotindict2"), 0.5f)) // term presence unknown at rewrite
    assert(Query.rewrite(BoostingQ(mq, PhraseQ(Nil), 0.5f)) == mq)
    assert(Query.rewrite(BoostingQ(mq, TermQ("sort"), 1f)) == mq)
    assert(Query.rewrite(BoostingQ(PhraseQ(Nil), TermQ("sort"), 2f)) ==
      MatchNoneQ)
    // absent context term: scorer side degrades to plain match scoring
    val plain = searcher.search(mq, 10)
    val viaB = searcher.search(BoostingQ(mq, TermQ("zzznotindict2"), 0.5f), 10)
    assert(plain.map(h => (h.docId, h.score)).toSeq ==
      viaB.map(h => (h.docId, h.score)).toSeq)
  }

  // ---------- TermsQuery ----------

  test("termsSet: const-score membership in doc-id order") {
    val ts = Seq("merge", "partition")
    val expect = docsToks.collect {
      case (id, toks) if toks.contains("merge") || toks.contains("partition") => id
    }.toSeq.sorted.take(12)
    val got = searcher.search(Query.termsSet(ts), 12)
    assert(got.map(_.docId).toSeq == expect)
    assert(got.forall(_.score == 1f))
    assert(Query.termsSet(Nil) == MatchNoneQ)
  }
}
