package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** SCORED fuzzy (the reference FuzzyQuery's default
  * TopTermsBlendedFreqScoringRewrite, `FuzzyQuery.java:100`): expansion
  * boosts, top-N selection, blended max-df statistics and the SHOULD-sum
  * combine are pinned by an independent in-spec pipeline (fresh
  * textbook-DP distances, fresh boost/selection transcription; only the
  * already-many-times-pinned BM25 score law reuses engine helpers).
  */
class FuzzyScoredSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private lazy val (searcher, dir, docsToks) = {
    import spark.implicits._
    val files = Corpus.generate(150, seed = 404L)
    val ix = IndexBuilder.buildLogical(
      spark.createDataset(files).repartition(4).toDF(),
      "content", None, Seq("repo", "path", "commit"),
      BuildConfig(numBuckets = 4, numDocShards = 2, saltThreshold = 1000000L))
    val d = java.nio.file.Files.createTempDirectory("graft-fuzzsc").toString
    IndexBuilder.writeIndex(ix, d, "snap", 1)
    val toks = ix.docs.select("docId", "content").collect()
      .map(r => r.getLong(0) -> Analysis.simpleTokens(r.getString(1)))
      .toMap
    ix.unpersistCached(); ix.postings.unpersist()
    (new Searcher(spark, SegmentSearcher.load(d)), d, toks)
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) dp(i)(0) = i
    for (j <- 0 to b.length) dp(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val c = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + c)
    }
    dp(a.length)(b.length)
  }

  private def expected(q: String, e: Int, maxExp: Int,
      k: Int): Seq[(Long, Float)] = {
    val n = docsToks.size.toLong
    val sumTtf = docsToks.values.map(_.length.toLong).sum
    val vocabDf: Map[String, Long] = docsToks.values
      .flatMap(_.distinct).groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    // expansion boosts: exact 1f, else 1f − d/min(len) (FuzzyTermsEnum
    // raw-edits mode: minSimilarity 0, scale 1)
    val boosted = vocabDf.keys.toSeq
      .map(t => (t, lev(t, q)))
      .filter(_._2 <= e)
      .map { case (t, d) =>
        val b = if (d == 0) 1.0f
          else 1.0f - d.toFloat / math.min(t.length, q.length).toFloat
        (t, b)
      }
    val sel = boosted.sortWith { case ((ta, ba), (tb, bb)) =>
      if (ba != bb) ba > bb else ta < tb
    }.take(maxExp)
    if (sel.isEmpty) return Nil
    val dfMax = sel.map(p => vocabDf(p._1)).max
    val idf = BM25.idf(dfMax, n)
    val avgdl = BM25.avgFieldLength(sumTtf, n)
    val cache = BM25.normCache(BM25.Default, avgdl)
    docsToks.toSeq.flatMap { case (id, toks) =>
      val subs = sel.flatMap { case (t, b) =>
        val tf = toks.count(_ == t)
        if (tf == 0) None
        else Some(BM25.score(BM25.weightValue(idf, BM25.Default, b),
          tf.toFloat, cache(Norms.normByte(toks.length) & 0xff)))
      }
      if (subs.isEmpty) None
      else if (subs.size == 1) Some(id -> subs.head)
      else { var s = 0d; subs.foreach(s += _); Some(id -> s.toFloat) }
    }.sortBy { case (id, s) => (-s.toDouble, id) }.take(k)
  }

  test("scored fuzzy matches the independent pipeline bit-exactly") {
    for (q <- Seq("merge", "mrge", "index")) {
      val exp = expected(q, 2, 50, 10)
      assert(exp.nonEmpty, s"'$q' fixture matches nothing")
      val got = searcher.search(FuzzyScoredQ(q, 2), 10)
        .map(h => (h.docId, h.score.toFloat)).toSeq
      assert(got == exp, s"scored fuzzy '$q'")
    }
  }

  test("maxExpansions truncates by (boost desc, term asc)") {
    val exp = expected("merge", 2, 3, 10)
    val got = searcher.search(FuzzyScoredQ("merge", 2, maxExpansions = 3), 10)
      .map(h => (h.docId, h.score.toFloat)).toSeq
    assert(got == exp)
  }

  test("exact term present: boost 1f (not excluded like the suggester)") {
    // "merge" exists in the corpus: the d=0 branch must fire
    val boostedTop = expected("merge", 1, 50, 3)
    assert(boostedTop.nonEmpty)
    assert(searcher.search(FuzzyScoredQ("merge", 1), 3)
      .map(h => (h.docId, h.score.toFloat)).toSeq == boostedTop)
  }

  test("forced-distributed parity") {
    val dist = new Searcher(spark, SegmentSearcher.load(dir),
      cacheSegments = false, maxLocalBytes = 0)
    assert(dist.search(FuzzyScoredQ("mrge", 2), 10).toSeq ==
      searcher.search(FuzzyScoredQ("mrge", 2), 10).toSeq)
  }
}
