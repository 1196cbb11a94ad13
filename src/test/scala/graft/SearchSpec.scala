package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.index.IndexBuilder
import graft.search._

/** M0 vertical slice: DataFrame scoring path vs an independently-written
  * naive scorer (golden-fixture style, `TestSimilarityBase.java:53-64`),
  * plus parallelism-invariance (BaseDistributedSearchTestCase analog,
  * `solr/test-framework/.../BaseDistributedSearchTestCase.java:76-83`).
  */
class SearchSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // ---- independent naive implementation (formulas restated from
  //      BM25Similarity.java §2.5, NOT calling graft.search.BM25) ----

  case class NaiveDoc(docId: Long, tokens: Array[String], len: Int)

  def naiveCorpus(files: Seq[CodeFile]): Seq[NaiveDoc] =
    files.sortBy(f => (f.repo, f.path, f.commit)).zipWithIndex.map {
      case (f, i) =>
        val toks = Analysis.simpleTokens(f.content)
        NaiveDoc(i.toLong, toks, toks.length)
    }

  def naiveTermScores(docs: Seq[NaiveDoc], term: String): Map[Long, Float] = {
    val docCount = docs.size.toLong
    val sumTtf = docs.map(_.len.toLong).sum
    val avgdl = (sumTtf / docCount.toDouble).toFloat
    val matching = docs.filter(_.tokens.contains(term))
    val df = matching.size.toLong
    if (df == 0) return Map.empty
    val idf = math.log(1 + (docCount - df + 0.5) / (df + 0.5)).toFloat
    val w = 1f * idf * (1.2f + 1)
    matching.map { d =>
      val tf = d.tokens.count(_ == term).toFloat
      val nb = SmallFloat.floatToByte315(1f / math.sqrt(d.len.toDouble).toFloat)
      val decoded = Norms.NORM_TABLE(nb & 0xff)
      val cache = 1.2f * ((1 - 0.75f) + 0.75f * decoded / avgdl)
      d.docId -> (w * tf / (tf + cache))
    }.toMap
  }

  def naiveTopK(scores: Map[Long, Double], k: Int): Seq[(Long, Double)] =
    scores.toSeq.sortBy { case (d, s) => (-s, d) }.take(k)

  // ---- shared fixtures ----

  lazy val tiny: Seq[CodeFile] = Corpus.generate(12, seed = 42L)
  lazy val small: Seq[CodeFile] = Corpus.generate(300, seed = 7L)

  def buildIx(files: Seq[CodeFile], parts: Int = 4) = {
    import spark.implicits._
    IndexBuilder.buildLogical(
      spark.createDataset(files).repartition(parts).toDF(),
      "content", None, Seq("repo", "path", "commit"))
  }

  def collectHits(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("docIds are deterministic and parallelism-independent") {
    val naive = naiveCorpus(small)
    for (parts <- Seq(1, 3, 8)) {
      val ix = buildIx(small, parts)
      val got = ix.docs.select("docId", "length").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      assert(got.map(_._1).toSeq === naive.map(_.docId))
      assert(got.map(_._2).toSeq === naive.map(_.len), s"parts=$parts")
    }
  }

  test("collection + term stats match naive") {
    val ix = buildIx(small)
    val naive = naiveCorpus(small)
    assert(ix.collStats.docCount === 300L)
    assert(ix.collStats.sumTotalTermFreq === naive.map(_.len.toLong).sum)
    val dfSpark = ix.termStats.filter(org.apache.spark.sql.functions.col("term") === "index")
      .collect()(0)
    assert(dfSpark.getLong(1) === naive.count(_.tokens.contains("index")))
    assert(dfSpark.getLong(2) === naive.map(_.tokens.count(_ == "index").toLong).sum)
  }

  test("single-term top-k: rank-identical, scores within 1e-5 of naive") {
    val ix = buildIx(small)
    val naive = naiveCorpus(small)
    for (term <- Seq("def", "index", "score", "getIndexWriter".toLowerCase)) {
      val expected = naiveTopK(
        naiveTermScores(naive, term).map { case (d, s) => d -> s.toDouble }, 10)
      val got = collectHits(DataFrameSearcher.search(ix, TermQ(term), 10))
      assert(got.map(_._1) === expected.map(_._1), s"docIds for '$term'")
      got.zip(expected).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-5, s"score for '$term'")
      }
    }
  }

  test("AND = intersection with summed scores") {
    val ix = buildIx(small)
    val naive = naiveCorpus(small)
    val a = naiveTermScores(naive, "def")
    val b = naiveTermScores(naive, "merge")
    val expected = naiveTopK(
      a.keySet.intersect(b.keySet).map(d =>
        d -> (a(d).toDouble + b(d).toDouble)).toMap
        .map { case (d, s) => d -> s.toFloat.toDouble }, 10)
    val got = collectHits(DataFrameSearcher.search(ix,
      Query.and(TermQ("def"), TermQ("merge")), 10))
    assert(got.map(_._1) === expected.map(_._1))
    got.zip(expected).foreach { case ((_, gs), (_, es)) =>
      assert(math.abs(gs - es) < 1e-5)
    }
  }

  test("OR = union with summed scores; minShouldMatch gates") {
    val ix = buildIx(small)
    val naive = naiveCorpus(small)
    val ts = Seq("spark", "lucene", "segment")
    val maps = ts.map(naiveTermScores(naive, _))
    val allDocs = maps.flatMap(_.keySet).toSet
    def sumScores(d: Long) =
      maps.flatMap(_.get(d).map(_.toDouble)).sum.toFloat.toDouble
    // msm=1
    val exp1 = naiveTopK(allDocs.map(d => d -> sumScores(d)).toMap, 10)
    val got1 = collectHits(DataFrameSearcher.search(ix,
      Query.or(ts.map(TermQ): _*), 10))
    assert(got1.map(_._1) === exp1.map(_._1))
    // msm=2
    val exp2 = naiveTopK(allDocs.filter(d => maps.count(_.contains(d)) >= 2)
      .map(d => d -> sumScores(d)).toMap, 10)
    val got2 = collectHits(DataFrameSearcher.search(ix,
      Query.orMin(2, ts.map(TermQ): _*), 10))
    assert(got2.map(_._1) === exp2.map(_._1))
    got2.zip(exp2).foreach { case ((_, gs), (_, es)) =>
      assert(math.abs(gs - es) < 1e-5)
    }
  }

  test("MUST_NOT excludes; FILTER matches without scoring") {
    val ix = buildIx(small)
    val naive = naiveCorpus(small)
    val a = naiveTermScores(naive, "def")
    val b = naiveTermScores(naive, "spark")
    val expected = naiveTopK(a.view.filterKeys(!b.contains(_)).toMap
      .map { case (d, s) => d -> s.toDouble }, 10)
    val got = collectHits(DataFrameSearcher.search(ix,
      Query.not(TermQ("def"), TermQ("spark")), 10))
    assert(got.map(_._1) === expected.map(_._1))
    // FILTER: same matches as AND but score only from MUST side
    val gotF = collectHits(DataFrameSearcher.search(ix,
      BoolQ(must = Seq(TermQ("def")), filter = Seq(TermQ("merge"))), 10))
    val expF = naiveTopK(
      a.view.filterKeys(naiveTermScores(naive, "merge").contains).toMap
        .map { case (d, s) => d -> s.toDouble }, 10)
    assert(gotF.map(_._1) === expF.map(_._1))
    gotF.zip(expF).foreach { case ((_, gs), (_, es)) =>
      assert(math.abs(gs - es) < 1e-5)
    }
  }

  test("tie-break law: score desc then docId asc") {
    // construct identical docs => identical scores, ties broken by docId
    val files = (0 until 6).map(i =>
      CodeFile("r", f"p$i%02d", "c0000000", "scala", "alpha beta gamma"))
    val ix = buildIx(files, 2)
    val got = collectHits(DataFrameSearcher.search(ix, TermQ("alpha"), 4))
    assert(got.map(_._1) === Seq(0L, 1L, 2L, 3L))
    assert(got.map(_._2).distinct.size === 1)
  }

  test("searchAfter pages without overlap (IndexSearcher.java:421-445)") {
    val ix = buildIx(small)
    val page1 = collectHits(DataFrameSearcher.search(ix, TermQ("def"), 5))
    val cursor = page1.last
    val page2 = collectHits(DataFrameSearcher.search(ix, TermQ("def"), 5,
      after = Some((cursor._2, cursor._1))))
    val all = collectHits(DataFrameSearcher.search(ix, TermQ("def"), 10))
    assert(page1 ++ page2 === all)
  }

  test("parallelism invariance: identical top-k at 1/4/8 partitions") {
    val results = Seq(1, 4, 8).map { p =>
      val ix = buildIx(small, p)
      collectHits(DataFrameSearcher.search(ix,
        Query.orMin(1, TermQ("def"), TermQ("index"), TermQ("merge")), 10))
    }
    assert(results(0) === results(1))
    assert(results(1) === results(2))
  }

  test("dismax takes max plus tiebreak") {
    val ix = buildIx(small)
    val naive = naiveCorpus(small)
    val a = naiveTermScores(naive, "def")
    val b = naiveTermScores(naive, "merge")
    val docs = a.keySet ++ b.keySet
    val expected = naiveTopK(docs.map { d =>
      val sa = a.getOrElse(d, 0f); val sb = b.getOrElse(d, 0f)
      d -> math.max(sa, sb).toDouble
    }.toMap, 10)
    val got = collectHits(DataFrameSearcher.search(ix,
      DisMaxQ(Seq(TermQ("def"), TermQ("merge"))), 10))
    assert(got.map(_._1) === expected.map(_._1))
  }

  test("prefix query matches as constant score") {
    val ix = buildIx(small)
    val naive = naiveCorpus(small)
    val expected = naive.filter(_.tokens.exists(_.startsWith("max")))
      .map(_.docId).sorted.take(10)
    val got = collectHits(DataFrameSearcher.search(ix, PrefixQ("max"), 10))
    assert(got.map(_._1) === expected)
    assert(got.forall(_._2 === 1.0))
  }

  test("phrase query: exact adjacency with phrase-freq scoring") {
    val files = Seq(
      CodeFile("r", "a", "c", "scala", "index merge index merge score"),
      CodeFile("r", "b", "c", "scala", "index score merge index"),
      CodeFile("r", "c", "c", "scala", "merge index merge"))
    val ix = buildIx(files, 2)
    val got = collectHits(DataFrameSearcher.search(ix,
      PhraseQ(Seq("index", "merge")), 10))
    // doc a (docId 0) has "index merge" twice; doc c (docId 2) zero
    // ("merge index merge" has index→merge at pos 1→2? yes once!)
    assert(got.map(_._1).toSet === Set(0L, 2L))
    assert(got.head._1 === 0L, "two occurrences outrank one")
  }

  test("query rewrite simplifications (BooleanQuery.java:230-290)") {
    assert(Query.rewrite(BoolQ(should = Seq(TermQ("a")), minShouldMatch = 1))
      === TermQ("a"))
    // MUST MatchAll is KEPT — it matches and scores its boosted 1.0
    // (BooleanQuery rewrite never drops a MUST MatchAllDocsQuery)
    assert(Query.rewrite(BoolQ(must = Seq(TermQ("a"), MatchAllQ)))
      === BoolQ(must = Seq(TermQ("a"), MatchAllQ)))
    // FILTER MatchAll drops only when another positive clause remains
    assert(Query.rewrite(BoolQ(must = Seq(TermQ("a")), filter = Seq(MatchAllQ)))
      === TermQ("a"))
    assert(Query.rewrite(BoolQ(filter = Seq(MatchAllQ)))
      === BoolQ(filter = Seq(MatchAllQ)))
    assert(Query.rewrite(BoolQ(must = Seq(TermQ("a"), MatchNoneQ))) === MatchNoneQ)
    assert(Query.rewrite(BoolQ()) === MatchNoneQ)
    assert(Query.rewrite(BoostQ(TermQ("a"), 1f)) === TermQ("a"))
    assert(Query.rewrite(DisMaxQ(Seq(TermQ("a")))) === TermQ("a"))
    // duplicate SHOULD clauses dedup
    assert(Query.rewrite(BoolQ(should = Seq(TermQ("a"), TermQ("a")))) === TermQ("a"))
  }
}
