package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.index.{Deletes, IndexBuilder}
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** Tombstoned deletes: liveDocs masking at collection (stats still count
  * deleted docs — Lucene's law), delete-by-term resolution, forced-
  * distributed parity, and expunge == from-scratch build of survivors.
  */
class DeleteSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val tmp = java.nio.file.Files.createTempDirectory("graft-del").toString
  private val cfg = BuildConfig(numBuckets = 4, numDocShards = 2,
    saltThreshold = 150L)

  private lazy val numbered: Seq[(Long, CodeFile)] =
    Corpus.generate(300, seed = 61L)
      .sortBy(f => (f.repo, f.path, f.commit)).zipWithIndex
      .map { case (f, i) => (i.toLong, f) }

  private def build(rows: Seq[(Long, CodeFile)], dir: String): Unit = {
    import spark.implicits._
    val df = rows
      .map { case (id, f) => (id, f.repo, f.path, f.commit, f.lang, f.content) }
      .toDF("docId", "repo", "path", "commit", "lang", "content")
    val ix = IndexBuilder.buildLogical(df, "content", Some("docId"), Nil, cfg)
    IndexBuilder.writeIndex(ix, dir, s"snap-$dir".takeRight(24), numGroups = 1)
    ix.unpersistCached(); ix.postings.unpersist()
  }

  private val queries = Seq[Query](
    TermQ("def"), TermQ("index"),
    Query.and(TermQ("index"), TermQ("merge")),
    Query.orMin(2, TermQ("spark"), TermQ("val"), TermQ("score")),
    PhraseQ(Seq("public", "void")))

  private def hits(dir: String, q: Query, k: Int = 10): Seq[(Long, Double)] =
    SegmentSearcher.search(spark, SegmentSearcher.load(dir), q, k)
      .map(h => (h.docId, h.score)).toSeq

  private lazy val deleted: Seq[Long] = {
    build(numbered, s"$tmp/live")
    // baseline BEFORE tombstoning (the dir is shared by the tests below)
    baselineBig = queries.map(q => q -> hits(s"$tmp/live", q, 50)).toMap
    baselineCount = new Searcher(spark, SegmentSearcher.load(s"$tmp/live"))
      .count(TermQ("def"))
    val del = baselineBig(TermQ("def")).take(3).map(_._1)
    Deletes.deleteIds(spark, s"$tmp/live", del)
    del
  }
  private var baselineBig: Map[Query, Seq[(Long, Double)]] = _
  private var baselineCount: Long = _

  test("masking: top-k = full-stats results minus tombstones (scores unchanged)") {
    val del = deleted.toSet
    val s = new Searcher(spark, SegmentSearcher.load(s"$tmp/live"))
    for (q <- queries) {
      val expected = baselineBig(q).filterNot(h => del.contains(h._1)).take(10)
      val got = s.search(q, 10).map(h => (h.docId, h.score)).toSeq
      assert(got === expected, s"q=$q")
    }
  }

  test("count excludes tombstones; searchByField masks too") {
    val s = new Searcher(spark, SegmentSearcher.load(s"$tmp/live"))
    val delMatching = deleted.size // deleted ids were top hits of 'def'
    assert(s.count(TermQ("def")) === baselineCount - delMatching)
    val byField = s.searchByField(BoolQ(filter = Seq(TermQ("def"))), 200,
      "length", asc = true)
    assert(byField.nonEmpty)
    assert(byField.forall { case (d, _) => !deleted.contains(d) })
  }

  test("forced-distributed (maxLocalBytes = 0) masks identically") {
    deleted // force fixture
    val local = new Searcher(spark, SegmentSearcher.load(s"$tmp/live"))
    val dist = new Searcher(spark, SegmentSearcher.load(s"$tmp/live"),
      cacheSegments = false, maxLocalBytes = 0)
    for (q <- queries)
      assert(dist.search(q, 10).toSeq === local.search(q, 10).toSeq, s"q=$q")
    assert(dist.count(TermQ("def")) === local.count(TermQ("def")))
  }

  test("deleteByTerm tombstones exactly the term's posting list") {
    build(numbered, s"$tmp/bt")
    val before = hits(s"$tmp/bt", TermQ("merge"), 300)
    assert(before.nonEmpty)
    val n = Deletes.deleteByTerm(spark, s"$tmp/bt", "merge")
    assert(n === before.size)
    assert(hits(s"$tmp/bt", TermQ("merge")).isEmpty)
    // docs without the term are untouched
    assert(hits(s"$tmp/bt", TermQ("def")).nonEmpty)
  }

  test("expunge == from-scratch build of the survivors (rank + score)") {
    val del = deleted.toSet
    Deletes.expunge(spark, s"$tmp/live", s"$tmp/expunged", "expunged-1")
    build(numbered.filterNot { case (id, _) => del.contains(id) }, s"$tmp/fresh")
    val em = IndexBuilder.readManifest(s"$tmp/expunged").get
    val fm = IndexBuilder.readManifest(s"$tmp/fresh").get
    assert(em.docCount === fm.docCount)
    assert(em.sumTotalTermFreq === fm.sumTotalTermFreq)
    for (q <- queries)
      assert(hits(s"$tmp/expunged", q) === hits(s"$tmp/fresh", q), s"q=$q")
    // stats corrected to the survivors
    val fs = spark.read.parquet(s"$tmp/fresh/termstats")
      .select("term", "df", "ttf").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val es = spark.read.parquet(s"$tmp/expunged/termstats")
      .select("term", "df", "ttf").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(es === fs)
    // and the expunged index carries no tombstones
    assert(Deletes.load(spark, s"$tmp/expunged").isEmpty)
  }
}
