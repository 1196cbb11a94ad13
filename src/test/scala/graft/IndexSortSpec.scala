package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** Index-time sort + early-terminating sort-by-field collection
  * (`IndexWriterConfig.setIndexSort` / `EarlyTerminatingSortingCollector
  * .java:30-75` semantics): when the index is built with docIds assigned
  * in ascending order of a field, searchByField(field, asc) may stop
  * after k matches per shard. Results pinned against an independent
  * in-spec oracle; the spec hook proves the walk actually stopped early;
  * forced-distributed parity; the dishonest-declaration guard.
  */
class IndexSortSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private lazy val (searcher, dir, docsMeta) = {
    import spark.implicits._
    val files = Corpus.generate(300, seed = 321L)
    // deterministic numeric sort key, decoupled from doc length
    val corpus = spark.createDataset(files).toDF()
      .withColumn("sortkey", pmod(xxhash64(col("path")), lit(1000L)))
    val ix = IndexBuilder.buildLogical(
      corpus.repartition(4), "content", None, Seq("sortkey", "path"),
      BuildConfig(numBuckets = 4, numDocShards = 2,
        saltThreshold = 1000000L, indexSort = Some("sortkey")))
    val d = java.nio.file.Files.createTempDirectory("graft-ixsort").toString
    IndexBuilder.writeIndex(ix, d, "snap", 1)
    val meta = ix.docs.select("docId", "sortkey", "content").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), Analysis.simpleTokens(r.getString(2)))))
      .toMap
    ix.unpersistCached(); ix.postings.unpersist()
    (new Searcher(spark, SegmentSearcher.load(d)), d, meta)
  }

  /** Independent oracle: all matches ranked by (±sortkey, docId). */
  private def expected(term: String, k: Int, asc: Boolean): Seq[(Long, Long)] =
    docsMeta.toSeq.collect {
      case (id, (sk, toks)) if toks.contains(term) => (id, sk)
    }.sortBy { case (id, sk) => (if (asc) sk else -sk, id) }.take(k)
      .map { case (id, sk) => (id, sk) }

  test("manifest round-trips the index sort") {
    assert(searcher.index.manifest.indexSort.contains("sortkey"))
    val js = IndexBuilder.Manifest.toJson(searcher.index.manifest)
    assert(IndexBuilder.Manifest.fromJson(js) == searcher.index.manifest)
  }

  test("sorted-index searchByField matches the oracle and stops early") {
    val term = "def" // common term: many matches
    val total = docsMeta.count(_._2._2.contains(term))
    assert(total > 40, s"fixture too sparse: $total")
    val got = searcher.searchByField(TermQ(term), 10, "sortkey").toSeq
    assert(got == expected(term, 10, asc = true))
    // the early path visited at most k per shard, not every match
    assert(searcher.lastFieldScanDocs <= 10L * 2,
      s"visited ${searcher.lastFieldScanDocs} docs of $total — not early")
    assert(searcher.lastFieldScanDocs < total)
  }

  test("desc does NOT early-terminate (docId order is ascending) and is exact") {
    val term = "def"
    val total = docsMeta.count(_._2._2.contains(term))
    val got = searcher.searchByField(TermQ(term), 10, "sortkey", asc = false).toSeq
    assert(got == expected(term, 10, asc = false))
    assert(searcher.lastFieldScanDocs == total,
      "desc must walk every match — index order can't bound it")
  }

  test("boolean queries early-terminate too") {
    val q = Query.and(TermQ("def"), TermQ("index"))
    val ids = docsMeta.filter { case (_, (_, t)) =>
      t.contains("def") && t.contains("index") }.keySet
    val exp = ids.toSeq.map(id => (id, docsMeta(id)._1))
      .sortBy { case (id, sk) => (sk, id) }.take(5)
    assert(searcher.searchByField(q, 5, "sortkey").toSeq == exp)
    assert(searcher.lastFieldScanDocs <= 5L * 2)
  }

  test("forced-distributed early path agrees with driver-local") {
    val dist = new Searcher(spark, SegmentSearcher.load(dir),
      cacheSegments = false, maxLocalBytes = 0)
    for (asc <- Seq(true, false)) {
      assert(dist.searchByField(TermQ("def"), 10, "sortkey", asc).toSeq ==
        searcher.searchByField(TermQ("def"), 10, "sortkey", asc).toSeq,
        s"asc=$asc")
    }
  }

  test("a dishonest indexSort declaration is rejected at build time") {
    import spark.implicits._
    val corpus = spark.createDataset(Corpus.generate(10)).toDF()
      .withColumn("sortkey", lit(1L))
    intercept[IllegalArgumentException] {
      IndexBuilder.buildLogical(corpus, "content", None,
        Seq("path"), BuildConfig(indexSort = Some("sortkey")))
    }
    intercept[IllegalArgumentException] {
      IndexBuilder.buildLogical(corpus, "content", Some("sortkey"),
        Nil, BuildConfig(indexSort = Some("sortkey")))
    }
  }
}
