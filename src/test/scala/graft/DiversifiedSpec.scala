package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** DiversifiedTopDocsCollector law
  * (`lucene/misc/src/java/org/apache/lucene/search/
  * DiversifiedTopDocsCollector.java:62-161`): the final top-k admits at
  * most maxPerKey hits per key, equivalently keeps exactly the docs
  * whose within-key rank under (score desc, docId asc) is ≤ maxPerKey,
  * ranked globally. Pinned against an independent in-spec recompute of
  * that law from the engine's OWN exhaustive scores; forced-distributed
  * parity; degenerate-cap equivalences.
  */
class DiversifiedSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private lazy val (searcher, dir, total) = {
    import spark.implicits._
    val files = Corpus.generate(250, seed = 77L)
    val corpus = spark.createDataset(files).toDF()
      // 7 skewed key groups, deterministic
      .withColumn("grp", pmod(xxhash64(col("path")), lit(7L)).cast("string"))
    val ix = IndexBuilder.buildLogical(
      corpus.repartition(4), "content", None, Seq("path"),
      BuildConfig(numBuckets = 4, numDocShards = 2,
        saltThreshold = 1000000L))
    val d = java.nio.file.Files.createTempDirectory("graft-divers").toString
    IndexBuilder.writeIndex(ix, d, "snap", 1)
    val n = ix.docs.count()
    ix.unpersistCached(); ix.postings.unpersist()
    (new Searcher(spark, SegmentSearcher.load(d)), d, n)
  }

  /** Independent recompute: exhaustive engine scores (plain search with
    * k = corpus size — WAND prunes nothing at full k), then the greedy
    * per-key-cap law applied in plain Scala.
    */
  private def expected(q: Query, k: Int, cap: Int): Seq[Hit] = {
    val all = searcher.search(q, total.toInt).toSeq
      .sortBy(h => (-h.score, h.docId))
    // fetch keys once from the docs table
    val keys = searcher.docsDf.select(col("docId"), col("grp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val taken = scala.collection.mutable.Map.empty[String, Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[Hit]
    val it = all.iterator
    while (it.hasNext && out.length < k) {
      val h = it.next()
      val g = keys(h.docId)
      if (taken.getOrElse(g, 0) < cap) {
        taken(g) = taken.getOrElse(g, 0) + 1
        out += h
      }
    }
    out.toSeq
  }

  test("diversified top-k equals the greedy per-key-cap law") {
    for (cap <- Seq(1, 2, 3); q <- Seq[Query](TermQ("def"),
        Query.or(TermQ("def"), TermQ("index")))) {
      val got = searcher.searchDiversified(q, 10, "grp", cap).toSeq
      assert(got == expected(q, 10, cap), s"cap=$cap q=$q")
    }
  }

  test("cap actually binds: some plain top-k doc is displaced") {
    val plain = searcher.search(TermQ("def"), 10).toSeq.map(_.docId).toSet
    val div = searcher.searchDiversified(TermQ("def"), 10, "grp", 1)
      .toSeq.map(_.docId).toSet
    assert(plain != div, "fixture never triggered the cap — no teeth")
    // and no key exceeds the cap
    val keys = searcher.docsDf.select(col("docId"), col("grp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val counts = div.toSeq.groupBy(keys).view.mapValues(_.size)
    assert(counts.values.forall(_ <= 1))
  }

  test("huge cap degenerates to the plain top-k") {
    assert(searcher.searchDiversified(TermQ("def"), 10, "grp", 1000).toSeq ==
      searcher.search(TermQ("def"), 10).toSeq)
  }

  test("forced-distributed path agrees with driver-local") {
    val dist = new Searcher(spark, SegmentSearcher.load(dir),
      cacheSegments = false, maxLocalBytes = 0)
    for (cap <- Seq(1, 2)) {
      assert(dist.searchDiversified(TermQ("def"), 10, "grp", cap).toSeq ==
        searcher.searchDiversified(TermQ("def"), 10, "grp", cap).toSeq,
        s"cap=$cap")
    }
    dist.close()
  }
}
