package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** Sandbox docvalues queries (`lucene/sandbox/.../search/
  * DocValuesNumbersQuery.java:46`, `DocValuesTermsQuery.java:92`,
  * `DocValuesRangeQuery.java:60`): constant-score matching BY STORED
  * VALUE. Pinned against independent brute-force recomputes over the docs
  * table; the composed FILTER form against the engine's own exhaustive
  * scores; local vs forced-distributed parity.
  */
class DvQuerySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private lazy val (s, sDist, dir, total) = {
    import spark.implicits._
    val files = Corpus.generate(220, seed = 91L)
    val corpus = spark.createDataset(files).toDF()
      // deterministic numeric + string docvalues columns
      .withColumn("num", pmod(xxhash64(col("path")), lit(50L)))
      .withColumn("cat", concat(lit("c"),
        pmod(xxhash64(col("path"), lit(1)), lit(5L)).cast("string")))
      // nullable docvalues column: NULL never matches any predicate
      .withColumn("numn", when(pmod(xxhash64(col("path")), lit(50L)) < 10,
        lit(null)).otherwise(pmod(xxhash64(col("path")), lit(50L))))
    val ix = IndexBuilder.buildLogical(corpus.repartition(4), "content",
      None, Seq("path"),
      BuildConfig(numBuckets = 4, numDocShards = 2,
        saltThreshold = 1000000L))
    val d = java.nio.file.Files.createTempDirectory("graft-dvq").toString
    IndexBuilder.writeIndex(ix, d, "snap", 1)
    val n = ix.docs.count()
    ix.unpersistCached(); ix.postings.unpersist()
    (new Searcher(spark, SegmentSearcher.load(d)),
      new Searcher(spark, SegmentSearcher.load(d), cacheSegments = false,
        maxLocalBytes = 0),
      d, n)
  }

  /** (docId, num, cat) rows, collected once. */
  private lazy val rows: Seq[(Long, Long, String)] =
    s.docsDf.select(col("docId"), col("num"), col("cat"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("Numbers: membership, const score, docId-asc ties") {
    val vs = Set(3L, 7L, 11L, 42L)
    val expect = rows.filter(r => vs.contains(r._2)).map(_._1).sorted.take(10)
    val hits = s.searchDocValues("num", DvPred.Numbers(vs), 10)
    assert(hits.map(_.docId).toSeq == expect)
    assert(hits.forall(_.score == 1.0))
    assert(expect.nonEmpty) // fixture has teeth
  }

  test("Terms: string membership; absent value matches nothing") {
    val vs = Set("c1", "c3")
    val expect = rows.filter(r => vs.contains(r._3)).map(_._1).sorted.take(10)
    assert(s.searchDocValues("cat", DvPred.Terms(vs), 10)
      .map(_.docId).toSeq == expect)
    assert(s.searchDocValues("cat", DvPred.Terms(Set("zz")), 10).isEmpty)
  }

  test("Range: per-bound inclusivity") {
    def expectR(p: Long => Boolean): Seq[Long] =
      rows.filter(r => p(r._2)).map(_._1).sorted.take(1000)
    assert(s.searchDocValues("num",
      DvPred.Range(Some(10L), Some(20L)), 1000).map(_.docId).toSeq ==
      expectR(v => v >= 10 && v <= 20))
    assert(s.searchDocValues("num",
      DvPred.Range(Some(10L), Some(20L), inclLower = false,
        inclUpper = false), 1000).map(_.docId).toSeq ==
      expectR(v => v > 10 && v < 20))
    // open bounds (reference null): one-sided
    assert(s.searchDocValues("num",
      DvPred.Range(None, Some(5L)), 1000).map(_.docId).toSeq ==
      expectR(_ <= 5))
    assert(s.searchDocValues("num",
      DvPred.Range(Some(45L), None), 1000).map(_.docId).toSeq ==
      expectR(_ >= 45))
  }

  test("Range both-None rewrites to field-exists (every doc here)") {
    // `DocValuesRangeQuery.java:134-139` → FieldValueQuery(field)
    assert(s.countDocValues("num", DvPred.Range(None, None)) == total)
  }

  test("DvFiltered: scores = plain search, membership intersected") {
    val pred = DvPred.Range(Some(10L), Some(35L))
    val byId = rows.map(r => r._1 -> r._2).toMap
    // independent law: exhaustive plain scores, filter, re-rank
    val all = s.search(TermQ("index"), total.toInt, useWand = false).toSeq
    val expect = all.filter(h => { val v = byId(h.docId); v >= 10 && v <= 35 })
      .sortBy(h => (-h.score, h.docId)).take(10)
    val got = s.searchDvFiltered(TermQ("index"), 10, "num", pred).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
    // the filter has teeth: it removed at least one otherwise-top hit
    assert(got != all.sortBy(h => (-h.score, h.docId)).take(10))
  }

  test("DvFiltered: forced-distributed parity (bit-exact)") {
    val pred = DvPred.Range(Some(5L), Some(40L), inclLower = false)
    val l = s.searchDvFiltered(BoolQ(should = Query.terms("index", "merge"),
      minShouldMatch = 1), 12, "num", pred).toSeq
    val d = sDist.searchDvFiltered(BoolQ(should = Query.terms("index", "merge"),
      minShouldMatch = 1), 12, "num", pred).toSeq
    assert(l == d)
    assert(l.nonEmpty)
  }

  test("standalone: forced-distributed parity") {
    val p = DvPred.Numbers(Set(1L, 2L, 3L, 4L, 5L))
    assert(s.searchDocValues("num", p, 25).toSeq ==
      sDist.searchDocValues("num", p, 25).toSeq)
    val preds: Seq[DvPred] = Seq(
      DvPred.Terms(Set("c0", "c3")),
      DvPred.Range(Some(10L), Some(40L), inclLower = true,
        inclUpper = false),
      DvPred.Range(None, Some(25L)),
      DvPred.Range(None, None))
    for (pr <- preds; f <- Seq("num", "numn")) {
      assert(s.searchDocValues(f, pr, 30).toSeq ==
        sDist.searchDocValues(f, pr, 30).toSeq, s"$f $pr")
      assert(s.countDocValues(f, pr) == sDist.countDocValues(f, pr),
        s"count $f $pr")
    }
    // NULLs really are excluded: the both-None rewrite (field exists)
    // counts strictly fewer docs on the nullable column
    assert(s.countDocValues("numn", DvPred.Range(None, None)) < total)
  }
}
