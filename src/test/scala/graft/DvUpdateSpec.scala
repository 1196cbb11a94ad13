package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.index.{DvUpdates, IndexBuilder}
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** Numeric doc-values updates (`IndexWriter.updateNumericDocValue`):
  * overlay semantics (latest batch wins), postings untouched, every DV
  * consumer sees the override, fold bakes it into a shared-segment
  * snapshot.
  */
class DvUpdateSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val tmp = java.nio.file.Files.createTempDirectory("graft-dvu").toString
  private val cfg = BuildConfig(numBuckets = 4, numDocShards = 2,
    saltThreshold = 150L)

  private lazy val dir: String = {
    import spark.implicits._
    val df = Corpus.generate(200, seed = 73L)
      .sortBy(f => (f.repo, f.path, f.commit)).zipWithIndex
      .map { case (f, i) =>
        (i.toLong, f.repo, f.path, f.commit, f.lang, f.content) }
      .toDF("docId", "repo", "path", "commit", "lang", "content")
    val ix = IndexBuilder.buildLogical(df, "content", Some("docId"), Nil, cfg)
    IndexBuilder.writeIndex(ix, s"$tmp/ix", "dvu-base", numGroups = 1)
    ix.unpersistCached(); ix.postings.unpersist()
    s"$tmp/ix"
  }

  private def sorted(d: String, maxLocal: Long = 256L << 20): Seq[(Long, Long)] = {
    val s = new Searcher(spark, SegmentSearcher.load(d),
      cacheSegments = false, maxLocalBytes = maxLocal)
    s.searchByField(BoolQ(filter = Seq(TermQ("def"))), 15, "length",
      asc = true).toSeq
  }

  test("an update batch moves docs in sort order; postings untouched") {
    val base = sorted(dir)
    assert(base.nonEmpty)
    val victims = base.takeRight(3).map(_._1) // currently longest
    DvUpdates.updateNumeric(spark, dir, "length", victims.map(_ -> 0L))
    val after = sorted(dir)
    // the updated docs now sort first (value 0), docId asc among ties
    assert(after.take(3).map(_._1) === victims.sorted)
    assert(after.take(3).forall(_._2 == 0L))
    // membership unchanged — updates never touch postings
    assert(after.map(_._1).toSet subsetOf
      (base.map(_._1).toSet ++ victims))
  }

  test("latest batch wins") {
    val victim = sorted(dir).head._1 // one of the zeroed docs
    DvUpdates.updateNumeric(spark, dir, "length", Seq(victim -> 999999L))
    val after = sorted(dir)
    assert(!after.take(3).map(_._1).contains(victim) ||
      after.find(_._1 == victim).forall(_._2 == 999999L))
    assert(DvUpdates.load(spark, dir)("length")(victim) === 999999L)
  }

  test("forced-distributed sort sees the same overlay") {
    assert(sorted(dir, maxLocal = 0) === sorted(dir))
  }

  test("updateByTerm targets exactly the term's docs") {
    val n = DvUpdates.updateByTerm(spark, dir, "merge", "length", 7L)
    assert(n > 0)
    val ups = DvUpdates.load(spark, dir)("length")
    assert(ups.values.count(_ == 7L) >= n.toInt - 3) // minus earlier overrides
  }

  test("fold bakes the overlay, shares segments, drops the sidecar") {
    DvUpdates.fold(spark, dir, s"$tmp/folded", "dvu-folded")
    assert(sorted(s"$tmp/folded") === sorted(dir))
    assert(DvUpdates.load(spark, s"$tmp/folded").isEmpty)
    import java.nio.file.{Files, Paths}
    assert(Files.isSymbolicLink(Paths.get(s"$tmp/folded/segments/grp=0")))
    // search behavior identical (postings shared)
    val a = SegmentSearcher.search(spark, SegmentSearcher.load(dir),
      TermQ("def"), 10).toSeq
    val b = SegmentSearcher.search(spark, SegmentSearcher.load(s"$tmp/folded"),
      TermQ("def"), 10).toSeq
    assert(a === b)
  }
}
