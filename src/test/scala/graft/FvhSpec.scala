package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Corpus
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._
import graft.search.Fvh.{Frag, Occ}

/** FastVectorHighlighter pipeline: hand-traced fragment-window, scoring,
  * boundary-scan, and tagging cases against the reference laws
  * (BaseFragListBuilder.java:48-103, WeightedFieldFragList.java:45-77,
  * SimpleBoundaryScanner.java:59-90, BaseFragmentsBuilder.java:147-166),
  * plus offsets-path vs re-tokenize parity and local vs batch parity on
  * a real index. Execution is also oracle-gated (q_fvh_fragments).
  */
class FvhSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("single-occurrence fragments: centering, floor, boundary scan") {
    val text = "aa bb order cc dd sort ee ff"
    val occs = Seq(Occ(6, 11, 2.0f), Occ(18, 22, 1.5f))
    val frags = Fvh.fragList(occs, Seq("order", "sort"), 18)
    // window 1 centers "order" (newMargin (18-5)/2 = 6 → start 0),
    // window 2 floors at 18 (prev spanEnd) though centering wants 11
    assert(frags == Seq(
      Frag(0, 18, Seq(occs(0)), 2.0f),
      Frag(18, 36, Seq(occs(1)), 1.5f)))
    // boundary scan stretches frag 1's cut to the space after "sort";
    // frag 2 clips at text end and starts on the boundary before "sort"
    assert(Fvh.makeFragment(text, frags(0)) ==
      "aa bb <b>order</b> cc dd sort")
    assert(Fvh.makeFragment(text, frags(1)) == "<b>sort</b> ee ff")
  }

  test("multi-occurrence fragment: absorption, dup-term weight, norm") {
    val text = "order sort order xx"
    val w = Map("order" -> 2.0f, "sort" -> 1.5f)
    val occs = Seq(Occ(0, 5, 2.0f), Occ(6, 10, 1.5f), Occ(11, 16, 2.0f))
    val frags = Fvh.fragList(occs, Seq("order", "sort", "order"), 18)
    assert(frags.size == 1)
    val f = frags.head
    assert(f.start == 0 && f.end == 18 && f.occs == occs)
    // norm = 3 · (1/√3); duplicate 'order' contributes 0 the second time
    val norm = 3.toFloat * (1f / math.sqrt(3.0).toFloat)
    val expected = 2.0f * norm + (1.5f * norm) + 0f * norm
    assert(f.totalBoost == expected)
    assert(Fvh.makeFragment(text, f) ==
      "<b>order</b> <b>sort</b> <b>order</b> x")
    assert(w("order") == 2.0f) // (silence unused warning)
  }

  test("occurrence inside a previous fragment's border is discarded") {
    // second 'order' starts at 12 < floor 18 → skipped entirely
    val occs = Seq(Occ(0, 5, 1f), Occ(12, 17, 1f), Occ(40, 45, 1f))
    val frags = Fvh.fragList(occs, Seq("a", "a", "a"), 18)
    assert(frags.map(f => (f.start, f.end)) == Seq((0, 18), (34, 52)))
    assert(frags(1).occs == Seq(Occ(40, 45, 1f)))
  }

  test("boundary scanner laws (SimpleBoundaryScanner.java:59-90)") {
    val t = "abcdefghij klmnopqrstuvwxyz0123456789 end"
    // backward: finds the space at 10 (returns the offset AFTER it)
    assert(Fvh.findStartOffset(t, 15) == 11)
    // backward: within 20 steps of the text start → 0 is a boundary
    assert(Fvh.findStartOffset(t, 8) == 0)
    // backward: no boundary within maxScan → unchanged
    assert(Fvh.findStartOffset(t, 36, maxScan = 5) == 36)
    // forward: finds the space at 37
    assert(Fvh.findEndOffset(t, 30) == 37)
    // forward: none within maxScan → unchanged
    assert(Fvh.findEndOffset(t, 11, maxScan = 5) == 11)
    // out-of-range starts pass through
    assert(Fvh.findStartOffset(t, 0) == 0)
    assert(Fvh.findEndOffset(t, t.length + 5) == t.length + 5)
  }

  test("score ordering: boost desc, then startOffset asc") {
    val text = ("x " * 30) + "rare " + ("y " * 30) + "common common z"
    // rare at 60..64; commons later — craft weights so the two-common
    // fragment outscores the single rare
    val w = Map("rare" -> 1.2f, "common" -> 1.0f)
    val bounds = graft.core.Analysis.simpleTokenBounds(text)
    val out = Fvh.highlightDoc(text, bounds, w, 24, 3)
    assert(out.size >= 2)
    // scores non-increasing
    assert(out.sliding(2).forall(p => p.head._2 >= p.last._2))
    assert(out.exists(_._1.contains("<b>common</b> <b>common</b>")))
  }

  private lazy val (searcher, searcherOff) = {
    import spark.implicits._
    val files = Corpus.generate(200, seed = 61L)
    def build(offsets: Boolean): Searcher = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-fvh").toString
      val ix = IndexBuilder.buildLogical(
        spark.createDataset(files).repartition(4).toDF(),
        "content", None, Seq("repo", "path", "commit"),
        BuildConfig(numBuckets = 4, numDocShards = 2, offsets = offsets))
      IndexBuilder.writeIndex(ix, tmp, "fvh", 1)
      ix.unpersistCached(); ix.postings.unpersist()
      new Searcher(spark, SegmentSearcher.load(tmp))
    }
    (build(false), build(true))
  }

  test("offsets path == re-tokenize path; local == batch frame") {
    import spark.implicits._
    val terms = Set("def", "val")
    val hits = searcher.search(Query.or(TermQ("def"), TermQ("val")), 8)
    assert(hits.nonEmpty)
    val a = searcher.fvhHighlightAll(hits, terms, fragCharSize = 60)
    val b = searcherOff.fvhHighlightAll(hits, terms, fragCharSize = 60)
    assert(a == b && a.values.exists(_.nonEmpty))
    assert(a.values.flatten.exists(_._1.contains("<b>")))
    val hitsDf = hits.map(_.docId).toSeq.toDF("docId")
    val frame = searcherOff.fvhFrame(hitsDf, terms, fragCharSize = 60)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getFloat(2), r.getInt(3)))
      .groupBy(_._1)
      .map { case (id, rows) =>
        id -> rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq
      }
    assert(frame == a.filter(_._2.nonEmpty))
  }
}
