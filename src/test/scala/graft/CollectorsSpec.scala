package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Corpus
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._
import graft.search.Collectors._

/** Collector protocol laws (`search/Collector.java`,
  * `MultiCollector.java`, `TimeLimitingCollector.java`,
  * `CachingCollector.java`): parity with search()/count(), the
  * MultiCollector wrap/terminate laws, the deterministic-clock timeout
  * laws (greedy, baseline persistence, leaf-entry timeout), the caching
  * replay/invalidate laws, and the fused searchWithCount both local and
  * forced-distributed.
  */
class CollectorsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // salted (saltThreshold=1) → every term sharded → collect() walks
  // numDocShards leaves, exercising the multi-leaf collector laws
  private lazy val (searcher, dist) = {
    import spark.implicits._
    val ix = IndexBuilder.buildLogical(
      spark.createDataset(Corpus.generate(300, 99L)).toDF(),
      "content", None, Seq("repo", "path", "commit"),
      BuildConfig(numBuckets = 4, numDocShards = 4, saltThreshold = 1L))
    val dir = java.nio.file.Files.createTempDirectory("graft-coll").toString
    IndexBuilder.writeIndex(ix, dir, "snap", 1)
    ix.unpersistCached(); ix.postings.unpersist()
    val ixh = SegmentSearcher.load(dir)
    (new Searcher(spark, ixh),
      new Searcher(spark, ixh, maxLocalBytes = 0L))
  }

  private val queries = Seq(
    TermQ("def"),
    Query.or(TermQ("index"), TermQ("merge")),
    Query.and(TermQ("def"), TermQ("val")))

  /** The full (docId, score) stream a collector sees, in leaf order. */
  private def stream(q: Query): Seq[(Long, Double)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    searcher.collect(q, new Collector {
      def leaf(shard: Int): LeafCollector = new LeafCollector {
        def collect(docId: Long, score: Double): Unit = buf += ((docId, score))
      }
    })
    buf.toSeq
  }

  test("TopK / TotalHits collectors == search() / count()") {
    for (q <- queries) {
      val topk = new TopK(10)
      val total = new TotalHits
      searcher.collect(q, topk)
      searcher.collect(q, total)
      assert(topk.hits.toSeq == searcher.search(q, 10).toSeq, s"q=$q")
      assert(total.count == searcher.count(q), s"q=$q")
      assert(total.count > 0, s"fixture matches nothing for $q")
    }
  }

  test("Multi.wrap: null drop, singleton unwrap, one-pass fan-out") {
    val single = new TopK(5)
    assert(Multi.wrap(null, single) eq single)
    intercept[IllegalArgumentException](Multi.wrap(null, null))
    val q = queries(1)
    val topk = new TopK(10)
    val total = new TotalHits
    searcher.collect(q, Multi.wrap(topk, total))
    assert(topk.hits.toSeq == searcher.search(q, 10).toSeq)
    assert(total.count == searcher.count(q))
  }

  test("Multi: a sub terminating at leaf() is dropped, others continue") {
    val q = TermQ("def")
    val nLeaves = {
      var n = 0
      searcher.collect(q, new Collector {
        def leaf(shard: Int): LeafCollector = {
          n += 1
          new LeafCollector { def collect(d: Long, s: Double): Unit = () }
        }
      })
      n
    }
    assert(nLeaves > 1, "fixture must produce multiple leaves")
    // terminates on every leaf after the first
    var calls = 0
    val picky = new Collector {
      def leaf(shard: Int): LeafCollector = {
        calls += 1
        if (calls > 1) throw new CollectionTerminated
        new LeafCollector { def collect(d: Long, s: Double): Unit = () }
      }
    }
    val total = new TotalHits
    searcher.collect(q, Multi.wrap(picky, total))
    // the picky sub saw only leaf 1; the count still covers every leaf
    assert(calls == nLeaves)
    assert(total.count == searcher.count(q))
    // ALL subs terminated → the multi leaf itself terminates (and the
    // walk for that leaf is skipped entirely, not an error)
    val alwaysDead = new Collector {
      def leaf(shard: Int): LeafCollector = throw new CollectionTerminated
    }
    searcher.collect(q, Multi.wrap(alwaysDead, alwaysDead)) // must not throw
  }

  test("TimeLimiting: deterministic clock, lastDocCollected, greedy law") {
    val q = TermQ("def")
    val full = stream(q)
    assert(full.size > 5)
    // counting clock: every read advances one tick. Reads: baseline (1),
    // leaf-entry check (2), then one per collect. With ticksAllowed = A
    // the first collect whose read exceeds 1 + A fails: read A+2, i.e.
    // the (A)th collected doc fires the exception.
    def mkClock(): () => Long = { var t = 0L; () => { t += 1; t } }
    val a = 4L
    val inner = new TopK(100)
    val ex = intercept[TimeExceeded] {
      searcher.collect(q, new TimeLimiting(inner, mkClock(), a))
    }
    val failingDoc = full(a.toInt - 1)._1 // 0-indexed: the A-th collect
    assert(ex.lastDocCollected == failingDoc)
    assert(ex.ticksAllowed == a && ex.ticksElapsed > a)
    // non-greedy: the failing doc was NOT passed to the inner collector
    assert(inner.hits.map(_.docId).toSet ==
      full.take(a.toInt - 1).map(_._1).toSet)
    // greedy: the failing doc IS collected before the throw
    val greedyInner = new TopK(100)
    intercept[TimeExceeded] {
      searcher.collect(q,
        new TimeLimiting(greedyInner, mkClock(), a, greedy = true))
    }
    assert(greedyInner.hits.map(_.docId).toSet ==
      full.take(a.toInt).map(_._1).toSet)
  }

  test("TimeLimiting: baseline persists across phases; leaf-entry check") {
    // one instance limiting a multi-phase search (the setCollector use
    // case): after the budget died in phase 1, phase 2 times out at
    // leaf ENTRY with lastDocCollected == -1
    val clock = { var t = 0L; () => { t += 1; t } }
    val tl = new TimeLimiting(new TopK(100), clock, 3L)
    intercept[TimeExceeded](searcher.collect(TermQ("def"), tl))
    val ex2 = intercept[TimeExceeded](searcher.collect(TermQ("val"), tl))
    assert(ex2.lastDocCollected == -1L)
  }

  test("Caching: replay reproduces the exact stream; NaN without scores") {
    val q = queries(1)
    val full = stream(q)
    val caching = new Caching(new TotalHits, cacheScores = true,
      maxDocsToCache = full.size + 10)
    searcher.collect(q, caching)
    assert(caching.isCached)
    val replayed = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    caching.replay(new Collector {
      def leaf(shard: Int): LeafCollector = new LeafCollector {
        def collect(d: Long, s: Double): Unit = replayed += ((d, s))
      }
    })
    assert(replayed.toSeq == full)
    // replay into TopK == direct search
    val topk = new TopK(10)
    caching.replay(topk)
    assert(topk.hits.toSeq == searcher.search(q, 10).toSeq)
    // no-score cache replays NaN (the reference replays scoreless there)
    val noScores = new Caching(new TotalHits, cacheScores = false,
      maxDocsToCache = full.size + 10)
    searcher.collect(q, noScores)
    val ns = scala.collection.mutable.ArrayBuffer.empty[Double]
    noScores.replay(new Collector {
      def leaf(shard: Int): LeafCollector = new LeafCollector {
        def collect(d: Long, s: Double): Unit = ns += s
      }
    })
    assert(ns.nonEmpty && ns.forall(_.isNaN))
  }

  test("Caching: over-budget invalidates; replay throws; create() math") {
    val q = queries(1)
    val n = stream(q).size
    val inner = new TotalHits
    val caching = new Caching(inner, cacheScores = true,
      maxDocsToCache = n - 2)
    searcher.collect(q, caching)
    assert(!caching.isCached)
    // collection itself still completed through the wrapped collector
    assert(inner.count == searcher.count(q))
    intercept[IllegalStateException](caching.replay(new TotalHits))
    // create(): bytesPerDoc = 4 (+4 with scores), like the reference's
    // int-docId accounting — 1 MB caches 131072 scored docs
    val viaMb = Caching.create(new TotalHits, cacheScores = true, 1.0)
    searcher.collect(q, viaMb)
    assert(viaMb.isCached) // n << 131072
  }

  test("searchWithCount == (search, count), local and distributed") {
    for (q <- queries; s <- Seq(searcher, dist)) {
      val (hits, total) = s.searchWithCount(q, 10)
      assert(hits.toSeq == searcher.search(q, 10).toSeq, s"q=$q")
      assert(total == searcher.count(q), s"q=$q")
    }
  }

  test("collect refuses oversized postings (driver-local protocol)") {
    intercept[IllegalArgumentException] {
      dist.collect(TermQ("def"), new TotalHits)
    }
  }
}
