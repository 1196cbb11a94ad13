package graft.search

import graft.core.Hit

/** The reference's collector protocol over the per-shard scorer walk —
  * a shard here plays the role of a Lucene leaf/segment:
  *
  *  - `Collector.leaf(shard)` ≙ `Collector.getLeafCollector(ctx)`
  *    (`search/Collector.java`), and may throw [[CollectionTerminated]]
  *    to skip the shard (`search/CollectionTerminatedException.java`).
  *  - `LeafCollector.collect(docId, score)` ≙ `LeafCollector.collect(doc)`
  *    with the scorer's score passed flat (our scorers expose the score
  *    at the collect site, so there is no separate setScorer phase).
  *
  * Collectors are a DRIVER-LOCAL (per-leaf) concept, exactly as in the
  * reference where a Collector instance is bound to one IndexSearcher
  * call. The 100 TB shape for "one pass, many outcomes" is the FUSED
  * per-shard partial — see `Searcher.searchWithCount`, which runs the
  * TopScoreDocCollector + TotalHitCountCollector combination inside the
  * distributed shard tasks and ships back one (top-k, count) pair per
  * shard; the Spark analog of the reference's time limit at cluster
  * scale is job-group cancellation, not a per-doc clock check.
  */
object Collectors {

  /** `search/CollectionTerminatedException.java`: a leaf collector asks
    * to stop (or never start) collection for the current leaf only.
    */
  final class CollectionTerminated extends RuntimeException {
    override def fillInStackTrace(): Throwable = this // control flow only
  }

  /** `TimeLimitingCollector.TimeExceededException` — carries the budget,
    * the elapsed ticks at the failing collect, and the last doc collected
    * (-1 when the timeout fired before any collect on this search).
    */
  final class TimeExceeded(val ticksAllowed: Long, val ticksElapsed: Long,
      val lastDocCollected: Long)
    extends RuntimeException(
      s"Elapsed time: $ticksElapsed. Exceeded allowed search time: " +
        s"$ticksAllowed ticks.")

  trait LeafCollector {
    def collect(docId: Long, score: Double): Unit
  }

  trait Collector {
    def leaf(shard: Int): LeafCollector
  }

  /** TotalHitCountCollector (`search/TotalHitCountCollector.java`). */
  final class TotalHits extends Collector {
    private var n = 0L
    def count: Long = n
    def leaf(shard: Int): LeafCollector = new LeafCollector {
      def collect(docId: Long, score: Double): Unit = n += 1
    }
  }

  /** TopScoreDocCollector over the shared BoundedHitQueue (score desc,
    * docId asc tie law, `search/HitQueue.java:76-81`).
    */
  final class TopK(k: Int) extends Collector {
    private val queue = new BoundedHitQueue(k)
    def hits: Array[Hit] = queue.sortedHits
    def leaf(shard: Int): LeafCollector = new LeafCollector {
      def collect(docId: Long, score: Double): Unit =
        queue.insert(docId, score)
    }
  }

  /** MultiCollector (`search/MultiCollector.java:44-79`): `wrap` drops
    * nulls, unwraps a singleton, and per leaf drops sub-collectors whose
    * leaf() throws CollectionTerminated; when ALL subs terminated, the
    * leaf itself terminates.
    */
  final class Multi private (subs: Array[Collector]) extends Collector {
    def leaf(shard: Int): LeafCollector = {
      val leaves = subs.flatMap { c =>
        try Some(c.leaf(shard))
        catch { case _: CollectionTerminated => None }
      }
      if (leaves.isEmpty) throw new CollectionTerminated
      if (leaves.length == 1) leaves(0)
      else new LeafCollector {
        def collect(docId: Long, score: Double): Unit = {
          var i = 0
          while (i < leaves.length) { leaves(i).collect(docId, score); i += 1 }
        }
      }
    }
  }
  object Multi {
    def wrap(collectors: Collector*): Collector = {
      val nonNull = collectors.filter(_ != null)
      require(nonNull.nonEmpty, "At least 1 collector must not be null")
      if (nonNull.size == 1) nonNull.head
      else new Multi(nonNull.toArray)
    }
  }

  /** TimeLimitingCollector (`search/TimeLimitingCollector.java:134-162`):
    * an external tick counter (the reference's TimerThread Counter —
    * here any () => Long, e.g. a deterministic test clock or
    * System.nanoTime-based ticks) is read on every leaf entry and every
    * collect; past the budget it throws [[TimeExceeded]], collecting the
    * failing doc first iff greedy. The baseline t0 is the clock at the
    * FIRST leaf, so one instance limits a multi-phase search without
    * resetting (the setCollector use case).
    */
  final class TimeLimiting(in: Collector, clock: () => Long,
      ticksAllowed: Long, greedy: Boolean = false) extends Collector {
    private var t0 = Long.MinValue
    private var timeout = Long.MinValue
    def leaf(shard: Int): LeafCollector = {
      if (t0 == Long.MinValue) { t0 = clock(); timeout = t0 + ticksAllowed }
      val time = clock()
      if (time - timeout > 0L)
        throw new TimeExceeded(timeout - t0, time - t0, -1L)
      val inner = in.leaf(shard)
      new LeafCollector {
        def collect(docId: Long, score: Double): Unit = {
          val time = clock()
          if (time - timeout > 0L) {
            if (greedy) inner.collect(docId, score)
            throw new TimeExceeded(timeout - t0, time - t0, docId)
          }
          inner.collect(docId, score)
        }
      }
    }
  }

  /** CachingCollector (`search/CachingCollector.java`): buffers the
    * collected (doc, score) stream per leaf while forwarding to the
    * wrapped collector; once the total buffered docs would exceed
    * `maxDocsToCache` the WHOLE cache is invalidated (the reference's
    * RAM-bound invalidate(), `CachingCollector.java:186-199`) and
    * collection continues uncached. `replay` feeds the cached stream to
    * another collector leaf-by-leaf in original order, or throws
    * IllegalStateException when the cache was dropped. The RAM-MB
    * constructor maps to docs exactly like `create(…, maxRAMMB)`:
    * bytesPerDoc = 4 (+4 when caching scores) in the reference's
    * int-docId accounting — kept identical so the same MB bound caches
    * the same number of docs. Without cacheScores the replayed scores
    * are NaN (the reference replays with no scorer attached; reading a
    * score there is undefined too).
    */
  final class Caching(in: Collector, cacheScores: Boolean,
      maxDocsToCache: Int) extends Collector {
    import scala.collection.mutable.ArrayBuffer
    private var cachedFlag = true
    private var totalCached = 0
    private val shardIds = ArrayBuffer.empty[Int]
    private val docLists = ArrayBuffer.empty[ArrayBuffer[Long]]
    private val scoreLists = ArrayBuffer.empty[ArrayBuffer[Double]]

    def isCached: Boolean = cachedFlag

    def leaf(shard: Int): LeafCollector = {
      val inner = in.leaf(shard)
      if (!cachedFlag) return inner
      val docs = ArrayBuffer.empty[Long]
      val scores = ArrayBuffer.empty[Double]
      shardIds += shard
      docLists += docs
      scoreLists += scores
      new LeafCollector {
        def collect(docId: Long, score: Double): Unit = {
          if (cachedFlag) {
            // the budget is GLOBAL across leaves, like the reference's
            // maxDocsToCache -= docs.length bookkeeping at postCollect
            if (totalCached >= maxDocsToCache) invalidate()
            else {
              docs += docId
              if (cacheScores) scores += score
              totalCached += 1
            }
          }
          inner.collect(docId, score)
        }
      }
    }

    private def invalidate(): Unit = {
      cachedFlag = false
      shardIds.clear(); docLists.clear(); scoreLists.clear()
    }

    def replay(other: Collector): Unit = {
      if (!cachedFlag) throw new IllegalStateException(
        "cannot replay: cache was cleared because too much RAM was required")
      var i = 0
      while (i < shardIds.length) {
        val leaf =
          try Some(other.leaf(shardIds(i)))
          catch { case _: CollectionTerminated => None }
        leaf.foreach { lc =>
          val docs = docLists(i)
          var j = 0
          while (j < docs.length) {
            val s = if (cacheScores) scoreLists(i)(j) else Double.NaN
            lc.collect(docs(j), s)
            j += 1
          }
        }
        i += 1
      }
    }
  }
  object Caching {
    /** `CachingCollector.create(other, cacheScores, maxRAMMB)`. */
    def create(in: Collector, cacheScores: Boolean,
        maxRAMMB: Double): Caching = {
      val bytesPerDoc = if (cacheScores) 8 else 4
      new Caching(in, cacheScores,
        ((maxRAMMB * 1024 * 1024) / bytesPerDoc).toInt)
    }
  }
}
