package graft.search

import graft.core.Hit

/** Bounded min-heap of k hits, ordered by the reference's tie-break law
  * (`search/HitQueue.java:76-81`): score desc, then docId asc. The heap
  * root is the WORST kept hit; a candidate must beat it to enter
  * (`search/TopScoreDocCollector.java:37-82`).
  */
final class BoundedHitQueue(k: Int) {
  require(k > 0)
  private val scores = new Array[Double](k)
  private val docs = new Array[Long](k)
  private var n = 0

  def size: Int = n
  def isFull: Boolean = n == k

  /** Score of the current worst kept hit (the collector threshold,
    * `TopScoreDocCollector.java:71-75`); -inf while not full.
    */
  def thresholdScore: Double =
    if (n < k) Double.NegativeInfinity else scores(0)

  /** true if (score, docId) is worse-or-equal than the root under
    * (score desc, docId asc) — i.e. would NOT enter a full heap.
    */
  @inline private def worseOrEqual(score: Double, docId: Long): Boolean =
    score < scores(0) || (score == scores(0) && docId >= docs(0))

  def insert(docId: Long, score: Double): Boolean = {
    if (n < k) {
      scores(n) = score; docs(n) = docId
      n += 1
      upHeap(n - 1)
      true
    } else if (worseOrEqual(score, docId)) {
      false
    } else {
      scores(0) = score; docs(0) = docId
      downHeap(0)
      true
    }
  }

  /** heap order: parent is WORSE than children (min-heap on quality). */
  @inline private def worse(i: Int, j: Int): Boolean =
    scores(i) < scores(j) || (scores(i) == scores(j) && docs(i) > docs(j))

  private def upHeap(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >>> 1
      if (worse(i, p)) { swap(i, p); i = p } else return
    }
  }

  private def downHeap(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < n && worse(l, m)) m = l
      if (r < n && worse(r, m)) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = docs(i); docs(i) = docs(j); docs(j) = d
  }

  /** Hits in final rank order (score desc, docId asc). */
  def sortedHits: Array[Hit] = {
    val out = new Array[Hit](n)
    var i = 0
    while (i < n) { out(i) = Hit(docs(i), scores(i)); i += 1 }
    scala.util.Sorting.stableSort(out,
      (a: Hit, b: Hit) => a.score > b.score || (a.score == b.score && a.docId < b.docId))
    out
  }
}

object TopK {

  /** Merge per-partition partial top-k lists into the global top-k —
    * TopDocs.merge semantics (`search/TopDocs.java:199-280`): score desc;
    * ties by docId asc (global docIds subsume the shard-index tie-break,
    * SURVEY.md §2.7).
    */
  def merge(partials: Iterable[Array[Hit]], k: Int): Array[Hit] = {
    val q = new BoundedHitQueue(k)
    partials.foreach(_.foreach(h => q.insert(h.docId, h.score)))
    q.sortedHits
  }
}
