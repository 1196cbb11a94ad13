package graft.search

/** Block-max WAND top-k collection (Ding & Suel 2011) — the upgrade of the
  * reference's two pruning devices: the collector's heap threshold
  * (`search/TopScoreDocCollector.java:71-75`) and per-128-doc skip blocks
  * (`codecs/lucene50/Lucene50SkipWriter.java:46-68`), combined with the
  * WAND pivoting of `search/MinShouldMatchSumScorer.java:33-70`.
  *
  * Pure optimization: produces EXACTLY the hits the exhaustive
  * DisjunctionScorer loop produces. Safety arguments:
  *  - per-block bound score(maxTf, minCacheNorm) dominates every member
  *    score in float arithmetic because IEEE rounding is monotone and the
  *    BM25 kernel is monotone in tf and in -cache;
  *  - docs stream in ascending docId, so a candidate whose upper bound
  *    EQUALS the heap threshold still loses the docId-asc tie-break —
  *    skipping on `ub <= threshold` is exact.
  */
object Wand {

  /** Per-scorer bound helpers (leaf = TermScorer, possibly mod-filtered). */
  private def termOf(s: DocScorer): TermScorer = s match {
    case t: TermScorer => t
    case m: ModFilterScorer => termOf(m.innerScorer)
    case other => sys.error(s"not a WAND leaf: $other")
  }

  /** Upper bound of any doc ≥ target within the block containing target. */
  private def boundAt(s: DocScorer, target: Long): Double = {
    val t = termOf(s)
    val it = t.underlying
    val b = it.blockFor(target)
    if (b >= it.numBlocks) 0d else t.blockBound(b).toDouble
  }

  /** Last doc of the block containing target (shallow-advance boundary). */
  private def blockLastAt(s: DocScorer, target: Long): Long = {
    val t = termOf(s)
    val it = t.underlying
    val b = it.blockFor(target)
    it.blockLastDoc(b)
  }

  /** Whether the scorer tree is a WAND-able leaf set. */
  def leafable(s: DocScorer): Boolean = s match {
    case _: TermScorer => true
    case m: ModFilterScorer => leafable(m.innerScorer)
    case _ => false
  }

  /** Collect top-k of the disjunction of `scorers` (minShouldMatch = msm)
    * into `queue`. All scorers must be un-started (doc == -1).
    *
    * msm ≥ 2 generalizes the pivot rule (the WAND paper's original form,
    * mirrored by `MinShouldMatchSumScorer.java:33-70`): the pivot must sit
    * at index ≥ msm−1 in doc order — a doc with fewer than msm scorers at
    * or before it can never match — AND the bound prefix must beat the
    * threshold. An aligned candidate inserts only when ≥ msm scorers sit
    * on it.
    */
  def collect(scorers0: Array[DocScorer], queue: BoundedHitQueue,
      after: Option[(Double, Long)], msm: Int = 1,
      deletes: Array[Long] = Array.empty): Int = {
    var scored = 0
    val scorers = scorers0.filterNot(_ eq EmptyScorer)
    if (scorers.isEmpty || scorers.length < msm) return 0
    val n = scorers.length
    val maxScores = scorers.map(_.maxScore.toDouble)
    // searchAfter: scores >= cursor score can never be accepted, so the
    // cursor score acts as an initial threshold (ties filtered on insert)
    val afterS = after.map(_._1)
    val afterD = after.map(_._2).getOrElse(-1L)

    // order: array of indices sorted by current doc
    val order = Array.range(0, n)
    scorers.foreach(_.nextDoc())
    def resort(): Unit = {
      // insertion sort — nearly sorted after each single advance
      var i = 1
      while (i < n) {
        val v = order(i)
        val d = scorers(v).doc
        var j = i - 1
        while (j >= 0 && scorers(order(j)).doc > d) {
          order(j + 1) = order(j); j -= 1
        }
        order(j + 1) = v
        i += 1
      }
    }
    resort()

    def threshold: Double = {
      val t = queue.thresholdScore
      afterS match {
        case Some(a) => math.max(t, math.nextDown(a)) // accept only < a (ties by docId handled on insert)
        case None => t
      }
    }

    while (true) {
      // ---- pivot selection on global term bounds ----
      val th = threshold
      var acc = 0d
      var pivotIdx = -1
      var i = 0
      while (i < n && pivotIdx == -1) {
        val s = scorers(order(i))
        if (s.doc == DocScorer.NO_MORE) { i = n }
        else {
          acc += maxScores(order(i))
          if (acc > th && i + 1 >= msm) pivotIdx = i
          else i += 1
        }
      }
      if (pivotIdx == -1) return scored // nothing can beat the threshold
      val pivotDoc = scorers(order(pivotIdx)).doc
      // extend to every scorer positioned exactly at pivotDoc
      while (pivotIdx + 1 < n && scorers(order(pivotIdx + 1)).doc == pivotDoc)
        pivotIdx += 1

      // ---- block-max refinement ----
      var blockUb = 0d
      var minBlockLast = Long.MaxValue
      i = 0
      while (i <= pivotIdx) {
        val s = scorers(order(i))
        blockUb += boundAt(s, pivotDoc)
        val bl = blockLastAt(s, pivotDoc)
        if (bl < minBlockLast) minBlockLast = bl
        i += 1
      }
      if (blockUb <= th) {
        // no doc in the current block alignment can win: shallow-advance
        // past the nearest block boundary (or to the next pivot candidate)
        var target = minBlockLast + 1
        if (pivotIdx + 1 < n) {
          val nextDoc = scorers(order(pivotIdx + 1)).doc
          if (nextDoc < target) target = nextDoc
        }
        if (target <= pivotDoc) target = pivotDoc + 1
        // advance the contributor with the largest term bound
        var best = 0; var bestScore = -1d
        i = 0
        while (i <= pivotIdx) {
          if (maxScores(order(i)) > bestScore) {
            bestScore = maxScores(order(i)); best = i
          }
          i += 1
        }
        scorers(order(best)).advance(target)
        resort()
      } else if (scorers(order(0)).doc == pivotDoc) {
        // all leading scorers aligned: score fully
        var s = 0d
        var cnt = 0
        scored += 1
        i = 0
        while (i < n && scorers(order(i)).doc == pivotDoc) {
          s += scorers(order(i)).score
          cnt += 1
          i += 1
        }
        val score = s.toFloat.toDouble
        // tombstone mask at collection (liveDocs law): a deleted doc is
        // never inserted — it also never ramps the threshold, which only
        // weakens pruning, never the result
        val accept = cnt >= msm &&
          !graft.index.Deletes.contains(deletes, pivotDoc) && (after.isEmpty ||
          score < afterS.get || (score == afterS.get && pivotDoc > afterD))
        if (accept) queue.insert(pivotDoc, score)
        // advance all scorers at pivotDoc
        i = 0
        while (i < n && scorers(order(i)).doc == pivotDoc) {
          scorers(order(i)).nextDoc()
          i += 1
        }
        resort()
      } else {
        // advance the leading scorer with the largest bound to the pivot
        var best = 0; var bestScore = -1d
        i = 0
        while (scorers(order(i)).doc < pivotDoc) {
          if (maxScores(order(i)) > bestScore) {
            bestScore = maxScores(order(i)); best = i
          }
          i += 1
        }
        scorers(order(best)).advance(pivotDoc)
        resort()
      }
    }
    scored // unreachable (loop exits via the pivot return); typing only
  }

  /** Top-k of a CONJUNCTION of term leaves with block-max score pruning —
    * the MaxScore/BMW treatment of AND queries: leapfrog alignment as in
    * ConjunctionDISI, but an aligned candidate whose summed per-block
    * bounds cannot beat the heap threshold is skipped, and the cursor
    * jumps past the tightest block boundary. Exact: the block bound
    * dominates the true score, and an equal-to-threshold candidate loses
    * the docId-asc tie-break anyway (docs stream ascending).
    * Scores sum in cost-sorted order, matching ConjunctionScorer.
    */
  def collectConjunction(scorers0: Array[DocScorer], queue: BoundedHitQueue,
      after: Option[(Double, Long)],
      deletes: Array[Long] = Array.empty): Int = {
    var scored = 0
    if (scorers0.isEmpty || scorers0.exists(_ eq EmptyScorer)) return 0
    val scorers = scorers0.sortBy(_.cost)
    val n = scorers.length
    val afterS = after.map(_._1)
    val afterD = after.map(_._2).getOrElse(-1L)
    def threshold: Double = {
      val t = queue.thresholdScore
      afterS match {
        case Some(a) => math.max(t, math.nextDown(a))
        case None => t
      }
    }
    scorers.foreach(_.nextDoc())
    var target = 0L
    var i = 0
    while (i < n) {
      if (scorers(i).doc > target) target = scorers(i).doc
      i += 1
    }
    while (target != DocScorer.NO_MORE) {
      var agreed = true
      i = 0
      while (i < n && agreed) {
        if (scorers(i).doc < target) scorers(i).advance(target)
        if (scorers(i).doc > target) { target = scorers(i).doc; agreed = false }
        i += 1
      }
      if (agreed) {
        val th = threshold
        var ub = 0d
        var minBlockLast = Long.MaxValue
        i = 0
        while (i < n) {
          ub += boundAt(scorers(i), target)
          val bl = blockLastAt(scorers(i), target)
          if (bl < minBlockLast) minBlockLast = bl
          i += 1
        }
        if (ub <= th) {
          // nothing in the current block alignment can enter the heap
          target = math.max(minBlockLast + 1, target + 1)
        } else {
          var s = 0d
          scored += 1
          i = 0
          while (i < n) { s += scorers(i).score; i += 1 }
          val score = s.toFloat.toDouble
          val accept = !graft.index.Deletes.contains(deletes, target) &&
            (after.isEmpty ||
            score < afterS.get || (score == afterS.get && target > afterD))
          if (accept) queue.insert(target, score)
          target += 1
        }
      }
    }
    scored
  }
}
