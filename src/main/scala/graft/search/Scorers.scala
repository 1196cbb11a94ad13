package graft.search

import graft.index.PostingsCodec.PostingsIterator

/** Doc-at-a-time scorer tree over decoded posting iterators — the Scorer /
  * DocIdSetIterator layer of the reference (SURVEY.md §2.6), executed
  * inside one Spark task (one shard). All scorers expose a sorted docID
  * stream; `score` is float like the reference's `Scorer.score()`.
  */
trait DocScorer {
  /** Current doc, Long.MaxValue when exhausted, -1 before first next. */
  def doc: Long
  def nextDoc(): Long
  def advance(target: Long): Long
  def score: Float
  def cost: Long
  /** Global upper bound of `score` (WAND term bound). */
  def maxScore: Float
}

object DocScorer {
  val NO_MORE: Long = Long.MaxValue
}

/** TermScorer (`search/TermScorer.java:27-67`): w * tf / (tf + cache(norm)).
  * May wrap several salted sub-lists of the same term? No — within one
  * shard a term has exactly one posting list (build invariant), so this
  * wraps a single iterator.
  */
final class TermScorer(it: PostingsIterator, w: Float,
    cache: Array[Float], sim: Int = 0) extends DocScorer {
  def doc: Long = it.doc
  def nextDoc(): Long = { it.nextDoc(); it.doc }
  def advance(target: Long): Long = { it.advance(target); it.doc }
  /** sim 0 (BM25): w·tf/(tf+cache(norm)), cache = freq-independent
    * denominators. sim 1 (Classic TF-IDF, `TFIDFSimilarity.java:746-751`):
    * (tf(freq)·value)·decodeNorm — w = IDFStats.value, cache = the
    * byte315 decode table, tf(freq) = (float)sqrt(freq)
    * (`ClassicSimilarity.java:120-122`). sim 2 (LMDirichlet,
    * `LMDirichletSimilarity.java:59-64`): max(0, (float)(ln(1 +
    * freq/(μ·cp)) + ln(μ/(docLen+μ)))) — w = μ·cp (collection
    * probability precomputed), cache = the decoded-length table.
    * sim 9 (LMJelinekMercer, the only other sim routed here — the
    * DFR/IB kinds construct their own scorer classes): w = λ·cp.
    */
  def score: Float =
    if (sim == 0) BM25.score(w, it.tf.toFloat, cache(it.norm & 0xff))
    else if (sim == 1) (math.sqrt(it.tf.toFloat.toDouble).toFloat * w) * cache(it.norm & 0xff)
    else if (sim == 2) lmScore(it.tf.toFloat, cache(it.norm & 0xff))
    else if (sim == SegmentSearcher.SimSweetSpot)
      (SegmentSearcher.sweetSpotTf(it.tf.toFloat) * w) * cache(it.norm & 0xff)
    else jmScore(it.tf.toFloat, cache(it.norm & 0xff))

  /** LMDirichlet score body: inner ratios in FLOAT (Java evaluates
    * `freq / (mu * cp)` and `mu / (docLen + mu)` as float before the
    * double log), logs summed in double, one float cast, clamped ≥ 0.
    */
  private def lmScore(freq: Float, docLen: Float): Float = {
    val mu = 2000f
    val s = (math.log((1f + freq / w).toDouble) +
      math.log((mu / (docLen + mu)).toDouble)).toFloat
    if (s > 0f) s else 0f
  }

  /** LM Jelinek-Mercer body (`LMJelinekMercerSimilarity.java:54-60`):
    * (float)ln(1 + ((1−λ)·freq/docLen)/(λ·cp)) with w = λ·cp folded
    * driver-side (mkJMWeights); numerator chain all float, one double
    * log, one float cast. λ = 0.1f.
    */
  private def jmScore(freq: Float, docLen: Float): Float =
    math.log((1f + ((1f - SegmentSearcher.JMLambda) * freq / docLen) / w)
      .toDouble).toFloat
  def cost: Long = it.cost
  lazy val maxScore: Float = {
    // tightest global bound = max over blocks of the per-block bound
    var m = 0f
    var b = 0
    while (b < it.numBlocks) {
      val s = blockBound(b)
      if (s > m) m = s
      b += 1
    }
    m
  }
  /** Per-block upper bound: maxTf with the block's best norm byte (the
    * minCacheByte is simultaneously the smallest BM25 denominator and
    * the largest Classic decodeNorm — both monotone in the byte).
    */
  def blockBound(b: Int): Float = {
    val tf = it.blockMaxTf(b).toFloat
    if (sim == 0) BM25.score(w, tf, cache(it.blockMinNorm(b) & 0xff))
    else if (sim == 1) (math.sqrt(tf.toDouble).toFloat * w) * cache(it.blockMinNorm(b) & 0xff)
    else if (sim == 2) lmScore(tf, cache(it.blockMinNorm(b) & 0xff))
    else if (sim == SegmentSearcher.SimSweetSpot)
      (SegmentSearcher.sweetSpotTf(tf) * w) * cache(it.blockMinNorm(b) & 0xff)
    else jmScore(tf, cache(it.blockMinNorm(b) & 0xff))
  }
  def underlying: PostingsIterator = it
}

/** Keeps only docs of one shard (docId mod S == shard): used when a cold
  * (unsalted) posting list is replicated to every shard of a salted query
  * so union counts each doc exactly once.
  */
final class ModFilterScorer(val innerScorer: DocScorer, shard: Int, s: Int)
    extends DocScorer {
  def doc: Long = innerScorer.doc
  private def settle(d0: Long): Long = {
    var d = d0
    while (d != DocScorer.NO_MORE && (d % s).toInt != shard)
      d = innerScorer.nextDoc()
    d
  }
  def nextDoc(): Long = settle(innerScorer.nextDoc())
  def advance(target: Long): Long = settle(innerScorer.advance(target))
  def score: Float = innerScorer.score
  def cost: Long = innerScorer.cost / s + 1
  def maxScore: Float = innerScorer.maxScore
}

/** Empty stream (term absent from this shard/index). */
object EmptyScorer extends DocScorer {
  def doc: Long = DocScorer.NO_MORE
  def nextDoc(): Long = DocScorer.NO_MORE
  def advance(target: Long): Long = DocScorer.NO_MORE
  def score: Float = 0f
  def cost: Long = 0L
  def maxScore: Float = 0f
}

/** DFR GB2 term scorer (`DFRSimilarity.java:110-114` with BasicModelG,
  * AfterEffectB, NormalizationH2, c = 1):
  *
  *   tfn    = (float)(tf · log2(1 + avgdl/docLen))   [H2, c·avg = avg]
  *   λ      = F/(N+F), F = ttf+1 (double)            [G]
  *   bm     = (float)(log2(λ+1) + tfn · log2((1+λ)/λ))
  *   ae     = (F+1) / (n·(tfn+1)), n = df+1 (floats) [B]
  *   score  = (boost · bm) · ae, boost = 1
  *
  * docLen = the SimilarityBase NORM_TABLE decode (quantized length).
  * The λ log constants fold once per scorer; exact Java promotion
  * order preserved (float inner ratio in tfn, double logs, float casts).
  */
final class DFRTermScorer(it: PostingsIterator, df: Long, ttf: Long,
    numDocs: Long, avgdl: Float, cache: Array[Float]) extends DocScorer {
  private val fn = new DFRScoreFn(df, ttf, numDocs, avgdl)

  def doc: Long = it.doc
  def nextDoc(): Long = { it.nextDoc(); it.doc }
  def advance(target: Long): Long = { it.advance(target); it.doc }
  def score: Float = fn.scoreOf(it.tf.toFloat, cache(it.norm & 0xff))
  def cost: Long = it.cost
  def maxScore: Float = fn.maxScore
}

/** The pure DFR GB2 score function behind [[DFRTermScorer]] — per-term
  * constants folded once, then (tf, decodedDocLen) → score. Factored
  * out so MultiSimilarity components can evaluate it against a shared
  * postings cursor.
  */
final class DFRScoreFn(df: Long, ttf: Long, numDocs: Long, avgdl: Float) {
  private val lambda: Double = {
    val fD = (ttf + 1).toDouble
    fD / (numDocs.toDouble + fD)
  }
  private val g1: Double = math.log(lambda + 1) / DFRTermScorer.Log2
  private val g2: Double = math.log((1 + lambda) / lambda) / DFRTermScorer.Log2
  private val fp1: Float = (ttf + 2L).toFloat // (F+1) promoted at the division
  private val nf: Float = (df + 1L).toFloat

  def scoreOf(tf: Float, docLen: Float): Float = {
    val tfn = (tf.toDouble *
      (math.log((1f + avgdl / docLen).toDouble) / DFRTermScorer.Log2)).toFloat
    val bm = (g1 + tfn.toDouble * g2).toFloat
    val ae = fp1 / (nf * (tfn + 1f))
    (1f * bm) * ae
  }
  /** (g1+g2·t)·c/(t+1) with c = (F+1)/n is monotone in t (derivative
    * sign = g2−g1), so sup = c·max(g1, g2); inflated 1% for float
    * rounding — an upper bound only (WAND is off for DFR anyway).
    */
  lazy val maxScore: Float =
    ((fp1 / nf).toDouble * math.max(g1, g2) * 1.01).toFloat
}

object DFRTermScorer { val Log2: Double = math.log(2) }

/** One component similarity of a MultiSimilarity: (tf, norm byte) →
  * score. Each component decodes the shared norm byte its own way —
  * exactly the reference, where every sub-SimScorer reads the norm
  * that `MultiSimilarity.computeNorm` delegated to sims[0] (all sims
  * here encode the identical byte315(1/√length)).
  */
trait MultiSimComponent { def score(tf: Float, normByte: Byte): Float }

/** MultiSimilarity term scorer — the CombSUM combination
  * (`similarities/MultiSimilarity.java:37,70-90`): score = the FLOAT
  * running sum of the component scores at the shared (tf, norm), added
  * in component order (`MultiSimScorer.score` accumulates into a
  * float).
  */
final class MultiSimTermScorer(it: PostingsIterator,
    comps: Array[MultiSimComponent]) extends DocScorer {
  def doc: Long = it.doc
  def nextDoc(): Long = { it.nextDoc(); it.doc }
  def advance(target: Long): Long = { it.advance(target); it.doc }
  def score: Float = {
    var s = 0f
    var i = 0
    while (i < comps.length) { s += comps(i).score(it.tf.toFloat, it.norm); i += 1 }
    s
  }
  def cost: Long = it.cost
  /** Loose bound: per-block component-sum at (maxTf, best norm byte),
    * inflated 5% — WAND never runs under MultiSimilarity regardless.
    */
  lazy val maxScore: Float = {
    var m = 0f
    var b = 0
    while (b < it.numBlocks) {
      var s = 0f
      var i = 0
      while (i < comps.length) {
        s += comps(i).score(it.blockMaxTf(b).toFloat, it.blockMinNorm(b))
        i += 1
      }
      if (s > m) m = s
      b += 1
    }
    (m.toDouble * 1.05).toFloat
  }
}

/** Parameterized SimilarityBase term scorer covering the remaining DFR
  * component combinations, the IB family, and LM Jelinek-Mercer
  * (`similarities/SimilarityBase.java:73-80` score plumbing;
  * `DFRSimilarity.java:110-114`, `IBSimilarity.java:92-99`,
  * `LMJelinekMercerSimilarity.java:54-60`). One `kind` per published
  * combination (SegmentSearcher.SimDFRInL2..SimLMJM); every float/double
  * promotion replays the Java evaluation order:
  *
  *   H1 tfn  = (tf·c·avg)/len, all float     [NormalizationH1.java:51-53]
  *   H2 tfn  = (float)(tf·log2(1f + c·avg/len)) [NormalizationH2.java:52-54]
  *   H3 tfn  = (tf + μ·((F+1)/(sumTTF+1)))/(len+μ)·μ, μ=800, all float
  *                                              [NormalizationH3.java:56-58]
  *   Z tfn   = (float)(tf·(avg/len)^z), z=0.30f  [NormalizationZ.java:48-50]
  *   I(F)    = tfn·(float)log2(1 + (N+1)/(F+0.5)) [BasicModelIF.java:35-39]
  *   I(n)    = tfn·(float)log2((N+1)/(n+0.5))   [BasicModelIn.java:34-38]
  *   I(ne)   = tfn·(float)log2((N+1)/(ne+0.5)),
  *             ne = N·(1−((N−1)/N)^F), doubles  [BasicModelIne.java:35-40]
  *   P       = (float)(tfn·log2(tfn/λ) + (λ + 1/(12·tfn) − tfn)·log2(e)
  *             + 0.5·log2(2π·tfn)), λ=(float)(F+1)/(N+1)
  *                                              [BasicModelP.java:40-45]
  *   B ae    = (F+1)/(n·(tfn+1)), F=ttf+1, n=df+1 [AfterEffectB.java:32-36]
  *   L ae    = 1/(tfn+1)                        [AfterEffectL.java:31-33]
  *   LL      = (float)−ln(λ/(tfn+λ))            [DistributionLL.java:33-35]
  *   SPL     = (float)−ln((λ^(tfn/(tfn+1)) − λ)/(1 − λ)), λ→0.99f if 1f
  *                                              [DistributionSPL.java:34-40]
  *   λ_DF    = (df+1F)/(N+1F)                   [LambdaDF.java:32-34]
  *   λ_TTF   = (ttf+1F)/(N+1F)                  [LambdaTTF.java:33-35]
  *   JM      = (float)ln(1 + ((1−λ)·tf/len)/(λ·cp)), λ=0.1f
  *   DFI     = 0 if tf ≤ e, else (float)log2(measure+1);
  *             e = (F+1)·len/(sumTTF+1), measure = χ²/saturated/
  *             standardized                 [DFISimilarity.java:61-72]
  *
  * docLen = SimilarityBase NORM_TABLE decode (quantized length). WAND is
  * off for every kind here (P's tf curve is non-monotone; the rest are
  * monotone but unproven under the quantization — maxScore is a loose
  * upper bound only, never consulted by the non-WAND exec path).
  */
final class SimBaseTermScorer(it: PostingsIterator, df: Long, ttf: Long,
    numDocs: Long, avgdl: Float, cache: Array[Float], kind: Int,
    sumTtf: Long = 0L) extends DocScorer {
  private val fn = new SimBaseScoreFn(kind, df, ttf, numDocs, avgdl, sumTtf)

  def doc: Long = it.doc
  def nextDoc(): Long = { it.nextDoc(); it.doc }
  def advance(target: Long): Long = { it.advance(target); it.doc }
  def cost: Long = it.cost

  def score: Float = fn.scoreOf(it.tf.toFloat, cache(it.norm & 0xff))

  /** Loose global bound: max over blocks of the per-block score with the
    * block-max tf at the best (smallest-length) norm byte, inflated 5%
    * for float rounding. P is non-monotone in tf between integers, but
    * the per-block sup over INTEGER tf values is attained at an endpoint
    * we also inflate; WAND never runs for these kinds regardless.
    */
  lazy val maxScore: Float = {
    var m = 0f
    var b = 0
    while (b < it.numBlocks) {
      val s = fn.scoreOf(it.blockMaxTf(b).toFloat, cache(it.blockMinNorm(b) & 0xff))
      if (s > m) m = s
      b += 1
    }
    (m.toDouble * 1.05).toFloat
  }
}

/** The pure SimilarityBase score function behind [[SimBaseTermScorer]]
  * — per-term constants folded once (like the reference's SimWeight),
  * then (tf, decodedDocLen) → score. Factored out so MultiSimilarity
  * components can evaluate it against a shared postings cursor.
  */
final class SimBaseScoreFn(kind: Int, df: Long, ttf: Long,
    numDocs: Long, avgdl: Float, sumTtf: Long = 0L) {
  import DFRTermScorer.Log2
  import SegmentSearcher._

  // per-term constants, folded once per scorer like the Weight would
  private val inConst: Float = // I(n) log factor
    (math.log((numDocs + 1L).toDouble / (df.toDouble + 0.5)) / Log2).toFloat
  private val ineConst: Float = { // I(ne) log factor
    val nD = numDocs.toDouble
    val ne = nD * (1 - math.pow((numDocs - 1L).toDouble / nD, ttf.toDouble))
    (math.log((numDocs + 1L).toDouble / (ne + 0.5)) / Log2).toFloat
  }
  private val pLambda: Float = (ttf + 1L).toFloat / (numDocs + 1L) // P λ
  private val ifConst: Float = // I(F) log factor (BasicModelIF.java:35-39)
    (math.log(1 + (numDocs + 1L).toDouble / (ttf.toDouble + 0.5)) / Log2).toFloat
  private val fp1: Float = (ttf + 2L).toFloat // AfterEffectB (F+1)
  private val nf: Float = (df + 1L).toFloat // AfterEffectB n
  private val lamDF: Float = (df + 1f) / (numDocs + 1f) // LambdaDF
  private val lamTTF: Float = (ttf + 1f) / (numDocs + 1f) // LambdaTTF

  private def tfnOf(tf: Float, docLen: Float): Float = kind match {
    case SimDFRIneB1 | SimIBLlL1 | SimDFRBeB1 => (tf * avgdl) / docLen // H1, c=1f
    case SimDFRIFB3 => // H3, μ=800 (Dirichlet-prior smoothing)
      val mu = 800f
      (tf + mu * ((ttf + 1f) / (sumTtf + 1f))) / (docLen + mu) * mu
    case SimIBSplDZ => // Z, z=0.30 (Pareto-Zipf)
      (tf.toDouble * math.pow((avgdl / docLen).toDouble, 0.30f.toDouble)).toFloat
    case _ => // H2, c=1f
      (tf.toDouble * (math.log((1f + avgdl / docLen).toDouble) / Log2)).toFloat
  }

  def scoreOf(tf: Float, docLen: Float): Float = kind match {
    case SimDFRInL2 => // I(n) · L
      val tfn = tfnOf(tf, docLen)
      val bm = tfn * inConst
      (1f * bm) * (1f / (tfn + 1f))
    case SimDFRIneB1 => // I(ne) · B
      val tfn = tfnOf(tf, docLen)
      val bm = tfn * ineConst
      (1f * bm) * (fp1 / (nf * (tfn + 1f)))
    case SimDFRIFB3 => // I(F) · B (H3 tfn)
      val tfn = tfnOf(tf, docLen)
      val bm = tfn * ifConst
      (1f * bm) * (fp1 / (nf * (tfn + 1f)))
    case SimDFRPL2 => // P · L
      val tfn = tfnOf(tf, docLen)
      val bm = (tfn.toDouble * (math.log((tfn / pLambda).toDouble) / Log2) +
        ((pLambda + 1f / (12f * tfn)) - tfn).toDouble * SimBaseTermScorer.Log2E +
        0.5 * (math.log(2 * math.Pi * tfn.toDouble) / Log2)).toFloat
      (1f * bm) * (1f / (tfn + 1f))
    case SimIBSplD2 | SimIBSplDZ => // SPL distribution, λ_DF (H2 / Z tfn)
      val tfn = tfnOf(tf, docLen)
      val lam = if (lamDF == 1f) 0.99f else lamDF
      val d = (-math.log((math.pow(lam.toDouble,
        (tfn / (tfn + 1f)).toDouble) - lam.toDouble) / (1f - lam).toDouble))
        .toFloat
      1f * d
    case SimIBLlL1 => // LL distribution, λ_TTF
      val tfn = tfnOf(tf, docLen)
      val d = (-math.log((lamTTF / (tfn + lamTTF)).toDouble)).toFloat
      1f * d
    case SimDFRBeB1 => // Be (limiting Bose-Einstein) · B
      // BasicModelBE.java:39-48: all-double, one float cast; the
      // approximation needs F << N so the reference inflates N by F.
      val tfn = tfnOf(tf, docLen)
      val F = ttf.toDouble + 1.0 + tfn.toDouble
      val nD = F + numDocs.toDouble
      @inline def f(n: Double, m: Double): Double =
        (m + 0.5) * (math.log(n / m) / Log2) + (n - m) * (math.log(n) / Log2)
      val bm = (-(math.log((nD - 1) * math.E) / Log2) +
        f(nD + F - 1, nD + F - tfn.toDouble - 2) -
        f(F, F - tfn.toDouble)).toFloat
      (1f * bm) * (fp1 / (nf * (tfn + 1f)))
    case SimDFRDL2 => // D (binomial approximation) · L
      // BasicModelD.java:42-49: φ kept < 1 by folding tfn into F.
      val tfn = tfnOf(tf, docLen)
      val F = ttf.toDouble + 1.0 + tfn.toDouble
      val phi = tfn.toDouble / F
      val nphi = 1.0 - phi
      val p = 1.0 / (numDocs.toDouble + 1)
      val d = phi * (math.log(phi / p) / Log2) +
        nphi * (math.log(nphi / (1 - p)) / Log2)
      val bm = (d * F +
        0.5 * (math.log(1 + 2 * math.Pi * tfn.toDouble * nphi) / Log2)).toFloat
      (1f * bm) * (1f / (tfn + 1f))
    case SimDFIChi | SimDFISat | SimDFIStd => // DFI: raw freq, no tfn
      val expected = ((ttf + 1L).toFloat * docLen) / (sumTtf + 1L)
      if (tf <= expected) 0f
      else {
        val measure = kind match {
          case SimDFIChi => ((tf - expected) * (tf - expected)) / expected
          case SimDFISat => (tf - expected) / expected
          case _ => (tf - expected) / math.sqrt(expected.toDouble).toFloat
        }
        1f * (math.log((measure + 1f).toDouble) / Log2).toFloat
      }
    case k => sys.error(s"SimBaseTermScorer: unknown kind $k")
  }
}

object SimBaseTermScorer {
  /** BasicModelP.LOG2_E (`BasicModelP.java:31`). */
  val Log2E: Double = 1.0 / math.log(2)
}

/** Leapfrog intersection, cheapest-first lead (`ConjunctionDISI.java:
  * 38,193-240`); score = coord × float cast of double sum
  * (`ConjunctionScorer.java:61-67`). coord = 1 (the multiplicative
  * identity, bit-exact no-op) except under a coord'ing similarity.
  */
final class ConjunctionScorer(scorers: Array[DocScorer],
    coord: Float = 1f) extends DocScorer {
  require(scorers.nonEmpty)
  private val sorted = scorers.sortBy(_.cost)
  var doc: Long = -1L

  private def doNext(startTarget: Long): Long = {
    var target = startTarget
    var agreed = false
    while (!agreed && target != DocScorer.NO_MORE) {
      agreed = true
      var i = 0
      while (i < sorted.length && agreed) {
        val s = sorted(i)
        if (s.doc < target) {
          val d = s.advance(target)
          if (d > target) { target = d; agreed = false }
        } else if (s.doc > target) {
          target = s.doc; agreed = false
        }
        i += 1
      }
    }
    doc = target
    doc
  }

  def nextDoc(): Long = {
    val lead = sorted(0)
    doNext(lead.nextDoc())
  }
  def advance(target: Long): Long = doNext(sorted(0).advance(target))
  def score: Float = {
    var s = 0d
    var i = 0
    while (i < sorted.length) { s += sorted(i).score; i += 1 }
    coord * s.toFloat
  }
  def cost: Long = sorted(0).cost
  lazy val maxScore: Float = {
    var s = 0d
    scorers.foreach(s += _.maxScore)
    coord * s.toFloat
  }
}

/** Disjunction with minShouldMatch: doc-at-a-time over the sub-scorers,
  * score = float cast of double sum of matching clauses
  * (`DisjunctionSumScorer.java:43-46`, `MinShouldMatchSumScorer.java`).
  * Linear min-scan — fine for the handful of clauses real queries carry.
  */
final class DisjunctionScorer(scorers: Array[DocScorer], msm: Int = 1,
    coords: Array[Float] = null) extends DocScorer {
  require(scorers.nonEmpty)
  var doc: Long = -1L
  private var curScore = 0f
  private var curCnt = 0

  /** Matching sub-scorers on the current doc — DisjunctionScorer.freq()
    * (`DisjunctionSumScorer.java:41-44`), read by the composite coord
    * scorers.
    */
  def matchCount: Int = curCnt

  private def settle(): Long = {
    while (true) {
      var min = DocScorer.NO_MORE
      var i = 0
      while (i < scorers.length) {
        val d = scorers(i).doc
        if (d > doc && d < min) min = d
        i += 1
      }
      if (min == DocScorer.NO_MORE) { doc = min; curScore = 0f; curCnt = 0; return doc }
      var cnt = 0
      var s = 0d
      i = 0
      while (i < scorers.length) {
        if (scorers(i).doc == min) { cnt += 1; s += scorers(i).score }
        i += 1
      }
      if (cnt >= msm) {
        doc = min
        // Classic coord: (float)sum × coords[overlap]
        // (`DisjunctionSumScorer.java:39-47`); coords == null for BM25
        curScore = if (coords == null) s.toFloat else s.toFloat * coords(cnt)
        curCnt = cnt
        return doc
      }
      // advance the clauses stuck at min past it, try next candidate
      i = 0
      while (i < scorers.length) {
        if (scorers(i).doc == min) scorers(i).nextDoc()
        i += 1
      }
      doc = min // candidates strictly beyond min next round
    }
    doc
  }

  def nextDoc(): Long = {
    var i = 0
    while (i < scorers.length) {
      if (scorers(i).doc == doc || scorers(i).doc == -1L) scorers(i).nextDoc()
      i += 1
    }
    settle()
  }
  def advance(target: Long): Long = {
    var i = 0
    while (i < scorers.length) {
      if (scorers(i).doc < target) scorers(i).advance(target)
      i += 1
    }
    doc = target - 1
    settle()
  }
  def score: Float = curScore
  def cost: Long = scorers.map(_.cost).sum
  lazy val maxScore: Float = {
    var s = 0d
    scorers.foreach(s += _.maxScore)
    s.toFloat
  }
}

/** required + optional-score (ReqOptSumScorer.java:26). */
final class ReqOptScorer(req: DocScorer, opt: DocScorer) extends DocScorer {
  def doc: Long = req.doc
  def nextDoc(): Long = req.nextDoc()
  def advance(target: Long): Long = req.advance(target)
  def score: Float = {
    var s: Double = req.score.toDouble
    if (opt.doc < req.doc) opt.advance(req.doc)
    if (opt.doc == req.doc) s += opt.score
    s.toFloat
  }
  def cost: Long = req.cost
  def maxScore: Float = (req.maxScore.toDouble + opt.maxScore).toFloat
}

/** required AND NOT excluded (ReqExclScorer.java:27). */
/** BoostingQuery's scorer (`queries/BoostingQuery.java:78-96`): iterates
  * exactly like the match scorer; when the context scorer also lands on
  * the current doc, the score is match × boost (one float multiply, as
  * the reference's `score() * boost`). The context side is advanced
  * lazily and never scored.
  */
final class BoostingScorer(req: DocScorer, ctx: DocScorer,
    boost: Float) extends DocScorer {
  def doc: Long = req.doc
  def nextDoc(): Long = req.nextDoc()
  def advance(target: Long): Long = req.advance(target)
  def score: Float = {
    val d = req.doc
    if (ctx.doc < d) ctx.advance(d)
    if (ctx.doc == d) req.score * boost else req.score
  }
  def cost: Long = req.cost
  def maxScore: Float =
    if (boost > 1f) req.maxScore * boost else req.maxScore
}

final class ReqExclScorer(req: DocScorer, excl: DocScorer) extends DocScorer {
  def doc: Long = req.doc
  private def settle(d0: Long): Long = {
    var d = d0
    while (d != DocScorer.NO_MORE) {
      if (excl.doc < d) excl.advance(d)
      if (excl.doc != d) return d
      d = req.nextDoc()
    }
    d
  }
  def nextDoc(): Long = settle(req.nextDoc())
  def advance(target: Long): Long = settle(req.advance(target))
  def score: Float = req.score
  def cost: Long = req.cost
  def maxScore: Float = req.maxScore
}

/** MUST clauses + ONE present SHOULD under a coord'ing similarity
  * (`BooleanTopLevelScorers.java:115-146` ReqSingleOptScorer): matches
  * like the required side; score = (req + opt) × coordBoth when the
  * optional matches, req × coordReq when it doesn't. Float adds and
  * multiplies, exactly as the reference.
  */
final class ReqSingleOptScorer(req: DocScorer, opt: DocScorer,
    coordReq: Float, coordBoth: Float) extends DocScorer {
  def doc: Long = req.doc
  def nextDoc(): Long = req.nextDoc()
  def advance(target: Long): Long = req.advance(target)
  def score: Float = {
    val r = req.score
    if (opt.doc < req.doc) opt.advance(req.doc)
    if (opt.doc == req.doc) (r + opt.score) * coordBoth
    else r * coordReq
  }
  def cost: Long = req.cost
  def maxScore: Float = math.max(
    ((req.maxScore.toDouble + opt.maxScore) * coordBoth).toFloat,
    req.maxScore * coordReq)
}

/** MUST clauses + 2+ present SHOULDs under a coord'ing similarity
  * (`BooleanTopLevelScorers.java:152-181` ReqMultiOptScorer): score =
  * (req +float opt) × coords[reqCount + matched-optional-count] when the
  * optional side matches, req × coords[reqCount] otherwise. The optional
  * disjunction carries IDENTITY coords (coords == null here) — the
  * composite owns the coord (`BooleanWeight.java:444-447`).
  */
final class ReqMultiOptScorer(req: DocScorer, opt: DisjunctionScorer,
    reqCount: Int, coords: Array[Float]) extends DocScorer {
  def doc: Long = req.doc
  def nextDoc(): Long = req.nextDoc()
  def advance(target: Long): Long = req.advance(target)
  def score: Float = {
    var s = req.score
    if (opt.doc < req.doc) opt.advance(req.doc)
    if (opt.doc == req.doc) {
      s += opt.score
      s * coords(reqCount + opt.matchCount)
    } else s * coords(reqCount)
  }
  def cost: Long = req.cost
  def maxScore: Float =
    ((req.maxScore.toDouble + opt.maxScore) * coords(coords.length - 1)).toFloat
}

/** MUST clauses + SHOULDs that are required too (minShouldMatch > 0)
  * under a coord'ing similarity (`BooleanTopLevelScorers.java:91-109`
  * CoordinatingConjunctionScorer): conjunction of the required side and
  * the msm-disjunction; score = (req +float opt) ×
  * coords[reqCount + matched-optional-count].
  */
final class CoordinatingConjunctionScorer(req: DocScorer,
    opt: DisjunctionScorer, reqCount: Int, coords: Array[Float])
    extends DocScorer {
  private val conj = new ConjunctionScorer(Array(req, new ConstScorer(opt, 0f)))
  def doc: Long = conj.doc
  def nextDoc(): Long = conj.nextDoc()
  def advance(target: Long): Long = conj.advance(target)
  def score: Float = (req.score + opt.score) * coords(reqCount + opt.matchCount)
  def cost: Long = conj.cost
  def maxScore: Float =
    ((req.maxScore.toDouble + opt.maxScore) * coords(coords.length - 1)).toFloat
}

/** Matches like `inner`, scores a constant
  * (ConstantScoreQuery.java:34 / MultiTermQueryConstantScoreWrapper.java:44).
  */
final class ConstScorer(inner: DocScorer, const: Float) extends DocScorer {
  def doc: Long = inner.doc
  def nextDoc(): Long = inner.nextDoc()
  def advance(target: Long): Long = inner.advance(target)
  def score: Float = const
  def cost: Long = inner.cost
  def maxScore: Float = const
}

/** Boost multiplies the wrapped score (BoostQuery semantics are folded
  * into term weights; this wrapper covers composite sub-trees).
  */
final class BoostScorer(inner: DocScorer, boost: Float) extends DocScorer {
  def doc: Long = inner.doc
  def nextDoc(): Long = inner.nextDoc()
  def advance(target: Long): Long = inner.advance(target)
  def score: Float = inner.score * boost
  def cost: Long = inner.cost
  def maxScore: Float = inner.maxScore * boost
}

/** max + (sum-max)*tie, accumulated in FLOAT like the reference
  * (DisjunctionMaxScorer.java:50-61: `float scoreSum`). We fold in clause
  * order (deterministic); the reference folds in its DisiWrapper list
  * order, so for 3+ clauses scores can differ from Lucene by an ulp — an
  * ambiguity internal to the reference itself (its own order depends on
  * queue state). The DF path folds in the same clause order.
  */
final class DisMaxScorer(scorers: Array[DocScorer], tie: Float)
    extends DocScorer {
  private val disj = new DisjunctionScorer(scorers, 1)
  def doc: Long = disj.doc
  def nextDoc(): Long = disj.nextDoc()
  def advance(target: Long): Long = disj.advance(target)
  def score: Float = {
    var mx = 0f
    var sm = 0f
    var i = 0
    while (i < scorers.length) {
      if (scorers(i).doc == disj.doc) {
        val s = scorers(i).score
        if (s > mx) mx = s
        sm += s
      }
      i += 1
    }
    mx + (sm - mx) * tie
  }
  def cost: Long = disj.cost
  /** Upper bound includes the tie-break contribution:
    * max + (sum-max)*tie dominates every reachable score.
    */
  lazy val maxScore: Float = {
    var mx = 0f
    var sm = 0f
    var i = 0
    while (i < scorers.length) {
      val m = scorers(i).maxScore
      if (m > mx) mx = m
      sm += m
      i += 1
    }
    mx + (sm - mx) * tie
  }
}

/** Union of several term iterators scored as ONE pseudo-term with summed
  * tf (SynonymQuery.java:46). All members share the doc's norm.
  */
final class SynonymScorer(its: Array[PostingsIterator], w: Float,
    cache: Array[Float]) extends DocScorer {
  var doc: Long = -1L
  private var tfSum = 0L
  private var norm: Byte = 0

  private def settle(): Long = {
    var min = DocScorer.NO_MORE
    var i = 0
    while (i < its.length) {
      if (its(i).doc > doc && its(i).doc < min) min = its(i).doc
      i += 1
    }
    doc = min
    if (min != DocScorer.NO_MORE) {
      tfSum = 0L
      i = 0
      while (i < its.length) {
        if (its(i).doc == min) { tfSum += its(i).tf; norm = its(i).norm }
        i += 1
      }
    }
    doc
  }
  def nextDoc(): Long = {
    var i = 0
    while (i < its.length) {
      if (its(i).doc == doc || its(i).doc == -1L) its(i).nextDoc()
      i += 1
    }
    settle()
  }
  def advance(target: Long): Long = {
    var i = 0
    while (i < its.length) {
      if (its(i).doc < target) its(i).advance(target)
      i += 1
    }
    doc = target - 1
    settle()
  }
  def score: Float = BM25.score(w, tfSum.toFloat, cache(norm & 0xff))
  def cost: Long = its.map(_.cost).sum
  def maxScore: Float = Float.MaxValue // not used for WAND in v1
}

/** Matches all docs in [0, maxDoc) — MatchAllDocsQuery.java:29. Only
  * valid on an unsharded (or mod-filtered) stream.
  */
final class MatchAllScorer(maxDoc: Long, boost: Float) extends DocScorer {
  var doc: Long = -1L
  def nextDoc(): Long = { doc += 1; if (doc >= maxDoc) doc = DocScorer.NO_MORE; doc }
  def advance(target: Long): Long = {
    doc = if (target >= maxDoc) DocScorer.NO_MORE else target
    doc
  }
  def score: Float = boost
  def cost: Long = maxDoc
  def maxScore: Float = boost
}
