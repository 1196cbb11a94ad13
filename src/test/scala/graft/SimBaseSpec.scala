package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** SimilarityBase family (remaining DFR combos, IB, LMJM) scoring laws,
  * pinned by an independent in-spec pipeline transcribed fresh from the
  * reference formulas (`BasicModelIn.java:34-38`, `BasicModelIne.java:
  * 35-40`, `BasicModelP.java:40-45`, `AfterEffectB.java:32-36`,
  * `AfterEffectL.java:31-33`, `NormalizationH1.java:51-53`,
  * `NormalizationH2.java:52-54`, `DistributionLL.java:33-35`,
  * `DistributionSPL.java:34-40`, `LambdaDF.java:32-34`, `LambdaTTF.java:
  * 33-35`, `LMJelinekMercerSimilarity.java:54-60`) — NOT by calling the
  * engine's scorer, so a transcription error can't self-confirm. Also:
  * forced-distributed (maxLocalBytes = 0) parity for every kind.
  */
class SimBaseSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private lazy val (searcher, dir, docsToks) = {
    import spark.implicits._
    val files = Corpus.generate(150, seed = 911L)
    val ix = IndexBuilder.buildLogical(
      spark.createDataset(files).repartition(4).toDF(),
      "content", None, Seq("repo", "path", "commit"),
      BuildConfig(numBuckets = 4, numDocShards = 2, saltThreshold = 1000000L))
    val d = java.nio.file.Files.createTempDirectory("graft-simbase").toString
    IndexBuilder.writeIndex(ix, d, "snap", 1)
    val toks = ix.docs.select("docId", "content").collect()
      .map(r => r.getLong(0) -> Analysis.simpleTokens(r.getString(1)))
      .toMap
    ix.unpersistCached(); ix.postings.unpersist()
    (new Searcher(spark, SegmentSearcher.load(d)), d, toks)
  }

  private val Ln2 = math.log(2)

  // corpus-level stats the SimilarityBase way
  private def nDocs: Long = docsToks.size.toLong
  private def sumTtf: Long = docsToks.values.map(_.length.toLong).sum
  private def avgdl: Float = sumTtf.toFloat / nDocs.toFloat
  private def df(t: String): Long = docsToks.count(_._2.contains(t)).toLong
  private def ttf(t: String): Long =
    docsToks.values.map(_.count(_ == t).toLong).sum

  /** One term-in-doc score, fresh transcription per kind. */
  private def scoreOne(kind: Int, t: String, toks: Array[String]): Option[Float] = {
    import SegmentSearcher._
    val tf = toks.count(_ == t)
    if (tf == 0) return None
    val len = Norms.quantizedLength(toks.length) // quantized docLen
    val freq = tf.toFloat
    val n = nDocs
    val F = ttf(t)
    val d = df(t)
    // normalizations
    val tfnH1 = ((freq * 1f) * avgdl) / len
    val tfnH2 =
      (freq.toDouble * (math.log((1f + (1f * avgdl) / len).toDouble) / Ln2)).toFloat
    Some(kind match {
      case SimDFRInL2 =>
        val tfn = tfnH2
        val bm = tfn * (math.log((n + 1).toDouble / (d.toDouble + 0.5)) / Ln2).toFloat
        (1f * bm) * (1f / (tfn + 1f))
      case SimDFRIneB1 =>
        val tfn = tfnH1
        val ne = n.toDouble *
          (1 - math.pow((n - 1).toDouble / n.toDouble, F.toDouble))
        val bm = tfn * (math.log((n + 1).toDouble / (ne + 0.5)) / Ln2).toFloat
        val ae = (F + 2L).toFloat / ((d + 1L).toFloat * (tfn + 1f))
        (1f * bm) * ae
      case SimDFRPL2 =>
        val tfn = tfnH2
        val lam = (F + 1L).toFloat / (n + 1L)
        val log2e = math.log(math.E) / Ln2
        val bm = (tfn.toDouble * (math.log((tfn / lam).toDouble) / Ln2) +
          (lam + 1f / (12f * tfn) - tfn).toDouble * log2e +
          0.5 * (math.log(2 * math.Pi * tfn.toDouble) / Ln2)).toFloat
        (1f * bm) * (1f / (tfn + 1f))
      case SimIBSplD2 =>
        val tfn = tfnH2
        val lam0 = (d + 1f) / (n + 1f)
        val lam = if (lam0 == 1f) 0.99f else lam0
        (-math.log(
          (math.pow(lam.toDouble, (tfn / (tfn + 1f)).toDouble) - lam.toDouble) /
            (1f - lam).toDouble)).toFloat
      case SimIBLlL1 =>
        val tfn = tfnH1
        val lam = (F + 1f) / (n + 1f)
        (-math.log((lam / (tfn + lam)).toDouble)).toFloat
      case SimLMJM =>
        val lamJ = 0.1f
        val cp = (F.toFloat + 1f) / (sumTtf.toFloat + 1f)
        math.log((1f + ((1f - lamJ) * freq / len) / (lamJ * cp)).toDouble).toFloat
      case SimDFRIFB3 => // I(F) · B with H3 (μ=800) tfn
        val mu = 800f
        val tfn = (freq + mu * ((F + 1f) / (sumTtf + 1f))) / (len + mu) * mu
        val bm = tfn *
          (math.log(1 + (n + 1).toDouble / (F.toDouble + 0.5)) / Ln2).toFloat
        val ae = (F + 2L).toFloat / ((d + 1L).toFloat * (tfn + 1f))
        (1f * bm) * ae
      case SimIBSplDZ => // SPL, λ_DF, Z (z=0.30) tfn
        val tfn =
          (freq.toDouble * math.pow((avgdl / len).toDouble, 0.30f.toDouble)).toFloat
        val lam0 = (d + 1f) / (n + 1f)
        val lam = if (lam0 == 1f) 0.99f else lam0
        (-math.log(
          (math.pow(lam.toDouble, (tfn / (tfn + 1f)).toDouble) - lam.toDouble) /
            (1f - lam).toDouble)).toFloat
      case SimDFRBeB1 => // Be (BasicModelBE.java:39-48) · B, H1 tfn
        val tfn = tfnH1
        val bigF = F.toDouble + 1.0 + tfn.toDouble
        val bigN = bigF + n.toDouble
        def fh(nn: Double, mm: Double): Double =
          (mm + 0.5) * (math.log(nn / mm) / Ln2) + (nn - mm) * (math.log(nn) / Ln2)
        val bm = (-(math.log((bigN - 1) * math.E) / Ln2) +
          fh(bigN + bigF - 1, bigN + bigF - tfn.toDouble - 2) -
          fh(bigF, bigF - tfn.toDouble)).toFloat
        val ae = (F + 2L).toFloat / ((d + 1L).toFloat * (tfn + 1f))
        (1f * bm) * ae
      case SimDFRDL2 => // D (BasicModelD.java:42-49) · L, H2 tfn
        val tfn = tfnH2
        val bigF = F.toDouble + 1.0 + tfn.toDouble
        val phi = tfn.toDouble / bigF
        val nphi = 1.0 - phi
        val p = 1.0 / (n.toDouble + 1)
        val dv = phi * (math.log(phi / p) / Ln2) +
          nphi * (math.log(nphi / (1 - p)) / Ln2)
        val bm = (dv * bigF +
          0.5 * (math.log(1 + 2 * math.Pi * tfn.toDouble * nphi) / Ln2)).toFloat
        (1f * bm) * (1f / (tfn + 1f))
      case SimDFIChi | SimDFISat | SimDFIStd =>
        val e = ((F + 1L).toFloat * len) / (sumTtf + 1L)
        if (freq <= e) 0f
        else {
          val m = kind match {
            case SimDFIChi => ((freq - e) * (freq - e)) / e
            case SimDFISat => (freq - e) / e
            case _ => (freq - e) / math.sqrt(e.toDouble).toFloat
          }
          1f * (math.log((m + 1f).toDouble) / Ln2).toFloat
        }
      case k => sys.error(s"unknown kind $k")
    })
  }

  private def expected(kind: Int, terms: Seq[String]): Seq[(Long, Float)] =
    docsToks.toSeq.flatMap { case (id, toks) =>
      val subs = terms.flatMap(t => scoreOne(kind, t, toks))
      if (subs.isEmpty) None
      else if (subs.size == 1) Some(id -> subs.head)
      else { var s = 0d; subs.foreach(s += _); Some(id -> s.toFloat) }
    }.sortBy { case (id, s) => (-s.toDouble, id) }.take(10)

  private def got(q: Query, kind: Int): Seq[(Long, Float)] =
    searcher.search(q, 10, None, true, kind)
      .map(h => (h.docId, h.score.toFloat)).toSeq

  private val kinds = Seq(
    "DFR I(n)L2" -> SegmentSearcher.SimDFRInL2,
    "DFR I(ne)B1" -> SegmentSearcher.SimDFRIneB1,
    "DFR PL2" -> SegmentSearcher.SimDFRPL2,
    "IB SPL-D2" -> SegmentSearcher.SimIBSplD2,
    "IB LL-L1" -> SegmentSearcher.SimIBLlL1,
    "LM Jelinek-Mercer" -> SegmentSearcher.SimLMJM,
    "DFI ChiSquared" -> SegmentSearcher.SimDFIChi,
    "DFI Saturated" -> SegmentSearcher.SimDFISat,
    "DFI Standardized" -> SegmentSearcher.SimDFIStd,
    "DFR I(F)B3(800)" -> SegmentSearcher.SimDFRIFB3,
    "IB SPL-DZ(0.30)" -> SegmentSearcher.SimIBSplDZ,
    "DFR BeB1 (deprecated Be)" -> SegmentSearcher.SimDFRBeB1,
    "DFR DL2 (deprecated D)" -> SegmentSearcher.SimDFRDL2)

  test("every SimilarityBase kind matches the independent pipeline: term") {
    for ((name, kind) <- kinds; t <- Seq("def", "index", "merge")) {
      val exp = expected(kind, Seq(t))
      assert(exp.nonEmpty, s"$name/$t fixture matches nothing")
      assert(got(TermQ(t), kind) == exp, s"$name term '$t'")
    }
  }

  test("every SimilarityBase kind matches the independent pipeline: or2") {
    for ((name, kind) <- kinds) {
      val exp = expected(kind, Seq("def", "merge"))
      assert(got(Query.or(TermQ("def"), TermQ("merge")), kind) == exp,
        s"$name or2")
    }
  }

  test("forced-distributed (maxLocalBytes=0) agrees with the local path") {
    val dist = new Searcher(spark, SegmentSearcher.load(dir),
      cacheSegments = false, maxLocalBytes = 0)
    for ((name, kind) <- kinds) {
      val q = Query.or(TermQ("def"), TermQ("merge"))
      assert(dist.search(q, 10, None, true, kind).toSeq ==
        searcher.search(q, 10, None, true, kind).toSeq,
        s"$name distributed parity")
    }
  }

  test("boosts are rejected (the folded weights can't carry them)") {
    for ((_, kind) <- kinds) {
      intercept[IllegalArgumentException] {
        searcher.search(BoostQ(TermQ("def"), 2f), 10, None, true, kind)
      }
    }
  }
}
