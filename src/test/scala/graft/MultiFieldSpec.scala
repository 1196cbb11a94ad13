package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Norms
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** Cross-field dismax (edismax qf) vs a from-first-principles per-field
  * BM25 oracle: fields share vocabulary so the tie-break contribution
  * (max + tie×(sum−max)) is actually exercised, across unsalted/salted
  * and driver-local/forced-distributed execution.
  */
class MultiFieldSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val tmpRoot = java.nio.file.Files
    .createTempDirectory("graft-mfspec").toString

  private val vocab = Array("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")

  /** (docId, f1 text, f2 text) with heavy vocab overlap between fields. */
  private lazy val docs: Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(91L)
    (0 until 240).map { i =>
      val n1 = 4 + rnd.nextInt(20)
      val n2 = 2 + rnd.nextInt(8)
      (i.toLong,
        Seq.fill(n1)(vocab(rnd.nextInt(vocab.length))).mkString(" "),
        Seq.fill(n2)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
  }

  private def buildField(colName: String, cfg: BuildConfig,
      tag: String): Searcher = {
    import spark.implicits._
    val df = docs.toDF("docId", "f1", "f2")
    val ix = IndexBuilder.buildLogical(df, colName, Some("docId"), Nil, cfg)
    val dir = s"$tmpRoot/$tag-$colName"
    IndexBuilder.writeIndex(ix, dir, s"mf-$tag-$colName", numGroups = 1)
    ix.unpersistCached()
    ix.postings.unpersist()
    new Searcher(spark, SegmentSearcher.load(dir))
  }

  /** Per-field BM25 from first principles + dismax + mm + tie-break law. */
  private def brute(terms: Seq[String], boosts: Seq[Float], msm: Int,
      tie: Float, k: Int): Seq[(Long, Double)] = {
    val fields: Seq[Seq[Array[String]]] = Seq(
      docs.map(d => graft.core.Analysis.simpleTokens(d._2)),
      docs.map(d => graft.core.Analysis.simpleTokens(d._3)))
    val n = docs.size.toLong
    val sumTtf = fields.map(_.map(_.length.toLong).sum)
    val dfOf: Seq[Map[String, Long]] = fields.map(f =>
      vocab.map(t => t -> f.count(_.contains(t)).toLong).toMap)
    val hits = docs.indices.flatMap { d =>
      var termsMatched = 0
      var total = 0d
      terms.foreach { t =>
        var mx = 0f
        var sm = 0f
        var any = false
        fields.indices.foreach { f =>
          val tf = fields(f)(d).count(_ == t)
          if (tf > 0) {
            any = true
            val s = BM25.scoreOne(tf, Norms.normByte(fields(f)(d).length),
              dfOf(f)(t), n, sumTtf(f), boost = boosts(f))
            if (s > mx) mx = s
            sm += s
          }
        }
        if (any) {
          termsMatched += 1
          total += (mx + (sm - mx) * tie).toDouble
        }
      }
      if (termsMatched >= msm) Some((d.toLong, total.toFloat.toDouble))
      else None
    }
    hits.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  test("edismax qf == first-principles oracle (local/distributed, salting)") {
    val terms = Seq("alpha", "beta", "gamma")
    val boosts = Seq(1f, 2.5f)
    val expected = brute(terms, boosts, msm = 2, tie = 0.15f, k = 10)
    assert(expected.nonEmpty)
    for ((tag, threshold) <- Seq(("plain", 1000000L), ("salted", 100L))) {
      val cfg = BuildConfig(numBuckets = 8, numDocShards = 4,
        saltThreshold = threshold)
      val s1 = buildField("f1", cfg, tag)
      val s2 = buildField("f2", cfg, tag)
      val got = MultiField.dismaxTerms(
        Seq(MultiField.FieldRef(s1, boosts(0)), MultiField.FieldRef(s2, boosts(1))),
        terms, msm = 2, tie = 0.15f, k = 10)
        .map(h => (h.docId, h.score)).toSeq
      assert(got === expected, s"$tag local")
      // forced-distributed: estBytes gate at 0 pushes the groupByKey path
      val d1 = new Searcher(spark, s1.index, cacheSegments = false, maxLocalBytes = 0)
      val d2 = new Searcher(spark, s2.index, cacheSegments = false, maxLocalBytes = 0)
      val gotDist = MultiField.dismaxTerms(
        Seq(MultiField.FieldRef(d1, boosts(0)), MultiField.FieldRef(d2, boosts(1))),
        terms, msm = 2, tie = 0.15f, k = 10)
        .map(h => (h.docId, h.score)).toSeq
      assert(gotDist === expected, s"$tag distributed")
    }
  }

  test("per-field similarity (PerFieldSimilarityWrapper surface): " +
      "BM25 field + LMDirichlet field, local/distributed/salted") {
    val terms = Seq("alpha", "beta", "gamma")
    val tie = 0.15f
    // first-principles per-doc recompute: f1 scored BM25 (boost 1), f2
    // scored LMDirichlet with f2's OWN collection model (μ·cp, quantized
    // docLen), per-term DisMax, mm=1, float sequencing as the engine's
    val fields: Seq[Seq[Array[String]]] = Seq(
      docs.map(d => graft.core.Analysis.simpleTokens(d._2)),
      docs.map(d => graft.core.Analysis.simpleTokens(d._3)))
    val n = docs.size.toLong
    val sumTtf = fields.map(_.map(_.length.toLong).sum)
    val dfOf: Seq[Map[String, Long]] = fields.map(f =>
      vocab.map(t => t -> f.count(_.contains(t)).toLong).toMap)
    val ttfOf2: Map[String, Long] =
      vocab.map(t => t -> fields(1).map(_.count(_ == t).toLong).sum).toMap
    def lmScoreOne(tf: Int, docTokens: Int, t: String): Float = {
      val cp = (ttfOf2(t).toFloat + 1f) / (sumTtf(1).toFloat + 1f)
      val w = 2000f * cp
      val docLen = Norms.NORM_TABLE(Norms.normByte(docTokens) & 0xff)
      val s = (math.log((1f + tf.toFloat / w).toDouble) +
        math.log((2000f / (docLen + 2000f)).toDouble)).toFloat
      if (s > 0f) s else 0f
    }
    val expected: Seq[(Long, Double)] = docs.indices.flatMap { d =>
      var matched = 0
      var total = 0d
      terms.foreach { t =>
        var mx = 0f
        var sm = 0f
        var any = false
        val tf1 = fields(0)(d).count(_ == t)
        if (tf1 > 0) {
          any = true
          val s = BM25.scoreOne(tf1, Norms.normByte(fields(0)(d).length),
            dfOf(0)(t), n, sumTtf(0), boost = 1f)
          if (s > mx) mx = s
          sm += s
        }
        val tf2 = fields(1)(d).count(_ == t)
        if (tf2 > 0) {
          any = true
          val s = lmScoreOne(tf2, fields(1)(d).length, t)
          if (s > mx) mx = s
          sm += s
        }
        if (any) { matched += 1; total += (mx + (sm - mx) * tie).toDouble }
      }
      if (matched >= 1) Some((d.toLong, total.toFloat.toDouble)) else None
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(expected.nonEmpty)

    for ((tag, threshold) <- Seq(("psim-plain", 1000000L), ("psim-salted", 100L))) {
      val cfg = BuildConfig(numBuckets = 8, numDocShards = 4,
        saltThreshold = threshold)
      val s1 = buildField("f1", cfg, tag)
      val s2 = buildField("f2", cfg, tag)
      def refs(a: Searcher, b: Searcher) = Seq(
        MultiField.FieldRef(a, 1f),
        MultiField.FieldRef(b, 1f, SegmentSearcher.SimLMDirichlet))
      val got = MultiField.dismaxTerms(refs(s1, s2), terms, msm = 1,
        tie = tie, k = 10).map(h => (h.docId, h.score)).toSeq
      assert(got === expected, s"$tag local")
      val d1 = new Searcher(spark, s1.index, cacheSegments = false, maxLocalBytes = 0)
      val d2 = new Searcher(spark, s2.index, cacheSegments = false, maxLocalBytes = 0)
      val gotDist = MultiField.dismaxTerms(refs(d1, d2), terms, msm = 1,
        tie = tie, k = 10).map(h => (h.docId, h.score)).toSeq
      assert(gotDist === expected, s"$tag distributed")
      // loud failures: qf boost on a non-BM25 field, per-field Classic
      intercept[IllegalArgumentException] {
        MultiField.dismaxTerms(Seq(MultiField.FieldRef(s1, 1f),
          MultiField.FieldRef(s2, 2f, SegmentSearcher.SimLMDirichlet)),
          terms, 1, tie, 10)
      }
      intercept[IllegalArgumentException] {
        MultiField.dismaxTerms(Seq(MultiField.FieldRef(s1, 1f),
          MultiField.FieldRef(s2, 1f, SegmentSearcher.SimClassic)),
          terms, 1, tie, 10)
      }
    }
  }

  test("edismax pf (phrase boost) == first-principles oracle") {
    val terms = Seq("alpha", "beta")
    val boosts = Seq(1f, 2.5f)
    val pfBoosts = Seq(1.5f, 1f)
    val tie = 0.15f
    // brute: main term part (as in brute()) + ReqOpt phrase dismax part
    val fieldsTok: Seq[Seq[Array[String]]] = Seq(
      docs.map(d => graft.core.Analysis.simpleTokens(d._2)),
      docs.map(d => graft.core.Analysis.simpleTokens(d._3)))
    val n = docs.size.toLong
    val sumTtf = fieldsTok.map(_.map(_.length.toLong).sum)
    val dfOf = fieldsTok.map(f =>
      vocab.map(t => t -> f.count(_.contains(t)).toLong).toMap)
    def phraseScore(f: Int, d: Int, boost: Float): Option[Float] = {
      val toks = fieldsTok(f)(d)
      val freq = (0 until toks.length - 1)
        .count(p => toks(p) == terms(0) && toks(p + 1) == terms(1))
      if (freq == 0) None
      else {
        var idfSum = 0f
        terms.foreach(t => idfSum += BM25.idf(dfOf(f)(t), n))
        val w = BM25.weightValue(idfSum, BM25.Default, boost)
        val avgdl = BM25.avgFieldLength(sumTtf(f), n)
        val cache = 1.2f * ((1 - 0.75f) + 0.75f *
          graft.core.Norms.NORM_TABLE(
            graft.core.Norms.normByte(toks.length) & 0xff) / avgdl)
        Some(BM25.score(w, freq.toFloat, cache))
      }
    }
    val expected = docs.indices.flatMap { d =>
      var termsMatched = 0
      var total = 0d
      terms.foreach { t =>
        var mx = 0f; var sm = 0f; var any = false
        fieldsTok.indices.foreach { f =>
          val tf = fieldsTok(f)(d).count(_ == t)
          if (tf > 0) {
            any = true
            val s = BM25.scoreOne(tf, graft.core.Norms.normByte(fieldsTok(f)(d).length),
              dfOf(f)(t), n, sumTtf(f), boost = boosts(f))
            if (s > mx) mx = s
            sm += s
          }
        }
        if (any) { termsMatched += 1; total += (mx + (sm - mx) * tie).toDouble }
      }
      if (termsMatched < 1) None
      else {
        val main = total.toFloat
        val ph = fieldsTok.indices.flatMap(f => phraseScore(f, d, pfBoosts(f)))
        val pfPart: Option[Float] =
          if (ph.isEmpty) None
          else if (ph.size == 1) Some(ph.head)
          else {
            var mx = 0f; var sm = 0f
            ph.foreach { s => if (s > mx) mx = s; sm += s }
            Some(mx + (sm - mx) * tie)
          }
        val s = pfPart match {
          case Some(p) => (main.toDouble + p).toFloat.toDouble
          case None => main.toDouble
        }
        Some((d.toLong, s))
      }
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    assert(expected.nonEmpty)
    // at least one doc must actually carry the phrase (else vacuous)
    assert(docs.indices.exists(d => phraseScore(0, d, 1f).isDefined))
    for ((tag, threshold) <- Seq(("pfplain", 1000000L), ("pfsalted", 100L))) {
      val cfg = BuildConfig(numBuckets = 8, numDocShards = 4,
        saltThreshold = threshold)
      val s1 = buildField("f1", cfg, tag)
      val s2 = buildField("f2", cfg, tag)
      val refs = Seq(MultiField.FieldRef(s1, boosts(0)), MultiField.FieldRef(s2, boosts(1)))
      val pfRefs = Seq(MultiField.FieldRef(s1, pfBoosts(0)), MultiField.FieldRef(s2, pfBoosts(1)))
      val got = MultiField.dismaxTerms(refs, terms, 1, tie, 10, pfRefs)
        .map(h => (h.docId, h.score)).toSeq
      assert(got === expected, s"$tag local")
      val d1 = new Searcher(spark, s1.index, cacheSegments = false, maxLocalBytes = 0)
      val d2 = new Searcher(spark, s2.index, cacheSegments = false, maxLocalBytes = 0)
      val gotDist = MultiField.dismaxTerms(
        Seq(MultiField.FieldRef(d1, boosts(0)), MultiField.FieldRef(d2, boosts(1))),
        terms, 1, tie, 10,
        Seq(MultiField.FieldRef(d1, pfBoosts(0)), MultiField.FieldRef(d2, pfBoosts(1))))
        .map(h => (h.docId, h.score)).toSeq
      assert(gotDist === expected, s"$tag distributed")
    }
  }

  test("mm semantics: msm above matched-term count excludes docs") {
    val cfg = BuildConfig(numBuckets = 8, numDocShards = 4,
      saltThreshold = 1000000L)
    val s1 = buildField("f1", cfg, "mm")
    val s2 = buildField("f2", cfg, "mm")
    val refs = Seq(MultiField.FieldRef(s1, 1f), MultiField.FieldRef(s2, 1f))
    // a term absent everywhere can never count toward mm
    val withAbsent = MultiField.dismaxTerms(refs,
      Seq("alpha", "zzznothere"), msm = 2, tie = 0f, k = 10)
    assert(withAbsent.isEmpty)
    val expected = brute(Seq("alpha", "beta"), Seq(1f, 1f), 2, 0f, 10)
    val got = MultiField.dismaxTerms(refs, Seq("alpha", "beta"),
      msm = 2, tie = 0f, k = 10).map(h => (h.docId, h.score)).toSeq
    assert(got === expected)
  }

  test("parseQf") {
    assert(MultiField.parseQf("text^2 title") ===
      Seq(("text", 2f), ("title", 1f)))
    assert(MultiField.parseQf("  body^0.5 ") === Seq(("body", 0.5f)))
  }
}
