package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Analysis
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._
import graft.search.Span.{FieldMasked, Near, Term}

/** FieldMaskingSpanQuery (`spans/FieldMaskingSpanQuery.java:62`) over
  * two field indexes sharing one docId space: masked leaves evaluate
  * against their own field's positions and df, the composite scores
  * with the PRIMARY field's norms — verified against a from-raw-tokens
  * recompute of both the match set and the scores, plus distributed
  * parity and the loud shape guards.
  */
class MaskedSpanSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // token-parallel-ish fixture: body text + a short tag field
  private val rows = Seq(
    (0L, "alpha beta gamma delta beta", "tag0 red"),
    (1L, "beta alpha gamma", "tag1 red"),
    (2L, "alpha gamma beta beta", "tag0 blue"),
    (3L, "gamma delta alpha", "red tag1"),
    (4L, "beta gamma delta", "tag0 red"),
    (5L, "alpha alpha beta", "blue tag9"))

  private lazy val (textS, tagS, textDir) = {
    import spark.implicits._
    val cfg = BuildConfig(numBuckets = 2, numDocShards = 2)
    def build(col: String): (Searcher, String) = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-mask-$col").toString
      val df = rows.toDF("doc_id", "text", "tag")
      val ix = IndexBuilder.buildLogical(df, col, Some("doc_id"), Nil, cfg)
      IndexBuilder.writeIndex(ix, tmp, s"mask-$col", 1)
      ix.unpersistCached(); ix.postings.unpersist()
      (new Searcher(spark, SegmentSearcher.load(tmp)), tmp)
    }
    val (t, td) = build("text")
    val (g, _) = build("tag")
    (t, g, td)
  }

  private def fields = Map("text" -> textS, "tag" -> tagS)

  /** Independent recompute: ordered 2-clause near with clause 0 from the
    * tag field, clause 1 from text; norms/avgdl from text; idf fold
    * sorted by (field, term) with each df from its own field.
    */
  private def expected(maskedTerm: String, primaryTerm: String,
      slop: Int): Map[Long, Double] = {
    val textToks = rows.map { case (d, t, _) => d -> Analysis.simpleTokens(t) }.toMap
    val tagToks = rows.map { case (d, _, g) => d -> Analysis.simpleTokens(g) }.toMap
    val n = rows.size.toLong
    val dfMasked = rows.count { case (d, _, _) => tagToks(d).contains(maskedTerm) }
    val dfPrim = rows.count { case (d, _, _) => textToks(d).contains(primaryTerm) }
    var idfSum = 0f
    // ("tag", maskedTerm) sorts before ("text", ...)? "tag" > "text"
    // lexicographically ('g' > 'x'? no: "tag" vs "text" — 'a' < 'e', so
    // "tag" < "text"). Fold masked first.
    Seq(("tag", maskedTerm, dfMasked), ("text", primaryTerm, dfPrim))
      .sortBy(p => (p._1, p._2)).foreach { case (_, _, df) =>
        if (df > 0) idfSum += BM25.idf(df, n)
      }
    val params = textS.index.bm25
    val w = BM25.weightValue(idfSum, params)
    val sumTtf = rows.map(r => Analysis.simpleTokens(r._2).length.toLong).sum
    val avgdl = BM25.avgFieldLength(sumTtf, n)
    rows.flatMap { case (d, _, _) =>
      val mp = tagToks(d).zipWithIndex.collect { case (t, i) if t == maskedTerm => i }
      val pp = textToks(d).zipWithIndex.collect { case (t, i) if t == primaryTerm => i }
      var freq = 0d
      var pi = 0
      var exhausted = false
      mp.foreach { q0 =>
        if (!exhausted) {
          while (pi < pp.length && pp(pi) < q0 + 1) pi += 1
          if (pi >= pp.length) exhausted = true
          else if (pp(pi) - q0 - 1 <= slop) freq += 1.0 / (1 + (pp(pi) - q0 - 1))
        }
      }
      if (freq == 0d) None
      else {
        val qlen = graft.core.Norms.quantizedLength(textToks(d).length)
        val cache = params.k1 * ((1 - params.b) + params.b * qlen / avgdl)
        Some(d -> BM25.score(w, freq.toFloat, cache).toDouble)
      }
    }.toMap
  }

  test("masked near matches + scores == independent recompute") {
    for ((mt, pt, slop) <- Seq(("red", "beta", 2), ("tag0", "gamma", 3),
        ("blue", "alpha", 4))) {
      val hits = MultiField.searchMaskedSpan("text", fields,
        Near(Seq(FieldMasked("tag", Term(mt)), Term(pt)), slop,
          inOrder = true), 20)
      val exp = expected(mt, pt, slop)
      assert(hits.map(_.docId).toSet == exp.keySet, s"$mt/$pt")
      hits.foreach(h => assert(h.score == exp(h.docId), s"$mt/$pt doc=${h.docId}"))
      assert(hits.nonEmpty, s"$mt/$pt should match the fixture")
    }
  }

  test("absent masked term folds +0 and kills the conjunction") {
    val hits = MultiField.searchMaskedSpan("text", fields,
      Near(Seq(FieldMasked("tag", Term("zzz")), Term("beta")), 5,
        inOrder = true), 20)
    assert(hits.isEmpty)
  }

  test("forced-distributed parity") {
    val textD = new Searcher(spark, SegmentSearcher.load(textDir),
      cacheSegments = false, maxLocalBytes = 0L)
    val root = Near(Seq(FieldMasked("tag", Term("red")), Term("beta")), 2,
      inOrder = true)
    val a = MultiField.searchMaskedSpan("text", fields, root, 20).toSeq
      .map(h => (h.docId, h.score))
    val b = MultiField.searchMaskedSpan("text",
      Map("text" -> textD, "tag" -> tagS), root, 20).toSeq
      .map(h => (h.docId, h.score))
    assert(a == b && a.nonEmpty)
  }

  test("loud guards: root shape, norm clause, plain-search rejection") {
    // non-Near root
    intercept[RuntimeException](MultiField.searchMaskedSpan("text", fields,
      FieldMasked("tag", Term("red")), 5))
    // no all-primary clause
    intercept[IllegalArgumentException](MultiField.searchMaskedSpan("text",
      fields, Near(Seq(FieldMasked("tag", Term("red")),
        FieldMasked("tag", Term("tag0"))), 5), 5))
    // a masked tree through the single-field path fails loudly
    intercept[RuntimeException](textS.search(SpanQ(
      Near(Seq(FieldMasked("tag", Term("red")), Term("beta")), 2)), 5))
  }

  test("SpanBoostQuery: boost folds into the span weight") {
    val base = textS.search(SpanQ(Near(Seq(Term("alpha"), Term("beta")), 3)), 20)
    val boosted = textS.search(
      BoostQ(SpanQ(Near(Seq(Term("alpha"), Term("beta")), 3)), 1.7f), 20)
    assert(base.nonEmpty)
    val bb = boosted.map(h => h.docId -> h.score).toMap
    base.foreach { h =>
      // w' = ((1.7·idfSum)·(k1+1)) — recompute the ratio exactly in float
      // via the scorer law: score scales linearly in weightValue
      val ratio = bb(h.docId) / h.score
      assert(math.abs(ratio - 1.7) < 1e-6, s"doc=${h.docId} ratio=$ratio")
    }
  }
}
