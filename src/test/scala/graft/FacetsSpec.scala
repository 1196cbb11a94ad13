package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Facets

/** DrillSideways (`facet/DrillSideways.java`, `DrillSidewaysScorer.java`)
  * pinned against a from-scratch transcription of the near-miss law over
  * collected rows: a doc failing exactly ONE drill dim counts only in
  * that dim's sideways facet; a doc failing none counts everywhere and is
  * a drill-down hit; a doc failing 2+ counts nowhere.
  */
class FacetsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private lazy val fixture = {
    import spark.implicits._
    val langs = Seq("en", "fr", "de", "es")
    val srcs = Seq("a", "b", "c")
    val rows = (0 until 240).map { i =>
      (i.toLong, langs(i % 4), srcs(i % 3), (i * 37 % 500) + 50)
    }
    rows.toDF("doc_id", "lang", "source", "n_chars")
  }

  private val drill = Facets.Drill(Seq(
    "lang" -> Seq("en", "fr"), "source" -> Seq("a")))

  test("sideways counts match the near-miss transcription") {
    val (facetsDf, hitsDf) = Facets.drillSideways(fixture,
      col("n_chars") >= 100, drill, Seq("lang", "source"))
    val got = facetsDf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val rows = fixture.filter(col("n_chars") >= 100).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def langOk(l: String) = l == "en" || l == "fr"
    def srcOk(s: String) = s == "a"
    // lang sideways: every OTHER dim (source) must match
    val expLang = rows.filter(t => srcOk(t._3)).groupBy(_._2)
      .map { case (v, g) => ("lang", v) -> g.size.toLong }
    val expSrc = rows.filter(t => langOk(t._2)).groupBy(_._3)
      .map { case (v, g) => ("source", v) -> g.size.toLong }
    assert(got == expLang ++ expSrc)
    // the sideways law has teeth: non-selected values appear with counts
    assert(got.contains(("lang", "de")) && got.contains(("source", "b")))

    val hits = hitsDf.select("doc_id").collect().map(_.getLong(0)).toSet
    val expHits = rows.filter(t => langOk(t._2) && srcOk(t._3)).map(_._1).toSet
    assert(hits == expHits && hits.nonEmpty)
  }

  test("docs missing 2+ dims count nowhere") {
    val (facetsDf, _) = Facets.drillSideways(fixture, lit(true), drill,
      Seq("lang", "source"))
    val got = facetsDf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // a (de, b) doc misses both dims: it must not appear under lang=de
    // (lang sideways requires source ok) — count lang=de only from source=a
    val rows = fixture.collect()
      .map(r => (r.getString(1), r.getString(2)))
    val expDe = rows.count { case (l, s) => l == "de" && s == "a" }.toLong
    assert(got(("lang", "de")) == expDe)
    assert(expDe < rows.count(_._1 == "de").toLong) // strictly excluded some
  }

  test("un-drilled facet dim counts over the drill-down set only") {
    val ndrill = Facets.Drill(Seq("lang" -> Seq("en", "fr")))
    val (facetsDf, _) = Facets.drillSideways(fixture, lit(true), ndrill,
      Seq("lang", "source"))
    val got = facetsDf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rows = fixture.collect().map(r => (r.getString(1), r.getString(2)))
    // source is NOT drilled: counts restricted to lang-matching docs
    rows.filter(t => t._1 == "en" || t._1 == "fr").groupBy(_._2)
      .foreach { case (v, g) =>
        assert(got(("source", v)) == g.size.toLong)
      }
    // lang IS drilled (the only dim): sideways = base, all langs counted
    rows.groupBy(_._1).foreach { case (v, g) =>
      assert(got(("lang", v)) == g.size.toLong)
    }
  }

  test("empty drill: plain facet counts over the base query") {
    val (facetsDf, hitsDf) = Facets.drillSideways(fixture,
      col("n_chars") < 100, Facets.Drill(Nil), Seq("lang"))
    val rows = fixture.filter(col("n_chars") < 100).collect()
    val got = facetsDf.collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got == rows.groupBy(_.getString(1)).map { case (v, g) =>
      v -> g.size.toLong })
    assert(hitsDf.count() == rows.length.toLong)
  }
}
