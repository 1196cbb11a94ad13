package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** The expressions-module dialect ([[JsExpr]],
  * `lucene/expressions/.../js/JavascriptCompiler.java`) pinned three
  * ways: hand-computed goldens for the typed-stack law (int truthiness,
  * D2L truncation, hex/octal longs, precedence ladder), bit-for-bit
  * parity between the driver-local evaluator and the Catalyst Column
  * form over a value grid, and the search surfaces (searchByExpr /
  * rescoreExpr) against from-scratch spec recomputes with local ↔
  * forced-distributed parity.
  */
class JsExprSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def ev(src: String, bind: Map[String, Double] = Map.empty): Double =
    JsExpr.evalD(JsExpr.parse(src), bind)

  // ---------- typed-stack law goldens ----------

  test("decimal literals are doubles; hex/octal are longs") {
    assert(ev("5") == 5d)
    assert(ev("2.5e-1") == 0.25d)
    assert(ev("0x1f") == 31d)
    assert(ev("010") == 8d)
    assert(ev("0x1f + 010 + 1e2") == 139d)
  }

  test("truthiness is nonzero AFTER the int cast (JavascriptCompiler I2D edges)") {
    // (int) 0.5 == 0, so 0.5 is FALSY — the law ports would get wrong
    assert(ev("0.5 ? 2 : 3") == 3d)
    assert(ev("!0.5") == 1d)
    assert(ev("0.5 && 1") == 0d)
    assert(ev("0.5 || 0") == 0d)
    assert(ev("1.5 ? 2 : 3") == 2d)
    // long boolean input truncates via L2I: 2^32 has zero low bits
    assert(ev("(0x100000000 << 0) ? 7 : 8") == 8d)
  }

  test("bitwise/shift operate on D2L-truncated longs") {
    assert(ev("~5.9") == -6d) // ~(long)5.9 = ~5
    assert(ev("-8 >>> 60") == 15d)
    assert(ev("5.7 & 3") == 1d)
    assert(ev("5 ^ 3") == 6d)
    assert(ev("5 | 2.9") == 7d)
    assert(ev("2 << 3") == 16d)
    assert(ev("-16 >> 2") == -4d)
  }

  test("precedence ladder: shift looser than addsub, equality tighter than &") {
    assert(ev("1 + 2 * 3") == 7d)
    assert(ev("2 << 1 + 1") == 8d) // 2 << (1+1)
    assert(ev("5 & 3 == 3") == 1d) // 5 & (3==3 -> 1)
    assert(ev("1 | 2 ^ 3 & 2") == 1d) // 1 | (2 ^ (3&2)) = 1 | 0
    assert(ev("1 < 2 == 2 < 3") == 1d) // (1<2) == (2<3)
    assert(ev("2 > 1 ? 0 ? 4 : 5 : 6") == 5d) // ?: right-assoc, nested
    assert(ev("(2 > 1) + (3 > 1) + (1 > 3)") == 2d)
  }

  test("function table: Math bodies incl. MathUtil logn/acosh/asinh/atanh") {
    assert(ev("logn(2, 8)") == 3d)
    assert(ev("acosh(2)") == math.log(math.sqrt(3d) + 2d))
    assert(ev("asinh(-3)") == -math.log(math.sqrt(10d) + 3d))
    assert(ev("atanh(-0.5)") == -0.5 * math.log(1.5 / 0.5))
    assert(ev("min(3, 2) + max(3, 2)") == 5d)
    assert(ev("pow(2, 10)") == 1024d)
    assert(ev("abs(-2.5) + ceil(1.2) + floor(-1.2)") == 2.5 + 2d - 2d)
  }

  test("parser rejects: unknown fn, bad arity, haversin (geo n/a), trailing input, unbound paren") {
    intercept[IllegalArgumentException](JsExpr.parse("foo(1)"))
    intercept[IllegalArgumentException](JsExpr.parse("max(1)"))
    intercept[IllegalArgumentException](JsExpr.parse("haversin(1,2,3,4)"))
    intercept[IllegalArgumentException](JsExpr.parse("1 + 2 )"))
    intercept[IllegalArgumentException](JsExpr.parse("(1 + 2"))
  }

  // ---------- local evaluator <-> Column form, bit-for-bit ----------

  test("Column form matches the local evaluator bit-for-bit on a value grid") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val vals = Seq(-5.5d, -1d, 0d, 0.5d, 1d, 2.25d, 7d, 9.9d)
    val rows = for (a <- vals; b <- vals; c <- Seq(-1d, 0.5d, 2d, 9d))
      yield (a, b, c)
    val df = rows.toDF("a", "b", "c")
    val battery = Seq(
      "a + b * c - 2",
      "(a + b) / (c + 1.5)",
      "a % 2 + b % 3",
      "-a + +b - -c",
      "a > b ? a : b",
      "a > 1 && b < 10 || c == 2",
      "!a + !(a - a) + !b",
      "~a & 0xff | a ^ 3",
      "(a < b) + (a <= b) + (a != b) + (a >= c)",
      "a << 2",
      "a >> 1",
      "a >>> 3",
      "min(a, b) + max(b, c)",
      "sqrt(abs(a)) + pow(abs(b), 2)",
      "ln(abs(a) + 1) + log10(abs(b) + 1) + logn(2, abs(c) + 2)",
      "exp(a / 10) + sin(a) + cos(b) + tan(c / 10)",
      "atan2(a, b) + atan(c)",
      "sinh(a / 10) + cosh(b / 10) + tanh(c)",
      "asinh(a) + acosh(abs(a) + 1) + atanh(a / 10)",
      "ceil(a) + floor(b)",
      "abs(a - b) + acos(a / 10) + asin(b / 10)",
      "a == a ? ln(2.0) : 0",
      "a > 0 ? b > 0 ? 1 : 2 : c",
      "ln(a)", // negative/zero inputs: -Inf at 0, NaN below (Math.log law)
      "log10(b)")
    for (src <- battery) {
      val node = JsExpr.parse(src)
      val got = df
        .withColumn("_v", JsExpr.toColumn(node, v => col(v)))
        .collect()
      got.foreach { r =>
        val bind = Map("a" -> r.getDouble(0), "b" -> r.getDouble(1),
          "c" -> r.getDouble(2))
        val exp = JsExpr.evalD(node, bind)
        val gv = r.getDouble(3)
        assert(java.lang.Double.doubleToLongBits(gv) ==
          java.lang.Double.doubleToLongBits(exp),
          s"$src at $bind: column=$gv local=$exp")
      }
    }
  }

  // ---------- search surfaces ----------

  private lazy val (dir, nlenOf) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length}
    val files = Corpus.generate(160, seed = 7117L)
    val df = spark.createDataset(files).repartition(4).toDF()
      .withColumn("nlen", length(col("content")).cast("long"))
    val ix = IndexBuilder.buildLogical(df, "content", None,
      Seq("repo", "path", "commit"),
      BuildConfig(numBuckets = 4, numDocShards = 2, saltThreshold = 1000000L))
    val d = java.nio.file.Files.createTempDirectory("graft-jsexpr").toString
    IndexBuilder.writeIndex(ix, d, "snap", 1)
    val nlens = ix.docs.select("docId", "nlen").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    ix.unpersistCached(); ix.postings.unpersist()
    (d, nlens)
  }

  private lazy val searcher = new Searcher(spark, SegmentSearcher.load(dir))
  private lazy val distSearcher =
    new Searcher(spark, SegmentSearcher.load(dir), cacheSegments = false,
      maxLocalBytes = 0L)

  private val exprNoScore = "sqrt(nlen) + 2 * ln(1.0 + nlen) - (nlen > 800 ? 10 : 0)"
  private val exprWithScore = "_score + ln(1.0 + nlen) / 10"

  /** From-scratch expected ranking: all matches via search() at huge k,
    * expression re-evaluated in spec code over the nlen map.
    */
  private def expected(term: String, src: String, k: Int,
      asc: Boolean): Seq[(Long, Double)] = {
    val node = JsExpr.parse(src)
    val all = searcher.search(TermQ(term), 100000)
    val scored = all.toSeq.map { h =>
      val bind = (v: String) =>
        if (v == "_score") h.score.toDouble else nlenOf(h.docId).toDouble
      (h.docId, JsExpr.evalD(node, bind))
    }
    val sorted =
      if (asc) scored.sortBy { case (d, v) => (v, d) }
      else scored.sortBy { case (d, v) => (-v, d) }
    sorted.take(k)
  }

  test("searchByExpr: desc rank, exact values, vs from-scratch recompute") {
    val got = searcher.searchByExpr(TermQ("merge"), 10, exprNoScore)
    assert(got.toSeq == expected("merge", exprNoScore, 10, asc = false))
  }

  test("searchByExpr: _score binding matches first-pass BM25 exactly") {
    val got = searcher.searchByExpr(TermQ("score"), 10, exprWithScore)
    assert(got.toSeq == expected("score", exprWithScore, 10, asc = false))
  }

  test("searchByExpr: asc order via getSortField(reverse=false)") {
    val got = searcher.searchByExpr(TermQ("merge"), 10, exprNoScore, asc = true)
    assert(got.toSeq == expected("merge", exprNoScore, 10, asc = true))
  }

  test("searchByExpr: forced-distributed parity (maxLocalBytes = 0)") {
    val local = searcher.searchByExpr(TermQ("merge"), 10, exprNoScore)
    val dist = distSearcher.searchByExpr(TermQ("merge"), 10, exprNoScore)
    assert(dist.toSeq == local.toSeq)
    val localS = searcher.searchByExpr(TermQ("score"), 10, exprWithScore)
    val distS = distSearcher.searchByExpr(TermQ("score"), 10, exprWithScore)
    assert(distS.toSeq == localS.toSeq)
  }

  test("searchByExpr: unbound variable is rejected loudly") {
    intercept[IllegalArgumentException](
      searcher.searchByExpr(TermQ("merge"), 5, "no_such_field + 1"))
  }

  test("rescoreExpr: SortRescorer law — expr is the sort value, hit score stays first-pass") {
    val node = JsExpr.parse(exprWithScore)
    val first = searcher.search(TermQ("index"), 20)
    val exp = first.toSeq.map { h =>
      val bind = (v: String) =>
        if (v == "_score") h.score.toDouble else nlenOf(h.docId).toDouble
      (h.docId, JsExpr.evalD(node, bind), h.score.toDouble)
    }.sortBy { case (d, v, _) => (-v, d) }.take(10)
    val got = searcher.rescoreExpr(first, exprWithScore, 10)
    assert(got.toSeq == exp)
    // gated local accessors ≡ the docId-pushdown distributed fetch
    assert(distSearcher.rescoreExpr(first, exprWithScore, 10).toSeq ==
      got.toSeq)
    // first-pass scores survive untouched on every returned row
    val firstScore = first.map(h => h.docId -> h.score.toDouble).toMap
    got.foreach { case (d, _, fs) => assert(fs == firstScore(d)) }
  }
}
