package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Analysis, Corpus}
import graft.index.{IndexBuilder, Merge, PostingsCodec}
import graft.index.IndexBuilder.BuildConfig
import graft.search._
import graft.search.Span.{Near, Term}

/** Payloads: the `..._AND_PAYLOADS` sidecar plus PayloadScoreQuery /
  * SpanPayloadCheckQuery (`lucene/queries/src/java/org/apache/lucene/
  * queries/payloads/`). Laws verified against independent recomputes
  * over raw token arrays (the payload fold is re-derived from the
  * policy + the doc's tokens, never from the engine's sidecar), plus
  * codec round-trips, merge survival, and forced-distributed parity.
  */
class PayloadSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // ---- codec round-trip ----

  test("payload codec round-trip across block boundaries, NaN preserved") {
    val rnd = new scala.util.Random(7)
    val nDocs = 300 // > 2 blocks of 128
    val docs = Array.tabulate(nDocs)(i => (i * 3 + 1).toLong)
    val tfs = Array.tabulate(nDocs)(i => 1 + rnd.nextInt(4))
    val norms = Array.tabulate(nDocs)(i => (i % 200).toByte)
    val poss = Array.tabulate(nDocs) { i =>
      val ps = new Array[Int](tfs(i))
      var p = 0
      for (j <- ps.indices) { p += 1 + rnd.nextInt(9); ps(j) = p }
      ps
    }
    val pays = Array.tabulate(nDocs) { i =>
      Array.tabulate(tfs(i)) { j =>
        if ((i + j) % 5 == 0) Float.NaN else rnd.nextFloat() * 100f
      }
    }
    val (body, skip) = PostingsCodec.encode(docs, tfs, norms)
    val posBlob = PostingsCodec.concatPositionBlocks(
      poss.map(PostingsCodec.encodeDocPositions))
    val payBlob = PostingsCodec.concatPositionBlocks(
      pays.map(PostingsCodec.encodeDocPayloads))

    // full decode
    val back = PostingsCodec.decodePayloads(payBlob, tfs)
    for (i <- 0 until nDocs; j <- 0 until tfs(i))
      assert(java.lang.Float.floatToIntBits(back(i)(j)) ==
        java.lang.Float.floatToIntBits(pays(i)(j)), s"doc $i occ $j")

    // streaming iterator, with skip-ahead (block-lazy decode)
    val it = PostingsCodec.iterator(body, skip, posBlob, payBlob)
    assert(it.hasPayloads)
    // advance into the middle of block 2, then walk
    assert(it.advance(docs(200)))
    var i = 200
    while (i < nDocs) {
      assert(it.doc == docs(i))
      val ps = it.payloads()
      assert(ps.length == tfs(i))
      for (j <- ps.indices)
        assert(java.lang.Float.floatToIntBits(ps(j)) ==
          java.lang.Float.floatToIntBits(pays(i)(j)))
      // positions stay aligned
      assert(it.positions().toSeq == poss(i).toSeq)
      if (i < nDocs - 1) assert(it.nextDoc())
      i += 1
    }
  }

  test("payload policies: pos, len, delimited") {
    val pos = Analysis.Payloads.policy("pos")
    assert(pos("abc", 7) == ("abc", 7f))
    val len = Analysis.Payloads.policy("len")
    assert(len("abcd", 9) == ("abcd", 4f))
    val del = Analysis.Payloads.policy("delimited:|")
    assert(del("alpha|2.5", 0) == ("alpha", 2.5f))
    val (t, p) = del("beta", 3)
    assert(t == "beta" && p.isNaN)
    intercept[NumberFormatException](del("x|notafloat", 0))
    intercept[RuntimeException](Analysis.Payloads.policy("nope"))
  }

  // ---- corpus fixture with policy "pos" ----

  private lazy val (searcher, docsToks, ixDir) = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-payload").toString
    val files = Corpus.generate(220, seed = 61L)
    val ix = IndexBuilder.buildLogical(
      spark.createDataset(files).repartition(4).toDF(),
      "content", None, Seq("repo", "path", "commit"),
      BuildConfig(numBuckets = 4, numDocShards = 2,
        payloads = Some("pos")))
    IndexBuilder.writeIndex(ix, tmp, "pay", 1)
    val toks = ix.docs.select("docId", "content").collect()
      .map(r => r.getLong(0) -> Analysis.simpleTokens(r.getString(1)))
      .toMap
    ix.unpersistCached(); ix.postings.unpersist()
    (new Searcher(spark, SegmentSearcher.load(tmp)), toks, tmp)
  }

  private def got(q: Query, k: Int = 500): Seq[(Long, Double)] =
    searcher.search(q, k).toSeq.map(h => (h.docId, h.score))

  test("index payloads align with positions under the pos policy") {
    assert(SegmentSearcher.load(ixDir).manifest.payloads.contains("pos"))
    val rows = searcher.segmentsDf
      .filter(org.apache.spark.sql.functions.col("term")
        .isin("def", "index", "merge"))
      .select("term", "docBlocks", "skipData", "posBlocks", "payBlocks")
      .collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1),
        r.getAs[Array[Byte]](2), r.getAs[Array[Byte]](3),
        r.getAs[Array[Byte]](4)))
    assert(rows.nonEmpty)
    rows.foreach { case (term, docBlocks, skipData, posBlocks, payBlocks) =>
      val it = PostingsCodec.iterator(docBlocks, skipData,
        posBlocks, payBlocks)
      assert(it.hasPayloads)
      while (it.nextDoc()) {
        val ps = it.positions()
        val ys = it.payloads()
        assert(ys.toSeq == ps.map(_.toFloat).toSeq,
          s"term=$term doc=${it.doc}")
        // and the positions are the true token positions
        val toks = docsToks(it.doc)
        assert(ps.forall(p => toks(p) == term))
      }
    }
  }

  /** Independent payload fold for a doc's matched spans: every collected
    * leaf payload (skipping NaN) through the function laws
    * (Min/Max/AveragePayloadFunction currentScore + docScore).
    */
  private def foldPays(leafPays: Seq[Float], fn: String): Float = {
    var seen = 0
    var acc = 0f
    leafPays.filterNot(_.isNaN).foreach { p =>
      acc = fn match {
        case "min" => if (seen == 0) p else math.min(p, acc)
        case "max" => if (seen == 0) p else math.max(p, acc)
        case "avg" => acc + p
      }
      seen += 1
    }
    if (seen == 0) 1f else if (fn == "avg") acc / seen else acc
  }

  test("PayloadScoreQ(Term) == SpanQ score × independent payload fold") {
    for (t <- Seq("def", "index", "merge"); fn <- Seq("min", "max", "avg")) {
      val span = got(SpanQ(Term(t))).toMap
      val pay = got(PayloadScoreQ(Term(t), fn))
      assert(pay.nonEmpty, s"$t/$fn")
      assert(pay.map(_._1).toSet == span.keySet)
      pay.foreach { case (d, s) =>
        // leaf payloads under "pos" = the term's positions, in order
        val leafPays = docsToks(d).zipWithIndex
          .collect { case (tok, i) if tok == t => i.toFloat }.toSeq
        val expected = (span(d).toFloat * foldPays(leafPays, fn)).toDouble
        assert(s == expected, s"term=$t fn=$fn doc=$d")
      }
    }
  }

  test("PayloadScoreQ over a Near tree folds per-span leaf payloads in clause order") {
    val (a, b, slop) = ("def", "val", 3)
    val pay = got(PayloadScoreQ(Near(Seq(Term(a), Term(b)), slop), "avg"))
    val span = got(SpanQ(Near(Seq(Term(a), Term(b)), slop))).toMap
    assert(pay.nonEmpty)
    pay.foreach { case (d, s) =>
      // independent 2-clause ordered-near enumeration over raw tokens
      val toks = docsToks(d)
      val pa = toks.zipWithIndex.collect { case (t, i) if t == a => i }
      val pb = toks.zipWithIndex.collect { case (t, i) if t == b => i }
      var bi = 0
      val leafPays = scala.collection.mutable.ArrayBuffer.empty[Float]
      var exhausted = false
      pa.foreach { p0 =>
        if (!exhausted) {
          while (bi < pb.length && pb(bi) < p0 + 1) bi += 1
          if (bi >= pb.length) exhausted = true
          else if (pb(bi) - (p0 + 1) <= slop) {
            // collect order: clause 0's leaf, then clause 1's
            leafPays += p0.toFloat
            leafPays += pb(bi).toFloat
          }
        }
      }
      val expected = (span(d).toFloat * foldPays(leafPays.toSeq, "avg")).toDouble
      assert(s == expected, s"doc=$d")
    }
  }

  test("includeSpanScore=false scores the payload factor alone; boost inert") {
    val q = PayloadScoreQ(Term("def"), "max", includeSpanScore = false)
    val res = got(q)
    assert(res.nonEmpty)
    res.foreach { case (d, s) =>
      val leafPays = docsToks(d).zipWithIndex
        .collect { case (tok, i) if tok == "def" => i.toFloat }.toSeq
      assert(s == foldPays(leafPays, "max").toDouble)
    }
    // the reference's scoreCurrentDoc ignores the sim score entirely in
    // this mode, so a boost cannot reach the result
    assert(got(BoostQ(q, 3f)) == res)
  }

  test("forced-distributed parity (maxLocalBytes = 0)") {
    val dist = new Searcher(spark, SegmentSearcher.load(ixDir),
      cacheSegments = false, maxLocalBytes = 0L)
    for (q <- Seq[Query](
        PayloadScoreQ(Term("def"), "avg"),
        PayloadScoreQ(Near(Seq(Term("def"), Term("val")), 3), "max"),
        PayloadScoreQ(Term("index"), "min", includeSpanScore = false))) {
      val a = got(q, 50)
      val b = dist.search(q, 50).toSeq.map(h => (h.docId, h.score))
      assert(a == b, s"q=$q")
    }
  }

  // ---- delimited policy: absent payloads + the check query ----

  private lazy val (delSearcher, delDir) = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-payload-del").toString
    // alpha occurrences carry explicit float payloads; bare alpha has none
    val rows = Seq(
      (0L, "alpha|2.0 beta alpha|3.0 gamma"),
      (1L, "alpha|5.0 beta gamma"),
      (2L, "alpha beta alpha|4.0 gamma"),
      (3L, "alpha beta gamma"),
      (4L, "beta gamma beta"))
    val df = rows.toDF("doc_id", "content")
    val ix = IndexBuilder.buildLogical(df, "content", Some("doc_id"), Nil,
      BuildConfig(numBuckets = 2, numDocShards = 2,
        tokenizer = "pattern:\\s+", payloads = Some("delimited:|")))
    IndexBuilder.writeIndex(ix, tmp, "del", 1)
    ix.unpersistCached(); ix.postings.unpersist()
    (new Searcher(spark, SegmentSearcher.load(tmp)), tmp)
  }

  test("delimited policy: term rewrite + NaN for bare tokens; zero payloads seen → docScore 1") {
    val hits = delSearcher.search(PayloadScoreQ(Term("alpha"), "max"), 10)
    assert(hits.map(_.docId).toSet == Set(0L, 1L, 2L, 3L))
    val byDoc = hits.map(h => h.docId -> h.score).toMap
    val span = delSearcher.search(SpanQ(Term("alpha")), 10)
      .map(h => h.docId -> h.score).toMap
    // doc 0: max(2, 3) = 3; doc 1: 5; doc 2: only the delimited occurrence
    // counts → 4; doc 3: no payloads seen → factor 1
    for ((d, f) <- Seq(0L -> 3f, 1L -> 5f, 2L -> 4f, 3L -> 1f))
      assert(byDoc(d) == (span(d).toFloat * f).toDouble, s"doc=$d")
    // avg on doc 0: (2+3)/2 = 2.5
    val avg = delSearcher.search(PayloadScoreQ(Term("alpha"), "avg"), 10)
      .map(h => h.docId -> h.score).toMap
    assert(avg(0L) == (span(0L).toFloat * 2.5f).toDouble)
  }

  test("SpanPayloadCheckQ: entry-wise match incl. NaN-as-null, count must match") {
    // Near(alpha, beta; 1): every doc 0-3 has an (alpha, beta) span;
    // leaf payloads in clause order = (alpha's payload, beta's = NaN)
    val near = Near(Seq(Term("alpha"), Term("beta")), 1)
    def check(pays: Seq[Float]): Set[Long] =
      delSearcher.search(SpanPayloadCheckQ(near, pays), 10)
        .map(_.docId).toSet
    assert(check(Seq(2.0f, Float.NaN)) == Set(0L)) // only doc 0 leads with 2.0
    assert(check(Seq(5.0f, Float.NaN)) == Set(1L))
    assert(check(Seq(Float.NaN, Float.NaN)) == Set(2L, 3L)) // bare alpha
    assert(check(Seq(2.0f)) == Set.empty) // length mismatch (2 leaves)
    // accepted spans score like the plain span tree on full-match docs
    val all = delSearcher.search(SpanQ(near), 10)
      .map(h => h.docId -> h.score).toMap
    val one = delSearcher.search(SpanPayloadCheckQ(near, Seq(5.0f, Float.NaN)), 10)
    assert(one.head.score == all(1L))
  }

  test("merge preserves the payloads sidecar (incl. cold→salt split)") {
    import spark.implicits._
    val t1 = java.nio.file.Files.createTempDirectory("graft-pay-m1").toString
    val t2 = java.nio.file.Files.createTempDirectory("graft-pay-m2").toString
    val out = java.nio.file.Files.createTempDirectory("graft-pay-out").toString
    val full = java.nio.file.Files.createTempDirectory("graft-pay-full").toString
    val files = Corpus.generate(160, seed = 91L)
    val (fa, fb) = files.splitAt(80)
    // salt threshold low enough that hot terms split on merge
    val cfg = BuildConfig(numBuckets = 2, numDocShards = 2,
      saltThreshold = 60L, payloads = Some("pos"))
    def build(fs: Seq[graft.core.CodeFile], docId0: Long, dir: String): Unit = {
      val df = spark.createDataset(fs).toDF()
        .withColumn("doc_id",
          org.apache.spark.sql.functions.monotonically_increasing_id() + docId0)
      val ix = IndexBuilder.buildLogical(df.repartition(1), "content",
        Some("doc_id"), Nil, cfg)
      IndexBuilder.writeIndex(ix, dir, s"m-$docId0", 1)
      ix.unpersistCached(); ix.postings.unpersist()
    }
    build(fa, 0L, t1)
    build(fb, 10000L, t2)
    Merge.mergeIndexes(spark, Seq(t1, t2), out, "merged")
    val m = IndexBuilder.readManifest(out).get
    assert(m.payloads.contains("pos"))
    val ms = new Searcher(spark, SegmentSearcher.load(out))
    // payloads still usable and correct after merge
    val hits = ms.search(PayloadScoreQ(Term("def"), "max"), 500)
    assert(hits.nonEmpty)
    val spanScores = ms.search(SpanQ(Term("def")), 500)
      .map(h => h.docId -> h.score).toMap
    val docsDf = spark.read.parquet(s"$out/docs")
      .select("docId", "content").collect()
      .map(r => r.getLong(0) -> Analysis.simpleTokens(r.getString(1))).toMap
    hits.foreach { h =>
      val leafPays = docsDf(h.docId).zipWithIndex
        .collect { case (tok, i) if tok == "def" => i.toFloat }.toSeq
      assert(h.score ==
        (spanScores(h.docId).toFloat * foldPays(leafPays, "max")).toDouble)
    }
    Seq(t1, t2, out, full).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }

  test("payload queries demand a payloads-built index, loudly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-nopay").toString
    val df = Seq((0L, "alpha beta")).toDF("doc_id", "content")
    val ix = IndexBuilder.buildLogical(df, "content", Some("doc_id"), Nil,
      BuildConfig(numBuckets = 2, numDocShards = 2))
    IndexBuilder.writeIndex(ix, tmp, "np", 1)
    ix.unpersistCached(); ix.postings.unpersist()
    val s = new Searcher(spark, SegmentSearcher.load(tmp))
    val e = intercept[RuntimeException](
      s.search(PayloadScoreQ(Term("alpha"), "max"), 5))
    assert(e.getMessage.contains("payloads"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("payloads require positions at build config time") {
    import spark.implicits._
    val df = Seq((0L, "alpha")).toDF("doc_id", "content")
    val e = intercept[IllegalArgumentException](
      IndexBuilder.buildLogical(df, "content", Some("doc_id"), Nil,
        BuildConfig(positions = false, payloads = Some("pos")),
        persistPostings = false))
    assert(e.getMessage.contains("positions"))
  }
}
