package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** Block-max WAND must be a pure optimization: identical hits to the
  * exhaustive disjunction loop on every query (the dual-scorer oracle
  * style of `TestBoolean2.java:16-19` / `TestBooleanOr`).
  */
class WandSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val tmp = java.nio.file.Files.createTempDirectory("graft-wand").toString

  def build(files: Seq[CodeFile], name: String, cfg: BuildConfig) = {
    import spark.implicits._
    val ix = IndexBuilder.buildLogical(
      spark.createDataset(files).repartition(4).toDF(),
      "content", None, Seq("repo", "path", "commit"), cfg)
    IndexBuilder.writeIndex(ix, s"$tmp/$name", "s1", 2)
    SegmentSearcher.load(s"$tmp/$name")
  }

  lazy val six = build(Corpus.generate(600, seed = 21L), "w1",
    BuildConfig(numBuckets = 8, numDocShards = 4, saltThreshold = 1000000L))
  lazy val sixSalted = build(Corpus.generate(600, seed = 21L), "w2",
    BuildConfig(numBuckets = 8, numDocShards = 4, saltThreshold = 200L))

  // tie-heavy: many identical docs → equal scores → docId tie-breaks
  lazy val sixTies = build(
    (0 until 300).map(i => CodeFile("r", f"p$i%04d", "c", "scala",
      if (i % 3 == 0) "alpha beta gamma delta" else "alpha beta")),
    "wt", BuildConfig(numBuckets = 4, numDocShards = 4, saltThreshold = 1000000L))

  val wandQueries: Seq[Query] = {
    val vocab = Seq("def", "index", "merge", "spark", "class", "val",
      "getindexwriter", "score", "query", "zzznothing")
    val rnd = new scala.util.Random(99L)
    val singles = vocab.map(TermQ(_): Query)
    val pairs = (1 to 10).map { _ =>
      Query.or(TermQ(vocab(rnd.nextInt(vocab.size))),
        TermQ(vocab(rnd.nextInt(vocab.size))))
    }
    val triples = (1 to 10).map { _ =>
      Query.or(TermQ(vocab(rnd.nextInt(vocab.size))),
        TermQ(vocab(rnd.nextInt(vocab.size))),
        TermQ(vocab(rnd.nextInt(vocab.size))))
    }
    val boosted = Seq(
      Query.or(BoostQ(TermQ("def"), 2.5f), TermQ("merge")),
      Query.or(BoostQ(TermQ("index"), 0.5f), BoostQ(TermQ("spark"), 3f)))
    // msm ≥ 2 disjunctions and pure conjunctions now run WAND paths too
    val msms = (1 to 8).map { _ =>
      val ts = Seq.fill(3 + rnd.nextInt(2))(TermQ(vocab(rnd.nextInt(vocab.size))))
      Query.orMin(2 + rnd.nextInt(2), ts.distinct: _*)
    }
    val ands = (1 to 8).map { _ =>
      val ts = Seq.fill(2 + rnd.nextInt(2))(TermQ(vocab(rnd.nextInt(vocab.size))))
      Query.and(ts.distinct: _*)
    }
    singles ++ pairs ++ triples ++ boosted ++ msms ++ ands
  }

  def run(ix: SegmentSearcher.SegmentIndex, q: Query, k: Int, wand: Boolean,
      after: Option[(Double, Long)] = None) =
    SegmentSearcher.search(spark, ix, q, k, after, useWand = wand).toSeq

  test("WAND == exhaustive on plain index, k in {1, 3, 10, 100}") {
    for (q <- wandQueries; k <- Seq(1, 3, 10, 100)) {
      assert(run(six, q, k, wand = true) === run(six, q, k, wand = false),
        s"q=$q k=$k")
    }
  }

  test("WAND == exhaustive on salted index") {
    for (q <- wandQueries; k <- Seq(1, 10)) {
      assert(run(sixSalted, q, k, wand = true) === run(sixSalted, q, k, wand = false),
        s"salted q=$q k=$k")
    }
  }

  test("WAND == exhaustive with heavy score ties") {
    for (q <- Seq(TermQ("alpha"), Query.or(TermQ("alpha"), TermQ("gamma")),
      Query.or(TermQ("beta"), TermQ("delta"))); k <- Seq(5, 10, 50)) {
      assert(run(sixTies, q, k, wand = true) === run(sixTies, q, k, wand = false),
        s"ties q=$q k=$k")
    }
  }

  test("WAND == exhaustive with searchAfter cursors") {
    for (q <- Seq(TermQ("def"), Query.or(TermQ("def"), TermQ("merge")))) {
      val page1 = run(six, q, 7, wand = true)
      val cursor = Some((page1.last.score, page1.last.docId))
      assert(run(six, q, 7, wand = true, cursor) ===
        run(six, q, 7, wand = false, cursor), s"after q=$q")
    }
  }

  test("WAND handles k larger than result set") {
    val q = TermQ("getindexwriter")
    assert(run(six, q, 10000, wand = true) === run(six, q, 10000, wand = false))
  }

  test("pruning effectiveness: scored candidates far below match count") {
    import graft.index.PostingsCodec
    val params = BM25.Default
    val cache = BM25.normCache(params, 100f)
    val norm = graft.core.Norms.normByte(100)
    def mkList(n: Int, spikeEvery: Int): (Array[Byte], Array[Byte]) = {
      val docs = Array.tabulate(n)(_.toLong)
      val tfs = Array.tabulate(n)(i => if (i % spikeEvery == 0) 10 else 1)
      val norms = Array.fill(n)(norm)
      PostingsCodec.encode(docs, tfs, norms)
    }
    val n = 50000
    val (b1, s1) = mkList(n, 1000)
    val (b2, s2) = mkList(n, 777)
    def t1() = new TermScorer(PostingsCodec.iterator(b1, s1), 2.0f, cache)
    def t2() = new TermScorer(PostingsCodec.iterator(b2, s2), 1.5f, cache)

    // disjunction (single-term degenerate): block-max skips flat blocks
    val qw = new BoundedHitQueue(10)
    val scoredW = Wand.collect(Array[DocScorer](t1()), qw, None)
    val qe = new BoundedHitQueue(10)
    val ex = t1()
    var d = ex.nextDoc()
    var cnt = 0
    while (d != DocScorer.NO_MORE) {
      qe.insert(d, ex.score.toDouble); cnt += 1; d = ex.nextDoc()
    }
    assert(qw.sortedHits.toSeq === qe.sortedHits.toSeq)
    assert(scoredW < cnt / 5, s"disjunction scored $scoredW of $cnt")

    // conjunction: block-max skips aligned blocks whose bound sum loses
    val qc = new BoundedHitQueue(10)
    val scoredC = Wand.collectConjunction(Array[DocScorer](t1(), t2()), qc, None)
    val qce = new BoundedHitQueue(10)
    val con = new ConjunctionScorer(Array[DocScorer](t1(), t2()))
    d = con.nextDoc()
    var cntC = 0
    while (d != DocScorer.NO_MORE) {
      qce.insert(d, con.score.toDouble); cntC += 1; d = con.nextDoc()
    }
    assert(qc.sortedHits.toSeq === qce.sortedHits.toSeq)
    assert(scoredC < cntC / 2, s"conjunction scored $scoredC of $cntC")
  }
}
