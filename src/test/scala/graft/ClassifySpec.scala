package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Analysis, Corpus}
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.ops.Classify
import graft.search.{BoolQ, BoostQ, Searcher, SegmentSearcher, TermQ}

/** Index-backed classification (the reference's classification module)
  * pinned against independent in-spec recomputations:
  * SimpleNaiveBayesClassifier's score law
  * (`classification/SimpleNaiveBayesClassifier.java:196-270`) is
  * re-derived here with plain Scala loops over the collected fixture
  * (Classify computes it with DataFrame aggregations);
  * normClassificationResults' softmax (:288-313) is property-checked;
  * the KNN vote (`KNearestNeighborClassifier.java:131-169`) is refolded
  * from the raw hits.
  */
class ClassifySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // ---------- softmax normalization ----------

  test("normalize: softmax law, descending-raw fold, tie order") {
    val raw = Seq("b" -> -3.0, "a" -> -1.5, "d" -> -1.5, "c" -> -9.0)
    val out = Classify.normalize(raw)
    // order: score desc, class asc on ties
    assert(out.map(_.cls) == Seq("a", "d", "b", "c"))
    // norms sum to 1 and match a direct softmax
    assert(math.abs(out.map(_.norm).sum - 1.0) < 1e-12)
    val z = raw.map { case (_, s) => math.exp(s) }.sum
    out.foreach { c =>
      assert(math.abs(c.norm - math.exp(c.raw) / z) < 1e-12, c)
    }
    // norms strictly in (0, 1) (the reference asserts this in its tests)
    out.foreach(c => assert(c.norm > 0 && c.norm < 1))
  }

  // ---------- naive Bayes vs an independent loop recompute ----------

  private val nbDocs = Seq(
    ("merge sort fast merge", "algo"),
    ("sort key table", "algo"),
    ("row scan table scan", "storage"),
    ("page row buffer", "storage"),
    ("merge page buffer key", "storage"),
    ("orphan text no class", null),
    ("another unclassed", ""))

  /** Plain-Scala re-derivation of SimpleNaiveBayesClassifier.java:
    * 196-270 over the collected fixture — no DataFrames, no shared code
    * with Classify.naiveBayes beyond the tokenizer.
    */
  private def nbExpected(docs: Seq[(String, String)], text: String)
      : Seq[(String, Double)] = {
    val tok: String => Array[String] = Analysis.simpleTokens
    val perDoc = docs.map { case (t, c) => (tok(t).distinct, c) }
    val sumDocFreq = perDoc.map(_._1.length).sum
    val docCount = perDoc.count(_._1.nonEmpty)
    val avgUnique = sumDocFreq.toDouble / docCount
    val classed = perDoc.filter { case (_, c) => c != null && c.nonEmpty }
    val dfByClass = classed.groupBy(_._2).view.mapValues(_.size).toMap
    val docsWithClass = classed.size
    val toks = tok(text)
    dfByClass.keys.toSeq.sorted.map { c =>
      val dfC = dfByClass(c)
      var s = math.log(dfC.toDouble) - math.log(docsWithClass.toDouble)
      toks.foreach { w =>
        val hits = classed.count { case (ts, cc) => cc == c && ts.contains(w) }
        s += math.log((hits + 1d) / (avgUnique * dfC + docsWithClass))
      }
      (c, s)
    }
  }

  test("naiveBayes matches the loop recompute (incl. unclassed-row law)") {
    import spark.implicits._
    val df = spark.createDataset(nbDocs).toDF("text", "cls")
    val text = "merge table scan merge"
    val got = Classify.naiveBayes(df, "text", "cls", Analysis.simpleTokens, text)
    val exp = Classify.normalize(nbExpected(nbDocs, text))
    assert(got.map(_.cls) == exp.map(_.cls))
    got.zip(exp).foreach { case (g, e) =>
      assert(g.raw == e.raw, s"raw ${g.cls}")
      assert(g.norm == e.norm, s"norm ${g.cls}")
    }
    // the fixture actually exercises both classes and the unclassed rows:
    // docsWithClass = 5 (not 7), field stats count all 7
    assert(got.size == 2)
  }

  test("naiveBayes: repeated input tokens each contribute (fold over tokens, not distinct)") {
    import spark.implicits._
    val df = spark.createDataset(nbDocs).toDF("text", "cls")
    val once = Classify.naiveBayes(df, "text", "cls", Analysis.simpleTokens, "merge")
    val twice = Classify.naiveBayes(df, "text", "cls", Analysis.simpleTokens, "merge merge")
    // log-likelihood term is added per occurrence → raws differ
    assert(once.map(_.raw) != twice.map(_.raw))
    val e1 = Classify.normalize(nbExpected(nbDocs, "merge"))
    val e2 = Classify.normalize(nbExpected(nbDocs, "merge merge"))
    assert(once.map(c => (c.cls, c.raw)) == e1.map(c => (c.cls, c.raw)))
    assert(twice.map(c => (c.cls, c.raw)) == e2.map(c => (c.cls, c.raw)))
  }

  // ---------- MLT-from-text selection laws ----------

  private lazy val knnSearcher: Searcher = {
    import spark.implicits._
    val corpus = spark.createDataset(Corpus.generate(400, seed = 777L)).toDF()
    val ix = IndexBuilder.buildLogical(corpus.repartition(4), "content",
      None, Seq("lang", "path"),
      BuildConfig(numBuckets = 4, numDocShards = 2, saltThreshold = 1000000L))
    val d = java.nio.file.Files.createTempDirectory("graft-classify").toString
    IndexBuilder.writeIndex(ix, d, "snap", 1)
    ix.unpersistCached(); ix.postings.unpersist()
    new Searcher(spark, SegmentSearcher.load(d))
  }

  test("mltTextQuery: tf/df gates, top-N by classic idf score, boost = score/lowest") {
    val s = knnSearcher
    val text = "merge sort merge index index partition zzznotindict"
    val q = Classify.mltTextQuery(s, text, maxQueryTerms = 2,
      minTermFreq = 2, minDocFreq = 1)
    // independent selection: tf from the text, df from stats, classic idf
    val tok = Analysis.simpleTokens(text)
    val tf = tok.groupBy(identity).view.mapValues(_.length).toMap
    val df = s.stats(tf.keySet)
    val n = s.index.manifest.docCount
    val scored = tf.toSeq.flatMap { case (w, f) =>
      if (f < 2) None
      else df.get(w).map(_._1).filter(_ > 0).map { d =>
        (w, f * (math.log((n + 1) / (d + 1).toDouble) + 1.0).toFloat)
      }
    }
    val sel = scored.sortBy { case (w, sc) => (-sc, w) }.take(2).reverse
    assert(sel.size == 2) // merge(2) and index(2) both pass tf>=2
    val clauses = q.asInstanceOf[BoolQ].should
    assert(clauses.size == 2)
    // clause order = ascending score (PQ pop order); lowest has boost 1
    val lowest = sel.head._2
    clauses.zip(sel).foreach {
      case (TermQ(t), (w, sc)) =>
        assert(t == w); assert(sc == lowest)
      case (BoostQ(TermQ(t), b), (w, sc)) =>
        assert(t == w); assert(b == sc / lowest)
      case other => fail(other.toString)
    }
    // sub-threshold tf (sort: 1) and out-of-dict words never selected
    val words = clauses.map { case TermQ(t) => t; case BoostQ(TermQ(t), _) => t }
    assert(!words.contains("sort") && !words.contains("zzznotindict"))
  }

  // ---------- KNN vote refold ----------

  test("knn vote matches a refold of the raw hits (incl. sumdoc<k rescale)") {
    val s = knnSearcher
    val text = "merge sort index partition block skip"
    val k = 7
    val q = Classify.mltTextQuery(s, text, 10, minTermFreq = 1, minDocFreq = 1)
    val hits = s.search(q, k, None, true, SegmentSearcher.SimBm25)
    assert(hits.nonEmpty)
    val got = Classify.knn(s, "lang", text, k = k, maxQueryTerms = 10,
      minTermFreq = 1, minDocFreq = 1)
    // independent vote fold (KNearestNeighborClassifier.java:131-169)
    val langOf = s.docsDf.select("docId", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val maxScore = hits.head.score
    var sumdoc = 0
    val cnt = scala.collection.mutable.Map.empty[String, Int]
    val bs = scala.collection.mutable.Map.empty[String, Double]
    hits.foreach { h =>
      val c = langOf(h.docId)
      cnt.update(c, cnt.getOrElse(c, 0) + 1)
      bs.update(c, bs.getOrElse(c, 0d) + h.score / maxScore)
      sumdoc += 1
    }
    val exp = cnt.toSeq.map { case (c, n) =>
      val base = (n * (bs(c) / n)) / k.toDouble
      (c, if (sumdoc < k) base * k / sumdoc else base)
    }.sortBy { case (c, sc) => (-sc, c) }
    assert(got.map(c => (c.cls, c.raw)) == exp)
    // every Corpus doc has a lang → sumdoc == hits.size
    assert(sumdoc == hits.length)
  }

  // ---------- batch NB: every doc classified in one pass ----------

  test("naiveBayesBatch == per-doc argmax of the loop recompute, bit-exact") {
    import spark.implicits._
    val withIds = nbDocs.zipWithIndex.map { case ((t, c), i) => (i.toLong, t, c) }
    val df = spark.createDataset(withIds).toDF("id", "text", "cls")
    val got = Classify.naiveBayesBatch(df, "id", "text", "cls",
        Analysis.simpleTokens)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.length == withIds.size) // unclassed docs are classified too
    got.foreach { case (id, cls, score) =>
      val raw = nbExpected(nbDocs, withIds(id.toInt)._2) // class-asc order
      // assignClass (SimpleNaiveBayesClassifier.java:104-115): strict >
      // over the class-asc list — ties keep the smallest class
      var best = raw.head
      raw.tail.foreach { c => if (c._2 > best._2) best = c }
      assert(cls == best._1, s"doc $id")
      assert(score == best._2, s"doc $id score")
    }
  }

  // ---------- confusion matrix: reference formulas ----------

  test("confusionMatrix: counts + metrics vs an independent transcription") {
    import spark.implicits._
    // absent columns (nothing assigned 'd'), an absent diagonal ('c'
    // never correct→assigned c), null/empty rows to drop
    val pairs = Seq(
      ("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a"),
      ("b", "b"), ("c", "a"), ("c", "b"), ("d", "d"),
      (null, "a"), ("", "b"), ("a", null))
    val df = spark.createDataset(pairs).toDF("correct", "assigned")
    val c = Classify.confusionMatrix(df, "correct", "assigned")

    // independent transcription of ConfusionMatrixGenerator.java:200-307
    val kept = pairs.filter { case (co, a) => co != null && co.nonEmpty && a != null }
    val cells = kept.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = kept.map(_._1).distinct.sorted
    assert(c.matrix.toSet ==
      cells.map { case ((co, a), n) => (co, a, n) }.toSet)
    assert(c.evaluated == kept.size)
    var (tp, tn, tfp, fn) = (0L, 0L, 0L, 0L)
    rows.foreach { k =>
      cells.foreach { case ((co, a), n) =>
        if (co == k) { if (a == k) tp += n else fn += n }
      }
      rows.foreach { r =>
        if (cells.contains((r, k))) tfp += cells((r, k)) else tn += 1
      }
    }
    assert(c.accuracy == (tp + tn).toDouble / (tfp + fn + tn))
    def prec(k: String): Double = {
      val t = cells.getOrElse((k, k), 0L).toDouble
      val den = rows.flatMap(r => cells.get((r, k))).sum.toDouble
      if (t > 0) t / den else 0d
    }
    def rec(k: String): Double = {
      val t = cells.getOrElse((k, k), 0L).toDouble
      val f = cells.collect { case ((co, a), n) if co == k && a != k => n }
        .sum.toDouble
      if (t + f > 0) t / (t + f) else 0d
    }
    var pS = 0d; var rS = 0d
    rows.foreach { k => pS += prec(k); rS += rec(k) }
    assert(c.precision == pS / rows.size)
    assert(c.recall == rS / rows.size)
    val (p, r) = (pS / rows.size, rS / rows.size)
    assert(c.f1 == (if (p > 0 && r > 0) 2 * p * r / (p + r) else 0d))
    // the per-class accessors agree with the transcription
    rows.foreach { k =>
      assert(c.precisionOf(k) == prec(k), s"precision $k")
      assert(c.recallOf(k) == rec(k), s"recall $k")
    }
    // 'd' was only ever correct+assigned d → precision 1, recall 1
    assert(c.precisionOf("d") == 1d && c.recallOf("d") == 1d)
    // 'c' has no diagonal → precision 0, recall 0, f1 0
    assert(c.precisionOf("c") == 0d && c.f1Of("c") == 0d)
  }

  // ---------- BooleanPerceptronClassifier vs a plain-Scala fold ----------

  private val percDocs = Seq(
    (1L, "a a b", "false"),
    (2L, "a b c", "true"),
    (3L, "b c c d", "false"),
    (4L, "a d d", "true"),
    (5L, "c d", null),
    (6L, "a b c d", ""))

  /** Independent transcription of BooleanPerceptronClassifier.java:
    * 80-228 — sequential loop over classed docs in id order, stale
    * FST-snapshot reads, miss-only overwrite updates, snapshot refresh
    * gated on the running classed-doc index mod batchSize.
    */
  private def percExpected(docs: Seq[(Long, String, String)], text: String,
      batchSize: Int, threshold: Double = 0d,
      filter: Long => Boolean = _ => true)
      : (Boolean, Double, Long, Double) = {
    val tok: String => Array[String] = Analysis.simpleTokens
    val perDoc = docs.map { case (id, t, c) => (id, tok(t), c) }
    val thr =
      if (threshold != 0d) threshold
      else perDoc.map(_._2.distinct.length).sum / 2d
    var weights = Map.empty[String, Long]
    perDoc.foreach(_._2.foreach(w =>
      weights += w -> (weights.getOrElse(w, 0L) + 1)))
    var fst = weights
    var i = 0
    perDoc.sortBy(_._1).foreach { case (id, ts, c) =>
      if (c != null && c.nonEmpty && filter(id)) {
        var out = 0L
        ts.foreach(w => out += fst.getOrElse(w, 0L))
        val assigned = out >= thr
        val correct = c.equalsIgnoreCase("true")
        if (assigned != correct) {
          val mod = if (correct) 1L else -1L
          ts.distinct.foreach { w =>
            val f = ts.count(_ == w)
            weights += w -> fst.get(w).map(_ + mod * f).getOrElse(0L)
          }
          if (i % batchSize == 0) fst = weights
        }
        i += 1
      }
    }
    var out = 0L
    tok(text).foreach(w => out += fst.getOrElse(w, 0L))
    (out >= thr, 1d - math.exp(-math.abs(thr - out) / thr), out, thr)
  }

  private def percGot(text: String, batchSize: Int, threshold: Double = 0d,
      filter: org.apache.spark.sql.Column = null)
      : (Boolean, Double, Long, Double) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val df = spark.createDataset(percDocs).toDF("id", "text", "cls")
    val r = Classify.booleanPerceptron(df, "text", "cls", "id",
      Analysis.simpleTokens, text, batchSize = batchSize,
      threshold = threshold,
      trainFilter = if (filter == null) lit(true) else filter)
    (r.cls, r.score, r.output, r.threshold)
  }

  test("booleanPerceptron matches the reference fold (auto thr, unclassed excluded)") {
    val text = "a c e" // e is out-of-corpus → contributes 0
    val exp = percExpected(percDocs, text, batchSize = 1)
    assert(percGot(text, batchSize = 1) == exp)
    // auto threshold = corpus sumDocFreq/2 over ALL docs incl. unclassed
    assert(exp._4 == 8.0)
    // out-of-corpus input token truly contributes nothing
    assert(percGot("a c", batchSize = 1)._3 == exp._3)
  }

  test("booleanPerceptron: batch-snapshot staleness changes the answer") {
    val text = "a c e"
    val b1 = percGot(text, batchSize = 1)
    val b3 = percGot(text, batchSize = 3)
    assert(b3 == percExpected(percDocs, text, batchSize = 3))
    // the fixture has teeth: the stale snapshot flips the assigned class
    // (doc3's miss lands at i=2, 2 % 3 != 0 → no refresh)
    assert(b1._1 != b3._1, s"$b1 vs $b3")
    assert(b1._3 != b3._3)
  }

  test("booleanPerceptron: explicit threshold + trainFilter (stats stay corpus-wide)") {
    import org.apache.spark.sql.functions.col
    val text = "b d"
    val exp = percExpected(percDocs, text, batchSize = 1, threshold = 5d,
      filter = _ <= 2L)
    val got = percGot(text, batchSize = 1, threshold = 5d,
      filter = col("id") <= 2)
    assert(got == exp)
    assert(got._4 == 5d)
  }

  test("booleanPerceptron: maxTrainDocs bounds the sequential collect loudly") {
    import spark.implicits._
    val df = spark.createDataset(percDocs).toDF("id", "text", "cls")
    val e = intercept[IllegalArgumentException] {
      Classify.booleanPerceptron(df, "text", "cls", "id",
        Analysis.simpleTokens, "a", maxTrainDocs = 1)
    }
    assert(e.getMessage.contains("maxTrainDocs"))
  }
}
