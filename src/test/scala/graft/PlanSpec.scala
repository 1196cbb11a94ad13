package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Corpus
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig

/** Physical-plan assertions: the scans and joins must look the way a
  * 100 TB deployment needs them to (pushdown, pruning, broadcast,
  * whole-stage codegen) — `.explain` is part of the contract.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val tmp = java.nio.file.Files.createTempDirectory("graft-plan").toString

  lazy val indexDir: String = {
    import spark.implicits._
    val ix = IndexBuilder.buildLogical(
      spark.createDataset(Corpus.generate(300, 17L)).toDF(),
      "content", None, Seq("repo", "path", "commit"),
      BuildConfig(numBuckets = 8, numDocShards = 4))
    IndexBuilder.writeIndex(ix, s"$tmp/ix", "p1", 1)
    ix.postings.unpersist()
    s"$tmp/ix"
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** numFiles metric of the (executed) file scan — counts files actually
    * selected after partition pruning, unlike `inputFiles`.
    */
  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectWithSubqueries {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    scans.map(_.metrics("numFiles").value).sum
  }

  test("segment read is bucket-partition-pruned with term pushdown") {
    val m = IndexBuilder.readManifest(indexDir).get
    val b = IndexBuilder.bucketOf("index", m.numBuckets)
    val df = spark.read
      .option("basePath", s"$indexDir/segments")
      .parquet(s"$indexDir/segments/grp=0")
      .filter(col("bucket") === b && col("term") === "index")
    val plan = planOf(df)
    // predicate reaches the parquet scan
    assert(plan.contains("PushedFilters") &&
      plan.contains("IsNotNull(term)"), s"no term pushdown:\n$plan")
    // bucket is a partition column → pruned, not a data filter
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("bucket"), s"no partition pruning:\n$plan")
    // only the one bucket directory's files are actually read
    val allBuckets = spark.read
      .option("basePath", s"$indexDir/segments")
      .parquet(s"$indexDir/segments/grp=0")
    assert(filesRead(df) < filesRead(allBuckets),
      s"pruned read (${filesRead(df)}) not smaller than full (${filesRead(allBuckets)})")
  }

  test("termstats lookup reads only the query terms' buckets") {
    val m = IndexBuilder.readManifest(indexDir).get
    val terms = Set("index", "merge")
    val buckets = terms.map(t => IndexBuilder.bucketOf(t, m.numBuckets))
    val pruned = spark.read.parquet(s"$indexDir/termstats")
      .filter(col("bucket").isin(buckets.toSeq: _*) &&
        col("term").isin(terms.toSeq: _*))
    val full = spark.read.parquet(s"$indexDir/termstats")
    assert(filesRead(pruned) < filesRead(full),
      s"stats read not pruned: ${filesRead(pruned)} vs ${filesRead(full)}")
  }

  test("small-dimension join broadcasts (q_join_hash plan)") {
    val df = gate.RelationalGate.queries("q_join_hash")(spark, "/root/testdata/sf0.001")
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("filter + projection reach the lineitem parquet scan") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_quantity") > 49)
      .select("l_orderkey", "l_quantity")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(l_quantity"), s"no pushdown:\n$plan")
    assert(plan.contains("ReadSchema") &&
      !plan.replaceAll("(?s).*ReadSchema: ([^\\n]*).*", "$1").contains("l_tax"),
      s"column pruning failed:\n$plan")
  }

  test("whole-stage codegen covers the scoring aggregation") {
    import spark.implicits._
    val ix = IndexBuilder.buildLogical(
      spark.createDataset(Corpus.generate(50, 2L)).toDF(),
      "content", None, Seq("repo", "path", "commit"))
    val scored = graft.search.DataFrameSearcher.search(ix,
      graft.search.Query.or(graft.search.TermQ("def"), graft.search.TermQ("val")), 5)
    scored.collect() // AQE reveals the final plan only after execution
    val plan = scored.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen spans in the final AQE plan
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"),
      s"no codegen spans:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k not TakeOrderedAndProject:\n$plan")
  }

  test("suggest: scaled-Levenshtein ranking, dict path == distributed path") {
    import graft.search._
    val ixh = SegmentSearcher.load(indexDir)
    val local = new Searcher(spark, ixh)
    val got = local.suggest("mrge", 5).toSeq
    assert(got.nonEmpty && got.head._1 == "merge", s"got $got")
    // every suggestion obeys the law: 2-edit neighborhood, not the query
    // term, score = 1f - d/min(len) in floats, (score, df, term) ranking
    got.foreach { case (t, s, df) =>
      assert(t != "mrge" && df >= 1)
      val d = {
        val dp = Array.ofDim[Int](t.length + 1, 5)
        for (i <- 0 to t.length) dp(i)(0) = i
        for (j <- 0 to 4) dp(0)(j) = j
        for (i <- 1 to t.length; j <- 1 to 4) {
          val c = if (t.charAt(i - 1) == "mrge".charAt(j - 1)) 0 else 1
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + c)
        }
        dp(t.length)(4)
      }
      assert(d <= 2 && s == 1.0f - d.toFloat / math.min(4, t.length).toFloat)
    }
    assert(got == got.sortWith { case ((ta, sa, dfa), (tb, sb, dfb)) =>
      if (sa != sb) sa > sb else if (dfa != dfb) dfa > dfb else ta < tb })
    // beyond-driver candidate generation produces identical suggestions
    sys.props("graft.search.maxDictTerms") = "0"
    val viaDisk =
      try new Searcher(spark, ixh).suggest("mrge", 5).toSeq
      finally sys.props.remove("graft.search.maxDictTerms")
    assert(viaDisk == got, s"distributed suggest diverged:\n$viaDisk\nvs\n$got")
  }

  test("termdict: over-cap multi-term expansion matches dict path and prunes partitions") {
    import graft.search._
    val ixh = SegmentSearcher.load(indexDir)
    def results(s: Searcher): Map[String, Seq[(Long, Double)]] = Map(
      "prefix" -> s.search(PrefixQ("par"), 10).toSeq.map(h => (h.docId, h.score)),
      "wildcard" -> s.search(WildcardQ("m*e"), 10).toSeq.map(h => (h.docId, h.score)),
      "regexp" -> s.search(RegexpQ("ind.x"), 10).toSeq.map(h => (h.docId, h.score)),
      "fuzzy" -> s.search(FuzzyQ("merge", 1), 10).toSeq.map(h => (h.docId, h.score)),
      "fuzzy2" -> s.search(FuzzyQ("mrge", 2), 10).toSeq.map(h => (h.docId, h.score)),
      "range" -> s.search(TermRangeQ("index", "merge", true, true), 10)
        .toSeq.map(h => (h.docId, h.score)),
      // scored rewrites: first-N selection + real disjunction scoring
      "prefix_scored" -> s.search(MultiTermScoredQ(PrefixQ("m"), 3), 10)
        .toSeq.map(h => (h.docId, h.score)),
      "prefix_blended" ->
        s.search(MultiTermScoredQ(PrefixQ("m"), 3, blended = true), 10)
          .toSeq.map(h => (h.docId, h.score)))
    val viaDict = results(new Searcher(spark, ixh))
    // force the beyond-driver path: dictionary never fits
    sys.props("graft.search.maxDictTerms") = "0"
    val viaDisk =
      try results(new Searcher(spark, ixh))
      finally sys.props.remove("graft.search.maxDictTerms")
    assert(viaDict("prefix").nonEmpty && viaDict("wildcard").nonEmpty &&
      viaDict("fuzzy").nonEmpty && viaDict("prefix_scored").nonEmpty,
      s"fixture produced no hits: $viaDict")
    assert(viaDisk == viaDict, s"over-cap expansion diverged:\n$viaDisk\nvs\n$viaDict")

    // prefix-completion suggest: dict path == the pruned distributed
    // df-desc ranking, and the scored rewrite actually SCORES (different
    // result than the const-score form on a multi-term prefix)
    locally {
      val sDict = new Searcher(spark, ixh)
      val dictSugg = sDict.suggestPrefix("m", 4).toSeq
      sys.props("graft.search.maxDictTerms") = "0"
      val diskSugg =
        try new Searcher(spark, ixh).suggestPrefix("m", 4).toSeq
        finally sys.props.remove("graft.search.maxDictTerms")
      assert(dictSugg.nonEmpty && dictSugg == diskSugg,
        s"suggestPrefix diverged:\n$diskSugg\nvs\n$dictSugg")
      assert(dictSugg == dictSugg.sortWith { case ((ta, da), (tb, db)) =>
        if (da != db) da > db else ta < tb })
      val scored = sDict.search(MultiTermScoredQ(PrefixQ("m"), 3), 10)
      val const = sDict.search(PrefixQ("m"), 10)
      assert(scored.map(_.score).toSet != const.map(_.score).toSet,
        "scored rewrite should produce real (non-constant) scores")
    }

    // the distributed dict scan must be partition-pruned by the
    // (hex-encoded, order-preserving) first-code-unit key
    val dict = spark.read.parquet(s"$indexDir/termdict")
    val pruned = dict.filter(
      col("pfx") === graft.index.IndexBuilder.termPfx("p") &&
        col("term").startsWith("par"))
    assert(pruned.count() > 0, "pfx key must address the live partition")
    assert(filesRead(pruned) < filesRead(dict),
      s"termdict scan not pruned: ${filesRead(pruned)} vs ${filesRead(dict)}")
    // and the term predicate still reaches the parquet scan
    val plan = planOf(dict.filter(col("term").startsWith("par")))
    assert(plan.contains("PushedFilters") && plan.contains("StringStartsWith"),
      s"prefix not pushed:\n$plan")
  }
}
