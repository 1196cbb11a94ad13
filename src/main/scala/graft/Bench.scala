package graft

import org.apache.spark.sql.SparkSession
import graft.core.Corpus
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig
import graft.search._

/** Benchmark main (BASELINE.md metrics):
  *  - index-build docs/sec on the deterministic synthetic corpus
  *    (FIXTURES.md §1), at two parallelism levels — local[N] vs local[4N]
  *    stands in for N vs 4N executors (no real cluster in this sandbox)
  *  - top-k BM25 QPS on the reference query set over the built index,
  *    at both levels
  *  - scaling efficiency = (throughput@4N / throughput@N) / 4
  *  - per-gate-query seconds on the sf dir's documents table
  *
  * Prints ONE JSON line.
  */
object Bench {

  val BenchDocs: Long =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toLong

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  /** Full build: synthetic corpus → logical index → committed segments. */
  private def buildIndex(spark: SparkSession, dir: String, cpus: Int): Double = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val corpus = Corpus.distributed(spark, BenchDocs, seed = 42L,
      partitions = cpus * 2)
    val cfg = BuildConfig(numBuckets = 32, numDocShards = 8,
      saltThreshold = BenchDocs / 4, tokenizer = "simple")
    val ix = IndexBuilder.buildLogical(corpus.toDF(), "content", None,
      Seq("repo", "path", "commit"), cfg)
    val (t, _) = time {
      IndexBuilder.writeIndex(ix, dir, "bench", numGroups = 1)
    }
    t
  }

  /** Reference query set over the synthetic corpus vocabulary
    * (FIXTURES.md §4: common/rare/absent terms, AND, OR, msm, hot terms,
    * k ∈ {1,10,100}).
    */
  private def referenceQueries: Seq[(String, Query, Int)] = Seq(
    ("term_hot_k10", TermQ("def"), 10),
    ("term_hot_k100", TermQ("def"), 100),
    ("term_hot_k1", TermQ("index"), 1),
    ("term_mid_k10", TermQ("partition"), 10),
    ("term_rare_k10", TermQ("getblockwriter"), 10),
    ("term_absent", TermQ("zzzabsent"), 10),
    ("and2", Query.and(TermQ("index"), TermQ("merge")), 10),
    ("and3", Query.and(TermQ("def"), TermQ("val"), TermQ("score")), 10),
    ("or2", Query.or(TermQ("spark"), TermQ("lucene")), 10),
    ("or3_msm2", Query.orMin(2, TermQ("spark"), TermQ("lucene"), TermQ("segment")), 10),
    ("or_hot", Query.or(TermQ("def"), TermQ("class")), 10),
    ("not", Query.not(TermQ("index"), TermQ("spark")), 10))

  /** One pass over the query set; returns seconds. */
  private def querySet(spark: SparkSession,
      six: SegmentSearcher.SegmentIndex): Double = {
    val (t, _) = time {
      referenceQueries.foreach { case (_, q, k) =>
        SegmentSearcher.search(spark, six, q, k)
      }
    }
    t
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val hi = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val lo = math.max(1, hi / 4)
    val tmp = sys.props("java.io.tmpdir")

    // ---- level N (= hi/4 cores) ----
    val sLo = session(lo)
    val tBuildLo = buildIndex(sLo, s"$tmp/graft-bench-lo", lo)
    val sixLo = SegmentSearcher.load(s"$tmp/graft-bench-lo")
    querySet(sLo, sixLo) // warm
    val tQueryLo = (1 to 3).map(_ => querySet(sLo, sixLo)).min
    sLo.stop()

    // ---- level 4N ----
    val sHi = session(hi)
    val tBuildHi = buildIndex(sHi, s"$tmp/graft-bench-hi", hi)
    val sixHi = SegmentSearcher.load(s"$tmp/graft-bench-hi")
    querySet(sHi, sixHi) // warm
    val tQueryHi = (1 to 3).map(_ => querySet(sHi, sixHi)).min

    // ---- per-gate-query timings on the sf dir (warm index) ----
    gate.SearchGate.clearCaches()
    val gateQs = gate.SearchGate.queries.toSeq.sortBy(_._1)
    gateQs.foreach { case (_, fn) => fn(sHi, sfDir).count() } // warm + build
    val perQuery = gateQs.map { case (name, fn) =>
      val (t, _) = time(fn(sHi, sfDir).count())
      name -> t
    }
    sHi.stop()

    val buildThrLo = BenchDocs / tBuildLo
    val buildThrHi = BenchDocs / tBuildHi
    val qps = referenceQueries.size
    val queryThrLo = qps / tQueryLo
    val queryThrHi = qps / tQueryHi
    val effBuild = (buildThrHi / buildThrLo) / (hi.toDouble / lo)
    val effQuery = (queryThrHi / queryThrLo) / (hi.toDouble / lo)

    val qJson = perQuery.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val total = perQuery.map(_._2).sum + tBuildHi + tQueryHi
    def f(d: Double) = f"$d%.4f".toDouble
    println(
      s"""{"metric":"bench_total","value":${f(total)},"unit":"sec","queries":$qJson,"sf":"$sfDir"""" +
      s""","build":{"docs":$BenchDocs,"cores_n":$lo,"cores_4n":$hi""" +
      s""","docs_per_sec_n":${f(buildThrLo)},"docs_per_sec_4n":${f(buildThrHi)}""" +
      s""","seconds_n":${f(tBuildLo)},"seconds_4n":${f(tBuildHi)}""" +
      s""","scaling_efficiency":${f(effBuild)}}""" +
      s""","query":{"set_size":$qps,"qps_n":${f(queryThrLo)},"qps_4n":${f(queryThrHi)}""" +
      s""","seconds_n":${f(tQueryLo)},"seconds_4n":${f(tQueryHi)}""" +
      s""","scaling_efficiency":${f(effQuery)}}}""")
  }
}
