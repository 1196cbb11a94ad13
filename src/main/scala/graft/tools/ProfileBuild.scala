package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Corpus
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig

/** Stage-by-stage build profiler (dev tool). */
object ProfileBuild {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    a
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", sys.props("java.io.tmpdir")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = Corpus.distributed(spark, n, 42L, cpus * 2).toDF().persist()
    t("corpus materialize")(corpus.count())

    val cfg = BuildConfig(numBuckets = 32, numDocShards = 8,
      saltThreshold = n / 4)
    val dir = s"${sys.props("java.io.tmpdir")}/graft-profile-ix"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))

    val ix = t("buildLogical (stats jobs)") {
      IndexBuilder.buildLogical(corpus, "content", None,
        Seq("repo", "path", "commit"), cfg)
    }
    t("postings count (cached)") {
      println(s"[profile]   postings rows = ${ix.postings.count()}")
    }
    t("writeIndex (docs+stats+segments+lineage)") {
      IndexBuilder.writeIndex(ix, dir, "profile", numGroups = 1, verbose = true)
    }
    ix.unpersistCached()
    spark.stop()
  }
}
