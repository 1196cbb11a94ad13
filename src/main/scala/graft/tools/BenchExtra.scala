package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Optimization-round side harness (guide §1): times the SAME gate
  * queries the frozen `graft.Bench` gate section times, with the same
  * session config and warm/timed methodology, but
  *  - runs a filtered subset (arg 1 = comma-separated prefixes) for fast
  *    iteration,
  *  - counts Spark jobs triggered per timed query (overhead diagnosis),
  *  - optionally repeats the timed pass (arg 2 = reps, default 1) and
  *    reports the min.
  * Never used for the official numbers — those stay in Bench.scala.
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.local.dir", graft.Bench.benchTmp)
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_PARQUET_CODEC", "snappy"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = f
    ((System.nanoTime() - t0) / 1e9, a)
  }

  /** Attribute jobs of one query: prints each job's callsite + stages. */
  private def debugQuery(spark: SparkSession, sfDir: String,
      name: String): Unit = {
    val fn = graft.gate.SearchGate.queries(name)
    fn(spark, sfDir).count() // warm
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        System.err.println(s"[job ${js.jobId}] stages=${js.stageInfos.size} " +
          js.stageInfos.map(si => s"${si.name}(${si.numTasks}t)").mkString(" | "))
      }
    })
    (1 to 3).foreach { i =>
      System.err.println(s"--- timed run $i: $name")
      val (t, _) = time(fn(spark, sfDir).count())
      Thread.sleep(200) // let listener drain
      System.err.println(f"--- $name run $i: ${t * 1000}%.1f ms")
    }
  }

  /** Floor: cost of materializing + counting a tiny local DataFrame. */
  private def floor(spark: SparkSession): Unit = {
    import spark.implicits._
    def batch(tag: String): Unit = {
      var tPlain = Double.MaxValue; var tCo = Double.MaxValue
      (1 to 150).foreach { _ =>
        val (t1, _) = time {
          Seq((1L, 1.0, 1)).toDF("doc_id", "score", "rnk").count()
        }
        val (t3, _) = time {
          Seq((1L, 1.0, 1)).toDF("doc_id", "score", "rnk").coalesce(1).count()
        }
        tPlain = math.min(tPlain, t1); tCo = math.min(tCo, t3)
      }
      System.err.println(f"[floor $tag] plain-count=${tPlain * 1000}%.1f ms coalesce1-count=${tCo * 1000}%.1f ms (min of 150)")
    }
    locally {
      val rdd = spark.sparkContext.parallelize(Seq(1), 1)
      var tR = Double.MaxValue
      (1 to 150).foreach { _ =>
        val (t, _) = time(rdd.count()); tR = math.min(tR, t)
      }
      System.err.println(f"[floor bare-rdd-job] ${tR * 1000}%.1f ms (min of 150)")
    }
    batch("default")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    batch("aqe-off")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    batch("aqe-off+codegen-off")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    batch("codegen-off")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    batch("shufpart1")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
  }

  /** Build-phase timeline: run the bench build once at `cpus` cores and
    * print every job's (start, dur, desc) plus the total driver "gap"
    * time not covered by any running job — the serial component that
    * divides straight into the scaling-efficiency headline.
    */
  private def buildProfile(cpus: Int): Unit = {
    import graft.index.IndexBuilder
    import graft.index.IndexBuilder.BuildConfig
    val docs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "150000").toLong
    val spark = session(cpus)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val spans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Long, Long, String)]())
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description"))
            .getOrElse(js.stageInfos.headOption.map(_.name).getOrElse("?")
              .take(60))))
        ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val v = jobs.remove(je.jobId)
        if (v != null) { spans.add((v._1, System.nanoTime(), v._2)); () }
      }
    })
    val dir = s"${graft.Bench.benchTmp}/graft-profile-build"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val corpus = graft.core.Corpus.distributed(spark, docs, seed = 42L,
      partitions = cpus * 4)
    val cfg = BuildConfig(numBuckets = 32, numDocShards = 8,
      saltThreshold = docs / 4, tokenizer = "simple")
    val t0 = System.nanoTime()
    val ix = IndexBuilder.buildLogical(corpus.toDF(), "content", None,
      Seq("repo", "path", "commit"), cfg)
    val t1 = System.nanoTime()
    IndexBuilder.writeIndex(ix, dir, "profile", numGroups = 1)
    val t2 = System.nanoTime()
    Thread.sleep(500)
    val all = scala.jdk.CollectionConverters.ListHasAsScala(spans).asScala
      .sortBy(_._1).toSeq
    def ms(n: Long) = (n - t0) / 1e6
    all.foreach { case (s, e, d) =>
      System.err.println(f"[job] ${ms(s)}%8.0f..${ms(e)}%8.0f (${(e - s) / 1e6}%6.0f ms) $d")
    }
    // merge spans, compute uncovered time in [t0, t2]
    var cover = 0L
    var cur = t0
    all.foreach { case (s, e, _) =>
      val s2 = math.max(s, cur)
      if (e > s2) { cover += e - s2; cur = e } else ()
      if (s > cur) () // gap counted implicitly
    }
    // recompute properly: gaps
    var gaps = 0L
    cur = t0
    all.foreach { case (s, e, _) =>
      if (s > cur) gaps += s - cur
      cur = math.max(cur, e)
    }
    if (t2 > cur) gaps += t2 - cur
    System.err.println(f"[buildprofile] cpus=$cpus docs=$docs logical=${(t1 - t0) / 1e9}%.2fs write=${(t2 - t1) / 1e9}%.2fs total=${(t2 - t0) / 1e9}%.2fs jobs=${all.size} gapNoJob=${gaps / 1e9}%.2fs")
    ix.unpersistCached(); ix.postings.unpersist()
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    if (args.length >= 1 && args(0) == "build") {
      buildProfile(if (args.length >= 2) args(1).toInt else cpus); return
    }
    if (args.length >= 1 && args(0) == "floor") {
      val sp = session(cpus); floor(sp); sp.stop(); return
    }
    if (args.length >= 2 && args(0) == "jobs") {
      val sp = session(cpus)
      graft.gate.SearchGate.clearCaches()
      debugQuery(sp, sfDir, args(1)); sp.stop(); return
    }
    val prefixes: Seq[String] =
      if (args.length >= 1 && args(0).nonEmpty && args(0) != "all")
        args(0).split(",").toSeq
      else Nil
    val reps = if (args.length >= 2) args(1).toInt else 1

    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val spark = session(cpus)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })

    graft.gate.SearchGate.clearCaches()
    val registry =
      if (sys.env.get("GRAFT_EXTRA_REGISTRY").contains("entry"))
        graft.SparkEntry.queries
      else graft.gate.SearchGate.queries
    val all = registry.toSeq.sortBy(_._1)
    val gateQs =
      if (prefixes.isEmpty) all
      else all.filter { case (n, _) => prefixes.exists(n.startsWith) }
    System.err.println(s"[extra] ${gateQs.size} queries, sf=$sfDir, cpus=$cpus")

    val (tWarm, _) = time { gateQs.foreach { case (_, fn) => fn(spark, sfDir).count() } }
    System.err.println(f"[extra] warm pass: $tWarm%.1fs")

    val results = gateQs.map { case (name, fn) =>
      val samples = (1 to reps).map { _ =>
        val j0 = jobs.get()
        val (t, _) = time(fn(spark, sfDir).count())
        (t, jobs.get() - j0)
      }
      val best = samples.minBy(_._1)
      (name, best._1, best._2)
    }
    val total = results.map(_._2).sum
    println(f"""{"extra_total":$total%.3f,"n":${results.size}}""")
    results.sortBy(-_._2).foreach { case (n, t, j) =>
      println(f"$n%-28s ${t * 1000}%9.1f ms  jobs=$j")
    }
    spark.stop()
  }
}
