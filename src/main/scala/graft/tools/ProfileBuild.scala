package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.core.Corpus
import graft.index.IndexBuilder
import graft.index.IndexBuilder.BuildConfig

/** Stage-by-stage build profiler (dev tool).
  *
  * Mirrors the bench's build phase exactly (warm-up build, no corpus
  * persist) and adds a job-level listener: per job, wall seconds vs the
  * SUM of task run times vs the SUM of executor CPU times. wall >>
  * taskSum/cores ⇒ driver-serial gaps (scheduling, codegen, commit);
  * cpuSum << taskSum ⇒ tasks blocked (I/O, GC, memory stalls).
  */
object ProfileBuild {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    a
  }

  final class JobMetrics extends SparkListener {
    case class J(name: String, start: Long, var end: Long = 0L,
        var taskNanos: Long = 0L, var cpuNanos: Long = 0L, var tasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    private val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val desc = Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(js.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("?")
      jobs.put(js.jobId, J(desc, js.time))
      js.stageIds.foreach(s => stageToJob.put(s, js.jobId))
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      val j = jobs.get(je.jobId); if (j != null) j.end = je.time
    }
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val jid = stageToJob.get(te.stageId)
      val j = jobs.get(jid)
      if (j != null && te.taskMetrics != null) j.synchronized {
        j.taskNanos += te.taskMetrics.executorRunTime * 1000000L
        j.cpuNanos += te.taskMetrics.executorCpuTime
        j.tasks += 1
      }
    }
    def dump(cores: Int): Unit = {
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      println(f"[profile] ${"jobId"}%-5s ${"wall_s"}%7s ${"task_s"}%8s ${"cpu_s"}%8s ${"task/($cores*wall)"}%10s tasks  site")
      js.foreach { case (id, j) =>
        val wall = (j.end - j.start) / 1e3
        val task = j.taskNanos / 1e9
        val cpu = j.cpuNanos / 1e9
        val util = if (wall > 0) task / (cores * wall) else 0.0
        println(f"[profile] $id%-5d $wall%7.2f $task%8.2f $cpu%8.2f $util%10.2f ${j.tasks}%5d  ${j.name.take(70)}")
      }
      val firstStart = js.map(_._2.start).min
      val lastEnd = js.map(_._2.end).max
      val jobWall = js.map(j => (j._2.end - j._2.start) / 1e3).sum
      println(f"[profile] span=${(lastEnd - firstStart) / 1e3}%.2fs sumJobWall=$jobWall%.2fs (overlap if <span; gaps if span exceeds)")
      jobs.clear()
    }
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", sys.props("java.io.tmpdir")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new JobMetrics
    spark.sparkContext.addSparkListener(listener)

    val tmp = sys.props("java.io.tmpdir")
    val cfg = BuildConfig(numBuckets = 32, numDocShards = 8,
      saltThreshold = n / 4, tokenizer = "simple")

    // untimed warm-up: JIT + codegen + committer init, exactly like Bench
    {
      val warm = Corpus.distributed(spark, math.min(n / 4, 150000L), 7L, cpus * 2)
      val wix = IndexBuilder.buildLogical(warm.toDF(), "content", None,
        Seq("repo", "path", "commit"), cfg)
      IndexBuilder.writeIndex(wix, s"$tmp/graft-profile-warm", "warm", 1)
      wix.unpersistCached(); wix.postings.unpersist()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$tmp/graft-profile-warm"))
      listener.jobs.clear()
      System.gc()
    }
    println(s"[profile] === warm-up done, timed run: docs=$n cpus=$cpus ===")

    val corpus = Corpus.distributed(spark, n, 42L, cpus * 4)
    val dir = s"$tmp/graft-profile-ix"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))

    val ix = t("buildLogical (stats jobs)") {
      IndexBuilder.buildLogical(corpus.toDF(), "content", None,
        Seq("repo", "path", "commit"), cfg)
    }
    t("writeIndex (docs+stats+segments+lineage)") {
      IndexBuilder.writeIndex(ix, dir, "profile", numGroups = 1, verbose = true)
    }
    listener.dump(cpus)
    ix.unpersistCached()
    ix.postings.unpersist()
    spark.stop()
  }
}
