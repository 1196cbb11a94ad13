package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named gate queries to files —
  * the plans/r06 before/after evidence. Usage:
  *   runMain graft.tools.ExplainDump <outDir> <name1,name2,...>
  * Each query's gate function runs once (warm — driver-side engine work
  * executes, caches fill), then the RETURNED DataFrame's formatted plan
  * is written to <outDir>/<name>.txt.
  */
object ExplainDump {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainDump <outDir> <names-csv>")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val names = args(1).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", (cpus * 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.gate.SearchGate.clearCaches()
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm: caches fill, engine work runs
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // the frozen bench times fn(...).count() — show the plan that
      // count() actually executes too
      val countPlan = df.groupBy().count().queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(new java.io.File(outDir, s"$n.txt"))
      w.println("==== returned DataFrame ====")
      w.println(plan)
      w.println("==== count() plan (what the bench times) ====")
      w.println(countPlan)
      w.close()
      System.err.println(s"[explain] wrote $n")
    }
    spark.stop()
  }
}
