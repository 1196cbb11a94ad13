package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot physical-plan audit of the session's new operators — run
  * manually (`runMain graft.tools.PlanAudit`); findings recorded in
  * BENCH/BASELINE.md.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    // 1. joinScored plan: broadcast of folded join values?
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ix = graft.gate.SearchGate.logical(spark, sf)
    val sc = graft.search.DataFrameSearcher.scores(ix, graft.search.TermQ("spark"))
    val j = graft.ops.Join.joinScored(docs, sc, "source", "source", "avg", 10)
    println("=== joinScored ===")
    println(j.queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("Broadcast") || l.contains("Exchange") || l.contains("Scan")).mkString("\n"))
    // 2. percolate: shuffle-free single pass?
    val qs = Seq(graft.ops.Percolator.PQuery(1, graft.search.TermQ("spark")))
    val p = graft.ops.Percolator.percolate(docs, "text", "doc_id", qs)
    println("=== percolate ===")
    println(p.queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("Exchange") || l.contains("Scan") || l.contains("Generate")).mkString("\n"))
    // 3. taxo facet: single shuffle?
    val tf = docs.select(explode(array(col("lang"),
      concat_ws("/", col("lang"), col("source")))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
    println("=== taxo facet ===")
    println(tf.queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("Exchange") || l.contains("HashAggregate") || l.contains("Scan")).mkString("\n"))
    // 4. RTG: pruned read (isin pushdown)?
    graft.gate.SearchGate.rtgIndex(spark, sf)
    val rtg = graft.streaming.StreamingIndex.realTimeGet(spark,
      graft.gate.SearchGate.rtgIndex(spark, sf), Seq(0L, 7L))
    println("=== realTimeGet ===")
    println(rtg.queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("PushedFilters") || l.contains("Exchange") || l.contains("Scan parquet")).mkString("\n").take(1500))
    spark.stop()
  }
}
