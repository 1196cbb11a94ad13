package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query registry is assembled from per-area gates under graft.gate.
  */
object SparkEntry {

  /** Flagship: BM25 top-k over the documents table via the full segment
    * engine (build → encoded blobs → sharded scorer → merge).
    */
  def entry(spark: SparkSession): DataFrame =
    gate.SearchGate.queries("q_bm25_term_common")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    gate.SearchGate.queries ++ gate.RelationalGate.queries ++
      gate.OpsGate.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    gate.SearchGate.oracleSql ++ gate.RelationalGate.oracleSql ++
      gate.OpsGate.oracleSql
}
