package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph traversal operators over edge tables (src, dst). */
object Graph {

  /** BFS shortest path — the ShortestPathStream analog
    * (`solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/ShortestPathStream.java:60`)
    * as iterative frontier joins (Pregel-lite): each round is ONE hash
    * join frontier⋈edges, an anti-join against the visited set, and a
    * min-path aggregate per node — no part of the graph is ever collected
    * to the driver, so the shape holds at billions of edges.
    *
    * Returns one row per hop (step, node) of the canonical shortest path
    * from `src` to `dst` (empty when unreachable within maxDepth).
    * Canonical = lexicographically smallest '/'-joined path string; the
    * per-level per-node min-path reduction preserves the global minimum
    * because '/' (0x2f) sorts below every alphanumeric, so a smaller
    * prefix stays smaller under any common suffix.
    */
  def shortestPath(edges: DataFrame, src: String, dst: String,
      maxDepth: Int = 6): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst")).persist()
    var frontier = Seq((src, src)).toDF("node", "path")
    var visited = Seq(src).toDF("node")
    // persisted frames superseded each level — released as we go (a deep
    // traversal must not accumulate cached blocks for the session's life)
    var livePersists: List[DataFrame] = Nil
    var result: Option[String] = None
    var depth = 0
    try {
      while (result.isEmpty && depth < maxDepth) {
        // name-based join keys: the frontier descends from `e`, so
        // attribute-reference conditions would be ambiguous self-joins
        val f = frontier.select(col("node").as("_fnode"), col("path"))
        val next = f.join(e, col("_fnode") === col("src"))
          .select(col("dst").as("node"),
            concat(col("path"), lit("/"), col("dst")).as("path"))
          .join(visited.select(col("node").as("_vnode")),
            col("node") === col("_vnode"), "left_anti")
          .groupBy("node").agg(min("path").as("path"))
          .persist()
        val hit = next.filter(col("node") === dst).select("path").collect()
        if (hit.nonEmpty) { next.unpersist(); result = Some(hit(0).getString(0)) }
        else if (next.isEmpty) { next.unpersist(); depth = maxDepth }
        else {
          val newVisited = visited.unionByName(next.select("node")).persist()
          newVisited.count() // materialize before dropping the inputs
          livePersists.foreach(_.unpersist())
          livePersists = List(next, newVisited)
          visited = newVisited
          frontier = next
          depth += 1
        }
      }
    } finally {
      e.unpersist()
      livePersists.foreach(_.unpersist())
    }
    result match {
      case Some(p) =>
        p.split("/").zipWithIndex
          .map { case (n, i) => (i, n) }.toSeq.toDF("step", "node")
      case None =>
        spark.emptyDataset[(Int, String)].toDF("step", "node")
    }
  }
}
