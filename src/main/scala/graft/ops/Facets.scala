package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Faceted drill-down / drill-sideways over attribute columns — the
  * `lucene/facet` DrillSideways surface
  * (`facet/DrillSideways.java:136-214`, `DrillSidewaysQuery.java:34`,
  * `DrillSidewaysScorer.java:45`) re-expressed as ONE declarative pass:
  *
  * The reference's DrillSidewaysScorer walks base-query matches once and
  * classifies each doc by how many drill dimensions it fails — 0 misses =
  * a drill-down hit (counts in every facet + the hit collector), exactly
  * 1 miss = a "near miss" that counts ONLY in the missed dimension's
  * sideways facet (so the UI can show sibling values of a filtered dim as
  * if that dim weren't filtered). Equivalently: dim i's sideways facet
  * counts docs matching the base query and every OTHER drill dim.
  *
  * Spark shape: one filter + per-row contribution array + explode +
  * groupBy(facet, value) — a single scan and a single shuffle for ALL
  * facets regardless of dimension count; no per-dim re-query (the
  * reference pays one DrillSidewaysQuery; the naive formulation would pay
  * N+1 queries). Filters and the pruned column set reach the parquet
  * scan; counts are map-side partial-aggregated.
  */
object Facets {

  /** Drill-down selections: (dim column, values OR'd within the dim) —
    * DrillDownQuery.add (`facet/DrillDownQuery.java:122-135`).
    */
  final case class Drill(dims: Seq[(String, Seq[String])]) {
    require(dims.map(_._1).distinct.size == dims.size, "duplicate drill dim")
  }

  /** Returns (facetCounts, drillDownHits):
    *  - facetCounts: (facet, value, cnt) — for each facet dim, sideways
    *    counts when the dim is drilled, plain drill-down counts when not
    *    (`DrillSideways.buildFacetsResult`: un-drilled dims facet over
    *    the drill-down set);
    *  - drillDownHits: the rows matching base + ALL drill dims.
    * Facet rows are ordered (facet asc, cnt desc, value asc) — the
    * reference's count-desc-then-label tie-break per facet.
    */
  def drillSideways(docs: DataFrame, base: Column, drill: Drill,
      facetDims: Seq[String]): (DataFrame, DataFrame) = {
    val dimOk: Map[String, Column] =
      drill.dims.map { case (c, vals) => c -> col(c).isin(vals: _*) }.toMap
    val missed = drill.dims
      .map { case (c, _) => when(dimOk(c), 0).otherwise(1) }
      .reduceOption(_ + _).getOrElse(lit(0))

    // near-miss cap: only docs missing <= 1 dims contribute anywhere
    val ann = docs.filter(base).withColumn("_missed", missed)
      .filter(col("_missed") <= 1)

    // per-row facet contributions: drilled dim i counts when every OTHER
    // dim matches; an un-drilled facet dim counts on drill-down hits only
    val contribs = facetDims.map { fd =>
      val eligible =
        if (dimOk.contains(fd)) {
          val others = drill.dims.collect {
            case (c, _) if c != fd => dimOk(c)
          }
          others.reduceOption(_ && _).getOrElse(lit(true))
        } else col("_missed") === 0
      when(eligible,
        struct(lit(fd).as("facet"), col(fd).cast("string").as("value")))
        .otherwise(lit(null))
    }
    val facetCounts = ann
      .select(explode(array(contribs: _*)).as("c"))
      .filter(col("c").isNotNull)
      .groupBy(col("c.facet").as("facet"), col("c.value").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("facet").asc, col("cnt").desc, col("value").asc)

    val hits = ann.filter(col("_missed") === 0).drop("_missed")
    (facetCounts, hits)
  }
}
