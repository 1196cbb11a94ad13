package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-time joining (lucene/join `JoinUtil.createJoinQuery` +
  * `ScoreMode`, single-value fields — JoinUtil.java:92,
  * ScoreMode.java:22): documents matching the from-query are grouped by
  * their from-field value, each group's scores fold to ONE float per join
  * value, and every to-side document carrying that value scores the
  * folded float.
  *
  * Fold laws replicate `TermsWithScoreCollector.SV`
  * (TermsWithScoreCollector.java:114-178): Total is a float `+=` in
  * doc-visit (doc_id ascending) order; Min/Max are float compares; Avg is
  * the ordered float sum divided by the int count (float division, applied
  * once at the end); None computes no scores — matching to-docs get the
  * constant 1 (the TermsQuery rewrite).
  *
  * Spark shape: the from side stays a distributed scored match set; the
  * ordered fold is `aggregate` over a doc_id-sorted struct array per join
  * value (no driver collect); the folded per-value scores are few by
  * construction (≤ distinct join values) and broadcast to the to side.
  */
object Join {

  /** @param docs   table carrying doc_id + the join fields
    * @param scores full from-query match set: (docId, score float)
    * @param mode   one of none|avg|max|total|min
    */
  def joinScored(docs: DataFrame, scores: DataFrame, fromField: String,
      toField: String, mode: String, k: Int): DataFrame = {
    val from = scores
      .select(col("docId"), col("score").cast("float").as("score"))
      .join(docs.select(col("doc_id").as("docId"),
        col(fromField).as("jv")), Seq("docId"))

    val folded: DataFrame =
      if (mode == "none") from.select("jv").distinct()
        .withColumn("jscore", lit(1f))
      else {
        // doc_id-ordered float fold (the collector visits docs in id order)
        val lst = sort_array(collect_list(struct(col("docId"), col("score"))))
        val fsum = aggregate(lst, lit(0f),
          (acc, x) => (acc + x.getField("score")).cast("float"))
        val fold: Column = mode match {
          case "max"   => max("score")
          case "min"   => min("score")
          case "total" => fsum
          case "avg"   => (fsum / count(lit(1)).cast("float")).cast("float")
          case other   => throw new IllegalArgumentException(
            s"unknown ScoreMode '$other' (none|avg|max|total|min)")
        }
        from.groupBy("jv").agg(fold.as("jscore"))
      }

    val topk = docs.select(col("doc_id"), col(toField).as("jv"))
      .join(broadcast(folded), Seq("jv"))
      .select(col("doc_id"), col("jscore").cast("double").as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
    topk.withColumn("rnk",
      row_number().over(Window.orderBy(desc("score"), asc("doc_id"))))
  }
}
