package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FreeTextSuggester (`lucene/suggest/.../analyzing/FreeTextSuggester
  * .java:97-134,466-726`): an n-gram (grams = 2) language model with
  * stupid-backoff smoothing (ALPHA = 0.4).
  *
  * Counts come from the logical index's postings — unigram count =
  * Σtf (totalTermFreq, :364-365), bigram counts from an
  * adjacent-positions self-join (no re-tokenize; the positions sidecar
  * already holds the token stream). Lookup replays the reference's model
  * walk: the highest-order model whose context exists predicts first;
  * each lower-order model is discounted by ALPHA and skips last-tokens a
  * higher model already suggested (the `seen` set, :556-561,684-706);
  * scores are the reference's fixed-point longs
  * (long)(Long.MAX_VALUE · backoff · count / contextCount) (:710), the
  * final order is (value desc, key asc) (:718-726). Per-model top-N
  * tie-break is (count desc, token asc) — the FST TopNSearcher's
  * weight-then-input-bytes order. The rendered key joins grams with a
  * space where the reference uses its separator byte (cosmetic).
  */
object FreeText {

  val Alpha = 0.4

  /** uni(term, c), bi(t1, t2, c), totTokens = Σ unigram counts. */
  final case class Model(uni: DataFrame, bi: DataFrame, totTokens: Long) {
    def unpersist(): Unit = { uni.unpersist(); bi.unpersist() }

    /** Driver-local snapshot of the model when it fits (same 2M-row
      * regime as the searcher's term dictionary): unigrams pre-sorted
      * (count desc, term asc), bigrams grouped by context in the same
      * order — lookups then run zero Spark jobs. An FST-sized n-gram LM
      * on the driver is exactly the reference's own memory shape.
      */
    lazy val local: Option[LocalModel] =
      if (uni.count() > 2000000L || bi.count() > 2000000L) None
      else {
        def byCountThenToken(a: (String, Long), b: (String, Long)) =
          a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
        val u = uni.select("term", "c").collect()
          .map(r => (r.getString(0), r.getLong(1)))
        val uSorted = u.clone()
        scala.util.Sorting.stableSort(uSorted, byCountThenToken _)
        val b = bi.select("t1", "t2", "c").collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .groupBy(_._1)
          .map { case (t1, xs) =>
            val arr = xs.map(x => (x._2, x._3))
            scala.util.Sorting.stableSort(arr, byCountThenToken _)
            t1 -> arr
          }
        Some(LocalModel(u.toMap, uSorted, b))
      }
  }

  /** Driver-local model: exact unigram counts, (count desc, token asc)
    * pre-sorted unigrams, bigram successors per context in the same
    * order.
    */
  final case class LocalModel(uniMap: Map[String, Long],
      uniSorted: Array[(String, Long)],
      biByCtx: Map[String, Array[(String, Long)]])

  /** Build the 2-gram model from logical-index postings
    * (term, docId, tf, pos[]).
    */
  def build(postings: DataFrame): Model = {
    val uni = postings.groupBy("term").agg(sum("tf").as("c")).persist()
    val occ = postings.select(col("docId"), col("term"),
      explode(col("pos")).as("p"))
    val bi = occ.select(col("docId"), col("p"), col("term").as("t1"))
      .join(occ.select(col("docId"), (col("p") - 1).as("p"),
        col("term").as("t2")), Seq("docId", "p"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("c")).persist()
    val tot = uni.agg(sum("c")).collect()(0).getLong(0)
    Model(uni, bi, tot)
  }

  /** Suggest next/completed words for `key`. A trailing non-token char
    * means the last token ended (:525-545 "upgrade" — only bigram
    * predictions); otherwise the last token is a partial to complete and
    * the unigram model backs off behind the bigram one.
    */
  def lookup(m: Model, key: String, num: Int): Seq[(String, Long)] = {
    val toks = graft.core.Analysis.simpleTokens(key)
    require(toks.nonEmpty, "no tokens produced by analyzer")
    val lastEnded = key.nonEmpty && !key.last.isLetterOrDigit
    val MaxD = Long.MaxValue.toDouble
    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val seen = scala.collection.mutable.Set.empty[String]
    var backoff = 1.0

    val (ctxOpt, partial) =
      if (lastEnded) (Some(toks.last), None)
      else if (toks.length >= 2) (Some(toks(toks.length - 2)), Some(toks.last))
      else (None, Some(toks.last))

    // bigram model (skipped entirely — backoff untouched — when the input
    // has no context token, :568-572)
    ctxOpt.foreach { ctx =>
      val ctxCount = m.local match {
        case Some(lm) => lm.uniMap.get(ctx)
        case None => m.uni.filter(col("term") === ctx)
          .select("c").collect().headOption.map(_.getLong(0))
      }
      ctxCount match {
        case None => backoff *= Alpha // model never saw this context (:597)
        case Some(cc) =>
          val top: Seq[(String, Long)] = m.local match {
            case Some(lm) =>
              // pre-sorted (count desc, token asc) successor walk
              lm.biByCtx.getOrElse(ctx, Array.empty[(String, Long)])
                .iterator
                .filter { case (t2, _) => partial.forall(t2.startsWith) }
                .take(num).toSeq
            case None =>
              var q = m.bi.filter(col("t1") === ctx)
              partial.foreach(p => q = q.filter(col("t2").startsWith(p)))
              q.select("t2", "c").orderBy(desc("c"), asc("t2")).limit(num)
                .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
          }
          top.foreach { case (t2, c) =>
            seen += t2
            results += ((s"$ctx $t2", (((MaxD * backoff) * c) / cc).toLong))
          }
          backoff *= Alpha
      }
    }

    // unigram model — never predicts from an empty last token (:558-560)
    if (!lastEnded) partial.foreach { p =>
      val top: Seq[(String, Long)] = m.local match {
        case Some(lm) =>
          lm.uniSorted.iterator
            .filter { case (t, _) => t.startsWith(p) && !seen(t) }
            .take(num).toSeq
        case None =>
          var q = m.uni.filter(col("term").startsWith(p))
          if (seen.nonEmpty)
            q = q.filter(!col("term").isInCollection(seen.toSeq))
          q.select("term", "c").orderBy(desc("c"), asc("term")).limit(num)
            .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      }
      top.foreach { case (t, c) =>
        results += ((t, (((MaxD * backoff) * c) / m.totTokens).toLong))
      }
    }

    results.sortBy { case (k, v) => (-v, k) }.toSeq
  }
}
