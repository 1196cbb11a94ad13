package graft.search

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.Hit
import graft.index.PostingsCodec
import graft.search.SegmentSearcher.SegRow

/** Cross-field dismax retrieval — the edismax field-qualified surface
  * (`solr/core/src/java/org/apache/solr/search/ExtendedDismaxQParser.java:40-120`,
  * qf handling via `SolrPluginUtils.parseFieldBoosts` and
  * `DisMaxQParser.parseMinShouldMatch`):
  *
  *   - the user string is analyzed into terms
  *   - per term: a DisjunctionMaxQuery over the FIELDS' term scores, each
  *     field contributing its OWN BM25 (its own df, avgdl, norms — fields
  *     are separate inverted indexes over the SAME docId space) scaled by
  *     its qf boost
  *   - across terms: SHOULD with Solr mm
  *
  * Execution mirrors the single-field Searcher: driver-local scorer trees
  * through the blob cache when the estimated posting bytes fit, a
  * groupByKey shard path when they don't (hot lists never centralize);
  * salted terms shard by docId mod S exactly like single-field queries, so
  * per-shard streams from different fields stay docId-aligned.
  */
object MultiField {

  /** One queryable field: a Searcher over that field's index + qf boost. */
  final case class FieldRef(searcher: Searcher, boost: Float)

  /** Parse a Solr qf spec: "text^2 title" → [(text, 2.0), (title, 1.0)]
    * (`SolrPluginUtils.parseFieldBoosts`).
    */
  def parseQf(qf: String): Seq[(String, Float)] =
    qf.trim.split("\\s+").toSeq.filter(_.nonEmpty).map { part =>
      part.split("\\^") match {
        case Array(f) => (f, 1f)
        case Array(f, b) => (f, b.toFloat)
        case _ => sys.error(s"bad qf entry: $part")
      }
    }

  /** Serializable per-query plan for the shard tasks. Weight keys are
    * (fieldIdx, term); caches indexed by fieldIdx.
    */
  final case class MfPlan(terms: Seq[String],
      weights: Map[(Int, String), Float], salted: Set[(Int, String)],
      caches: Array[Array[Float]], numShards: Int, sharded: Boolean,
      tie: Float, msm: Int, k: Int)

  /** edismax main query: analyze, per-term cross-field dismax, Solr mm. */
  def searchDisMax(fields: Seq[FieldRef], input: String, mm: String = "1",
      tie: Float = 0f, k: Int = 10): Array[Hit] = {
    val terms = graft.core.Analysis.simpleTokens(input).toSeq
    require(terms.nonEmpty, "empty edismax query")
    val msm = math.max(1, QueryParser.resolveMm(mm, terms.length))
    dismaxTerms(fields, terms, msm, tie, k)
  }

  def dismaxTerms(fields: Seq[FieldRef], terms: Seq[String], msm: Int,
      tie: Float, k: Int): Array[Hit] = {
    require(fields.nonEmpty)
    val S = fields.head.searcher.index.manifest.numDocShards
    require(fields.forall(_.searcher.index.manifest.numDocShards == S),
      "all field indexes must share numDocShards (docId-aligned salting)")
    val termSet = terms.toSet
    val stats: Seq[Map[String, (Long, Long)]] =
      fields.map(_.searcher.stats(termSet))
    val weights = (for {
      (fr, i) <- fields.zipWithIndex
      m = fr.searcher.index.manifest
      (t, (df, _)) <- stats(i)
    } yield (i, t) -> BM25.weightValue(BM25.idf(df, m.docCount),
        fr.searcher.index.bm25, fr.boost)).toMap
    val salted = (for {
      (fr, i) <- fields.zipWithIndex
      m = fr.searcher.index.manifest
      (t, (df, _)) <- stats(i) if df >= m.saltThreshold
    } yield (i, t)).toSet
    val plan = MfPlan(terms, weights, salted,
      fields.map(_.searcher.cache).toArray, S, salted.nonEmpty, tie, msm, k)

    val estBytes = stats.map(st =>
      st.valuesIterator.map(_._1 * 4L + 64L).sum).sum
    val budget = fields.map(_.searcher.maxLocalBytes).min
    val partials: Seq[Array[Hit]] =
      if (estBytes <= budget) execLocal(fields, stats, plan)
      else execDistributed(fields, stats, plan)
    TopK.merge(partials, k)
  }

  private def execLocal(fields: Seq[FieldRef],
      stats: Seq[Map[String, (Long, Long)]], plan: MfPlan): Seq[Array[Hit]] = {
    val rows: Map[(Int, String), Array[SegRow]] =
      fields.zipWithIndex.flatMap { case (fr, i) =>
        val present = plan.terms.filter(stats(i).contains).toSet
        if (present.isEmpty) Nil
        else fr.searcher.fetchRows(present).groupBy(_.term)
          .map { case (t, rs) => (i, t) -> rs }
      }.toMap
    if (rows.isEmpty) return Nil
    if (!plan.sharded)
      Seq(execShardMf(-1, rows.view.mapValues(_.toSeq).toMap, plan))
    else (0 until plan.numShards).flatMap { s =>
      val shardRows = rows.view.mapValues(_.filter(r => r.salt == s || r.salt < 0).toSeq)
        .filter(_._2.nonEmpty).toMap
      if (shardRows.isEmpty) None else Some(execShardMf(s, shardRows, plan))
    }
  }

  private def execDistributed(fields: Seq[FieldRef],
      stats: Seq[Map[String, (Long, Long)]], plan: MfPlan): Seq[Array[Hit]] = {
    val spark = fields.head.searcher.spark
    import spark.implicits._
    val tagged: Seq[Dataset[(Int, SegRow)]] =
      fields.zipWithIndex.flatMap { case (fr, i) =>
        val present = plan.terms.filter(stats(i).contains).toSet
        if (present.isEmpty) None
        else Some(fr.searcher.prunedRows(present).map(r => (i, r)))
      }
    if (tagged.isEmpty) return Nil
    val all = tagged.reduce(_ union _)
    val S = plan.numShards
    val sharded = plan.sharded
    val bPlan = spark.sparkContext.broadcast(plan)
    all.flatMap { case (f, r) =>
        if (!sharded) Seq((0, (f, r)))
        else if (r.salt >= 0) Seq((r.salt, (f, r)))
        else (0 until S).map(s => (s, (f, r)))
      }
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val p = bPlan.value
        val blobs = it.map(_._2).toSeq.groupBy(fr => (fr._1, fr._2.term))
          .view.mapValues(_.map(_._2)).toMap
        execShardMf(if (p.sharded) shard else -1, blobs, p)
      }
      .collect().toSeq
  }

  /** One shard's scorer tree: per term a DisMax over field TermScorers
    * (cold rows mod-filtered in sharded mode, like the single-field path),
    * terms combined with DisjunctionScorer(msm), bounded top-k heap.
    */
  private[search] def execShardMf(shard: Int,
      blobs: Map[(Int, String), Seq[SegRow]], plan: MfPlan): Array[Hit] = {
    val termScorers: Seq[DocScorer] = plan.terms.map { t =>
      val subs: Seq[DocScorer] = blobs.keys.toSeq.filter(_._2 == t).sorted
        .flatMap { case key @ (f, _) =>
          blobs(key)
            .filter(r => shard < 0 || r.salt == shard || r.salt < 0)
            .map { r =>
              val w = plan.weights(key)
              val ts = new TermScorer(
                PostingsCodec.iterator(r.docBlocks, r.skipData), w,
                plan.caches(f))
              if (shard >= 0 && r.salt < 0)
                new ModFilterScorer(ts, shard, plan.numShards)
              else ts
            }
        }
      if (subs.isEmpty) EmptyScorer
      else new DisMaxScorer(subs.toArray, plan.tie)
    }
    val live = termScorers.filterNot(_ eq EmptyScorer)
    val queue = new BoundedHitQueue(plan.k)
    if (live.isEmpty || live.size < plan.msm) return queue.sortedHits
    val root = new DisjunctionScorer(live.toArray, plan.msm)
    var d = root.nextDoc()
    while (d != DocScorer.NO_MORE) {
      queue.insert(d, root.score.toDouble)
      d = root.nextDoc()
    }
    queue.sortedHits
  }
}
