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
  final case class MfPlan(terms: Seq[String], qf: Seq[Int],
      weights: Map[(Int, String), Float], salted: Set[(Int, String)],
      pf: Seq[Int], pfWeights: Map[Int, Float],
      caches: Array[Array[Float]], numShards: Int, sharded: Boolean,
      tie: Float, msm: Int, k: Int)

  /** edismax main query: analyze, per-term cross-field dismax (qf), Solr
    * mm, optional phrase-boost fields (pf — the whole analyzed query as
    * an exact phrase per pf field, dismax-combined, attached as SHOULD to
    * the matched set: score = float(main + phraseBoost-if-matched), the
    * outer BooleanQuery shape of `ExtendedDismaxQParser.java:230-260`
    * addShardPhraseQueries).
    */
  def searchDisMax(fields: Seq[FieldRef], input: String, mm: String = "1",
      tie: Float = 0f, k: Int = 10, pf: Seq[FieldRef] = Nil): Array[Hit] = {
    val terms = graft.core.Analysis.simpleTokens(input).toSeq
    require(terms.nonEmpty, "empty edismax query")
    val msm = math.max(1, QueryParser.resolveMm(mm, terms.length))
    dismaxTerms(fields, terms, msm, tie, k, pf)
  }

  def dismaxTerms(qfFields: Seq[FieldRef], terms: Seq[String], msm: Int,
      tie: Float, k: Int, pfFields: Seq[FieldRef] = Nil): Array[Hit] = {
    require(qfFields.nonEmpty)
    // the working field list: qf fields, then pf-only fields (a searcher
    // can appear in both; pf indexes by position in this combined list)
    val fields: Seq[FieldRef] = qfFields ++
      pfFields.filterNot(p => qfFields.exists(_.searcher eq p.searcher))
    val S = fields.head.searcher.index.manifest.numDocShards
    require(fields.forall(_.searcher.index.manifest.numDocShards == S),
      "all field indexes must share numDocShards (docId-aligned salting)")
    val termSet = terms.toSet
    val stats: Seq[Map[String, (Long, Long)]] =
      fields.map(_.searcher.stats(termSet))
    val weights = (for {
      (fr, i) <- fields.zipWithIndex if i < qfFields.size
      m = fr.searcher.index.manifest
      (t, (df, _)) <- stats(i)
    } yield (i, t) -> BM25.weightValue(BM25.idf(df, m.docCount),
        fr.searcher.index.bm25, fr.boost)).toMap
    val salted = (for {
      (fr, i) <- fields.zipWithIndex
      m = fr.searcher.index.manifest
      (t, (df, _)) <- stats(i) if df >= m.saltThreshold
    } yield (i, t)).toSet
    // pf: phrase pseudo-term weight per pf field — float-accumulated idf
    // sum over the query terms IN ORDER (PhraseWeight semantics) × boost;
    // a field missing any term can never phrase-match (dropped); phrases
    // need ≥2 terms and a positions-bearing index
    // pf bookkeeping is keyed by Searcher reference identity: two pf refs
    // wrapping the SAME instance would collapse to one pfWeights entry
    // (last boost wins) and a qf/pf pair wrapping DISTINCT instances over
    // the same index dir would silently score as different fields — both
    // must fail loudly, not change scores (round-3 advisor finding).
    // Callers: reuse ONE Searcher instance per field across qf and pf.
    require(pfFields.map(p => System.identityHashCode(p.searcher)).distinct
      .size == pfFields.size,
      "pf fields must wrap distinct Searcher instances (one per field); " +
        "to boost one field twice, adjust its single pf boost instead")
    val pfIdx: Seq[(Int, Float)] =
      if (terms.size < 2) Nil
      else pfFields.flatMap { p =>
        val i = fields.indexWhere(_.searcher eq p.searcher)
        val m = p.searcher.index.manifest
        if (!m.positions) sys.error("pf requires an index built with positions")
        if (terms.forall(stats(i).contains)) Some((i, p.boost)) else None
      }
    val pfWeights = pfIdx.map { case (i, boost) =>
      var idfSum = 0f
      val m = fields(i).searcher.index.manifest
      terms.foreach(t => idfSum += BM25.idf(stats(i)(t)._1, m.docCount))
      i -> BM25.weightValue(idfSum, fields(i).searcher.index.bm25, boost)
    }.toMap
    val plan = MfPlan(terms, qfFields.indices, weights, salted,
      pfIdx.map(_._1), pfWeights,
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

  /** One shard's scorer tree: per term a DisMax over qf-field TermScorers
    * (cold rows mod-filtered in sharded mode, like the single-field path),
    * terms combined with DisjunctionScorer(msm); pf fields contribute an
    * optional phrase DisMax through ReqOptScorer (score-only SHOULD);
    * bounded top-k heap.
    */
  private[search] def execShardMf(shard: Int,
      blobs: Map[(Int, String), Seq[SegRow]], plan: MfPlan): Array[Hit] = {
    def shardRowsOf(key: (Int, String)): Seq[SegRow] =
      blobs.getOrElse(key, Nil)
        .filter(r => shard < 0 || r.salt == shard || r.salt < 0)
    val termScorers: Seq[DocScorer] = plan.terms.map { t =>
      val subs: Seq[DocScorer] = plan.qf.flatMap { f =>
        shardRowsOf((f, t)).map { r =>
          val ts = new TermScorer(
            PostingsCodec.iterator(r.docBlocks, r.skipData),
            plan.weights((f, t)), plan.caches(f))
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
    val main = new DisjunctionScorer(live.toArray, plan.msm)
    // pf: exact phrase per pf field over the positions sidecar, dismax'd
    val pfSubs: Seq[DocScorer] = plan.pf.flatMap { f =>
      val rows = plan.terms.map(t => shardRowsOf((f, t)))
      if (rows.exists(_.isEmpty)) None
      else {
        val rpt = {
          val r = Array.tabulate(plan.terms.size) { i =>
            val first = plan.terms.indexOf(plan.terms(i))
            if (plan.terms.count(_ == plan.terms(i)) > 1) first else -1
          }
          if (r.exists(_ >= 0)) r else null
        }
        val its = rows.map(_.head).map(r =>
          PostingsCodec.iterator(r.docBlocks, r.skipData, r.posBlocks)).toArray
        val ps = new PhraseScorer(its, plan.terms.indices.toArray, 0,
          plan.pfWeights(f), plan.caches(f), rpt)
        Some(
          if (shard >= 0 && rows.forall(_.head.salt < 0))
            new ModFilterScorer(ps, shard, plan.numShards)
          else ps)
      }
    }
    val root: DocScorer =
      if (pfSubs.isEmpty) main
      else new ReqOptScorer(main,
        if (pfSubs.size == 1) pfSubs.head
        else new DisMaxScorer(pfSubs.toArray, plan.tie))
    var d = root.nextDoc()
    while (d != DocScorer.NO_MORE) {
      queue.insert(d, root.score.toDouble)
      d = root.nextDoc()
    }
    queue.sortedHits
  }
}
