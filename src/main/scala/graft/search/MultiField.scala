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

  /** One queryable field: a Searcher over that field's index + qf boost +
    * the similarity that field scores under — the
    * PerFieldSimilarityWrapper surface
    * (`search/similarities/PerFieldSimilarityWrapper.java:35`: `get(field)`
    * picks the Similarity per field; under edismax qf each field's
    * TermWeight is built by ITS OWN sim and the per-term DisMax combines
    * them). Supported sims: BM25 (default, the only one that accepts a qf
    * boost), LMDirichlet, LMJM, DFR GB2, and the SimilarityBase family —
    * everything whose term weight is field-local. Classic is rejected:
    * its queryNorm is a whole-query global that does not compose
    * per-field.
    */
  final case class FieldRef(searcher: Searcher, boost: Float,
      sim: Int = SegmentSearcher.SimBm25)

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
    * (fieldIdx, term); caches indexed by fieldIdx. `sims(f)` selects the
    * field's similarity; `weights` carries the folded scalar weight (BM25
    * weightValue / LM μ·cp / JM λ·cp), `rawStats` the (df, ttf) pair the
    * DFR/SimilarityBase scorers compute from, and `maxDocs`/`avgdls`/
    * `sumTtfs` the per-field collection stats those formulas need.
    */
  final case class MfPlan(terms: Seq[String], qf: Seq[Int],
      weights: Map[(Int, String), Float], salted: Set[(Int, String)],
      pf: Seq[Int], pfWeights: Map[Int, Float],
      caches: Array[Array[Float]], numShards: Int, sharded: Boolean,
      tie: Float, msm: Int, k: Int,
      sims: Seq[Int] = Nil,
      rawStats: Map[(Int, String), (Long, Long)] = Map.empty,
      maxDocs: Seq[Long] = Nil, avgdls: Seq[Float] = Nil,
      sumTtfs: Seq[Long] = Nil) {
    def simOf(f: Int): Int =
      if (sims.isEmpty) SegmentSearcher.SimBm25 else sims(f)
  }

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
    fields.foreach { fr =>
      require(fr.sim != SegmentSearcher.SimClassic,
        "per-field Classic is unsupported: queryNorm is a whole-query " +
          "global that does not compose per-field")
      require(fr.sim == SegmentSearcher.SimBm25 || fr.boost == 1f,
        s"qf boost on a non-BM25 field is unsupported (sim=${fr.sim}): " +
          "the folded weight sits inside the sim's log/model terms")
    }
    val weights = (for {
      (fr, i) <- fields.zipWithIndex if i < qfFields.size
      m = fr.searcher.index.manifest
      (t, (df, ttf)) <- stats(i)
    } yield (i, t) -> (fr.sim match {
      case SegmentSearcher.SimBm25 =>
        BM25.weightValue(BM25.idf(df, m.docCount),
          fr.searcher.index.bm25, fr.boost)
      // LM collection probability (`LMSimilarity.java:154-156`): μ·cp /
      // λ·cp with cp = (ttf+1F)/(sumTTF+1F), floats exactly as single-field
      case SegmentSearcher.SimLMDirichlet =>
        SegmentSearcher.LMMu *
          ((ttf.toFloat + 1f) / (m.sumTotalTermFreq.toFloat + 1f))
      case SegmentSearcher.SimLMJM =>
        SegmentSearcher.JMLambda *
          ((ttf.toFloat + 1f) / (m.sumTotalTermFreq.toFloat + 1f))
      // DFR/SimilarityBase: scorer computes from raw (df, ttf) below
      case _ => 0f
    })).toMap
    val rawStats = (for {
      (fr, i) <- fields.zipWithIndex if i < qfFields.size
      (t, (df, ttf)) <- stats(i)
    } yield (i, t) -> ((df, ttf))).toMap
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
        require(fields(i).sim == SegmentSearcher.SimBm25,
          "pf (phrase boost) requires a BM25-scored field: the phrase " +
            "weight model is BM25-specific")
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
      // per-field norm cache: the BM25 freq-independent denominators for
      // BM25 fields, the SimilarityBase NORM_TABLE (decoded quantized
      // lengths) for every other sim — same per-sim choice as single-field
      fields.map(fr =>
        if (fr.sim == SegmentSearcher.SimBm25) fr.searcher.cache
        else graft.core.Norms.NORM_TABLE).toArray,
      S, salted.nonEmpty, tie, msm, k,
      sims = fields.map(_.sim),
      rawStats = rawStats,
      maxDocs = fields.map(_.searcher.index.manifest.docCount),
      avgdls = fields.map { fr =>
        val m = fr.searcher.index.manifest
        if (m.sumTotalTermFreq <= 0) 1f
        else m.sumTotalTermFreq.toFloat / m.docCount.toFloat
      },
      sumTtfs = fields.map(_.searcher.index.manifest.sumTotalTermFreq))

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
          val it = PostingsCodec.iterator(r.docBlocks, r.skipData)
          val sim = plan.simOf(f)
          val ts: DocScorer =
            if (sim == SegmentSearcher.SimBm25)
              new TermScorer(it, plan.weights((f, t)), plan.caches(f))
            else if (sim == SegmentSearcher.SimLMDirichlet ||
                sim == SegmentSearcher.SimLMJM)
              new TermScorer(it, plan.weights((f, t)), plan.caches(f), sim)
            else if (sim == SegmentSearcher.SimDFR) {
              val (df, ttf) = plan.rawStats((f, t))
              new DFRTermScorer(it, df, ttf, plan.maxDocs(f),
                plan.avgdls(f), plan.caches(f))
            } else if (SegmentSearcher.isSimBase(sim)) {
              val (df, ttf) = plan.rawStats((f, t))
              new SimBaseTermScorer(it, df, ttf, plan.maxDocs(f),
                plan.avgdls(f), plan.caches(f), sim, plan.sumTtfs(f))
            } else sys.error(s"per-field sim $sim unsupported")
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
