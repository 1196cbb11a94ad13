package graft.search

/** Programmatic Query ADT mirroring the reference's BooleanQuery semantics
  * (`lucene/core/src/java/org/apache/lucene/search/BooleanQuery.java:41`:
  * MUST / SHOULD / MUST_NOT / FILTER clauses + minimumNumberShouldMatch),
  * plus the scoring wrappers and multi-term expansions of §2.6 of SURVEY.md.
  *
  * `rewrite` reproduces the reference's rewrite-fixpoint simplifications
  * (`IndexSearcher.java:682-689` loop; `BooleanQuery.java:230-290`):
  * single-clause unwrap, empty → MatchNone, clause dedup. (Nested boolean
  * clauses are NOT flattened — matching the reference, whose rewrite keeps
  * them and whose scorer tree rounds each inner sum to float; the string
  * parser produces flat clauses directly.)
  */
sealed trait Query

/** Single term (TermQuery.java:40). */
final case class TermQ(term: String) extends Query

/** Full Boolean query. `filter` clauses match without contributing score
  * (FILTER occur); `mustNot` excludes (ReqExclScorer.java:27).
  */
final case class BoolQ(
    must: Seq[Query] = Nil,
    should: Seq[Query] = Nil,
    mustNot: Seq[Query] = Nil,
    filter: Seq[Query] = Nil,
    minShouldMatch: Int = 0) extends Query

/** max + tieBreak*(sum-max) over sub-queries (DisjunctionMaxQuery.java:47). */
final case class DisMaxQ(clauses: Seq[Query], tieBreak: Float = 0f) extends Query

/** Several terms scored as one pseudo-term: union postings, per-doc
  * summed tf, df = max over members (SynonymQuery.java:46 semantics).
  */
final case class SynonymQ(terms: Seq[String]) extends Query

/** Several terms scored as a DisjunctionMax of per-term scorers whose df
  * is BLENDED to the max across members (BlendedTermQuery.java:62-88,
  * DisjunctionMaxRewrite with its 0.01 tie default) — the cross-term
  * statistics equalizer: a rare variant scores like its common sibling.
  */
final case class BlendedQ(terms: Seq[String],
    tieBreak: Float = 0.01f) extends Query

/** Blended statistics with per-term boosts, SHOULD-sum combine — the
  * BOOLEAN_REWRITE form of BlendedTermQuery (`BlendedTermQuery.java:
  * 247-272` df = max across members; each clause a boosted TermQuery;
  * `MultiTermQuery.TopTermsBlendedFreqScoringRewrite:190-226`). The
  * rewritten form of FuzzyScoredQ.
  */
final case class BlendedBoostedQ(terms: Seq[(String, Float)],
    /** Score every clause with this ARTIFICIAL df instead of the blended
      * max — FuzzyLikeThisQuery's newTermQuery builds a TermContext with
      * total df = ttf = 1 (`sandbox/.../FuzzyLikeThisQuery.java:246-266`).
      */
    dfOverride: Option[Long] = None) extends Query

/** SCORED fuzzy — the reference FuzzyQuery's actual default rewrite
  * (`FuzzyQuery.java:100` TopTermsBlendedFreqScoringRewrite): the top
  * `maxExpansions` dictionary terms within `maxEdits`, each boosted by
  * the scaled-Levenshtein similarity (`FuzzyTermsEnum.java:346-354`:
  * exact match 1f, else 1f − ed/min(len); raw-edits mode has
  * minSimilarity 0 and scale 1), blended df, SHOULD-sum scoring.
  * Deviation: distances are PLAIN Levenshtein (engine-wide fuzzy
  * semantics); the reference's enum counts transpositions as 1 edit.
  * FuzzyQ stays the const-score form (ConstantScoreWrapper analog).
  */
final case class FuzzyScoredQ(term: String, maxEdits: Int = 2,
    maxExpansions: Int = 50) extends Query

/** Multiplies the wrapped query's score (BoostQuery.java:34). */
final case class BoostQ(query: Query, boost: Float) extends Query

/** Matches like `query` but scores a constant (ConstantScoreQuery.java:34). */
final case class ConstScoreQ(query: Query, score: Float = 1f) extends Query

/** FunctionQuery (`queries/function/FunctionQuery.java:46-120`): matches
  * EVERY doc; score = the value source's float value (queryWeight 1).
  * NaN/-Inf scores map to -Float.MAX_VALUE (:113-117 — the reference's
  * priority queues can't order NaN). Top-level only — evaluates as a
  * column-pruned scan + top-k over the docs table, never via postings.
  */
final case class FunctionQ(vs: ValueSrc) extends Query

/** BoostedQuery (`queries/function/BoostedQuery.java:72-115`, Solr's
  * `boost` param): matches exactly like `query`; score = subquery score ×
  * the value source's float value (one float multiply, :113).
  */
final case class FuncBoostedQ(query: Query, vs: ValueSrc) extends Query

/** Additive boost function (Solr edismax `bf` — `search/DisMaxQParser
  * .java:166-183` attaches each boost function as a SHOULD FunctionQuery
  * clause): matches like `query`, score = match score + value — the
  * additive sibling of [[FuncBoostedQ]]'s multiply.
  */
final case class FuncAddedQ(query: Query, vs: ValueSrc) extends Query

/** CustomScoreQuery (`queries/CustomScoreQuery.java:38-63` with the
  * default provider `CustomScoreProvider.java:66-88`): matches exactly
  * like `sub` (the value sources only affect the score); score =
  * `boost * (subScore * v0 * v1 * ...)` — a sequential float fold in
  * clause order, zero sources degenerating to `subScore * 1f`. The
  * query boost is applied at score time, never normalized down the tree
  * (`CustomScoreQuery.java:210-224` — the provider function need not be
  * distributive).
  */
final case class CustomScoreQ(sub: Query, valSrcs: Seq[ValueSrc],
    boost: Float = 1f) extends Query

/** FunctionRangeQuery (`queries/function/FunctionRangeQuery.java:40-96`,
  * Solr's `{!frange}`): matches docs whose value lands in
  * [lower, upper] (float comparisons, inclusivity flags per bound,
  * `FunctionValues.getRangeScorer`); score = the value itself with the
  * ValueSourceScorer NaN/-Inf guard (`ValueSourceScorer.java:77-81`).
  */
final case class FunctionRangeQ(vs: ValueSrc, lower: Float, upper: Float,
    inclLower: Boolean = true, inclUpper: Boolean = true) extends Query

/** BoostingQuery (`queries/BoostingQuery.java:29-107`): matches and
  * scores exactly like `matchQ`; a doc ALSO matched by `context` gets
  * its score multiplied by `boost` (a demotion when boost < 1 — the
  * reference's documented use). Context-only matches are ignored and
  * the context never contributes score (its weight is created with
  * needsScores = false).
  */
final case class BoostingQ(matchQ: Query, context: Query,
    boost: Float) extends Query

/** Expands to all indexed terms with this prefix, scored const-score like
  * the reference's MultiTermQueryConstantScoreWrapper (`:44`).
  */
final case class PrefixQ(prefix: String) extends Query

/** Regex over the term dictionary (RegexpQuery.java:48 analog). The
  * pattern matches the WHOLE term, like the reference's automaton — there
  * is no substring mode; embed `.*` explicitly for contains-matching.
  */
final case class RegexpQ(pattern: String) extends Query

/** Wildcard over the term dictionary: `*` = any run, `?` = one char,
  * anywhere in the token (WildcardQuery.java:42-46).
  */
final case class WildcardQ(pattern: String) extends Query

object WildcardQ {
  /** Compile the wildcard into an anchored regex (WildcardQuery.java:
    * toAutomaton analog — we go via the term-dictionary regex path).
    */
  def toRegex(pattern: String): String = {
    val sb = new StringBuilder("^")
    pattern.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c if "\\.[]{}()<>+-=!?^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.append('$').toString
  }
}

/** Scored multi-term rewrite (`search/TopTermsRewrite.java:40`): keep
  * the first `maxExpansions` matching dictionary terms (the rewrite's
  * size-bounded PQ keeps the lexicographically smallest terms when every
  * enum boost is the constant 1f, as it is for prefix/wildcard/regexp/
  * range) and score them as a REAL disjunction instead of const-score:
  * `blended = false` = TopTermsScoringBooleanQueryRewrite (each clause
  * scored with its own df), `blended = true` =
  * TopTermsBlendedFreqScoringRewrite (every clause the blended max df).
  * `inner` must be Prefix/Wildcard/Regexp/TermRange — Fuzzy has its own
  * boost-ranked rewrite ([[FuzzyScoredQ]]).
  */
final case class MultiTermScoredQ(inner: Query, maxExpansions: Int = 50,
    blended: Boolean = false) extends Query

/** Terms within Levenshtein distance maxEdits (FuzzyQuery.java:53). */
final case class FuzzyQ(term: String, maxEdits: Int = 2) extends Query

/** Term range over the dictionary (TermRangeQuery.java:37). */
final case class TermRangeQ(lower: String, upper: String,
    includeLower: Boolean = true, includeUpper: Boolean = true) extends Query

/** Exact phrase: consecutive positions (PhraseQuery.java:69). */
final case class PhraseQ(terms: Seq[String], slop: Int = 0) extends Query

/** Phrase with a SET of accepted terms per position — "a (b|c) d"
  * (MultiPhraseQuery.java:49). Matching positions per offset are the
  * union of the member terms' positions; idf = Σ over ALL member terms
  * in offset-then-list order (BM25Similarity.idfExplain over the full
  * term array).
  */
final case class MultiPhraseQ(positions: Seq[Seq[String]],
    slop: Int = 0) extends Query

/** Span-near over single-term clauses (`search/spans/SpanNearQuery
  * .java:41`): all clauses within `slop` total gap, ordered
  * (NearSpansOrdered) or unordered (NearSpansUnordered). Each
  * enumerated span contributes sloppyFreq = 1/(1+width) like the
  * spans SimScorer slop factor.
  */
final case class SpanNearQ(terms: Seq[String], slop: Int,
    inOrder: Boolean = true) extends Query

/** Spans ending at or before `end` (`search/spans/SpanFirstQuery
  * .java:30-40`): a term span at position p has end p+1, so this keeps
  * occurrences in the first `end` token positions. freq = count of
  * accepted spans (width 0 ⇒ slop factor 1 each), scored like a term
  * with that restricted freq.
  */
final case class SpanFirstQ(term: String, end: Int) extends Query

/** Union of term spans (`search/spans/SpanOrQuery.java:36`): freq =
  * total member occurrences in the doc (width-0 spans), ONE score per
  * doc with weight from the distinct sorted member terms (SpanWeight
  * collects termContexts into a TreeSet).
  */
final case class SpanOrQ(terms: Seq[String]) extends Query

/** Include-span occurrences with no exclude occurrence within `pre`
  * tokens before or `post` tokens after
  * (`search/spans/SpanNotQuery.java:34-37`; negatives clamp to 0 like
  * the reference's constructor, lines 63-64). freq = accepted include
  * count; scoring weight from the include term only
  * (SpanNotWeight.extractTerms, lines 186-189).
  */
final case class SpanNotQ(include: String, exclude: String,
    pre: Int = 0, post: Int = 0) extends Query

/** Span-near whose clauses may be SpanOr unions of terms — the
  * reference's composed form `SpanNearQuery(new SpanQuery[]{or(a,b),
  * term(c)}, slop, inOrder)` (`search/spans/SpanNearQuery.java:41`
  * nesting `SpanOrQuery.java:36`). Clause i's spans in a doc are the
  * UNION of its member terms' width-0 occurrences; doc match =
  * conjunction over clauses; freq = the same ordered/unordered near
  * enumeration as SpanNearQ over the merged per-clause position
  * arrays. Weight = float idf fold over sorted DISTINCT PRESENT terms
  * across all clauses (SpanWeight collects extracted terms into a
  * TreeSet; a df=0 term carries no stats and folds as +0).
  */
final case class SpanNearOrQ(clauses: Seq[Seq[String]], slop: Int,
    inOrder: Boolean = true) extends Query

/** Recursive span tree — the reference's fully composable spans package
  * (`search/spans/`): every combinator takes SPAN subclauses, not just
  * terms, so SpanNear can nest SpanNear/SpanOr/SpanNot/SpanFirst
  * arbitrarily (`SpanNearQuery.java:41` takes `SpanQuery[]`). Each node
  * yields per-doc (start, end, width) intervals; the root's intervals
  * score as freq = Σ 1/(1+width) (the spans SimScorer slop factor over
  * `Spans.width()`). The flat single-level forms (SpanNearQ/SpanOrQ/...)
  * remain as dedicated scorers; SpansTreeSpec pins this evaluator to
  * them bit-exactly on the shapes both can express.
  */
sealed trait Span extends Serializable
object Span {
  /** One term occurrence = the width-0 interval (p, p+1) (TermSpans). */
  final case class Term(term: String) extends Span
  /** All clauses within `slop` total gap, ordered (NearSpansOrdered
    * monotone stretch) or unordered (min-advancing walk); emits
    * (firstStart, lastEnd, Σgaps) resp. (minStart, maxEnd,
    * maxEnd−minStart−Σlen).
    */
  final case class Near(clauses: Seq[Span], slop: Int,
      inOrder: Boolean = true) extends Span
  /** Union of subclause intervals in (start, end) order, duplicates
    * kept (`SpanOrQuery.java:36`).
    */
  final case class Or(clauses: Seq[Span]) extends Span
  /** Include intervals with no exclude interval overlapping
    * [start−pre, end+post) (`SpanNotQuery.java:34-37`).
    */
  final case class Not(include: Span, exclude: Span, pre: Int = 0,
      post: Int = 0) extends Span
  /** Intervals ending at or before `end` (`SpanFirstQuery.java:30-40`). */
  final case class First(inner: Span, end: Int) extends Span

  /** `big` intervals that contain a `little` interval, emitted as the
    * BIG span, under the reference's forward-only streaming law
    * (`spans/SpanContainingQuery.java:80-94` via `ContainSpans.java:24`):
    * per big in (start, end) order, the little cursor advances while
    * little.start < big.start and only the CURRENT little is tested
    * (big.end ≥ little.end); little exhaustion ends the doc.
    */
  final case class Containing(big: Span, little: Span) extends Span

  /** `little` intervals enclosed by a `big` interval, emitted as the
    * LITTLE span (`spans/SpanWithinQuery.java:77-92`): per little in
    * order, the big cursor advances while big.end < little.end, then
    * big.start ≤ little.start is tested on the current big only.
    */
  final case class Within(little: Span, big: Span) extends Span

  /** Intervals with start ≥ `start` and end ≤ `end`
    * (`spans/SpanPositionRangeQuery.java:41-48`; `First` is the
    * start = 0 special case).
    */
  final case class PosRange(inner: Span, start: Int, end: Int) extends Span

  /** A multi-term query (prefix/wildcard/regexp/fuzzy/range) inside a
    * span tree (`spans/SpanMultiTermQueryWrapper.java:51`): expanded
    * against the term dictionary into an [[Or]] of term leaves before
    * compilation (capped at the searcher's maxExpansions, logged when
    * the cap bites). Reaching the evaluator unexpanded is an error.
    */
  final case class Multi(inner: Query) extends Span

  /** FieldMaskingSpanQuery (`spans/FieldMaskingSpanQuery.java:62`): the
    * inner span evaluates against ANOTHER field's positions but
    * composes as if it belonged to the enclosing query's field — the
    * cross-field SpanNear trick for token-parallel fields. The user
    * asserts position comparability, as the reference documents.
    * Resolved by [[MultiField.searchMaskedSpan]] (term leaves rebind to
    * the masked field's index; norms and avgdl stay the PRIMARY
    * field's, `SpanWeight.getSimScorer` over query.getField()); a plain
    * single-field search rejects it.
    */
  final case class FieldMasked(field: String, inner: Span) extends Span

  /** Every term the tree reads postings for (exclude sides included). */
  def allTerms(s: Span): Seq[String] = s match {
    case Term(t) => Seq(t)
    case Near(cs, _, _) => cs.flatMap(allTerms)
    case Or(cs) => cs.flatMap(allTerms)
    case Not(i, e, _, _) => allTerms(i) ++ allTerms(e)
    case First(i, _) => allTerms(i)
    case Containing(b, l) => allTerms(b) ++ allTerms(l)
    case Within(l, b) => allTerms(l) ++ allTerms(b)
    case PosRange(i, _, _) => allTerms(i)
    case Multi(_) => Nil // resolved by expandMultiTerm before term pruning
    case FieldMasked(_, i) => allTerms(i)
  }

  /** Terms contributing to the weight — exclude sides do NOT
    * (`SpanNotQuery` extracts terms from the include side only);
    * Containing/Within fold BOTH sides (`SpanContainWeight` builds its
    * sim weight from big's AND little's term contexts).
    */
  def scoringTerms(s: Span): Seq[String] = s match {
    case Term(t) => Seq(t)
    case Near(cs, _, _) => cs.flatMap(scoringTerms)
    case Or(cs) => cs.flatMap(scoringTerms)
    case Not(i, _, _, _) => scoringTerms(i)
    case First(i, _) => scoringTerms(i)
    case Containing(b, l) => scoringTerms(b) ++ scoringTerms(l)
    case Within(l, b) => scoringTerms(l) ++ scoringTerms(b)
    case PosRange(i, _, _) => scoringTerms(i)
    case Multi(_) => Nil
    case FieldMasked(_, i) => scoringTerms(i)
  }

  /** Structural simplification: prune can-never-match nodes (None),
    * collapse single-clause combinators — mirrors the flat rewrites
    * (an empty Near clause list or a Near clause that can't match kills
    * the conjunction; an Or drops dead members; an exclude that can't
    * match is a no-op).
    */
  def simplify(s: Span): Option[Span] = s match {
    case t: Term => Some(t)
    case Near(cs, slop, io) =>
      val ss = cs.map(simplify)
      if (cs.isEmpty || ss.exists(_.isEmpty)) None
      else if (ss.size == 1) ss.head
      else Some(Near(ss.map(_.get), slop, io))
    case Or(cs) =>
      val ss = cs.flatMap(simplify)
      if (ss.isEmpty) None
      else if (ss.size == 1) Some(ss.head)
      else Some(Or(ss))
    case Not(i, e, pre, post) =>
      simplify(i) match {
        case None => None
        case Some(si) => simplify(e) match {
          // structurally identical exclude: every include interval
          // overlaps itself (pre, post ≥ 0) — can never match
          case Some(se) if se == si => None
          case Some(se) => Some(Not(si, se, math.max(pre, 0), math.max(post, 0)))
          case None => Some(si)
        }
      }
    case First(i, end) =>
      if (end <= 0) None else simplify(i).map(First(_, end))
    case Containing(b, l) =>
      // conjunction: both sides must be able to match
      for (sb <- simplify(b); sl <- simplify(l)) yield Containing(sb, sl)
    case Within(l, b) =>
      for (sl <- simplify(l); sb <- simplify(b)) yield Within(sl, sb)
    case PosRange(i, start, end) =>
      // needs start ≥ rangeStart and end ≤ rangeEnd with end > start
      if (end <= math.max(start, 0)) None
      else simplify(i).map(PosRange(_, math.max(start, 0), end))
    case m: Multi => Some(m)
    case FieldMasked(f, i) => simplify(i).map(FieldMasked(f, _))
  }
}

/** Query node wrapping a composed [[Span]] tree. */
final case class SpanQ(root: Span) extends Query

/** Payload-scored span query (`lucene/queries/src/java/org/apache/lucene/
  * queries/payloads/PayloadScoreQuery.java`): wraps a span tree; every
  * matched span's collected leaf payloads fold through `func`
  * ("min" | "max" | "avg" — Min/Max/AveragePayloadFunction) in the
  * SpanCollector visit order; doc score = spanScore × docScore when
  * `includeSpanScore`, else docScore alone (boost then has no effect,
  * as in the reference). Requires an index built with
  * BuildConfig.payloads; the payload factor is the stored float (the
  * engine's fixed decode convention — see
  * [[graft.core.Analysis.Payloads]]).
  */
final case class PayloadScoreQ(root: Span, func: String = "max",
    includeSpanScore: Boolean = true) extends Query

/** Payload-filtered span query (`queries/payloads/SpanPayloadCheckQuery
  * .java:42`): keeps only spans whose collected leaf payload sequence
  * equals `payloads` entry-wise (NaN entry = the reference's null
  * payload, matching exactly an absent payload); survivors score like a
  * plain span tree.
  */
final case class SpanPayloadCheckQ(root: Span,
    payloads: Seq[Float]) extends Query

case object MatchAllQ extends Query     // MatchAllDocsQuery.java:29
case object MatchNoneQ extends Query    // MatchNoDocsQuery

/** Predicates of the sandbox docvalues queries — matching BY STORED VALUE
  * instead of through the inverted index:
  *
  *  - [[DvPred.Numbers]]: `DocValuesNumbersQuery`
  *    (`lucene/sandbox/.../search/DocValuesNumbersQuery.java:46`) — the
  *    doc's numeric value is one of the given longs.
  *  - [[DvPred.Terms]]: `DocValuesTermsQuery` (`DocValuesTermsQuery
  *    .java:92`) — the doc's string value is one of the given terms.
  *  - [[DvPred.Range]]: `DocValuesRangeQuery.newLongRange`
  *    (`DocValuesRangeQuery.java:60`) — the value lands in
  *    [lower, upper] with per-bound inclusivity; a `None` bound is open
  *    (the reference's null). BOTH bounds `None` rewrites to the
  *    match-every-doc-with-a-value form (`DocValuesRangeQuery.java:
  *    134-139` returns `new FieldValueQuery(field)`).
  *
  * All three are constant-score (the reference wraps a docvalues
  * iterator in a ConstantScoreWeight); a doc with a NULL column value
  * never matches (no docvalues entry). Evaluated by
  * `Searcher.searchDocValues` (standalone) and `Searcher.searchDvFiltered`
  * (as the FILTER side of a scored query — the reference's dominant use,
  * a BooleanQuery FILTER clause).
  */
sealed trait DvPred extends Serializable
object DvPred {
  final case class Numbers(values: Set[Long]) extends DvPred
  final case class Terms(values: Set[String]) extends DvPred
  final case class Range(lower: Option[Long], upper: Option[Long],
      inclLower: Boolean = true, inclUpper: Boolean = true) extends DvPred
}

/** TermAutomatonQuery (`sandbox/.../search/TermAutomatonQuery.java:68`):
  * a determinized term automaton run over each candidate doc's merged
  * positions; freq = accept-landing count, scored BM25 like a phrase.
  * Build the automaton with [[TermAutomatonBuilder]]. Weight = float idf
  * fold over sorted DISTINCT PRESENT terms × (k1+1) × boost (the
  * convention every span weight here uses; the reference folds the same
  * per-term stats in hash order — same value up to float association).
  */
final case class TermAutomatonQ(automaton: TermAutomaton) extends Query

object Query {

  /** Convenience constructors. */
  def and(qs: Query*): Query = BoolQ(must = qs)
  def or(qs: Query*): Query = BoolQ(should = qs, minShouldMatch = 1)
  def orMin(m: Int, qs: Query*): Query = BoolQ(should = qs, minShouldMatch = m)
  def not(positive: Query, negative: Query): Query =
    BoolQ(must = Seq(positive), mustNot = Seq(negative))
  def terms(ts: String*): Seq[Query] = ts.map(TermQ)

  /** TermsQuery (`queries/TermsQuery.java:61`): matches any doc
    * containing at least one of the terms, constant score 1 regardless
    * of how many match — the reference rewrites to a constant-score
    * wrapper over the disjunction, exactly this tree.
    */
  def termsSet(ts: Seq[String]): Query =
    if (ts.isEmpty) MatchNoneQ
    else ConstScoreQ(BoolQ(should = terms(ts.distinct: _*)))

  /** Phrase against a CommonGrams-analyzed field
    * (`commongrams/CommonGramsQueryFilter.java:82-114`): the analyzed
    * query tokens run through the query-side gram reduction (grams
    * preferred, covered unigrams dropped), then phrase-match the gram
    * field — every emitted token has position increment 1, and an
    * indexed gram sits at its first word's position, so the reduced
    * sequence advances by exactly 1 per token.
    */
  def commonGramsPhrase(tokens: Seq[String], common: Set[String]): Query = {
    val qs = graft.core.Analysis.commonGramsQuery(tokens.toArray, common)
    if (qs.isEmpty) MatchNoneQ
    else if (qs.length == 1) TermQ(qs.head)
    else PhraseQ(qs.toSeq)
  }

  /** Rewrite to fixpoint (BooleanQuery.java:230-290 simplifications). */
  def rewrite(q: Query): Query = {
    val r = rewriteOnce(q)
    if (r == q) r else rewrite(r)
  }

  private def rewriteOnce(q: Query): Query = q match {
    case BoolQ(must, should, mustNot, filter, msm) =>
      // MUST MatchAll is KEPT: it both matches and contributes its boosted
      // 1.0 score (BooleanQuery.java rewrite never drops a MUST
      // MatchAllDocsQuery). A FILTER MatchAll is redundant only when some
      // other positive clause already constrains the doc set.
      val m = must.map(rewriteOnce)
      val s = should.map(rewriteOnce)
      val n = mustNot.map(rewriteOnce).filter(_ != MatchNoneQ)
      val f0 = filter.map(rewriteOnce)
      val f =
        if (m.nonEmpty || f0.exists(_ != MatchAllQ)) f0.filter(_ != MatchAllQ)
        else f0.distinct // filter-only MatchAll: keep one (matches all, score 0)
      if (m.contains(MatchNoneQ) || f.contains(MatchNoneQ)) MatchNoneQ
      else {
        val s2 = s.distinct
        val m2 = m.distinct
        val effMsm = math.max(msm, if (m2.isEmpty && f.isEmpty && s2.nonEmpty) 1 else msm)
        if (s2.count(_ != MatchNoneQ) < effMsm && s2.nonEmpty) MatchNoneQ
        else if (m2.isEmpty && f.isEmpty && n.isEmpty && s2.size == 1 && effMsm <= 1)
          s2.head // 1-clause unwrap
        else if (m2.size == 1 && s2.isEmpty && n.isEmpty && f.isEmpty)
          m2.head
        else if (m2.isEmpty && s2.isEmpty && f.isEmpty) MatchNoneQ
        else BoolQ(m2, s2.filter(_ != MatchNoneQ), n.distinct, f.distinct, msm)
      }
    case DisMaxQ(cs, tie) =>
      val c = cs.map(rewriteOnce).filter(_ != MatchNoneQ)
      if (c.isEmpty) MatchNoneQ
      else if (c.size == 1) c.head
      else DisMaxQ(c, tie)
    case BoostQ(inner, boost) =>
      val i = rewriteOnce(inner)
      if (i == MatchNoneQ) MatchNoneQ
      else if (boost == 1f) i
      else BoostQ(i, boost)
    case ConstScoreQ(inner, sc) =>
      val i = rewriteOnce(inner)
      if (i == MatchNoneQ) MatchNoneQ else ConstScoreQ(i, sc)
    case FuncAddedQ(iq, vs) =>
      val i = rewrite(iq)
      if (i == MatchNoneQ) MatchNoneQ else FuncAddedQ(i, vs)
    case FuncBoostedQ(iq, vs) =>
      val i = rewriteOnce(iq)
      if (i == MatchNoneQ) MatchNoneQ else FuncBoostedQ(i, vs)
    case CustomScoreQ(iq, vss, b) =>
      val i = rewriteOnce(iq)
      if (i == MatchNoneQ) MatchNoneQ else CustomScoreQ(i, vss, b)
    case BoostingQ(mq, c, b) =>
      val m = rewriteOnce(mq)
      val c2 = rewriteOnce(c)
      if (m == MatchNoneQ) MatchNoneQ
      // an unmatched context (or boost 1) multiplies nothing — pure match
      else if (c2 == MatchNoneQ || b == 1f) m
      else BoostingQ(m, c2, b)
    case SynonymQ(ts) if ts.isEmpty => MatchNoneQ
    case SynonymQ(ts) if ts.size == 1 => TermQ(ts.head)
    case BlendedQ(ts, _) if ts.isEmpty => MatchNoneQ
    // single member: blended df == its own df — plain TermQuery
    case BlendedQ(ts, _) if ts.size == 1 => TermQ(ts.head)
    case BlendedBoostedQ(ts, _) if ts.isEmpty => MatchNoneQ
    // single member collapses to a plain term ONLY when the df is real —
    // an artificial-df clause must keep its weight law
    case BlendedBoostedQ(ts, None) if ts.size == 1 =>
      if (ts.head._2 == 1f) TermQ(ts.head._1)
      else BoostQ(TermQ(ts.head._1), ts.head._2)
    case PhraseQ(ts, _) if ts.isEmpty => MatchNoneQ
    case PhraseQ(ts, _) if ts.size == 1 => TermQ(ts.head)
    case SpanNearQ(ts, _, _) if ts.isEmpty => MatchNoneQ
    case SpanOrQ(ts) if ts.isEmpty => MatchNoneQ
    // include == exclude: every occurrence self-excludes (q = p is
    // always inside the [p-pre, p+post] window since pre, post ≥ 0)
    case SpanNotQ(i, e, _, _) if i == e => MatchNoneQ
    // 1-clause span: every position is a width-0 span → freq = tf,
    // idf identical → rank-identical to the plain TermQuery
    case SpanNearQ(ts, _, _) if ts.size == 1 => TermQ(ts.head)
    // nested span-near: empty clause list or an empty union clause can
    // never match; duplicate members within a clause are one span stream
    case SpanNearOrQ(cs, _, _) if cs.isEmpty || cs.exists(_.isEmpty) =>
      MatchNoneQ
    case SpanNearOrQ(cs, s, io) if cs.exists(c => c.distinct != c) =>
      SpanNearOrQ(cs.map(_.distinct), s, io)
    // all-singleton clauses: plain term-clause span-near
    case SpanNearOrQ(cs, s, io) if cs.forall(_.size == 1) =>
      SpanNearQ(cs.map(_.head), s, io)
    // one clause: the near of a single union is the union itself
    case SpanNearOrQ(cs, _, _) if cs.size == 1 => SpanOrQ(cs.head)
    case MultiPhraseQ(ps, _) if ps.isEmpty || ps.exists(_.isEmpty) => MatchNoneQ
    case MultiPhraseQ(ps, s) if ps.forall(_.size == 1) =>
      PhraseQ(ps.map(_.head), s)
    // composed span tree: structural pruning; a dead root can't match
    case SpanQ(root) => Span.simplify(root) match {
      case None => MatchNoneQ
      case Some(r) => SpanQ(r)
    }
    case PayloadScoreQ(root, fn, inc) => Span.simplify(root) match {
      case None => MatchNoneQ
      case Some(r) => PayloadScoreQ(r, fn, inc)
    }
    case SpanPayloadCheckQ(root, pays) => Span.simplify(root) match {
      case None => MatchNoneQ
      case Some(r) => SpanPayloadCheckQ(r, pays)
    }
    case other => other
  }

  /** All literal terms a (rewritten) query touches — drives partition
    * pruning on the segment table. Multi-term expansions (prefix/regexp/
    * fuzzy/range) are resolved against the term dictionary separately.
    */
  /** Whether the (rewritten) tree can match docs through MatchAllQ even
    * when every literal term is absent from the index — gates the
    * searcher's "no terms → no hits" early returns.
    */
  def containsMatchAll(q: Query): Boolean = q match {
    case MatchAllQ => true
    case BoolQ(m, s, _, f, _) => (m ++ s ++ f).exists(containsMatchAll)
    case DisMaxQ(cs, _) => cs.exists(containsMatchAll)
    case BoostQ(i, _) => containsMatchAll(i)
    case ConstScoreQ(i, _) => containsMatchAll(i)
    case BoostingQ(mq, _, _) => containsMatchAll(mq)
    case _ => false
  }

  def literalTerms(q: Query): Set[String] = q match {
    case TermQ(t) => Set(t)
    case BoolQ(m, s, n, f, _) =>
      (m ++ s ++ n ++ f).flatMap(literalTerms).toSet
    case DisMaxQ(cs, _) => cs.flatMap(literalTerms).toSet
    case SynonymQ(ts) => ts.toSet
    case BlendedQ(ts, _) => ts.toSet
    case BlendedBoostedQ(ts, _) => ts.map(_._1).toSet
    case BoostQ(i, _) => literalTerms(i)
    case ConstScoreQ(i, _) => literalTerms(i)
    // the context's postings are read for membership even though only
    // the match side contributes weight
    case BoostingQ(mq, c, _) => literalTerms(mq) ++ literalTerms(c)
    case PhraseQ(ts, _) => ts.toSet
    case MultiPhraseQ(ps, _) => ps.flatten.toSet
    case SpanNearQ(ts, _, _) => ts.toSet
    case SpanNearOrQ(cs, _, _) => cs.flatten.toSet
    case SpanFirstQ(t, _) => Set(t)
    case SpanOrQ(ts) => ts.toSet
    // both terms' postings are read (the exclude list drives the window
    // veto), even though only the include term contributes weight
    case SpanNotQ(i, e, _, _) => Set(i, e)
    case SpanQ(root) => Span.allTerms(root).toSet
    case PayloadScoreQ(root, _, _) => Span.allTerms(root).toSet
    case SpanPayloadCheckQ(root, _) => Span.allTerms(root).toSet
    case TermAutomatonQ(ta) => ta.terms.toSet
    case _ => Set.empty
  }

  /** Scoring term leaves in CLAUSE ORDER with accumulated boosts — the
    * order `BooleanWeight.getValueForNormalization` (BooleanWeight.java:
    * 96-110) folds sum-of-squared-weights in. Boosts accumulate
    * TOP-DOWN ((outer × next) × …), the order `Weight.normalize`
    * threads topLevelBoost through nested BoostQuery weights. Filter
    * and mustNot clauses are non-scoring; ConstantScore subtrees
    * normalize independently.
    */
  def termLeavesInOrder(q: Query, boost: Float = 1f): Seq[(String, Float)] =
    q match {
      case TermQ(t) => Seq((t, boost))
      case BoostQ(i, b) => termLeavesInOrder(i, boost * b)
      case BoolQ(m, s, _, _, _) =>
        (m ++ s).flatMap(termLeavesInOrder(_, boost))
      case DisMaxQ(cs, _) => cs.flatMap(termLeavesInOrder(_, boost))
      case _ => Nil
    }
}
