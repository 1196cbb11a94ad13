package graft.search

/** Classic query-string parser — the reference's QueryParser surface
  * (`lucene/queryparser/.../classic/QueryParserBase.java:106-118`,
  * grammar in QueryParser.jj) re-implemented as a small recursive-descent
  * parser over the subset the engine executes (single field, so the
  * `field:` prefix is accepted and ignored):
  *
  *   query    := clause+                       (implicit OR, like default OR operator)
  *   clause   := [+|-] boolean
  *   boolean  := part (('AND'|'OR'|'&&'|'||') part)*
  *   part     := group | phrase | range | term
  *   group    := '(' query ')' ['^' boost]
  *   phrase   := '"' words '"'
  *   range    := '[' term 'TO' term ']' | '{' term 'TO' term '}'
  *   term     := word ['*'] ['~' edits] ['^' boost]
  *
  * '+' = MUST, '-' = MUST_NOT (BooleanQuery occurs); trailing '*' =
  * PrefixQ; '~' = FuzzyQ; '^f' = BoostQ. Query-time analysis lowercases
  * terms via the simple analyzer (`QueryParserBase` runs the analyzer on
  * terms the same way).
  */
object QueryParser {

  final case class ParseError(msg: String, pos: Int)
    extends RuntimeException(s"$msg at $pos")

  /** Solr dismax/edismax end-user surface, single-field specialization
    * (`solr/core/src/java/org/apache/solr/search/DisMaxQParser.java:40-80`):
    * the user string is analyzed into terms — per-term dismax over fields
    * degenerates to the term itself with one field — combined as SHOULD
    * with minimum-match `mm` (Solr mm spec subset: "N", "-N", "P%",
    * "-P%"; `DisMaxQParser.parseMinShouldMatch` →
    * `SolrPluginUtils.setMinShouldMatch`). `tie` is accepted for API
    * parity; it only matters with >1 field.
    */
  def parseDisMax(input: String, mm: String = "1", tie: Float = 0f): Query = {
    val terms = graft.core.Analysis.simpleTokens(input)
    if (terms.isEmpty) throw ParseError("empty dismax query", 0)
    val msm = resolveMm(mm, terms.length)
    Query.rewrite(BoolQ(should = terms.toSeq.map(TermQ.apply),
      minShouldMatch = math.max(msm, 1)))
  }

  /** Solr mm spec subset: "3" = 3; "-2" = n-2; "75%" = floor(0.75n);
    * "-25%" = n - floor(0.25n) (SolrPluginUtils.calculateMinShouldMatch).
    */
  def resolveMm(mm: String, n: Int): Int = {
    val s = mm.trim
    val v =
      if (s.endsWith("%")) {
        val p = s.dropRight(1).toInt
        if (p < 0) n - (n * -p) / 100 else (n * p) / 100
      } else {
        val p = s.toInt
        if (p < 0) n + p else p
      }
    math.min(n, math.max(v, 0))
  }

  def parse(input: String): Query = {
    val p = new P(input)
    val q = p.parseQuery()
    p.skipWs()
    if (!p.eof) throw ParseError(s"unexpected '${p.rest}'", p.pos)
    Query.rewrite(q)
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def rest: String = s.substring(pos)
    def peek: Char = s.charAt(pos)
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1

    def parseQuery(): Query = {
      val must = Seq.newBuilder[Query]
      val mustNot = Seq.newBuilder[Query]
      val should = Seq.newBuilder[Query]
      var any = false
      while ({ skipWs(); !eof && peek != ')' }) {
        any = true
        val occ =
          if (peek == '+') { pos += 1; '+' }
          else if (peek == '-') { pos += 1; '-' }
          else ' '
        val q = parseBoolean()
        occ match {
          case '+' => must += q
          case '-' => mustNot += q
          case _ => should += q
        }
      }
      if (!any) throw ParseError("empty query", pos)
      val (m, n, sh) = (must.result(), mustNot.result(), should.result())
      if (m.isEmpty && n.isEmpty && sh.size == 1) sh.head
      else if (n.nonEmpty && m.isEmpty && sh.isEmpty)
        throw ParseError("pure negative query", pos)
      else BoolQ(must = m, should = sh, mustNot = n,
        minShouldMatch = if (m.isEmpty && sh.nonEmpty) 1 else 0)
    }

    def parseBoolean(): Query = {
      var left = parsePart()
      var done = false
      while (!done) {
        val save = pos
        skipWs()
        val op = keyword()
        op match {
          case Some("AND") | Some("&&") =>
            // flatten chains: 'a AND b AND c' → ONE BoolQ(+a +b +c) like the
            // reference parser's flat BooleanQuery (nested conjunctions
            // would round the inner float sum before the outer add)
            val right = parsePart()
            left = left match {
              case BoolQ(m, Seq(), Seq(), Seq(), 0) if m.nonEmpty =>
                BoolQ(must = m :+ right)
              case other => Query.and(other, right)
            }
          case Some("OR") | Some("||") =>
            val right = parsePart()
            left = left match {
              case BoolQ(Seq(), sh, Seq(), Seq(), 1) =>
                BoolQ(should = sh :+ right, minShouldMatch = 1)
              case other => Query.or(other, right)
            }
          case _ => pos = save; done = true
        }
      }
      left
    }

    private def keyword(): Option[String] = {
      for (k <- Seq("AND", "OR", "&&", "||")) {
        if (s.regionMatches(pos, k, 0, k.length)) {
          val after = pos + k.length
          val boundary = after >= s.length || !s.charAt(after).isLetterOrDigit
          if (boundary) { pos = after; return Some(k) }
        }
      }
      None
    }

    def parsePart(): Query = {
      skipWs()
      if (eof) throw ParseError("expected clause", pos)
      peek match {
        case '(' =>
          pos += 1
          val q = parseQuery()
          skipWs()
          expect(')')
          withBoost(q)
        case '"' => withBoost(parsePhrase())
        case '[' | '{' => withBoost(parseRange())
        case _ => parseTerm()
      }
    }

    private def expect(c: Char): Unit = {
      if (eof || peek != c) throw ParseError(s"expected '$c'", pos)
      pos += 1
    }

    private def parsePhrase(): Query = {
      expect('"')
      val start = pos
      while (!eof && peek != '"') pos += 1
      val raw = s.substring(start, pos)
      expect('"')
      val terms = graft.core.Analysis.simpleTokens(raw).toSeq
      if (terms.isEmpty) throw ParseError("empty phrase", pos)
      PhraseQ(terms)
    }

    private def parseRange(): Query = {
      val inclLo = peek == '['
      pos += 1
      val lo = word()
      skipWs()
      if (!s.regionMatches(pos, "TO", 0, 2)) throw ParseError("expected TO", pos)
      pos += 2
      skipWs()
      val hi = word()
      skipWs()
      val inclHi =
        if (!eof && (peek == ']' || peek == '}')) { val c = peek; pos += 1; c == ']' }
        else throw ParseError("expected ] or }", pos)
      TermRangeQ(analyzeOne(lo), analyzeOne(hi), inclLo, inclHi)
    }

    private def word(): String = {
      skipWs()
      val start = pos
      while (!eof && !" \t\n()\"[]{}^~*:".contains(peek)) pos += 1
      if (pos == start) throw ParseError("expected word", pos)
      s.substring(start, pos)
    }

    private def analyzeOne(w: String): String = {
      val toks = graft.core.Analysis.simpleTokens(w)
      if (toks.length != 1) throw ParseError(s"'$w' analyzes to ${toks.length} tokens", pos)
      toks(0)
    }

    /** Word including embedded wildcard chars (for `te*t` / `te?t`). */
    private def wildcardWord(): String = {
      skipWs()
      val start = pos
      while (!eof && !" \t\n()\"[]{}^~:".contains(peek)) pos += 1
      if (pos == start) throw ParseError("expected word", pos)
      s.substring(start, pos)
    }

    /** Lowercase the literal runs of a wildcard pattern, keep `*`/`?`. */
    private def analyzeWildcard(w: String): String = {
      val lowered = w.toLowerCase(java.util.Locale.ROOT)
      require(lowered.exists(c => c != '*' && c != '?'),
        "pure-wildcard term not allowed")
      lowered
    }

    private def parseTerm(): Query = {
      var w = wildcardWord()
      // field: prefix — single-field engine, accept and drop
      if (!eof && peek == ':' ) { pos += 1; w = wildcardWord() }
      val hasStar = w.contains('*')
      val hasQm = w.contains('?')
      var q: Query =
        if (hasStar && w.indexOf('*') == w.length - 1 && !hasQm &&
            w.count(_ == '*') == 1)
          PrefixQ(analyzeOne(w.dropRight(1)))    // trailing-only star
        else if (hasStar || hasQm)
          WildcardQ(analyzeWildcard(w))          // mid-token wildcard
        else if (!eof && peek == '~') {
          pos += 1
          val edits =
            if (!eof && peek.isDigit) { val d = peek - '0'; pos += 1; d }
            else 2
          FuzzyQ(analyzeOne(w), edits)
        } else TermQ(analyzeOne(w))
      withBoost(q)
    }

    private def withBoost(q: Query): Query = {
      if (!eof && peek == '^') {
        pos += 1
        val start = pos
        while (!eof && (peek.isDigit || peek == '.')) pos += 1
        if (pos == start) throw ParseError("expected boost value", pos)
        BoostQ(q, s.substring(start, pos).toFloat)
      } else q
    }
  }
}
