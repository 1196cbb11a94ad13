package graft.core

import java.util.Locale

/** Analysis chain: pure `String => Array[String]` token functions used in
  * `flatMap`/`explode`. The reference's pull-based TokenStream pipeline
  * (`lucene/core/src/java/org/apache/lucene/analysis/`, 47 files) collapses
  * to plain functions because Spark's `explode` is the Generator.
  *
  * Field length (the norm input) = number of emitted tokens — the engine
  * emits no position-increment-0 overlap tokens, so this equals the
  * reference's `state.getLength() - state.getNumOverlap()`
  * (`BM25Similarity.java:146-150` with discountOverlaps=true).
  */
object Analysis {

  /** Max token length; longer tokens are dropped, matching
    * `StandardAnalyzer.maxTokenLength` default semantics
    * (`analysis/standard/StandardAnalyzer.java:56`, default 255).
    */
  val MaxTokenLength = 255

  /** English stop set of the reference's StandardAnalyzer
    * (`analysis/core/StopAnalyzer.java:45-50` ENGLISH_STOP_WORDS_SET,
    * used by `StandardAnalyzer.java:41-62`).
    */
  val EnglishStopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by",
    "for", "if", "in", "into", "is", "it",
    "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with")

  /** Oracle-parity tokenizer: lowercase ASCII alphanumeric runs.
    * Deliberately expressible in ANSI SQL
    * (`regexp_split_to_array(lower(text), '[^a-z0-9]+')`) so DuckDB can act
    * as the correctness oracle. No stopwords, no length cap games: a token
    * is a maximal [A-Za-z0-9]+ run, lowercased (ASCII-only lowercase, so
    * JVM and DuckDB agree on every input).
    */
  def simpleTokens(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    val sb = new java.lang.StringBuilder(16)
    while (i < n) {
      val c = text.charAt(i)
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      val isUp = c >= 'A' && c <= 'Z'
      if (isTok || isUp) {
        sb.append(if (isUp) (c + 32).toChar else c)
      } else if (sb.length > 0) {
        if (sb.length <= MaxTokenLength) out += sb.toString
        sb.setLength(0)
      }
      i += 1
    }
    if (sb.length > 0 && sb.length <= MaxTokenLength) out += sb.toString
    out.toArray
  }

  /** (start, len) pairs — one flat Int array — of every token
    * [[simpleTokens]] emits, in emission order: the offsets analog of the
    * reference's `IndexOptions..._AND_OFFSETS`
    * (`codecs/lucene50/Lucene50PostingsFormat.java:42-63`), kept doc-major
    * on the row store so exact-offset highlighting needs no re-tokenize.
    * Bounds index the ORIGINAL string; the emitted token text is
    * lowercase(text.substring(start, start + len)). Over-long runs
    * (> MaxTokenLength) are dropped exactly like [[simpleTokens]] drops
    * their token.
    */
  def simpleTokenBounds(text: String): Array[Int] = {
    if (text == null || text.isEmpty) return Array.emptyIntArray
    val out = new scala.collection.mutable.ArrayBuilder.ofInt()
    val n = text.length
    var i = 0
    var runStart = -1
    while (i < n) {
      val c = text.charAt(i)
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        (c >= 'A' && c <= 'Z')
      if (isTok) { if (runStart < 0) runStart = i }
      else if (runStart >= 0) {
        val len = i - runStart
        if (len <= MaxTokenLength) { out += runStart; out += len }
        runStart = -1
      }
      i += 1
    }
    if (runStart >= 0) {
      val len = n - runStart
      if (len <= MaxTokenLength) { out += runStart; out += len }
    }
    out.result()
  }

  /** Code tokenizer: splits identifiers the way the reference's
    * WordDelimiterFilter does for source code
    * (`lucene/analysis/common/.../miscellaneous/WordDelimiterFilter.java:84`):
    * camelCase humps, snake_case parts, letter/digit transitions — then
    * lowercases. Emits the split PARTS only (generateWordParts +
    * generateNumberParts, no catenation), each as its own token.
    *
    * "getHttpResponse2" → [get, http, response, 2]
    * "parse_JSON_fast"  → [parse, json, fast]
    */
  def codeTokens(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    while (i < n) {
      // skip non-alnum
      while (i < n && !Character.isLetterOrDigit(text.charAt(i))) i += 1
      val start = i
      while (i < n && Character.isLetterOrDigit(text.charAt(i))) i += 1
      if (i > start) splitWord(text, start, i, out)
    }
    out.toArray
  }

  /** Split one alnum run [start, end) on case/type transitions, lowercase. */
  private def splitWord(s: String, start: Int, end: Int,
      out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    var partStart = start
    var i = start + 1
    def emit(from: Int, to: Int): Unit = {
      val len = to - from
      if (len > 0 && len <= MaxTokenLength)
        out += s.substring(from, to).toLowerCase(Locale.ROOT)
    }
    while (i < end) {
      val prev = s.charAt(i - 1)
      val c = s.charAt(i)
      val boundary =
        // aA — lower→upper camel hump
        (Character.isLowerCase(prev) && Character.isUpperCase(c)) ||
        // letter↔digit transition
        (Character.isLetter(prev) != Character.isLetter(c)) ||
        // AAa — end of an acronym run: "HTTPServer" → HTTP | Server
        (Character.isUpperCase(prev) && Character.isUpperCase(c) &&
          i + 1 < end && Character.isLowerCase(s.charAt(i + 1)))
      if (boundary) {
        emit(partStart, i)
        partStart = i
      }
      i += 1
    }
    emit(partStart, end)
  }

  /** StandardAnalyzer-like chain for natural-language fields: simple
    * tokens + English stop filter (`StandardAnalyzer.java:101-106`).
    */
  def standardTokens(text: String): Array[String] =
    simpleTokens(text).filterNot(EnglishStopWords.contains)

  /** Unicode word-break tokenizer — a UAX#29 subset covering what the
    * reference's StandardTokenizer emits
    * (`analysis/standard/StandardTokenizer.java:38,155-170` token types):
    *
    *  - IDEOGRAPHIC / HIRAGANA: one token per code point (Han and
    *    Hiragana get no word boundaries in UAX#29; the reference emits
    *    them singly so phrase/positional search still works)
    *  - KATAKANA: maximal Katakana runs (WB13 keeps Katakana together,
    *    breaks against other letters)
    *  - ALPHANUM: maximal runs of letters/digits of any other script,
    *    combining marks (Mn/Mc) extend the current run (WB4 ExtendFormat)
    *
    * Everything else breaks. Tokens are lowercased (Locale.ROOT) and
    * length-capped like the other chains. On pure ASCII this emits
    * exactly [[simpleTokens]] minus nothing — ASCII letters/digits form
    * the same runs — so existing ASCII-corpus oracles stay valid.
    */
  def unicodeTokens(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder(16)
    // 0 = none, 1 = alphanum run, 2 = katakana run
    var mode = 0
    def flush(): Unit = {
      if (sb.length > 0 && sb.length <= MaxTokenLength)
        out += sb.toString.toLowerCase(Locale.ROOT)
      sb.setLength(0)
      mode = 0
    }
    var i = 0
    val n = text.length
    while (i < n) {
      val cp = text.codePointAt(i)
      val cc = Character.charCount(cp)
      val script =
        try Character.UnicodeScript.of(cp)
        catch { case _: IllegalArgumentException => Character.UnicodeScript.UNKNOWN }
      val tpe = Character.getType(cp)
      val isMark = tpe == Character.NON_SPACING_MARK ||
        tpe == Character.COMBINING_SPACING_MARK
      if (script == Character.UnicodeScript.HAN ||
          script == Character.UnicodeScript.HIRAGANA) {
        flush()
        sb.appendCodePoint(cp)
        flush()
      } else if (script == Character.UnicodeScript.KATAKANA) {
        if (mode != 2) flush()
        mode = 2
        sb.appendCodePoint(cp)
      } else if (Character.isLetterOrDigit(cp)) {
        if (mode == 2) flush()
        mode = 1
        sb.appendCodePoint(cp)
      } else if (isMark && mode != 0) {
        sb.appendCodePoint(cp) // combining mark extends the open run
      } else {
        flush()
      }
      i += cc
    }
    flush()
    out.toArray
  }

  /** CJKBigramFilter over the standard chain (`analysis/common/.../cjk/
    * CJKBigramFilter.java:40-230`, all four script flags, the
    * CJKAnalyzer default outputUnigrams = false): every maximal run of
    * ADJACENT CJK codepoints (Han / Hiragana / Katakana / Hangul — the
    * filter buffers aligned-offset codepoints regardless of how the
    * upstream tokenizer grouped them, so katakana runs bigram
    * per-codepoint too) emits its consecutive codepoint bigrams
    * (`<DOUBLE>`), a LONE CJK codepoint emits its unigram (`<SINGLE>`),
    * and non-CJK text follows the lowercase-alnum word law. Every
    * emitted token advances one position (posInc 1), so the flat form is
    * exact.
    */
  def cjkBigramTokens(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val word = new java.lang.StringBuilder(16)
    val run = scala.collection.mutable.ArrayBuffer.empty[Int]
    def flushWord(): Unit = {
      if (word.length > 0 && word.length <= MaxTokenLength)
        out += word.toString.toLowerCase(Locale.ROOT)
      word.setLength(0)
    }
    def flushRun(): Unit = {
      if (run.length == 1) out += new String(Character.toChars(run(0)))
      else {
        var i = 0
        while (i < run.length - 1) {
          out += new String(Character.toChars(run(i))) +
            new String(Character.toChars(run(i + 1)))
          i += 1
        }
      }
      run.clear()
    }
    def isCjk(cp: Int): Boolean = {
      val s =
        try Character.UnicodeScript.of(cp)
        catch { case _: IllegalArgumentException => Character.UnicodeScript.UNKNOWN }
      s == Character.UnicodeScript.HAN ||
        s == Character.UnicodeScript.HIRAGANA ||
        s == Character.UnicodeScript.KATAKANA ||
        s == Character.UnicodeScript.HANGUL
    }
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (isCjk(cp)) { flushWord(); run += cp }
      else if (Character.isLetterOrDigit(cp)) {
        if (run.nonEmpty) flushRun()
        word.appendCodePoint(cp)
      } else {
        flushWord(); if (run.nonEmpty) flushRun()
      }
      i += Character.charCount(cp)
    }
    flushWord(); if (run.nonEmpty) flushRun()
    out.toArray
  }

  /** PatternTokenizer (`lucene/analysis/common/.../pattern/
    * PatternTokenizer.java:43`, group = -1 split semantics): tokens are
    * the runs BETWEEN regex matches, lowercased, length-capped.
    */
  def patternTokens(pattern: String): String => Array[String] = {
    val re = java.util.regex.Pattern.compile(pattern)
    (text: String) =>
      if (text == null || text.isEmpty) Array.empty
      else re.split(text, -1).iterator
        .filter(t => t.nonEmpty && t.length <= MaxTokenLength)
        .map(_.toLowerCase(Locale.ROOT))
        .toArray
  }

  /** EdgeNGramTokenFilter (`lucene/analysis/common/.../ngram/
    * EdgeNGramTokenFilter.java:33`): leading-edge n-grams of each token,
    * minGram..maxGram — the search-as-you-type expansion. Tokens shorter
    * than minGram are dropped, grams are capped at the token length.
    */
  def edgeNGrams(tokens: Array[String], minGram: Int,
      maxGram: Int): Array[String] = {
    require(minGram >= 1 && maxGram >= minGram)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    tokens.foreach { t =>
      var g = minGram
      val hi = math.min(maxGram, t.length)
      while (g <= hi) { out += t.substring(0, g); g += 1 }
    }
    out.toArray
  }

  /** ShingleFilter (`lucene/analysis/common/.../shingle/ShingleFilter
    * .java:35-70`) in its outputUnigrams = false configuration: token
    * n-grams joined with the DEFAULT_TOKEN_SEPARATOR " ", one shingle
    * per start position (posInc 1 each — the flat-array position
    * convention holds). The phrase-as-term field pattern: an index built
    * on shingles answers n-word phrase queries as SINGLE-term lookups —
    * at scale, a phrase query stops touching positions entirely.
    */
  def shingles(tokens: Array[String], n: Int): Array[String] = {
    require(n >= 2, "shingle size >= 2")
    if (tokens.length < n) Array.empty
    else Array.tabulate(tokens.length - n + 1)(i =>
      tokens.slice(i, i + n).mkString(" "))
  }

  /** CommonGramsFilter (`analysis/common/.../commongrams/
    * CommonGramsFilter.java:52-188`): index-side bigram overlay for
    * frequent terms. Every unigram is kept at its position; whenever the
    * previous token was common OR the current token is common (and a
    * previous token exists), a gram `prev_cur` is additionally emitted
    * at the PREVIOUS token's position (the reference's
    * posInc-0 + posLen-2 overlay, CommonGramsFilter.java:170-187).
    * Returns (term, position) pairs in the reference's emission order
    * (gram immediately before the unigram it ends on); field length for
    * norms counts UNIGRAMS only — grams are position-increment-0
    * overlaps, discounted exactly like the reference's
    * `state.getLength() - state.getNumOverlap()`
    * (BM25Similarity.java:146-150, discountOverlaps=true).
    */
  def commonGrams(tokens: Array[String],
      common: Set[String]): Array[(String, Int)] = {
    if (tokens.isEmpty) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[(String, Int)](
      tokens.length + 4)
    var i = 0
    var lastWasCommon = false
    while (i < tokens.length) {
      val isCommon = common.contains(tokens(i))
      if (i > 0 && (lastWasCommon || isCommon))
        out += ((tokens(i - 1) + "_" + tokens(i), i - 1))
      out += ((tokens(i), i))
      lastWasCommon = isCommon
      i += 1
    }
    out.toArray
  }

  /** CommonGramsQueryFilter (`commongrams/CommonGramsQueryFilter.java:
    * 82-114`) composed over [[commonGrams]]: the query-side reduction —
    * grams are preferred, a unigram survives only when not covered on
    * its gram side per the reference's held-previous algorithm:
    * hold each token; emit the held token when a NON-gram arrives; a
    * gram arriving DROPS the held token; at exhaustion the held token is
    * emitted unless the last emission was a gram. Every emitted token
    * gets position increment 1 (the filter forces gram posInc to 1), so
    * positions are simply 0..k-1 — a phrase over the output matches the
    * [[commonGrams]]-indexed field. The full reference test matrix
    * (CommonGramsFilterTest.java:90-158) is pinned in CoreSpec.
    */
  def commonGramsQuery(tokens: Array[String],
      common: Set[String]): Array[String] = {
    val stream = commonGrams(tokens, common) // (term, pos); gram iff '_'
    def isGram(ix: Int): Boolean = {
      // grams are the only emissions whose position != their running
      // unigram position — cheaper and collision-free vs checking '_'
      // (simpleTokens can never emit '_'): a gram repeats the PREVIOUS
      // position; detect by comparing with the previous element
      ix > 0 && stream(ix)._2 == stream(ix - 1)._2
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var held: String = null
    var heldGram = false
    var lastEmittedWasGram = false
    var i = 0
    while (i < stream.length) {
      val gram = isGram(i)
      if (held != null && !gram) {
        out += held
        lastEmittedWasGram = heldGram
      }
      held = stream(i)._1
      heldGram = gram
      i += 1
    }
    if (held != null && !lastEmittedWasGram) out += held
    out.toArray
  }

  /** Parsed index-time synonym rules (the SynonymFilter +
    * SolrSynonymParser surface,
    * `analysis/common/.../synonym/SynonymFilter.java:33-96`,
    * `SolrSynonymParser.java:30-55`):
    *
    *   "a,b,c"   expansion group (expand=true): each member keeps the
    *             original token and emits the OTHER members as
    *             position-increment-0 overlays (keepOrig)
    *   "a=>b,c"  directed rule: occurrences of `a` are REPLACED by the
    *             outputs at `a`'s position (keepOrig=false)
    *
    * Single-token inputs and outputs only — the reference additionally
    * buffers multi-word synonyms into its sausage encoding; that subset
    * is out of scope here and rejected at parse (no spaces allowed).
    */
  final case class SynonymRules(
      expand: Map[String, Array[String]],
      directed: Map[String, Array[String]])

  def parseSynonymRules(spec: String): SynonymRules = {
    val exp = scala.collection.mutable.Map.empty[String, Array[String]]
    val dir = scala.collection.mutable.Map.empty[String, Array[String]]
    spec.split(";").map(_.trim).filter(_.nonEmpty).foreach { rule =>
      require(!rule.contains(" "),
        s"multi-word synonyms are not supported: '$rule'")
      if (rule.contains("=>")) {
        val Array(lhs, rhs) = rule.split("=>", 2)
        val outs = rhs.split(",").map(_.trim).filter(_.nonEmpty)
        require(lhs.trim.nonEmpty && outs.nonEmpty, s"bad rule '$rule'")
        dir(lhs.trim) = dir.getOrElse(lhs.trim, Array.empty) ++ outs
      } else {
        val members = rule.split(",").map(_.trim).filter(_.nonEmpty)
        require(members.length >= 2, s"expansion group needs >= 2: '$rule'")
        members.foreach { m =>
          val others = members.filter(_ != m)
          exp(m) = (exp.getOrElse(m, Array.empty) ++ others).distinct
        }
      }
    }
    val overlap = exp.keySet intersect dir.keySet
    require(overlap.isEmpty,
      s"tokens both expanded and replaced: ${overlap.mkString(",")}")
    SynonymRules(exp.toMap, dir.toMap)
  }

  /** Apply [[SynonymRules]] to a token stream: (term, position) pairs
    * with overlays/replacements at the source token's position. The
    * caller's norm length is the REAL position count `tokens.length`
    * (discountOverlaps — replacements occupy the source position).
    */
  def synonymTokens(tokens: Array[String],
      rules: SynonymRules): Array[(String, Int)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(String, Int)](
      tokens.length + 4)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      rules.directed.get(t) match {
        case Some(repls) =>
          repls.foreach(r => out += ((r, i)))
        case None =>
          out += ((t, i))
          rules.expand.get(t).foreach(_.foreach(syn => out += ((syn, i))))
      }
      i += 1
    }
    out.toArray
  }

  /** One multi-word synonym rule: `matchSeq` consumes that many
    * consecutive input tokens; each output is a word sequence stacked
    * into the sausage.
    */
  final case class SynRule(matchSeq: Vector[String],
      outputs: Seq[Vector[String]], keepOrig: Boolean)

  /** Multi-word synonym rules — the FULL SynonymFilter surface
    * (`analysis/common/.../synonym/SynonymFilter.java:33-96`): spaces
    * inside rule sides are word separators (SynonymMap.WORD_SEPARATOR).
    * Identical left-hand sides merge (the FST unions their outputs and
    * ORs keepOrig).
    */
  def parseSynGraphRules(spec: String): Seq[SynRule] = {
    def words(s: String): Vector[String] =
      s.trim.split("\\s+").toVector.filter(_.nonEmpty)
    val rules = scala.collection.mutable.ArrayBuffer.empty[SynRule]
    spec.split(";").map(_.trim).filter(_.nonEmpty).foreach { rule =>
      if (rule.contains("=>")) {
        val Array(lhs, rhs) = rule.split("=>", 2)
        val m = words(lhs)
        val outs = rhs.split(",").map(words).filter(_.nonEmpty).toSeq
        require(m.nonEmpty && outs.nonEmpty, s"bad rule '$rule'")
        rules += SynRule(m, outs, keepOrig = false)
      } else {
        val members = rule.split(",").map(words).filter(_.nonEmpty).toSeq
        require(members.length >= 2, s"expansion group needs >= 2: '$rule'")
        members.foreach { m =>
          rules += SynRule(m, members.filterNot(_ == m), keepOrig = true)
        }
      }
    }
    rules.groupBy(_.matchSeq).map { case (m, rs) =>
      SynRule(m, rs.flatMap(_.outputs).distinct.toSeq, rs.exists(_.keepOrig))
    }.toSeq
  }

  /** The SynonymFilter "sausage" flattening
    * (`SynonymFilter.java:66-84` NOTE, `addOutput:...`, emit loop):
    *
    *  - greedy longest match starting at each unconsumed position;
    *    after a match of input length L, parsing resumes AFTER the span
    *  - output word j of a match at position p is stacked on slot p+j —
    *    slots may run past the match span (overlapping later input
    *    tokens) and past the end of the stream
    *  - assembly walks slots in order: a slot emits its original token
    *    (when unmatched, or matched with keepOrig — keepOrig marks the
    *    WHOLE span) at a fresh position with its stacked outputs at
    *    position-increment 0; a slot with only outputs emits them all at
    *    one fresh position; a consumed slot with no outputs VANISHES
    *    (replace compaction — "a b => x" leaves no position hole)
    *
    * Returns (position count = norm length, (term, position) pairs).
    */
  def synonymSausage(tokens: Array[String],
      rules: Seq[SynRule]): (Int, Array[(String, Int)]) = {
    val byFirst = rules.groupBy(_.matchSeq.head)
    val n = tokens.length
    val slotOut = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[String]]
    val consumed = new Array[Boolean](n)
    val keepO = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val cands = byFirst.getOrElse(tokens(i), Nil).filter { r =>
        r.matchSeq.length <= n - i &&
          r.matchSeq.indices.forall(j => tokens(i + j) == r.matchSeq(j))
      }
      if (cands.nonEmpty) {
        val r = cands.maxBy(_.matchSeq.length) // greedy; LHS are merged
        val L = r.matchSeq.length
        for (o <- r.outputs; j <- o.indices)
          slotOut.getOrElseUpdate(i + j,
            scala.collection.mutable.ArrayBuffer.empty[String]) += o(j)
        var j = 0
        while (j < L) {
          consumed(i + j) = true
          if (r.keepOrig) keepO(i + j) = true
          j += 1
        }
        i += L
      } else i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[(String, Int)](n + 8)
    var q = -1
    val maxSlot = math.max(n - 1,
      if (slotOut.isEmpty) -1 else slotOut.keys.max)
    var s = 0
    while (s <= maxSlot) {
      val orig = s < n && (!consumed(s) || keepO(s))
      val outs = slotOut.getOrElse(s, null)
      if (orig) {
        q += 1
        out += ((tokens(s), q))
        if (outs != null) outs.foreach(w => out += ((w, q)))
      } else if (outs != null && outs.nonEmpty) {
        q += 1
        outs.foreach(w => out += ((w, q)))
      }
      s += 1
    }
    (q + 1, out.toArray)
  }

  /** Payload-producing token filters (the reference's payload filter
    * family, `lucene/analysis/common/.../payloads/`): each policy maps an
    * occurrence (token, position) to the possibly-rewritten term plus a
    * FLOAT payload ([[graft.index.PostingsCodec.NoPayload]] NaN = none —
    * the reference's null payload, skipped by payload collectors). The
    * reference stores opaque bytes decoded by a pluggable
    * `Similarity.scorePayload`; this engine fixes the decode convention
    * at STORE time instead (floats in the sidecar), which is the
    * float-encoder setup every published payload-scoring deployment uses
    * (`payloads/DelimitedPayloadTokenFilter.java:36` with its default
    * FloatEncoder).
    *
    *   "pos"            payload = the token position
    *                    (TokenOffsetPayloadTokenFilter.java:31 analog,
    *                    token-index flavored)
    *   "len"            payload = the token's length in chars
    *   "delimited:<c>"  token "term<c>1.5" → term "term", payload 1.5f;
    *                    no delimiter → no payload
    *                    (DelimitedPayloadTokenFilter.java:36-77)
    */
  object Payloads {
    /** (token, position) => (term, payloadOrNaN). */
    type Fn = (String, Int) => (String, Float)

    def policy(name: String): Fn = name match {
      case "pos" => (t, p) => (t, p.toFloat)
      case "len" => (t, _) => (t, t.length.toFloat)
      case d if d.startsWith("delimited:") =>
        val delim = d.stripPrefix("delimited:")
        require(delim.length == 1, s"delimited payload policy needs one delimiter char: $d")
        val c = delim.charAt(0)
        (t, _) => {
          val i = t.lastIndexOf(c)
          if (i < 0) (t, Float.NaN)
          else (t.substring(0, i), t.substring(i + 1).toFloat)
        }
      case other => sys.error(s"unknown payload policy: $other")
    }
  }

  // ---------- CharFilter stages (text → text, BEFORE the tokenizer) ----------
  //
  // The reference's charfilter family (`analysis/common/src/java/org/
  // apache/lucene/analysis/charfilter/`): HTMLStripCharFilter,
  // MappingCharFilter, and PatternReplaceCharFilter run on the raw
  // character stream ahead of tokenization. This engine composes them via
  // '!'-separated tokenizer specs ("htmlstrip!simple"); offset correction
  // is NOT maintained (charfiltered chains use the re-tokenize
  // highlighter path — build such fields with offsets off).

  private val HtmlComment = "(?s)<!--.*?-->".r
  private val HtmlScript = "(?is)<script\\b[^>]*>.*?</script>".r
  private val HtmlStyle = "(?is)<style\\b[^>]*>.*?</style>".r
  private val HtmlTag = "(?s)</?[a-zA-Z!][^>]*>".r
  private val HtmlEntity = "&(#x?[0-9a-fA-F]+|[a-zA-Z]+);".r
  private val HtmlNamedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** HTMLStripCharFilter subset (`charfilter/HTMLStripCharFilter.jflex`
    * semantics, re-derived): comments, script/style blocks and tags are
    * replaced by a space (so adjacent words don't merge); the common
    * named entities and all numeric character references are decoded.
    * Disclosed subset: no CDATA, no entity decode inside attributes (the
    * attributes are stripped with their tag anyway).
    */
  def htmlStrip(s: String): String = {
    var t = HtmlComment.replaceAllIn(s, " ")
    t = HtmlScript.replaceAllIn(t, " ")
    t = HtmlStyle.replaceAllIn(t, " ")
    t = HtmlTag.replaceAllIn(t, " ")
    HtmlEntity.replaceAllIn(t, m => {
      val body = m.group(1)
      val rep =
        if (body.startsWith("#x") || body.startsWith("#X"))
          new String(Character.toChars(Integer.parseInt(body.drop(2), 16)))
        else if (body.startsWith("#"))
          new String(Character.toChars(body.drop(1).toInt))
        else HtmlNamedEntities.getOrElse(body, m.matched)
      scala.util.matching.Regex.quoteReplacement(rep)
    })
  }

  /** MappingCharFilter (`charfilter/MappingCharFilter.java:36`): greedy
    * longest-match rewrite over an ordered rule set — at each input
    * position the LONGEST matching source wins (the reference's FST walk
    * keeps extending while arcs exist); unmatched chars copy through.
    */
  def mappingFilter(rules: Seq[(String, String)]): String => String = {
    require(rules.forall(_._1.nonEmpty), "mapping sources must be non-empty")
    val byLen = rules.sortBy(-_._1.length)
    (s: String) => {
      val out = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        var matched = false
        var r = 0
        while (!matched && r < byLen.length) {
          val (src, dst) = byLen(r)
          if (s.regionMatches(i, src, 0, src.length)) {
            out.append(dst); i += src.length; matched = true
          }
          r += 1
        }
        if (!matched) { out.append(s.charAt(i)); i += 1 }
      }
      out.toString
    }
  }

  /** PatternReplaceCharFilter (`pattern/PatternReplaceCharFilter.java:43`):
    * regex replaceAll over the raw text.
    */
  def patternReplaceFilter(regex: String, repl: String): String => String = {
    val p = java.util.regex.Pattern.compile(regex)
    (s: String) => p.matcher(s).replaceAll(repl)
  }
}
