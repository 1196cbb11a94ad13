package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All are
  * built from codegen'd `functions._` where possible; the per-language
  * marker heuristics live in plain data.
  */
object TextAnalysis {

  /** Whitespace token count + a BPE-ish piece count (letter runs, digit
    * runs, and single punctuation marks each count as one piece — the
    * usual pre-tokenizer regex).
    */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_ws_tokens",
        size(filter(split(col(textCol), "\\s+"), t => t =!= "")))
      .withColumn("n_bpe_pieces",
        size(regexp_extract_all(col(textCol),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0))))

  /** Function-word marker sets per Latin-script language (public stopword
    * knowledge; function words are the strongest cheap language signal at
    * document scale). ORDER is the deterministic tie-break: the earliest
    * language with the maximal hit count wins.
    */
  val MarkerLangs: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with",
      "for", "was", "are", "this"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein", "mit",
      "auf", "dem", "sich", "auch"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour",
      "que", "qui", "pas", "avec"),
    "es" -> Seq("el", "los", "las", "es", "una", "para", "por", "como",
      "pero", "sus", "ser", "tiene"),
    "pt" -> Seq("não", "são", "também", "já", "em", "dos", "das", "uma",
      "você", "mais", "os", "ao"),
    "it" -> Seq("il", "di", "che", "per", "con", "del", "della", "sono",
      "anche", "più", "questo", "gli"),
    "nl" -> Seq("het", "een", "van", "dat", "niet", "zijn", "voor",
      "aan", "ook", "maar", "hij", "naar"),
    "sv" -> Seq("och", "att", "det", "som", "av", "är", "för", "med",
      "på", "den", "inte", "jag"),
    "da" -> Seq("og", "at", "til", "er", "ikke", "jeg", "hun", "havde",
      "hende", "ham", "især", "hvor"),
    "no" -> Seq("å", "ikke", "jeg", "han", "hun", "så", "fra", "meg",
      "noe", "bare", "kan", "vil"),
    "fi" -> Seq("ja", "on", "ei", "että", "oli", "hän", "mutta", "joka",
      "myös", "kun", "niin", "sen"),
    "pl" -> Seq("nie", "się", "jest", "na", "do", "że", "jak", "ale",
      "przez", "być", "tym", "oraz"),
    "cs" -> Seq("je", "na", "se", "že", "jako", "ale", "jsem", "jsou",
      "byl", "pro", "tak", "podle"),
    "ro" -> Seq("și", "de", "la", "cu", "un", "este", "pentru", "care",
      "din", "mai", "sunt", "fost"),
    "hu" -> Seq("és", "az", "hogy", "nem", "egy", "van", "meg", "el",
      "volt", "csak", "már", "még"),
    "tr" -> Seq("bir", "ve", "bu", "için", "ile", "ne", "gibi", "çok",
      "daha", "ama", "olarak", "sonra"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "untuk", "tidak",
      "ini", "dari", "dalam", "akan", "pada"),
    "vi" -> Seq("và", "của", "là", "có", "không", "được", "trong",
      "một", "người", "những", "này", "cho"))

  /** Back-compat view of the marker tables (quality scoring uses "en"). */
  val LangMarkers: Map[String, Seq[String]] = MarkerLangs.toMap

  /** Script-detected languages, in priority order: ANY character of the
    * script decides (Japanese before Chinese — kana presence wins over the
    * shared Han). Script names are Unicode script classes (Java regex
    * `\p{IsX}`, RE2 `\p{X}` on the oracle side).
    */
  val ScriptLangs: Seq[(String, Seq[String])] = Seq(
    "ja" -> Seq("Hiragana", "Katakana"),
    "zh" -> Seq("Han"),
    "ko" -> Seq("Hangul"),
    "ru" -> Seq("Cyrillic"),
    "ar" -> Seq("Arabic"),
    "el" -> Seq("Greek"),
    "he" -> Seq("Hebrew"),
    "th" -> Seq("Thai"),
    "hi" -> Seq("Devanagari"))

  /** Count of marker hits for one language over the token array column. */
  private def markerHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(LangMarkers(lang).map(lit(_)): _*)))

  /** Unicode-aware tokens for language ID (lowercase, split on anything
    * that is not a letter or digit) — the ASCII-only split would shred
    * accented function words ("für" → f, r).
    */
  private def uToksCol(textCol: String): Column =
    filter(split(lower(col(textCol)), "[^\\p{L}\\p{Nd}]+"), t => t =!= "")

  /** ASCII tokens (oracle-parity with the rest of the text-analysis ops). */
  private def toksCol(textCol: String): Column =
    filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")

  /** Language-ID, two stages, both deterministic and SQL-replicable:
    *
    *  1. script detection: the first [[ScriptLangs]] entry with ≥1
    *     character of its script decides (covers zh/ja/ko/ru/ar/el/he/
    *     th/hi — script is a stronger signal than any word list)
    *  2. else marker-word argmax over [[MarkerLangs]] (18 Latin-script
    *     languages); earliest language with the max count wins; zero
    *     evidence → "und"
    */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val withHits = df.withColumn("_toks", uToksCol(textCol))
    val hitCols = MarkerLangs.map { case (l, _) =>
      markerHits(col("_toks"), l).as(s"_h_$l")
    }
    val scriptCols = ScriptLangs.map { case (l, scripts) =>
      scripts.map(s =>
        size(regexp_extract_all(col(textCol), lit(s"\\p{Is$s}"), lit(0))))
        .reduce(_ + _).as(s"_s_$l")
    }
    val scored = withHits.select(col("*") +: (hitCols ++ scriptCols): _*)
    val markerBest = MarkerLangs.foldLeft((lit("und"), lit(0))) {
      case ((bestLang, bestHits), (l, _)) =>
        (when(col(s"_h_$l") > bestHits, lit(l)).otherwise(bestLang),
          greatest(col(s"_h_$l"), bestHits))
    }._1
    val best = ScriptLangs.foldRight(markerBest) { case ((l, _), rest) =>
      when(col(s"_s_$l") > 0, lit(l)).otherwise(rest)
    }
    scored.withColumn("lang_guess", best)
      .drop("_toks")
      .drop(MarkerLangs.map { case (l, _) => s"_h_$l" }: _*)
      .drop(ScriptLangs.map { case (l, _) => s"_s_$l" }: _*)
  }

  /** Quality features + a composite score: token count, mean token
    * length, punctuation ratio, stopword ratio (FIXTURES-style
    * length/punct/stopword heuristics).
    */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val toks = toksCol(textCol)
    val en = LangMarkers("en")
    df.withColumn("_toks", toks)
      .withColumn("n_tokens", size(col("_toks")))
      .withColumn("punct_ratio",
        round(
          (length(col(textCol)) - length(regexp_replace(col(textCol), "[^a-zA-Z0-9\\s]", ""))).cast("double")
            / greatest(length(col(textCol)), lit(1)), 6))
      .withColumn("stopword_ratio",
        round(size(filter(col("_toks"), t => t.isin(en.map(lit(_)): _*))).cast("double")
          / greatest(size(col("_toks")), lit(1)), 6))
      .withColumn("quality_ok",
        col("n_tokens") >= 5 && col("punct_ratio") < 0.3 &&
          col("stopword_ratio") < 0.9)
      .drop("_toks")
  }

  /** English character-bigram frequencies, percent of all letter-pair
    * occurrences (public corpus statistics — the classic English
    * letter-pair tables; same embedded-data pattern as the langid
    * markers). Source of the char-LM quality signal: natural English
    * scores near the table's mass, gibberish falls to the unseen floor.
    */
  val EnBigramPct: Seq[(String, Double)] = Seq(
    "th" -> 3.56, "he" -> 3.07, "in" -> 2.43, "er" -> 2.05, "an" -> 1.99,
    "re" -> 1.85, "on" -> 1.76, "at" -> 1.49, "en" -> 1.45, "nd" -> 1.35,
    "ti" -> 1.34, "es" -> 1.34, "or" -> 1.28, "te" -> 1.20, "of" -> 1.17,
    "ed" -> 1.17, "is" -> 1.13, "it" -> 1.12, "al" -> 1.09, "ar" -> 1.07,
    "st" -> 1.05, "to" -> 1.05, "nt" -> 1.04, "ng" -> 0.95, "se" -> 0.93,
    "ha" -> 0.93, "as" -> 0.87, "ou" -> 0.87, "io" -> 0.83, "le" -> 0.83,
    "ve" -> 0.83, "co" -> 0.79, "me" -> 0.79, "de" -> 0.76, "hi" -> 0.76,
    "ri" -> 0.73, "ro" -> 0.73, "ic" -> 0.70, "ne" -> 0.69, "ea" -> 0.69,
    "ra" -> 0.69, "ce" -> 0.65, "li" -> 0.62, "ch" -> 0.60, "ll" -> 0.58,
    "be" -> 0.58, "ma" -> 0.57, "si" -> 0.55, "om" -> 0.55, "ur" -> 0.54,
    "ca" -> 0.50, "el" -> 0.46, "ta" -> 0.46, "la" -> 0.45, "ns" -> 0.45,
    "di" -> 0.43, "fo" -> 0.42, "ho" -> 0.42, "pe" -> 0.42, "ec" -> 0.40,
    "pr" -> 0.40, "no" -> 0.40, "ct" -> 0.38, "us" -> 0.37, "ac" -> 0.36,
    "ot" -> 0.36, "il" -> 0.35, "tr" -> 0.35, "ly" -> 0.34, "nc" -> 0.34,
    "et" -> 0.33, "ut" -> 0.33, "ss" -> 0.33, "so" -> 0.32, "rs" -> 0.32,
    "un" -> 0.31, "lo" -> 0.31, "wa" -> 0.30, "ge" -> 0.30, "ie" -> 0.30,
    "wh" -> 0.29, "ee" -> 0.29, "wi" -> 0.28, "em" -> 0.28, "ad" -> 0.27,
    "ol" -> 0.27, "rt" -> 0.27, "po" -> 0.26, "we" -> 0.26, "na" -> 0.26,
    "ul" -> 0.25, "ni" -> 0.25, "ts" -> 0.25, "mo" -> 0.24, "ow" -> 0.24,
    "pa" -> 0.24, "im" -> 0.24, "mi" -> 0.23, "ai" -> 0.23, "sh" -> 0.23,
    "ir" -> 0.22, "su" -> 0.22, "id" -> 0.21, "os" -> 0.21, "iv" -> 0.21,
    "ia" -> 0.21, "am" -> 0.21, "fi" -> 0.20, "ci" -> 0.20, "vi" -> 0.19,
    "pl" -> 0.19, "ig" -> 0.19, "tu" -> 0.18, "ev" -> 0.18, "ld" -> 0.18,
    "ry" -> 0.18, "mp" -> 0.17, "fe" -> 0.17, "bl" -> 0.17, "ab" -> 0.17,
    "gh" -> 0.17, "ty" -> 0.17, "op" -> 0.17, "wo" -> 0.17, "sa" -> 0.17,
    "ay" -> 0.17, "ex" -> 0.16, "ke" -> 0.16, "fr" -> 0.16, "oo" -> 0.16,
    "av" -> 0.16, "ag" -> 0.16, "if" -> 0.16, "ap" -> 0.15, "gr" -> 0.15,
    "od" -> 0.15, "bo" -> 0.15, "sp" -> 0.15, "rd" -> 0.15, "do" -> 0.15,
    "uc" -> 0.15, "bu" -> 0.14, "ei" -> 0.14, "ov" -> 0.14, "by" -> 0.14,
    "rm" -> 0.14, "ep" -> 0.14, "tt" -> 0.13, "ye" -> 0.13, "ug" -> 0.13,
    "my" -> 0.13, "ki" -> 0.13, "ga" -> 0.13, "du" -> 0.12, "ub" -> 0.12,
    "ue" -> 0.12, "da" -> 0.12, "ff" -> 0.12, "dr" -> 0.11, "qu" -> 0.11)

  /** Quantized centi-log10 probability per bigram (integer, so the
    * engine and the generated DuckDB oracle share EXACT arithmetic);
    * unseen bigrams take the floor.
    */
  val BigramCentiLog: Map[String, Int] = EnBigramPct.map { case (bg, pct) =>
    bg -> math.round(math.log10(pct / 100.0) * 100).toInt
  }.toMap
  val UnseenCentiLog: Int = -400
  /** Score for a text with no letter-letter bigram at all. */
  val NoBigramScore: Double = -4.0

  /** Raw (unrounded) mean log10 bigram probability of the letter pairs
    * within a-z runs of the lowercased text.
    */
  def charLmRaw(text: String): Double = {
    if (text == null) return NoBigramScore
    val s = text.toLowerCase(java.util.Locale.ROOT)
    var sum = 0L
    var n = 0L
    var i = 1
    while (i < s.length) {
      val a = s.charAt(i - 1)
      val b = s.charAt(i)
      if (a >= 'a' && a <= 'z' && b >= 'a' && b <= 'z') {
        sum += BigramCentiLog.getOrElse(s"$a$b", UnseenCentiLog)
        n += 1
      }
      i += 1
    }
    if (n == 0) NoBigramScore else sum * 1.0 / n / 100
  }

  /** Char-n-gram LM quality feature: mean log10 bigram probability
    * (rounded to 4 decimals) + a natural-text verdict — the
    * perplexity-class signal the length/punct heuristics above lack.
    * Natural English sits around −1.5…−2.0; character-level gibberish
    * falls toward the −4 unseen floor.
    */
  val NaturalLmThreshold: Double = -2.6
  def withCharLm(df: DataFrame, textCol: String): DataFrame = {
    val u = udf((s: String) => charLmRaw(s))
    // raw double, NO rounding: the integer centi-log sums and the double
    // divisions are bit-identical across engines, while ROUND(…, 4)
    // introduced engine-specific half-way behavior at boundary values
    df.withColumn("lm_logprob", u(col(textCol)))
      .withColumn("natural_ok", col("lm_logprob") >= NaturalLmThreshold)
  }

  // ---------- PII scrubbing ----------

  /** Training-pipeline PII scrubbing patterns — emails, IPv4 literals,
    * SSN-form ids, phone-form numbers. Restricted to regex syntax that
    * parses identically under Java regex (Spark, codegen'd
    * regexp_replace/regexp_count) and RE2 (the DuckDB oracle): no
    * lookaround, no backreferences; both engines match leftmost-first.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val PhoneRe = "(\\+\\d{1,2}[-. ])?\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** (count column, pattern, replacement tag) in scrub order. Counts are
    * taken on the PROGRESSIVELY scrubbed text: an IPv4 already replaced
    * by &lt;IP&gt; can never be re-counted as a phone, and the order is
    * part of the operator's contract (replayed by the oracle).
    */
  val PiiStages: Seq[(String, String, String)] = Seq(
    ("n_emails", EmailRe, "<EMAIL>"),
    ("n_ips", Ipv4Re, "<IP>"),
    ("n_ssns", SsnRe, "<SSN>"),
    ("n_phones", PhoneRe, "<PHONE>"))

  /** Adds `scrubbed` plus per-category counts — entirely codegen'd
    * functions (no UDF), so the scrub runs at scan speed at 100 TB.
    */
  def withPiiScrub(df: DataFrame, textCol: String): DataFrame =
    PiiStages.foldLeft(df.withColumn("scrubbed", col(textCol))) {
      case (acc, (cnt, re, tag)) =>
        acc.withColumn(cnt, regexp_count(col("scrubbed"), lit(re)))
          .withColumn("scrubbed", regexp_replace(col("scrubbed"), re, tag))
    }

  // ---------- repetition signals (Gopher-style quality rules) ----------

  /** Published repetition-filter thresholds (Rae et al. 2021, Gopher
    * Table A1 class of rules): documents dominated by duplicate lines,
    * one repeated word bigram, or symbol runs are filtered.
    */
  val DupLineFracMax = 0.30
  val TopBigramFracMax = 0.20
  val SymbolWordRatioMax = 0.10

  /** Repetition signals per doc:
    *  - dup_line_frac: fraction of '\n'-lines that repeat an earlier one
    *  - top_bigram_frac: character share of the most frequent REPEATED
    *    word bigram (count ≥ 2; count desc, bigram asc tie),
    *    count × len(bigram) / chars — a bigram seen once is not
    *    repetition, and counting it would trivially flag short docs
    *  - symbol_word_ratio: ('#' chars + '...' occurrences) per token
    * All integer counts + one double division each — bit-identical
    * across engines, no rounding. The bigram argmax is an
    * explode → groupBy → window top-1, joined back (distributed shape:
    * nothing per-doc ever centralizes).
    */
  def withRepetition(df: DataFrame, textCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val lines = split(col(textCol), "\n")
    val toks = toksCol(textCol)
    val base = df
      .withColumn("dup_line_frac",
        (size(lines) - size(array_distinct(lines))).cast("double") /
          greatest(size(lines), lit(1)))
      .withColumn("symbol_word_ratio",
        ((length(col(textCol)) -
          length(regexp_replace(col(textCol), "#", ""))) +
          regexp_count(col(textCol), lit("\\.\\.\\."))).cast("double") /
          greatest(size(toks), lit(1)))
    val n1 = greatest(size(toks) - 1, lit(0))
    val bg = df.select(col(idCol),
        explode(zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy(col(idCol), col("bg")).count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("count").desc, col("bg"))
    val top = bg.filter(col("count") >= 2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), (col("count") * length(col("bg"))).as("_topchars"))
    base.join(top, Seq(idCol), "left")
      .withColumn("top_bigram_frac",
        coalesce(col("_topchars").cast("double") /
          greatest(length(col(textCol)), lit(1)), lit(0.0)))
      .drop("_topchars")
      .withColumn("repetition_ok",
        col("dup_line_frac") <= DupLineFracMax &&
          col("top_bigram_frac") <= TopBigramFracMax &&
          col("symbol_word_ratio") <= SymbolWordRatioMax)
  }

  /** Canonical-form fingerprint: sha256 over the normalized token stream —
    * equal fingerprints ⟺ equal token sequences (whitespace/punct/case
    * insensitive duplicate detection).
    */
  def withFingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint",
      sha2(array_join(toksCol(textCol), " "), 256))

  /** Winnowing fingerprint (Schleimer et al. 2003): k-gram rolling hashes,
    * minimum per window — a compact sketch for near-dup/overlap detection.
    * Pure Scala (UDF); deterministic.
    */
  def winnow(tokens: Array[String], k: Int = 5, window: Int = 4): Array[Long] = {
    if (tokens.length < k) return Array.empty
    val hashes = tokens.sliding(k).map(g => Dedup.shingleHash(g.mkString(" "))).toArray
    if (hashes.length <= window) return Array(hashes.min)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var prevPick = -1
    var i = 0
    while (i + window <= hashes.length) {
      var minIdx = i
      var j = i + 1
      while (j < i + window) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j
        j += 1
      }
      if (minIdx != prevPick) { out += hashes(minIdx); prevPick = minIdx }
      i += 1
    }
    out.toArray
  }

  def withWinnowing(df: DataFrame, textCol: String, k: Int = 5,
      window: Int = 4): DataFrame = {
    val u = udf((s: String) =>
      winnow(graft.core.Analysis.simpleTokens(s), k, window))
    df.withColumn("winnow_sketch", u(col(textCol)))
  }
}
