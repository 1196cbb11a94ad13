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
