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

  /** Stopword-marker sets per language (tiny n-gram-free heuristic:
    * function words are the strongest language signal at document scale).
    */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour"),
    "es" -> Seq("el", "los", "las", "es", "una", "para", "por", "como"))

  /** Count of marker hits for one language over the token array column. */
  private def markerHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(LangMarkers(lang).map(lit(_)): _*)))

  private def toksCol(textCol: String): Column =
    filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")

  /** Language-ID by marker-word counts: argmax over languages, ties and
    * zero-evidence → "und". Deterministic: languages compared in fixed
    * order (en, de, fr, es), strictly-greater wins.
    */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val toks = toksCol(textCol)
    val langs = Seq("en", "de", "fr", "es")
    val withHits = df.withColumn("_toks", toks)
    val hitCols = langs.map(l => markerHits(col("_toks"), l).as(s"_h_$l"))
    val scored = withHits.select(col("*") +: hitCols: _*)
    val best = langs.foldLeft((lit("und"), lit(0))) {
      case ((bestLang, bestHits), l) =>
        (when(col(s"_h_$l") > bestHits, lit(l)).otherwise(bestLang),
          greatest(col(s"_h_$l"), bestHits))
    }._1
    scored.withColumn("lang_guess", best)
      .drop("_toks").drop(langs.map(l => s"_h_$l"): _*)
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
