package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for LLM training-data pipelines beyond
  * the per-doc signals in [[TextAnalysis]]: benchmark decontamination
  * (token-n-gram overlap, the GPT-3 appendix-C / Gopher procedure),
  * C4-style line+document quality rules (Raffel et al. 2020 §2.2),
  * whole-corpus token statistics, and temperature-based source mixing
  * weights (the multilingual sampling rule of Lample & Conneau 2019).
  *
  * Every shape is 100 TB-first: the benchmark side of decontamination is
  * broadcast (eval suites are MBs against a TB corpus), per-doc n-gram
  * dedup happens map-side (`array_distinct` BEFORE the explode — no
  * corpus-wide distinct shuffle), the quality rules are codegen'd
  * `functions._` expressions that run at scan speed, and the mix weights
  * reduce to one groupBy over the source column (partial-aggregated)
  * plus source-count-sized driver arithmetic.
  */
object Pipeline {

  /** ASCII tokens — same normalization as the rest of the pipeline ops
    * (lowercase, split on anything outside a-z0-9), so fingerprints,
    * repetition signals and decontamination agree on token identity.
    */
  private def toksCol(textCol: String): Column =
    filter(split(lower(col(textCol)), "[^a-z0-9]+"), t => t =!= "")

  /** Space-joined token n-grams of the text column; empty array when the
    * doc has fewer than n tokens (guarded explicitly — Spark's
    * `sequence(1, 0)` would run DESCENDING, not empty).
    */
  private[graft] def ngramsCol(textCol: String, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val toks = toksCol(textCol)
    val cnt = size(toks) - (n - 1)
    when(cnt >= 1,
      transform(sequence(lit(1), cnt), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark decontamination: a training doc is flagged when it shares
    * at least one token n-gram with any benchmark text (the n-gram
    * overlap rule published with GPT-3 and reused by Gopher/PaLM; n is a
    * parameter — 13 in GPT-3, 8 in Gopher). Returns EVERY input doc with
    * the count of distinct benchmark n-grams it contains.
    *
    * Scale shape: benchmark n-grams are `broadcast` (the eval suite is
    * tiny next to the corpus); the doc side explodes per-doc-distinct
    * grams (map-side `array_distinct`, no corpus-wide shuffle), the
    * broadcast-hash join filters at scan speed, and the per-doc count is
    * a partial-aggregated groupBy.
    */
  def flagContaminated(docs: DataFrame, bench: DataFrame, textCol: String,
      idCol: String = "doc_id", n: Int = 5): DataFrame = {
    val benchGrams = bench
      .select(explode(ngramsCol(textCol, n)).as("g")).distinct()
    val docGrams = docs
      .select(col(idCol), explode(array_distinct(ngramsCol(textCol, n))).as("g"))
    val hits = docGrams.join(broadcast(benchGrams), "g")
      .groupBy(col(idCol)).agg(count(lit(1)).as("_c"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_overlap", coalesce(col("_c"), lit(0L)).cast("int"))
      .drop("_c")
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** Cross-document boilerplate detection: token n-grams occurring in at
    * least `minDocs` DISTINCT documents are boilerplate (the shared
    * header/footer/navigation signal CCNet-class pipelines strip before
    * training). Returns every doc with its count of distinct boilerplate
    * n-grams and a flag.
    *
    * Scale shape: per-doc-distinct grams explode map-side
    * (`array_distinct` before the explode, so document-frequency needs
    * no two-level distinct); the df count is one partial-aggregated
    * groupBy on the gram; flagged grams join back by gram and reduce per
    * doc. Both shuffles key on high-cardinality columns (gram, doc) —
    * a truly corpus-dominant gram is exactly the skew AQE's split
    * handles.
    */
  def boilerplateNgrams(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", n: Int = 3, minDocs: Int = 3): DataFrame = {
    val docGrams = docs
      .select(col(idCol), explode(array_distinct(ngramsCol(textCol, n))).as("g"))
    val boiler = docGrams.groupBy(col("g"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("g"))
    val hits = docGrams.join(boiler, "g")
      .groupBy(col(idCol)).agg(count(lit(1)).as("_c"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_boiler", coalesce(col("_c"), lit(0L)).cast("int"))
      .drop("_c")
      .withColumn("boilerplate", col("n_boiler") >= 1)
  }

  /** C4 cleaning rules (Raffel et al. 2020 §2.2 — public): a LINE is
    * kept iff it ends in terminal punctuation (`.`/`!`/`?`/`"`), has at
    * least five words, and does not mention "javascript"; a PAGE is kept
    * iff it has at least three sentences, no "lorem ipsum", and no `{`
    * (the code-page heuristic). Emits the per-doc signals plus the
    * composite verdict; line filtering is per-element lambda work inside
    * one codegen'd projection — no explode, no shuffle.
    */
  def withC4Rules(df: DataFrame, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]\\s*$") &&
        size(filter(split(l, "\\s+"), w => w =!= "")) >= 5 &&
        !lower(l).contains("javascript"))
    df.withColumn("n_lines", size(lines))
      .withColumn("n_kept_lines", size(kept))
      .withColumn("n_sentences", regexp_count(col(textCol), lit("[.!?]")))
      .withColumn("has_brace", col(textCol).contains("{"))
      .withColumn("has_lorem", lower(col(textCol)).contains("lorem ipsum"))
      .withColumn("c4_ok",
        col("n_sentences") >= 3 && !col("has_brace") && !col("has_lorem") &&
          col("n_kept_lines") >= 1)
  }

  /** Whole-corpus token statistics: doc count, total tokens, EXACT
    * vocabulary size, mean doc length, type-token ratio. One partial
    * aggregation plus one distinct-count shuffle; at 100 TB swap
    * `countDistinct` for `approx_count_distinct` (the oracle gate needs
    * the exact form — both are one-line choices on the same plan).
    */
  def corpusStats(docs: DataFrame, textCol: String): DataFrame = {
    val t = docs.select(toksCol(textCol).as("_toks"))
    val base = t.agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum(size(col("_toks"))), lit(0L)).cast("bigint")
        .as("total_tokens"))
    val vocab = t.select(explode(col("_toks")).as("tok"))
      .agg(countDistinct(col("tok")).as("vocab_size"))
    base.crossJoin(vocab) // two 1-row frames
      .withColumn("avg_doc_tokens",
        col("total_tokens").cast("double") / greatest(col("n_docs"), lit(1L)))
      .withColumn("type_token_ratio",
        col("vocab_size").cast("double") /
          greatest(col("total_tokens"), lit(1L)))
  }

  /** Sequence packing for pretraining (the standard concat-then-chunk
    * batching): documents are laid out in id order as one token stream
    * and cut into fixed `budget`-token windows; each doc reports the
    * pack (window) its FIRST token falls in and its offset within that
    * pack. Unlike greedy bin packing, the chunk law is a pure function
    * of the exclusive running token sum — which is what makes it
    * distributable.
    *
    * Scale shape — a two-level distributed prefix sum (same
    * broadcast-offsets trick as [[Split.datasetSplit]]): ids bucket into
    * contiguous ranges by `floor(id / span)` (monotone in id, so bucket
    * order IS id order); per-bucket token totals are a `parts`-row
    * collect whose prefix offsets broadcast back; the within-bucket
    * exclusive cumsum is a DISTRIBUTED window (partitioned by bucket).
    * No single-partition global window anywhere.
    */
  def packSequences(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", budget: Int = 512,
      parts: Int = 32): DataFrame = {
    require(budget >= 1, s"pack budget must be >= 1, got $budget")
    val spark = docs.sparkSession
    val withN = docs.select(col(idCol).as("id"),
      size(toksCol(textCol)).cast("long").as("n_tokens"))
    val maxRow = withN.agg(max(col("id"))).head()
    if (maxRow.isNullAt(0))
      return withN.select(col("id").as(idCol),
        col("n_tokens").cast("int").as("n_tokens"),
        lit(0L).as("pack_id"), lit(0).as("pack_offset"),
        lit(false).as("oversize")).limit(0)
    val maxId = maxRow.getLong(0)
    val span = math.max(1L, maxId / parts + 1)
    val bucketed = withN.withColumn("_b", floor(col("id") / span).cast("long"))
    // bucket totals: ≤ parts+1 rows to the driver → exclusive prefix
    val totals = bucketed.groupBy(col("_b"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val prefixes = totals.map(_._1)
      .zip(totals.scanLeft(0L)(_ + _._2).init)
    val pdf = spark.createDataFrame(prefixes.toSeq).toDF("_b", "_pre")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_b")).orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    bucketed.join(broadcast(pdf), Seq("_b"))
      .withColumn("_cum", col("_pre") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("id").as(idCol), col("n_tokens").cast("int").as("n_tokens"),
        expr(s"_cum div ${budget.toLong}").as("pack_id"),
        pmod(col("_cum"), lit(budget.toLong)).cast("int").as("pack_offset"),
        (col("n_tokens") > budget).as("oversize"))
  }

  /** Sliding-window document chunking — the context-window splitter
    * every RAG / pretraining prep pipeline runs (the tokenizer-stride
    * convention, e.g. HuggingFace `return_overflowing_tokens`): chunk k
    * covers tokens [k·step, k·step + maxTokens) with step = maxTokens −
    * overlap; the chunk count `ceil(max(n − overlap, 1) / step)` places
    * the last window over the tail exactly once (a doc shorter than one
    * window yields one chunk; an empty doc yields none). All integer
    * arithmetic, so the oracle replays it bit-free.
    *
    * Scale shape: one projection + one bounded explode (≈ n/step rows
    * per doc) — no shuffle at all; the chunk text is a map-side
    * `slice`+`array_join` of the already-tokenized array.
    */
  def chunkDocuments(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", maxTokens: Int = 512,
      overlap: Int = 0): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap")
    val step = maxTokens - overlap
    val toks = toksCol(textCol)
    val n = size(toks)
    val nChunks = when(n === 0, lit(0)).otherwise(
      floor((greatest(n - overlap, lit(1)) + lit(step - 1))
        .cast("long") / lit(step.toLong)).cast("int"))
    docs.select(col(idCol), toks.as("_toks"), n.as("_n"),
        nChunks.as("_c"))
      .withColumn("chunk_idx",
        explode(when(col("_c") >= 1, sequence(lit(0), col("_c") - 1))
          .otherwise(array().cast("array<int>"))))
      .select(col(idCol), col("chunk_idx"),
        (col("chunk_idx") * step).as("start_tok"),
        least(lit(maxTokens), col("_n") - col("chunk_idx") * step)
          .cast("int").as("n_chunk_tokens"),
        array_join(slice(col("_toks"), col("chunk_idx") * step + 1,
          lit(maxTokens)), " ").as("chunk_text"))
  }

  /** Exact duplicated-substring spans (the EXACTSUBSTR rule of Lee et
    * al. 2021, "Deduplicating Training Data Makes Language Models
    * Better"): any k-token window whose token sequence occurs at least
    * `minCount` times in the WHOLE corpus (across documents or repeated
    * inside one — multiplicity counts, unlike the document-frequency law
    * of [[boilerplateNgrams]]) marks its k tokens as duplicated. Per doc
    * we report the number of duplicate window starts, the number of
    * tokens covered by the UNION of those windows, and the covered
    * fraction. The paper builds a suffix array over the concatenated
    * corpus; the distributed equivalent keys fixed-width windows by
    * their token sequence — the same dup law at window granularity.
    *
    * Scale shape: the window explode is map-side (size-k slices); the
    * global occurrence count is one partial-aggregated `groupBy(gram)`;
    * dup windows join back on the gram key (both shuffles key on the
    * high-cardinality gram — at 100 TB swap the string key for
    * `xxhash64(gram)` to cut shuffle bytes, at the usual collision
    * odds). The span-union length per doc folds over the SORTED start
    * list WITHOUT a token-level explode: all intervals have width k, so
    * union = Σ min(k, next_start - start) — per-doc state only.
    */
  def dedupSubstrings(docs: DataFrame, textCol: String,
      idCol: String = "doc_id", k: Int = 8, minCount: Int = 2): DataFrame = {
    require(k >= 1, s"window size must be >= 1, got $k")
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    val toks = toksCol(textCol)
    val starts = when(size(toks) >= k, sequence(lit(0), size(toks) - k))
      .otherwise(array().cast("array<int>"))
    val grams = docs.select(col(idCol), explode(starts).as("pos"),
        toks.as("_toks"))
      .select(col(idCol), col("pos"),
        concat_ws(" ", slice(col("_toks"), col("pos") + 1, lit(k))).as("g"))
    val dup = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("g"))
    val perDoc = grams.join(dup, "g")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("_ss"))
      .select(col(idCol), size(col("_ss")).as("_starts"),
        // union of width-k intervals over sorted starts: the interval at
        // ss[i] contributes min(k, ss[i+1]-ss[i]); the last contributes k
        aggregate(
          transform(sequence(lit(1), size(col("_ss"))), i =>
            least(lit(k),
              when(i < size(col("_ss")),
                element_at(col("_ss"), i + 1) - element_at(col("_ss"), i))
                .otherwise(lit(k)))),
          lit(0), (acc, x) => acc + x).as("_cov"))
    docs.select(col(idCol), size(toks).as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("_starts"), lit(0)).cast("int").as("n_dup_starts"),
        coalesce(col("_cov"), lit(0)).cast("int").as("dup_tokens"),
        (coalesce(col("_cov"), lit(0)).cast("double") /
          greatest(col("n_tokens"), lit(1))).as("dup_ratio"))
  }

  /** Temperature-based source mixing weights — the multilingual sampling
    * rule (Lample & Conneau 2019 §3.1, reused by mT5/CC-mix pipelines):
    * with p_s = tokens_s / Σ tokens, sample q_s ∝ p_s^α (α = 0.5 here,
    * i.e. `sqrt` — correctly rounded in IEEE, so the DuckDB oracle
    * reproduces every bit), and `weight` = q_s / p_s is the up/down-
    * sampling factor a sampler applies to source s. The normalizer is an
    * ORDERED (source-asc) fold because double addition is
    * order-sensitive. Token counts reduce in one partial-aggregated
    * groupBy; everything after is source-count-sized.
    */
  def sourceMixWeights(docs: DataFrame, textCol: String,
      srcCol: String = "source"): DataFrame = {
    val cnt = docs
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toksCol(textCol))).cast("bigint").as("n_tokens"))
    val tot = cnt.agg(sum(col("n_tokens")).cast("bigint").as("_tot"))
    val withP = cnt.crossJoin(tot) // tot is 1 row
      .withColumn("p", col("n_tokens").cast("double") / col("_tot"))
    val z = withP.agg(
      aggregate(
        array_sort(collect_list(struct(col(srcCol).as("s"),
          sqrt(col("p")).as("sp")))),
        lit(0.0), (acc, x) => acc + x.getField("sp")).as("_z"))
    withP.crossJoin(z) // z is 1 row
      .withColumn("q", sqrt(col("p")) / col("_z"))
      .withColumn("weight", col("q") / col("p"))
      .drop("_tot", "_z")
  }
}
