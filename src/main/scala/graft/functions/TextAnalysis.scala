package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, document
  * fingerprinting — the heuristic-filter family used by public LLM corpus
  * pipelines (C4: Raffel et al. 2020; Gopher/MassiveText: Rae et al.
  * 2021). All are built from codegen'd `org.apache.spark.sql.
  * functions` / higher-order array functions — no UDFs — so they stay
  * narrow (no shuffle) and scale linearly with input splits: at 100 TB each
  * is a single map-stage over the parquet scan.
  */
object TextAnalysis {

  /** Whitespace tokenizer. `trim` first so leading/trailing whitespace never
    * yields empty edge tokens.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. Round 20: the
    * [[NativeExpressions.TokenCountExpr]] kernel — value- and
    * type-identical to `size(tokens(text))` (int, null → null,
    * same empty-edge-token semantics; TextAnalysisSpec pins the
    * identity), but counts in one allocation-free byte pass instead of
    * materializing the token array to take its length. tokenCount is
    * composed into most per-doc gates and budget columns, so the split
    * allocation was paid corpus-wide (guide §4).
    */
  def tokenCount(text: Column): Column = NativeExpressions.tokenCountOf(text)

  /** Canonical text normalization for hash-based dedup: Unicode NFC
    * (composed form — "Café" typed with a combining accent becomes
    * byte-identical to the precomposed spelling), lowercase, trim, and
    * whitespace runs collapsed to single spaces. Run this BEFORE
    * fingerprint/MinHash/SimHash ops (qd01/qd05/qd09 …) or visually
    * identical texts hash apart and duplicates leak through. A pure
    * narrow codegen'd projection ([[NativeExpressions.nfcNormalize]] +
    * builtins) — no shuffle, ASCII fast-path allocation-free.
    *
    * Lowercasing note: kept to builtin `lower` (JVM semantics). For the
    * locale-sensitive edge cases (Turkish İ/ı) a curation pipeline
    * should decide policy explicitly; the default here matches the
    * tokenizer used by every other op in this file.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(NativeExpressions.nfcNormalize(text)),
      "\\s+", " "))

  /** BPE-ish token estimate: the ~4-chars-per-token heuristic used to size
    * LLM training corpora when an exact tokenizer is too costly inline.
    */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text).cast("double") / 4.0d).cast("long")

  /** Count of tokens that appear in `words` (used for stopword ratios and
    * language scoring). Round 20: the [[NativeExpressions.WordHitsExpr]]
    * kernel — value-identical to `size(filter(tokens(text), isin))`
    * (spec-pinned), but one allocation-free byte pass instead of an
    * interpreted HOF filter over a materialized token array.
    */
  def wordHits(text: Column, words: Seq[String]): Column =
    NativeExpressions.wordHits(text, words)

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

  /** Stopword ratio ∈ [0,1]: classic quality signal (natural prose has
    * 0.2–0.5; keyword spam and boilerplate sit near 0). Round 20: via
    * the [[NativeExpressions.QualityStatsExpr]] kernel — the HOF
    * `filter`+`isin` form evaluated one interpreted Expression per
    * token × stopword literal (HOF lambdas are CodegenFallback) over a
    * materialized token array; values bit-identical (byte-equality
    * hits, same greatest(count,1) double division).
    */
  def stopwordRatio(text: Column, stops: Seq[String] = EnglishStopwords): Column = {
    val qs = NativeExpressions.qualityStats(text, stops)
    element_at(qs, 3).cast("double") /
      greatest(element_at(qs, 1), lit(1L)).cast("double")
  }

  /** Mean token length in characters (whitespace removed / token count).
    * Round 20: kernel-derived — Σ token code-point lengths ≡
    * `length(regexp_replace(text, "\s+", ""))` (every non-whitespace
    * code point lies in exactly one token), same double division.
    */
  def avgTokenLength(text: Column): Column = {
    val qs = NativeExpressions.qualityStats(text, EnglishStopwords)
    element_at(qs, 2).cast("double") /
      greatest(element_at(qs, 1), lit(1L)).cast("double")
  }

  /** Ratio of non-alphanumeric, non-space characters — high values flag
    * markup/code/garbled docs.
    */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Marker-word tables for the n-gram/function-word language heuristic.
    * Function words are the strongest cheap signal for closely related
    * European languages; scoring = hit count per language, argmax wins.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une"),
    "es" -> Seq("el", "los", "las", "y", "una", "para"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ein"),
  )

  /** Language-ID heuristic: argmax of marker-word hits, `und` when no
    * marker fires. Ties break by the declared language order (en first) so
    * the result is deterministic and oracle-checkable.
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, ws) => lang -> wordHits(lower(text), ws) }
    pickLang(scores)
  }

  private def pickLang(scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best, lit(lang)).otherwise(acc)
    }
    when(best === 0, lit("und")).otherwise(pick)
  }

  /** Pipeline form of [[langId]]: tokens materialized once, one score
    * column per language, argmax over plain attribute references. Staged
    * narrow projections — no subtree duplication (the single-Column form
    * re-references every score through greatest/when ~20×), so the
    * generated code stays small at any scale.
    */
  def withLangId(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    // round 20: per-language marker hits via the WordHits kernel — the
    // token array and its four interpreted HOF filters are gone; four
    // allocation-free byte passes (one per marker set) replace them,
    // values identical (spec pins withLangId ≡ langId ≡ HOF form)
    val scored = LangMarkers.foldLeft(df) { case (acc, (lang, ws)) =>
      acc.withColumn(s"__s_$lang",
        NativeExpressions.wordHits(lower(col(textCol)), ws))
    }
    val scores = LangMarkers.map { case (lang, _) => lang -> col(s"__s_$lang") }
    scored.withColumn(outCol, pickLang(scores))
      .drop(LangMarkers.map(m => s"__s_${m._1}"): _*)
  }

  /** Quality-score bundle appended as flat columns (flat > nested struct so
    * parquet stats / pushdown keep working on the outputs).
    */
  def withQualityMetrics(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("avg_token_len", round(avgTokenLength(t), 4))
      .withColumn("stopword_ratio", round(stopwordRatio(t), 4))
      .withColumn("punct_ratio", round(punctRatio(t), 4))
      .withColumn("bpe_tokens_est", bpeTokenEstimate(t))
  }

  /** Per-doc repetition signal: share of the doc taken by its most
    * frequent token (Gopher-family repetition filters — Rae et al. 2021
    * §A1.1 use duplicate-line and top-n-gram fractions; the top-token
    * share is the unigram member of that family). ZERO-SHUFFLE form
    * (round 19): the max multiplicity of a token within a doc is a
    * doc-local property, so the [[NativeExpressions.TopTokenStatsExpr]]
    * kernel counts it in one per-row pass — the previous relational
    * formulation (explode → grouped count on (doc, token) → per-doc
    * max/total) shipped every token OCCURRENCE through an exchange to
    * count something each row can count locally; at corpus scale that
    * exchange was the whole cost. Values byte-identical (true
    * byte-equality token counting, split(trim, \s+) semantics incl.
    * the empty-token edge; null text yields no output row — the
    * explode's behavior).
    */
  def topTokenFraction(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.where(col(textCol).isNotNull)
      .select(col(idCol),
        NativeExpressions.topTokenStats(col(textCol)).as("__tts"))
      .select(col(idCol),
        element_at(col("__tts"), 1).as("top_count"),
        element_at(col("__tts"), 2).as("n_tokens"))
      .withColumn("top_token_frac",
        round(col("top_count").cast("double") / col("n_tokens"), 4))

  /** A Gopher-FAMILY rule battery (after Rae et al. 2021, app. A1.1) —
    * a composed keep/drop quality filter assembled from this file's
    * individually-proven signals. Of the paper's rules it implements
    * token-count bounds, mean-word-length bounds, a stopword gate, a
    * top-token share cap (the unigram member of the paper's repetition
    * family) and a duplicate-n-gram fraction cap
    * ([[Dedup.intraDocDupNgramFraction]]); it does NOT implement the
    * symbol-to-word-ratio, bullet/ellipsis-line, or
    * minimum-alphabetic-word rules, and two rules are approximated: the
    * stopword gate is a RATIO threshold (the paper requires ≥ 2
    * stopword OCCURRENCES) and the defaults (e.g. `minTokens` 30 vs the
    * paper's 50 words) are calibrated for this engine's fixtures, not
    * the paper's values. A parameterized battery in the paper's shape,
    * not a reimplementation of its exact filter. Returns every signal
    * plus the final `keep` so a pipeline can audit WHY a doc dropped.
    *
    * All comparisons are on the 4-dp ROUNDED signals (the same values
    * the per-signal oracles replay), so the keep decision is
    * engine-portable. Scale shape (round 19): ONE narrow projection —
    * every signal is doc-local, so the scalar stats evaluate as HOFs
    * over the per-row token array and the repetition signals in the
    * TopTokenStats / DupNgramStats kernels; the battery runs ZERO
    * exchanges and zero joins (the previous form paid three
    * corpus-sized shuffles + two join-backs for the same values).
    * Eager like its constituents: the per-doc signal table (7 small
    * columns, ≪ corpus) is checkpointed so repeat consumers (every
    * classifier eval joins the labels at least once) never re-scan.
    */
  def gopherFilter(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 30, maxTokens: Int = 100000,
      minAvgTokenLen: Double = 3.0, maxAvgTokenLen: Double = 10.0,
      minStopwordRatio: Double = 0.02, maxTopTokenFrac: Double = 0.15,
      maxDupNgramFrac: Double = 0.8, dupN: Int = 3): DataFrame = {
    // ZERO-SHUFFLE battery (round 19): every signal is doc-local, so
    // the whole filter is ONE narrow projection over the scan — the
    // previous form paid a token-occurrence explode shuffle + two
    // grouped aggregations (top-token share), a positional-span explode
    // shuffle + grouped count + join-back (dup-n-gram coverage), and
    // two left joins to reassemble, all to compute per-row properties.
    // The TopTokenStats / DupNgramStats kernels count them in place;
    // values are byte-identical (true byte-equality token counts; the
    // dup kernel reuses the SAME positional XXH64 span chain, so even
    // a 64-bit collision merges the same two groups in both forms).
    // At 100 TB: zero exchanges instead of three corpus-sized ones.
    // identical values to tokenCount/avgTokenLength/stopwordRatio over the
    // raw text: every non-whitespace char is in exactly one token, so the
    // summed token lengths equal length(regexp_replace(text, "\s+", "")).
    // Round 20: the scalar triple comes from the QualityStats kernel —
    // the previous HOF aggregate/filter forms ran interpreted
    // (CodegenFallback lambdas) over a materialized token array; the
    // kernel reads the text bytes once, allocation-free, and the battery
    // no longer materializes __toks at all (guide §4). Values
    // bit-identical: same long stats, same double divisions, same 4-dp
    // rounds (TextAnalysisSpec pins kernel ≡ HOF on the edge fixtures).
    val nToks = greatest(element_at(col("__qs"), 1), lit(1L)).cast("double")
    val out = docs.select(col(idCol), col(textCol),
        NativeExpressions.qualityStats(col(textCol), EnglishStopwords).as("__qs"),
        NativeExpressions.topTokenStats(col(textCol)).as("__tts"),
        NativeExpressions.dupNgramStats(col(textCol), dupN).as("__dns"))
      .select(col(idCol),
        element_at(col("__qs"), 1).as("n_tokens"),
        round(element_at(col("__qs"), 2)
          .cast("double") / nToks, 4).as("avg_token_len"),
        round(element_at(col("__qs"), 3)
          .cast("double") / nToks, 4).as("stopword_ratio"),
        // null text → kernel null → round null → coalesce 0.0 (the old
        // left-join-miss behavior); otherwise max-count/total-count in
        // the same double division the grouped form used
        coalesce(round(element_at(col("__tts"), 1).cast("double") /
          element_at(col("__tts"), 2).cast("double"), 4), lit(0.0))
          .as("top_token_frac"),
        // covered / greatest(size(tokens), 1) — the denominator the
        // relational form used (split semantics incl. empty edge tokens)
        coalesce(round(col("__dns").cast("double") / nToks, 4), lit(0.0))
          .as("dup_ngram_frac"))
      .withColumn("keep",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
          col("avg_token_len") >= minAvgTokenLen &&
          col("avg_token_len") <= maxAvgTokenLen &&
          col("stopword_ratio") >= minStopwordRatio &&
          col("top_token_frac") <= maxTopTokenFrac &&
          col("dup_ngram_frac") <= maxDupNgramFrac)
      .localCheckpoint(true)
    out
  }

  /** Per-source corpus DATACARD — the dataset-card rollup corpus
    * releases publish (The Pile, C4, RefinedWeb all ship per-source
    * tables of exactly this shape): document count, token volume,
    * mean document length, mean stopword ratio (quality), English
    * fraction (language mix) and exact-duplicate fraction. Composes
    * this file's per-doc signals ([[tokenCount]], [[stopwordRatio]],
    * [[langId]], [[fingerprint]]) into ONE grouped aggregation.
    *
    * Determinism for the oracle: the only float mean over unbounded
    * rows (stopword ratio) sums the per-doc 4-dp ROUNDED values as
    * DECIMAL — order-independent — and EVERY ratio column stays
    * integral until the final step (e4-scaled integer numerator ÷
    * count, rounded at 0 dp, ÷ 10000): rounding a double division at
    * 4 dp can land 1 ulp across the boundary and flip the last digit
    * between engines (the qd42 lesson; this op's original direct form
    * survived only by luck of values).
    * Scale shape: one corpus scan → partial+final hash aggregation on
    * `source` (map-side combine; the distinct-hash term shuffles
    * (source, hash) pairs — 16 B each, uniform md5 keys).
    */
  def corpusDatacard(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(col(sourceCol).as("source"),
        tokenCount(t).cast("long").as("__nt"),
        round(stopwordRatio(t), 4).cast(DecimalType(18, 4)).as("__sw"),
        langId(t).as("__lang"),
        fingerprint(t).as("__fp"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        (round((sum(col("__nt")) * 10000).cast("double") /
          count(lit(1)).cast("double"), 0) / lit(10000.0d)).as("avg_doc_tokens"),
        (round((sum(col("__sw")) * 10000).cast("long").cast("double") /
          count(lit(1)).cast("double"), 0) / lit(10000.0d)).as("mean_stopword_ratio"),
        (round((sum(when(col("__lang") === "en", 1L).otherwise(0L)) * 10000)
          .cast("double") /
          count(lit(1)).cast("double"), 0) / lit(10000.0d)).as("en_frac"),
        (round(((count(lit(1)) - countDistinct(col("__fp"))) * 10000)
          .cast("double") /
          count(lit(1)).cast("double"), 0) / lit(10000.0d)).as("dup_frac"))
      .orderBy(col("source"))
  }

  /** Word bigrams WITH multiplicity (unlike [[Dedup.wordShingles]], which
    * is per-doc distinct for set semantics) — the feature unit for
    * count-based scoring like [[Curation.dsirWeights]]. Narrow map; a
    * 1-token doc yields an empty list.
    */
  def bigrams(text: Column): Column = {
    val w = tokens(text)
    // guard: sequence(1, 0) DESCENDS in Spark, so a <2-token doc must
    // short-circuit to an empty list instead of indexing w[0]
    when(size(w) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
  }

  /** Unigram language-model log-probability quality score — the
    * engine-portable member of the CCNet perplexity-filter family
    * (Wenzek et al. 2020 rank docs by LM perplexity; a unigram LM needs
    * no trained artifact: the corpus itself is the model). Score =
    * mean over the doc's tokens of ln P(token) under the corpus unigram
    * distribution = (Σ ln freq(t)) / n − ln N. Near-zero scores mean
    * common-word prose; very negative means rare-token soup (OCR junk,
    * codes) — the low tail is the filter target.
    *
    * Determinism across engines: ln is the one non-IEEE-exact step, so
    * each token's ln(freq) is rounded to 6 dp and summed as DECIMAL —
    * the sum is then order-independent (float summation order is not)
    * and engine differences would need a 1-ulp ln discrepancy to land
    * exactly on a rounding boundary. At 100 TB the vocab join is a plain
    * equi-join on the token (the vocab side is grouped first — skew on
    * stopwords is bounded by the grouped count's map-side partials).
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the tf seam persists for its two consumers (vocab build + score
    // join) — round 19: the old explode+groupBy tf carried an exchange
    // that Spark's ReusedExchange deduplicated implicitly; the kernel
    // form has no exchange to reuse, so the seam must persist
    // explicitly or each consumer re-derives the corpus scan. Eager
    // doc-sized output (the gopherFilter discipline) lets the seam
    // free on return.
    val tf = unigramTf(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = unigramLogProbFromTf(tf, idCol).localCheckpoint(true)
    tf.unpersist(false)
    out
  }

  /** Per-doc term frequencies `(idCol, __tok, __cnt)` — the featurize
    * seam under [[unigramLogProbFromTf]]. Grouping per (doc, token)
    * FIRST is the scale move: the map-side-combinable count shrinks the
    * vocab aggregation and the scoring join to distinct-token rows
    * (natural text repeats tokens heavily), and a pipeline that needs
    * the LM pass plus other per-token work can persist THIS grouped
    * frame — far smaller than the raw (doc, token) explode — instead of
    * scanning the corpus once per plan branch ([[graft.ops.Pipelines
    * .curationPipeline]] does exactly that for its 2-pass budget).
    */
  def unigramTf(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // per-ROW token counts (round 19): the (doc, token) multiplicity is
    // doc-local, so the TokenCounts kernel emits it in place and the
    // explode stays narrow — the previous explode + groupBy(id, __tok)
    // shipped every distinct (doc, token) STRING through an exchange
    // before any consumer even aggregated. Byte-identical counts
    // (kernel-vs-explode identity spec-pinned on the fixture corpus).
    df.select(col(idCol),
        NativeExpressions.tokenCounts(col(textCol)).as("__tc"))
      .select(col(idCol), explode(arrays_zip(
        col("__tc").getField("toks").as("toks"),
        col("__tc").getField("cnts").as("cnts"))).as("__z"))
      .select(col(idCol), col("__z.toks").as("__tok"),
        col("__z.cnts").as("__cnt"))

  /** [[unigramLogProb]] over a precomputed [[unigramTf]] frame. Scores
    * are bit-identical to the per-occurrence formulation: each token's
    * rounded Decimal(18,6) log-prob is scaled by its exact count
    * (decimal × integral is exact), so `Σ_occurrences lp ≡ Σ_tokens
    * cnt·lp` and the 4-dp double rounding at the end sees the same sum.
    */
  def unigramLogProbFromTf(tf: DataFrame, idCol: String): DataFrame = {
    val vocab = tf.groupBy(col("__tok")).agg(sum(col("__cnt")).cast("long").as("__freq"))
    val total = vocab.agg(sum(col("__freq")).cast("double").as("__total"))
    tf.join(vocab, "__tok")
      .withColumn("__lp",
        round(log(col("__freq").cast("double")), 6).cast(DecimalType(18, 6)))
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).cast("long").as("n_tok"),
        sum(col("__lp") * col("__cnt")).as("__sum_lp"))
      .crossJoin(broadcast(total))
      .withColumn("avg_logprob",
        round(col("__sum_lp").cast("double") / col("n_tok") - log(col("__total")), 4))
      .select(col(idCol), col("n_tok"), col("avg_logprob"))
  }

  /** Per-source Zipf rank-frequency fit — the datacard health signal
    * beside entropy (qd55) and compressibility (qd49): natural language
    * follows Zipf's law (type frequency ∝ 1/rank, log-log slope ≈ −1);
    * templated/machine-generated text reads FLAT (few types, even
    * usage) and concentrated boilerplate reads STEEP. OLS of ln(freq)
    * on ln(rank) over each source's top `topR` types (frequency ≥
    * `minCount`, rank ties broken by token): per source `n_types` (all),
    * `n_fit` (types fitted), `slope`, `intercept`, `r2` (4 dp; NULL
    * when the fit is degenerate — under 2 points or zero variance).
    *
    * Determinism: ln(rank)/ln(freq) are 6-dp DECIMAL; the OLS moments
    * are exact decimal sums of decimal products (order-free), cast to
    * double only inside the final closed-form expressions, which the
    * SQL oracle mirrors operation for operation.
    *
    * Scale shape: one map-side-combined (source, token) count, one
    * per-source window for the rank (partitions = sources, state = the
    * top-R heap equivalent), then an S-row rollup — the qd55 shape plus
    * a bounded window. Nothing all-pairs; the fit reads ≤ topR rows per
    * source.
    */
  def zipfFit(df: DataFrame, sourceCol: String, textCol: String,
      topR: Int = 100, minCount: Long = 2L): DataFrame = {
    require(topR >= 2 && minCount >= 1,
      s"zipfFit: need topR >= 2, minCount >= 1 (got $topR, $minCount)")
    // persisted: the grouped (source, token) counts feed BOTH the type
    // rollup and the rank window — without it the corpus tokenization
    // explode runs twice (ScanCountSpec pins the budget)
    val counts = df
      .select(col(sourceCol).as("source"), explode(tokens(col(textCol))).as("__tok"))
      .groupBy(col("source"), col("__tok"))
      .agg(count(lit(1)).cast("long").as("__freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val types = counts.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_types"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("__freq").desc, col("__tok"))
    val ranked = counts
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= topR && col("__freq") >= minCount)
      .withColumn("__x",
        round(log(col("__rank").cast("double")), 6).cast(DecimalType(18, 6)))
      .withColumn("__y",
        round(log(col("__freq").cast("double")), 6).cast(DecimalType(18, 6)))
    val fit = ranked.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_fit"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val n = col("n_fit").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val num = n * col("__sxy").cast("double") - sx * sy
    val den = n * col("__sxx").cast("double") - sx * sx
    val deny = n * col("__syy").cast("double") - sy * sy
    // ε-guards, not exact-zero tests: a zero-variance side reaches the
    // doubles as ~1e-16 residue (the decimal sums are exact, but the
    // decimal→double casts are not), and a near-zero denominator
    // amplifies that residue into engine-divergent noise
    val ok = col("n_fit") >= 2L && abs(den) > 1e-9d
    val out = types.join(fit, Seq("source"), "left")
      .na.fill(0L, Seq("n_fit"))
      .withColumn("slope", when(ok, round(num / den, 4)))
      .withColumn("intercept", when(ok, round((sy - num / den * sx) / n, 4)))
      .withColumn("r2", when(ok && abs(deny) > 1e-9d,
        round(num * num / (den * deny), 4)))
      .select(col("source"), col("n_types"), col("n_fit"),
        col("slope"), col("intercept"), col("r2"))
      .localCheckpoint(true)
    counts.unpersist(false)
    out
  }

  /** Bigram-LM quality gate — the TRAINED-reference member of the CCNet
    * perplexity-filter family (Wenzek et al. 2020 score crawl docs under
    * a KenLM trained on Wikipedia; [[unigramLogProb]] is the no-artifact
    * corpus-as-model sibling): an add-one-smoothed bigram model fit on a
    * trusted `reference` slice scores every doc's token stream, and docs
    * far from the reference register (boilerplate, garbled text,
    * off-language) surface with high mean negative log-likelihood.
    * P(b|a) = (c(a,b) + 1) / (c(a) + V) with c(·) reference occurrence
    * counts and V the reference unigram type count; a context word
    * unseen in the reference degrades smoothly to ln(1/V) — no <unk>
    * retokenization pass. Emitted per doc: `n_bigrams`, `avg_nll`
    * (mean −ln P per bigram, nats, 4 dp — `exp(avg_nll)` IS the
    * perplexity, left to the caller because `exp` is not correctly
    * rounded cross-engine), and `keep` = avg_nll ≤ `threshold`.
    * Docs with < 2 tokens have no bigram: `avg_nll` NULL, keep false
    * (route through a length gate first; qd10's ≥ 20-token gate
    * subsumes this).
    *
    * Determinism: each bigram's −ln P is 6-dp-rounded DECIMAL scaled by
    * its exact count (the qd29 convention), so the per-doc sum is
    * order-free and the whole gate replays in SQL.
    *
    * Scale shape: the reference model is two map-side-combined grouped
    * counts on uniform token keys (bigram + unigram context) — model
    * SIZE is reference-vocabulary-bounded, it never touches the scored
    * corpus; scoring is the doc-bigram grouped frame (distinct
    * (doc, bigram) rows with counts — natural text repeats) left-joined
    * to the two model tables on uniform keys plus a broadcast V scalar,
    * then one per-doc rollup. No windows, nothing all-pairs; at 100 TB
    * the model tables behave exactly like qd29's vocab join.
    *
    * CLOSED experiment (round 14) — co-partitioned model joins: the
    * hypothesis was that the doc-bigram frame is exchanged twice (once
    * per model join) and a single explicit `__ctx` repartition of both
    * sides could satisfy both joins via subset-of-join-keys
    * co-partitioning. The executed plan refutes the premise: AQE
    * broadcasts BOTH vocabulary-sized model tables (BroadcastHashJoin
    * on `__bg`, then on `__ctx`), so the doc frame is exchanged exactly
    * ONCE — by its own groupBy — and the co-partition form ADDS a
    * doc-sized REPARTITION_BY_NUM exchange plus a model re-exchange
    * (measured flat-to-worse under A/B, plan-verified). qd62's
    * remaining cost is intrinsic: the bigram explode + doc-grouped
    * count and two broadcast-hash probes. At a scale where the model
    * tables outgrow the broadcast threshold the question reopens — but
    * then `spark.sql.autoBroadcastJoinThreshold`, not this operator,
    * is the first lever.
    */
  def bigramNllGate(df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String,
      threshold: Double = 8.0): DataFrame = {
    // ONE reference tokenization fills the persisted token/bigram seam;
    // the two model tables derive from it (the qd33/unigramLogProbFromTf
    // shared-tf pattern — the pre-seam form re-tokenized the reference
    // once per model table and once more for the V scalar). The model
    // tables themselves stay LAZY: they are reference-VOCABULARY-sized
    // (millions of rows at sf0.1), and eagerly checkpointing them costs
    // more than the slice re-tokenization they save (measured +2.9 s at
    // sf0.1, 6.0 → 8.9 s, near-zero steal — the round-13 floor artifact
    // caught the first seam form doing exactly that). Instead the
    // DOC-sized output frame below is the one eager checkpoint: a single
    // action materializes the whole DAG — refTok read once for both
    // model tables, refUni persisted across its two consumers — and the
    // seams free immediately after.
    val refTok = reference
      .select(tokens(col(refTextCol)).as("__toks"),
        bigrams(col(refTextCol)).as("__bgs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val refBi = refTok
      .select(explode(col("__bgs")).as("__bg"))
      .groupBy(col("__bg")).agg(count(lit(1)).cast("long").as("__cab"))
    val refUni = refTok
      .select(explode(col("__toks")).as("__ctx"))
      .groupBy(col("__ctx")).agg(count(lit(1)).cast("long").as("__ca"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the V scalar reads the persisted context table — no third pass
    val vScalar = broadcast(refUni.agg(count(lit(1)).cast("long").as("__v")))
    // doc-side bigram counts per ROW (round 19): the (doc, bigram)
    // multiplicity is doc-local, so the BigramCounts kernel emits it in
    // place and the explode stays NARROW — the previous
    // explode_outer + groupBy(id, __bg) shipped every distinct
    // (doc, bigram) STRING through an exchange before the (broadcast)
    // model joins; that exchange was the family's dominant shuffle.
    // explode_OUTER keeps zero-bigram docs in the same pass (a null
    // row the conditional sums skip), so the output still covers every
    // input doc without a join back onto the corpus.
    val docBi = df
      .select(col(idCol),
        NativeExpressions.bigramCounts(col(textCol)).as("__bc"))
      .select(col(idCol), explode_outer(arrays_zip(
        col("__bc").getField("bgs").as("bgs"),
        col("__bc").getField("cnts").as("cnts"))).as("__z"))
      .select(col(idCol), col("__z.bgs").as("__bg"),
        coalesce(col("__z.cnts"), lit(0L)).as("__cnt"))
      .withColumn("__ctx", split(col("__bg"), " ").getItem(0))
    val scored = docBi
      .join(refBi, Seq("__bg"), "left")
      .join(refUni, Seq("__ctx"), "left")
      .crossJoin(vScalar)
      .withColumn("__nll", round(-log(
          (coalesce(col("__cab"), lit(0L)) + lit(1L)).cast("double") /
            (coalesce(col("__ca"), lit(0L)) + col("__v")).cast("double")), 6)
        .cast(DecimalType(18, 6)))
      .groupBy(col(idCol))
      .agg(coalesce(sum(when(col("__bg").isNotNull, col("__cnt"))), lit(0L))
          .cast("long").as("n_bigrams"),
        sum(when(col("__bg").isNotNull, col("__nll") * col("__cnt"))).as("__sum"))
      .withColumn("avg_nll", when(col("n_bigrams") > 0L,
        round(col("__sum").cast("double") / col("n_bigrams").cast("double"), 4)))
    // eager + doc-sized: one action runs the whole model-build+score DAG,
    // then both seams free; repeat consumers read the checkpoint, never
    // the model derivation
    val out = scored
      .select(col(idCol), col("n_bigrams"), col("avg_nll"),
        coalesce(col("avg_nll") <= threshold, lit(false)).as("keep"))
      .localCheckpoint(true)
    refUni.unpersist(false)
    refTok.unpersist(false)
    out
  }

  /** Interpolated Kneser–Ney bigram scoring — the smoothing the
    * production perplexity-filter stack actually uses (KenLM: Heafield
    * 2011; CCNet filters on a KenLM 5-gram: Wenzek et al. 2020).
    * [[bigramNllGate]] is the add-one baseline; add-one systematically
    * over-taxes frequent contexts (it gives the V−1 unseen successors
    * the same mass whether the context was seen 3 or 3M times), while
    * KN (Kneser & Ney 1995) subtracts a fixed discount D from every
    * seen bigram and redistributes exactly the reclaimed D·N1+(a,·)
    * mass over a CONTINUATION distribution — P_cont(b) ∝ how many
    * distinct contexts precede b, not how often b occurs — the classic
    * "San Francisco" fix ("Francisco" is frequent but predictable, so
    * it should get little unseen-context mass).
    *
    * Model (reference slice → tables):
    *   c(a,b)       bigram occurrence counts
    *   c(a)         = Σ_b c(a,b)                 (context totals)
    *   N1+(a,·)     distinct successors of a      (discount mass)
    *   N1+(·,b)     distinct predecessors of b    (continuation counts)
    *   N1+(··)      distinct bigram types
    *   P_cont(b)    = (N1+(·,b) + 1) / (N1+(··) + V + 1)
    *   P(b|a)       = (max(c(a,b) − D, 0) + D·N1+(a,·)·P_cont(b)) / c(a)
    * with P_cont Laplace-floored so out-of-vocabulary successors (and
    * hence every doc bigram) score finitely — the +V+1 denominator
    * reserves one merged-UNK type, the continuation analog of
    * [[bigramNllGate]]'s add-one. A context unseen in the reference
    * backs off to P_cont(b) entirely (the standard lower-order
    * fallback). D is the fixed Ney et al. absolute discount (0.75
    * default); 0 < D ≤ 1 keeps every seen-context probability positive.
    *
    * Determinism across engines: per-bigram −ln P is rounded to 6 dp
    * DECIMAL before the count-weighted sum ([[unigramLogProb]]'s
    * discipline) — everything upstream of the ln is integer-derived
    * double arithmetic with one division, identical IEEE on both
    * engines. Output (id, n_bigrams, avg_nll, keep): avg 4 dp,
    * keep = avg ≤ threshold (docs with no bigram: n=0, null avg,
    * keep=false — [[bigramNllGate]]'s contract).
    *
    * Scale shape — [[bigramNllGate]]'s plus one join: ONE reference
    * tokenization fills the persisted bigram-count seam; the context
    * table (c(a), N1+(a,·) in one grouped pass), continuation table,
    * and the two scalars all derive from it; V is one distinct-count
    * over the persisted token seam. Doc side is one grouped bigram
    * pass + three equi-joins (bigram / context / successor — all
    * model-vocabulary-sized, correctly NOT broadcast at corpus scale)
    * + a 1-row scalar crossJoin. The doc-sized result is the one eager
    * checkpoint; seams unpersist on return.
    */
  def knBigramNll(df: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String,
      discount: Double = 0.75, threshold: Double = 3.0): DataFrame = {
    require(discount > 0.0 && discount <= 1.0,
      s"absolute discount must be in (0, 1], got $discount")
    val refTok = reference
      .select(tokens(col(refTextCol)).as("__toks"),
        bigrams(col(refTextCol)).as("__bgs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val refBi = refTok
      .select(explode(col("__bgs")).as("__bg"))
      .groupBy(col("__bg")).agg(count(lit(1)).cast("long").as("__cab"))
      .withColumn("__ctx", split(col("__bg"), " ").getItem(0))
      .withColumn("__w2", split(col("__bg"), " ").getItem(1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // c(a) and N1+(a,·) in ONE grouped pass over the bigram-type table
    val ctxTab = refBi.groupBy(col("__ctx"))
      .agg(sum(col("__cab")).cast("long").as("__ca"),
        count(lit(1)).cast("long").as("__n1f"))
    val contTab = refBi.groupBy(col("__w2"))
      .agg(count(lit(1)).cast("long").as("__n1b"))
    // both scalars are 1-row metadata: distinct bigram types + vocab size
    val scalars = broadcast(
      refBi.agg(count(lit(1)).cast("long").as("__n1all")).crossJoin(
        refTok.select(explode(col("__toks")).as("__tk"))
          .agg(countDistinct(col("__tk")).cast("long").as("__v"))))
    // doc-side counts per ROW via the BigramCounts kernel (round 19 —
    // the bigramNllGate rationale: the (doc, bigram) count is doc-local,
    // so the old explode_outer + groupBy(id, __bg) string exchange is
    // replaced by a narrow kernel + in-place explode)
    val docBi = df
      .select(col(idCol),
        NativeExpressions.bigramCounts(col(textCol)).as("__bc"))
      .select(col(idCol), explode_outer(arrays_zip(
        col("__bc").getField("bgs").as("bgs"),
        col("__bc").getField("cnts").as("cnts"))).as("__z"))
      .select(col(idCol), col("__z.bgs").as("__bg"),
        coalesce(col("__z.cnts"), lit(0L)).as("__cnt"))
      .withColumn("__ctx", split(col("__bg"), " ").getItem(0))
      .withColumn("__w2", split(col("__bg"), " ").getItem(1))
    val d = lit(discount)
    val scored = docBi
      .join(refBi.select(col("__bg"), col("__cab")), Seq("__bg"), "left")
      .join(ctxTab, Seq("__ctx"), "left")
      .join(contTab, Seq("__w2"), "left")
      .crossJoin(scalars)
      .withColumn("__pcont",
        (coalesce(col("__n1b"), lit(0L)) + lit(1L)).cast("double") /
          (col("__n1all") + col("__v") + lit(1L)).cast("double"))
      .withColumn("__p",
        when(col("__ca").isNull, col("__pcont"))
          .otherwise(
            (greatest(coalesce(col("__cab"), lit(0L)).cast("double") - d,
              lit(0.0)) +
              d * col("__n1f").cast("double") * col("__pcont")) /
              col("__ca").cast("double")))
      .withColumn("__nll",
        round(-log(col("__p")), 6).cast(DecimalType(18, 6)))
      .groupBy(col(idCol))
      .agg(coalesce(sum(when(col("__bg").isNotNull, col("__cnt"))), lit(0L))
          .cast("long").as("n_bigrams"),
        sum(when(col("__bg").isNotNull, col("__nll") * col("__cnt"))).as("__sum"))
      .withColumn("avg_nll", when(col("n_bigrams") > 0L,
        round(col("__sum").cast("double") / col("n_bigrams").cast("double"), 4)))
    val out = scored
      .select(col(idCol), col("n_bigrams"), col("avg_nll"),
        coalesce(col("avg_nll") <= threshold, lit(false)).as("keep"))
      .localCheckpoint(true)
    refBi.unpersist(false)
    refTok.unpersist(false)
    out
  }

  /** Min-K% Prob membership/memorization score (Shi et al. 2023,
    * "Detecting Pretraining Data from Large Language Models": a text the
    * model has SEEN has anomalously few low-probability tokens, so score
    * it by the mean log-prob of only its k% LEAST likely tokens — the
    * outlier tail, not the easy bulk). Here the scoring model is the
    * corpus-as-model unigram LM ([[unigramLogProb]]'s), making this the
    * engine-portable forensics form: docs whose min-k tail is
    * suspiciously probable under a reference corpus are candidate
    * copies/templates of it, the membership-inference complement of the
    * n-gram/semantic decontamination gates.
    *
    * Selection is exact over token OCCURRENCES: k_used = max(1,
    * ⌈kFrac·n⌉); tokens are taken in (ln freq, token) order with a
    * running-count window, and a group straddling the boundary
    * contributes exactly the occurrences that fit — since tied ranks
    * share one ln freq, the SUM is tie-order invariant. Per-token ln is
    * 6-dp-rounded DECIMAL (order-free); the final mean subtracts ln N
    * once ([[unigramLogProbFromTf]]'s identity). kFrac = 1 reproduces
    * `avg_logprob` exactly (spec-pinned).
    *
    * Scale shape: the grouped [[unigramTf]] frame (distinct-token rows,
    * map-side combined), a vocab equi-join on the token, ONE window
    * shuffle on the doc id, and a per-doc rollup. No collects beyond
    * the 1-row total.
    */
  def minKProb(df: DataFrame, idCol: String, textCol: String,
      kFrac: Double = 0.2): DataFrame = {
    // persisted tf seam + eager output — the unigramLogProb rationale
    val tf = unigramTf(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = minKProbFromTf(tf, idCol, kFrac).localCheckpoint(true)
    tf.unpersist(false)
    out
  }

  /** [[minKProb]] over a precomputed [[unigramTf]] frame — the same
    * persisted-seam pattern as [[unigramLogProbFromTf]]: the tf frame
    * feeds the vocab aggregation AND the scoring join, so a pipeline
    * that persists the seam scans the corpus once for both (and can
    * share it with the qd29 scorer).
    */
  def minKProbFromTf(tf: DataFrame, idCol: String,
      kFrac: Double = 0.2): DataFrame = {
    require(kFrac > 0.0 && kFrac <= 1.0,
      s"minKProb: kFrac must be in (0, 1], got $kFrac")
    val vocab = tf.groupBy(col("__tok")).agg(sum(col("__cnt")).cast("long").as("__freq"))
    val total = vocab.agg(sum(col("__freq")).cast("double").as("__total"))
    val wDoc = Window.partitionBy(col(idCol))
    val wCum = wDoc.orderBy(col("__lp").asc, col("__tok").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = tf.join(vocab, "__tok")
      .withColumn("__lp",
        round(log(col("__freq").cast("double")), 6).cast(DecimalType(18, 6)))
      .withColumn("__cum", sum(col("__cnt")).over(wCum))
      .withColumn("__ntok", sum(col("__cnt")).over(wDoc))
      .withColumn("__k", greatest(lit(1L),
        ceil(lit(kFrac) * col("__ntok").cast("double")).cast("long")))
      .withColumn("__take",
        least(col("__cum"), col("__k")) - least(col("__cum") - col("__cnt"), col("__k")))
      .filter(col("__take") > 0)
    scored.groupBy(col(idCol))
      .agg(max(col("__ntok")).cast("long").as("n_tok"),
        max(col("__k")).cast("long").as("k_used"),
        sum(col("__lp") * col("__take")).as("__s"))
      .crossJoin(broadcast(total))
      .withColumn("min_k_logprob",
        round(col("__s").cast("double") / col("k_used") - log(col("__total")), 4))
      .select(col(idCol), col("n_tok"), col("k_used"), col("min_k_logprob"))
  }

  /** Per-source n-gram diversity report — the Shannon-entropy datacard
    * signal next to [[corpusDatacard]]'s volumes and
    * [[NativeExpressions.DeflateRatioExpr]]'s per-doc compressibility: a
    * templated/boilerplate source concentrates its n-gram mass on few
    * grams (low entropy), a diverse one spreads it (entropy →
    * ln(distinct)). H = −Σ p·ln p over the source's n-gram OCCURRENCE
    * distribution; `entropy_norm` = H / ln(distinct) ∈ [0, 1] (0 when a
    * source has one distinct gram — nothing to normalize).
    *
    * Determinism/portability: p = cnt/total is an exact integer-ratio
    * double; each −p·ln p term rounds to 10 dp (fine enough that
    * sub-1e-6 tail grams still register) and sums as DECIMAL(38,10) —
    * order-free, SQL-replayable. Scale: one gram explode → (source,
    * gram) grouped count (map-side combine, uniform keys) → per-source
    * rollup; S-row output.
    */
  def sourceNgramDiversity(df: DataFrame, sourceCol: String,
      textCol: String, n: Int = 2): DataFrame = {
    val grams = df.select(col(sourceCol).as("source"),
        explode(allNgrams(col(textCol), n)).as("__g"))
      .groupBy(col("source"), col("__g"))
      .agg(count(lit(1)).cast("long").as("__cnt"))
    val wSrc = Window.partitionBy(col("source"))
    val p = col("__cnt").cast("double") / col("__total").cast("double")
    grams
      .withColumn("__total", sum(col("__cnt")).over(wSrc))
      .withColumn("__term",
        round(-p * log(p), 10).cast(DecimalType(38, 10)))
      .groupBy(col("source"))
      .agg(max(col("__total")).cast("long").as("total_ngrams"),
        count(lit(1)).cast("long").as("distinct_ngrams"),
        sum(col("__term")).cast("double").as("entropy"))
      .withColumn("entropy_norm",
        when(col("distinct_ngrams") > 1L,
          round(col("entropy") / log(col("distinct_ngrams").cast("double")), 6))
          .otherwise(lit(0.0d)))
      .withColumn("entropy", round(col("entropy"), 6))
      .select(col("source"), col("total_ngrams"), col("distinct_ngrams"),
        col("entropy"), col("entropy_norm"))
  }

  /** PMI-ranked bigram collocations (Church & Hanks 1990, "Word
    * Association Norms, Mutual Information, and Lexicography") — the
    * classic corpus-analysis surface for phrase discovery, tokenizer
    * vocab curation (which pairs deserve merged tokens), and boilerplate
    * forensics (templated corpora surface their fixed phrases at the
    * top): PMI(a,b) = ln[ (c_ab/B) / ((c_a/T)(c_b/T)) ] over corpus
    * occurrence counts, with the standard `minCount` floor (rare-pair
    * PMI explodes) and a global top-k cut.
    *
    * Determinism/portability: counts are exact integers, the four
    * scalar/count ratios divide as IEEE doubles in a fixed expression
    * shape, PMI rounds to 6 dp BEFORE ordering, ties break on the
    * bigram string — the whole ranking replays in SQL (qd60's oracle).
    *
    * Scale shape: two grouped occurrence counts (uniform token/bigram
    * keys, map-side combine), two vocab equi-joins to attach unigram
    * counts, two 1-row broadcast scalars, and a global top-k that plans
    * as TakeOrderedAndProject — per-partition top-k + a k-row driver
    * merge, never a global sort.
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5L,
      topK: Int = 50): DataFrame = {
    require(minCount >= 1L && topK >= 1, s"collocations: bad args ($minCount, $topK)")
    // both grouped-count frames are persisted: each feeds its scalar
    // total AND the scoring join(s) — without the persists the corpus
    // token/bigram explodes would re-run per consumer (up to 5 passes
    // for the 2 this costs); the k-row result is checkpointed eagerly
    // so the persists can be dropped on return
    val uni = df.select(explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).cast("long").as("__c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tTot = uni.agg(sum(col("__c")).cast("double").as("__T"))
    val bgc = df.select(explode(allNgrams(col(textCol), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).cast("long").as("n_ab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // B = the occurrence total = the grouped counts summed BEFORE the
    // minCount filter — no separate corpus pass
    val bTot = bgc.agg(sum(col("n_ab")).cast("double").as("__B"))
    val out = bgc
      .filter(col("n_ab") >= minCount)
      .withColumn("__w1", element_at(split(col("bigram"), " "), 1))
      .withColumn("__w2", element_at(split(col("bigram"), " "), 2))
      .join(uni.select(col("__t").as("__w1"), col("__c").as("n_a")), "__w1")
      .join(uni.select(col("__t").as("__w2"), col("__c").as("n_b")), "__w2")
      .crossJoin(broadcast(bTot)).crossJoin(broadcast(tTot))
      .withColumn("pmi", round(log(
        (col("n_ab").cast("double") / col("__B")) /
          ((col("n_a").cast("double") / col("__T"))
            * (col("n_b").cast("double") / col("__T")))), 6))
      .select(col("bigram"), col("n_ab"), col("n_a"), col("n_b"), col("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(topK)
      .localCheckpoint(true)
    uni.unpersist(false)
    bgc.unpersist(false)
    out
  }

  /** ALL n-gram occurrences (order-preserving, NOT distinct — the
    * occurrence distribution [[sourceNgramDiversity]] measures; contrast
    * [[graft.functions.Dedup.wordShingles]]'s distinct sets).
    */
  private[graft] def allNgrams(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n)))))
      .otherwise(array())
  }

  /** Mask emails and URLs — the redaction pass of a training-data
    * pipeline. Narrow regexp_replace chain (codegen'd, no UDF); patterns
    * kept RE2-compatible so the same masking replays in other engines.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "https?://[^\\s]+", "<URL>")

  /** Fixed-size token-window chunking with overlap — the standard LLM
    * pre-training segmentation (context-window-sized pieces, overlap so no
    * boundary context is lost). One narrow map + an explode whose row
    * growth IS the output (≈ n_tokens/stride rows per doc): no shuffle,
    * scales linearly with the corpus. Chunk i covers tokens
    * [i·stride, i·stride + chunkTokens), stride = chunkTokens − overlap;
    * every doc yields ≥ 1 chunk.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int, keepCols: Seq[String] = Nil): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      s"need chunkTokens > overlap >= 0, got $chunkTokens/$overlap")
    val stride = chunkTokens - overlap
    val nChunks = greatest(lit(1),
      ceil((size(col("__w")) - overlap).cast("double") / stride).cast("int"))
    df.withColumn("__w", tokens(col(textCol)))
      .withColumn("chunk_id", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col("__w"), col("chunk_id") * stride + 1, lit(chunkTokens))))
      .withColumn("chunk_tokens",
        size(slice(col("__w"), col("chunk_id") * stride + 1, lit(chunkTokens))))
      .select(col(idCol) +: keepCols.map(col) :+
        col("chunk_id") :+ col("chunk_text") :+ col("chunk_tokens"): _*)
  }

  /** Benchmark decontamination: per corpus doc, the count of distinct
    * word n-grams it shares with an evaluation/benchmark set — the
    * GPT-3/C4-style overlap check (Brown et al. 2020 App. C flag 13-gram
    * collisions; Raffel et al. 2020 §2.3 drop benchmark sentence
    * matches). The benchmark side is tiny relative to the corpus, so its
    * distinct n-grams BROADCAST; the corpus side explodes to (id,
    * gram) — row growth of two small columns, not documents — and the
    * hit count comes from the broadcast hash join + one grouped count.
    * At 100 TB: one narrow explode over the corpus scan, one broadcast
    * join, one shuffle on doc id for the count. Docs sharing nothing get
    * `n_contaminated_grams = 0`, `contaminated = false`.
    *
    * Gram keys are DUAL-PATH (the qd32/qd09 precedent): the default
    * production path keys grams by the native 8-byte shingle hash
    * ([[NativeExpressions.shingleHashes]]) — the corpus-side explode
    * carries longs instead of n-word strings, the broadcast map probes
    * longs, and no gram string is ever materialized. A 64-bit collision
    * can only inflate a doc's hit count (never misses real overlap);
    * `portable = true` keys by the raw gram string — exact at any scale
    * and the form the SQL oracle replays (TextAnalysisSpec asserts the
    * two paths agree end-to-end).
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int,
      portable: Boolean = false): DataFrame = {
    // NFC canon ([[Dedup.shingleCanon]]): a decomposed-Unicode leak of a
    // composed benchmark row must still hit — identity on ASCII
    def grams(c: Column): Column =
      if (portable) explode(Dedup.wordShingles(Dedup.shingleCanon(c), n))
      else explode(NativeExpressions.shingleHashes(Dedup.shingleCanon(c), n))
    val benchGrams = benchmark
      .select(grams(col(benchTextCol)).as("__g"))
      .distinct()
    // both gram kernels are per-doc distinct, so the exploded (id, gram)
    // pairs are distinct too: the join hit count IS the distinct
    // shared-gram count
    val hits = docs
      .select(col(idCol), grams(col(textCol)).as("__g"))
      .join(broadcast(benchGrams), "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated_grams"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_contaminated_grams",
        coalesce(col("n_contaminated_grams"), lit(0L)))
      .withColumn("contaminated", col("n_contaminated_grams") > 0)
  }

  /** Per-doc benchmark-contamination REPORT — the audit-report sibling
    * of [[decontaminate]]'s binary gate (the overlap statistics LLM
    * releases publish: per training doc, how many of its n-grams appear
    * in an eval benchmark, and what fraction of the doc that is; teams
    * threshold the FRACTION — a 10k-gram doc sharing 3 grams is noise, a
    * 20-gram doc sharing 15 is a leaked eval row). Returns (id, n_grams,
    * n_contaminated_grams, contamination_frac).
    *
    * Scale shape: the denominator is a NARROW `size()` over the per-doc
    * distinct gram array (no explode); the numerator is [[decontaminate]]'s
    * explode → broadcast-benchmark join → grouped count. Same dual-path
    * gram keys (xxhash64 production / raw strings for the SQL oracle —
    * counts agree absent 64-bit collisions, the qd22 precedent).
    */
  def contaminationReport(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int,
      portable: Boolean = false): DataFrame = {
    def gramArr(c: Column): Column =
      if (portable) Dedup.wordShingles(Dedup.shingleCanon(c), n)
      else NativeExpressions.shingleHashes(Dedup.shingleCanon(c), n)
    val benchGrams = benchmark
      .select(explode(gramArr(col(benchTextCol))).as("__g"))
      .distinct()
    // the per-doc gram arrays feed BOTH the numerator (explode + probe)
    // and the denominator (size) — persist once or the full-corpus
    // shingle kernel runs twice per action (dupPassageProfile's eager
    // pattern: checkpoint the doc-sized result, free the gram blocks)
    val docGrams = docs.select(col(idCol), gramArr(col(textCol)).as("__gs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hits = docGrams
      .select(col(idCol), explode(col("__gs")).as("__g"))
      .join(broadcast(benchGrams), "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contaminated_grams"))
    val out = docGrams
      .select(col(idCol), size(col("__gs")).cast("long").as("n_grams"))
      .join(hits, Seq(idCol), "left")
      .withColumn("n_contaminated_grams",
        coalesce(col("n_contaminated_grams"), lit(0L)))
      .withColumn("contamination_frac",
        round(col("n_contaminated_grams").cast("double") /
          greatest(col("n_grams"), lit(1L)).cast("double"), 4))
      .localCheckpoint(true)
    docGrams.unpersist(false)
    out
  }

  /** Top-k corpus vocabulary by (frequency desc, token) — the qd28 query
    * as a reusable step. The `collect` is a k-row metadata action (the
    * vocab IS the model artifact, like the IVF centroid matrix), reached
    * via map-side partial counts + TakeOrderedAndProject.
    */
  def topVocab(df: DataFrame, textCol: String, k: Int): Seq[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(k)
      .select("token").as[String].collect().toSeq
  }

  /** Tokenizer-fertility profile: per doc, whitespace word count vs the
    * greedy longest-match piece count under `vocab`
    * ([[NativeExpressions.WordpieceCountExpr]]) — fertility = pieces per
    * word, the standard metric for how well a vocab fits a corpus
    * (tokenizer-training evaluation). Narrow map over the scan.
    */
  def tokenizerFertility(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String]): DataFrame =
    df.select(col(idCol),
        tokenCount(col(textCol)).cast("long").as("n_words"),
        NativeExpressions.wordpieceCount(col(textCol), vocab).as("n_pieces"))
      .withColumn("fertility",
        round(col("n_pieces").cast("double") /
          greatest(col("n_words"), lit(1L)).cast("double"), 4))

  /** Canonical NFC + whitespace-collapsed lowercase form — the
    * normalization step shared by fingerprinting and exact dedup, and
    * (since the canon unification) IDENTICAL to [[normalizeText]]'s
    * qd48 canon: Unicode NFC first, so the composed and decomposed
    * spellings of "Café" hash as the same document — without it,
    * decomposed-Unicode duplicates leak past every fingerprint-based
    * dedup gate by default. Collapse runs BEFORE trim (Spark/DuckDB
    * `trim` strips only spaces, so the reverse order leaks a stray edge
    * space for boundary tabs/newlines and trailing-newline variants of
    * the same doc hash apart). DuckDB replays as
    * `trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))`.
    *
    * MIGRATION: changing this canon changes `content_hash` values, and
    * stored hashes are data — corpora written by an older engine (any
    * pre-NFC canon, i.e. [[legacyNormalized]]) must be converged with
    * [[graft.streaming.CorpusIngest.rehashCorpus]] (and exact-dedup
    * sinks restarted on a fresh checkpoint) or new duplicates of old
    * docs will be admitted under the new hash.
    */
  def normalized(text: Column): Column = normalizeText(text)

  /** LEGACY pre-NFC canon (lower + collapse + trim, NO Unicode
    * normalization) — kept ONLY so corpora hashed by older engine
    * versions can be identified and migrated
    * ([[graft.streaming.CorpusIngest.rehashCorpus]] probes it). New
    * code must use [[normalized]]: this form hashes composed vs
    * decomposed spellings of the same text apart.
    */
  def legacyNormalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint: md5 of the [[normalized]] (NFC-canon) text.
    * md5 (not xxhash64) so the value is portable across engines for
    * oracle checks; swap [[fastFingerprint]] in when only intra-engine
    * equality matters.
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** [[legacyNormalized]]'s fingerprint — migration probe only. */
  def legacyFingerprint(text: Column): Column = md5(legacyNormalized(text))

  /** 64-bit xxhash fingerprint — cheaper at scale, Spark-internal. */
  def fastFingerprint(text: Column): Column = xxhash64(normalized(text))

  /** Rolling hash over the token stream (order-sensitive, unlike the
    * set-based MinHash): fold rotate-left(acc, 5) ⊕ xxhash64(token).
    * Shift/xor (not multiply-add) so ANSI mode — Spark 4's default — never
    * sees an overflow. Detects exact token-sequence reuse.
    */
  def rollingTokenHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) =>
      shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59)).bitwiseXOR(xxhash64(t)))
}
