package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sparse (keyword) retrieval and rank fusion — the other half of the
  * retrieval stack next to [[Similarity]]'s dense ANN family. Training-data
  * pipelines use sparse retrieval for targeted curation (pull documents
  * matching a topic word list), contamination forensics (which training
  * docs score highest against a benchmark query), and as the lexical leg
  * of hybrid search.
  *
  * Everything here is exact and engine-portable: BM25's per-term partial
  * scores are pure functions of integer statistics (tf, df, N, doc length)
  * rounded to 6 dp and summed as DECIMAL — order-free — so every ranking
  * replays verbatim in SQL (qr01/qe16's oracles).
  */
object Retrieval {

  /** Per-corpus BM25 scalars: document count and average doc length.
    * Pure corpus constants — independent of any query — so repeated
    * query batches over one corpus should compute them ONCE
    * ([[bm25CorpusStats]]) and pass them to [[bm25Search]], turning
    * each search into a single corpus pass (the postings scan).
    */
  case class Bm25Stats(n: Long, avgdl: Double)

  /** One narrow single-column pass over the corpus: the stats
    * [[bm25Search]] would otherwise recompute per call. Same
    * tokenizer, same integer-sum/count division, so supplying the
    * result is score-identical to the inline computation.
    */
  def bm25CorpusStats(docs: DataFrame, textCol: String): Bm25Stats = {
    val r = docs.select(docLen(col(textCol)).as("dl"))
      .agg(count(lit(1)).cast("long").as("n"),
        (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
      .head()
    require(r.getLong(0) > 0L,
      "bm25CorpusStats: corpus is empty — BM25 needs at least one document")
    Bm25Stats(r.getLong(0), r.getDouble(1))
  }

  /** Whitespace-lowercase token count — THE `dl` every BM25 path uses.
    * Token-less docs have dl = 0 and no postings rows, but still count
    * toward N (they can never match a term either way).
    *
    * Round 20: the allocation-free [[NativeExpressions.TokenCountExpr]]
    * kernel, with the `lower` dropped — value-identical to
    * `size(tokens(lower(text)))`: no Unicode lowercase mapping
    * produces or removes whitespace (or edge spaces), so lowercasing
    * never changes token boundaries or the count. The stats/dl passes
    * stop paying a full lower+split+array per doc just to count
    * (guide §2.3 "narrower types"/§4); the postings explode keeps its
    * lowered token ARRAY — it needs the terms themselves.
    */
  def docLen(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    NativeExpressions.tokenCountOf(text).cast("long")

  /** The (doc_id, dl, term, tf) postings derivation every BM25 path
    * shares — [[bm25Search]] builds it inline (term-restricted first),
    * the corpus sinks persist it as the `_graft_postings` sidecar, and
    * the adoption/reconcile backfills re-derive it from stored text.
    * One derivation, so sidecar search is score-identical by
    * construction.
    */
  def postingsOf(docs: DataFrame, idCol: String, textCol: String,
      extraKeys: Seq[String] = Nil): DataFrame = {
    // round 20: tf via the per-row TokenCounts kernel — one row per
    // distinct (doc, term) straight out of the explode, no groupBy
    // exchange (tf is doc-local; kernel ≡ explode+groupBy spec-pinned).
    // Same rows/values as the grouped form at any layout.
    val tc = NativeExpressions.tokenCounts(lower(col(textCol)))
    docs.select(Seq(col(idCol).as("doc_id"), docLen(col(textCol)).as("dl"),
        explode(arrays_zip(
          tc.getField("toks").as("toks"),
          tc.getField("cnts").as("cnts"))).as("__z")) ++ extraKeys.map(col): _*)
      .select((Seq(col("doc_id"), col("dl"), col("__z.toks").as("term"),
        col("__z.cnts").as("tf")) ++ extraKeys.map(col)): _*)
  }

  /** Score queries against an ALREADY-BUILT postings frame
    * ((doc_id, dl, term, tf) — [[postingsOf]]'s layout, e.g. the corpus
    * sinks' `_graft_postings` sidecar) plus precomputed corpus stats:
    * BM25 with ZERO corpus passes and zero tokenization. The frame may
    * be pre-pruned (term-bucket directories); the broadcast semi-join
    * here re-restricts to exactly the query terms either way, and df
    * comes from the restricted window — correct as long as the frame
    * holds EVERY posting of each query term (bucket layouts do: a term's
    * postings all live in its hash bucket).
    */
  def bm25FromPostings(postings: DataFrame, stats: Bm25Stats,
      queries: DataFrame, queryIdCol: String, termCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(termCol).as("term")).distinct())
    val qTerms = broadcast(q.select(col("term")).distinct())
    val restricted = postings
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
      .join(qTerms, Seq("term"), "left_semi")
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    val statsDf = postings.sparkSession.range(1)
      .select(lit(stats.n).as("n"), lit(stats.avgdl).as("avgdl"))
    scoreBm25(restricted, statsDf, q, k, k1, b)
  }

  /** The shared scoring tail: restricted postings (with df) × queries ×
    * broadcast scalars → 6-dp DECIMAL-summed scores → per-query top-k.
    */
  private def scoreBm25(postings: DataFrame, stats: DataFrame, q: DataFrame,
      k: Int, k1: Double, b: Double): DataFrame = {
    val idf = log(lit(1.0d) +
      (col("n").cast("double") - col("df").cast("double") + lit(0.5d)) /
        (col("df").cast("double") + lit(0.5d)))
    val tfd = col("tf").cast("double")
    val norm = tfd * lit(k1 + 1.0d) /
      (tfd + lit(k1) * (lit(1.0d - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    postings
      .join(q, "term")                      // broadcast: attach query ids
      .crossJoin(broadcast(stats))
      .withColumn("part", round(idf * norm, 6).cast(DecimalType(18, 6)))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("part")).cast("double").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }

  /** BM25 top-k search (Robertson & Zaragoza 2009, "The Probabilistic
    * Relevance Framework: BM25 and Beyond"; the Lucene `+1` idf variant so
    * idf stays positive even for terms in more than half the corpus):
    *
    *   idf(t)        = ln(1 + (N − df + 0.5) / (df + 0.5))
    *   score(q, d)   = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * `queries` is a (queryIdCol, termCol) table — one row per query term,
    * terms lowercase. Matching is exact on whitespace tokens lowercased
    * (the corpus-side analyzer is [[TextAnalysis.tokens]] over
    * `lower(text)` — same normalization as the dedup family).
    *
    * Scale shape: the exploded token stream is semi-joined against the
    * BROADCAST query-term set BEFORE any shuffle, so the only rows that
    * ever move are hits on query terms — the (doc, term, tf) grouped
    * aggregation (map-side combine), the df window count over `term`,
    * and the final (query, doc) sum all shuffle that restricted set,
    * never the corpus vocabulary. df needs no second corpus pass: the
    * term-restricted postings retain EVERY doc containing a query term,
    * so `count(*) over (partition by term)` on them IS the document
    * frequency. N and avgdl are one scalar row from a separate narrow
    * single-column pass — per-corpus constants, so production query
    * batches should build them once with [[bm25CorpusStats]] and pass
    * `corpusStats` to make each search a SINGLE corpus pass
    * (ScanCountSpec pins both budgets) — broadcast-cross-joined.
    * The final top-k is a per-query window over only MATCHING
    * (query, doc) pairs — candidate volume is bounded by the query
    * terms' posting lists, never N×Q. Determinism: per-term partials
    * are rounded to 6 dp and DECIMAL-summed (order-free), ties break
    * on doc id.
    */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      corpusStats: Option[Bm25Stats] = None): DataFrame = {
    // distinct enforces the one-row-per-(query, term) contract — a
    // duplicated input row would otherwise double that term's partial
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(termCol).as("term")).distinct())
    val qTerms = broadcast(q.select(col("term")).distinct())
    // postings restricted to query terms BEFORE any shuffle (the semi
    // join is broadcast)
    // round 20 (guide §2.4): (doc, term, tf) via the per-row
    // TokenCounts kernel — tf is DOC-LOCAL, so the kernel emits each
    // doc's (distinct token, count) table in place: the explode
    // generates one row per distinct token (not per occurrence), the
    // broadcast semi-join restricts to query terms as before, and the
    // (doc, dl, term) groupBy EXCHANGE disappears entirely — tf rides
    // out of the kernel. dl via the TokenCount kernel (value-identical,
    // see [[docLen]]; `size(toks)` next to the explode was a second,
    // separate split evaluation). Postings rows, values and the df
    // window are identical (kernel ≡ explode+groupBy is spec-pinned).
    val tc = NativeExpressions.tokenCounts(lower(col(textCol)))
    val postings = docs
      .select(col(idCol).as("doc_id"), docLen(col(textCol)).as("dl"),
        explode(arrays_zip(
          tc.getField("toks").as("toks"),
          tc.getField("cnts").as("cnts"))).as("__z"))
      .select(col("doc_id"), col("dl"),
        col("__z.toks").as("term"), col("__z.cnts").as("tf"))
      .join(qTerms, Seq("term"), "left_semi")
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    // corpus scalars: N docs, average doc length (integer sum / count —
    // deterministic double); precomputed stats skip this corpus pass
    val stats = corpusStats.fold(
      docs.select(docLen(col(textCol)).as("dl"))
        .agg(count(lit(1)).cast("long").as("n"),
          (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))) { s =>
      docs.sparkSession.range(1)
        .select(lit(s.n).as("n"), lit(s.avgdl).as("avgdl"))
    }
    scoreBm25(postings, stats, q, k, k1, b)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * fuse any two rankings of the same id space by
    * `score(d) = Σ_r 1/(rrfK + rank_r(d))` — rank-only, so the two
    * rankers' incomparable score scales never matter. The standard
    * hybrid-search combiner for a sparse (BM25) leg and a dense
    * (embedding cosine) leg.
    *
    * Inputs are (query_id, doc_id, rank) tables; a doc absent from one
    * leg simply contributes nothing from it (full-outer union
    * semantics). 1/(rrfK+rank) sums at most `legs` terms — rounded to
    * 6 dp and DECIMAL-summed, order-free; final ties break on doc id.
    * Scale shape: the legs are already top-k-bounded (k·Q rows), so the
    * fusion is a union + grouped sum over tiny inputs — never touches
    * the corpus.
    */
  def rrfFuse(legs: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranking")
    val contrib = legs.map(_.select(col("query_id"), col("doc_id"),
      round(lit(1.0d) / (lit(rrfK.toDouble) + col("rank").cast("double")), 6)
        .cast(DecimalType(18, 6)).as("part")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    contrib.reduce(_ unionByName _)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("part")).cast("double").as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }

  /** Pseudo-relevance-feedback query expansion (the Rocchio 1971 / RM3
    * family: assume the first pass's top documents are relevant, mine
    * their most characteristic terms, and re-search with the enriched
    * query — the classic recall lever when queries are short): per
    * query, take the top `fbDocs` BM25 hits, score their terms by
    * tf-in-feedback × ln(N/df) (the qr06 weighting — high-df stopwords
    * can't win), drop the original query terms, keep the top `fbTerms`,
    * and run the SECOND BM25 pass with the expanded term set.
    *
    * Determinism/portability: expansion scores round as
    * round(tf · round(ln(N/df), 6), 6) with ties to the smaller term;
    * both BM25 passes share one corpus-stats scalar; the entire
    * two-pass chain replays in SQL (qr09's oracle).
    *
    * Scale shape: 5 corpus passes, each executed exactly once — stats
    * (skippable via `corpusStats`), first-pass postings (whose ≤
    * fbDocs·Q result is eagerly checkpointed so its two broadcast
    * consumers can never re-derive it — ScanCountSpec pins the budget),
    * the feedback-doc token pull (semi-joined to the broadcast doc set
    * BEFORE the explode moves anything), the candidate-term df count
    * (semi-joined to the broadcast feedback vocabulary), and
    * second-pass postings. Every join's small side broadcasts; both
    * search passes keep BM25's restrict-before-shuffle discipline.
    */
  def prfExpandedSearch(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String,
      fbDocs: Int = 3, fbTerms: Int = 2, k: Int = 5,
      corpusStats: Option[Bm25Stats] = None): DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 0 && k >= 1,
      s"prfExpandedSearch: bad args (fbDocs=$fbDocs, fbTerms=$fbTerms, k=$k)")
    val stats = corpusStats.getOrElse(bm25CorpusStats(docs, textCol))
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(termCol).as("term")).distinct()
    // ≤ fbDocs·Q rows, materialized EAGERLY: both broadcasts below (and
    // nothing else) read this checkpoint, so the first-pass postings
    // derivation executes exactly once — without it the two separately-
    // broadcast projections can re-run the whole first search unless
    // exchange reuse happens to dedupe it (qr09's scan budget is pinned
    // in ScanCountSpec)
    val run1 = bm25Search(docs, idCol, textCol, q, "query_id", "term",
      k = fbDocs, corpusStats = Some(stats)).localCheckpoint(true)
    val fb = broadcast(run1.select(col("query_id"), col("doc_id")))
    val fbIds = broadcast(run1.select(col("doc_id")).distinct())
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    // feedback-doc term frequencies: the explode runs over ≤ fbDocs·Q
    // docs only (semi-join first)
    // feedback-vocabulary-sized, checkpointed: ft feeds BOTH the df
    // restriction (`cand`) and the expansion scoring join — without the
    // materialization its docs-scan lineage executes once per consumer
    val ft = docs.select(col(idCol).as("doc_id"), col(textCol))
      .join(fbIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(toks).as("term"))
      .join(fb, "doc_id")
      .groupBy(col("query_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
      .localCheckpoint(true)
    val cand = broadcast(ft.select(col("term")).distinct())
    // candidate-term document frequency via the per-row TokenCounts
    // kernel (round 20, guide §2.4): df counts DOCS per term, and
    // "distinct terms of a doc" is doc-local — the kernel emits each
    // doc's distinct token list in place, so the explode is already
    // (doc, term)-deduped and the old corpus-sized
    // explode→semi-join→distinct EXCHANGE disappears; only the final
    // per-term count shuffles (map-side combined, candidate-vocabulary
    // rows). Counts identical: per-doc-distinct explode ≡
    // distinct(doc_id, term), same lowered split semantics incl. empty
    // edge tokens, null text → no rows on both forms.
    val dfv = docs
      .select(explode(NativeExpressions.tokenCounts(lower(col(textCol)))
        .getField("toks")).as("term"))
      .join(cand, Seq("term"), "left_semi")
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("dfq"))
    val wExp = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("term"))
    val expanded = ft.join(dfv, "term")
      .withColumn("score", round(col("tf").cast("double")
        * round(log(lit(stats.n.toDouble) / col("dfq").cast("double")), 6), 6))
      .join(broadcast(q), Seq("query_id", "term"), "left_anti")
      .withColumn("__rn", row_number().over(wExp))
      .filter(col("__rn") <= fbTerms)
      .select(col("query_id"), col("term"))
    bm25Search(docs, idCol, textCol,
      q.unionByName(expanded).distinct(), "query_id", "term",
      k = k, corpusStats = Some(stats))
  }

  /** Offline retrieval-quality evaluation — the trec_eval metric battery
    * every retrieval stack (qr01/qr02/qe16/qr03) needs before its index
    * or fusion weights ship: per query, binary-relevance
    * precision@k / recall@k / reciprocal rank / nDCG@k against a qrels
    * table.
    *
    * Conventions (trec_eval's): the evaluated query set is the DISTINCT
    * queries of `qrels` — run rows for unjudged queries are ignored, and
    * a judged query missing from the run scores zeros. Only run rows with
    * rank ≤ k count. Binary gains, log2 discount:
    * DCG@k = Σ_rel 1/log2(rank+1), IDCG@k = Σ_{i=1..min(nRel,k)}
    * 1/log2(i+1), nDCG = DCG/IDCG.
    *
    * Determinism / portability: every DCG term is rounded to 6 dp and
    * DECIMAL-summed (order-free, like the BM25 partials), the IDCG
    * denominators come from a k-row cumulative table joined on
    * min(nRel, k) (no per-query sequence explode), and the remaining
    * metrics are exact small-integer ratios — so the whole battery
    * replays verbatim in SQL (qr04's oracle).
    *
    * Scale shape: the run is top-k-bounded (k·Q rows) and qrels tables
    * are human- or heuristic-labeled — both tiny next to any corpus; the
    * join/agg here never touch corpus data. nRel and first-relevant-rank
    * are grouped aggs on (query_id); the k-row IDCG table broadcasts.
    */
  def evalRun(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"evalRun: k must be >= 1, got $k")
    val spark = run.sparkSession
    // EXPLICIT broadcasts (round 19): every frame here is bounded by
    // the JUDGED set (qrels pairs / distinct queries) or the top-k run
    // (k·Q rows) — scale-independent metadata at any corpus size — but
    // post-aggregation size estimates are unknown, so the planner fell
    // back to SortMergeJoin (plan-verified: 2 SMJs + their exchanges
    // and sorts per eval). Broadcasting the judged side is the
    // deliberate, scale-correct choice; results unchanged.
    val rel = broadcast(qrels.select(col("query_id"), col("doc_id")).distinct())
    // per-query judged-relevant counts — the evaluated query universe
    val nRel = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("n_rel"))
    // top-k run rows that hit a judged-relevant doc, with their DCG term
    val hits = run.filter(col("rank") <= k)
      .join(rel, Seq("query_id", "doc_id"), "left_semi")
      .select(col("query_id"), col("rank"),
        // ln-based log2 — structurally identical to the oracle SQL's
        // 1/(ln(r+1)/ln(2)) so both engines round the same doubles
        round(lit(1.0d) / (log(col("rank").cast("double") + lit(1.0d)) / log(lit(2.0d))), 6)
          .cast(DecimalType(18, 6)).as("dcg_term"))
    val perQuery = hits.groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("hits"),
        sum(col("dcg_term")).cast("double").as("dcg"),
        min(col("rank")).as("first_rel_rank"))
    // cumulative ideal-DCG table: i -> Σ_{j<=i} round(1/log2(j+1), 6)
    // (exact BigDecimal partial sums, k rows, broadcast)
    val ideal = {
      var acc = BigDecimal(0)
      val rows = (1 to k).map { i =>
        // same 1/(ln(i+1)/ln 2) formula + HALF_UP 6-dp round as the
        // per-row dcg_term, so IDCG(n) ≡ DCG of a perfect length-n run
        acc += BigDecimal(1.0d / (math.log(i + 1.0d) / math.log(2.0d)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        (i.toLong, acc.toDouble)
      }
      import spark.implicits._
      broadcast(rows.toDF("ideal_i", "idcg"))
    }
    nRel
      .join(broadcast(perQuery), Seq("query_id"), "left")
      .na.fill(0L, Seq("hits"))
      .na.fill(0.0d, Seq("dcg"))
      .join(ideal, least(col("n_rel"), lit(k.toLong)) === col("ideal_i"))
      .select(col("query_id"), col("n_rel"), col("hits"),
        round(col("hits").cast("double") / lit(k.toDouble), 6).as("precision_at_k"),
        round(col("hits").cast("double") / col("n_rel").cast("double"), 6)
          .as("recall_at_k"),
        round(when(col("first_rel_rank").isNotNull,
            lit(1.0d) / col("first_rel_rank").cast("double"))
          .otherwise(lit(0.0d)), 6).as("rr"),
        round(col("dcg") / col("idcg"), 6).as("ndcg_at_k"))
  }

  /** Per-document tf-idf keyword extraction — the classic topic-tagging /
    * weak-labeling operator of corpus curation (route docs by their top
    * terms, build facet indexes, seed topic classifiers): for every doc,
    * the `m` terms with the highest tf · ln(N/df), ties to the
    * lexicographically smaller term.
    *
    * Determinism/portability: idf = round(ln(N/df), 6) and
    * score = round(tf · idf, 6) — every value an exact function of
    * integer statistics, so the whole extraction replays in SQL (qr06's
    * oracle). `minDf` drops sub-threshold hapax noise (and `df = N`
    * terms score 0 and fall to the rank tail naturally: ln(N/N) = 0).
    *
    * Scale shape: one token explode → (doc, term) grouped tf (map-side
    * combine, uniform keys), df as a window count over the (doc, term)
    * postings — shuffles |vocab×docs| POSTINGS rows, never raw tokens —
    * the N scalar from a separate narrow count pass broadcast in, and a
    * per-doc top-m window. Nothing all-pairs, nothing collected beyond
    * the 1-row scalar.
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      m: Int, minDf: Long = 1L): DataFrame = {
    require(m >= 1, s"tfidfKeywords: m must be >= 1, got $m")
    // round 20: (doc, term, tf) via the per-row TokenCounts kernel —
    // the (doc, term) groupBy exchange disappears (tf is doc-local) and
    // the explode emits one row per DISTINCT token instead of per
    // occurrence; the df window is the first (and only) shuffle.
    // Rows/values identical (kernel ≡ explode+groupBy spec-pinned).
    val tc = NativeExpressions.tokenCounts(lower(col(textCol)))
    val postings = docs
      .select(col(idCol).as("doc_id"), explode(arrays_zip(
        tc.getField("toks").as("toks"),
        tc.getField("cnts").as("cnts"))).as("__z"))
      .select(col("doc_id"), col("__z.toks").as("term"),
        col("__z.cnts").as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .filter(col("df") >= minDf)
    val n = docs.agg(count(lit(1)).cast("long").as("n"))
    val wTop = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    postings.crossJoin(broadcast(n))
      .withColumn("idf",
        round(log(col("n").cast("double") / col("df").cast("double")), 6))
      .withColumn("score", round(col("tf").cast("double") * col("idf"), 6))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= m)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score"), col("rnk"))
  }

  /** Corpus-level rollup of [[evalRun]]'s per-query battery — the single
    * reporting row retrieval dashboards track (macro averages: each
    * query weighs equally, trec_eval's convention; the `rr` mean IS
    * MRR). Per-query metrics are already 6-dp-rounded, so the DECIMAL
    * means here are exact and order-free. One Q-row aggregation.
    */
  def evalSummary(perQuery: DataFrame): DataFrame = {
    def m(c: String) = round(
      sum(col(c).cast(DecimalType(18, 6))).cast("double") / count(lit(1)), 6)
      .as(s"mean_$c")
    perQuery.agg(count(lit(1)).cast("long").as("n_queries"),
      m("precision_at_k"), m("recall_at_k"), m("rr"), m("ndcg_at_k"))
  }

  /** Hard-negative mining for retrieval-model training (the DPR /
    * contrastive fine-tuning recipe: the best negatives are the
    * top-ranked NON-relevant results of the current retriever, not
    * random docs): from a run, keep each query's `nNeg` highest-ranked
    * docs that carry no qrels judgment. Output
    * (query_id, doc_id, run_rank, neg_rank) — pairing with positives is
    * a trivial qrels join left to the caller, since the fan-out policy
    * (all pairs vs sampled) is training-specific.
    *
    * Scale shape: the run is top-k-bounded, the anti-join key set is the
    * qrels table (broadcast-small), and neg_rank is a window over
    * ≤ k rows per query — nothing here touches the corpus.
    */
  def hardNegatives(run: DataFrame, qrels: DataFrame, nNeg: Int): DataFrame = {
    require(nNeg >= 1, s"hardNegatives: nNeg must be >= 1, got $nNeg")
    val rel = broadcast(qrels.select(col("query_id"), col("doc_id")).distinct())
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rank").asc, col("doc_id"))
    run.join(rel, Seq("query_id", "doc_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= nNeg)
      .select(col("query_id"), col("doc_id"), col("rank").as("run_rank"),
        col("neg_rank"))
  }
}
