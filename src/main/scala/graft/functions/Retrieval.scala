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
    val dl = size(TextAnalysis.tokens(lower(col(textCol)))).cast("long")
    val r = docs.select(dl.as("dl"))
      .agg(count(lit(1)).cast("long").as("n"),
        (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
      .head()
    require(r.getLong(0) > 0L,
      "bm25CorpusStats: corpus is empty — BM25 needs at least one document")
    Bm25Stats(r.getLong(0), r.getDouble(1))
  }

  /** The (doc_id, dl, term, tf) postings derivation every BM25 path
    * shares — [[bm25Search]] builds it inline (term-restricted first),
    * the corpus sinks persist it as the `_graft_postings` sidecar, and
    * the adoption/reconcile backfills re-derive it from stored text.
    * One derivation, so sidecar search is score-identical by
    * construction.
    */
  /** Whitespace-lowercase token count — THE `dl` every BM25 path uses.
    * Token-less docs have dl = 0 and no postings rows, but still count
    * toward N (they can never match a term either way).
    */
  def docLen(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    size(TextAnalysis.tokens(lower(text))).cast("long")

  def postingsOf(docs: DataFrame, idCol: String, textCol: String,
      extraKeys: Seq[String] = Nil): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    docs.select(Seq(col(idCol).as("doc_id"), docLen(col(textCol)).as("dl"),
        explode(toks).as("term")) ++ extraKeys.map(col): _*)
      .groupBy((Seq("doc_id", "dl", "term") ++ extraKeys).map(col): _*)
      .agg(count(lit(1)).as("tf"))
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

  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, queryIdCol: String, termCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      corpusStats: Option[Bm25Stats] = None): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    // distinct enforces the one-row-per-(query, term) contract — a
    // duplicated input row would otherwise double that term's partial
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(termCol).as("term")).distinct())
    val qTerms = broadcast(q.select(col("term")).distinct())
    // postings restricted to query terms BEFORE the shuffle (the semi
    // join sits under the groupBy, unlike postingsOf's unrestricted
    // form); dl (total token count, with multiplicity) rides along as a
    // grouping key
    val postings = docs
      .select(col(idCol).as("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("term"))
      .join(qTerms, Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    // corpus scalars: N docs, average doc length (integer sum / count —
    // deterministic double); precomputed stats skip this corpus pass
    val stats = corpusStats.fold(
      docs.select(size(toks).cast("long").as("dl"))
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
}
