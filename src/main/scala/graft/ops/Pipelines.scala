package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

import graft.functions.{Curation, Dedup, Similarity, TextAnalysis}

/** The composed training-data pipelines behind the `qd10`/`qd19`/`qd27`/
  * `qd33`/`qe11` query entries, extracted to functions of their source
  * DataFrames so (a) SparkEntry stays declarative and (b) tests can
  * inject an accumulator-instrumented source and assert HOW MANY TIMES
  * the corpus is scanned end to end (ScanCountSpec) — the round-5
  * lesson: a dropped stage-boundary materialization re-derives shared
  * subframes multiplicatively (a measured 27× blow-up at sf0.1), and
  * only a scan-count assert turns that into a red test instead of a
  * quiet bench regression.
  *
  * Each function documents its scan budget: the number of full passes
  * over the input a correct plan performs. The budgets are what the
  * ScanCountSpec asserts (with the exact counts pinned there).
  */
object Pipelines {

  /** qd10 — corpus cleaning: quality gate → langid tag → exact dedup →
    * per-language stats. Single linear lineage, every stage narrow until
    * the dedup window + final agg: ONE scan of `docs`.
    */
  def corpusPipeline(docs: DataFrame): DataFrame = {
    val quality = docs
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
      .filter(col("n_tokens") >= 20)
    val tagged = TextAnalysis.withLangId(quality, "text", "lang_pred")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    val deduped = F1Ops.firstWinsDedup(tagged, Seq("fp"), Seq(col("doc_id")))
    deduped.groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"))
      .orderBy(col("lang_pred"))
  }

  /** qd19 — pre-training prep: quality gate → PII scrub → exact dedup →
    * chunking → per-source stats. Linear lineage: ONE scan of `docs`.
    */
  def pretrainingPipeline(docs: DataFrame): DataFrame = {
    val gated = docs.filter(TextAnalysis.tokenCount(col("text")) >= 20)
      .withColumn("text", TextAnalysis.scrubPii(col("text")))
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    val deduped = F1Ops.firstWinsDedup(gated, Seq("fp"), Seq(col("doc_id")))
    TextAnalysis.chunkDocs(deduped, "doc_id", "text", chunkTokens = 64,
      overlap = 8, keepCols = Seq("source"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens")).cast("long").as("total_chunk_tokens"))
      .orderBy(col("source"))
  }

  /** qd27 — training-mix assembly: bench/corpus split → deterministic
    * train split → weighted sample → decontaminate vs the bench slice →
    * pack → per-source stats.
    *
    * Scan budget: the `sampled` frame is consumed twice (decontamination
    * probe + the anti-join keep side) and each derives from `docs`, plus
    * the bench slice is its own pass — a handful of scans of a corpus
    * that narrows by ~50× in the first two filters, NOT multiplicative
    * in pipeline depth. ScanCountSpec pins the exact count so a future
    * edit that re-derives `sampled` per consumer turns red.
    */
  def mixPipeline(docs: DataFrame, weights: Map[String, Double]): DataFrame = {
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val train = Curation.withSplit(corpus, "doc_id")
      .filter(col("split") === "train")
    val sampled = Curation.weightedSample(train, "source", "doc_id", weights)
    val contaminated = TextAnalysis.decontaminate(
        sampled, "doc_id", "text", bench, "text", n = 3)
      .filter(col("contaminated")).select("doc_id")
    val clean = sampled.join(contaminated, Seq("doc_id"), "left_anti")
    Curation.packSequences(
        clean.select(col("source"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok")),
        "source", "doc_id", "n_tok", budget = 512L)
      .groupBy(col("source"))
      .agg(countDistinct(col("bin_id")).as("n_bins"),
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("total_tokens"))
      .orderBy(col("source"))
  }

  /** qd33 — the curation capstone: unigram-LM quality gate →
    * duplicated-passage gate → DSIR target-likeness selection →
    * per-language mix stats.
    *
    * Stage boundaries are persisted (MEMORY_AND_DISK — lineage kept for
    * fault recovery): each downstream stage function references its
    * input 3–4× internally (token explode + vocab join + totals), so an
    * un-materialized lineage multiplies into repeated full-corpus
    * re-scans — at 100 TB every re-derivation is a fresh corpus pass.
    * Materializing tf/s1/s2 keeps the composition at the sum of its
    * stage costs (two corpus passes total: the tf featurize fill and
    * the s1 join side); the eager stage operators (dupPassageProfile, dsirWeights)
    * populate the caches as they run, and both stages are unpersisted
    * once the 3-row summary is checkpointed, so the query leaves no
    * corpus-sized storage residue behind. ScanCountSpec pins the scan
    * count of `docs`; deleting either persist turns it red.
    */
  def curationPipeline(docs: DataFrame): DataFrame = {
    // the LM gate's two consumers (vocab build, per-doc scoring) read
    // the persisted per-doc term-frequency seam instead of re-scanning
    // the corpus — with the s1 join side, the whole pipeline makes TWO
    // corpus passes (ScanCountSpec budget), and tf (distinct-token
    // grouped, much smaller than the corpus explode) is freed as soon
    // as s1 is materialized by the eager dup-profile stage below
    val tf = TextAnalysis.unigramTf(docs, "doc_id", "text")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val lm = TextAnalysis.unigramLogProbFromTf(tf, "doc_id")
    val s1 = docs.join(
      lm.filter(col("avg_logprob") >= -3.41).select("doc_id", "n_tok"), "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dup = Dedup.dupPassageProfile(s1, "doc_id", "text", n = 5)
    tf.unpersist(false)
    val s2 = s1.join(
      dup.filter(col("dup_frac") <= 0.5).select("doc_id", "dup_frac"), "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dsir = Curation.dsirWeights(s2, "doc_id", "text",
      s2.filter(col("lang") === "en"), "text", buckets = 1024)
    val s3 = s2.join(
      dsir.filter(col("dsir_logratio") > 0).select("doc_id"), "doc_id")
    val result = s3.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("total_tokens"),
        sum(col("dup_frac").cast(DecimalType(18, 4))).as("__s"))
      .withColumn("avg_dup_frac",
        round(col("__s").cast("double") / col("n_docs"), 4))
      .drop("__s")
      .orderBy(col("lang"))
      .localCheckpoint(true)
    s1.unpersist(false)
    s2.unpersist(false)
    result
  }

  /** qr08 — the retrieval-quality loop over ONE shared restricted
    * postings derivation: a narrow stats pass
    * ([[graft.functions.Retrieval.bm25CorpusStats]] — N/avgdl need every
    * doc), then the query-term-restricted (doc, dl, term, tf) postings —
    * semi-joined against the broadcast term set BEFORE the shuffle, BM25's
    * discipline — persisted once and serving the run
    * ([[graft.functions.Retrieval.bm25FromPostings]]), the tf-floor
    * qrels (the restricted postings ARE the judgment's (doc, term, tf)
    * table), the trec_eval battery, and the hard-negative counts.
    * 2 corpus passes total (ScanCountSpec) where standalone qr04 + qr05
    * pay ~5; an unrestricted 1-pass postings materialization measured
    * SLOWER (5.7 s vs ~2.5 s at sf0.1) — the full-vocabulary aggregation
    * dominates everything it saves, so restrict-first wins even at the
    * cost of a second narrow pass. Output: per judged query, the eval
    * battery + how many of its top-k run docs are mineable negatives.
    */
  def retrievalEvalPipeline(docs: DataFrame, queries: DataFrame,
      k: Int = 10, qrelsMinTf: Int = 3, nNeg: Int = 5): DataFrame = {
    import graft.functions.Retrieval
    val stats = Retrieval.bm25CorpusStats(docs, "text")
    val q = broadcast(queries.select(col("query_id"), col("term")).distinct())
    val qTerms = broadcast(q.select(col("term")).distinct())
    val toks = TextAnalysis.tokens(lower(col("text")))
    val postings = docs
      .select(col("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("term"))
      .join(qTerms, Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val run = Retrieval.bm25FromPostings(postings, stats, q,
      "query_id", "term", k)
    val qCnt = broadcast(q.groupBy(col("query_id"))
      .agg(countDistinct(col("term")).as("__qt")))
    val qrels = postings // already query-term-restricted
      .filter(col("tf") >= qrelsMinTf)
      .join(q, "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(countDistinct(col("term")).as("__nt"))
      .join(qCnt, "query_id")
      .filter(col("__nt") === col("__qt"))
      .select(col("query_id"), col("doc_id"))
    val ev = Retrieval.evalRun(run, qrels, k)
    val negs = Retrieval.hardNegatives(run, qrels, nNeg)
      .groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("n_hard_negatives"))
    val out = ev.join(negs, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hard_negatives"))
      .localCheckpoint(true)
    postings.unpersist(false)
    out
  }

  /** qd61's planted fixture (the qd48/qd52 pattern): the raw corpus has
    * no exact duplicates under the canon, so the capstone's dedup/
    * decontamination stages would be vacuously green on it. Three
    * deterministic plant families — derived from existing rows so they
    * adapt to any scale factor, each restricted to ≥ 30-token docs so
    * every plant survives the quality gate, and to the corpus side
    * (`% 50 <> 0`) so it meets its intended stage:
    *  - exact dups: `upper(text) || '  '` under id+1e6 — byte-distinct,
    *    canon-identical (case + whitespace), so ONLY the canonical
    *    fingerprint catches them;
    *  - near dups: a 4-token tail under id+2e6 — high-Jaccard LSH pair
    *    with its original, which wins the min-id keeper rule;
    *  - bench leaks: bench-slice texts re-emitted under corpus ids
    *    (+3000001 keeps them off the `% 50 = 0` slice) — verbatim
    *    contamination the 3-gram gate must drop.
    * Replayed row for row by qd61Sql's `base` CTE.
    */
  def fullPipelineFixture(docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("source"), col("text"))
    val nt = TextAnalysis.tokenCount(col("text"))
    val exactDups = d
      .filter(col("doc_id") % 97 === 1 && col("doc_id") % 50 =!= 0 && nt >= 30)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
        concat(upper(col("text")), lit("  ")).as("text"))
    val nearDups = d
      .filter(col("doc_id") % 89 === 2 && col("doc_id") % 50 =!= 0 && nt >= 30)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("source"),
        concat(col("text"), lit(" near dup tail token")).as("text"))
    val leaks = d
      .filter(col("doc_id") % 50 === 0 && col("doc_id") % 7 === 0 && nt >= 30)
      .select((col("doc_id") + 3000001L).as("doc_id"), col("source"),
        col("text"))
    d.unionByName(exactDups).unionByName(nearDups).unionByName(leaks)
  }

  /** qd61 — the END-TO-END training-data capstone: the single composed
    * query a training-data team runs over a raw crawl, every stage an
    * individually oracle-proven operator, chained in the canonical
    * order (normalize before hashing; dedup before decontamination so
    * the gate probes unique docs; split before mixing so mix rates are
    * computed on the train population; pack after all row drops):
    *
    *   raw documents
    *   → NFC canon normalization (qd48's [[TextAnalysis.normalizeText]])
    *   → quality gate (≥ 20 tokens — qd10/qd19's gate)
    *   → exact dedup on the canonical fingerprint (qd01)
    *   → near dedup: MinHash-LSH pairs (qd09) → connected components
    *     (qd14) → keep each cluster's min-id representative
    *   → exact 3-gram decontamination vs the benchmark slice
    *     (doc_id % 50 = 0 — qd22's convention)
    *   → deterministic 90/5/5 split, keep train (qd23)
    *   → temperature mix α=0.5 under a 5k-token budget
    *     (qd50's plan, doc-level via [[Curation.temperatureMixDocs]];
    *     salted bucket `mix#` — the split already consumed the
    *     unsalted md5 draw, and %100 divides %10000)
    *   → concat-then-chunk packing into 128-token sequences (qd57)
    *   → shard export manifest: sequences binned into 8 shards by
    *     md5 bucket (qd46's assignment applied to seq_id), per-shard
    *     sequence/doc/token accounting.
    *
    * The WHOLE chain replays in SQL (qd61's oracle composes the qd48 +
    * qd09 + qd14 + qd22 + qd23 + qd50 + qd57 CTEs); every stage is
    * non-vacuous at sf0.001+ (PipelineSpec asserts each drops rows).
    *
    * Scan budget (ScanCountSpec): the corpus is read in TWO lineages —
    * the gated/deduped chain (materialized once into the persisted
    * `exact` seam, though its first action races the sig/verify
    * branches before cache blocks land, so the pin allows the startup
    * double-read) and the benchmark-slice gram build. Everything
    * downstream — components, decontamination probe, split, mix plan +
    * filter, packing, manifest — reads the `exact` cache or
    * pair-table-sized frames. At 100 TB every stage keeps its parent
    * operator's shape: banded equi-joins for pairs, broadcast gram/
    * threshold sides, the two-phase prefix sum for packing — nothing
    * all-pairs, nothing single-partition.
    *
    * `portable = true` (qd61 — the oracle form) signs MinHash with md5
    * so the whole composition replays in DuckDB; `portable = false`
    * (qd65's rows-only production twin) uses the xxhash64 signatures —
    * the 100 TB posture, ~2× cheaper on the signature pass. The ONLY
    * divergence between the twins is the LSH candidate draw (different
    * hash family ⇒ different band collisions at equal recall
    * guarantees): the canon, exact dedup groups, decontamination,
    * split, mix thresholds and packing arithmetic are hash-independent
    * (PipelineSpec pins the twins' manifests within the near-dup
    * wiggle).
    */
  def fullPipeline(docs: DataFrame, portable: Boolean = true): DataFrame = {
    import graft.functions.NativeExpressions
    val normed = docs.select(col("doc_id"), col("source"),
      TextAnalysis.normalizeText(col("text")).as("norm_text"))
    val bench = normed.filter(col("doc_id") % 50 === 0)
    val gated = normed.filter(col("doc_id") % 50 =!= 0)
      .withColumn("n_tok", TextAnalysis.tokenCount(col("norm_text")).cast("long"))
      .filter(col("n_tok") >= 20)
    // the canon is idempotent, so fingerprint(norm_text) ≡ md5(norm_text)
    // — which is exactly what the SQL oracle hashes
    val exact = F1Ops.firstWinsDedup(
        gated.withColumn("__fp", TextAnalysis.fingerprint(col("norm_text"))),
        Seq("__fp"), Seq(col("doc_id")))
      .drop("__fp")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup.minHashNearDups(exact, "doc_id", "norm_text",
      k = 16, bands = 4, shingleN = 3, minJaccard = 0.5, portable = portable)
    val losers = Dedup.nearDupComponents(pairs)
      .filter(!col("is_keeper")).select("doc_id")
    val reps = exact.join(losers, Seq("doc_id"), "left_anti")
    // exact n-gram decontamination is hash-independent in OUTCOME
    // (identical drop set whether grams key by md5 strings or xxhash64
    // longs), so the production twin takes the ~2× cheaper long-keyed
    // gram shuffle while the oracle form stays DuckDB-replayable
    val contaminated = TextAnalysis.decontaminate(reps, "doc_id", "norm_text",
        bench, "norm_text", n = 3, portable = portable)
      .filter(col("contaminated")).select("doc_id")
    val clean = reps.join(contaminated, Seq("doc_id"), "left_anti")
    val train = Curation.withSplit(clean, "doc_id")
      .filter(col("split") === "train")
    val mixed = Curation.temperatureMixDocs(train, "source", "doc_id",
      "norm_text", alpha = 0.5, tokenBudget = 5000L, bucketSalt = "mix#")
    val packed = Curation.packStream(mixed, "doc_id", col("n_tok"),
      contextLen = 128)
    val out = packed
      .withColumn("shard_id",
        NativeExpressions.md5Bucket(col("seq_id").cast("string"), 8))
      .groupBy(col("shard_id"))
      .agg(countDistinct(col("seq_id")).as("n_seqs"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("take")).cast("long").as("n_tokens"))
      .orderBy(col("shard_id"))
      .localCheckpoint(true)
    exact.unpersist(false)
    out
  }

  /** qe13 — IVF-PQ (Jégou et al. 2011 §IV, the FAISS IVFPQ
    * architecture): coarse centroids partition the space, each vector's
    * RESIDUAL (v − its centroid) is product-quantized, and search
    * probes `nProbe` cells scoring the full-precision query against
    * `centroid + decode(residual code)` — the memory-resident ANN shape
    * for a 100 TB embedding table (coarse structure from IVF, 32×
    * storage from PQ, and residuals quantize tighter than raw vectors
    * because each cell's residual cloud is centered).
    *
    * Deterministic throughout (prefix centroids vec_id<8, prefix
    * residual codebooks vec_id<16 — the qe08/qe12 conventions), so the
    * entire pipeline replays in SQL. Scan budget: ONE pass over `emb`
    * (base is persisted; assignment, residual codebooks, the encoded
    * index and the probes all derive from it — pinned in ScanCountSpec).
    */
  def ivfPq(emb: DataFrame): DataFrame = {
    import graft.functions.NativeExpressions
    val base = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val centroids = base.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell_id"), col("v").as("centroid"))
    val cm = Similarity.Ivf.centroidMatrix(centroids)
    val cmLit = typedLit(cm.map(_.toSeq).toSeq)
    val assigned = base
      .withColumn("cell_id",
        element_at(NativeExpressions.nearestCells(col("v"), cm, 1), 1))
      .withColumn("centroid", element_at(cmLit, col("cell_id") + 1))
      .withColumn("residual", zip_with(col("v"), col("centroid"), (a, b) => a - b))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cb = Similarity.Pq.codebookMatrices(
      Similarity.Pq.prefixCodebooks(
        assigned.select(col("vec_id"), col("residual")), "vec_id", "residual",
        nSub = 8, nCodes = 16))
    val index = Similarity.Pq.encode(assigned, "residual", cb)
      .withColumn("vhat",
        zip_with(col("centroid"), Similarity.Pq.decode(col("pq_code"), cb),
          (a, b) => a + b))
      .select(col("vec_id").as("neighbor_id"), col("cell_id"), col("vhat"))
    val probes = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("__qv"))
      .withColumn("cell_id",
        explode(NativeExpressions.nearestCells(col("__qv"), cm, 2)))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cosine").desc, col("neighbor_id"))
    val result = index.join(broadcast(probes), Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx_cosine",
        round(Similarity.cosine(col("vhat"), col("__qv")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("approx_cosine"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"), col("neighbor_id"))
      .localCheckpoint(true)
    assigned.unpersist(false)
    base.unpersist(false)
    result
  }

  /** qe18 — the full production ANN funnel, composed end to end from
    * oracle-proven stages: IVF cell probing for candidate generation
    * (qe08's fixed prefix centroids — probe `nProbe` cells, never the
    * whole corpus), an MRL truncated-prefix coarse rank inside the
    * probed cells (qe15's stage 1 — dPrefix/D of full scoring per
    * candidate), and an exact full-dimension rerank of the short list
    * (qe15's stage 2). This is the shape a 100 TB vector store actually
    * serves: cells bound the candidate set, the cheap metric bounds the
    * scoring cost, the exact metric fixes the final order — and every
    * stage here is deterministic (rounded pre-window, ties on id), so
    * the WHOLE funnel replays in SQL.
    *
    * Scan budget: ONE pass over `emb` (the cast base is persisted;
    * centroids, probes, and the assigned corpus all derive from it).
    */
  def ivfMrlFunnel(emb: DataFrame, dPrefix: Int = 16, k: Int = 3,
      nProbe: Int = 2, rerankFactor: Int = 4): DataFrame = {
    import graft.functions.NativeExpressions
    val base = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val centroids = base.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell_id"), col("v").as("centroid"))
    val cm = Similarity.Ivf.centroidMatrix(centroids)
    val cells = base
      .select(col("vec_id").as("neighbor_id"), col("v").as("__v"))
      .withColumn("cell_id",
        element_at(NativeExpressions.nearestCells(col("__v"), cm, 1), 1))
    val probes = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("__qv"))
      .withColumn("cell_id",
        explode(NativeExpressions.nearestCells(col("__qv"), cm, nProbe)))
    val wCoarse = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("coarse_cosine").desc, col("neighbor_id"))
    val wFull = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val result = cells.join(broadcast(probes), Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("coarse_cosine", round(Similarity.cosine(
        slice(col("__v"), 1, dPrefix), slice(col("__qv"), 1, dPrefix)), 6))
      .withColumn("crank", row_number().over(wCoarse))
      .filter(col("crank") <= k * rerankFactor)
      .withColumn("cosine", round(Similarity.cosine(col("__v"), col("__qv")), 6))
      .withColumn("rnk", row_number().over(wFull))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"), col("neighbor_id"))
      .localCheckpoint(true)
    base.unpersist(false)
    result
  }

  /** qe11 — IVF search over an int8-quantized index. The dequantized
    * index feeds three branches (queries, corpus, centroids); persist it
    * once so the quantize→dequantize pass runs a single time — at scale
    * the persisted quantized frame IS the point of the operator.
    * Unpersisted once the k-row result is checkpointed. ScanCountSpec
    * pins the scan count of `emb`; deleting the persist turns it red.
    */
  def quantizedIvf(emb: DataFrame): DataFrame = {
    val prepared = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("mn", array_min(col("v")))
      .withColumn("mx", array_max(col("v")))
    val deq = prepared.select(col("vec_id"),
      Similarity.dequantizeInt8(
        Similarity.quantizeInt8(col("v")), col("mn"), col("mx")).as("embedding"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val centroids = deq.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell_id"), col("embedding").as("centroid"))
    val result = Similarity.Ivf.search(deq.filter(col("vec_id") < 5), deq, "vec_id",
      "embedding", centroids, k = 3, nProbe = 2)
      .withColumnRenamed("rank", "rnk")
      .orderBy(col("query_id"), col("rnk"), col("neighbor_id"))
      .localCheckpoint(true)
    deq.unpersist(false)
    result
  }
}
