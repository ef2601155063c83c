package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-curation operators: composing a training mix out of a cleaned
  * corpus. Public pipelines do this as "sampling weights" over sources /
  * languages (The Pile: Gao et al. 2020; LLaMA's per-source epochs) —
  * the relational form is per-group caps and per-group token budgets.
  *
  * Both operators are a single window partitioned by the group key: the
  * shuffle is on the group column, per-group state is a running count /
  * running sum, and results are deterministic because the intra-group
  * order is a total order (caller supplies the tie-broken sort).
  */
object Curation {

  /** Keep at most `nPerGroup` rows per group, chosen by `orderCols`
    * (deterministic — first-N under a total order, not a random sample;
    * pair with a hash column in `orderCols` for a seeded pseudo-random
    * draw that still replays exactly).
    */
  def balancedSample(df: DataFrame, groupCol: String, orderCols: Seq[Column],
      nPerGroup: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nPerGroup)
      .drop("__rn")
  }

  /** Greedy per-group prefix under a token budget: walk each group in
    * `orderCols` order accumulating `tokensCol`, keep every row whose
    * running total (inclusive) stays ≤ `budget`. Integer running sum —
    * exact and order-independent across engines given the total order.
    */
  def tokenBudgetMix(df: DataFrame, groupCol: String, orderCols: Seq[Column],
      tokensCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokensCol.cast("long")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Curriculum / difficulty bucketing — the quantile-binning step of
    * difficulty-ordered training mixes (curriculum learning schedules
    * feed "easy" quantiles first; quality-stratified mixes sample per
    * quantile): `ntile(nBuckets)` per group over a scored frame, plus
    * the per-(group, bucket) rollup (doc count, mean score). The score
    * column must be bounded-precision (a 4-dp rounded signal like
    * [[graft.functions.TextAnalysis.unigramLogProb]]'s `avg_logprob`) so
    * the DECIMAL mean is order-free and the whole binning replays in
    * SQL.
    *
    * Scale shape: ntile is a per-GROUP window — the shuffle key is the
    * group column and skew is bounded by the largest group, the same
    * profile as every per-source window here; the rollup reuses the
    * same partitioning (no second shuffle of doc rows). Ties inside a
    * group break on `idCol`, so bucket boundaries are deterministic.
    */
  def curriculumBuckets(scored: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, nBuckets: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol), col(idCol))
    // the mean stays INTEGRAL until the last step: exact e4-scaled sum,
    // integer/integer division (bit-identical double in any IEEE
    // engine), round at 0 dp — a double division before the 4-dp round
    // can land 1 ulp across the boundary and flip the last digit
    // between engines (observed at sf0.001)
    scored
      .withColumn("bucket", ntile(nBuckets).over(w))
      .groupBy(col(groupCol), col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        (round((sum(col(scoreCol).cast(DecimalType(18, 4))) * 10000)
            .cast("long").cast("double") / count(lit(1)).cast("double"), 0) /
          lit(10000.0d)).as("mean_score"))
      .orderBy(col(groupCol), col("bucket"))
  }

  /** Deterministic train/val/test assignment by a portable content-free
    * hash of the id: bucket ∈ [0, 100) = `md5_bucket(id)` (DuckDB:
    * `md5_number_lower(id) % 100` — same 64 bits, same unsigned mod), the
    * first `trainPct` buckets are train, the next `valPct` val, the rest
    * test. The property a training pipeline needs and `rand(seed)` does
    * NOT give: a doc's split is a pure function of its id — stable across
    * runs, engines, partitionings, and corpus growth (new docs never move
    * old ones between splits). Narrow map, no shuffle.
    */
  def withSplit(df: DataFrame, idCol: String, trainPct: Int = 90,
      valPct: Int = 5, outCol: String = "split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    val bucket = NativeExpressions.md5Bucket(col(idCol).cast("string"), 100)
    df.withColumn(outCol,
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Leakage-safe train/val/test split: near-duplicate documents must
    * never straddle splits, or val/test is contaminated by reworded
    * copies of training rows and eval scores inflate (the cross-SPLIT
    * face of the decontamination problem qd22/qd45 solve cross-CORPUS).
    * [[withSplit]] hashes each doc independently, so two near-dups land
    * in different splits with probability ≈ 2·p·(1−p) — this variant
    * hashes the doc's CLUSTER representative instead, so a whole
    * near-dup cluster moves as one unit and cluster→split purity holds
    * by construction.
    *
    * `clusters` is a `(doc_id, cluster_id)` frame — the output of
    * [[graft.functions.Dedup.nearDupComponents]] over any pair source
    * (MinHash-LSH, SimHash, semantic); it contains only docs that
    * appear in some pair, so singletons fall back to their own id via
    * the left join + coalesce. Split fractions still hold in
    * expectation: cluster representatives are themselves uniformly
    * hashed, and singletons (the overwhelming mass after dedup)
    * hash exactly as [[withSplit]] does.
    *
    * Scale shape: one equi-join on the id — and the clusters frame is
    * only as big as the docs that HAVE a near-dup (typically a few
    * percent of the corpus), so AQE broadcasts it in practice; the
    * split assignment itself stays the same narrow md5 map as
    * [[withSplit]]. Engine-portable (md5 bucket), so the whole
    * composition — clustering included — replays in SQL (qd47).
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
      trainPct: Int = 90, valPct: Int = 5, outCol: String = "split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    val c = clusters.select(col("doc_id").as("__cl_doc"),
      col("cluster_id").as("__cl_id"))
    val joined = df.join(c, df(idCol) === col("__cl_doc"), "left")
      .withColumn("group_key", coalesce(col("__cl_id"), df(idCol)))
      .drop("__cl_doc", "__cl_id")
    val bucket = NativeExpressions.md5Bucket(col("group_key").cast("string"), 100)
    joined.withColumn(outCol,
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Per-group weighted Bernoulli sampling with the same portable hash
    * as [[withSplit]] — the "sampling weights per source" step of
    * training-mix recipes (The Pile / LLaMA per-source epochs < 1),
    * reproducible by construction: a row survives iff
    * `md5_bucket(id, 10000) < weight(group) · 10000`. Groups absent
    * from `weights` keep everything (weight 1.0). Narrow map.
    */
  def weightedSample(df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0))
    val bucket = NativeExpressions.md5Bucket(col(idCol).cast("string"), 10000)
    val threshold = weights.foldLeft(lit(10000)) { case (acc, (g, w)) =>
      when(col(groupCol) === g, lit(math.round(w * 10000).toInt)).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** The per-source temperature plan — [[temperatureMix]]'s driver fold
    * over (source, token) masses, shared with [[temperatureMixDocs]]:
    * `base` is a (source, __nt, __b) projection; the result is the
    * S-row plan frame (source, n_docs, n_tokens, nat_frac, temp_weight,
    * target_tokens, threshold). Powers round to 6 dp and sum as exact
    * decimals so the weight denominator is ORDER-FREE — the repo-wide
    * convention (qe25's decimal distance sums) that keeps the SQL
    * oracle's unordered SUM bit-equal with this sorted driver fold. A
    * zero-token source weighs 0 at ANY α (pow(0,0)=1 would smuggle it
    * into a uniform mix) and keeps nothing.
    */
  private def temperaturePlan(base: DataFrame, alpha: Double,
      tokenBudget: Long): DataFrame = {
    val masses = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val totalTok = masses.map(_._3).sum.toDouble
    def pow6(c: Long): BigDecimal =
      if (c == 0L) BigDecimal(0)
      else BigDecimal(math.pow(c.toDouble, alpha)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val powSum = masses.map(m => pow6(m._3)).sum.toDouble
    val plan = masses.map { case (s, nd, c) =>
      val w = if (c == 0L) 0.0 else pow6(c).toDouble / powSum
      val rate = if (c == 0L) 0.0 else math.min(1.0, w * tokenBudget / c.toDouble)
      (s, nd, c, if (totalTok == 0.0) 0.0 else c / totalTok, w,
        math.round(w * tokenBudget), math.round(rate * 10000).toInt)
    }
    val spark = base.sparkSession
    import spark.implicits._
    plan.toSeq
      .toDF("source", "n_docs", "n_tokens", "nat_frac", "temp_weight",
        "target_tokens", "threshold")
      .withColumn("nat_frac", round(col("nat_frac"), 6))
      .withColumn("temp_weight", round(col("temp_weight"), 6))
  }

  /** Temperature-scaled source mixing (the Gopher/MassiveText recipe —
    * Rae et al. 2021; the same α-flattening PaLM and multilingual
    * pipelines apply to raw size-proportional weights): per-source raw
    * token masses c_s flatten to sampling weights w_s ∝ c_s^α — α=1 is
    * natural proportions, α=0 uniform, α∈(0,1) up-weights small
    * sources without the epoch blow-up of plain uniform. Targets are
    * t_s = w_s · tokenBudget; the per-source keep RATE min(1, t_s/c_s)
    * is applied as the deterministic md5 doc Bernoulli (the qd25
    * primitive, threshold in 1/10000ths) — reproducible, no RNG, and
    * re-derivable row by row from the published threshold. Returns the
    * per-source audit: natural share, tempered weight, target tokens,
    * the threshold, and the kept doc/token accounting under it.
    *
    * Scale shape: two narrow grouped aggs over a (source, n_tok,
    * bucket) projection — pass 1 for the masses, pass 2 for the kept
    * accounting (inherent: the keep rate depends on the GLOBAL
    * normalization) — with an S-row driver collect between them (the
    * model-artifact pattern: S = source count, never row count).
    */
  def temperatureMix(docs: DataFrame, sourceCol: String, idCol: String,
      textCol: String, alpha: Double, tokenBudget: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    // null text counts as zero tokens (a null-text source must not NPE
    // the driver collect below)
    val base = docs.select(col(sourceCol).as("source"),
      coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0))
        .cast("long").as("__nt"),
      NativeExpressions.md5Bucket(col(idCol).cast("string"), 10000).as("__b"))
    val planDf = temperaturePlan(base, alpha, tokenBudget)
    // threshold rides in as a broadcast JOIN, not a driver-built CASE
    // chain — a when-ladder's depth grows with the source count (the
    // round-11 compaction-predicate lesson applied here from the start)
    val kept = base
      .join(broadcast(planDf.select(col("source"), col("threshold"))), "source")
      .filter(col("__b") < col("threshold"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("__nt")).as("kept_tokens"))
    broadcast(planDf).join(kept, Seq("source"), "left")
      .withColumn("kept_docs", coalesce(col("kept_docs"), lit(0L)))
      .withColumn("kept_tokens", coalesce(col("kept_tokens"), lit(0L)))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("nat_frac"),
        col("temp_weight"), col("target_tokens"), col("threshold"),
        col("kept_docs"), col("kept_tokens"))
  }

  /** [[temperatureMix]]'s DOC-level form — the stage a composed pipeline
    * actually consumes (qd61): same α-tempered per-source plan, but
    * instead of the audit rollup it returns the KEPT ROWS of `docs`
    * (all original columns, plan columns dropped). The keep predicate
    * is the identical deterministic md5 Bernoulli; `bucketSalt`
    * prefixes the id before hashing so a pipeline that already consumed
    * the UNSALTED bucket upstream (the qd23 split's `md5(id) % 100` —
    * and `% 100` divides `% 10000`, so the two draws are correlated,
    * not independent) can decorrelate its mix draw with e.g.
    * `bucketSalt = "mix#"`. DuckDB replays the salted bucket as
    * `md5_number_lower('mix#' || CAST(id AS VARCHAR)) % 10000`.
    *
    * Scale shape: two passes over `docs` (the S-row mass rollup, then
    * the broadcast-threshold filter) — inherent, as the keep rate
    * depends on the global normalization; callers in a longer pipeline
    * should hand in a persisted frame.
    */
  def temperatureMixDocs(docs: DataFrame, sourceCol: String, idCol: String,
      textCol: String, alpha: Double, tokenBudget: Long,
      bucketSalt: String = ""): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val bucket = NativeExpressions.md5Bucket(
      concat(lit(bucketSalt), col(idCol).cast("string")), 10000)
    val base = docs.select(col(sourceCol).as("source"),
      coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0))
        .cast("long").as("__nt"),
      bucket.as("__b"))
    val planDf = temperaturePlan(base, alpha, tokenBudget)
    docs.withColumn("__b", bucket)
      .join(broadcast(planDf.select(col("source").as("__mix_src"),
        col("threshold"))), col(sourceCol) === col("__mix_src"))
      .filter(col("__b") < col("threshold"))
      .drop("__b", "__mix_src", "threshold")
  }

  /** DSIR data-selection weights (Xie et al. 2023, arXiv:2302.03169):
    * score every raw doc by how target-like it is, as the log importance
    * ratio under two hashed-bigram bag models —
    * `Σ_b count_b(doc) · (ln p_target(b) − ln p_raw(b))` with add-1
    * smoothing over `buckets` hash buckets. High scores = docs that look
    * like the curated target distribution; sampling ∝ exp(weight) is the
    * paper's selection step (the caller composes that with
    * [[weightedSample]] / top-k).
    *
    * Shape at 100 TB: both featurize passes are narrow explodes feeding
    * grouped counts on the uniform hash-bucket key (map-side partials);
    * the log-ratio table has exactly `buckets` rows and BROADCASTS into
    * the per-doc join; nothing all-pairs, nothing driver-side. Hash is
    * the portable md5 bucket, and per-bucket log ratios are rounded to
    * 6 dp and summed as DECIMAL, so the whole score replays bit-equal in
    * another engine ([[TextAnalysis.unigramLogProb]] has the determinism
    * rationale).
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, buckets: Int = 1024,
      portable: Boolean = true): DataFrame = {
    val (out0, docFeat, joined) =
      dsirWeightsPlan(docs, idCol, textCol, target, targetTextCol, buckets, portable)
    // eager (a batch analytics op): checkpoint the doc-sized result,
    // then free the two intermediates — repeated calls in one session
    // leave O(docs) residue, not the corpus-sized featurize frame
    val out = out0.localCheckpoint(true)
    docFeat.unpersist(false)
    joined.unpersist(false)
    out
  }

  /** The lazy plan behind [[dsirWeights]], exposed for plan-shape tests
    * (the public operator checkpoints its result, hiding the join
    * strategy from `explain`). Returns (result, docFeat, joined) — the
    * caller owns unpersisting the two intermediates.
    */
  private[graft] def dsirWeightsPlan(docs: DataFrame, idCol: String,
      textCol: String, target: DataFrame, targetTextCol: String,
      buckets: Int, portable: Boolean = true): (DataFrame, DataFrame, DataFrame) = {
    require(buckets > 0)
    // featurize hash is DUAL-PATH — but unlike the count-style dedup
    // operators (where outputs are hash-invariant), DSIR SCORES depend
    // on the bucketing, so the md5 path stays the DEFAULT (qd30's
    // oracle replays it via md5_number_lower); portable=false swaps in
    // the XXH64 kernel — an equally valid featurization per Xie et al.
    // 2023 (any fixed hash), rows-only checkable. Measured honestly:
    // ~14% end-to-end at sf0.1 (1.55 → 1.34 s — the explode + grouped
    // count dominate on 130-token docs); the hash-work share, and so
    // the gap, grows with document length
    def bigramBuckets(c: org.apache.spark.sql.Column) =
      if (portable) NativeExpressions.md5BucketBigrams(c, buckets)
      else NativeExpressions.xxBucketBigrams(c, buckets)
    // featurize the raw corpus ONCE: per-doc bucket counts, persisted
    // (MEMORY_AND_DISK — lineage kept, so executor loss recomputes
    // rather than failing) because three plan branches need them — the
    // raw distribution, the per-doc scoring join, and the doc list;
    // without materialization Spark recomputes the explode + md5 pass
    // per branch (measured 3× the featurize cost at sf0.1). Size is
    // ≤ docs × per-doc distinct buckets — the grouped form, far smaller
    // than the raw (doc, bigram) explode. The caller (dsirWeights)
    // unpersists it once the result is materialized.
    val docFeat = docs
      .select(col(idCol),
        explode(bigramBuckets(col(textCol))).as("__b"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rawCounts = docFeat.groupBy(col("__b"))
      .agg(sum(col("__cnt")).cast("long").as("__cr"))
    val tgtCounts = target
      .select(explode(
        bigramBuckets(col(targetTextCol))).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__ct"))
    // full outer so target-only buckets still count toward the target
    // total; absent sides take the add-1 floor. The joined frame has at
    // most `buckets` rows; it is cached (plain memory persist — it is
    // metadata-sized, and unpersisted below) because BOTH the global
    // totals and the per-bucket ratios read it (otherwise the second
    // consumer re-runs the target-corpus explode), and the totals come
    // from agg + broadcast crossJoin — the q01 denominator pattern —
    // rather than an unpartitioned window (which plans a
    // single-partition WindowExec and logs a perf warning).
    val joined = rawCounts.join(tgtCounts, Seq("__b"), "full")
      .withColumn("__crf", coalesce(col("__cr"), lit(0L)))
      .withColumn("__ctf", coalesce(col("__ct"), lit(0L)))
      .persist()
    val totals = joined.agg(
      sum(col("__crf")).cast("double").as("__tot_r"),
      sum(col("__ctf")).cast("double").as("__tot_t"))
    val lr = joined.crossJoin(broadcast(totals))
      .withColumn("__lr",
        round(log(col("__ctf").cast("double") + 1.0d) - log(col("__tot_t") + buckets)
          - log(col("__crf").cast("double") + 1.0d) + log(col("__tot_r") + buckets), 6)
          .cast(DecimalType(18, 6)))
      .select(col("__b"), col("__lr"))
    val perDoc = docFeat
      .join(broadcast(lr), "__b")
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).cast("long").as("n_feat"),
        sum(col("__cnt") * col("__lr")).as("__w"))
    // round the EXACT decimal sum to 4 dp, THEN cast to double: rounding
    // after the double cast diverges across engines when the sum lands
    // exactly on a half boundary (Spark rounds the shortest decimal
    // rendering, C-family engines round the binary value — measured: 2
    // rows at sf0.1)
    val out = docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .withColumn("n_feat", coalesce(col("n_feat"), lit(0L)))
      .withColumn("dsir_logratio",
        coalesce(round(col("__w"), 4).cast("double"), lit(0.0d)))
      .select(col(idCol), col("n_feat"), col("dsir_logratio"))
    (out, docFeat, joined)
  }

  /** Greedy sequence packing: walk each group in `orderCol` order and
    * pack consecutive rows into bins of at most `budget` tokens (a row
    * larger than the budget gets a bin of its own) — the
    * context-window packing step between chunking and batch assembly in
    * an LLM pre-training pipeline. Inherently a sequential scan per
    * group, which the naive form does with a per-group collect; this
    * form does ONE shuffle (`repartition(group)`) + an in-partition
    * sort, then a streaming `mapPartitions` pass with O(1) state that
    * resets at group boundaries — no group is ever materialized, so a
    * source with 10⁹ docs packs in one pass. Deterministic given the
    * total (group, order) order.
    *
    * Parallelism caveat (inherent to greedy packing, not this
    * implementation): one task scans each group sequentially, so
    * parallelism = number of groups. For intra-group parallelism,
    * pre-split the order key into segments and pack per (group,
    * segment) — the cost is at most one under-filled bin per segment
    * boundary, usually negligible against a 10⁹-doc group.
    */
  def packSequences(df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string"), col(orderCol).cast("long"),
        col(tokensCol).cast("long"))
      .as[(String, Long, Long)]
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(orderCol))
      .mapPartitions { rows =>
        var curGroup: String = null
        var used = 0L
        var bin = 0L
        rows.map { case (g, o, t) =>
          if (g != curGroup) { curGroup = g; bin = 0L; used = 0L }
          if (used > 0 && used + t > budget) { bin += 1; used = 0L }
          used += t
          (g, o, t, bin)
        }
      }
      .toDF(groupCol, orderCol, tokensCol, "bin_id")
  }

  // ------------------------------------------------------------ sharding

  /** Deterministic shard assignment — the export "last mile" of a
    * training-data pipeline (after cleaning/dedup/mix, the corpus is
    * globally shuffled and cut into fixed shards for the data loader).
    * A doc's shard is `md5_bucket(id, nShards)`: uniform in expectation,
    * a pure function of the id (never of partitioning, run, or engine —
    * the [[withSplit]] kernel), and skew-proof (hash buckets cannot
    * skew). Together with the within-shard [[shardOrderKey]] hash order
    * this IS a global uniform shuffle: shard membership is a uniform
    * random subset and the within-shard order is the restriction of a
    * uniform random permutation to it. Narrow map — no shuffle until a
    * consumer groups or writes by the shard column.
    */
  def assignShards(df: DataFrame, idCol: String, nShards: Int,
      outCol: String = "shard_id"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn(outCol,
      NativeExpressions.md5Bucket(col(idCol).cast("string"), nShards))
  }

  /** The within-shard (and global) shuffle order key: md5 hex of the id.
    * Engine-portable (DuckDB `md5(CAST(id AS VARCHAR))` orders
    * identically — lowercase hex compares bytewise in both engines).
    */
  def shardOrderKey(idCol: Column): Column = md5(idCol.cast("string"))

  /** Per-shard export manifest: doc/token volume plus the first/last
    * shuffle-order hash per shard — the release-artifact summary a
    * loader uses to size epochs and verify shard integrity. One
    * grouped partial+final agg on the uniform shard key.
    */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame =
    assignShards(df, idCol, nShards)
      .withColumn("__h", shardOrderKey(col(idCol)))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
        min(col("__h")).as("first_doc_hash"),
        max(col("__h")).as("last_doc_hash"))
      .orderBy(col("shard_id"))

  /** Write the corpus as `shard_id=N/` parquet directories in the
    * deterministic shuffle order: ONE shuffle (`repartition` on the
    * uniform shard key) + an in-partition sort on (shard, order-hash),
    * then a partitioned write — each task streams its shards out in
    * order, so file contents are byte-deterministic given the input.
    * `maxRecordsPerFile` bounds individual file sizes for loader
    * friendliness (0 = Spark default). At 100 TB: nShards sized so a
    * shard is a few GB; the sort is per-task external sort, the write
    * never collects, and re-running the export reproduces the same
    * shard membership and order exactly.
    */
  def writeShards(df: DataFrame, path: String, idCol: String, nShards: Int,
      maxRecordsPerFile: Long = 0L): Unit = {
    val sharded = assignShards(df, idCol, nShards)
      .withColumn("__order_hash", shardOrderKey(col(idCol)))
      .repartition(nShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("__order_hash"))
      .drop("__order_hash")
    val w = sharded.write.mode("overwrite")
    (if (maxRecordsPerFile > 0L)
      w.option("maxRecordsPerFile", maxRecordsPerFile)
    else w).partitionBy("shard_id").parquet(path)
  }

  /** Per-source token-length winsorization — the tail-clipping gate of
    * length-balanced curation (a handful of mega-documents otherwise
    * dominate a source's token budget and its packed sequences): compute
    * each source's exact p-quantile of the token count (interpolated —
    * the `quantile_cont` semantics q30 pins cross-engine), cap counts at
    * its floor, and flag the clipped docs. Downstream consumers truncate
    * flagged docs to `cut_tokens` (chunking machinery exists:
    * [[graft.functions.TextAnalysis.chunkDocs]]) or route them for
    * review.
    *
    * Scale shape: one narrow token-count projection, one grouped exact
    * percentile (per-group state is the value multiset — at true 100 TB
    * group cardinalities swap in `approx_percentile`, same plan shape,
    * as q30→qa02), S-row cut table broadcast back. Deterministic: the
    * cut is rounded to 4 dp before flooring so the flag can't flip on a
    * ulp.
    */
  def winsorizeTokenCounts(df: DataFrame, sourceCol: String, idCol: String,
      textCol: String, p: Double = 0.99): DataFrame = {
    require(p > 0.0 && p < 1.0, s"winsorizeTokenCounts: p must be in (0, 1), got $p")
    val base = df.select(col(sourceCol).as("source"), col(idCol).as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val cuts = base.groupBy(col("source"))
      .agg(round(percentile(col("n_tokens"), lit(p)), 4).as("p_cut"))
      .withColumn("cut_tokens", floor(col("p_cut")).cast("long"))
    base.join(broadcast(cuts), "source")
      .withColumn("is_clipped", col("n_tokens") > col("cut_tokens"))
      .withColumn("clipped_n", least(col("n_tokens"), col("cut_tokens")))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("p_cut"),
        col("cut_tokens"), col("clipped_n"), col("is_clipped"))
  }

  /** Concat-then-chunk sequence packing — the OTHER standard pretraining
    * packing next to [[packSequences]]'s greedy no-split binning: lay
    * every document's tokens on one global stream in a deterministic
    * order (the caller's unique `orderCol`, e.g. the doc id) and cut the
    * stream into fixed `contextLen` windows, SPLITTING documents at
    * window boundaries (the GPT-2/LLaMA recipe — zero padding waste, at
    * the cost of boundary-crossing documents). Emits one row per
    * (sequence, document-slice): which token span of the doc
    * (`from_tok`, `take`) lands at which position of which sequence
    * (`seq_id`, `pos_in_seq`). Every token is placed exactly once;
    * every sequence is exactly full except the last (spec-pinned).
    * Zero-token docs contribute nothing and are dropped.
    *
    * Scale shape: the global token offset comes from
    * [[graft.ops.RankOps.globalPrefixSum]] — the two-phase
    * range-partitioned prefix sum, NO single-partition window — and the
    * explode fans each doc out to only the ⌈n/C⌉+1 sequences it touches:
    * row growth IS the output. Pure integer arithmetic after the offset,
    * so the layout replays in SQL (qd57's oracle).
    */
  def packStream(df: DataFrame, idCol: String, tokenCountCol: Column,
      contextLen: Int, orderBy: Seq[Column] = Nil): DataFrame = {
    require(contextLen >= 1, s"packStream: contextLen must be >= 1, got $contextLen")
    val c = lit(contextLen.toLong)
    // the stream order defaults to doc id; `orderBy` prepends explicit
    // keys (curriculum bucket, shuffle hash, …) with the id as the final
    // tie-break, so the composite stays the TOTAL order globalPrefixSum
    // requires
    val sel = df.select(
      Seq(col(idCol).as("doc_id"), tokenCountCol.cast("long").as("n_tok")) ++
        orderBy.zipWithIndex.map { case (o, i) => o.as(s"__o$i") }: _*)
      .filter(col("n_tok") > 0L)
    val sortCol =
      if (orderBy.isEmpty) col("doc_id")
      else struct(orderBy.indices.map(i => col(s"__o$i")) :+ col("doc_id"): _*)
    val cum = graft.ops.RankOps.globalPrefixSum(
      sel, sortCol, col("n_tok"), out = "__cum")
    cum
      .withColumn("__off", col("__cum") - col("n_tok"))
      .withColumn("__first", floor(col("__off").cast("double") / c).cast("long"))
      .withColumn("__last", floor((col("__cum") - 1L).cast("double") / c).cast("long"))
      .withColumn("seq_id", explode(sequence(col("__first"), col("__last"))))
      .withColumn("__begin", greatest(col("__off"), col("seq_id") * c))
      .withColumn("__end", least(col("__cum"), (col("seq_id") + 1L) * c))
      .select(col("seq_id"), col("doc_id"),
        (col("__begin") - col("__off")).as("from_tok"),
        (col("__end") - col("__begin")).as("take"),
        (col("__begin") - col("seq_id") * c).as("pos_in_seq"),
        col("n_tok"))
  }

  /** Curriculum-ordered stream packing — qd42's difficulty bucketing
    * composed with [[packStream]] into the artifact curriculum-learning
    * schedules actually consume (Bengio et al. 2009: present easy
    * examples first): docs are scored by the corpus unigram LM
    * (qd29's `avg_logprob` — high = common-word prose = "easy"),
    * binned into `nBuckets` GLOBAL difficulty quantiles, and packed
    * into fixed `contextLen` sequences in (bucket, md5(id), id) order —
    * easiest bucket first, deterministic md5 shuffle WITHIN a bucket
    * (training still needs intra-stage mixing), id tie-break. The
    * output is qd57's layout plus each row's `bucket`: sequence ids
    * ascend through the curriculum, so a trainer consuming seq_id
    * order gets the schedule for free.
    *
    * Bucket boundaries are exact interpolated quantiles of the 4-dp
    * score (q30's `quantile_cont` parity, 4-dp rounded — the winsorize
    * convention), applied as broadcast threshold comparisons:
    * `bucket = 1 + Σ_k [score ≥ t_k]` — a NARROW map, not a global
    * ntile window (the single-partition trap at corpus scale; at true
    * 100 TB swap `approx_percentile` for the exact quantile, same
    * plan shape). Ties on a boundary all land in the upper bucket —
    * deterministic on both engines.
    *
    * Scan shape: the LM pass (qd29's vocab join), one quantile agg
    * over the S-row score frame, a broadcast-threshold bucket map,
    * then [[packStream]]'s two-phase prefix sum over the composite
    * order. The bucket column rides through the pack, so no join back.
    */
  def curriculumPackStream(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 4, contextLen: Int = 128): DataFrame = {
    require(nBuckets >= 2, s"need nBuckets >= 2, got $nBuckets")
    val lp = TextAnalysis.unigramLogProb(docs, idCol, textCol)
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val thRow = lp.agg(
      percentile(col("avg_logprob"), typedLit(qs)).as("t")).head()
    val ts = thRow.getSeq[Double](0).map(t =>
      BigDecimal(t).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val bucket = ts.foldLeft(lit(1)) { (acc, t) =>
      acc + when(col("avg_logprob") >= t, 1).otherwise(0)
    }
    // checkpointed: the scored frame feeds BOTH the pack and the bucket
    // join-back — without it the whole LM pass re-runs per consumer.
    // Same weight class as globalPrefixSum's internal checkpoint (a
    // 3-column id frame, not document text).
    val scored = lp.select(col(idCol).as("doc_id"), col("n_tok"),
        bucket.as("bucket"))
      .localCheckpoint(true)
    packStream(scored, "doc_id", col("n_tok"), contextLen,
        orderBy = Seq(col("bucket"), md5(col("doc_id").cast("string"))))
      .join(scored.select(col("doc_id"), col("bucket")), "doc_id")
      .select(col("seq_id"), col("doc_id"), col("from_tok"), col("take"),
        col("pos_in_seq"), col("bucket"))
  }

  // -------------------------------------------------- corpus versioning

  /** Snapshot diff between two corpus versions — the dataset-versioning
    * ledger entry every corpus release publishes (what changed between
    * v1 and v2, per document): full outer join on the id, statuses
    * `added` (id only in `newDf`), `removed` (id only in `oldDf`),
    * `changed` (both, different normalized content fingerprint),
    * `unchanged`. Fingerprints are [[TextAnalysis.fingerprint]] (md5 of
    * the canonical text form), so cosmetic whitespace/case/NFC variants
    * do not register as changes and the whole diff is engine-portable.
    *
    * Scale shape: two narrow fingerprint projections + ONE equi-join on
    * the id (uniform key). No corpus text moves — only (id, 32-byte
    * hash) pairs — so diffing two 100 TB snapshots shuffles ~hash-table
    * volume. Downstream training jobs typically consume just the
    * `added`/`changed` rows (incremental re-processing), which is why
    * the statuses ride on every id instead of a summary-only output;
    * [[corpusDiffSummary]] is the rollup form.
    */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // null text folds to the empty-text fingerprint: a null fp would
    // make the presence checks lie (a PRESENT null-text row would
    // classify as added/removed)
    def fps(df: DataFrame, side: String) = df.select(
      col(idCol).as("doc_id"),
      TextAnalysis.fingerprint(coalesce(col(textCol), lit(""))).as(s"fp_$side"))
    fps(oldDf, "old").join(fps(newDf, "new"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("fp_old"), col("fp_new"))
  }

  /** Per-status rollup of [[corpusDiff]] — the release-notes number
    * (n added / removed / changed / unchanged). One grouped count over
    * the diff's 4-value status key.
    */
  def corpusDiffSummary(diff: DataFrame): DataFrame =
    diff.groupBy(col("status")).agg(count(lit(1)).cast("long").as("n_docs"))

  /** Water-filling token-budget allocator — the redistribution step
    * [[temperatureMix]] deliberately omits: its per-source target
    * `w_s · B` simply truncates at availability (`rate ≤ 1`), so the
    * budget share of every capped source is LOST and Σ kept < B. This
    * op solves the allocation that actually exhausts the budget:
    *
    *   take_s = min(a_s, λ·w_s)   with λ chosen so Σ take_s = B
    *
    * (a_s = per-source available tokens, w_s ∝ a_s^α the tempered
    * weight) — classic water-filling: sort sources by a_s/w_s
    * ascending; a source caps iff its ratio is below the water level
    * λ, and removing a capped source RAISES the level for the rest
    * (proof in the spec fixtures), so the capped set is a prefix and
    * one pass of prefix sums finds it: a source caps iff
    * `r_k < (B − A_{k−1}) / (W − W_{k−1})` (exclusive prefix sums over
    * the sorted order — once false it stays false, because a rejected
    * cap can only LOWER the as-if level while ratios keep rising).
    *
    * Determinism discipline (everything engine-portable, so the whole
    * solve replays in SQL): weights are round-6 `a^α` held in exact
    * micro-units (the qd50 DECIMAL(18,6) convention), prefix sums are
    * exact integer/DECIMAL, and every double is derived from exact
    * values by IEEE ops both engines share (casts, divides, floor) —
    * no float accumulation anywhere. The S-row masses collect is the
    * plan (the [[temperatureMix]] precedent); S = source count.
    * Zero-token sources are excluded (nothing to allocate). `take` of
    * uncapped sources floors λ·w_s, so Σ take ∈ (B − S, B].
    *
    * NOTE the qd71 oracle fixes α = 0.5 (replayed as `sqrt` — exempt
    * from pow's last-ulp looseness); other α values are JVM-exact but
    * their oracle would lean on `pow(x, α)` agreeing to 6 dp, which
    * qd50 has validated on this corpus for driver-side Math.pow only.
    */
  def waterFillMix(docs: DataFrame, sourceCol: String, textCol: String,
      alpha: Double, tokenBudget: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val masses = docs.select(col(sourceCol).as("source"),
        coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0))
          .cast("long").as("__nt"))
      .groupBy("source").agg(sum(col("__nt")).as("a"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter(_._2 > 0L)
    val spark = docs.sparkSession
    import spark.implicits._
    waterFillSolve(masses.toSeq, alpha, tokenBudget)
      .map { case (s, a, wu, capped, take) => (s, a, wu / 1e6, capped, take) }
      .toDF("source", "n_tokens", "weight", "capped", "take_tokens")
      .orderBy(col("source"))
  }

  /** Data-constrained EPOCH allocation — the repetition-aware mixing
    * recipe (Muennighoff et al. 2023, "Scaling Data-Constrained
    * Language Models": when unique data is the binding constraint,
    * repeat good sources for a few epochs at diminishing value rather
    * than widen into junk; LLaMA's per-source epoch table is this
    * decision made by hand). Each source s offers up to `maxEpochs`
    * epochs of its `tokensCol` supply u_s; epoch k carries marginal
    * value weight_s · decay^(k−1). The allocation is the greedy over
    * the (source, epoch) grid in (marginal DESC, source, epoch) order
    * — optimal for a concave per-source value (decay < 1 makes epoch
    * values non-increasing), and the final grid cell takes the
    * fractional remainder.
    *
    * Exactness: decay^(k−1) is an exact BigDecimal power rendered as a
    * plan literal; marginal = weight·decay^(k−1) is exact decimal (so
    * the ORDER BY never compares rounded doubles); the cumulative
    * supply is an integer window; take = clamp(B − cumBefore, 0, u_s)
    * integer; epochs@4dp by integer half-up division; effective value
    * = round(Σ marginal·take, 4) — a DECIMAL rounding, never a double
    * midpoint. Scale shape: the grid is |sources|·maxEpochs rows
    * (metadata); ONE global window over it (bounded by design — the
    * [[waterFillMix]] class of driver-sized solves, kept relational so
    * the oracle replays it without unrolling).
    *
    * Output per source: (source, unique_tokens, weight, tokens_taken,
    * epochs, effective_value).
    */
  def epochAllocate(sources: DataFrame, sourceCol: String, tokensCol: String,
      weightCol: String, tokenBudget: Long, maxEpochs: Int = 4,
      decay: java.math.BigDecimal = new java.math.BigDecimal("0.5")): DataFrame = {
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    require(tokenBudget >= 0, s"tokenBudget must be non-negative, got $tokenBudget")
    require(decay.signum > 0 && decay.compareTo(java.math.BigDecimal.ONE) <= 0,
      s"decay must be in (0,1], got $decay")
    val grid = sources.select(col(sourceCol).as("source"),
        col(tokensCol).cast("long").as("__u"),
        col(weightCol).as("__w"))
      .filter(col("__u") > 0L)
      .withColumn("__e", explode(array((1 to maxEpochs).map { k =>
        struct(lit(k).as("k"), lit(decay.pow(k - 1)).as("dk"))
      }: _*)))
      .select(col("source"), col("__u"), col("__w"),
        col("__e.k").as("__k"), (col("__w") * col("__e.dk")).as("__m"))
    val w = Window.orderBy(col("__m").desc, col("source"), col("__k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    grid
      .withColumn("__before", coalesce(sum(col("__u")).over(w), lit(0L)))
      .withColumn("__take",
        greatest(least(col("__u"), lit(tokenBudget) - col("__before")), lit(0L)))
      .groupBy(col("source"))
      .agg(first(col("__u")).as("unique_tokens"),
        first(col("__w")).as("weight"),
        sum(col("__take")).cast("long").as("tokens_taken"),
        round(sum(col("__m") * col("__take")), 4).cast("double")
          .as("effective_value"))
      .withColumn("epochs",
        expr("(2 * tokens_taken * 10000 + unique_tokens) div (2 * unique_tokens)")
          .cast("double") / 10000.0)
      .select(col("source"), col("unique_tokens"), col("weight"),
        col("tokens_taken"), col("epochs"), col("effective_value"))
  }

  /** The water-level solve behind [[waterFillMix]], over collected
    * (source, token-mass) rows with mass > 0 — returns
    * (source, a, weightMicroUnits, capped, take). Exactness discipline
    * documented on [[waterFillMix]]; shared by
    * [[temperatureMixWaterFill]] so the temperature path's
    * redistribution is THE SAME solve qd71 oracle-proves.
    */
  private[graft] def waterFillSolve(masses: Seq[(String, Long)], alpha: Double,
      tokenBudget: Long): Seq[(String, Long, Long, Boolean, Long)] = {
    // round-6 a^alpha in exact micro-units
    def wUnits(a: Long): Long =
      (BigDecimal(math.pow(a.toDouble, alpha))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000L).toLongExact
    val sorted = masses
      .map { case (s, a) =>
        val wu = wUnits(a); (s, a, wu, a.toDouble / (wu / 1e6))
      }
      .sortBy { case (s, _, _, r) => (r, s) }
    val totW = sorted.map(_._3).sum
    // capped flag via UNCONDITIONAL exclusive prefix sums (the exact
    // SQL-window formulation; prefix-closure makes it equivalent to
    // the greedy)
    var aPre = 0L; var wPre = 0L
    val flagged = sorted.map { case (s, a, wu, r) =>
      val den = totW - wPre
      val capped = den <= 0L || r < (tokenBudget - aPre).toDouble / (den / 1e6)
      aPre += a; wPre += wu
      (s, a, wu, capped)
    }
    val aC = flagged.collect { case (_, a, _, true) => a }.sum
    val wC = flagged.collect { case (_, _, w, true) => w }.sum
    val denStar = totW - wC
    val lamStar =
      if (denStar <= 0L) 0.0 else (tokenBudget - aC).toDouble / (denStar / 1e6)
    flagged.map { case (s, a, wu, capped) =>
      val take = if (capped) a else math.floor(lamStar * (wu / 1e6)).toLong
      (s, a, wu, capped, take)
    }
  }

  /** [[temperatureMix]] with the lost capped-budget share REDISTRIBUTED
    * (round-17 verdict #3): the plain temperature recipe computes
    * per-source targets t_s = w_s·B and caps the keep rate at 1, so
    * when a small source's target exceeds its natural mass the excess
    * share simply VANISHES — Σ kept target < B whenever any cap binds.
    * This variant allocates the SAME tempered weights (w_s ∝ round-6
    * a_s^α micro-units) through [[waterFillSolve]] instead:
    * take_s = min(a_s, λ·w_s) with the water level λ solved so the
    * freed share flows to the uncapped sources — Σ take ∈ (B−S, B]
    * always (exact B up to the per-source floor(), CurationSpec pins
    * both the sum window and lost-vs-recovered against
    * [[temperatureMix]] under binding caps). The keep predicate stays
    * the deterministic unsalted md5 doc-Bernoulli at threshold
    * round(min(1, take_s/a_s)·10⁴) — qd50's convention, so the two
    * recipes differ ONLY in the allocation row.
    *
    * Zero-token sources are excluded (nothing to allocate — qd71's
    * convention). Like qd71, the α = 0.5 configuration replays in SQL
    * as `sqrt`, exempt from cross-engine pow looseness (qd75).
    */
  def temperatureMixWaterFill(docs: DataFrame, sourceCol: String,
      idCol: String, textCol: String, alpha: Double,
      tokenBudget: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(tokenBudget > 0, s"tokenBudget must be positive, got $tokenBudget")
    val base = docs.select(col(sourceCol).as("source"),
      coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0))
        .cast("long").as("__nt"),
      NativeExpressions.md5Bucket(col(idCol).cast("string"), 10000).as("__b"))
    val masses = base.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("a"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter(_._3 > 0L)
    val nDocs = masses.map(m => m._1 -> m._2).toMap
    val alloc = waterFillSolve(masses.map(m => (m._1, m._3)).toSeq,
      alpha, tokenBudget)
    val spark = docs.sparkSession
    import spark.implicits._
    val planDf = alloc
      .map { case (s, a, wu, capped, take) =>
        val threshold =
          math.round(math.min(1.0, take.toDouble / a) * 10000).toInt
        (s, nDocs(s), a, wu / 1e6, capped, take, threshold)
      }
      .toDF("source", "n_docs", "n_tokens", "weight", "capped",
        "take_tokens", "threshold")
    val kept = base
      .join(broadcast(planDf.select(col("source"), col("threshold"))), "source")
      .filter(col("__b") < col("threshold"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("__nt")).as("kept_tokens"))
    broadcast(planDf).join(kept, Seq("source"), "left")
      .withColumn("kept_docs", coalesce(col("kept_docs"), lit(0L)))
      .withColumn("kept_tokens", coalesce(col("kept_tokens"), lit(0L)))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        col("capped"), col("take_tokens"), col("threshold"),
        col("kept_docs"), col("kept_tokens"))
      .orderBy(col("source"))
  }
}
