package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash-groupBy), MinHash+LSH (shingle → minhash → band →
  * bucket-join), SimHash, and n-gram Jaccard verification.
  *
  * Algorithms per the published literature: MinHash resemblance (Broder,
  * "On the resemblance and containment of documents", 1997), LSH banding
  * (Indyk & Motwani 1998; Leskovec/Rajaraman/Ullman, "Mining of Massive
  * Datasets" ch. 3), SimHash (Charikar, STOC 2002; Manku et al., WWW 2007
  * for web-scale near-dup detection).
  *
  * Scale design: signatures are computed per-row with higher-order array
  * functions (narrow, no explode ⇒ no row blow-up before the shuffle); the
  * only shuffles are the final groupBy/join on hash keys, which partition
  * evenly because the keys are uniform hashes. Candidate generation joins
  * on (band, bandHash) buckets — at 100 TB the bucket join replaces the
  * O(n²) all-pairs compare with an equi-join Catalyst executes as a
  * shuffled hash join over well-distributed keys.
  */
object Dedup {

  // ------------------------------------------------------------ exact

  /** Exact dedup via content hash: one row per distinct normalized text,
    * keeping the smallest id (deterministic, unlike `dropDuplicates`).
    * Single shuffle on the hash key.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = TextAnalysis.fingerprint(col(textCol)).as("content_hash")
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol))
    df.withColumn("content_hash", h)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Incremental exact dedup: dedupe a NEW batch against itself and
    * against an already-ingested corpus — the production shape at 100 TB
    * (re-deduping the whole corpus per batch is quadratic in corpus
    * size; this touches the corpus only through its fingerprint column,
    * which prunes to a single-column scan). Within-batch: keep the
    * smallest id per fingerprint; cross-corpus: left-anti join on the
    * fingerprint. Both shuffles key on the uniform hash.
    */
  def incrementalDedup(newBatch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val fresh = exactDedup(newBatch, idCol, textCol)
    val seen = corpus.select(TextAnalysis.fingerprint(col(textCol)).as("content_hash"))
      .distinct()
    fresh.join(seen, Seq("content_hash"), "left_anti")
  }

  /** Exact-dup group summary: hash → keeper id + copy count. Uses the same
    * normalized fingerprint as [[exactDedup]] (lowercase, whitespace-
    * collapsed), so the group summary agrees with the dedup decision for
    * copies differing only in case/whitespace.
    */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------------ shingles

  /** Word n-gram shingles (distinct), computed per row via
    * sequence+transform — no explode. Empty array when the doc is shorter
    * than n (guard needed: Spark `sequence(0, -1)` counts DOWN).
    */
  def wordShingles(text: Column, n: Int): Column = {
    val w = TextAnalysis.tokens(text)
    val grams = transform(
      sequence(lit(0), size(w) - n),
      i => concat_ws(" ", slice(w, i + 1, lit(n))))
    array_distinct(when(size(w) >= n, grams).otherwise(array()))
  }

  /** Cross-document duplicated-passage profile — the exact-substring
    * dedup family (Lee et al. 2021, "Deduplicating Training Data Makes
    * Language Models Better", use suffix arrays to drop verbatim spans
    * repeated across documents; the relational form of the detection
    * step is: an n-token span is duplicated iff it occurs in ≥ 2 distinct
    * docs). Per doc: its distinct span count, how many of those spans
    * also appear elsewhere, and the duplicated fraction — the signal a
    * pipeline thresholds to drop boilerplate-heavy docs or route them to
    * span-level scrubbing.
    *
    * PRECONDITION: `idCol` must be unique per input row (it is the doc
    * key the profile is keyed by — duplicate ids would double-count
    * their spans in every aggregate below AND yield duplicate output
    * rows through the final joins). All dedup operators in this file
    * share this contract; run [[exactDedup]] first if unsure.
    *
    * Span keys are DUAL-PATH (the qd09/qd11 minhash precedent):
    * `portable = false` (production) keys spans by the native
    * 64-bit shingle hash ([[NativeExpressions.shingleHashes]]) — the
    * biggest shuffle in the profile ships 8-byte longs instead of
    * ~n-word text keys, and no span string is ever materialized. A
    * 64-bit collision (two different spans, same key, P ≈ m²/2⁶⁵ for
    * m distinct spans — negligible below ~10⁹ spans) can only merge
    * two span groups, slightly OVER-counting duplication; the
    * `portable = true` path keys by the raw span string — exact at any
    * scale and the form the SQL oracle replays (DedupSpec asserts the
    * two paths agree end-to-end).
    *
    * Scale shape: ONE narrow explode to (doc, span) — persisted
    * (MEMORY_AND_DISK: lineage kept, so executor loss recomputes
    * instead of failing the job), because three aggregations (shared
    * spans, per-doc dup counts, per-doc totals) consume it; an
    * un-materialized lineage would re-run the full-corpus token explode
    * per consumer. The exploded frame is already the grouped (doc,
    * span) form (both span kernels distinct per doc), so each
    * downstream agg is a plain grouped count on a uniform key
    * (map-side partials), then equi-joins back — the same shuffle
    * profile as any grouped count at 100 TB; nothing is all-pairs and
    * no side must fit in memory.
    *
    * The operator executes EAGERLY (a batch analytics op, not valid on
    * streaming inputs): the doc-sized result is locally checkpointed
    * and the corpus-explode-sized span frame is unpersisted before
    * returning, so repeated calls in one session leave only
    * O(docs)-sized residue, not O(corpus × spans).
    */
  def dupPassageProfile(df: DataFrame, idCol: String, textCol: String,
      n: Int, portable: Boolean = false): DataFrame = {
    val spanCol =
      if (portable) explode(wordShingles(col(textCol), n))
      else explode(NativeExpressions.shingleHashes(col(textCol), n))
    val spans = df.select(col(idCol), spanCol.as("__g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // (doc, span) pairs are distinct by construction (both span kernels
    // distinct per doc) and ids are unique per the contract above — so
    // count(1) ≡ countDistinct(doc) per span below.
    val shared = spans.groupBy(col("__g"))
      .agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= 2)
      .select(col("__g"))
    val dup = spans.join(shared, "__g")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_dup_spans"))
    val total = spans.groupBy(col(idCol)).agg(count(lit(1)).as("n_spans"))
    val out = df.select(col(idCol))
      .join(total, Seq(idCol), "left")
      .join(dup, Seq(idCol), "left")
      .withColumn("n_spans", coalesce(col("n_spans"), lit(0L)))
      .withColumn("n_dup_spans", coalesce(col("n_dup_spans"), lit(0L)))
      .withColumn("dup_frac", round(col("n_dup_spans").cast("double") /
        greatest(col("n_spans"), lit(1L)).cast("double"), 4))
      .localCheckpoint(true)
    spans.unpersist(false)
    out
  }

  /** Cross-document duplicated-span SCRUB — the REMOVAL step of the
    * exact-substring dedup family (Lee et al. 2021 drop verbatim spans
    * repeated across documents; [[dupPassageProfile]] is the matching
    * detection/profiling step): every token covered by at least one
    * n-token span occurring in ≥ 2 distinct docs is dropped, and the
    * survivors are re-joined into `clean_text` (whitespace-normalized —
    * single spaces, like [[TextAnalysis.fingerprint]]'s token view).
    * Returns (id, clean_text, n_tokens, n_removed_tokens).
    *
    * PRECONDITION: `idCol` unique per row (file contract — see
    * [[dupPassageProfile]]).
    *
    * Span keys are DUAL-PATH like [[dupPassageProfile]]:
    * `portable = false` keys spans by the POSITIONAL native shingle
    * hash ([[NativeExpressions.PositionalShingleHashesExpr]] — same
    * XXH64 chain as the profile's keys, unsorted because position
    * matters here); `portable = true` uses the raw span strings the
    * SQL oracle replays. DedupSpec asserts the paths agree.
    *
    * Scale shape: one narrow positional-span explode (the SAME row
    * growth as the profile's) — persisted, because both the dup-span
    * count and the coverage join consume it (dupPassageProfile's
    * pattern; without it the full-corpus explode runs twice) — a
    * distinct + grouped count on the uniform span key, one join back
    * on the span key, one per-doc `collect_set` of covered start
    * positions (bounded by the doc's own token count — never cross-doc
    * state), then a NARROW map does the actual scrub with array
    * functions (coverage expansion + hash-set index subtraction +
    * indexed gather, linear in doc length) — re-assembly never
    * shuffles token rows. Eager like the profile: the doc-sized
    * result is checkpointed, the span frame unpersisted on return.
    */
  def scrubDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, portable: Boolean = false): DataFrame = {
    require(n > 0)
    val spansPos = df.select(col(idCol),
        posexplode(positionalSpans(col(textCol), n, portable)).as(Seq("pos", "__g")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // a span repeating WITHIN one doc must count once per doc — distinct
    // (id, span) before the cross-doc count (cf. dupPassageProfile,
    // where the span kernel is already per-doc distinct)
    val dupSpans = spansPos.select(col(idCol), col("__g")).distinct()
      .groupBy(col("__g")).agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= 2)
      .select(col("__g"))
    val coveredStarts = spansPos.join(dupSpans, "__g")
      .groupBy(col(idCol))
      .agg(collect_set(col("pos")).as("__starts"))
    val out = df.join(coveredStarts, Seq(idCol), "left")
      .withColumn("__starts",
        coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__covered", array_distinct(flatten(
        transform(col("__starts"), s => sequence(s, s + n - 1)))))
      .withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      // LINEAR re-assembly: survivors = (all indices) ∖ (covered indices),
      // then an indexed gather. array_except evaluates through a hash set
      // for primitive element types and preserves left-side order, so this
      // is O(m + c) per doc — the earlier per-token
      // `array_contains(__covered, i)` filter re-scanned the covered array
      // for every token, O(m·c), quadratic on the 100k-token tail.
      .withColumn("__keep",
        when(size(col("__toks")) > 0,
          array_except(
            sequence(lit(0), size(col("__toks")) - 1), col("__covered")))
          .otherwise(array().cast("array<int>")))
      .withColumn("clean_text", concat_ws(" ",
        transform(col("__keep"), i => element_at(col("__toks"), i + 1))))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      // every covered position is a valid token index (starts ≤ m − n)
      .withColumn("n_removed_tokens", size(col("__covered")).cast("long"))
      .select(col(idCol), col("clean_text"), col("n_tokens"),
        col("n_removed_tokens"))
      .localCheckpoint(true)
    spansPos.unpersist(false)
    out
  }

  /** Positional n-gram span keys: hashed (production) or raw strings
    * (oracle-portable) — the shared kernel choice of
    * [[scrubDuplicatedSpans]] and [[intraDocDupNgramFraction]].
    */
  private def positionalSpans(text: Column, n: Int, portable: Boolean): Column =
    if (portable) {
      val w = TextAnalysis.tokens(text)
      val grams = transform(
        sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n))))
      when(size(w) >= n, grams).otherwise(array())
    } else
      NativeExpressions.positionalShingleHashes(text, n)

  /** Intra-document duplicate n-gram fraction — the Gopher repetition
    * filter family (Rae et al. 2021, app. A1.1 threshold docs by their
    * duplicate n-gram fractions; [[TextAnalysis.topTokenFraction]] is
    * the companion top-token signal): the fraction of a doc's tokens
    * covered by an n-gram that occurs ≥ 2 times WITHIN the doc.
    * Returns (id, n_tokens, n_dup_covered, dup_ngram_frac).
    *
    * Scale shape (round 19): the production path is ONE zero-shuffle
    * projection — [[NativeExpressions.DupNgramStatsExpr]] counts span
    * multiplicities and coverage per row in O(m log m) over the doc's
    * OWN spans (a JVM sort, not the O(m²) a SQL HOF would pay), so no
    * span ever crosses an exchange. The `portable = true` path keeps
    * the relational form (positional-span explode → grouped count on
    * the UNIFORM (id, span) key → join back → per-doc `collect_set`):
    * it keys by raw span STRINGS, which is what the SQL oracle
    * replays. Span keys: positional xxhash64 (production kernel) or
    * raw strings (`portable = true`, the oracle form).
    */
  def intraDocDupNgramFraction(df: DataFrame, idCol: String, textCol: String,
      n: Int, portable: Boolean = false): DataFrame = {
    require(n > 0)
    // Production path (round 19): duplicate coverage is a doc-local
    // property — the DupNgramStats kernel computes it in one per-row
    // pass over the SAME positional XXH64 span chain, so the output is
    // bit-identical to the relational form below (even under a 64-bit
    // collision, which merges the same two span groups in both) while
    // running ZERO exchanges instead of a positional-span explode
    // shuffle + grouped count + join-back + per-doc collect_set. The
    // portable (raw-string-keyed) path keeps the relational form: it
    // exists for the SQL oracle, which replays the string spans.
    if (!portable) {
      val stats = NativeExpressions.dupNgramStats(col(textCol), n)
      return df.select(col(idCol), col(textCol), stats.as("__dns"))
        .withColumn("n_tokens",
          size(TextAnalysis.tokens(col(textCol))).cast("long"))
        .withColumn("n_dup_covered", coalesce(col("__dns"), lit(0L)))
        .withColumn("dup_ngram_frac",
          round(col("n_dup_covered").cast("double") /
            greatest(col("n_tokens"), lit(1L)).cast("double"), 4))
        .select(col(idCol), col("n_tokens"), col("n_dup_covered"),
          col("dup_ngram_frac"))
    }
    // persisted for its two consumers (repeat count + coverage join),
    // eager + unpersist-on-return like scrubDuplicatedSpans
    val spans = df.select(col(idCol),
        posexplode(positionalSpans(col(textCol), n, portable)).as(Seq("pos", "__g")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val repeated = spans.groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2)
      .select(col(idCol), col("__g"))
    val starts = spans.join(repeated, Seq(idCol, "__g"))
      .groupBy(col(idCol))
      .agg(collect_set(col("pos")).as("__starts"))
    val out = df.join(starts, Seq(idCol), "left")
      .withColumn("__starts",
        coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__covered", array_distinct(flatten(
        transform(col("__starts"), s => sequence(s, s + n - 1)))))
      .withColumn("n_tokens",
        size(TextAnalysis.tokens(col(textCol))).cast("long"))
      .withColumn("n_dup_covered", size(col("__covered")).cast("long"))
      .withColumn("dup_ngram_frac",
        round(col("n_dup_covered").cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double"), 4))
      .select(col(idCol), col("n_tokens"), col("n_dup_covered"),
        col("dup_ngram_frac"))
      .localCheckpoint(true)
    spans.unpersist(false)
    out
  }

  /** n-gram Jaccard similarity of two docs' shingle sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /** SOURCE-level overlap matrix — the corpus-forensics rollup behind
    * "how much does source A duplicate source B" decisions (which crawls
    * to drop, whether a new source adds anything): for every pair of
    * sources sharing at least one n-gram, the distinct-shingle Jaccard
    * between their gram SETS, plus the raw intersection count and both
    * set sizes. Pairs sharing nothing are omitted (their Jaccard is 0;
    * emitting the full S² matrix would be a cross join for no signal).
    *
    * Scale shape: one corpus explode to distinct (source, gram) —
    * persisted, because three grouped counts consume it (per-source
    * sizes, and both sides of the pair join); the pair join is an
    * equi-join ON THE GRAM whose fan-out per gram is C(k,2) for the k ≤
    * |sources| sources containing it — bounded by the source count, the
    * same not-all-pairs discipline as the LSH family. Eager like
    * [[dupPassageProfile]]: the pair-sized result is checkpointed and
    * the gram frame unpersisted on return. `portable=true` keys grams
    * by raw shingle strings (the SQL-oracle form); production uses
    * xxhash64 keys (8-byte shuffle keys; collisions only ever merge two
    * grams, P ≈ m²/2⁶⁵).
    *
    * WHICH FORM TO USE — `portable=true` (qd41) is the oracle-tax /
    * forensics form: it shuffles every distinct (source, gram) STRING
    * row, the dominant cost at corpus scale (the sf1 heavy at 40.9 s
    * where its twins run ~5 s — SCALE.md qd41/qd43/qd44). When exact
    * shared-gram counts are not required, reach for
    * [[sourceOverlapSketch]] (qd44): one pass, O(sources × k) state,
    * NO gram shuffle — the only form that survives when the
    * distinct-gram table itself is too big to shuffle. The default
    * `portable=false` (qd43) keeps exact counts at 8-byte hashed-key
    * shuffle cost — the right exact form up to the gram-shuffle limit.
    */
  def sourceOverlap(df: DataFrame, sourceCol: String, textCol: String,
      n: Int, portable: Boolean = false): DataFrame = {
    if (portable)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "sourceOverlap(portable = true) shuffles every distinct " +
          "(source, gram) STRING row — the cross-engine oracle form, " +
          "the sf1 heavy (~41 s vs ~5 s for the hashed/sketch twins; " +
          "SCALE.md). Production runs should use the default hashed " +
          "keys (qd43) or sourceOverlapSketch (qd44) when the gram " +
          "table itself cannot shuffle.")
    val gramCol =
      if (portable) explode(wordShingles(col(textCol), n))
      else explode(NativeExpressions.shingleHashes(col(textCol), n))
    val sg = df.select(col(sourceCol).as("__s"), gramCol.as("__g"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sg.groupBy(col("__s")).agg(count(lit(1)).as("__n"))
    val inter = sg.select(col("__s").as("source_a"), col("__g"))
      .join(sg.select(col("__s").as("source_b"), col("__g")), "__g")
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
    val out = inter
      .join(broadcast(sizes.select(col("__s").as("source_a"), col("__n").as("n_grams_a"))),
        "source_a")
      .join(broadcast(sizes.select(col("__s").as("source_b"), col("__n").as("n_grams_b"))),
        "source_b")
      .withColumn("jaccard", round(col("n_shared_grams").cast("double") /
        (col("n_grams_a") + col("n_grams_b") - col("n_shared_grams")).cast("double"), 6))
      .select(col("source_a"), col("source_b"), col("n_grams_a"), col("n_grams_b"),
        col("n_shared_grams"), col("jaccard"))
      .localCheckpoint(true)
    sg.unpersist(false)
    out
  }

  /** Directed SOURCE-level containment matrix — [[sourceOverlap]]'s
    * asymmetric reading, and the doc-level [[containmentPairs]] rolled up
    * to sources: for each ordered pair, what fraction of source A's
    * distinct n-grams also occur in B (C(A,B) = |A∩B| / |A|). The
    * question symmetric Jaccard can't answer: "is this new crawl a
    * SUBSET of what we already have?" — a small source fully contained
    * in a big one shows near-zero Jaccard but containment ≈ 1, exactly
    * the drop-the-redundant-source signal.
    *
    * Pure pair-table-sized derivation: both directed rows come from the
    * unordered [[sourceOverlap]] output's (n_shared, n_a, n_b) — no new
    * corpus pass, so the regime guidance on sourceOverlap's forms
    * applies unchanged (hashed keys at scale, sketch when grams don't
    * shuffle).
    */
  def sourceContainment(overlap: DataFrame): DataFrame = {
    val ab = overlap.select(col("source_a").as("source"),
      col("source_b").as("other"), col("n_grams_a").as("n_grams"),
      col("n_shared_grams"),
      round(col("n_shared_grams").cast("double") / col("n_grams_a").cast("double"), 6)
        .as("containment"))
    val ba = overlap.select(col("source_b").as("source"),
      col("source_a").as("other"), col("n_grams_b").as("n_grams"),
      col("n_shared_grams"),
      round(col("n_shared_grams").cast("double") / col("n_grams_b").cast("double"), 6)
        .as("containment"))
    ab.unionByName(ba)
  }

  /** Sketched [[sourceOverlap]] — the 100 TB path: estimate every
    * source pair's gram-set Jaccard from per-source MinHash signatures
    * instead of the exact distinct-gram self-join. One corpus pass
    * builds O(sources × k) state: each DOC's k-slot signature comes out
    * of the native [[NativeExpressions.minhashSig]] kernel (the qd09
    * signature family — ONE xxhash per shingle, then k multiply-shift
    * permutations in a tight loop; no gram row is ever materialized),
    * and the per-source signature is the element-wise `min` across its
    * docs (min-of-mins IS the min over the source's gram union),
    * map-side-combined. Pairs are then a broadcast self-join over the
    * source-count-sized signature table — no gram ever shuffles AT ALL,
    * and the full S² matrix costs O(S² × k) driver-free work. The
    * estimator is the classic k-permutation MinHash (Broder 1997):
    * Ĵ = |{j : mh_j(A) = mh_j(B)}| / k, standard error √(J(1−J)/k) —
    * k=256 keeps 3σ under 0.1 across the J range. Deterministic:
    * the permutation constants are splitmix-derived from the slot
    * index, so the same corpus always yields the same sketch.
    *
    * Gram-set sizes come from the SAME minima (the k-minimum-value
    * estimator, Bar-Yossef et al. 2002): a slot's min over N distinct
    * grams is the smallest of N near-uniform 64-bit draws, with
    * E[u/2⁶⁴] = 1/(N+1), so inverting the across-slot mean gives N̂
    * with ~1/√k relative error — no second pass, no HLL, no explode.
    *
    * Differences from the exact form, by design: pairs sharing nothing
    * still appear (Ĵ = 0 rows are the point of a full matrix at sketch
    * cost) — INCLUDING sources whose every text is shorter than n
    * tokens (zero shingles: their all-sentinel signatures are nulled so
    * they surface with Ĵ = 0 and size 0, their true values); gram-set
    * sizes are k-minimum-value estimates; and the shared-gram count is
    * derived from Ĵ and the size estimates (Ĵ/(1+Ĵ)·(|A|+|B|)) rather
    * than counted. Use [[sourceOverlap]] when exact counts matter and
    * the gram shuffle is affordable.
    */
  def sourceOverlapSketch(df: DataFrame, sourceCol: String, textCol: String,
      n: Int, k: Int = 256): DataFrame = {
    require(k >= 16, s"sketch width k=$k too small for a usable estimate")
    val docSigs = df.select(col(sourceCol).as("__s"),
      NativeExpressions.minhashSig(col(textCol), k, n).as("__dsig"))
    val mins = (0 until k).map(j =>
      min(element_at(col("__dsig"), j + 1)).as(s"mh$j"))
    // a doc with fewer than n tokens signs as all-Long.MaxValue; a
    // source where EVERY doc (or text) is empty/short keeps the
    // sentinel in slot 0 — that is "zero shingles": null the signature
    // so it matches nothing and sizes to 0 (a true min landing exactly
    // on MaxValue has probability k·2⁻⁶⁴ — ignorable, and deterministic)
    val sigRaw = docSigs.groupBy(col("__s"))
      .agg(mins.head, mins.tail: _*)
      .select(col("__s"),
        when(col("mh0").isNull || col("mh0") === lit(Long.MaxValue), lit(null))
          .otherwise(array((0 until k).map(j => col(s"mh$j")): _*)).as("__sig"))
    // signed long m ↔ unsigned u = m + 2⁶³ (mod 2⁶⁴): the normalized
    // minimum is m/2⁶⁴ + 0.5 ∈ (0, 1)
    val meanF = aggregate(col("__sig"), lit(0.0d),
      (acc, m) => acc + (m.cast("double") / lit(math.pow(2.0, 64)) + lit(0.5d)),
      acc => acc / lit(k.toDouble))
    val sig = sigRaw.select(col("__s"),
      when(col("__sig").isNull, lit(0L))
        .otherwise(greatest(
          round(lit(1.0d) / meanF - lit(1.0d), 0).cast("long"), lit(0L)))
        .as("__nd"),
      col("__sig"))
    val matches = when(col("__sa").isNull || col("__sb").isNull, lit(0))
      .otherwise(size(filter(
        zip_with(col("__sa"), col("__sb"), (a, b) => a === b), m => m)))
    sig.select(col("__s").as("source_a"), col("__nd").as("n_grams_a_est"),
        col("__sig").as("__sa"))
      .join(broadcast(sig.select(col("__s").as("source_b"),
        col("__nd").as("n_grams_b_est"), col("__sig").as("__sb"))),
        col("source_a") < col("source_b"))
      .withColumn("jaccard_est", round(matches.cast("double") / lit(k.toDouble), 6))
      .withColumn("n_shared_grams_est",
        round(col("jaccard_est") / (lit(1.0d) + col("jaccard_est")) *
          (col("n_grams_a_est") + col("n_grams_b_est")).cast("double"), 0).cast("long"))
      .select(col("source_a"), col("source_b"), col("n_grams_a_est"),
        col("n_grams_b_est"), col("n_shared_grams_est"), col("jaccard_est"))
  }

  // ------------------------------------------------------------ MinHash

  /** The MinHash family's text canon: Unicode NFC, so composed and
    * decomposed spellings of the same text yield identical shingle sets
    * (the [[TextAnalysis.normalized]] unification — without it a
    * decomposed-Unicode near-dup of a composed doc never collides in
    * any band). Identity (and allocation-free) on ASCII, so the hash
    * values of an ASCII corpus are unchanged. Applied by BOTH candidate
    * generation and exact verification — the two must see one canon or
    * a candidate pair could verify against different gram sets.
    * Case/whitespace are deliberately NOT touched here: shingle
    * tokenization already splits on `\s+` after trim, and the family's
    * documented semantics are case-sensitive. DuckDB replays as
    * `nfc_normalize(text)`.
    */
  private[graft] def shingleCanon(text: Column): Column =
    NativeExpressions.nfcNormalize(text)

  /** MinHash signature as k columns `mh0..mh{k-1}`: per permutation j the
    * signature is the min over shingles of hash(shingle ⊕ j). Narrow map
    * stage; `portable=true` uses md5 (string min, engine-portable for
    * oracles), `false` uses xxhash64 (fast path for production scale).
    * Text is NFC-canonicalized first ([[shingleCanon]]).
    */
  def withMinHash(df: DataFrame, textCol: String, k: Int, shingleN: Int,
      portable: Boolean = false): DataFrame = {
    val sig = if (portable)
      NativeExpressions.portableMinhashSig(shingleCanon(col(textCol)), k, shingleN)
    else
      NativeExpressions.minhashSig(shingleCanon(col(textCol)), k, shingleN)
    val withSig = df.withColumn("__sig", sig)
    val named = (0 until k).foldLeft(withSig) { (acc, j) =>
      acc.withColumn(s"mh$j", col("__sig").getItem(j))
    }
    named.drop("__sig")
  }

  /** HOF executable spec of the `portable=true` path of [[withMinHash]]
    * (md5 over word-shingle strings). DedupSpec asserts byte equality with
    * the native kernel; kept because the HOF form IS the DuckDB oracle
    * formulation, column for column.
    */
  def withMinHashPortableHOF(df: DataFrame, textCol: String, k: Int,
      shingleN: Int): DataFrame = {
    val withSh = df.withColumn("__sh",
      wordShingles(shingleCanon(col(textCol)), shingleN))
    val sig = (0 until k).foldLeft(withSh) { (acc, j) =>
      acc.withColumn(s"mh$j",
        array_min(transform(col("__sh"), s => md5(concat(s, lit(s"#$j"))))))
    }
    sig.drop("__sh")
  }

  /** LSH banding: k signature columns → `bands` band-hash columns
    * `band0..`, each an md5 of its signature slice. Docs sharing any band
    * hash are candidate near-dups (standard banding estimate: P(candidate)
    * = 1-(1-j^r)^b for Jaccard j, rows-per-band r).
    */
  def withLshBands(df: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    (0 until bands).foldLeft(df) { (acc, b) =>
      val cols = (b * r until (b + 1) * r).map(j => col(s"mh$j").cast("string"))
      acc.withColumn(s"band$b", md5(concat_ws("|", cols: _*)))
    }
  }

  /** Candidate pairs via the band bucket-join: unpivot bands (explode is k×
    * row growth of *ids only*, not documents), self-join per (band, hash)
    * bucket, id_a < id_b, distinct. This is the scale path: no O(n²).
    */
  def lshCandidatePairs(sig: DataFrame, idCol: String, bands: Int): DataFrame = {
    val bandCols = (0 until bands).map(b => struct(lit(b).as("band"), col(s"band$b").as("bh")))
    val exploded = sig.select(col(idCol), explode(array(bandCols: _*)).as("e"))
      .select(col(idCol), col("e.band"), col("e.bh"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** End-to-end MinHash-LSH near-dup pairs with exact Jaccard verification
    * of candidates only (candidates ≪ all pairs).
    */
  def minHashNearDups(df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      minJaccard: Double = 0.7, portable: Boolean = false): DataFrame = {
    val sig = withLshBands(withMinHash(df, textCol, k, shingleN, portable), k, bands)
    val pairs = lshCandidatePairs(sig, idCol, bands)
    // verification uses sorted shingle-hash arrays (8 B/shingle, linear-
    // merge jaccard) — same hash chain as the signatures, so the exact
    // check is consistent with the candidate generation
    val docs = df.select(col(idCol),
      NativeExpressions.shingleHashes(shingleCanon(col(textCol)), shingleN)
        .as("__sh"))
    pairs
      .join(docs.select(col(idCol).as("id_a"), col("__sh").as("sh_a")), "id_a")
      .join(docs.select(col(idCol).as("id_b"), col("__sh").as("sh_b")), "id_b")
      .withColumn("jaccard", NativeExpressions.sortedJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Near-dup DECONTAMINATION — the fuzzy sibling of
    * [[TextAnalysis.decontaminate]]'s exact n-gram gate: flag corpus
    * docs that are MinHash-LSH near-duplicates (verified Jaccard ≥
    * `minJaccard`) of ANY benchmark doc. The exact gate catches verbatim
    * leaks; this catches the paraphrased/reformatted eval row whose
    * shared-gram count stays under an absolute threshold but whose
    * shingle-set overlap is dominant — the contamination mode n-gram
    * audits (GPT-3 appendix C; Gopher §C.4) explicitly call out missing.
    *
    * Returns one row per corpus doc: (`idCol`, n_bench_near_matches,
    * best_jaccard, contaminated_near) — best_jaccard is the max VERIFIED
    * Jaccard among matches ≥ threshold (0.0 when none), 4-dp-rounded
    * (qd09's convention).
    *
    * Scale shape: candidate generation is the banding equi-join of
    * [[minHashNearDups]] with the BENCHMARK side broadcast (eval suites
    * are MB-sized; the corpus never self-joins), so corpus cost is one
    * narrow signature pass + a broadcast probe; verification touches
    * candidates only, via the same sorted-shingle-hash merge as qd09.
    * Recall is the standard banding curve P = 1−(1−j^r)^b — and because
    * the signatures are deterministic, the SAME pairs surface on every
    * engine (the portable path replays band-for-band in SQL).
    */
  def fuzzyDecontaminate(docs: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      minJaccard: Double = 0.8, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, portable: Boolean = false): DataFrame = {
    val dSig = withLshBands(
      withMinHash(docs.select(col(idCol), col(textCol)), textCol, k,
        shingleN, portable), k, bands)
    val bSig = withLshBands(
      withMinHash(benchmark.select(col(benchIdCol).as("__bid"),
          col(benchTextCol).as("__btxt")), "__btxt", k, shingleN, portable),
      k, bands)
    val cand = bandsLong(dSig, bands, Seq(idCol))
      .join(broadcast(bandsLong(bSig, bands, Seq("__bid"))), Seq("band", "bh"))
      .select(col(idCol), col("__bid")).distinct()
    val dSh = docs.select(col(idCol),
      NativeExpressions.shingleHashes(shingleCanon(col(textCol)), shingleN)
        .as("__sh_d"))
    val bSh = benchmark.select(col(benchIdCol).as("__bid"),
      NativeExpressions.shingleHashes(shingleCanon(col(benchTextCol)), shingleN)
        .as("__sh_b"))
    val hits = cand
      .join(dSh, Seq(idCol))
      .join(broadcast(bSh), Seq("__bid"))
      .withColumn("__j",
        round(NativeExpressions.sortedJaccard(col("__sh_d"), col("__sh_b")), 4))
      .filter(col("__j") >= minJaccard)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bench_near_matches"),
        max(col("__j")).as("best_jaccard"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bench_near_matches"), lit(0L)).as("n_bench_near_matches"),
        coalesce(col("best_jaccard"), lit(0.0d)).as("best_jaccard"))
      .withColumn("contaminated_near", col("n_bench_near_matches") > 0)
  }

  /** Unpivot `band0..band{bands-1}` to long form (`keep` columns, band
    * index, band hash) — explode of BAND VALUES only (bands× row growth
    * of ids+hashes, never of document text).
    */
  private[graft] def bandsLong(df: DataFrame, bands: Int, keep: Seq[String]): DataFrame = {
    val arr = array((0 until bands).map(b =>
      struct(lit(b).as("band"), col(s"band$b").as("bh"))): _*)
    df.select(keep.map(col) :+ explode(arr).as("__e"): _*)
      .select(keep.map(col) :+ col("__e.band").as("band") :+ col("__e.bh").as("bh"): _*)
  }

  /** Incremental NEAR-dup dedup — [[incrementalDedup]]'s fuzzy sibling,
    * the production shape for a corpus that grows batch by batch: a new
    * batch is deduped against the corpus WITHOUT re-fingerprinting it,
    * probing only the corpus's STORED LSH band-hash columns
    * (`band0..band{bands-1}`, [[withLshBands]]'s layout — write them at
    * ingest, read 4 pruned columns at probe time).
    *
    * Semantics (aggressive + order-free, both decided on the FULL batch
    * so the result is deterministic under any execution order):
    *  - cross-corpus: a batch doc sharing ANY (band, hash) bucket with
    *    the corpus is dropped (the standard banding candidate rule —
    *    identical docs always collide, near-dups with Jaccard j collide
    *    with P = 1-(1-j^r)^b);
    *  - within-batch: a batch doc sharing any bucket with a SMALLER-ID
    *    batch doc is dropped (one-pass smaller-id-sharer rule — the
    *    streaming-friendly form; full transitive clustering is
    *    [[nearDupComponents]]' batch job).
    *
    * Returns the surviving rows with their band columns — exactly what
    * a corpus sink stores for the next batch's probe. Executes EAGERLY
    * (a batch op, like [[dupPassageProfile]]): the batch-sized result is
    * checkpointed and the signature frame's blocks are freed on return.
    *
    * Scale shape: the corpus side is a LEFT SEMI probe from the
    * exploded batch bands (no distinct over the corpus's bands, no
    * corpus row multiplication); the batch side is micro-batch-sized,
    * so AQE broadcasts it against a 100 TB corpus. The within-batch
    * self-join is batch×batch on uniform md5 bucket keys.
    */
  def incrementalNearDup(newBatch: DataFrame, corpusBands: DataFrame,
      idCol: String, textCol: String, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, portable: Boolean = false): DataFrame =
    incrementalNearDupFromSig(
      lshSignature(newBatch, textCol, k, bands, shingleN, portable),
      bandsLong(corpusBands, bands, Nil), idCol, bands)

  /** The signature stage of [[incrementalNearDup]], PERSISTED: the batch
    * rows plus their `band0..band{bands-1}` columns. Exposed so a caller
    * that needs the bands BEFORE the probe (the bucketed corpus sink
    * collects the batch's band-hash prefixes to prune the probe scan)
    * computes them exactly once; hand the result to
    * [[incrementalNearDupFromSig]], which unpersists it.
    */
  def lshSignature(df: DataFrame, textCol: String, k: Int = 16,
      bands: Int = 4, shingleN: Int = 3, portable: Boolean = false): DataFrame =
    withLshBands(withMinHash(df, textCol, k, shingleN, portable), k, bands)
      .drop((0 until k).map(j => s"mh$j"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Free a `localCheckpoint`ed frame's blocks. They live on the
    * UNDERLYING RDD (registered at RDD level, not in the CacheManager),
    * so `Dataset.unpersist` is a no-op on them — the handle comes out
    * of the checkpoint's LogicalRDD leaf. Callers that consume a
    * checkpointed result inside a bounded scope (a streaming batch, a
    * compaction) should free it on the way out or each invocation
    * leaks one resident RDD until session end.
    */
  private[graft] def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Free EVERY localCheckpoint reachable in `df`'s logical plan — for
    * consumers that materialize a derived frame (their own checkpoint)
    * and thereby orphan the checkpoints inside the input's plan. The
    * caller must own the input EXCLUSIVELY: a localCheckpoint truncates
    * lineage, so any OTHER frame sharing one of these checkpoints does
    * not recompute after this — its next action fails with a
    * missing-checkpoint-block SparkException. Same ownership rule as
    * [[freeLocalCheckpoint]], applied transitively.
    */
  private[graft] def freeUpstreamCheckpoints(df: DataFrame): Unit =
    df.queryExecution.logical.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** [[incrementalNearDup]]'s core over a pre-built signature frame and a
    * LONG-form probe side (`band`, `bh` — [[bandsLong]]'s layout). The
    * probe side may be partition-pruned by the caller (the bucketed sink
    * reads only the index buckets matching the batch's band prefixes).
    * `sig` must be persisted ([[lshSignature]]); it is unpersisted here.
    */
  def incrementalNearDupFromSig(sig: DataFrame, corpusLong: DataFrame,
      idCol: String, bands: Int): DataFrame = {
    // the signature frame feeds FOUR plan branches (anti-join left side,
    // corpus probe, both sides of the within-batch self-join) — persist
    // it or the minhash-over-text computation runs 4× per action.
    // dupPassageProfile's eager pattern: persist, one checkpointing job
    // over the batch-sized result, signature blocks freed on return.
    val batchBands = bandsLong(sig, bands, Seq(idCol))
    val crossHit = batchBands
      .join(corpusLong, Seq("band", "bh"), "left_semi")
      .select(col(idCol)).distinct()
    val withinHit = batchBands.select(col(idCol).as("__ia"), col("band"), col("bh"))
      .join(batchBands.select(col(idCol).as("__ib"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("__ia") < col("__ib"))
      .select(col("__ib").as(idCol)).distinct()
    val out = sig.join(crossHit, Seq(idCol), "left_anti")
      .join(withinHit, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    sig.unpersist(false)
    out
  }

  /** Connected components over near-dup pairs — the step that turns pair
    * lists into dedup decisions (cluster id = smallest doc id in the
    * component; that doc is the keeper). Hash-to-min label propagation:
    * every node starts labeled with itself; each round pulls the min label
    * across its edges; converges in O(component diameter) rounds —
    * near-dup components are tiny and dense, so a handful. Each round is
    * one equi-join + one groupBy on uniform ids (the standard large-graph
    * CC shape — GraphX/Pregel's `connectedComponents` is this same loop);
    * `localCheckpoint` truncates lineage so plans don't grow per round.
    */
  def nearDupComponents(pairs: DataFrame, idA: String = "id_a",
      idB: String = "id_b", maxIter: Int = 20): DataFrame = {
    // localCheckpoint persistence lives on the UNDERLYING RDD (registered
    // at RDD level, not in the CacheManager), so Dataset.unpersist is a
    // no-op on it; freeing a superseded round's blocks needs the RDD
    // handle out of the checkpoint's LogicalRDD leaf. Without this a deep
    // component chain leaves O(rounds) label frames resident until GC.
    def freeCheckpoint(df: DataFrame): Unit =
      df.queryExecution.logical match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    // Convergence check: labels only ever decrease (min over a growing
    // neighborhood), so round n == round n-1 iff the multiset of (id,
    // label) pairs is unchanged — compared via a single order-independent
    // sum(xxhash64) checksum agg per round (one job, no join; the previous
    // join+filter+limit formulation re-derived both sides each round and
    // roughly doubled per-round cost). An equal checksum on UNequal label
    // sets needs a 64-bit hash-sum collision on labelings that differ —
    // vanishingly unlikely, and strictly safer than a fixed round count.
    // (Decimal sum: a raw long sum of xxhash64 values overflows under
    // ANSI mode.)
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(
          sum(xxhash64(col("id"), col("label"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))),
          lit(java.math.BigDecimal.ZERO)))
        .head().getDecimal(0)
    var prevSum = checksum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val pulled = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("label"))
      val next = labels.union(pulled)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(true)
      val nextSum = checksum(next)
      freeCheckpoint(labels) // superseded round's blocks
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      i += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"nearDupComponents: label propagation did NOT converge after " +
          s"$maxIter rounds (component diameter > $maxIter) — cluster " +
          "labels may be truncated; raise maxIter")
    // the loop is done with the edge list; only the final labels frame
    // (which the returned plan reads) stays resident
    freeCheckpoint(edges)
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("is_keeper", col("doc_id") === col("cluster_id"))
  }

  /** Quality-aware near-dup keeper selection — the curation refinement
    * of [[nearDupComponents]]' min-id rule: the arbitrary smallest id is
    * fine for EXACT dups (all copies identical), but near-dup cluster
    * members differ, and a real pipeline keeps the BEST copy (highest
    * quality score — the SemDeDup "keep one representative per cluster"
    * step with an explicit quality policy instead of an accident of id
    * assignment). Given the components frame and a per-doc score, the
    * keeper is the per-cluster argmax by (`scoreCol` DESC, id ASC — the
    * deterministic tie rule). Returns one row per CLUSTERED doc:
    * (idCol, cluster_id, score, keeper_id, is_keeper). Docs absent from
    * `components` (singletons — the overwhelming mass) are trivially
    * their own keepers; compose with a left join + coalesce exactly as
    * [[graft.functions.Curation.leakageSafeSplit]] does.
    *
    * The score must be bounded-precision (a 4-dp rounded signal like
    * stopword ratio) so the argmax is engine-portable.
    *
    * Scale shape: one equi-join on the id attaching scores to the
    * pair-table-sized components frame, one cluster-keyed window for
    * the argmax — cluster cardinality bounds the window partitions, and
    * near-dup clusters are tiny. Never corpus-wide.
    */
  def qualityKeepers(components: DataFrame, scored: DataFrame,
      idCol: String, scoreCol: String): DataFrame = {
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col(scoreCol).desc, col(idCol))
    components.select(col("doc_id").as(idCol), col("cluster_id"))
      .join(scored.select(col(idCol), col(scoreCol)), idCol)
      .withColumn("keeper_id", first(col(idCol)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("is_keeper", col(idCol) === col("keeper_id"))
  }

  // ------------------------------------------------------------ SimHash

  /** 64-bit SimHash: per token take xxhash64 bits, sum ±1 per bit position
    * across tokens, simhash bit = sign. Near-dups differ in few bits
    * (Hamming distance). Native Catalyst expression — one tight loop per
    * row (the HOF formulation below is >20× slower at 50k docs).
    */
  def simHash64(textCol: String): Column =
    NativeExpressions.simhash64(col(textCol))

  /** Reference HOF formulation of [[simHash64]] (semantically identical,
    * kept as the executable spec the native kernel is tested against).
    */
  def simHash64HOF(textCol: String): Column = {
    // filter(…, t -> t != '') drops the [''] that split returns for
    // empty/whitespace-only input, matching the native kernel's
    // no-tokens → 0L edge case (byte-level tokenizer yields no tokens).
    val votes =
      s"""aggregate(
         |  filter(split(trim($textCol), '\\\\s+'), t -> t != ''),
         |  array_repeat(0L, 64),
         |  (acc, t) -> zip_with(acc,
         |    transform(sequence(0, 63),
         |      i -> CASE WHEN (shiftright(xxhash64(t), i) & 1L) = 1L THEN 1L ELSE -1L END),
         |    (a, b) -> a + b))""".stripMargin
    val bits =
      s"""aggregate(
         |  zip_with($votes, sequence(0, 63),
         |    (v, i) -> CASE WHEN v > 0L THEN shiftleft(1L, i) ELSE 0L END),
         |  0L, (acc, x) -> acc | x)""".stripMargin
    expr(bits)
  }

  /** Engine-portable SimHash as a 16-hex-char string (md5-derived votes —
    * see [[NativeExpressions.PortableSimHashExpr]]); the xxhash
    * [[simHash64]] is the production fast path.
    */
  def simHash64Portable(textCol: String): Column =
    NativeExpressions.portableSimhash(col(textCol))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** The `maxHamming + 1` blocking keys of a 64-bit simhash: contiguous
    * bit-blocks splitting the word as evenly as possible. Pigeonhole: a
    * pair at Hamming ≤ maxHamming has ≤ maxHamming differing bits across
    * maxHamming+1 blocks, so at least one FULL block matches — blocking
    * on every block (a multi-table union, Manku et al. WWW 2007 §3) has
    * 100% recall for the Hamming radius, unlike single-prefix blocking
    * (which silently missed any pair whose differing bit fell inside the
    * prefix).
    */
  private def simhashBlocks(simhash: Column, maxHamming: Int): Seq[Column] = {
    // >= 64 would yield zero-width blocks whose constant key degenerates
    // the equi-join to all-pairs; negative would silently return nothing
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming")
    val nBlocks = maxHamming + 1
    (0 until nBlocks).map { b =>
      val lo = b * 64 / nBlocks
      val hi = (b + 1) * 64 / nBlocks
      val mask = if (hi - lo >= 64) -1L else (1L << (hi - lo)) - 1L
      shiftright(simhash, lo).bitwiseAND(lit(mask))
    }
  }

  /** Near-dup pairs from a precomputed 64-bit-long signature column:
    * explode ids over the `maxHamming + 1` blocking tables (row growth on
    * (id, simhash) only — 16 B/doc/table, never the documents), equi-join
    * per (table, key) — at 100 TB a shuffled hash join on uniform keys —
    * distinct, verify exact Hamming. Exact recall at the radius by the
    * pigeonhole argument on [[simhashBlocks]].
    */
  def simHashNearDupPairs(sig: DataFrame, idCol: String, simhashCol: String,
      maxHamming: Int = 3): DataFrame = {
    val tables = simhashBlocks(col(simhashCol), maxHamming).zipWithIndex
      .map { case (k, t) => struct(lit(t).as("t"), k.as("k")) }
    val exploded = sig
      .select(col(idCol), col(simhashCol), explode(array(tables: _*)).as("e"))
      .select(col(idCol), col(simhashCol), col("e.t"), col("e.k"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.t") === col("b.t") && col("a.k") === col("b.k") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col(s"a.$simhashCol").as("__sa"), col(s"b.$simhashCol").as("__sb"))
      .distinct()
      .withColumn("hamming", hamming64(col("__sa"), col("__sb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** SimHash near-dup pairs over text: xxhash64 signatures (production
    * fast path) + exact-recall multi-table blocking.
    */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame =
    simHashNearDupPairs(
      df.select(col(idCol), simHash64(textCol).as("simhash")),
      idCol, "simhash", maxHamming)

  /** [[simHashNearDups]] on the engine-portable md5 signature
    * ([[simHash64Portable]]'s 16-hex-char string, reassembled into the
    * 64-bit long from its two 32-bit hex halves) — same multi-table
    * blocking, and because the recall is EXACT at the radius, the result
    * equals the all-pairs Hamming filter a SQL oracle can state directly:
    * the oracle needs no blocking replay, and a green hash doubles as a
    * machine check of the pigeonhole recall guarantee.
    */
  def simHashNearDupsPortable(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val hex = simHash64Portable(textCol)
    val asLong = shiftleft(conv(substring(hex, 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(hex, 9, 8), 16, 10).cast("long"))
    simHashNearDupPairs(
      df.select(col(idCol), asLong.as("simhash")), idCol, "simhash", maxHamming)
  }

  // ------------------------------------------------- winnowing (MOSS)

  /** Strip ALL boundary whitespace (`trim` strips only spaces; a
    * trailing `\n` would otherwise make `split` emit a phantom ""
    * token, so the relational/SQL gram positions would diverge from the
    * byte-tokenizing kernel on any corpus with newline-terminated
    * docs). Applied by every winnowing/containment tokenization — and
    * mirrored in the qd51/qd53 oracles.
    */
  private def wsTrim(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003, "Winnowing: Local Algorithms for Document
    * Fingerprinting" — the MOSS algorithm): hash every word k-gram, slide
    * a window of `w` consecutive gram hashes over the document, and in
    * each window select the minimum hash, breaking ties by the RIGHTMOST
    * position (§4's robust winnowing, which makes the selection a local —
    * position-independent — function of the window's content). The
    * distinct selected (position, hash) pairs are the document's
    * fingerprints: any shared substring of at least w + k − 1 tokens is
    * GUARANTEED to contribute at least one common fingerprint to both
    * documents (the winnowing guarantee), while only ≈ 2/(w+1) of grams
    * are kept. Documents with fewer than w full grams yield no full
    * window and hence no fingerprints — callers screening short docs
    * should route them through exact/MinHash dedup instead.
    *
    * Implementation: gram hashes are engine-portable md5 hex strings
    * over lowercased word k-grams. The DEFAULT path is the
    * [[NativeExpressions.WinnowExpr]] kernel — the whole per-doc
    * selection (digests, monotonic-deque sliding min with rightmost
    * tie, in-place dedup) as ONE codegen'd narrow projection + an
    * explode whose row growth IS the output: NO gram explode, NO window
    * shuffle, nothing to distinct. `relational = true` keeps the
    * window-function formulation (the executable spec the qd51 SQL
    * oracle mirrors, and DedupSpec pins kernel ≡ relational): one
    * posexplode, one doc-keyed shuffle for the composite-key window min
    * (`hash ∥ '#' ∥ lpad(nGrams − pos)` — hash ascending, then smaller
    * nGrams − pos = rightmost), one reused-partitioning distinct.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, relational: Boolean = false): DataFrame = {
    require(k >= 1 && w >= 2, s"winnowFingerprints: need k >= 1, w >= 2 (got k=$k, w=$w)")
    val canon = wsTrim(lower(col(textCol)))
    if (!relational) {
      return df.select(col(idCol).as("doc_id"),
          explode(NativeExpressions.winnowFingerprints(canon, k, w)).as("__fp"))
        .select(col("doc_id"), col("__fp.fp_pos").as("fp_pos"),
          col("__fp.fp_hash").as("fp_hash"))
    }
    // positional k-gram md5 hashes: (pos, hash) with pos 0-based — the
    // gram construction is TextAnalysis.allNgrams, single-sourced
    val grams = transform(TextAnalysis.allNgrams(canon, k), g => md5(g))
    val g = df.select(col(idCol).as("doc_id"), posexplode(grams).as(Seq("pos", "h")))
      .withColumn("ngr", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
    // per-window winner: min (hash asc, rightmost pos) via the composite
    // fixed-width key; only rows with a FULL w-gram frame start a window
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    val key = concat(col("h"), lit("#"),
      lpad((col("ngr") - col("pos")).cast("string"), 10, "0"))
    g.withColumn("wk", min(key).over(frame))
      .filter(col("pos") <= col("ngr") - w)
      .select(col("doc_id"),
        (col("ngr") - substring(col("wk"), 34, 10).cast("long")).as("fp_pos"),
        substring(col("wk"), 1, 32).as("fp_hash"))
      .distinct()
  }

  /** Candidate near-dup / containment pairs from shared winnowing
    * fingerprints — the MOSS match step: join docs on fp_hash, count
    * shared fingerprints per pair, keep pairs sharing at least
    * `minShared`. `maxDf` drops fingerprints held by more than that many
    * documents BEFORE the pair join (boilerplate/stop-gram hashes whose
    * C(df, 2) fan-out would dominate; the standard idf-style cap every
    * fingerprint index applies) — so pair volume is bounded by
    * Σ_fp C(min(df, maxDf), 2), never corpus².
    */
  def winnowOverlapPairs(fps: DataFrame, minShared: Int = 2,
      maxDf: Int = 50): DataFrame = {
    require(minShared >= 1 && maxDf >= 2,
      s"winnowOverlapPairs: need minShared >= 1, maxDf >= 2 (got $minShared, $maxDf)")
    // persisted: BOTH sides of the pair self-join consume this frame —
    // without it the whole upstream fingerprint derivation (a corpus
    // scan) runs twice (the sourceOverlap discipline); the pair-sized
    // result is checkpointed eagerly so the persist can be dropped here
    val byHash = fps.select(col("doc_id"), col("fp_hash")).distinct()
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("fp_hash"))))
      .filter(col("__df") <= maxDf)
      .select(col("doc_id"), col("fp_hash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = byHash.select(col("doc_id").as("id_a"), col("fp_hash"))
      .join(byHash.select(col("doc_id").as("id_b"), col("fp_hash")), "fp_hash")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("long").as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .localCheckpoint(true)
    byHash.unpersist(false)
    out
  }

  /** ASYMMETRIC overlap — Broder containment C(A,B) = |A ∩ B| / |A| over
    * distinct word k-gram sets — for quote/subset/expansion detection:
    * a short doc embedded verbatim in a long one has HIGH containment
    * but LOW Jaccard, so resemblance-tuned MinHash banding
    * ([[minHashNearDups]]) structurally misses it. Candidates here come
    * from shared WINNOWING fingerprints instead ([[winnowFingerprints]] →
    * [[winnowOverlapPairs]]): the winnowing guarantee fires on any
    * shared ≥ w+k−1-token run regardless of the two documents' sizes —
    * exactly the asymmetric case — and the maxDf cap bounds pair
    * fan-out. Candidates are then verified exactly on distinct-gram
    * sets: both containment directions + Jaccard, 4-dp rounded.
    *
    * Scale shape: winnowing's narrow+single-window cost, the capped
    * fingerprint pair join, then one gram-set equi-join per pair side —
    * verification touches candidates only, never corpus². Gram sets
    * ride as arrays with the same tokenization as the fingerprints.
    *
    * WHICH FORM — `portable = true` (qd53's oracle form) verifies on
    * raw lowercased word-k-gram STRING sets, the sf1 heavy (~80 s vs
    * the hashed twin; SCALE.md); the default verifies on the sorted
    * distinct 8-byte [[NativeExpressions.shingleHashes]] sets — same
    * counts up to 2⁻⁶⁴ collisions (DedupSpec pins fast ≡ portable on
    * the fixture), a fraction of the shuffle/intersect bytes. The
    * candidate stage (md5 winnowing) is shared by both forms.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, minShared: Int = 2, maxDf: Int = 50,
      minContainment: Double = 0.5, portable: Boolean = false): DataFrame = {
    if (portable)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "containmentPairs(portable = true) verifies on raw STRING gram " +
          "sets — the cross-engine oracle form, super-linear at corpus " +
          "scale (sf1: ~80 s vs ~5 s; SCALE.md). Production runs should " +
          "use the default hashed verification (qd59's form — " +
          "value-identical up to 2^-64 collisions, DedupSpec-pinned).")
    val fps = winnowFingerprints(df, idCol, textCol, k, w)
    val pairs = winnowOverlapPairs(fps, minShared, maxDf)
    val gramCol =
      if (portable) wordShingles(wsTrim(lower(col(textCol))), k)
      else NativeExpressions.shingleHashes(wsTrim(lower(col(textCol))), k)
    // persisted: the verification joins this gram frame on BOTH pair
    // sides — one corpus scan instead of two (ScanCountSpec pins the
    // op's total at 2: fingerprints + grams); pair-sized output is
    // checkpointed eagerly so the persist can be dropped on return
    val docs = df.select(col(idCol).as("doc_id"), gramCol.as("__g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = pairs
      .join(docs.select(col("doc_id").as("id_a"), col("__g").as("__ga")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("__g").as("__gb")), "id_b")
      .withColumn("__i", size(array_intersect(col("__ga"), col("__gb"))).cast("double"))
      .withColumn("__na", size(col("__ga")).cast("double"))
      .withColumn("__nb", size(col("__gb")).cast("double"))
      .withColumn("containment_a", round(col("__i") / greatest(col("__na"), lit(1.0d)), 4))
      .withColumn("containment_b", round(col("__i") / greatest(col("__nb"), lit(1.0d)), 4))
      .withColumn("jaccard",
        round(col("__i") / greatest(col("__na") + col("__nb") - col("__i"), lit(1.0d)), 4))
      .filter(greatest(col("containment_a"), col("containment_b")) >= minContainment)
      .select(col("id_a"), col("id_b"), col("shared_fps"),
        col("containment_a"), col("containment_b"), col("jaccard"))
      .localCheckpoint(true)
    docs.unpersist(false)
    out
  }

  /** LSH recall probe — the QA operator for the banded-MinHash scale
    * path: on a deterministic document sample, compute GROUND-TRUTH
    * near-dup pairs by brute-force all-pairs Jaccard (the qe09
    * precedent: an exact baseline is allowed its nested loop because
    * the SAMPLE bounds it) and flag which of them the production
    * banding ([[minHashNearDups]], identical parameters and
    * verification kernel) actually surfaces. The banding curve
    * P(candidate) = 1 − (1 − j^r)^b is theory; this measures it on
    * YOUR corpus and config — the number that tells you how much
    * near-dup mass a dedup run leaves behind (pairs just under the
    * LSH threshold are the expected misses).
    *
    * Returns one row per TRUTH pair: (id_a, id_b, jaccard,
    * found_by_lsh); estimated recall = avg(found_by_lsh). Sampling is
    * the md5 doc Bernoulli (qd25's primitive: `sampleBuckets` of
    * `totalBuckets`), so the probe is reproducible and its cost knob
    * explicit: m sampled docs cost O(m²) comparisons — size the
    * sample rate p so m stays in the thousands at any corpus size;
    * pairs survive sampling at rate p², and the per-pair recall
    * estimator is unbiased (candidate generation is per-pair
    * deterministic given the signatures).
    */
  def lshRecallProbe(df: DataFrame, idCol: String, textCol: String,
      sampleBuckets: Int, totalBuckets: Int = 100,
      k: Int = 16, bands: Int = 4, shingleN: Int = 3,
      minJaccard: Double = 0.5, portable: Boolean = false): DataFrame = {
    require(sampleBuckets > 0 && sampleBuckets <= totalBuckets)
    val sample = df.filter(
      NativeExpressions.md5Bucket(col(idCol).cast("string"), totalBuckets)
        < lit(sampleBuckets))
    val sh = sample.select(col(idCol).as("__id"),
      NativeExpressions.shingleHashes(shingleCanon(col(textCol)), shingleN).as("__sh"))
    val truth = sh.select(col("__id").as("id_a"), col("__sh").as("__sha"))
      .crossJoin(sh.select(col("__id").as("id_b"), col("__sh").as("__shb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__j", NativeExpressions.sortedJaccard(col("__sha"), col("__shb")))
      .filter(col("__j") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("__j"), 4).as("jaccard"))
    val lsh = minHashNearDups(sample, idCol, textCol, k, bands, shingleN,
        minJaccard, portable)
      .select(col("id_a"), col("id_b"), lit(true).as("found_by_lsh"))
    truth.join(lsh, Seq("id_a", "id_b"), "left")
      .withColumn("found_by_lsh", coalesce(col("found_by_lsh"), lit(false)))
  }
}
