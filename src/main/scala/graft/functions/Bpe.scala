package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training and encoding (Sennrich, Haddow &
  * Birch 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the tokenizer-TRAINING step of a pre-training pipeline,
  * completing the family beside qd28 (vocabulary counts), qd31
  * (wordpiece encode under a fixed vocab) and qd29 (unigram scoring).
  *
  * Scale shape (how production subword trainers are actually built —
  * SentencePiece and HuggingFace `tokenizers` both train from a word-
  * frequency table, not the raw corpus): ONE distributed corpus pass
  * builds `(word, freq)` — at 100 TB the distinct-word table is
  * millions of rows, corpus-size-independent — and every merge
  * iteration then runs over that small cached table: a narrow
  * pair-explode + partial-aggregating count, a 1-row
  * TakeOrderedAndProject argmax to the driver (the merge table IS the
  * model, like IVF centroids), and a codegen'd literal `replace` to
  * apply the merge. K merges cost K tiny jobs after the single corpus
  * scan; nothing per-iteration touches the corpus again.
  *
  * Symbol-sequence representation: the word's current segmentation is a
  * single string with TWO spaces between symbols and two-space padding
  * at both ends (`"  h  e  l  l  o  "`). Merging pair (l, r) is then
  * `replace(toks, " l  r ", " lr ")`: each match consumes one space of
  * padding on each side (preserving the invariant), and `replace`'s
  * left-to-right non-overlapping scan IS classic BPE's greedy merge
  * application — `a a a` under merge (a,a) becomes `aa a`, and pair
  * counting from adjacent positions still counts overlaps (the two
  * (a,a) pairs of `aaa` both count), exactly the reference algorithm.
  * Both Spark's `StringReplace` and DuckDB's `replace` share these
  * semantics, which is what makes the whole K-iteration training loop
  * SQL-replayable (the qd67 oracle unrolls it; BpeSpec pins the
  * greedy-overlap contract on both representations).
  *
  * Word-internal BPE: merges never cross word boundaries by
  * construction (the unit of segmentation is the whitespace word), the
  * GPT-2-family convention rather than Sennrich's explicit `</w>`
  * marker — with whitespace pre-tokenization the marker adds no
  * information (every word ends where its string ends).
  *
  * Determinism: ties on pair count break to the lexicographically
  * smallest (left, right) under binary UTF-8 ordering — identical in
  * Spark (UTF8String binary compare) and DuckDB (memcmp collation) —
  * so the learned merge table is a pure function of the corpus.
  */
object Bpe {

  /** `(word, freq, toks)` seed table: one corpus pass, grouped count on
    * the word key (map-side partials), initial segmentation = one
    * symbol per character (code point — Java regex `.` and RE2 `.` are
    * both code-point-based, so the seed is engine-portable).
    */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("toks",
        concat(lit("  "), regexp_replace(col("word"), "(.)", "$1  ")))

  /** Adjacent-symbol pair counts over a word table, weighted by word
    * frequency (overlap-counting: every adjacent position is a pair).
    * Pure column work: split → positional slice-zip → explode → grouped
    * sum with map-side partials. The pair key space is bounded by the
    * current symbol vocabulary, so the shuffle is tiny regardless of
    * corpus size.
    */
  def pairCounts(words: DataFrame): DataFrame = {
    val syms = split(trim(col("toks")), "  ")
    words
      .select(col("freq"),
        explode(arrays_zip(
          slice(syms, lit(1), size(syms) - 1).as("l"),
          slice(syms, lit(2), size(syms) - 1).as("r"))).as("p"))
      .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Learn the top `numMerges` BPE merges from `df(textCol)`. Returns
    * the ranked merge table `(rank, lhs, rhs, merged, cnt)` — `cnt` is
    * the pair's corpus frequency at selection time. Stops early if the
    * corpus runs out of pairs (single-char vocabulary exhausted).
    *
    * The word table is `localCheckpoint`ed once (it is vocab-sized —
    * the same discipline as qd31's 10-row vocab collect) and the merged
    * segmentation re-checkpointed every 16 merges: each iteration's
    * plan then carries at most 16 cheap `replace` projections above a
    * materialized vocab-sized RDD (re-checkpointing EVERY iteration
    * measured +0.9 s of pure tiny-job overhead at K=8/sf0.1; never
    * checkpointing would grow the plan linearly in K — Janino recompile
    * per iteration and a K-deep lineage for large-K vocabularies).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    var words = wordTable(df, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var rank = 1L
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, l, r, l + r, c))
        words = words.withColumn("toks",
          replace(col("toks"), lit(s" $l  $r "), lit(s" ${l + r} ")))
        if (rank % 16 == 0) words = words.localCheckpoint()
        rank += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "lhs", "rhs", "merged", "cnt").orderBy("rank")
  }

  /** UTF-8 binary string compare (code-point order) — the collation of
    * Spark's `orderBy` on strings (UTF8String binary) and DuckDB's
    * memcmp, so [[trainFastLocal]]'s tie-break is bit-identical to
    * [[train]]'s `orderBy(cnt desc, lhs, rhs)`. Java String.compareTo
    * is UTF-16 order, which DIVERGES for astral-vs-[U+E000,U+FFFF]
    * pairs — never use it here.
    */
  private[graft] def utf8Cmp(a: String, b: String): Int = {
    import org.apache.spark.unsafe.types.UTF8String
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
  }

  /** The exact BPE merge loop of [[train]], run in memory over a
    * collected word-frequency table — the production-vocab trainer.
    *
    * Why this is the 32k-vocab answer and not "batch top-T merges per
    * pass": the distributed loop's cost is ~0.14 s of Spark job
    * latency PER MERGE (flat in corpus size — the work is vocab-sized
    * — but driver-sequenced), so a real 32k-merge vocabulary is ~75
    * minutes of pure scheduling. Batching non-overlapping merges cuts
    * the constant but CHANGES the algorithm: a merged symbol can form
    * a new pair whose count exceeds the batch's lower entries (merge
    * (a,a) at count 100 creates (aa,a) at up to 50, which sequential
    * BPE would pick over a count-40 batch-mate), so batched output
    * diverges from the reference algorithm the qd67 oracle pins. This
    * path instead keeps EXACT sequential semantics and removes the
    * per-merge job: the word table is vocab-sized by construction
    * (SentencePiece/HF trainers hold exactly this table in memory),
    * and a lazy-deletion max-heap with incremental pair-count deltas
    * makes each merge O(words containing the pair) — so s/merge is
    * SUBLINEAR in K (early merges touch most words once; later merges
    * touch ever-fewer). Measured (BpeProbe, 100k-distinct-word corpus):
    * 0.152 → 0.059 → 0.021 → 0.0098 s/merge at K = 256/1024/4096/16384
    * vs the distributed loop's FLAT ~0.9 s/merge — K=16384 trains in
    * 161 s total, marginal s/merge past rank 4096 ≈ 0.006 (~150×,
    * widening with K); the 31-word template corpus reads 0.004 vs
    * 0.20. See SCALE.md round 18.
    *
    * Exactness contract: same pair counting (adjacent positions,
    * overlap-counted, freq-weighted), same argmax (count desc, then
    * (lhs, rhs) ascending in UTF-8 binary order — [[utf8Cmp]]), same
    * greedy left-to-right apply ([[NativeExpressions.BpeMergeKernel]]'s
    * loop shape), same early exhaustion. BpeSpec pins
    * `trainFast ≡ train` on corpus data and fuzzed corpora, and qd74
    * replays it against [[train]]'s own unrolled-CTE oracle verbatim.
    */
  private[graft] def trainFastLocal(wordFreqs: Seq[(String, Long)],
      numMerges: Int): Seq[(Long, String, String, String, Long)] = {
    import scala.collection.mutable
    // symbols interned to ints; pairs packed to one long — the hot maps
    // are then LongMap (no per-op tuple/string allocation); strings are
    // touched only for tie-break compares and the final merge table
    val symId = mutable.HashMap.empty[String, Int]
    val symStr = mutable.ArrayBuffer.empty[String]
    def intern(s: String): Int =
      symId.getOrElseUpdate(s, { symStr += s; symStr.length - 1 })
    @inline def pack(l: Int, r: Int): Long = (l.toLong << 32) | (r & 0xffffffffL)

    // per-word symbol arrays, code-point seeded (the `(.)` regex unit)
    val freqs = new Array[Long](wordFreqs.size)
    val words = new Array[Array[Int]](wordFreqs.size)
    var wi = 0
    wordFreqs.foreach { case (w, f) =>
      val syms = mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < w.length) {
        val cw = Character.charCount(w.codePointAt(i))
        syms += intern(w.substring(i, i + cw))
        i += cw
      }
      words(wi) = syms.toArray
      freqs(wi) = f
      wi += 1
    }
    val pairCnt = mutable.LongMap.empty[Long]
    // occurrence postings: word indices that (at some point) contained
    // the pair — lazily cleaned (a stale index is skipped at apply time)
    val pairWords = mutable.LongMap.empty[mutable.ArrayBuffer[Int]]
    def addWordPairs(idx: Int): Unit = {
      val s = words(idx)
      val f = freqs(idx)
      var j = 0
      while (j < s.length - 1) {
        val p = pack(s(j), s(j + 1))
        pairCnt(p) = pairCnt.getOrElse(p, 0L) + f
        pairWords.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += idx
        j += 1
      }
    }
    def removeWordPairs(idx: Int, touched: mutable.Set[Long]): Unit = {
      val s = words(idx)
      val f = freqs(idx)
      var j = 0
      while (j < s.length - 1) {
        val p = pack(s(j), s(j + 1))
        touched += p
        val n = pairCnt.getOrElse(p, 0L) - f
        if (n <= 0L) pairCnt.subtractOne(p) else pairCnt(p) = n
        j += 1
      }
    }
    // lazy-deletion max-heap: (cnt desc, lhs asc, rhs asc in UTF-8
    // binary order) — an entry is live iff its count equals the pair's
    // CURRENT count. Tie compares touch the interned strings only on
    // equal counts.
    val ord = new Ordering[(Long, Long)] {
      def compare(x: (Long, Long), y: (Long, Long)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val cl = utf8Cmp(symStr((y._2 >>> 32).toInt), symStr((x._2 >>> 32).toInt))
          if (cl != 0) cl
          else utf8Cmp(symStr(y._2.toInt), symStr(x._2.toInt))
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, Long)](ord)
    var idx = 0
    while (idx < words.length) { addWordPairs(idx); idx += 1 }
    pairCnt.foreach { case (p, c) => heap.enqueue((c, p)) }

    // per-merge dedupe of postings without a fresh set per rank: a word
    // is processed once per rank iff its marker is stale
    val seenAt = Array.fill(words.length)(-1)

    val merges = mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // pop until the top entry is live
      var topCnt = -1L
      var topPair = -1L
      while (topCnt < 0 && heap.nonEmpty) {
        val e = heap.dequeue()
        if (pairCnt.getOrElse(e._2, -1L) == e._1) { topCnt = e._1; topPair = e._2 }
      }
      if (topCnt < 0) exhausted = true
      else {
        val li = (topPair >>> 32).toInt
        val ri = topPair.toInt
        val l = symStr(li)
        val r = symStr(ri)
        merges += ((rank.toLong, l, r, l + r, topCnt))
        val mi = intern(l + r)
        val touched = mutable.Set.empty[Long]
        val postings = pairWords.remove(topPair).getOrElse(mutable.ArrayBuffer.empty)
        postings.foreach { w =>
          if (seenAt(w) != rank) {
            seenAt(w) = rank
            val s = words(w)
            var has = false
            var j = 0
            while (!has && j < s.length - 1) {
              if (s(j) == li && s(j + 1) == ri) has = true
              j += 1
            }
            if (has) {
              removeWordPairs(w, touched)
              // greedy left-to-right non-overlapping apply (the
              // BpeMergeKernel/replace scan), in place
              val out = new Array[Int](s.length)
              var read = 0
              var write = 0
              while (read < s.length) {
                if (read < s.length - 1 && s(read) == li && s(read + 1) == ri) {
                  out(write) = mi
                  read += 2
                } else {
                  out(write) = s(read)
                  read += 1
                }
                write += 1
              }
              words(w) = java.util.Arrays.copyOf(out, write)
              addWordPairs(w)
              val ns = words(w)
              var k = 0
              while (k < ns.length - 1) {
                touched += pack(ns(k), ns(k + 1))
                k += 1
              }
            }
          }
        }
        // the applied pair must be fully consumed (greedy L2R removes
        // every adjacency); its entry is gone from pairCnt, so any
        // stale heap entries die on the liveness check
        require(!pairCnt.contains(topPair),
          s"BPE invariant: pair ($l,$r) survived its own merge")
        touched.foreach { p =>
          pairCnt.get(p).foreach(c => heap.enqueue((c, p)))
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** [[train]]'s production-vocab twin: ONE distributed corpus pass
    * builds the word-frequency table, the exact merge loop then runs
    * in memory ([[trainFastLocal]] — semantics identical, proof in the
    * Scaladoc there). `maxDistinctWords` bounds the driver collect the
    * way [[Similarity.Pq.fitCodebooks]]'s `maxFitRows` bounds its
    * sketch: above the cap the trainer keeps the top words by
    * (freq desc, word asc) — the standard trainer vocabulary cap (HF
    * `tokenizers` exposes it as min_frequency/limit_alphabet), a
    * DOCUMENTED approximation that only engages past the cap; below it
    * (every oracle/test scale, and any corpus whose distinct-word
    * count fits a driver — millions of rows, corpus-size-independent)
    * output is bit-identical to [[train]].
    */
  def trainFast(df: DataFrame, textCol: String, numMerges: Int,
      maxDistinctWords: Int = 1 << 22): DataFrame = {
    require(maxDistinctWords >= 1)
    val spark = df.sparkSession
    val wf = wordTable(df, textCol)
      .select(col("word"), col("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(maxDistinctWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    import spark.implicits._
    trainFastLocal(wf, numMerges)
      .toDF("rank", "lhs", "rhs", "merged", "cnt").orderBy("rank")
  }

  /** Apply a learned merge list to a word table's `toks` column in rank
    * order (each merge fully applied before the next — encode is the
    * exact replay of training's apply step, so training-corpus words
    * re-segment to their training-time pieces).
    */
  def applyMerges(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(words) { case (d, (l, r)) =>
      d.withColumn("toks", replace(col("toks"), lit(s" $l  $r "), lit(s" ${l + r} ")))
    }

  /** Per-document BPE fertility under a learned merge list: `(id,
    * n_words, n_pieces, fertility)` — qd31's metric with a trained BPE
    * in place of the fixed wordpiece vocab. Scale shape: the encode
    * runs over the DISTINCT-word table (vocab-sized) once, then the
    * per-doc word stream joins that small table (broadcast — encode
    * cost is per-distinct-word, not per-occurrence) and aggregates.
    *
    * The per-word encode is [[NativeExpressions.BpeCountExpr]] — the
    * merge list rides as a reference object, so plan size and Janino
    * cost are CONSTANT in K, where the literal [[applyMerges]] chain
    * (the original formulation, kept for the spec cross-check) grows
    * the plan linearly and dies at production K. Kernel ≡ chain is
    * BpeSpec-pinned and oracle-pinned (qd68/qd73/qd74 replay the
    * unrolled-CTE oracle against the kernel path verbatim).
    */
  def encodeFertility(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val docWords = df
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    val encoded = docWords.select(col("word")).distinct()
      .select(col("word"),
        NativeExpressions.bpePieceCount(col("word"), merges).as("pieces"))
    docWords.join(broadcast(encoded), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("pieces")).as("n_pieces"))
      .withColumn("fertility",
        round(col("n_pieces").cast("double") /
          greatest(col("n_words"), lit(1L)).cast("double"), 4))
  }

  /** Train-then-encode convenience: learns `numMerges` merges from the
    * corpus and reports per-doc fertility under them (the end-to-end
    * qd68 shape).
    */
  def trainAndEncode(df: DataFrame, idCol: String, textCol: String,
      numMerges: Int): DataFrame = {
    val m = train(df, textCol, numMerges).select("lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    encodeFertility(df, idCol, textCol, m)
  }

  /** The production-vocab end-to-end: [[trainFast]]'s in-memory merge
    * loop + the kernel encode — same output as [[trainAndEncode]]
    * (qd73 replays this composition against the unrolled-CTE oracle),
    * at s/merge and plan cost that survive K = 32k.
    */
  def trainAndEncodeFast(df: DataFrame, idCol: String, textCol: String,
      numMerges: Int, maxDistinctWords: Int = 1 << 22): DataFrame = {
    val m = trainFast(df, textCol, numMerges, maxDistinctWords)
      .select("lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    encodeFertility(df, idCol, textCol, m)
  }

  /** Per-document token-ID stream under a learned merge list — the leg
    * a data loader actually consumes (qd68 reports the fertility
    * METRIC; training consumes token IDS): one row per subword piece,
    * `(id, pos, piece, token_id)` with `pos` the 0-based position in
    * the doc's piece stream. Vocabulary ids follow the canonical BPE
    * vocab-file layout: the corpus's seed characters first (UTF-8
    * binary order, ids 0..C−1), then the merged tokens in RANK order
    * (ids C..C+K−1); if two merges spell the same string the FIRST id
    * wins (MIN — deterministic; rank-1 semantics). A piece outside the
    * vocabulary (only possible for text foreign to the training
    * corpus) gets id −1, the explicit UNK the caller must handle.
    *
    * Scale shape: the kernel segments the DISTINCT-word table once
    * (per-word cost), the vocab (chars + K merges) broadcasts, and the
    * only per-occurrence work is the piece explode + one window per
    * doc for positions — the same partition-local shape as qd13/qd24
    * chunking. The vocab-chars count is the one driver action
    * (vocab-sized, the qd31 discipline).
    */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val docWords = df
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol)))
        .as(Seq("__wi", "word")))
      .filter(length(col("word")) > 0)
    val distinctWords = docWords.select("word").distinct()
    val segmented = distinctWords.select(col("word"),
      split(NativeExpressions.bpeSegment(col("word"), merges), " ").as("__pieces"))
    // seed characters of the corpus (code points — the `(.)` unit),
    // ids by UTF-8 binary order; the table is alphabet-sized, so the
    // single-partition window is a constant
    val chars = distinctWords
      .select(explode(split(regexp_replace(col("word"), "(.)", "$1 "),
        " ")).as("piece"))
      .filter(length(col("piece")) > 0).distinct()
    val wChar = Window.orderBy(col("piece"))
    val vocabChars = chars
      .select(col("piece"), (row_number().over(wChar) - 1).as("token_id"))
    val nChars = vocabChars.count().toInt // vocab-sized driver action
    val vocabMerges = merges.zipWithIndex
      .map { case ((l, r), i) => (l + r, nChars + i) }
      .toDF("piece", "token_id")
    val vocab = vocabChars.unionByName(vocabMerges)
      .groupBy(col("piece")).agg(min(col("token_id")).as("token_id"))
    val wPos = Window.partitionBy(col(idCol)).orderBy(col("__wi"), col("__pi"))
    docWords.join(broadcast(segmented), "word")
      .select(col(idCol), col("__wi"),
        posexplode(col("__pieces")).as(Seq("__pi", "piece")))
      .join(broadcast(vocab), Seq("piece"), "left")
      .withColumn("token_id",
        coalesce(col("token_id"), lit(-1)).cast("int"))
      .withColumn("pos", (row_number().over(wPos) - 1).cast("int"))
      .select(col(idCol), col("pos"), col("piece"), col("token_id"))
  }

  /** The qd67/qd68 oracle SQL: the training loop unrolled to
    * `numMerges` DuckDB CTE iterations (pair counts from positional
    * list indexing, argmax with the count-desc/lexicographic tie
    * break, `replace`-applied merge). `finalSelect` chooses the output
    * leg: the ranked merge table (qd67) or the per-doc fertility join
    * (qd68).
    */
  def oracleCtes(numMerges: Int): String = {
    val b = new StringBuilder
    b ++= """toks0 AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
      |         '  ' || regexp_replace(word, '(.)', '\1  ', 'g') AS toks
      |  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents)
      |  WHERE len(word) > 0 GROUP BY word)""".stripMargin
    for (i <- 0 until numMerges) {
      b ++= s""",
      |p$i AS (
      |  SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
      |    SELECT freq, lst[i] AS l, lst[i+1] AS r FROM (
      |      SELECT freq, lst, unnest(range(1, len(lst))) AS i FROM
      |        (SELECT freq, str_split(trim(toks), '  ') AS lst FROM toks$i)))
      |  GROUP BY l, r),
      |m$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
      |toks${i + 1} AS (
      |  SELECT word, freq,
      |         replace(toks, ' ' || m.l || '  ' || m.r || ' ', ' ' || m.l || m.r || ' ') AS toks
      |  FROM toks$i, m$i m)""".stripMargin
    }
    b.result()
  }

  /** qd67's oracle: the ranked merge table. */
  def trainOracleSql(numMerges: Int): String = {
    val union = (0 until numMerges).map(i =>
      s"SELECT CAST(${i + 1} AS BIGINT) AS rank, l AS lhs, r AS rhs, l || r AS merged, cnt FROM m$i"
    ).mkString("\nUNION ALL ")
    s"WITH ${oracleCtes(numMerges)}\nSELECT * FROM (\n$union\n) ORDER BY rank"
  }

  /** qd76's oracle: the token-ID stream — seed-char ids by binary
    * order, merge ids by rank, MIN on spelling collisions, per-doc
    * positions from the (word, piece) positional walk.
    */
  def encodeIdsOracleSql(numMerges: Int): String = {
    val mm = (0 until numMerges).map(i =>
      s"SELECT ${i + 1} AS rank, l, r FROM m$i").mkString("\nUNION ALL ")
    s"""WITH ${oracleCtes(numMerges)},
      |wchars AS (
      |  SELECT DISTINCT substr(word, i, 1) AS piece FROM
      |    (SELECT word, unnest(range(1, len(word)+1)) AS i FROM toks0)),
      |vchars AS (SELECT piece,
      |    CAST(ROW_NUMBER() OVER (ORDER BY piece) - 1 AS INTEGER) AS token_id
      |  FROM wchars),
      |nch AS (SELECT CAST(COUNT(*) AS INTEGER) AS c FROM vchars),
      |mm AS ($mm),
      |vmerges AS (SELECT l || r AS piece,
      |    CAST((SELECT c FROM nch) + rank - 1 AS INTEGER) AS token_id
      |  FROM mm),
      |vocab AS (SELECT piece, CAST(MIN(token_id) AS INTEGER) AS token_id FROM
      |    (SELECT * FROM vchars UNION ALL SELECT * FROM vmerges)
      |  GROUP BY piece),
      |docw AS (
      |  SELECT doc_id, i AS wi, lst[i] AS word FROM (
      |    SELECT doc_id, lst, unnest(range(1, len(lst)+1)) AS i FROM
      |      (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS lst
      |       FROM documents))
      |  WHERE len(lst[i]) > 0),
      |wp AS (
      |  SELECT word, pl[j] AS piece, j AS pi FROM (
      |    SELECT word, pl, unnest(range(1, len(pl)+1)) AS j FROM
      |      (SELECT word, str_split(trim(toks), '  ') AS pl FROM toks$numMerges))),
      |tok AS (SELECT d.doc_id, d.wi, w.pi, w.piece
      |        FROM docw d JOIN wp w USING (word))
      |SELECT doc_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY wi, pi) - 1
      |    AS INTEGER) AS pos,
      |  piece, v.token_id
      |FROM tok JOIN vocab v USING (piece)
      |ORDER BY doc_id, pos""".stripMargin
  }

  /** qd68's oracle: per-doc fertility under the learned merges. */
  def encodeOracleSql(numMerges: Int): String =
    s"""WITH ${oracleCtes(numMerges)},
      |enc AS (SELECT word, CAST(len(str_split(trim(toks), '  ')) AS BIGINT) AS pieces
      |        FROM toks$numMerges),
      |docw AS (
      |  SELECT doc_id, word FROM (
      |    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
      |    FROM documents)
      |  WHERE len(word) > 0),
      |agg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
      |         CAST(SUM(pieces) AS BIGINT) AS n_pieces
      |  FROM docw JOIN enc USING (word) GROUP BY doc_id)
      |SELECT doc_id, n_words, n_pieces,
      |  ROUND(CAST(n_pieces AS DOUBLE) / GREATEST(n_words, 1), 4) AS fertility
      |FROM agg ORDER BY doc_id""".stripMargin
}
