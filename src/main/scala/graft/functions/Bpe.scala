package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * in place of the fixed wordpiece vocab. Scale shape: merges apply
    * to the DISTINCT-word table (vocab-sized) once, then the per-doc
    * word stream joins that small table (broadcast — encode cost is
    * per-distinct-word, not per-occurrence) and aggregates.
    */
  def encodeFertility(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val docWords = df
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    val encoded = applyMerges(
        docWords.select(col("word")).distinct().withColumn("toks",
          concat(lit("  "), regexp_replace(col("word"), "(.)", "$1  "))),
        merges)
      .select(col("word"),
        size(split(trim(col("toks")), "  ")).cast("long").as("pieces"))
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
