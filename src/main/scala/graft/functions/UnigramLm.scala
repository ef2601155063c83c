package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer training via Viterbi hard-EM (Kudo
  * 2018, "Subword Regularization" — the unigram model SentencePiece
  * implements), completing the tokenizer-training family beside
  * [[Bpe]]: BPE learns merges bottom-up, the unigram model starts from
  * a large seed vocabulary and re-estimates piece probabilities from
  * its own best segmentations.
  *
  * Deterministic simplified variant (every step engine-portable, so
  * the WHOLE trainer replays as unrolled DuckDB CTEs — the qd67
  * discipline applied to an EM loop):
  *  - seed vocabulary: all substrings of length ≤ `maxPieceLen`
  *    counted over the word-frequency table (overlap-counting ×
  *    word freq), top `topM` by (count desc, piece asc), UNION all
  *    single characters (coverage guarantee);
  *  - scores: scaled-integer log-probs — ln(cnt) and ln(total) each
  *    rounded to 6 dp (BigDecimal HALF_UP, the qd29 discipline) and
  *    scaled by 10⁶, so Viterbi sums are exact longs on both engines;
  *  - `iters` hard-EM rounds: Viterbi-segment every distinct word
  *    ([[NativeExpressions.UnigramViterbiExpr]] — max score, ties →
  *    fewer pieces → lexicographically smallest segmentation), recount
  *    pieces over the segmentations (× word freq), keep-alive floor of
  *    1 for single chars (coverage), drop multi-char pieces that won
  *    zero segmentations (hard pruning — the EM analogue of
  *    SentencePiece's iterative shrink);
  *  - output: the final `(piece, cnt, logprob)` model table.
  *
  * Scale shape (same as [[Bpe]]): ONE corpus pass builds the
  * word-frequency table; everything after runs over that vocab-sized
  * cached table — the seed explode is O(word_len × maxPieceLen) rows
  * per DISTINCT word, each EM round is one narrow Viterbi map + one
  * grouped count, and the model (vocab-sized, like IVF centroids)
  * rides the plan as expression literals. Nothing per-iteration
  * touches the corpus.
  */
object UnigramLm {

  /** ln rounded to 6 dp (BigDecimal HALF_UP — matches Spark `round`
    * and DuckDB `ROUND` on this range), scaled to an exact integer.
    */
  private[functions] def scaled6Ln(x: Long): Long =
    java.math.BigDecimal.valueOf(math.log(x.toDouble))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact

  /** Scaled-integer log-prob scores for a vocabulary: s(piece) =
    * scaled6Ln(cnt) − scaled6Ln(Σ cnt).
    */
  def scores(vocab: Seq[(String, Long)]): Seq[(String, Long)] = {
    val st = scaled6Ln(vocab.map(_._2).sum)
    vocab.map { case (p, c) => (p, scaled6Ln(c) - st) }
  }

  /** `(word, freq)` table — one corpus pass, grouped count with
    * map-side partials.
    */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Seed vocabulary over a word table: top `topM` substrings of
    * length ≤ `maxPieceLen` by (count desc, piece asc) plus every
    * single character. The double explode is positional (i, l) over
    * the DISTINCT-word table — vocab-sized × O(len × maxPieceLen)
    * rows, corpus-size-independent.
    */
  def seedVocab(words: DataFrame, maxPieceLen: Int, topM: Int): Seq[(String, Long)] = {
    require(maxPieceLen >= 1 && topM >= 1)
    val subs = words
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("freq"), col("i"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .filter(col("i") + col("l") - 1 <= length(col("word")))
      .select(col("word").substr(col("i"), col("l")).as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("cnt"))
    val top = subs.orderBy(col("cnt").desc, col("piece")).limit(topM)
    top.unionByName(subs.filter(length(col("piece")) === 1)).distinct()
      .orderBy(col("cnt").desc, col("piece"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** The hard-EM training loop — returns the final vocabulary with its
    * Viterbi counts. The per-iteration collect is the model (vocab-
    * sized — the qd31/IVF-centroid discipline), never corpus data.
    */
  def trainVocab(df: DataFrame, textCol: String, maxPieceLen: Int,
      topM: Int, iters: Int): Seq[(String, Long)] = {
    require(iters >= 1)
    val words = wordFreqs(df, textCol).localCheckpoint()
    var vocab = seedVocab(words, maxPieceLen, topM)
    for (_ <- 1 to iters) {
      val sc = scores(vocab)
      val counts = words
        .select(col("freq"),
          explode(split(NativeExpressions.unigramViterbi(col("word"), sc), " "))
            .as("piece"))
        .groupBy("piece").agg(sum(col("freq")).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      vocab = vocab.flatMap { case (p, _) =>
        val c = counts.getOrElse(p, 0L)
        if (p.length == 1) Some((p, math.max(c, 1L)))
        else if (c > 0L) Some((p, c))
        else None
      }
    }
    vocab
  }

  /** The qd69 surface: the trained model as `(piece, cnt, logprob)`,
    * logprob = (scaled6Ln(cnt) − scaled6Ln(total)) / 10⁶ — an exact
    * integer quotient by a power of ten, bit-identical across engines.
    */
  def train(df: DataFrame, textCol: String, maxPieceLen: Int,
      topM: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = trainVocab(df, textCol, maxPieceLen, topM, iters)
    val st = scaled6Ln(vocab.map(_._2).sum)
    vocab.map { case (p, c) => (p, c, (scaled6Ln(c) - st) / 1e6) }
      .toDF("piece", "cnt", "logprob")
      .orderBy(col("cnt").desc, col("piece"))
  }

  /** Per-doc fertility under a trained vocabulary — qd68's shape with
    * the unigram Viterbi in place of BPE merges: segment the
    * DISTINCT-word table once (per-word, not per-occurrence cost),
    * broadcast-join piece counts back to the doc word stream.
    */
  def fertility(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Long)]): DataFrame = {
    val sc = scores(vocab)
    val docWords = df
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    val enc = docWords.select("word").distinct()
      .select(col("word"),
        size(split(NativeExpressions.unigramViterbi(col("word"), sc), " "))
          .cast("long").as("pieces"))
    docWords.join(broadcast(enc), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("pieces")).as("n_pieces"))
      .withColumn("fertility",
        round(col("n_pieces").cast("double") /
          greatest(col("n_words"), lit(1L)).cast("double"), 4))
  }

  /** Train-then-segment convenience (the qd70 shape). */
  def trainAndFertility(df: DataFrame, idCol: String, textCol: String,
      maxPieceLen: Int, topM: Int, iters: Int): DataFrame =
    fertility(df, idCol, textCol,
      trainVocab(df, textCol, maxPieceLen, topM, iters))

  /** Per-document token-ID stream under a trained model —
    * [[graft.functions.Bpe.encodeIds]]'s unigram twin (the loader-facing
    * leg: qd70 reports the fertility METRIC, a trainer consumes IDS):
    * one row per piece, `(id, pos, piece, token_id)`, ids in the
    * SentencePiece vocab-file order — (count desc, piece ascending in
    * UTF-8 binary), exactly qd69's published model order, so the id of
    * a piece is its row number in the qd69 output. A Viterbi
    * char-fallback piece outside the vocabulary (foreign text only —
    * the trainer's keep-alive floor covers every training-corpus
    * character) gets the explicit −1 UNK.
    *
    * Scale shape: the Viterbi kernel segments the DISTINCT-word table
    * once, the model-sized vocab broadcasts, and the per-occurrence
    * work is the piece explode + one per-doc position window — the
    * qd76 shape with the DP kernel in place of the merge kernel.
    */
  def encodeIds(df: DataFrame, idCol: String, textCol: String,
      vocab: Seq[(String, Long)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sc = scores(vocab)
    val docWords = df
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol)))
        .as(Seq("__wi", "word")))
      .filter(length(col("word")) > 0)
    val segmented = docWords.select("word").distinct()
      .select(col("word"),
        split(NativeExpressions.unigramViterbi(col("word"), sc), " ")
          .as("__pieces"))
    // (cnt desc, piece UTF-8-binary asc) — Java String.compareTo is
    // UTF-16 order, so the tie goes through the binary comparator
    val ordered = vocab.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && Bpe.utf8Cmp(a._1, b._1) < 0)
    }
    val vocabDf = ordered.zipWithIndex
      .map { case ((p, _), i) => (p, i) }
      .toDF("piece", "token_id")
    val wPos = Window.partitionBy(col(idCol)).orderBy(col("__wi"), col("__pi"))
    docWords.join(broadcast(segmented), "word")
      .select(col(idCol), col("__wi"),
        posexplode(col("__pieces")).as(Seq("__pi", "piece")))
      .join(broadcast(vocabDf), Seq("piece"), "left")
      .withColumn("token_id",
        coalesce(col("token_id"), lit(-1)).cast("int"))
      .withColumn("pos", (row_number().over(wPos) - 1).cast("int"))
      .select(col(idCol), col("pos"), col("piece"), col("token_id"))
  }

  // ------------------------------------------------------------ oracle

  /** Shared CTE prefix: word table, seed vocabulary `v0`, then per
    * EM-iteration score/enumerate/argmax/recount CTEs up to `v{iters}`.
    * The Viterbi is replayed by ENUMERATING every segmentation of each
    * word (recursive CTE) and ranking with the kernel's exact order
    * (scaled score desc, piece count asc, segmentation asc) — an
    * all-paths proof, not a DP reimplementation. NOTE the `SELECT
    * DISTINCT` in v0: under `WITH RECURSIVE`, DuckDB does not
    * de-duplicate a plain `UNION` inside a non-recursive CTE.
    */
  private def oracleCtes(maxPieceLen: Int, topM: Int, iters: Int): String = {
    val b = new StringBuilder
    b ++= s"""wt AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word FROM documents)
      |  WHERE len(word) > 0 GROUP BY word),
      |subs AS (
      |  SELECT substr(word, i, l) AS piece, CAST(SUM(freq) AS BIGINT) AS cnt
      |  FROM (SELECT word, freq, unnest(range(1, len(word)+1)) AS i FROM wt),
      |       (SELECT unnest(range(1, $maxPieceLen+1)) AS l)
      |  WHERE i + l - 1 <= len(word) GROUP BY piece),
      |topm AS (SELECT piece, cnt FROM subs ORDER BY cnt DESC, piece LIMIT $topM),
      |v0 AS (SELECT DISTINCT piece, cnt FROM (
      |  SELECT piece, cnt FROM topm
      |  UNION ALL SELECT piece, cnt FROM subs WHERE len(piece) = 1))""".stripMargin
    for (i <- 0 until iters) {
      b ++= s""",
      |${scoreCte(i)},
      |${viterbiCtes(i)},
      |cnt$i AS (
      |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS c
      |  FROM (SELECT freq, unnest(str_split(seg, ' ')) AS piece FROM best$i)
      |  GROUP BY piece),
      |v${i + 1} AS (
      |  SELECT v.piece,
      |    CASE WHEN len(v.piece) = 1 THEN GREATEST(COALESCE(c.c, 0), 1)
      |         ELSE COALESCE(c.c, 0) END AS cnt
      |  FROM v$i v LEFT JOIN cnt$i c USING (piece)
      |  WHERE NOT (len(v.piece) > 1 AND COALESCE(c.c, 0) = 0))""".stripMargin
    }
    b.result()
  }

  private def scoreCte(i: Int): String =
    s"""s$i AS (
      |  SELECT piece,
      |    CAST(ROUND(ROUND(ln(cnt), 6) * 1000000) AS BIGINT)
      |      - (SELECT CAST(ROUND(ROUND(ln(SUM(cnt)), 6) * 1000000) AS BIGINT) FROM v$i) AS sc
      |  FROM v$i)""".stripMargin

  private def viterbiCtes(i: Int): String =
    s"""walk$i(word, freq, pos, seg, sc, np) AS (
      |  SELECT word, freq, 1, '', CAST(0 AS BIGINT), 0 FROM wt
      |  UNION ALL
      |  SELECT w.word, w.freq, w.pos + len(s.piece),
      |         CASE WHEN w.seg = '' THEN s.piece ELSE w.seg || ' ' || s.piece END,
      |         w.sc + s.sc, w.np + 1
      |  FROM walk$i w JOIN s$i s
      |    ON s.piece = substr(w.word, w.pos, len(s.piece))
      |  WHERE w.pos <= len(w.word) AND len(s.piece) <= len(w.word) - w.pos + 1),
      |best$i AS (
      |  SELECT word, freq, seg FROM (
      |    SELECT word, freq, seg,
      |      ROW_NUMBER() OVER (PARTITION BY word ORDER BY sc DESC, np ASC, seg ASC) AS rn
      |    FROM walk$i WHERE pos = len(word) + 1)
      |  WHERE rn = 1)""".stripMargin

  /** qd69's oracle: the final model table. */
  def trainOracleSql(maxPieceLen: Int, topM: Int, iters: Int): String =
    s"""WITH RECURSIVE ${oracleCtes(maxPieceLen, topM, iters)},
      |tot AS (SELECT CAST(ROUND(ROUND(ln(SUM(cnt)), 6) * 1000000) AS BIGINT) AS st
      |        FROM v$iters)
      |SELECT piece, cnt,
      |  (CAST(ROUND(ROUND(ln(cnt), 6) * 1000000) AS BIGINT) - (SELECT st FROM tot)) / 1e6
      |    AS logprob
      |FROM v$iters ORDER BY cnt DESC, piece""".stripMargin

  /** qd77's oracle: the token-ID stream — ids are row numbers of the
    * final model in (cnt desc, piece) order (qd69's published order),
    * pieces from the all-paths best segmentations, per-doc positions
    * from the positional (word, piece) walk.
    */
  def encodeIdsOracleSql(maxPieceLen: Int, topM: Int, iters: Int): String =
    s"""WITH RECURSIVE ${oracleCtes(maxPieceLen, topM, iters)},
      |${scoreCte(iters)},
      |${viterbiCtes(iters)},
      |vocab AS (SELECT piece,
      |    CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, piece) - 1 AS INTEGER) AS token_id
      |  FROM v$iters),
      |docw AS (
      |  SELECT doc_id, i AS wi, lst[i] AS word FROM (
      |    SELECT doc_id, lst, unnest(range(1, len(lst)+1)) AS i FROM
      |      (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS lst
      |       FROM documents))
      |  WHERE len(lst[i]) > 0),
      |wp AS (
      |  SELECT word, pl[j] AS piece, j AS pi FROM (
      |    SELECT word, pl, unnest(range(1, len(pl)+1)) AS j FROM
      |      (SELECT word, str_split(seg, ' ') AS pl FROM best$iters)))
      |SELECT d.doc_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY d.doc_id ORDER BY d.wi, w.pi) - 1
      |    AS INTEGER) AS pos,
      |  w.piece, COALESCE(v.token_id, -1) AS token_id
      |FROM docw d JOIN wp w USING (word)
      |LEFT JOIN vocab v USING (piece)
      |ORDER BY d.doc_id, pos""".stripMargin

  /** qd70's oracle: per-doc fertility under the final model — one more
    * all-paths Viterbi under `s$iters`, piece counts per word, doc join.
    */
  def fertilityOracleSql(maxPieceLen: Int, topM: Int, iters: Int): String =
    s"""WITH RECURSIVE ${oracleCtes(maxPieceLen, topM, iters)},
      |${scoreCte(iters)},
      |${viterbiCtes(iters)},
      |enc AS (SELECT word, CAST(len(str_split(seg, ' ')) AS BIGINT) AS pieces
      |        FROM best$iters),
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
