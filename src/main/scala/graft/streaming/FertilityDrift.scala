package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.TextAnalysis

/** Streaming tokenizer-FERTILITY drift monitor — the fifth monitor
  * axis beside [[TokenStats]] (vocabulary volume), [[QualityDrift]]
  * (gate keep-rates), [[TokenDrift]] (distribution KL) and
  * [[CentroidDrift]] (embedding space), and the streaming leg of the
  * tokenizer-training family (qd67/qd68 BPE, qd69/qd70 unigram): per
  * source, each micro-batch's mean fertility — subword pieces per
  * whitespace word — under a FROZEN merge list, with an edge-triggered
  * alert when a batch exceeds the training-time baseline by
  * `tolFrac`. Fertility creep is the "this corpus is drifting away
  * from the tokenizer it will be trained with" signal: new domains,
  * languages, or template takeovers segment into more pieces per word
  * long before quality gates or volume monitors flinch, and every
  * extra piece is paid at training time in sequence length.
  *
  * The model rides the plan as a reference object (the qd68 kernel
  * discipline): the per-word piece count is
  * [[graft.functions.NativeExpressions.BpeCountExpr]] — the exact
  * replay of [[graft.functions.Bpe.applyMerges]]'s chain, at plan size
  * constant in the merge count — applied inside a `transform` lambda:
  * a pure narrow projection, codegen'd, no vocabulary state on the
  * stream side. The only shuffle is the keyed `transformWithState` on
  * the source; state is one latch per source; report volume = sources
  * per batch.
  */
object FertilityDrift {

  /** One row per (source, batch): word volume, 6-dp batch fertility,
    * and whether THIS batch crossed into drift (edge-triggered,
    * latched while drifted, re-armed on recovery — the
    * [[QualityDrift]]/[[TokenDrift]] alert discipline).
    */
  case class FertilityReport(source: String, batch_words: Long,
      fertility: Double, alert: Boolean)

  /** Per-source latch. */
  case class FState(alerted: Boolean)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Per-source latch + threshold evaluation over (words, pieces)
    * batch partials.
    */
  class FertilityProcessor(baseline: Double, tolFrac: Double, minWords: Long)
      extends StatefulProcessor[String, (String, Long, Long), FertilityReport] {
    @transient private var state: ValueState[FState] = _
    private val threshold = baseline * (1.0 + tolFrac)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FState](
        "f", Encoders.product[FState], TTLConfig.NONE)

    override def handleInputRows(source: String,
        rows: Iterator[(String, Long, Long)],
        timerValues: TimerValues): Iterator[FertilityReport] = {
      var words = 0L
      var pieces = 0L
      rows.foreach { case (_, w, p) => words += w; pieces += p }
      val fertility = if (words == 0L) 0.0 else pieces.toDouble / words
      val prev = if (state.exists()) state.get() else FState(alerted = false)
      // a sub-minWords trickle can neither fire nor re-arm the latch
      val qualifies = words >= minWords
      val drifted = qualifies && fertility > threshold
      val fire = drifted && !prev.alerted
      state.update(FState(if (qualifies) drifted else prev.alerted))
      Iterator.single(FertilityReport(source, words, r6(fertility), fire))
    }
  }

  /** Per-word BPE piece count as a pure column:
    * [[graft.functions.NativeExpressions.BpeCountExpr]] — the merge
    * list rides as a reference object, so the expression tree (and
    * Janino's method size) is CONSTANT in the merge count. The
    * original formulation folded one nested `replace()` per merge
    * inside the `transform` lambda, growing the tree linearly in K —
    * fine at the spec's K=3, fatal at a production-scale frozen list
    * (ADVICE r17; kernel ≡ chain is BpeSpec-pinned).
    */
  private def pieceCount(word: org.apache.spark.sql.Column,
      merges: Seq[(String, String)]): org.apache.spark.sql.Column =
    graft.functions.NativeExpressions.bpePieceCount(word, merges)

  /** Monitor a raw document stream: per doc, words + pieces under the
    * frozen `merges` (narrow projection), folded per source per batch
    * in keyed state against `baseline` (the training-time fertility —
    * take it from [[graft.functions.Bpe.encodeFertility]] over the
    * training slice).
    */
  def fertilityDriftStream(docs: DataFrame, sourceCol: String,
      textCol: String, merges: Seq[(String, String)], baseline: Double,
      tolFrac: Double = 0.25, minWords: Long = 50L): Dataset[FertilityReport] =
    fertilityDriftStreamWith(docs, sourceCol, textCol,
      w => pieceCount(w, merges), baseline, tolFrac, minWords)

  /** The unigram-LM twin (round-17 verdict #4 — the monitor froze only
    * the BPE family while qd69/qd70 train unigram models): identical
    * latch/threshold walk, with the per-word piece count from
    * [[graft.functions.NativeExpressions.UnigramViterbiExpr]] under the
    * frozen `vocab` — the (piece, cnt) model table qd69 emits; scores
    * are derived here exactly as [[graft.functions.UnigramLm.fertility]]
    * does, so the training-time baseline and the stream-side metric are
    * the same arithmetic. The model rides the expression as scaled-
    * integer literals; foreign-domain words segment through the
    * char-fallback (more pieces), which is precisely the drift signal.
    */
  def unigramFertilityDriftStream(docs: DataFrame, sourceCol: String,
      textCol: String, vocab: Seq[(String, Long)], baseline: Double,
      tolFrac: Double = 0.25, minWords: Long = 50L): Dataset[FertilityReport] = {
    val sc = graft.functions.UnigramLm.scores(vocab)
    fertilityDriftStreamWith(docs, sourceCol, textCol,
      w => size(split(graft.functions.NativeExpressions.unigramViterbi(w, sc),
        " ")).cast("long"),
      baseline, tolFrac, minWords)
  }

  /** Shared stream body, parameterized over the per-word piece-count
    * column (any frozen tokenizer family plugs in here — both counts
    * are reference-object kernels, so the plan stays constant-size in
    * the model).
    */
  private def fertilityDriftStreamWith(docs: DataFrame, sourceCol: String,
      textCol: String,
      pieceCountOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      baseline: Double, tolFrac: Double,
      minWords: Long): Dataset[FertilityReport] = {
    require(baseline > 0.0, s"baseline fertility must be positive, got $baseline")
    require(tolFrac >= 0.0, s"tolFrac must be non-negative, got $tolFrac")
    val spark = docs.sparkSession
    import spark.implicits._
    // null text → zero words/pieces (the TokenDrift null-safety rule:
    // nothing null may reach the processor)
    val words = coalesce(
      filter(TextAnalysis.tokens(col(textCol)), w => length(w) > 0),
      array().cast("array<string>"))
    docs.select(col(sourceCol).cast("string").as("__s"),
        size(words).cast("long").as("__w"),
        coalesce(aggregate(
          transform(words, w => pieceCountOf(w)),
          lit(0L), (acc, p) => acc + p), lit(0L)).as("__p"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new FertilityProcessor(baseline, tolFrac, minWords),
        TimeMode.None(), OutputMode.Update())
  }
}
