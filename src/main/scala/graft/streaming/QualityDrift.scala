package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.{NativeExpressions, TextAnalysis}

/** Streaming corpus-quality drift monitor — the third monitor next to
  * [[TokenStats]] (vocabulary axis) and [[CentroidDrift]] (embedding
  * axis): per source, track the keep-rate of a quality gate across
  * micro-batches and raise an EDGE-TRIGGERED alert when a batch's rate
  * collapses below the source's running rate by more than `tol` — the
  * "this crawl just went bad" signal (a source switching to boilerplate,
  * a scraper starting to emit error pages) that a batch-mode datacard
  * only shows after the damage is ingested.
  *
  * The per-doc gate here is [[keepNarrow]] — the NARROW subset of the
  * Gopher battery (token-count bounds, mean-word-length bounds, stopword
  * ratio; same thresholds and 4-dp rounding as
  * [[TextAnalysis.gopherFilter]], so stream and batch decisions agree on
  * these rules). The repetition rules (top-token share, dup-n-gram) need
  * per-doc grouped aggregations that would make every micro-batch a
  * shuffle; monitoring trades them away — run the full battery in the
  * batch curation pass, monitor the cheap rules live. Callers with their
  * own gate can stream pre-scored (source, keep) rows through
  * [[keepRateStream]] directly.
  *
  * Scale shape: the gate is a pure narrow projection; the only shuffle
  * is the keyed `transformWithState` on the source — O(sources) state
  * ((nDocs, nKeep, alerted) per source, engine-checkpointed), report
  * volume = sources per batch, alert volume = incidents, not stream
  * rate. Rates are 6-dp-rounded so reports are replay-deterministic.
  */
object QualityDrift {

  /** One row per (source, batch): the batch and running keep-rates, and
    * whether THIS batch crossed into degradation (edge-triggered — a
    * persistently bad source alerts once, not every batch, until it
    * recovers above threshold and degrades again).
    */
  case class QualityReport(source: String, batch_docs: Long,
      batch_keep: Long, batch_rate: Double, running_rate: Double,
      alert: Boolean)

  /** Running per-source totals + the degraded latch. */
  case class QState(nDocs: Long, nKeep: Long, alerted: Boolean)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  class KeepRateProcessor(tol: Double, minBatch: Long)
      extends StatefulProcessor[String, (String, Boolean), QualityReport] {
    @transient private var state: ValueState[QState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[QState](
        "q", Encoders.product[QState], TTLConfig.NONE)

    override def handleInputRows(source: String,
        rows: Iterator[(String, Boolean)],
        timerValues: TimerValues): Iterator[QualityReport] = {
      var n = 0L
      var k = 0L
      rows.foreach { case (_, keep) => n += 1; if (keep) k += 1 }
      val prev = if (state.exists()) state.get() else QState(0L, 0L, alerted = false)
      // degradation compares THIS batch against the rate BEFORE it — a
      // bad batch must not soften the baseline it is judged against
      val baseline =
        if (prev.nDocs > 0L) prev.nKeep.toDouble / prev.nDocs else Double.NaN
      val batchRate = if (n > 0L) k.toDouble / n else Double.NaN
      // only a batch big enough to judge can set OR clear the latch — a
      // sub-minBatch trickle mid-incident must not re-arm the alert
      val qualifies = prev.nDocs >= minBatch && n >= minBatch
      val degraded = qualifies && batchRate < baseline - tol
      val fire = degraded && !prev.alerted
      val nextAlerted = if (qualifies) degraded else prev.alerted
      val next = QState(prev.nDocs + n, prev.nKeep + k, nextAlerted)
      state.update(next)
      Iterator.single(QualityReport(source, n, k, r6(batchRate),
        r6(next.nKeep.toDouble / next.nDocs), fire))
    }
  }

  /** The narrow (shuffle-free) subset of the Gopher keep decision —
    * token-count bounds, mean-word-length bounds, stopword-ratio floor —
    * value-identical to the corresponding [[TextAnalysis.gopherFilter]]
    * rules (same 4-dp rounding before comparison).
    */
  def keepNarrow(text: Column, minTokens: Int = 30, maxTokens: Int = 100000,
      minAvgTokenLen: Double = 3.0, maxAvgTokenLen: Double = 10.0,
      minStopwordRatio: Double = 0.02): Column = {
    // Round 20: the QualityStats kernel replaces the HOF forms — the
    // aggregate/filter lambdas were CodegenFallback (one interpreted
    // Expression eval per token, × stopword literals for the ratio)
    // over a materialized token array, measured 1.65×+ slower than even
    // a fused array form at 32 threads (GateProbe). Decision
    // bit-identical: same long stats, same greatest(n,1) double
    // divisions, same 4-dp rounds, null text → null (drop) on both
    // forms — StreamingSpec's keeper sets and the gopherFilter
    // value-identity hold unchanged.
    val qs = NativeExpressions.qualityStats(text, TextAnalysis.EnglishStopwords)
    val n = element_at(qs, 1)
    val nToks = greatest(n, lit(1L)).cast("double")
    val avgLen = round(element_at(qs, 2).cast("double") / nToks, 4)
    val stopRatio = round(element_at(qs, 3).cast("double") / nToks, 4)
    n >= minTokens && n <= maxTokens &&
      avgLen >= minAvgTokenLen && avgLen <= maxAvgTokenLen &&
      stopRatio >= minStopwordRatio
  }

  /** Monitor a pre-scored stream of (source, keep) decisions. A NULL
    * decision (e.g. [[keepNarrow]] over a null-text doc) counts as a
    * DROP: the tuple encoder's Boolean is non-nullable, so without the
    * coalesce one null-text doc would kill the monitor query (the
    * TokenDrift null-text fix, applied to this axis) — and a doc that
    * cannot be scored would never pass a real gate anyway.
    */
  def keepRateStream(scored: DataFrame, sourceCol: String, keepCol: String,
      tol: Double = 0.2, minBatch: Long = 5L): Dataset[QualityReport] = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.select(col(sourceCol).cast("string"),
        coalesce(col(keepCol).cast("boolean"), lit(false)))
      .as[(String, Boolean)]
      .groupByKey(_._1)
      .transformWithState(new KeepRateProcessor(tol, minBatch),
        TimeMode.None(), OutputMode.Update())
  }

  /** Monitor a raw document stream: score each doc with [[keepNarrow]]
    * (narrow — no per-batch shuffle beyond the keyed state), then track
    * per-source keep-rates.
    */
  def qualityDriftStream(docs: DataFrame, sourceCol: String, textCol: String,
      tol: Double = 0.2, minBatch: Long = 5L): Dataset[QualityReport] =
    keepRateStream(
      docs.select(col(sourceCol).as("__s"),
        keepNarrow(col(textCol)).as("__keep")),
      "__s", "__keep", tol, minBatch)
}
