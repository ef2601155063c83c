package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.Classifier

/** Streaming classifier-score drift monitor — the model-based sibling
  * of [[QualityDrift]] (rule-gate keep-rates) and the deployment leg of
  * the qd79-trained quality classifier: per source, each micro-batch's
  * mean score under a FROZEN weight vector, with an edge-triggered
  * alert when a batch's mean drops below the training-time baseline by
  * more than `tolFrac`. Score SAG is the "the crawl stopped looking
  * like what the filter was calibrated on" signal — a domain takeover,
  * a template flood, or an upstream extraction bug moves the score
  * distribution long before absolute volume monitors notice, and every
  * decision the deployed filter makes at the stale operating point is
  * wrong in bulk.
  *
  * The model rides the plan as [[Classifier.narrowScore]]'s array
  * literal — scoring is a pure codegen'd projection, NO per-doc
  * shuffle, no stream-side vocabulary state (the FertilityDrift kernel
  * discipline). Per-batch partials are exact scaled integers (6-dp
  * scores × 10^6), so the report's mean is partition-order-free. The
  * only shuffle is the keyed `transformWithState` on the source; state
  * is one latch per source; report volume = sources per batch.
  */
object ScoreDrift {

  /** One row per (source, batch): doc volume, 6-dp batch mean score,
    * and whether THIS batch crossed into drift (edge-triggered, latched
    * while drifted, re-armed on recovery — the QualityDrift alert
    * discipline).
    */
  case class ScoreReport(source: String, batch_docs: Long,
      mean_score: Double, alert: Boolean)

  /** Per-source latch. */
  case class SState(alerted: Boolean)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Per-source latch + threshold evaluation over (docs, score6-sum)
    * batch partials. Drift is DOWNWARD (mean below baseline·(1−tol)) —
    * quality sags, unlike fertility which creeps up.
    */
  class ScoreProcessor(baseline: Double, tolFrac: Double, minDocs: Long)
      extends StatefulProcessor[String, (String, Long, Long), ScoreReport] {
    @transient private var state: ValueState[SState] = _
    private val threshold = baseline * (1.0 - tolFrac)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SState](
        "s", Encoders.product[SState], TTLConfig.NONE)

    override def handleInputRows(source: String,
        rows: Iterator[(String, Long, Long)],
        timerValues: TimerValues): Iterator[ScoreReport] = {
      var docs = 0L
      var s6 = 0L
      rows.foreach { case (_, d, s) => docs += d; s6 += s }
      val mean = if (docs == 0L) 0.0 else s6.toDouble / 1e6 / docs
      val prev = if (state.exists()) state.get() else SState(alerted = false)
      // a sub-minDocs trickle can neither fire nor re-arm the latch
      val qualifies = docs >= minDocs
      val drifted = qualifies && mean < threshold
      val fire = drifted && !prev.alerted
      state.update(SState(if (qualifies) drifted else prev.alerted))
      Iterator.single(ScoreReport(source, docs, r6(mean), fire))
    }
  }

  /** Monitor a raw document stream: per doc one narrow score under the
    * frozen `weights` (qd79's training artifact), folded per source per
    * batch in keyed state against `baseline` (the training-time mean
    * score — take it from the batch scorer over the training slice).
    */
  def scoreDriftStream(docs: DataFrame, sourceCol: String, textCol: String,
      weights: Seq[(Int, BigDecimal)], dim: Int, baseline: Double,
      tolFrac: Double = 0.15, minDocs: Long = 10L): Dataset[ScoreReport] = {
    require(baseline > 0.0, s"baseline score must be positive, got $baseline")
    require(tolFrac >= 0.0 && tolFrac < 1.0, s"tolFrac must be in [0,1), got $tolFrac")
    val spark = docs.sparkSession
    import spark.implicits._
    // null text scores through the empty-token path (bias-only margin)
    // — nothing null may reach the processor (the TokenDrift rule)
    val score6 = (Classifier.narrowScore(coalesce(col(textCol), lit("")),
      weights, dim) * lit(1000000L)).cast("long")
    docs.select(col(sourceCol).cast("string").as("__s"),
        lit(1L).as("__d"), score6.as("__p"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new ScoreProcessor(baseline, tolFrac, minDocs),
        TimeMode.None(), OutputMode.Update())
  }
}
