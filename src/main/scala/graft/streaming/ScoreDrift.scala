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
    * whether THIS batch crossed into drift (edge-triggered, latched
    * while drifted, re-armed on recovery — the QualityDrift alert
    * discipline), and the drift DIRECTION ("low" = quality sag, "high"
    * = quality inflation, "" = in band). Direction is part of the
    * latch: a flood that swings low→high without recovering re-fires —
    * the operator action differs (extraction bug vs boilerplate flood).
    */
  case class ScoreReport(source: String, batch_docs: Long,
      mean_score: Double, alert: Boolean, direction: String)

  /** Per-source latch: the direction currently latched ("" = quiet). */
  case class SState(dir: String)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Per-source latch + band evaluation over (docs, score6-sum) batch
    * partials. Drift is TWO-SIDED: a sag (mean < baseline·(1−tolLow))
    * means the crawl stopped looking like what the filter was
    * calibrated on; a surge (mean > baseline·(1+tolHigh)) is quality
    * inflation — an upstream filter change or a flood of high-scoring
    * boilerplate is as actionable as a sag (round-18 verdict: the
    * one-sided monitor was blind to it).
    */
  class ScoreProcessor(baseline: Double, tolLowFrac: Double,
      tolHighFrac: Double, minDocs: Long)
      extends StatefulProcessor[String, (String, Long, Long), ScoreReport] {
    @transient private var state: ValueState[SState] = _
    private val lo = baseline * (1.0 - tolLowFrac)
    private val hi = baseline * (1.0 + tolHighFrac)

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
      val prev = if (state.exists()) state.get() else SState("")
      // a sub-minDocs trickle can neither fire nor re-arm the latch
      val qualifies = docs >= minDocs
      val dir =
        if (!qualifies) prev.dir
        else if (mean < lo) "low"
        else if (mean > hi) "high"
        else ""
      // edge-triggered on ENTERING a drift direction (incl. low↔high
      // flips); latched while the direction holds
      val fire = qualifies && dir.nonEmpty && dir != prev.dir
      state.update(SState(dir))
      Iterator.single(ScoreReport(source, docs, r6(mean), fire, dir))
    }
  }

  /** Monitor a raw document stream: per doc one narrow score under the
    * frozen `weights` (qd79's training artifact), folded per source per
    * batch in keyed state against `baseline` (the training-time mean
    * score — take it from the batch scorer over the training slice).
    */
  def scoreDriftStream(docs: DataFrame, sourceCol: String, textCol: String,
      weights: Seq[(Int, BigDecimal)], dim: Int, baseline: Double,
      tolFrac: Double = 0.15, minDocs: Long = 10L,
      tolHighFrac: Double = Double.NaN): Dataset[ScoreReport] = {
    require(baseline > 0.0, s"baseline score must be positive, got $baseline")
    require(tolFrac >= 0.0 && tolFrac < 1.0, s"tolFrac must be in [0,1), got $tolFrac")
    // symmetric band by default; pass tolHighFrac to widen/narrow the
    // inflation side independently (scores cap at 1, so the high band
    // often wants to be tighter than the sag band)
    val tolHi = if (tolHighFrac.isNaN) tolFrac else tolHighFrac
    require(tolHi >= 0.0, s"tolHighFrac must be >= 0, got $tolHi")
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
      .transformWithState(new ScoreProcessor(baseline, tolFrac, tolHi, minDocs),
        TimeMode.None(), OutputMode.Update())
  }

  // ---- per-source calibration (ECE) drift --------------------------------

  /** One row per (source, batch): volume, the batch's expected
    * calibration error under the frozen model vs the stream's own weak
    * labels, and the edge-triggered alert (ECE above `eceMax`).
    */
  case class CalibReport(source: String, batch_docs: Long,
      ece: Double, alert: Boolean)

  /** Per-source batch ECE in qd82's exact integer-bin discipline:
    * bin = min(⌊score·nBins⌋, nBins−1) over the 6-dp score grid; per
    * bin the mean score and positive rate are integer half-up-divided
    * at 4 dp; ECE = the doc-weighted |conf − acc| sum, half-up at 4 dp.
    * Partition-order-free (all partials are exact integers).
    */
  class CalibProcessor(nBins: Int, eceMax: Double, minDocs: Long)
      extends StatefulProcessor[String, (String, Int, Long, Long), CalibReport] {
    @transient private var state: ValueState[SState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SState](
        "c", Encoders.product[SState], TTLConfig.NONE)

    override def handleInputRows(source: String,
        rows: Iterator[(String, Int, Long, Long)],
        timerValues: TimerValues): Iterator[CalibReport] = {
      val n = new Array[Long](nBins)
      val s6 = new Array[Long](nBins)
      val pos = new Array[Long](nBins)
      rows.foreach { case (_, b, s, p) => n(b) += 1L; s6(b) += s; pos(b) += p }
      val docs = n.sum
      var w4 = 0L
      var b = 0
      while (b < nBins) {
        if (n(b) > 0L) {
          val m4 = (2L * s6(b) + n(b) * 100L) / (2L * n(b) * 100L)
          val f4 = (2L * pos(b) * 10000L + n(b)) / (2L * n(b))
          w4 += n(b) * math.abs(f4 - m4)
        }
        b += 1
      }
      val ece =
        if (docs == 0L) 0.0
        else ((2L * w4 + docs) / (2L * docs)).toDouble / 10000.0
      val prev = if (state.exists()) state.get() else SState("")
      val qualifies = docs >= minDocs
      val dir = if (!qualifies) prev.dir else if (ece > eceMax) "high" else ""
      val fire = qualifies && dir.nonEmpty && dir != prev.dir
      state.update(SState(dir))
      Iterator.single(CalibReport(source, docs, ece, fire))
    }
  }

  /** Monitor per-source CALIBRATION of the frozen model against the
    * stream's weak labels (`labelCol` — e.g. the rule gate's keep bit):
    * a source whose batch ECE exceeds `eceMax` has drifted away from
    * the score→quality mapping the operating threshold was picked on,
    * even if its MEAN score still sits in band — the failure mode
    * [[scoreDriftStream]] cannot see (round-18 verdict's per-source
    * calibration-drift leg). Same latch contract: edge-triggered,
    * latched while drifted, re-armed on a qualifying in-band batch;
    * sub-`minDocs` trickles neither fire nor re-arm.
    */
  def calibrationDriftStream(docs: DataFrame, sourceCol: String,
      textCol: String, labelCol: String, weights: Seq[(Int, BigDecimal)],
      dim: Int, eceMax: Double, nBins: Int = 10,
      minDocs: Long = 10L): Dataset[CalibReport] = {
    require(eceMax > 0.0 && eceMax < 1.0, s"eceMax must be in (0,1), got $eceMax")
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val spark = docs.sparkSession
    import spark.implicits._
    val score6 = (Classifier.narrowScore(coalesce(col(textCol), lit("")),
      weights, dim) * lit(1000000L)).cast("long")
    // qd82's bin rule on the integer grid: score 1.0 clamps to the top
    val bin = least(floor(col("__p") * lit(nBins) / lit(1000000L)),
      lit(nBins - 1L)).cast("int")
    docs.select(col(sourceCol).cast("string").as("__s"), score6.as("__p"),
        when(col(labelCol), 1L).otherwise(0L).as("__y"))
      .select(col("__s"), bin.as("__b"), col("__p"), col("__y"))
      .as[(String, Int, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new CalibProcessor(nBins, eceMax, minDocs),
        TimeMode.None(), OutputMode.Update())
  }
}
