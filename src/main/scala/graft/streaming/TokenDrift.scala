package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.TextAnalysis

/** Streaming token-DISTRIBUTION drift monitor — the fourth monitor
  * axis beside [[TokenStats]] (vocabulary volume), [[QualityDrift]]
  * (gate keep-rates) and [[CentroidDrift]] (embedding space): per
  * source, the KL divergence of each micro-batch's hashed-bucket
  * unigram distribution against a FROZEN reference histogram, with an
  * edge-triggered alert when a batch diverges past `klThreshold`. This
  * is the "the distribution shifted even though the quality gates still
  * pass" signal — a source silently switching language, template, or
  * topic mix produces near-identical keep-rates and token counts but a
  * large KL step, and a training-data team wants that BEFORE the mix is
  * ingested (batch-mode datacards — qd40/qd55/qd64 — only show it
  * after).
  *
  * The featurization is DSIR's (hashed token buckets — Xie et al. 2023):
  * token → xxhash64 % buckets as a pure narrow projection, so the
  * stream side needs no vocabulary and the reference is a fixed
  * `buckets`-long histogram (built once by [[referenceHistogram]] —
  * a driver-side model artifact like IVF centroids). KL uses add-one
  * smoothing on both sides, so empty buckets are safe and the score is
  * defined for any batch.
  *
  * Scale shape: the bucket projection is narrow; the only shuffle is
  * the keyed `transformWithState` on the source — O(sources) state
  * (one latch per source; the reference rides in the processor, not in
  * state), report volume = sources per batch, alert volume = incidents.
  * `buckets` (default 1024) bounds both the reference artifact and the
  * per-call fold array.
  */
object TokenDrift {

  /** One row per (source, batch): batch token volume, the 6-dp KL vs
    * the reference, and whether THIS batch crossed into drift
    * (edge-triggered, latched while drifted, re-armed on recovery —
    * [[QualityDrift]]'s alert discipline).
    */
  case class DriftReport(source: String, batch_tokens: Long, kl: Double,
      alert: Boolean)

  /** Per-source latch. */
  case class TState(alerted: Boolean)

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The frozen reference: hashed-bucket unigram counts over a trusted
    * corpus slice. Driver-collected model artifact (`buckets` longs —
    * the IVF-centroid convention), built ONCE at query start.
    */
  def referenceHistogram(docs: DataFrame, textCol: String,
      buckets: Int = 1024): Array[Long] = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    val rows = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .select(pmod(xxhash64(col("__t")), lit(buckets.toLong)).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__n"))
      .collect()
    val h = Array.fill(buckets)(0L)
    rows.foreach(r => h(r.getLong(0).toInt) = r.getLong(1))
    h
  }

  /** KL(batch ‖ reference) over add-one-smoothed bucket distributions.
    * With smoothing every bucket carries mass on both sides, so the sum
    * is total and finite; drift in EITHER direction (mass appearing in
    * buckets the reference barely uses, or collapsing onto few buckets)
    * raises it.
    */
  class KlProcessor(ref: Array[Long], klThreshold: Double, minTokens: Long)
      extends StatefulProcessor[String, (String, Seq[Long]), DriftReport] {
    @transient private var state: ValueState[TState] = _
    private val buckets = ref.length
    // smoothed reference log-probs, computed once per executor
    private lazy val logQ: Array[Double] = {
      val total = ref.sum.toDouble + buckets
      ref.map(c => math.log((c + 1).toDouble / total))
    }

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TState](
        "t", Encoders.product[TState], TTLConfig.NONE)

    override def handleInputRows(source: String,
        rows: Iterator[(String, Seq[Long])],
        timerValues: TimerValues): Iterator[DriftReport] = {
      val h = Array.fill(buckets)(0L)
      var n = 0L
      rows.foreach { case (_, bs) =>
        bs.foreach { b => h(b.toInt) += 1; n += 1 }
      }
      val total = n.toDouble + buckets
      var kl = 0.0
      var b = 0
      while (b < buckets) {
        val p = (h(b) + 1).toDouble / total
        kl += p * (math.log(p) - logQ(b))
        b += 1
      }
      val prev = if (state.exists()) state.get() else TState(alerted = false)
      // a sub-minTokens trickle can neither fire nor re-arm the latch
      val qualifies = n >= minTokens
      val drifted = qualifies && kl > klThreshold
      val fire = drifted && !prev.alerted
      state.update(TState(if (qualifies) drifted else prev.alerted))
      Iterator.single(DriftReport(source, n, r6(kl), fire))
    }
  }

  /** Monitor a raw document stream: hash each doc's tokens to buckets
    * (narrow), then fold per-source batch histograms against the frozen
    * reference in keyed state.
    */
  def tokenDriftStream(docs: DataFrame, sourceCol: String, textCol: String,
      reference: Array[Long], klThreshold: Double = 0.5,
      minTokens: Long = 50L): Dataset[DriftReport] = {
    require(reference.nonEmpty, "empty reference histogram")
    require(klThreshold > 0.0, s"klThreshold must be positive, got $klThreshold")
    val spark = docs.sparkSession
    import spark.implicits._
    // null text must contribute an EMPTY histogram, not a null array —
    // a null Seq deserializes into KlProcessor and NPEs at bs.foreach,
    // killing the query (the sibling monitors tolerate null-text docs
    // via explode's null-dropping; coalesce is this pipeline's analogue)
    docs.select(col(sourceCol).cast("string").as("__s"),
        coalesce(
          transform(TextAnalysis.tokens(col(textCol)),
            t => pmod(xxhash64(t), lit(reference.length.toLong))),
          array().cast("array<bigint>")).as("__b"))
      .as[(String, Seq[Long])]
      .groupByKey(_._1)
      .transformWithState(new KlProcessor(reference, klThreshold, minTokens),
        TimeMode.None(), OutputMode.Update())
  }
}
