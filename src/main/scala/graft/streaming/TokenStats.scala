package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.{HeavyHittersAgg, TextAnalysis}

/** Streaming vocabulary statistics over a document stream — the live
  * sibling of the qa05 batch sketch: per source, a Misra-Gries
  * heavy-hitters summary maintained in `transformWithState` keyed state
  * and re-emitted every micro-batch (update mode). The monitoring shape
  * corpus ingest wants ("what is this crawl actually full of, right
  * now") without any per-token state: the store holds k counters per
  * source — O(sources × k) total, independent of stream length or
  * vocabulary — so a billion-token day costs the same state as a quiet
  * one.
  *
  * Guarantee inherited from [[HeavyHittersAgg]]: estimates undercount by
  * at most n/(k+1) of the tokens n seen so far per source, and any token
  * above that frequency is present. Replay-deterministic: state is
  * engine-checkpointed and the per-batch fold is order-insensitive at
  * the report level for k ≥ vocabulary (StreamingSpec pins batch-by-batch
  * reports against batch-boundary-matched exact counts).
  */
object TokenStats {

  /** One report row: a source's rank-`rnk` token estimate as of this batch. */
  case class HeavyTokens(source: String, token: String, est: Long, rnk: Int)

  /** MG counters per source in a named ValueState (RocksDB provider
    * required, as all `transformWithState` users here).
    */
  class HeavyTokensProcessor(k: Int, top: Int)
      extends StatefulProcessor[String, (String, String), HeavyTokens] {
    @transient private var state: ValueState[HeavyHittersAgg.MgBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[HeavyHittersAgg.MgBuf](
        "mg", Encoders.product[HeavyHittersAgg.MgBuf], TTLConfig.NONE)

    override def handleInputRows(source: String,
        rows: Iterator[(String, String)],
        timerValues: TimerValues): Iterator[HeavyTokens] = {
      var c = if (state.exists()) state.get().counters
        else Map.empty[String, Long]
      rows.foreach { case (_, tok) =>
        c = HeavyHittersAgg.reduceToken(c, tok, k)
      }
      state.update(HeavyHittersAgg.MgBuf(c))
      HeavyHittersAgg.toHits(c).take(top).zipWithIndex.iterator
        .map { case (h, i) => HeavyTokens(source, h.token, h.est, i + 1) }
    }
  }

  /** `docs` is a STREAMING frame with `sourceCol` and `textCol`; emits
    * each source's current top-`top` token estimates every batch the
    * source appears in. Tokenization matches qa04/qa05 (whitespace over
    * lowercased text), so batch and stream reports are comparable.
    */
  def heavyTokensStream(docs: DataFrame, sourceCol: String, textCol: String,
      k: Int, top: Int): Dataset[HeavyTokens] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(sourceCol).as("__s"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("__t"))
      .as[(String, String)]
      .groupByKey(_._1)
      .transformWithState(new HeavyTokensProcessor(k, top),
        TimeMode.None(), OutputMode.Update())
  }
}
