package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.{NativeExpressions, Similarity}

/** Streaming centroid-drift monitor — the operational "when do I re-fit
  * the index" signal for every consumer of pinned centroids (the IVF
  * serving path, the `_graft_cells` sidecar, the semantic-dedup sink):
  * as embeddings stream in, each is assigned to its nearest pinned
  * centroid by the SAME narrow kernel serving uses, and per-cell
  * running state (member count, element-wise vector sum, distance sum)
  * is folded in `transformWithState` keyed ValueState. Every batch a
  * cell appears in, it re-emits one report row:
  *
  *   - `n`         — members seen so far
  *   - `drift`     — ‖running mean − pinned centroid‖₂: how far the
  *                   cell's observed center of mass has moved off its
  *                   pinned position (0 for a stationary stream)
  *   - `mean_dist` — running mean member→centroid distance: rising
  *                   dispersion even when the mean stays put
  *
  * State is O(cells × dim) TOTAL — independent of stream length — and
  * engine-checkpointed, so the monitor resumes exactly across restarts
  * like every other stateful op here (RocksDB provider, the
  * transformWithState requirement). The per-row work is the narrow
  * assignment projection plus one fold; no join, no shuffle beyond the
  * groupByKey on cell_id (≤ cells keys).
  *
  * Reading the signal: re-fit (kmeansFit/Ivf.fit) and rebuild sidecars
  * when drift grows to a noticeable fraction of the typical
  * inter-centroid distance — thresholds are corpus-specific, so this
  * emits the measurements and leaves the policy to the operator.
  */
object CentroidDrift {

  /** One report row: cell `cell_id`'s running stats as of this batch. */
  case class DriftReport(cell_id: Int, n: Long, drift: Double, mean_dist: Double)

  /** Per-cell running state: element-wise vector sum, Σdistance, count. */
  case class CellBuf(sums: Array[Double], distSum: Double, n: Long)

  /** The one shared fold both processors run: accumulate this batch's
    * members into the cell's running ValueState and return the updated
    * buffer plus the drift ‖mean − centroid‖₂ — kept in ONE place so
    * the monitor stream and the alert stream can never disagree on the
    * same input (they differ only in what they emit).
    */
  private def foldCell(state: ValueState[CellBuf], centroid: Array[Double],
      rows: Iterator[(Int, Seq[Double], Double)]): (CellBuf, Double) = {
    val dim = centroid.length
    var buf = if (state.exists()) state.get() else CellBuf(new Array[Double](dim), 0.0, 0L)
    rows.foreach { case (_, v, dist) =>
      var i = 0
      val it = v.iterator
      while (it.hasNext && i < dim) { buf.sums(i) += it.next(); i += 1 }
      buf = CellBuf(buf.sums, buf.distSum + dist, buf.n + 1)
    }
    state.update(buf)
    var d2 = 0.0
    var i = 0
    while (i < dim) {
      val delta = buf.sums(i) / buf.n - centroid(i)
      d2 += delta * delta
      i += 1
    }
    (buf, math.sqrt(d2))
  }

  class DriftProcessor(centroids: Array[Array[Double]])
      extends StatefulProcessor[Int, (Int, Seq[Double], Double), DriftReport] {
    @transient private var state: ValueState[CellBuf] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CellBuf](
        "cell", Encoders.product[CellBuf], TTLConfig.NONE)

    override def handleInputRows(cell: Int,
        rows: Iterator[(Int, Seq[Double], Double)],
        timerValues: TimerValues): Iterator[DriftReport] = {
      val (buf, drift) = foldCell(state, centroids(cell), rows)
      Iterator.single(
        DriftReport(cell, buf.n, drift, buf.distSum / buf.n))
    }
  }

  /** The shared assignment projection: hardened filter → nearest-cell →
    * full member→centroid distance, keyed for the stateful fold.
    */
  private def assignedMembers(embs: DataFrame, vecCol: String,
      m: Array[Array[Double]]): Dataset[(Int, Seq[Double], Double)] = {
    val spark = embs.sparkSession
    import spark.implicits._
    val dim = m.head.length
    val v = Similarity.asDouble(col(vecCol))
    val cLit = typedlit(m.map(_.toSeq).toSeq)
    val cOf = element_at(cLit, col("__cell") + 1)
    embs
      .select(v.as("__v"))
      // a null / wrong-dimension / corrupt-element vector on an uncurated
      // stream must not kill the monitor query (the tuple encoder below is
      // non-nullable) nor poison the cell's running sums (one NaN OR
      // ±Infinity element would make drift/mean_dist NaN or Inf for the
      // life of the checkpointed state — and Inf + later −Inf is NaN,
      // after which an alert threshold can never fire) — drop it; it
      // carries no drift signal. isnan() misses infinities, hence the
      // explicit magnitude check.
      .filter(col("__v").isNotNull && size(col("__v")) === dim &&
        !exists(col("__v"), x => x.isNull || isnan(x) ||
          abs(x) === lit(Double.PositiveInfinity)))
      .withColumn("__cell",
        element_at(NativeExpressions.nearestCells(col("__v"), m, 1), 1))
      // full squared distance (the c·c term matters for the emitted
      // magnitude, unlike in assignment where it is constant per row)
      .withColumn("__dist",
        sqrt(greatest(lit(0.0),
          NativeExpressions.vecDot(col("__v"), col("__v"))
            - lit(2.0) * NativeExpressions.vecDot(col("__v"), cOf)
            + NativeExpressions.vecDot(cOf, cOf))))
      .select(col("__cell"), col("__v"), col("__dist"))
      .as[(Int, Seq[Double], Double)]
  }

  /** `embs` is a STREAMING frame with `vecCol`; `centroids` the pinned
    * (cell_id, centroid) table serving uses. Emits each touched cell's
    * running (n, drift, mean_dist) every batch, update mode.
    */
  def centroidDriftStream(embs: DataFrame, vecCol: String,
      centroids: DataFrame): Dataset[DriftReport] = {
    import embs.sparkSession.implicits._
    val m = Similarity.Ivf.centroidMatrix(centroids)
    assignedMembers(embs, vecCol, m)
      .groupByKey(_._1)
      .transformWithState(new DriftProcessor(m),
        TimeMode.None(), OutputMode.Update())
  }

  /** One alert: `cell_id`'s running drift crossed `threshold` (with the
    * stats at crossing time). Emitted exactly once per crossing.
    */
  case class DriftAlert(cell_id: Int, n: Long, drift: Double, threshold: Double)

  /** [[DriftProcessor]]'s fold plus EDGE-TRIGGERED alerting: a cell
    * emits one [[DriftAlert]] the batch its running drift first reaches
    * `threshold`, then stays SILENT while it remains above (an operator
    * paging channel must not re-fire every batch of a drifted steady
    * state), and re-arms only if the drift falls back below — so a
    * monitoring consumer can treat every row as an incident, not a
    * sample. Alert state is one boolean per cell beside the running
    * buffer, in its own ValueState handle ("armed" is independent
    * state, not derivable from the sums alone once re-arming exists).
    */
  class DriftAlertProcessor(centroids: Array[Array[Double]], threshold: Double)
      extends StatefulProcessor[Int, (Int, Seq[Double], Double), DriftAlert] {
    @transient private var state: ValueState[CellBuf] = _
    @transient private var alerted: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[CellBuf](
        "cell", Encoders.product[CellBuf], TTLConfig.NONE)
      alerted = getHandle.getValueState[Boolean](
        "alerted", Encoders.scalaBoolean, TTLConfig.NONE)
    }

    override def handleInputRows(cell: Int,
        rows: Iterator[(Int, Seq[Double], Double)],
        timerValues: TimerValues): Iterator[DriftAlert] = {
      val (buf, drift) = foldCell(state, centroids(cell), rows)
      val wasAlerted = alerted.exists() && alerted.get()
      if (drift >= threshold && !wasAlerted) {
        alerted.update(true)
        Iterator.single(DriftAlert(cell, buf.n, drift, threshold))
      } else {
        if (drift < threshold && wasAlerted) alerted.update(false)
        Iterator.empty
      }
    }
  }

  /** Edge-triggered drift alerts over the same assignment/fold as
    * [[centroidDriftStream]]: one row per (cell, crossing) of
    * `threshold`. Update mode, RocksDB-backed like every stateful op
    * here. Threshold policy is the operator's (see the class scaladoc:
    * compare against typical inter-centroid distance).
    */
  def centroidDriftAlerts(embs: DataFrame, vecCol: String,
      centroids: DataFrame, threshold: Double): Dataset[DriftAlert] = {
    require(threshold > 0.0, s"drift threshold must be positive, got $threshold")
    import embs.sparkSession.implicits._
    val m = Similarity.Ivf.centroidMatrix(centroids)
    assignedMembers(embs, vecCol, m)
      .groupByKey(_._1)
      .transformWithState(new DriftAlertProcessor(m, threshold),
        TimeMode.None(), OutputMode.Update())
  }
}
