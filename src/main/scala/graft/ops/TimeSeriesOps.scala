package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Time-series joins Spark lacks natively. The headline operator is the
  * as-of join — "the state of X as of the time of Y" — which pandas
  * (`merge_asof`), DuckDB (`ASOF JOIN`), and kdb all ship but Spark does
  * not.
  *
  * The naive formulations both die at scale: a range join
  * (`l.ts >= r.ts`) plans as BroadcastNestedLoop/cartesian and multiplies
  * row counts before the per-left top-1 window prunes them. This is the
  * union-tag-window formulation instead: tag both sides, union (cheap —
  * no row multiplication, ever), and one window pass per key ordered by
  * time carries the latest right payload forward into each left row.
  * Cost = ONE shuffle on the key + a per-partition sort — the same
  * exchange a sort-merge equi-join would pay, with state per task
  * bounded by one payload struct. That is the 100 TB shape.
  */
object TimeSeriesOps {

  /** As-of join: for each `left` row, the single most recent `right` row
    * with `right.rightTs <= left.leftTs` on the same `keys` (inclusive —
    * an equal timestamp matches). `rightPayload` columns are attached
    * with `prefix`; `inner = true` drops left rows with no match (DuckDB
    * `ASOF JOIN` semantics), `false` keeps them with null payload
    * (`merge_asof` semantics).
    *
    * Determinism: among right rows tied on (keys, ts) the greatest
    * payload struct wins (field-by-field struct ordering) — callers
    * wanting a specific winner should order `rightPayload` accordingly
    * or pre-dedup ties.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      prefix: String = "asof_", inner: Boolean = true): DataFrame = {
    val payType = StructType(right.select(rightPayload.map(col): _*).schema)
    val leftType = StructType(left.schema)
    // SQL equi-join semantics: NULL keys never match. Dropping null-key
    // RIGHT rows is sufficient — a null-key left row then shares its
    // window partition with no right rows, so it carries no payload
    // (dropped under inner, null-padded under left), exactly DuckDB
    // ASOF / merge_asof behavior.
    val rightNonNull = keys.foldLeft(right)((df, k) => df.filter(col(k).isNotNull))
    val rTagged = rightNonNull.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct(rightPayload.map(col): _*).as("__pay"),
        lit(null).cast(leftType).as("__lrow")): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(payType).as("__pay"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__lrow")): _*)
    // side sorts right rows before left rows at equal ts → inclusive
    // match; __pay as the final sort key makes the tie winner among
    // equal-ts right rows deterministic
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__pay").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.unionByName(lTagged)
      .withColumn("__asof", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched = if (inner) carried.filter(col("__asof").isNotNull) else carried
    matched.select(
      col("__lrow.*") +:
        rightPayload.map(f => col(s"__asof.$f").as(prefix + f)): _*)
  }

  /** Interval (range) join without an equi key: each point row matches
    * every interval containing it (`start <= point <= end`, both date
    * columns, inclusive). A raw range predicate plans as a nested-loop
    * cross product — |points|×|intervals| comparisons; this formulation
    * buckets time into `chunkDays`-day chunks instead: an interval
    * explodes to the chunks it covers (interval length / chunkDays rows
    * of interval METADATA, not data), a point maps to exactly one chunk,
    * and the match becomes an equi-join on the chunk key followed by the
    * exact containment filter. Cost at 100 TB: one narrow map per side +
    * one hash join on a uniform time key — pick `chunkDays` near the
    * typical interval length so intervals explode to O(1) chunks.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      chunkDays: Int): DataFrame = {
    require(chunkDays > 0)
    val pTagged = points.withColumn("__chunk",
      floor(unix_date(col(pointCol)) / chunkDays))
    val iTagged = intervals.withColumn("__chunk",
      explode(sequence(
        floor(unix_date(col(startCol)) / chunkDays),
        floor(unix_date(col(endCol)) / chunkDays))))
    pTagged.join(iTagged, Seq("__chunk"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__chunk")
  }

  /** COUNT specialization of [[pointInInterval]]: per interval, the
    * number of points it contains — the aggregate-before-join rewrite
    * Catalyst does not do on its own. [[pointInInterval]] materializes
    * every (point, interval) match, and when intervals are dense the
    * match count grows as |points|×|intervals| for a FIXED time range:
    * an sf3 probe read q40's matched pairs at 28.7 M (sf0.1) → 2.87 B
    * (sf1) → 25.8 B (sf3) — exactly quadratic in SF by the query's own
    * semantics. When the downstream only COUNTS matches, the pair
    * materialization is pure waste: pre-aggregate points to per-DAY
    * counts first (the daily table is bounded by the date RANGE —
    * thousands of rows at any corpus size — with map-side partials
    * absorbing the scan), explode each interval to its covered days
    * (interval-length rows of metadata), and sum daily counts over an
    * equi-join on the day key. The big side is scanned once and never
    * shuffled beyond the ~date-range-sized partial count; the join
    * input is O(date range), independent of row count — the sf1 wall
    * dropped 41.5 s → 1.4 s, identical output (same oracle SQL).
    *
    * Inner-join semantics match [[pointInInterval]] + count: an
    * interval whose window contains zero points yields NO row. That
    * includes INVERTED intervals (start > end): [[pointInInterval]]'s
    * `start <= p AND p <= end` filter can never match one, whereas
    * Spark's `sequence(start, end)` would silently auto-step −1 through
    * the descending range and count the wrong window — so inverted
    * rows are filtered out before the explode, keeping the two
    * formulations row-identical on any input.
    */
  def countInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String): DataFrame = {
    val daily = points
      .groupBy(col(pointCol).as("__day"))
      .agg(count(lit(1)).as("__day_n"))
    val iDays = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__day", explode(sequence(col(startCol), col(endCol))))
    val iCols = intervals.columns.map(col).toSeq
    iDays.join(broadcast(daily), Seq("__day"))
      .groupBy(iCols: _*)
      .agg(sum(col("__day_n")).as("n_points"))
  }
}
