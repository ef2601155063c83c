package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ranking. `rank().over(Window.orderBy(…))` with no
  * partition key moves the whole input to ONE partition (Spark warns
  * `WindowExec: No Partition Defined`): fine for a few hundred rows,
  * the classic driver-straggler at millions. This is the two-phase
  * formulation: range-repartition on the sort key, rank locally per
  * partition, then add per-partition row-count offsets — the same shape
  * `zipWithIndex` uses, expressed over DataFrames.
  */
object RankOps {

  /** Global `rank()` over `sortCol` without a single-partition window.
    *
    * Phase 1: `repartitionByRange(numPartitions, sortCol)` — equal keys
    * land in one partition (range boundaries are key thresholds), so ties
    * never straddle partitions and a local `rank()` per partition is
    * correct up to a constant offset. The repartitioned frame is
    * `localCheckpoint`ed (eager) so the counts job and the rank job read
    * ONE materialization: the input is scanned once (asserted in
    * RankAndSketchSpec via a scan-counting accumulator), and correctness
    * no longer leans on the range sampler re-seeding identically across
    * two executions — nondeterministic upstream (rand(), sample()) is
    * safe here.
    *
    * Phase 2: per-partition row counts (≤ numPartitions values — index
    * metadata, like a broadcast join's small side) cumulated on the driver
    * into offsets; global rank = local rank + offset of the partitions
    * before it.
    *
    * Trade-off of the eager checkpoint: the returned frame's lineage is
    * truncated, so its blocks are NOT recomputable — an executor lost
    * after the checkpoint fails later actions on this frame instead of
    * recomputing (acceptable for rank's read-compute-discard usage; a
    * long-lived result should be written out promptly), and the blocks
    * stay pinned until the frame is garbage-collected.
    */
  def globalRank(df: DataFrame, sortCol: Column, out: String = "rnk",
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val parts = df.repartitionByRange(n, sortCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = parts.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__offset"))
    val local = Window.partitionBy(col("__pid")).orderBy(sortCol)
    parts
      .withColumn("__lr", rank().over(local))
      .join(offDf, "__pid")
      .withColumn(out, (col("__lr") + col("__offset")).cast("int"))
      .drop("__pid", "__lr", "__offset")
  }

  /** Global INCLUSIVE prefix sum of `valueCol` in `sortCol` order — the
    * value-sum sibling of [[globalRank]], and the primitive under
    * corpus-order layouts (token offsets for concat-then-chunk packing,
    * byte offsets for shard manifests): `sum(value).over(Window
    * .orderBy(…))` with no partition key is the same single-partition
    * straggler `rank()` is.
    *
    * Same two-phase shape: range-repartition on the sort key
    * (localCheckpoint'ed — one input scan, sampler re-seeding immaterial),
    * a per-partition running sum, and per-partition TOTAL sums (≤
    * numPartitions longs) cumulated on the driver into offsets.
    *
    * `sortCol` must be a TOTAL order (unique per row — e.g. a doc id):
    * with duplicate keys a running sum depends on intra-tie order, which
    * no engine defines. Ranges split on the sort key so ties would also
    * straddle partitions; the caller owns supplying a unique key.
    *
    * `valueCol` nulls fold to 0 (`coalesce`): a prefix sum has no
    * sensible null semantics — SQL `sum` would skip the row but an
    * all-null partition would total null and crash the driver-side
    * offset cumulation with an opaque NPE. Callers wanting nulls
    * excluded should filter first.
    */
  def globalPrefixSum(df: DataFrame, sortCol: Column, valueCol: Column,
      out: String = "cum", numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val parts = df.withColumn("__v", coalesce(valueCol.cast("long"), lit(0L)))
      .repartitionByRange(n, sortCol)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val sums = parts.groupBy(col("__pid"))
      .agg(sum(col("__v")).cast("long").as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (pid, s) => val o = (pid, acc); acc += s; o }
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__offset"))
    val local = Window.partitionBy(col("__pid")).orderBy(sortCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts
      .withColumn("__ls", sum(col("__v")).over(local))
      .join(offDf, "__pid")
      .withColumn(out, col("__ls") + col("__offset"))
      .drop("__pid", "__v", "__ls", "__offset")
  }
}
