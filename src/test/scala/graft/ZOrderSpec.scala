package graft

import org.apache.spark.sql.functions._

import graft.ops.LayoutOps

/** Z-order layout: the Morton bit interleave and the locality guarantee
  * it buys a min/max-pruning reader (q42 is the oracle-checked query).
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: a at even positions, b at odd") {
    // a=3 (bits 0,1 → z bits 0,2 = 5), b=5 (bits 0,2 → z bits 1,5 = 34)
    val z = Seq((3L, 5L)).toDF("a", "b")
      .select(LayoutOps.zValue(col("a"), col("b"), 4).as("z"))
      .as[Long].head()
    assert(z === 39L)
    // identity checks: zero stays zero; a single bit lands where expected
    val zs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L))
      .toDF("a", "b")
      .select(LayoutOps.zValue(col("a"), col("b"), 8).as("z"))
      .as[Long].collect()
    assert(zs.toSeq === Seq(0L, 1L, 2L, 65535L))
  }

  test("fixing the top z bits bounds BOTH dimensions (the pruning bound)") {
    // full 256×256 grid; bucket = top 4 bits of each dim (zval >> 8):
    // every bucket must span at most 16 values in a AND in b — this is
    // the file-stats rectangle a reader prunes against
    val grid = spark.range(65536)
      .select((col("id") % 256).as("a"), (col("id") / 256).cast("long").as("b"))
    val buckets = grid
      .withColumn("z", LayoutOps.zValue(col("a"), col("b"), 8))
      .groupBy((col("z") / 256).cast("long").as("zbucket"))
      .agg((max("a") - min("a")).as("ra"), (max("b") - min("b")).as("rb"))
    assert(buckets.count() === 256)
    assert(buckets.filter(col("ra") > 15 || col("rb") > 15).count() === 0)
  }

  test("zOrderLayout files bound both dims; single-column sort does not") {
    val grid = spark.range(65536)
      .select((col("id") % 256).as("a"), (col("id") / 256).cast("long").as("b"))
    def partitionRanges(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("a") - min("a")).as("ra"), (max("b") - min("b")).as("rb"))
      .agg(avg("ra").as("ra"), avg("rb").as("rb"))
      .as[(Double, Double)].head()
    val (zra, zrb) = partitionRanges(
      LayoutOps.zOrderLayout(grid, "a", "b", bits = 8, numFiles = 16))
    val (sra, srb) = partitionRanges(
      grid.repartitionByRange(16, col("a")).sortWithinPartitions(col("a")))
    // z-layout: both dims bounded well under the full 0..255 range
    assert(zra < 160, s"z layout a-range $zra")
    assert(zrb < 160, s"z layout b-range $zrb")
    // a-sort: a is tight but b is the full range in every partition
    assert(sra < 32, s"a-sorted layout a-range $sra")
    assert(srb > 240, s"a-sorted layout b-range $srb")
  }
}
