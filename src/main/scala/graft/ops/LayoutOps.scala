package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-column scan pruning. Sorting a table
  * by one column gives tight file-level min/max stats on that column and
  * useless stats on every other; interleaving the bits of two columns
  * into a Z-order (Morton) value and sorting by THAT bounds the per-file
  * range of BOTH columns at once (Morton 1966; the same layout trick
  * Delta/Iceberg expose as `OPTIMIZE ZORDER BY`). With the top p bits of
  * a z-value fixed, each dimension varies over at most 2^(bits − p/2)
  * values — so a parquet reader filtering on either column prunes most
  * files. The z-value is pure bit arithmetic (shift/and/or — ANSI-safe,
  * codegen'd, engine-portable), computed in one narrow map.
  */
object LayoutOps {

  /** Morton interleave of the low `bits` bits of `a` and `b`: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. Callers clamp/
    * normalize inputs into [0, 2^bits) first (e.g. `col % lit(1 << bits)`
    * or a rank); values outside simply alias, they never error.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Cluster `df` for writing: range-partition by the z-value of
    * (`aCol`, `bCol`) into `numFiles` output partitions and sort within
    * each — every written file then covers a contiguous z-range, i.e. a
    * small rectangle in (a, b) space, so its parquet min/max stats prune
    * on both columns. One range shuffle (sampled boundaries), no global
    * sort.
    */
  def zOrderLayout(df: DataFrame, aCol: String, bCol: String, bits: Int,
      numFiles: Int): DataFrame = {
    val z = zValue(col(aCol), col(bCol), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
