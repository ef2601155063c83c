package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key aggregations — the 100 TB concern AQE's
  * skew-join handling doesn't cover: a single group key receiving a large
  * fraction of all rows makes one reducer the straggler regardless of
  * partition count.
  *
  * `saltedAgg` runs the classic two-stage plan: stage 1 aggregates on
  * (key, salt) — spreading a hot key over `salts` reducers — stage 2
  * combines the partials per key. Correct for any algebraic aggregate
  * (sum/count/min/max); both stages are hash aggregations with map-side
  * partials, so the extra shuffle carries only `salts × |keys|` rows.
  */
object SkewOps {

  /** Two-stage salted aggregation.
    *
    * @param partials stage-1 aggregates over raw rows, e.g.
    *                 `Seq(sum("x").as("s"), count(lit(1)).as("c"))`
    * @param combine  stage-2 merge of the partial columns, e.g.
    *                 `Seq(sum("s").as("s"), sum("c").as("c"))`
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      partials: Seq[Column], combine: Seq[Column]): DataFrame = {
    require(salts > 0)
    // deterministic spread: hash of all columns mod salts (not rand() —
    // retries/speculative tasks must salt identically)
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salts)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }

  /** Salted count — the common case. */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts,
      partials = Seq(count(lit(1)).as("__pc")),
      combine = Seq(sum("__pc").as("count")))

  /** Bloom-pruned semi join for a dim too big to broadcast: build a
    * bloom filter over the small side's (long) keys with one aggregation
    * job (the sketch is a few hundred KB — mergeable, driver-safe the
    * same way a broadcast join's small side is), ship it inside a narrow
    * filter expression, and drop non-matching rows from the large side
    * BEFORE its shuffle. The exact left-semi join then removes the bloom's
    * false positives, so the ANSWER is identical to a plain semi join —
    * what changes at 100 TB is the exchange volume: a selective dim prunes
    * most of the fact scan at the map side instead of shuffling it.
    * (Spark's own runtime row-level filtering applies the same idea; this
    * form makes it explicit, tunable, and usable on any plan shape.)
    */
  def bloomSemiJoin(large: DataFrame, largeKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bloom = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val pruned = large.filter(
      graft.functions.NativeExpressions.bloomMightContain(col(largeKey), bos.toByteArray))
    pruned.join(small.select(col(smallKey).as(largeKey)).distinct(),
      Seq(largeKey), "left_semi")
  }
}
