package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators: composing a training mix out of a cleaned
  * corpus. Public pipelines do this as "sampling weights" over sources /
  * languages (The Pile: Gao et al. 2020; LLaMA's per-source epochs) —
  * the relational form is per-group caps and per-group token budgets.
  *
  * Both operators are a single window partitioned by the group key: the
  * shuffle is on the group column, per-group state is a running count /
  * running sum, and results are deterministic because the intra-group
  * order is a total order (caller supplies the tie-broken sort).
  */
object Curation {

  /** Keep at most `nPerGroup` rows per group, chosen by `orderCols`
    * (deterministic — first-N under a total order, not a random sample;
    * pair with a hash column in `orderCols` for a seeded pseudo-random
    * draw that still replays exactly).
    */
  def balancedSample(df: DataFrame, groupCol: String, orderCols: Seq[Column],
      nPerGroup: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nPerGroup)
      .drop("__rn")
  }

  /** Greedy per-group prefix under a token budget: walk each group in
    * `orderCols` order accumulating `tokensCol`, keep every row whose
    * running total (inclusive) stays ≤ `budget`. Integer running sum —
    * exact and order-independent across engines given the total order.
    */
  def tokenBudgetMix(df: DataFrame, groupCol: String, orderCols: Seq[Column],
      tokensCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokensCol.cast("long")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Deterministic train/val/test assignment by a portable content-free
    * hash of the id: bucket ∈ [0, 100) = `md5_bucket(id)` (DuckDB:
    * `md5_number_lower(id) % 100` — same 64 bits, same unsigned mod), the
    * first `trainPct` buckets are train, the next `valPct` val, the rest
    * test. The property a training pipeline needs and `rand(seed)` does
    * NOT give: a doc's split is a pure function of its id — stable across
    * runs, engines, partitionings, and corpus growth (new docs never move
    * old ones between splits). Narrow map, no shuffle.
    */
  def withSplit(df: DataFrame, idCol: String, trainPct: Int = 90,
      valPct: Int = 5, outCol: String = "split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    val bucket = NativeExpressions.md5Bucket(col(idCol).cast("string"), 100)
    df.withColumn(outCol,
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }
}
