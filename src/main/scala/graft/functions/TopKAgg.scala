package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k-per-group as a typed `Aggregator` — the scale-correct
  * alternative to the window formulation for heavy groups. The window
  * form (`row_number().over(partitionBy(g).orderBy(...)) <= k`, q31)
  * shuffles and sorts EVERY row of a group in that group's reducer
  * partition; this aggregator's state is at most k entries, and because
  * `Aggregator` participates in partial aggregation, a group with 10⁹
  * rows ships only k entries per map task to its reducer (classic
  * bounded-state top-k; Spark plans it as partial + final
  * ObjectHashAggregate — plan-asserted in AsOfAndPruneSpec). Same
  * result, oracle-checked against the identical SQL as q31.
  */
object TopKAgg {

  /** One lineitem candidate: ordering is (price desc, orderkey,
    * linenumber) — q31's exact tie-break.
    */
  case class Item(price: Double, orderkey: Long, linenumber: Long)

  /** Product wrapper so the buffer has a product Encoder (Seq alone has
    * none); items kept sorted, length ≤ k.
    */
  case class TopBuf(items: Seq[Item])

  private val ord: Ordering[Item] =
    Ordering.by(r => (-r.price, r.orderkey, r.linenumber))

  /** Top `k` items per group under [[ord]]. */
  class TopK(k: Int) extends Aggregator[Item, TopBuf, TopBuf] {
    require(k > 0)
    override def zero: TopBuf = TopBuf(Seq.empty)
    override def reduce(b: TopBuf, a: Item): TopBuf = {
      // skip the sort-insert when the candidate can't place (the common
      // case on a heavy group: state is full and the row is worse than
      // the current k-th)
      if (b.items.length >= k && ord.gteq(a, b.items.last)) b
      else TopBuf((b.items :+ a).sorted(ord).take(k))
    }
    override def merge(a: TopBuf, b: TopBuf): TopBuf =
      TopBuf((a.items ++ b.items).sorted(ord).take(k))
    override def finish(r: TopBuf): TopBuf = r
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  }
}
