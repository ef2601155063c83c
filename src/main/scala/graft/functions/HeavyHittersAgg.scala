package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator` — frequent
  * items over an UNBOUNDED key domain in bounded state (Misra & Gries
  * 1982; mergeable form per Agarwal et al., "Mergeable Summaries", PODS
  * 2012). The exact formulation (group by token, count, filter) shuffles
  * every distinct token; this sketch holds at most `k` counters per
  * group and participates in partial aggregation, so a 10⁹-token group
  * ships k counters per map task — the [[TopKAgg]] discipline applied to
  * frequency estimation.
  *
  * Guarantees (classic MG, preserved by the merge): estimates UNDERCOUNT
  * by at most n/(k+1) for n items seen, and every item with true
  * frequency > n/(k+1) is present in the sketch. With k ≥ the distinct
  * key count, no eviction ever fires and the counts are exact (the
  * RankAndSketchSpec equality contract; the guarantee contract plants a
  * skewed stream with k far below the vocabulary).
  */
object HeavyHittersAgg {

  case class MgBuf(counters: Map[String, Long])
  case class Hit(token: String, est: Long)

  /** One MG update: hit → +1; miss with room → insert; miss at capacity
    * → decrement every counter, dropping zeros.
    */
  def reduceToken(c: Map[String, Long], tok: String, k: Int): Map[String, Long] =
    c.get(tok) match {
      case Some(n) => c.updated(tok, n + 1)
      case None if c.size < k => c.updated(tok, 1L)
      case None => c.flatMap { case (t, n) => if (n > 1) Some(t -> (n - 1)) else None }
    }

  /** Mergeable-summaries merge: sum counters pairwise; if over capacity,
    * subtract the (k+1)-th largest value from all and drop the
    * non-positive — the summed-then-shifted counters keep the n/(k+1)
    * undercount bound.
    */
  def mergeCounters(a: Map[String, Long], b: Map[String, Long],
      k: Int): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (t, n)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + n)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (t, n) => if (n - cut > 0) Some(t -> (n - cut)) else None }
    }
  }

  /** Counters as a report: sorted (est desc, token). */
  def toHits(c: Map[String, Long]): Seq[Hit] =
    c.toSeq.map { case (t, n) => Hit(t, n) }.sortBy(h => (-h.est, h.token))

  /** At most `k` counters; `finish` returns hits sorted (est desc, token). */
  class MisraGries(k: Int) extends Aggregator[String, MgBuf, Seq[Hit]] {
    require(k > 0)
    override def zero: MgBuf = MgBuf(Map.empty)
    override def reduce(b: MgBuf, tok: String): MgBuf =
      MgBuf(reduceToken(b.counters, tok, k))
    override def merge(a: MgBuf, b: MgBuf): MgBuf =
      MgBuf(mergeCounters(a.counters, b.counters, k))
    override def finish(r: MgBuf): Seq[Hit] = toHits(r.counters)

    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[Seq[Hit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
  }
}
