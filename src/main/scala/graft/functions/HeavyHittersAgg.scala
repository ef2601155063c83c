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

  /** At most `k` counters; `finish` returns hits sorted (est desc, token). */
  class MisraGries(k: Int) extends Aggregator[String, MgBuf, Seq[Hit]] {
    require(k > 0)

    override def zero: MgBuf = MgBuf(Map.empty)

    override def reduce(b: MgBuf, tok: String): MgBuf = {
      val c = b.counters
      c.get(tok) match {
        case Some(n) => MgBuf(c.updated(tok, n + 1))
        case None if c.size < k => MgBuf(c.updated(tok, 1L))
        case None =>
          // the MG step: a miss at capacity decrements every counter
          MgBuf(c.flatMap { case (t, n) => if (n > 1) Some(t -> (n - 1)) else None })
      }
    }

    /** Mergeable-summaries merge: sum counters pairwise; if over
      * capacity, subtract the (k+1)-th largest value from all and drop
      * the non-positive — the summed-then-shifted counters keep the
      * n/(k+1) undercount bound.
      */
    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      val summed = b.counters.foldLeft(a.counters) { case (acc, (t, n)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + n)
      }
      if (summed.size <= k) MgBuf(summed)
      else {
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        MgBuf(summed.flatMap { case (t, n) =>
          if (n - cut > 0) Some(t -> (n - cut)) else None
        })
      }
    }

    override def finish(r: MgBuf): Seq[Hit] =
      r.counters.toSeq.map { case (t, n) => Hit(t, n) }
        .sortBy(h => (-h.est, h.token))

    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[Seq[Hit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
  }
}
