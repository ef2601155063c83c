package graft

import org.apache.spark.sql.functions._
import graft.functions.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  /** Independent re-implementation of one BM25 partial (plain scala.math,
    * BigDecimal HALF_UP rounding like Spark's `round`).
    */
  private def part(tf: Long, df: Long, n: Long, dl: Long, avgdl: Double): BigDecimal = {
    val idf = math.log(1.0 + (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5))
    val norm = tf.toDouble * 2.2 / (tf.toDouble + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl))
    BigDecimal(idf * norm).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  }

  test("bm25Search (qr01): scores match a hand computation on a tiny corpus") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "durian durian durian durian")).toDF("doc_id", "text")
    val q = Seq((1, "apple"), (1, "banana")).toDF("query_id", "term")
    val got = Retrieval.bm25Search(docs, "doc_id", "text", q, "query_id", "term", k = 5)
      .orderBy(col("rank")).as[(Int, Long, Double, Int)].collect()
    // N=3, dl = 3/2/4, avgdl = 3; df(apple)=1, df(banana)=2; d3 matches nothing
    val d1 = (part(tf = 2, df = 1, n = 3, dl = 3, avgdl = 3.0) +
      part(tf = 1, df = 2, n = 3, dl = 3, avgdl = 3.0)).toDouble
    val d2 = part(tf = 1, df = 2, n = 3, dl = 2, avgdl = 3.0).toDouble
    assert(got === Array((1, 1L, d1, 1), (1, 2L, d2, 2)))
  }

  test("bm25Search: term restriction is a broadcast semi-join BEFORE any aggregation") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val q = Seq((1, "spark"), (2, "hash")).toDF("query_id", "term")
    val res = Retrieval.bm25Search(docs, "doc_id", "text", q, "query_id", "term", k = 3)
    res.collect() // materialize so AQE finalizes the plan
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no semi-join in plan:\n$plan")
    // the semi-join must be broadcast (query terms are tiny) — a shuffled
    // semi-join would mean the full exploded vocabulary moved
    assert(!plan.contains("SortMergeJoin LeftSemi".replace(" ", "")), "semi-join shuffled")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"term restriction not broadcast:\n$plan")
  }

  test("bm25Search properties: tf monotone, rare terms outweigh common, long docs penalized") {
    val q = Seq((1, "rare")).toDF("query_id", "term")
    def score(docs: Seq[(Long, String)]): Map[Long, Double] =
      Retrieval.bm25Search(docs.toDF("doc_id", "text"), "doc_id", "text",
          q, "query_id", "term", k = 10)
        .as[(Int, Long, Double, Int)].collect().map(r => r._2 -> r._3).toMap
    // tf monotonicity: same-length docs, more hits → strictly higher score
    val tf = score(Seq((1L, "rare x y z"), (2L, "rare rare y z"), (3L, "w x y z")))
    assert(tf(2L) > tf(1L))
    assert(!tf.contains(3L)) // no query term → absent
    // length normalization: same tf, longer doc → strictly lower score
    val len = score(Seq((1L, "rare x"), (2L, "rare x y z w v u t")))
    assert(len(1L) > len(2L))
    // idf: a doc matching only the corpus-rare term beats one matching
    // only the corpus-common term (same tf, same dl)
    val q2 = Seq((1, "rare"), (1, "common")).toDF("query_id", "term")
    val docs = Seq((1L, "rare a"), (2L, "common a"), (3L, "common b"),
      (4L, "common c"), (5L, "common d")).toDF("doc_id", "text")
    val idf = Retrieval.bm25Search(docs, "doc_id", "text", q2, "query_id", "term", k = 10)
      .as[(Int, Long, Double, Int)].collect().map(r => r._2 -> r._3).toMap
    assert(idf(1L) > idf(2L))
  }

  test("rrfFuse (qe16): hand-computed fusion, absent-leg docs still rank") {
    val leg1 = Seq((1, 10L, 1), (1, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val leg2 = Seq((1, 20L, 1), (1, 30L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(leg1, leg2), k = 3)
      .orderBy(col("rank")).as[(Int, Long, Double, Int)].collect()
    val r1 = BigDecimal(1.0 / 61.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val r2 = BigDecimal(1.0 / 62.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // doc 20 appears in both legs (ranks 2 and 1); 10 and 30 in one each,
    // with identical contributions — tie broken by doc id
    assert(got === Array(
      (1, 20L, (r1 + r2).toDouble, 1),
      (1, 10L, r1.toDouble, 2),
      (1, 30L, r2.toDouble, 3)))
  }

  test("bm25Search + rrfFuse on fixture tables return full, contiguous rankings") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val q = Seq((1, "spark"), (1, "stream"), (2, "merge")).toDF("query_id", "term")
    val sparse = Retrieval.bm25Search(docs, "doc_id", "text", q, "query_id", "term", k = 10)
    val rows = sparse.as[(Int, Long, Double, Int)].collect()
    assert(rows.count(_._1 == 1) === 10)
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._4).sorted.toSeq === (1 to rs.length).toSeq, s"query $qid ranks")
      // scores non-increasing by rank
      val byRank = rs.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"query $qid order")
    }
    val fused = Retrieval.rrfFuse(Seq(sparse, sparse), k = 5)
      .as[(Int, Long, Double, Int)].collect()
    // fusing a leg with itself preserves its ranking (2/(60+r) is monotone)
    val top5 = rows.filter(_._1 == 1).sortBy(_._4).take(5).map(_._2).toSeq
    assert(fused.filter(_._1 == 1).sortBy(_._4).map(_._2).toSeq === top5)
  }

  test("bm25CorpusStats refuses an empty corpus with a clear message") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Retrieval.bm25CorpusStats(empty, "text")
    }
    assert(e.getMessage.contains("corpus is empty"),
      s"opaque failure instead of the guard: ${e.getMessage}")
  }
}
