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

  test("prfExpandedSearch (qr09): feedback terms recall a doc the original query cannot see") {
    val docs = Seq(
      (1L, "apple banana banana banana"),
      (2L, "banana banana banana cherry"),
      (3L, "cherry plum plum plum"),
      (4L, "plum orange orange orange")).toDF("doc_id", "text")
    val q = Seq((1, "apple")).toDF("query_id", "term")
    val base = Retrieval.bm25Search(docs, "doc_id", "text", q,
        "query_id", "term", k = 5)
      .as[(Int, Long, Double, Int)].collect()
    assert(base.map(_._2).toSet === Set(1L), "pass 1 should only see doc 1")
    // feedback doc 1 contributes 'banana' → doc 2 becomes reachable
    val exp = Retrieval.prfExpandedSearch(docs, "doc_id", "text", q,
        "query_id", "term", fbDocs = 1, fbTerms = 1, k = 5)
      .as[(Int, Long, Double, Int)].collect()
    assert(exp.map(_._2).toSet === Set(1L, 2L), exp.toSeq.toString)
  }

  test("prfExpandedSearch: fbTerms = 0 is the identity; idf outweighs raw tf in expansion") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val q = Seq((1, "spark"), (2, "hash")).toDF("query_id", "term")
    val plain = Retrieval.bm25Search(docs, "doc_id", "text", q,
        "query_id", "term", k = 5)
      .as[(Int, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val zero = Retrieval.prfExpandedSearch(docs, "doc_id", "text", q,
        "query_id", "term", fbDocs = 3, fbTerms = 0, k = 5)
      .as[(Int, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(zero === plain)
    // tf·ln(N/df): 'rare' (tf 1, df 1 → ln 4) must beat 'common'
    // (tf 3, df 3 → 3·ln(4/3) ≈ 0.86) — had 'common' won, docs 2 and 3
    // would surface in the expanded result
    val d2 = Seq(
      (1L, "target rare common common common"),
      (2L, "common common common filler1"),
      (3L, "common filler2 filler3 filler4"),
      (4L, "filler5 filler6 filler7 filler8")).toDF("doc_id", "text")
    val q2 = Seq((1, "target")).toDF("query_id", "term")
    val got = Retrieval.prfExpandedSearch(d2, "doc_id", "text", q2,
        "query_id", "term", fbDocs = 1, fbTerms = 1, k = 5)
      .as[(Int, Long, Double, Int)].collect()
    assert(got.map(_._2).toSet === Set(1L), s"idf lost to tf: ${got.toSeq}")
  }

  /** trec_eval-convention DCG term: round(1/log2(rank+1), 6) as Spark's
    * HALF_UP — the test-side twin of evalRun's arithmetic.
    */
  private def dcgTerm(rank: Int): BigDecimal =
    BigDecimal(1.0d / (math.log(rank + 1.0d) / math.log(2.0d)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("evalRun (qr04): hand-computed metrics on a 3-query fixture") {
    // q1: rel {1,2,3}; run hits 2 of them at ranks 2,3 → partial credit
    // q2: rel {10};    run finds it at rank 1 → perfect single-rel query
    // q3: rel {20,21}; run never finds them → all-zero row
    val run = Seq(
      (1, 5L, 1), (1, 1L, 2), (1, 2L, 3),
      (2, 10L, 1), (2, 11L, 2),
      (3, 30L, 1), (3, 31L, 2)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1, 1L), (1, 2L), (1, 3L), (2, 10L), (3, 20L), (3, 21L))
      .toDF("query_id", "doc_id")
    val got = Retrieval.evalRun(run, qrels, k = 3)
      .orderBy(col("query_id"))
      .as[(Int, Long, Long, Double, Double, Double, Double)].collect()

    val dcg1 = (dcgTerm(2) + dcgTerm(3)).toDouble
    val idcg3 = (dcgTerm(1) + dcgTerm(2) + dcgTerm(3)).toDouble
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) === ((1, 3L, 2L, r6(2.0 / 3.0), r6(2.0 / 3.0), 0.5,
      r6(dcg1 / idcg3))))
    // q2: 1 relevant → IDCG over min(1, 3) = 1 term; perfect run → ndcg 1
    assert(got(1) === ((2, 1L, 1L, r6(1.0 / 3.0), 1.0, 1.0, 1.0)))
    assert(got(2) === ((3, 2L, 0L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("evalRun: judged query absent from the run scores zeros; unjudged run query is ignored") {
    val run = Seq((9, 1L, 1)).toDF("query_id", "doc_id", "rank") // query 9 unjudged
    val qrels = Seq((1, 1L)).toDF("query_id", "doc_id")          // query 1 has no run
    val got = Retrieval.evalRun(run, qrels, k = 5)
      .as[(Int, Long, Long, Double, Double, Double, Double)].collect()
    assert(got.toSeq === Seq((1, 1L, 0L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("evalRun: ranks beyond k never count") {
    val run = Seq((1, 1L, 1), (1, 2L, 4)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1, 2L)).toDF("query_id", "doc_id")
    // the only relevant doc sits at rank 4 > k=3 → everything zero
    val got = Retrieval.evalRun(run, qrels, k = 3)
      .as[(Int, Long, Long, Double, Double, Double, Double)].collect()
    assert(got.head._3 === 0L && got.head._7 === 0.0)
  }

  test("hardNegatives (qr05): unjudged docs re-ranked by run rank, capped at nNeg") {
    val run = Seq(
      (1, 1L, 1), (1, 2L, 2), (1, 3L, 3), (1, 4L, 4), (1, 5L, 5),
      (2, 1L, 1)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1, 2L), (2, 1L)).toDF("query_id", "doc_id")
    val got = Retrieval.hardNegatives(run, qrels, nNeg = 2)
      .orderBy(col("query_id"), col("neg_rank"))
      .as[(Int, Long, Int, Int)].collect()
    // q1: negatives are 1,3,4,5 in run order — capped at 2; q2: none left
    assert(got.toSeq === Seq((1, 1L, 1, 1), (1, 3L, 3, 2)))
  }

  test("evalSummary (qr07): exact DECIMAL macro means of the per-query battery") {
    val run = Seq(
      (1, 5L, 1), (1, 1L, 2), (1, 2L, 3),
      (2, 10L, 1), (3, 30L, 1)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1, 1L), (1, 2L), (1, 3L), (2, 10L), (3, 20L))
      .toDF("query_id", "doc_id")
    val per = Retrieval.evalRun(run, qrels, k = 3)
    val rows = per.as[(Int, Long, Long, Double, Double, Double, Double)].collect()
    // mirror the implementation: exact DECIMAL sum, then DOUBLE divide
    def mean(f: ((Int, Long, Long, Double, Double, Double, Double)) => Double) =
      BigDecimal(rows.map(r => BigDecimal(f(r))).sum.toDouble / rows.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Retrieval.evalSummary(per)
      .as[(Long, Double, Double, Double, Double)].head()
    assert(got === ((rows.length.toLong,
      mean(_._4), mean(_._5), mean(_._6), mean(_._7))))
  }

  test("tfidfKeywords (qr06): hand-computed scores, tie on term, minDf drops hapax") {
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "cherry cherry common common")).toDF("doc_id", "text")
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln3 = r6(math.log(3.0))
    val ln15 = r6(math.log(1.5))
    val got = Retrieval.tfidfKeywords(docs, "doc_id", "text", m = 3)
      .orderBy(col("doc_id"), col("rnk"))
      .as[(Long, String, Long, Long, Double, Int)].collect()
    assert(got.toSeq === Seq(
      // doc 1: apple tf=2 df=1 → 2·ln3; banana tf=1 df=2 → ln1.5; common idf 0
      (1L, "apple", 2L, 1L, r6(2.0 * ln3), 1),
      (1L, "banana", 1L, 2L, ln15, 2),
      (1L, "common", 1L, 3L, 0.0, 3),
      // doc 2: banana/cherry tie at ln1.5 → lexicographic term order
      (2L, "banana", 1L, 2L, ln15, 1),
      (2L, "cherry", 1L, 2L, ln15, 2),
      (2L, "common", 1L, 3L, 0.0, 3),
      (3L, "cherry", 2L, 2L, r6(2.0 * ln15), 1),
      (3L, "common", 2L, 3L, 0.0, 2)))
    // minDf = 2 drops the hapax "apple" — doc 1's top term changes
    val filtered = Retrieval.tfidfKeywords(docs, "doc_id", "text", m = 3, minDf = 2L)
      .filter(col("doc_id") === 1L).orderBy(col("rnk"))
      .as[(Long, String, Long, Long, Double, Int)].collect()
    assert(filtered.map(_._2).toSeq === Seq("banana", "common"))
  }

  test("tfidfKeywords on the fixture: ranks contiguous, scores non-increasing, ubiquitous terms sink") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val got = Retrieval.tfidfKeywords(docs, "doc_id", "text", m = 5, minDf = 2L)
      .as[(Long, String, Long, Long, Double, Int)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (id, rows) =>
      val byRank = rows.sortBy(_._6)
      assert(byRank.map(_._6).toSeq === (1 to rows.length).toSeq, s"doc $id ranks")
      val sc = byRank.map(_._5)
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b }, s"doc $id order")
    }
    // a term in EVERY doc has idf 0 — it can never outrank a positive score
    val n = docs.count()
    got.filter(_._4 == n).foreach(r => assert(r._5 === 0.0, s"df=N score: $r"))
  }

  test("evalRun + hardNegatives partition the top-k run rows (fixture corpus)") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val q = Seq((1, "spark"), (1, "window"), (2, "hash")).toDF("query_id", "term")
    val run = Retrieval.bm25Search(docs, "doc_id", "text", q, "query_id", "term", k = 10)
    // qrels: every query-1 doc judged relevant iff doc_id is even — an
    // arbitrary but deterministic judgment over the run's own doc space
    val qrels = run.filter(col("doc_id") % 2 === 0)
      .select(col("query_id"), col("doc_id"))
    val ev = Retrieval.evalRun(run, qrels, k = 10)
      .as[(Int, Long, Long, Double, Double, Double, Double)].collect()
    val negs = Retrieval.hardNegatives(run, qrels, nNeg = 100)
      .as[(Int, Long, Int, Int)].collect()
    val runCnt = run.as[(Int, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.length).toMap
    ev.foreach { case (qid, nRel, hits, _, _, _, _) =>
      // hits + unjudged negatives = all run rows for that query
      assert(hits + negs.count(_._1 == qid) === runCnt(qid), s"query $qid split")
      assert(hits <= nRel)
    }
  }
}
