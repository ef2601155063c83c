package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.sources.Tables

/** Text-analysis semantics: the two langId forms agree, quality metrics
  * behave on edge inputs, approx distinct stays within HLL error bounds.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("withLangId (staged) and langId (single-column) agree on real docs") {
    val docs = Tables.documents(spark, sf0001).limit(200)
    val staged = TextAnalysis.withLangId(docs, "text", "lp")
      .select("doc_id", "lp").as[(Long, String)].collect().toMap
    val single = docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lp"))
      .as[(Long, String)].collect().toMap
    assert(staged === single)
  }

  test("langId marker semantics: clear marker → language, no markers → und") {
    val got = Seq(
      "the cat and the dog is with us",   // en markers
      "le chat et la porte des champs",   // fr markers
      "xyzzy plugh qwerty")               // none
      .toDF("text").select(TextAnalysis.langId(col("text")).as("l"))
      .as[String].collect()
    assert(got.toSeq === Seq("en", "fr", "und"))
  }

  test("quality metrics on edge inputs: single token, heavy punctuation") {
    val m = TextAnalysis.withQualityMetrics(Seq("hello", "!!! ??? !!!").toDF("text"))
      .select("n_tokens", "punct_ratio").as[(Int, Double)].collect()
    assert(m(0) === ((1, 0.0)))
    assert(m(1)._2 > 0.5)
  }

  test("approx_count_distinct within HLL error of exact (qa01 contract)") {
    val li = Tables.lineitem(spark, sf0001)
    val exact = li.agg(countDistinct("l_orderkey")).as[Long].head()
    // rsd is a standard deviation, not a bound — use rsd=0.02, assert 3σ
    val approx = li.agg(approx_count_distinct(col("l_orderkey"), 0.02)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.06)
  }
}
