package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** BPE training/encoding semantics: the Sennrich et al. 2016 worked
  * example reproduces exactly, greedy left-to-right merge application
  * (the overlap contract the delimiter-doubled `replace` encodes),
  * overlap-counting pair statistics, early exhaustion, and the
  * encode-replays-training identity.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** The classic Sennrich fixture: {low×5, lower×2, newest×6, widest×3}.
    * Known first four merges: (e,s)→es, (es,t)→est, (l,o)→lo, (lo,w)→low.
    */
  private def sennrich = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).mkString(" ").split(" ").grouped(4).map(_.mkString(" ")).toSeq
    .toDF("text")

  test("Sennrich 2016 worked example: merges (es, est, lo, low) in order") {
    val m = Bpe.train(sennrich, "text", numMerges = 4)
      .select("rank", "lhs", "rhs", "merged", "cnt")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(m === Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "l", "o", "lo", 7L),
      (4L, "lo", "w", "low", 7L)))
  }

  test("greedy left-to-right apply: 'a a a' merges to 'aa a', not 'a aa'") {
    // pins the replace semantics the oracle's DuckDB replay relies on:
    // non-overlapping left-to-right on the double-space representation
    val words = Seq("aaa").toDF("word")
      .withColumn("freq", lit(1L))
      .withColumn("toks",
        concat(lit("  "), regexp_replace(col("word"), "(.)", "$1  ")))
    val merged = Bpe.applyMerges(words, Seq(("a", "a")))
      .select("toks").as[String].head()
    assert(merged === "  aa  a  ")
  }

  test("pair counts include overlapping positions: 'aaa' has (a,a)x2") {
    val words = Bpe.wordTable(Seq("aaa").toDF("text"), "text")
    val cnt = Bpe.pairCounts(words)
      .select("lhs", "rhs", "cnt").as[(String, String, Long)].collect()
    assert(cnt.toSeq === Seq(("a", "a", 2L)))
  }

  test("early exhaustion: corpus of 1-char words yields no merges") {
    val m = Bpe.train(Seq("a b a b").toDF("text"), "text", numMerges = 4)
    assert(m.count() === 0L)
  }

  test("exhaustion mid-loop: 'ab' corpus stops after the single pair") {
    val m = Bpe.train(Seq("ab ab").toDF("text"), "text", numMerges = 5)
      .select("rank", "merged").as[(Long, String)].collect().toSeq
    assert(m === Seq((1L, "ab")))
  }

  test("encode replays training: 'lowest' under the Sennrich merges → [low, est]") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val got = Bpe.encodeFertility(
        Seq((1L, "lowest"), (2L, "low low newest")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .orderBy("doc_id")
      .select("doc_id", "n_words", "n_pieces", "fertility")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // lowest → low est (2 pieces); low → low (1); newest → n e w est (4)
    assert(got === Seq((1L, 1L, 2L, 2.0), (2L, 3L, 6L, 2.0)))
  }

  test("merge table is a pure function of the corpus: partitioning-invariant") {
    val base = graft.sources.Tables.documents(spark, sf0001).limit(120)
    val one = Bpe.train(base.repartition(1), "text", 4)
      .select("rank", "merged").as[(Long, String)].collect().toSeq
    val many = Bpe.train(base.repartition(7), "text", 4)
      .select("rank", "merged").as[(Long, String)].collect().toSeq
    assert(one === many)
  }
}
