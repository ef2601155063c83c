package graft

import org.apache.spark.sql.functions._

import graft.functions.{Curation, Dedup, TextAnalysis}
import graft.ops.{F1Ops, Pipelines}
import graft.sources.Tables

/** Executable spec of the qd61 end-to-end capstone
  * ([[Pipelines.fullPipeline]]): re-derives the stage funnel through the
  * SAME public operators with the SAME parameters and asserts (a) every
  * stage is non-vacuous at sf0.001 — each drop stage actually drops
  * rows, so a green oracle can never hide a stage collapsing into a
  * no-op — and (b) the shard manifest conserves the mixed population's
  * tokens exactly. The row-for-row correctness of the composition is
  * the driver's DuckDB oracle (qd61Sql); this spec pins the semantics
  * the oracle can't see from 8 rollup rows.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("qd61 fullPipeline: every stage non-vacuous; manifest conserves tokens; partitioning-invariant") {
    val docs = Pipelines.fullPipelineFixture(Tables.documents(spark, sf0001))
    val normed = docs.select(col("doc_id"), col("source"),
      TextAnalysis.normalizeText(col("text")).as("norm_text"))
    val bench = normed.filter(col("doc_id") % 50 === 0)
    val corpus = normed.filter(col("doc_id") % 50 =!= 0)
    val gated = corpus
      .withColumn("n_tok", TextAnalysis.tokenCount(col("norm_text")).cast("long"))
      .filter(col("n_tok") >= 20)
    val nCorpus = corpus.count()
    val nGated = gated.count()
    assert(nGated < nCorpus, "quality gate must drop short docs")

    val exact = F1Ops.firstWinsDedup(
        gated.withColumn("__fp", TextAnalysis.fingerprint(col("norm_text"))),
        Seq("__fp"), Seq(col("doc_id")))
      .drop("__fp")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExact = exact.count()
    assert(nExact < nGated, "exact dedup must drop planted duplicates")

    val pairs = Dedup.minHashNearDups(exact, "doc_id", "norm_text",
      k = 16, bands = 4, shingleN = 3, minJaccard = 0.5, portable = true)
    val losers = Dedup.nearDupComponents(pairs)
      .filter(!col("is_keeper")).select("doc_id")
    val reps = exact.join(losers, Seq("doc_id"), "left_anti")
    val nReps = reps.count()
    assert(nReps < nExact, "near dedup must drop planted near-dup cluster members")

    val contaminated = TextAnalysis.decontaminate(reps, "doc_id", "norm_text",
        bench, "norm_text", n = 3, portable = true)
      .filter(col("contaminated")).select("doc_id")
    val clean = reps.join(contaminated, Seq("doc_id"), "left_anti")
    val nClean = clean.count()
    assert(nClean < nReps, "decontamination must drop bench-overlapping docs")

    val train = Curation.withSplit(clean, "doc_id")
      .filter(col("split") === "train")
    val nTrain = train.count()
    assert(nTrain < nClean, "the 90/5/5 split must route docs to val/test")

    val mixed = Curation.temperatureMixDocs(train, "source", "doc_id",
      "norm_text", alpha = 0.5, tokenBudget = 5000L, bucketSalt = "mix#")
    val (nMixed, mixedTokens) = (mixed.count(),
      mixed.agg(sum(col("n_tok"))).as[Long].head())
    assert(nMixed < nTrain, "the 5k-token temperature budget must bind")
    assert(nMixed > 0L)

    // the composed operator's manifest: total tokens across shards ==
    // the mixed population's tokens (packing places every token exactly
    // once; sharding partitions the sequences)
    val out = Pipelines.fullPipeline(docs).collect()
    exact.unpersist(false)
    assert(out.nonEmpty && out.length <= 8)
    assert(out.forall(r => r.getAs[Int]("shard_id") >= 0 &&
      r.getAs[Int]("shard_id") < 8))
    assert(out.map(_.getAs[Long]("n_tokens")).sum === mixedTokens)
    // n_seqs partition the global sequence space: sum == distinct seqs
    val totalSeqs = out.map(_.getAs[Long]("n_seqs")).sum
    assert(totalSeqs === (mixedTokens + 127L) / 128L,
      "ceil(tokens/contextLen) sequences, split across shards")

    // deterministic under repartitioning (md5 draws + total-order
    // prefix sum — no RNG anywhere in the chain)
    val again = Pipelines.fullPipeline(docs.repartition(7)).collect()
    assert(again.map(_.toString).toSeq === out.map(_.toString).toSeq)

    // the NFC/case/whitespace canon is load-bearing end to end: the
    // planted exact dups are byte-distinct (upper + trailing spaces)
    // and only the canonical fingerprint collapses them
    val planted = docs.filter(col("doc_id") >= 1000000L && col("doc_id") < 2000000L)
    assert(planted.count() > 0, "fixture must plant canon-exact dups")

    // the production twin (xxhash64 signatures, qd65) may differ ONLY
    // through its LSH candidate draw: its manifest conserves ITS OWN
    // mix-stage tokens just as exactly, and the two totals sit within
    // the near-dup wiggle (a handful of docs' worth of tokens)
    val fast = Pipelines.fullPipeline(docs, portable = false).collect()
    val fastTokens = fast.map(_.getAs[Long]("n_tokens")).sum
    assert(fast.forall(r => r.getAs[Int]("shard_id") >= 0 &&
      r.getAs[Int]("shard_id") < 8))
    val wiggle = 0.15 * mixedTokens
    assert(math.abs(fastTokens - mixedTokens) <= wiggle,
      s"fast-twin tokens $fastTokens too far from portable $mixedTokens")
  }
}
