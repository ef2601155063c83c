package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{Bpe, NativeExpressions, TextAnalysis}

/** Dev diagnostic (not library surface): BPE-training/encoding scale
  * probe — the datum behind the round-18 production-vocab claims.
  *
  * Measures, over SPARK_GRAFT_SF_DIR's documents:
  *  1. the one corpus pass (word-table build) — the only input-sized term;
  *  2. `Bpe.train`'s distributed merge loop at a small K — its s/merge is
  *     FLAT in K (every iteration is the same vocab-sized job), so small-K
  *     s/merge × 32k prices the production vocabulary honestly;
  *  3. `Bpe.trainFast` at a K ladder (default 256,1024,4096) — s/merge
  *     should be ~10⁴× smaller and SUBLINEAR in K (later merges touch
  *     ever-fewer words);
  *  4. encode walls under the LARGEST trained K: the BpeCountExpr kernel
  *     (constant plan size) vs the literal replace chain at a K ladder
  *     (default 64,128,256 — the chain's plan/codegen grows linearly in
  *     K, which is exactly why it cannot carry a production vocabulary).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt -batch "runMain graft.tools.BpeProbe"
  *
  * Env knobs: BPEPROBE_FAST_KS, BPEPROBE_CHAIN_KS (comma lists),
  * BPEPROBE_DIST_MERGES (default 64; 0 skips the distributed loop).
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fastKs = sys.env.getOrElse("BPEPROBE_FAST_KS", "256,1024,4096")
      .split(",").map(_.trim.toInt).toSeq
    val chainKs = sys.env.getOrElse("BPEPROBE_CHAIN_KS", "64,128,256")
      .split(",").map(_.trim.toInt).toSeq.filter(_ > 0)
    val distK = sys.env.getOrElse("BPEPROBE_DIST_MERGES", "64").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The synthetic documents corpus is a 31-word template vocabulary —
    // its merge space EXHAUSTS at ~89 merges, far below production K.
    // The trainer's cost drivers are word-table size and symbol
    // diversity, not prose, so the probe derives a deterministic
    // high-diversity corpus from the same table's ids: per doc,
    // BPEPROBE_HEX_WORDS md5-hex words (16-char alphabet, 32-char
    // words → tens of thousands of distinct words, K ≥ 4096 headroom).
    val hexWords = sys.env.getOrElse("BPEPROBE_HEX_WORDS", "20").toInt
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(hexWords - 1)),
          i => md5(concat(col("doc_id").cast("string"), lit("#"),
            i.cast("string"))))).as("text"))
      .localCheckpoint()
    docs.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (words, wtSec) =
      time(Bpe.wordTable(docs, "text").localCheckpoint())
    val nWords = words.count()
    println(f"bpeprobe: sf=$sfDir distinct_words=$nWords corpus_pass=$wtSec%.2fs")

    if (distK > 0) {
      val (m, sec) = time(Bpe.train(docs, "text", distK).collect())
      println(f"bpeprobe: train_distributed k=$distK total=$sec%.2fs " +
        f"sec_per_merge=${sec / math.max(1, m.length)}%.4f merges=${m.length}")
    }

    var largest: Seq[(String, String)] = Nil
    fastKs.foreach { k =>
      val (m, sec) = time(Bpe.trainFast(docs, "text", k)
        .select("lhs", "rhs").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq)
      println(f"bpeprobe: train_fast k=$k total=$sec%.2fs " +
        f"sec_per_merge=${sec / math.max(1, m.length)}%.6f merges=${m.length}")
      if (m.length >= largest.length) largest = m
    }

    // kernel encode under the largest vocabulary: full fertility pass
    val (n1, kSec) = time(
      Bpe.encodeFertility(docs, "doc_id", "text", largest).count())
    println(f"bpeprobe: encode_kernel k=${largest.length} wall=$kSec%.2fs rows=$n1")

    // literal chain encode (the pre-round-18 formulation) at a K ladder:
    // same distinct-word broadcast shape, merge list as K nested replaces
    chainKs.filter(_ <= largest.length).foreach { k =>
      val merges = largest.take(k)
      val (n2, cSec) = time {
        val docWords = docs
          .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("word"))
          .filter(length(col("word")) > 0)
        val encoded = Bpe.applyMerges(
            docWords.select(col("word")).distinct().withColumn("toks",
              concat(lit("  "), regexp_replace(col("word"), "(.)", "$1  "))),
            merges)
          .select(col("word"),
            size(split(trim(col("toks")), "  ")).cast("long").as("pieces"))
        docWords.join(broadcast(encoded), "word")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"), sum(col("pieces")).as("n_pieces"))
          .count()
      }
      println(f"bpeprobe: encode_chain k=$k wall=$cSec%.2fs rows=$n2")
    }

    // cross-check at the probe scale: kernel ≡ chain piece totals under
    // the first chainKs vocabulary (cheap smoke, not the spec's proof)
    chainKs.headOption.filter(_ <= largest.length).foreach { k =>
      val merges = largest.take(k)
      val viaKernel = words
        .select(sum(NativeExpressions.bpePieceCount(col("word"), merges) * col("freq")))
        .head().getLong(0)
      val viaChain = Bpe.applyMerges(words, merges)
        .select(sum(size(split(trim(col("toks")), "  ")).cast("long") * col("freq")))
        .head().getLong(0)
      println(s"bpeprobe: crosscheck k=$k kernel_pieces=$viaKernel chain_pieces=$viaChain " +
        s"equal=${viaKernel == viaChain}")
    }
    spark.stop()
  }
}
