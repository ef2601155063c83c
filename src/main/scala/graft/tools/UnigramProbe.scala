package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.UnigramLm

/** Dev diagnostic (not library surface): unigram-LM trainer scale probe
  * — the "same treatment as BPE, or a measured negative" datum
  * (round-17 verdict #1, unigram leg).
  *
  * The structural claim it measures: unlike BPE's K-sequenced merge
  * loop (one driver-coordinated step PER VOCAB ENTRY), the unigram
  * hard-EM trainer's driver-sequenced dimension is `iters` — a small
  * constant (SentencePiece runs a handful of EM rounds), NOT
  * vocab-sized — and each round is ONE distributed Viterbi pass over
  * the vocab-sized word table whose per-word cost is O(len × maxLen)
  * hash lookups, independent of vocabulary SIZE (the model rides the
  * kernel as a hash map). So production vocab (topM 8k–64k) should
  * move the per-iteration wall only through the model-literal
  * broadcast + the topM-bounded collect, with s/iteration ~flat in
  * topM — if that holds, the BPE trainFast treatment is NOT needed
  * here, and this probe is the recorded negative.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt -batch "runMain graft.tools.UnigramProbe"
  *
  * Env: UNIPROBE_TOPMS (comma ladder, default 40,1024,8192),
  * UNIPROBE_ITERS (default 2), UNIPROBE_MAXLEN (default 4),
  * UNIPROBE_HEX_WORDS (0 = raw corpus; >0 = the BpeProbe hex corpus,
  * needed for vocab headroom on the 31-word template corpus).
  */
object UnigramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val topMs = sys.env.getOrElse("UNIPROBE_TOPMS", "40,1024,8192")
      .split(",").map(_.trim.toInt).toSeq
    val iters = sys.env.getOrElse("UNIPROBE_ITERS", "2").toInt
    val maxLen = sys.env.getOrElse("UNIPROBE_MAXLEN", "4").toInt
    val hexWords = sys.env.getOrElse("UNIPROBE_HEX_WORDS", "20").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = graft.sources.Tables.documents(spark, sfDir)
    val docs = (if (hexWords <= 0) raw else raw.select(col("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(hexWords - 1)),
          i => md5(concat(col("doc_id").cast("string"), lit("#"),
            i.cast("string"))))).as("text")))
      .localCheckpoint()
    docs.count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    topMs.foreach { m =>
      val (vocab, sec) = time(
        UnigramLm.trainVocab(docs, "text", maxLen, m, iters))
      println(f"uniprobe: topM=$m iters=$iters total=$sec%.2fs " +
        f"sec_per_iter=${sec / iters}%.2f model_pieces=${vocab.size}")
      val (n, fSec) = time(
        UnigramLm.fertility(docs, "doc_id", "text", vocab).count())
      println(f"uniprobe: fertility topM=$m wall=$fSec%.2fs rows=$n")
    }
    spark.stop()
  }
}
