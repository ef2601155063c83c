package graft.tools

import org.apache.spark.sql.SparkSession

import graft.functions.Bpe

/** Dev diagnostic (not library surface): BPE-training scale probe.
  * Times `Bpe.train` end to end at a given merge count over a given sf
  * dir, printing the corpus-pass vs merge-loop split and the final
  * symbol-vocabulary size — the datum behind the qd67 scale claims
  * (word-table-bound merge loop; corpus pass is the only input-sized
  * term; localCheckpoint-every-16 keeps large K flat).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 BPEPROBE_MERGES=64 \
  *     sbt -batch "runMain graft.tools.BpeProbe"
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = sys.env.getOrElse("BPEPROBE_MERGES", "8").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)

    val t0 = System.nanoTime()
    val words = Bpe.wordTable(docs, "text").localCheckpoint()
    val nWords = words.count()
    val t1 = System.nanoTime()
    val merges = Bpe.train(docs, "text", k).collect()
    val t2 = System.nanoTime()
    println(f"bpeprobe: sf=$sfDir k=$k distinct_words=$nWords " +
      f"word_table_pass=${(t1 - t0) / 1e9}%.2fs " +
      f"train_total=${(t2 - t1) / 1e9}%.2fs " +
      f"merge_loop=${(t2 - t1) / 1e9 - (t1 - t0) / 1e9}%.2fs " +
      f"merges_learned=${merges.length}")
    spark.stop()
  }
}
