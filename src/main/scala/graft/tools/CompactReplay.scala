package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.sources.Tables
import graft.streaming.CorpusIngest

/** Dev-only scale replay for the corpus-maintenance surface (NOT part
  * of the query API): lay an SF dir's documents table out as an
  * exact-sink corpus with PLANTED cross-epoch duplicates (the
  * concurrent-writer end state `compactCorpus` exists for), build the
  * postings sidecar, compact, and verify the sidecar stayed in step —
  * printing one JSON line of wall times so SCALE.md can record how
  * compaction behaves at 10× the correctness SF.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.CompactReplay /tmp/sf1 /tmp/compact_replay"
  */
object CompactReplay {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = workDir + "/corpus"
    org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(workDir), true)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // epoch 0: the full documents table; epoch 1: a second writer that
    // re-admitted 2% of epoch 0 (new doc_ids, same text — exact dups)
    // plus some genuinely new docs. Two batches per epoch.
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        TextAnalysis.fingerprint(col("text")).as("content_hash"))
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val (_, tLayout) = timed {
      docs.withColumn("epoch", lit(0L))
        .withColumn("batch_id", pmod(col("doc_id"), lit(2L)))
        .write.mode("overwrite").partitionBy("epoch", "batch_id").parquet(corpus)
      val dups = docs.filter(pmod(col("doc_id"), lit(50L)) === 0L)
        .select((col("doc_id") + maxId + 1L).as("doc_id"), col("text"),
          col("content_hash"))
      val fresh = docs.filter(pmod(col("doc_id"), lit(50L)) === 1L)
        .select((col("doc_id") + 2L * (maxId + 1L)).as("doc_id"),
          concat(col("text"), lit(" freshcopytail")).as("text"))
        .withColumn("content_hash", TextAnalysis.fingerprint(col("text")))
      dups.unionByName(fresh)
        .withColumn("epoch", lit(1L))
        .withColumn("batch_id", pmod(col("doc_id"), lit(2L)))
        .write.mode("append").partitionBy("epoch", "batch_id").parquet(corpus)
    }
    val before = spark.read.parquet(corpus).count()
    val (_, tIndex) = timed(CorpusIngest.buildPostingsIndex(spark, corpus, buckets = 64))
    val (removed, tCompact) = timed(CorpusIngest.compactCorpus(spark, corpus))
    val after = spark.read.parquet(corpus).count()
    // sidecar stayed in step: N from stats == compacted corpus count,
    // and a re-reconcile finds nothing to do
    val statsN = spark.read.parquet(corpus + "/_graft_postings_stats")
      .agg(sum("n_docs")).head().getLong(0)
    val (_, tReverify) = timed(CorpusIngest.buildPostingsIndex(spark, corpus, buckets = 64))
    val (removed2, tIdem) = timed(CorpusIngest.compactCorpus(spark, corpus))
    require(statsN == after, s"sidecar stats N=$statsN != compacted corpus $after")
    require(removed2 == 0L, s"compaction not idempotent: second run removed $removed2")
    // Locale.ROOT: comma-decimal default locales would corrupt the JSON
    def r2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(
      s"""{"sf":"$sfDir","rows_before":$before,"rows_after":$after,"removed":$removed,
         |"t_layout_sec":${r2(tLayout)},"t_index_sec":${r2(tIndex)},
         |"t_compact_sec":${r2(tCompact)},"t_reconcile_noop_sec":${r2(tReverify)},
         |"t_compact_noop_sec":${r2(tIdem)}}""".stripMargin.replace("\n", ""))
    spark.stop()
  }
}
