package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.{Dedup, TextAnalysis}

/** Streaming capstone for the LLM-data pipeline: a stream of new
  * documents → quality gate → incremental exact dedup against the
  * already-ingested corpus → append to the corpus sink. Composes the
  * pieces that are each oracle/test-proven in batch (qd26's
  * [[Dedup.incrementalDedup]] shape, qd02's token gate, RaceIngest's
  * batch_id-partition exactly-once sink) into the production
  * incremental path: at 100 TB you never re-dedupe the corpus —
  * each micro-batch dedupes within itself and anti-joins the hash
  * column of what's already on disk.
  *
  * Scale + exactly-once design:
  *  - the corpus side is touched ONLY through its stored
  *    `content_hash` column — a single-column parquet scan (no text
  *    re-fingerprinting, no full-width corpus read per batch);
  *  - within-batch keeper choice is deterministic (smallest id per
  *    hash — [[Dedup.exactDedup]]);
  *  - each batch writes its own `batch_id=N` partition with dynamic
  *    partition overwrite, and the anti-join EXCLUDES the current
  *    batch's own partition — so a replayed batch (sink committed,
  *    checkpoint lost) re-derives exactly its original keeper set and
  *    overwrites partition N with identical content: idempotent, no
  *    duplicate keepers, no lost keepers.
  */
object CorpusIngest {

  /** Start the deduped-corpus sink. `docs` must carry `doc_id` and
    * `text`; rows under `minTokens` are dropped by the quality gate.
    */
  def startDedupedCorpusSink(docs: DataFrame, corpusPath: String,
      checkpoint: String, minTokens: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val gated = batch.filter(TextAnalysis.tokenCount(col("text")) >= minTokens)
        val fresh = Dedup.exactDedup(gated, "doc_id", "text")
        val seen =
          try Some(spark.read.parquet(corpusPath)
              .filter(col("batch_id") =!= lit(batchId))
              .select(col("content_hash")).distinct())
          catch {
            // first batch: no corpus yet
            case _: org.apache.spark.sql.AnalysisException => None
          }
        val keepers = seen.fold(fresh)(s => fresh.join(s, Seq("content_hash"), "left_anti"))
        keepers.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(corpusPath)
        ()
      }
      .start()
}
