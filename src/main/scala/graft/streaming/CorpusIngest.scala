package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, KeyValueGroupedDataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

import graft.functions.{Dedup, TextAnalysis}

/** Streaming capstone for the LLM-data pipeline: a stream of new
  * documents → quality gate → incremental exact dedup against the
  * already-ingested corpus → append to the corpus sink. Composes the
  * pieces that are each oracle/test-proven in batch (qd26's
  * [[Dedup.incrementalDedup]] shape, qd02's token gate, RaceIngest's
  * batch_id-partition exactly-once sink) into the production
  * incremental path: at 100 TB you never re-dedupe the corpus —
  * and you never re-SCAN it per batch either.
  *
  * Scale + exactly-once design:
  *  - the seen-hash set lives in STREAMING STATE (`transformWithState`
  *    ValueState keyed by `content_hash`, RocksDB-backed — per-executor
  *    local disk, not JVM heap), so each micro-batch costs O(batch):
  *    state lookups for the batch's own hashes, NO corpus re-scan. The
  *    previous formulation anti-joined the corpus's `content_hash`
  *    column every batch — a single-column but WHOLE-corpus read, i.e.
  *    O(batches × corpus) cumulative at 100 TB with frequent triggers;
  *  - the corpus's stored `content_hash` column is read ONCE, as
  *    `transformWithState` INITIAL STATE, and only when the query
  *    starts with a FRESH checkpoint (an existing checkpoint restores
  *    the seen-set from state; Spark applies initial state solely on
  *    the first batch of a state-less query). This is what lets a new
  *    query adopt a pre-existing corpus without per-batch scans;
  *  - within-batch keeper choice is deterministic (smallest id per
  *    hash, [[Dedup.exactDedup]]'s rule);
  *  - each batch writes its own (`epoch`, `batch_id`) partition with
  *    dynamic partition overwrite — the epoch is pinned per checkpoint
  *    ([[CorpusIngest.queryEpoch]]), so a query can only ever overwrite
  *    partitions it wrote itself. A replayed batch (sink committed,
  *    checkpoint lost) re-bootstraps from the corpus — which already
  *    contains its own keepers — so it emits NOTHING and the dynamic
  *    overwrite touches no partition: the corpus is byte-identical, no
  *    duplicate and no lost keepers. (A replay with the checkpoint
  *    INTACT never re-fires the batch at all — foreachBatch idempotence
  *    via the partition key, as in RaceIngest.)
  *
  * Dedup SCOPE (exact sink): the no-duplicate invariant covers one
  * checkpoint LINEAGE — everything ingested through this checkpoint
  * plus whatever the corpus held when it first started. A checkpoint
  * RESUMED after a different checkpoint has grown the corpus does not
  * learn the other epoch's hashes (initial state applies only to fresh
  * checkpoints), so interleaving multiple writer checkpoints can admit
  * cross-epoch duplicates — epoch isolation guarantees they never LOSE
  * data, not that they dedupe against each other. Single-writer (or
  * sequential fresh-checkpoint adoption) is the designed topology;
  * interleaved writers should be followed by a batch [[Dedup.exactDedup]]
  * compaction. (The NEAR-dup sink re-probes all epochs per batch and
  * does not have this gap.)
  */
object CorpusIngest {

  /** One corpus row (pre-`batch_id`): the stream's (doc_id, text) plus
    * the exact-dedup fingerprint ([[TextAnalysis.fingerprint]], the
    * md5-of-normalized-text `content_hash` every dedup op here keys on).
    */
  case class CorpusDoc(doc_id: Long, text: String, content_hash: String)

  /** Initial-state row: a hash already in the on-disk corpus. */
  case class SeenHash(content_hash: String)

  /** Keyed by `content_hash`: first batch to present a hash emits its
    * smallest-id doc and marks the hash seen; every later occurrence
    * (same batch handled by the grouped iterator, later batches by the
    * state probe) emits nothing. Initial state marks corpus-resident
    * hashes seen without emitting.
    */
  class SeenHashProcessor
      extends StatefulProcessorWithInitialState[String, CorpusDoc, CorpusDoc, SeenHash] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean](
        "seen", Encoders.scalaBoolean, TTLConfig.NONE)

    override def handleInputRows(hash: String, rows: Iterator[CorpusDoc],
        timerValues: TimerValues): Iterator[CorpusDoc] =
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        Iterator.single(rows.minBy(_.doc_id))
      }

    override def handleInitialState(hash: String, s: SeenHash,
        timerValues: TimerValues): Unit =
      seen.update(true)
  }

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** `transformWithState` runs only on the RocksDB state store. The
    * engine DEFAULT (HDFS-backed — `getOption` surfaces defaults too)
    * counts as "no choice": default RocksDB in. Refuse loudly on a
    * deliberately-chosen third-party provider (silently flipping a
    * session-wide conf under other running queries would be worse).
    */
  private def ensureRocksDb(spark: SparkSession): Unit =
    spark.conf.getOption(ProviderKey) match {
      case None => spark.conf.set(ProviderKey, RocksDbProvider)
      case Some(v) if v.contains("RocksDB") => ()
      case Some(v) if v.endsWith("HDFSBackedStateStoreProvider") =>
        spark.conf.set(ProviderKey, RocksDbProvider)
      case Some(v) => throw new IllegalStateException(
        s"CorpusIngest needs the RocksDB state store for transformWithState " +
          s"(seen-hash ValueState); session has $ProviderKey=$v — unset it or " +
          s"set it to $RocksDbProvider")
    }

  /** The one-time bootstrap read: the corpus's stored hash column (a
    * single-column pruned parquet scan), or empty when no corpus exists
    * yet. Executed once per FRESH-checkpoint query start, never per
    * batch.
    */
  private def initialSeen(spark: SparkSession,
      corpusPath: String): KeyValueGroupedDataset[String, SeenHash] = {
    import spark.implicits._
    val seen =
      try spark.read.parquet(corpusPath)
        .select(col("content_hash")).distinct().as[SeenHash]
      catch { case _: org.apache.spark.sql.AnalysisException => // first ever start
        spark.emptyDataset[SeenHash]
      }
    seen.groupByKey(_.content_hash)
  }

  /** Per-checkpoint EPOCH: the corpus is partitioned by
    * (`epoch`, `batch_id`) and a query only ever overwrites partitions
    * under its OWN epoch, so no sequence of checkpoints — fresh
    * adoptions, lost-checkpoint replays, or an OLD checkpoint resumed
    * after a newer query has grown the corpus — can dynamically
    * overwrite another query's keepers. (A single-level `base+batchId`
    * scheme still collided when an old checkpoint resumed with new
    * batches beyond its original range.) The epoch is pinned in
    * `<checkpoint>/graft-epoch` at first start (max existing corpus
    * epoch + 1; 0 with no corpus), via the checkpoint's Hadoop
    * filesystem:
    *  - a RESTART of the same checkpoint re-reads its pinned epoch —
    *    batch N keeps mapping to the same partition, preserving the
    *    replay idempotence of the dynamic-partition-overwrite sink;
    *  - an empty/unreadable marker (crash between create and write) is
    *    treated as ABSENT and re-derived — never a bricked checkpoint;
    *  - the one remaining collision window is two queries pinning
    *    CONCURRENTLY against the same corpus (both read the same max
    *    epoch); serialize first starts if running multiple writers.
    */
  private def queryEpoch(spark: SparkSession, corpusPath: String,
      checkpoint: String): Long = {
    val cp = new org.apache.hadoop.fs.Path(checkpoint)
    val fs = cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(cp, "graft-epoch")
    val pinned: Option[Long] =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        val txt = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
        txt.toLongOption // empty/garbled marker == absent, re-derive below
      }
    pinned.getOrElse {
      val epoch =
        try {
          val schema = spark.read.parquet(corpusPath).schema
          // a corpus from the pre-epoch single-level layout must be
          // refused LOUDLY: silently pinning epoch 0 would write a
          // conflicting two-level tree into the same directory and
          // break partition discovery for every subsequent reader
          require(schema.fieldNames.contains("epoch"),
            s"corpus at $corpusPath uses the legacy batch_id-only layout; " +
              "migrate each batch_id=N directory to epoch=0/batch_id=N " +
              "before pointing an epoch-aware sink at it")
          // partition discovery types partition cols as int — normalize
          val r = spark.read.parquet(corpusPath)
            .agg(max(col("epoch").cast("long"))).head()
          if (r.isNullAt(0)) 0L else r.getLong(0) + 1L
        } catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      fs.mkdirs(cp)
      // write-then-rename: a crash mid-write must not leave a parseable
      // PREFIX (e.g. "1" of "12") that pins a wrong — possibly another
      // checkpoint's — epoch; rename is atomic on HDFS and local FS
      val tmp = new org.apache.hadoop.fs.Path(cp, s"graft-epoch.tmp")
      val out = fs.create(tmp, true)
      try out.write(epoch.toString.getBytes("UTF-8")) finally out.close()
      if (fs.rename(tmp, marker)) epoch
      else { // lost a concurrent pin race — adopt whatever won
        fs.delete(tmp, false)
        queryEpoch(spark, corpusPath, checkpoint)
      }
    }
  }

  /** Both sinks persist a FIXED corpus schema (`doc_id: long`, `text`,
    * plus their dedup columns and the (`epoch`, `batch_id`) partition
    * keys) — extra input columns are
    * NOT carried (join sidecar columns back by `doc_id` downstream), and
    * a non-integral `doc_id` is refused loudly here instead of failing
    * deep inside an encoder or casting to null.
    */
  private def requireDocSchema(docs: DataFrame): Unit = {
    import org.apache.spark.sql.types._
    require(docs.columns.contains("doc_id") && docs.columns.contains("text"),
      s"corpus sink input needs doc_id and text columns; got ${docs.columns.mkString(", ")}")
    val idType = docs.schema("doc_id").dataType
    require(Seq[DataType](LongType, IntegerType, ShortType, ByteType).contains(idType),
      s"corpus sink doc_id must be an integral type (got $idType) — string ids " +
        "would cast to null; map them to longs upstream")
  }

  /** Start the NEAR-dup-deduped corpus sink — the fuzzy form of
    * [[startDedupedCorpusSink]]: a batch doc is dropped when it LSH
    * band-matches the already-ingested corpus (near-dups arriving in
    * later micro-batches are caught, not just exact copies) or a
    * smaller-id doc of its own batch. Composes
    * [[Dedup.incrementalNearDup]] (the oracle-checked batch probe) with
    * the batch_id-partition exactly-once sink; the corpus stores each
    * keeper's `band0..band{bands-1}` columns, so the per-batch probe
    * reads ONLY those (a `bands`-column pruned scan, never the text).
    *
    * Replay: with the checkpoint INTACT (foreachBatch re-fired after a
    * sink-committed crash) the pinned [[queryEpoch]] maps the batch to
    * its original (epoch, batch_id) partition, the probe excludes that
    * partition, and the dynamic overwrite rewrites it with identical
    * content. With the checkpoint LOST, the fresh epoch owns a new
    * partition subtree, so the replayed docs band-match their own
    * originals in the probe and the batch writes nothing — either way
    * the corpus is byte-identical, and no query can overwrite another
    * epoch's partitions.
    *
    * Scale note: unlike the exact sink's ValueState seen-set, the probe
    * re-reads the corpus's band columns each batch — the band-set
    * membership a drop decision needs spans `bands` state keys per doc,
    * which `transformWithState`'s per-key visit can't aggregate without
    * also poisoning state with dropped docs' bands. Pruned to `bands`
    * hash columns the scan is narrow, but it does grow with the corpus;
    * a bucketed-by-band-prefix corpus layout is the next step if this
    * becomes the bottleneck.
    */
  def startNearDupCorpusSink(docs: DataFrame, corpusPath: String,
      checkpoint: String, minTokens: Int = 1, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    requireDocSchema(docs)
    val epoch = queryEpoch(docs.sparkSession, corpusPath, checkpoint)
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val gated = batch
          .filter(TextAnalysis.tokenCount(col("text")) >= minTokens)
          .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        val corpusBands =
          try spark.read.parquet(corpusPath)
            .filter(!(col("epoch") === lit(epoch) && col("batch_id") === lit(batchId)))
            .select((0 until bands).map(b => col(s"band$b")): _*)
          catch { // first batch: no corpus yet → empty probe side
            case _: org.apache.spark.sql.AnalysisException =>
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                org.apache.spark.sql.types.StructType((0 until bands).map(b =>
                  org.apache.spark.sql.types.StructField(
                    s"band$b", org.apache.spark.sql.types.StringType))))
          }
        Dedup.incrementalNearDup(gated, corpusBands, "doc_id", "text",
            k = k, bands = bands, shingleN = shingleN)
          .withColumn("epoch", lit(epoch))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("epoch", "batch_id")
          .parquet(corpusPath)
        ()
      }
      .start()
  }

  /** Start the deduped-corpus sink. `docs` must carry `doc_id` and
    * `text`; rows under `minTokens` are dropped by the quality gate.
    */
  def startDedupedCorpusSink(docs: DataFrame, corpusPath: String,
      checkpoint: String, minTokens: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = docs.sparkSession
    import spark.implicits._
    requireDocSchema(docs)
    val epoch = queryEpoch(spark, corpusPath, checkpoint)
    val gated = docs
      .filter(TextAnalysis.tokenCount(col("text")) >= minTokens)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        TextAnalysis.fingerprint(col("text")).as("content_hash"))
      .as[CorpusDoc]
    val keepers = gated.groupByKey(_.content_hash)
      .transformWithState(new SeenHashProcessor,
        TimeMode.None(), OutputMode.Append(), initialSeen(spark, corpusPath))
    // The provider conf must read RocksDB when THIS query starts; the
    // stream captures its own cloned session then, so the session-wide
    // value is restored right after — other queries (and their existing
    // HDFS-format state checkpoints) never see the flip.
    val prior = spark.conf.getOption(ProviderKey)
    ensureRocksDb(spark)
    try {
      keepers.writeStream
        .outputMode("append")
        .trigger(trigger)
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: Dataset[CorpusDoc], batchId: Long) =>
          batch.withColumn("epoch", lit(epoch))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch", "batch_id")
            .parquet(corpusPath)
          ()
        }
        .start()
    } finally prior match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }
}
