package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, KeyValueGroupedDataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}

import graft.functions.{Dedup, NativeExpressions, Similarity, TextAnalysis}

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

  /** `transformWithState` runs only on the RocksDB state store. An
    * EXPLICITLY-set non-RocksDB provider (including a deliberate
    * HDFS-backed choice — `conf.getAll` lists only explicitly-set
    * entries, unlike `getOption`, which surfaces built-in defaults) is
    * refused loudly: silently flipping it under a user who chose it
    * would break their other queries' existing state checkpoints. The
    * engine DEFAULT counts as "no choice": default RocksDB in.
    */
  private def ensureRocksDb(spark: SparkSession): Unit =
    spark.conf.getAll.get(ProviderKey) match {
      case None => spark.conf.set(ProviderKey, RocksDbProvider)
      case Some(v) if v.contains("RocksDB") => ()
      case Some(v) => throw new IllegalStateException(
        s"CorpusIngest needs the RocksDB state store for transformWithState " +
          s"(seen-hash ValueState); session has $ProviderKey=$v explicitly " +
          s"set — unset it or set it to $RocksDbProvider")
    }

  /** Set-provider → start → restore windows of concurrent
    * [[startDedupedCorpusSink]] calls must not interleave (the started
    * stream captures the session conf as of `start()`). Serialized on
    * this JVM-wide lock; see the scaladoc note on `startDedupedCorpusSink`
    * for the residual caveat about NON-graft queries started in the
    * window (a per-query conf needs `cloneSession`, which Spark does not
    * expose publicly).
    */
  private val providerFlipLock = new Object

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** True when `dir` holds actual table content — at least one
    * non-hidden entry. The corpus directory can pre-exist EMPTY of data
    * (epoch-claim and band-index bookkeeping live in `_graft_*`
    * subdirectories, which parquet readers and this check both ignore),
    * so bare `fs.exists` is not "a corpus exists"; and catching
    * `AnalysisException` around a read is too wide — it also swallows
    * unresolved-COLUMN errors, silently disabling dedup against a
    * mismatched-schema corpus. Existence checks here, column errors
    * propagate loudly.
    */
  private def hasData(fs: FileSystem, dir: Path): Boolean =
    fs.exists(dir) && fs.listStatus(dir).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }

  /** The one-time bootstrap read: the corpus's stored hash column (a
    * single-column pruned parquet scan), or empty when no corpus data
    * exists yet. Executed once per FRESH-checkpoint query start, never
    * per batch. Pointing the sink at an existing corpus WITHOUT a
    * `content_hash` column (e.g. a near-dup corpus) fails loudly here
    * instead of silently bootstrapping an empty seen-set.
    */
  private def initialSeen(spark: SparkSession,
      corpusPath: String): KeyValueGroupedDataset[String, SeenHash] = {
    import spark.implicits._
    val (fs, dir) = fsFor(spark, corpusPath)
    val seen =
      if (!hasData(fs, dir)) spark.emptyDataset[SeenHash] // first ever start
      else spark.read.parquet(corpusPath)
        .select(col("content_hash")).distinct().as[SeenHash]
    seen.groupByKey(_.content_hash)
  }

  // ------------------------------------------------------ epoch claims

  /** Bookkeeping directory under the corpus: one zero-byte claim file
    * per epoch ever pinned. Underscore-prefixed, so parquet partition
    * discovery never sees it.
    */
  private val ClaimsDir = "_graft_epochs"

  private def claimedEpochs(fs: FileSystem, claims: Path): Seq[Long] =
    if (!fs.exists(claims)) Nil
    else fs.listStatus(claims).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("epoch-")) n.stripPrefix("epoch-").toLongOption else None
    }

  /** Atomically claim the first free epoch ≥ `floor` by creating
    * `<corpus>/_graft_epochs/epoch-N` with overwrite=false — the
    * create-exclusive is the arbitration, so two queries pinning
    * CONCURRENTLY against the same corpus get DISTINCT epochs (the
    * round-7 design derived the epoch from the corpus max alone, and two
    * fresh starts racing before either wrote data could both pin the
    * same value). A crash after the claim but before the checkpoint
    * marker orphans the claim — a harmless gap in the epoch sequence.
    */
  private def claimEpoch(fs: FileSystem, corpusDir: Path, floor: Long): Long = {
    val claims = new Path(corpusDir, ClaimsDir)
    fs.mkdirs(claims)
    var cand = math.max(floor, claimedEpochs(fs, claims).foldLeft(-1L)(math.max) + 1L)
    while (true) {
      val f = new Path(claims, s"epoch-$cand")
      try {
        fs.create(f, false).close()
        return cand
      } catch {
        case e: java.io.IOException =>
          if (fs.exists(f)) cand += 1L // lost the race for this value — bump
          else throw e                 // a real FS failure, not contention
      }
    }
    -1L // unreachable
  }

  /** Per-checkpoint EPOCH: the corpus is partitioned by
    * (`epoch`, `batch_id`) and a query only ever overwrites partitions
    * under its OWN epoch, so no sequence of checkpoints — fresh
    * adoptions, lost-checkpoint replays, or an OLD checkpoint resumed
    * after a newer query has grown the corpus — can dynamically
    * overwrite another query's keepers. (A single-level `base+batchId`
    * scheme still collided when an old checkpoint resumed with new
    * batches beyond its original range.) The epoch is pinned in
    * `<checkpoint>/graft-epoch` at first start, via the checkpoint's
    * Hadoop filesystem:
    *  - the value is CLAIMED in the corpus directory first
    *    ([[claimEpoch]]'s atomic create-exclusive), so concurrent fresh
    *    starts against one corpus pin distinct epochs;
    *  - a RESTART of the same checkpoint re-reads its pinned epoch —
    *    batch N keeps mapping to the same partition, preserving the
    *    replay idempotence of the dynamic-partition-overwrite sink;
    *  - an empty/unreadable marker (crash between create and write) is
    *    treated as ABSENT and re-derived — never a bricked checkpoint.
    */
  private def queryEpoch(spark: SparkSession, corpusPath: String,
      checkpoint: String): Long = {
    val cp = new Path(checkpoint)
    val fs = cp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(cp, "graft-epoch")
    val pinned: Option[Long] =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        val txt = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
        txt.toLongOption // empty/garbled marker == absent, re-derive below
      }
    pinned.getOrElse {
      val (corpusFs, corpusDir) = fsFor(spark, corpusPath)
      val floor =
        if (!hasData(corpusFs, corpusDir)) 0L
        else {
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
        }
      val epoch = claimEpoch(corpusFs, corpusDir, floor)
      fs.mkdirs(cp)
      // write-then-rename: a crash mid-write must not leave a parseable
      // PREFIX (e.g. "1" of "12") that pins a wrong — possibly another
      // checkpoint's — epoch; rename is atomic on HDFS and local FS
      val tmp = new Path(cp, s"graft-epoch.tmp")
      val out = fs.create(tmp, true)
      try out.write(epoch.toString.getBytes("UTF-8")) finally out.close()
      if (fs.rename(tmp, marker)) epoch
      else { // lost a concurrent pin race on the CHECKPOINT — adopt the
        fs.delete(tmp, false) // winner; our claim stays as a gap
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

  // ------------------------------------------------- bucketed band index

  /** The near-dup sink's probe index: a sidecar parquet table under
    * `<corpus>/_graft_bands` (hidden from the corpus's own readers) with
    * one row per keeper band value, laid out
    * `pfx=<prefix>/epoch=N/batch_id=M/` where `pfx` is the band hash's
    * first `prefixLen` hex chars. A micro-batch's probe prunes to the
    * buckets its OWN band prefixes hit, so probe bytes-read per batch is
    * O(matching buckets), NOT O(corpus) — the same fix the exact sink
    * got via ValueState, expressed as partition pruning because a band
    * MEMBERSHIP probe (does any stored band equal any of this doc's
    * `bands` hashes?) spans keys and can't be a per-key state lookup.
    */
  private val BandsDir = "_graft_bands"
  private val BandsMetaFile = "_graft_meta"

  private def bandsMeta(k: Int, bands: Int, shingleN: Int, prefixLen: Int): String =
    s"k=$k bands=$bands shingleN=$shingleN prefixLen=$prefixLen"

  private def bandIndexSchema(): StructType = StructType(Seq(
    StructField("band", IntegerType), StructField("bh", StringType),
    StructField("pfx", StringType), StructField("epoch", LongType),
    StructField("batch_id", LongType)))

  /** Ensure `<corpus>/_graft_bands` exists and matches this sink's LSH
    * parameters; called once at query start.
    *  - no corpus yet → create the index dir and pin the parameters;
    *  - corpus data but no index (a round-7-layout corpus being adopted)
    *    → ONE-TIME backfill from the corpus's stored band columns,
    *    written to `_graft_bands.tmp` then atomically renamed so a crash
    *    mid-backfill can never leave a partial index that later batches
    *    would trust (a partial probe side silently re-admits near-dups);
    *  - index present with DIFFERENT parameters → refuse loudly (probing
    *    bands built under another k/bands/shingleN is silent semantic
    *    drift, not an error Spark would surface).
    */
  private def ensureBandIndex(spark: SparkSession, corpusPath: String,
      k: Int, bands: Int, shingleN: Int, prefixLen: Int): Unit = {
    val (fs, corpusDir) = fsFor(spark, corpusPath)
    val idx = new Path(corpusDir, BandsDir)
    val expected = bandsMeta(k, bands, shingleN, prefixLen)
    def readMeta(at: Path): Option[String] = {
      val f = new Path(at, BandsMetaFile)
      if (!fs.exists(f)) None
      else {
        val in = fs.open(f)
        try Some(new String(in.readAllBytes(), "UTF-8").trim) finally in.close()
      }
    }
    def writeMeta(at: Path): Unit = {
      val out = fs.create(new Path(at, BandsMetaFile), true)
      try out.write(expected.getBytes("UTF-8")) finally out.close()
    }
    if (fs.exists(idx)) {
      val got = readMeta(idx)
      require(got.contains(expected),
        s"band index at $idx was built with ${got.getOrElse("unknown parameters")} " +
          s"but this sink uses $expected — use matching k/bands/shingleN/prefixLen " +
          "or rebuild the index (delete the directory to trigger a backfill)")
    } else if (hasData(fs, corpusDir)) {
      // adoption backfill: explode the stored band columns ONCE. A corpus
      // without band columns (e.g. an exact-dedup corpus at this path)
      // fails loudly right here on column resolution.
      val tmp = new Path(corpusDir, BandsDir + ".tmp")
      fs.delete(tmp, true)
      Dedup.bandsLong(
          spark.read.parquet(corpusPath)
            .select((0 until bands).map(b => col(s"band$b")) :+
              col("epoch").cast("long").as("epoch") :+
              col("batch_id").cast("long").as("batch_id"): _*),
          bands, Seq("epoch", "batch_id"))
        .withColumn("pfx", substring(col("bh"), 1, prefixLen))
        .select("band", "bh", "pfx", "epoch", "batch_id")
        .write.mode("overwrite")
        .partitionBy("pfx", "epoch", "batch_id")
        .parquet(tmp.toString)
      writeMeta(tmp)
      if (!fs.rename(tmp, idx)) {
        // lost a concurrent-adoption race; the winner's index must match
        fs.delete(tmp, true)
        require(readMeta(idx).contains(expected),
          s"concurrent band-index build at $idx finished with different parameters")
      }
    } else {
      fs.mkdirs(idx)
      writeMeta(idx)
    }
  }

  /** The per-batch benchmark-contamination gate (qd22's
    * [[TextAnalysis.decontaminate]] as a sink stage): a batch doc
    * sharing ANY token `n`-gram with the benchmark set is dropped
    * before it can reach the corpus — the STREAMING form of the
    * batch-only qd38 report (which can only tell you AFTER the fact
    * that an eval row leaked into training data). The gram set is built
    * once at query start (eval benchmarks are tiny) and persisted; each
    * batch pays one batch-sized gram explode + a broadcast semi-probe —
    * the corpus is never touched, nothing shuffles but batch ids.
    */
  private def contaminationGate(docs: DataFrame,
      benchGrams: Option[DataFrame], n: Int): DataFrame =
    benchGrams.fold(docs) { bg =>
      val hit = docs.select(col("doc_id"),
          explode(NativeExpressions.shingleHashes(col("text"), n)).as("__g"))
        .join(broadcast(bg), "__g")
        .select(col("doc_id")).distinct()
      docs.join(hit, Seq("doc_id"), "left_anti")
    }

  /** Distinct benchmark gram hashes, persisted for the life of the
    * query (re-shingling the benchmark every micro-batch would re-read
    * its source every trigger). Lifetime: the cache entry is
    * benchmark-sized (KBs–MBs) and lives until session end — the
    * CacheManager holds it past query stop, which is deliberate (a
    * restarted sink reuses it) and bounded (one entry per gated sink
    * start, not per batch).
    */
  private def benchGramSet(benchmark: Option[DataFrame],
      benchTextCol: String, n: Int): Option[DataFrame] =
    benchmark.map { b =>
      b.select(explode(
          NativeExpressions.shingleHashes(col(benchTextCol), n)).as("__g"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** The per-batch probe side: stored band rows from buckets matching
    * the batch's own prefixes, minus the batch's own (epoch, batch_id)
    * partition (an intact-checkpoint REPLAY must not probe against the
    * partition it is about to rewrite). `pfx`/`epoch`/`batch_id` are
    * partition columns, so these filters prune DIRECTORIES — the scan
    * never touches non-matching buckets, and feeding it an explicit
    * schema keeps an empty index (fresh corpus) a plain empty relation.
    */
  private[streaming] def probeBands(spark: SparkSession, corpusPath: String,
      epoch: Long, batchId: Long, pfxs: Seq[String]): DataFrame =
    spark.read.schema(bandIndexSchema())
      .parquet(new Path(new Path(corpusPath), BandsDir).toString)
      .filter(col("pfx").isin(pfxs: _*) &&
        !(col("epoch") === lit(epoch) && col("batch_id") === lit(batchId)))
      .select(col("band"), col("bh"))

  /** Start the NEAR-dup-deduped corpus sink — the fuzzy form of
    * [[startDedupedCorpusSink]]: a batch doc is dropped when it LSH
    * band-matches the already-ingested corpus (near-dups arriving in
    * later micro-batches are caught, not just exact copies) or a
    * smaller-id doc of its own batch. Composes
    * [[Dedup.incrementalNearDupFromSig]] (the oracle-checked batch
    * probe, qd37) with the batch_id-partition exactly-once sink; each
    * batch's keepers land in the corpus (with their `band0..` columns)
    * AND in the bucketed [[BandsDir]] probe index.
    *
    * Replay: with the checkpoint INTACT (foreachBatch re-fired after a
    * sink-committed crash) the pinned [[queryEpoch]] maps the batch to
    * its original (epoch, batch_id) partition, the probe excludes that
    * partition, and the dynamic overwrite rewrites corpus AND index
    * partitions with identical content. With the checkpoint LOST, the
    * fresh epoch owns a new partition subtree, so the replayed docs
    * band-match their own originals in the probe and the batch writes
    * nothing — either way the corpus is byte-identical, and no query can
    * overwrite another epoch's partitions. A crash BETWEEN the corpus
    * write and the index write re-fires the batch (the checkpoint offset
    * commits only after foreachBatch returns), which rewrites both
    * partitions identically — the index can never stay behind the corpus.
    *
    * Scale note: the probe reads only the index buckets matching the
    * batch's own band prefixes — per-batch probe bytes are
    * O(matching buckets), independent of how many OTHER buckets the
    * corpus has grown (StreamingSpec pins this with a bytes-read
    * listener). Bucket fan-out is 16^prefixLen; raise `prefixLen` to 2
    * (256 buckets) when corpus band rows per bucket get large enough
    * that a trickle batch's probe still reads too much.
    */
  def startNearDupCorpusSink(docs: DataFrame, corpusPath: String,
      checkpoint: String, minTokens: Int = 1, k: Int = 16, bands: Int = 4,
      shingleN: Int = 3, prefixLen: Int = 1,
      benchmark: Option[DataFrame] = None, benchTextCol: String = "text",
      benchGramN: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    requireDocSchema(docs)
    require(prefixLen >= 1 && prefixLen <= 8, s"prefixLen must be in [1,8], got $prefixLen")
    val epoch = queryEpoch(docs.sparkSession, corpusPath, checkpoint)
    ensureBandIndex(docs.sparkSession, corpusPath, k, bands, shingleN, prefixLen)
    val benchGrams = benchGramSet(benchmark, benchTextCol, benchGramN)
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val gated = contaminationGate(
          batch
            .filter(TextAnalysis.tokenCount(col("text")) >= minTokens)
            .select(col("doc_id").cast("long").as("doc_id"), col("text")),
          benchGrams, benchGramN)
        // signatures once (persisted), THEN the prefix set — ≤16^prefixLen
        // distinct single-chunk strings, a metadata-sized driver collect
        val sig = Dedup.lshSignature(gated, "text", k, bands, shingleN)
        val pfxs = sig.select(explode(array((0 until bands).map(b =>
            substring(col(s"band$b"), 1, prefixLen)): _*)).as("p"))
          .distinct().as[String].collect().toSeq
        val keepers = Dedup.incrementalNearDupFromSig(sig,
            probeBands(spark, corpusPath, epoch, batchId, pfxs),
            "doc_id", bands)
        keepers
          .withColumn("epoch", lit(epoch))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("epoch", "batch_id")
          .parquet(corpusPath)
        Dedup.bandsLong(keepers, bands, Nil)
          .withColumn("pfx", substring(col("bh"), 1, prefixLen))
          .withColumn("epoch", lit(epoch))
          .withColumn("batch_id", lit(batchId))
          .select("band", "bh", "pfx", "epoch", "batch_id")
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("pfx", "epoch", "batch_id")
          .parquet(new Path(new Path(corpusPath), BandsDir).toString)
        ()
      }
      .start()
  }

  // ---------------------------------------------- semantic (SemDeDup) sink

  /** The semantic sink's probe index: `<corpus>/_graft_cells`, one row
    * per keeper (doc_id, emb, cell) laid out `cell=N/epoch/batch_id` —
    * the [[BandsDir]] bucketing discipline with IVF cells as the
    * buckets: SemDeDup only ever compares vectors sharing a cell
    * (qe10's equi-join rule), so a batch's probe prunes to the cell
    * DIRECTORIES its own docs land in.
    */
  private val CellsDir = "_graft_cells"

  /** Cell assignment is only stable under the SAME centroids — pin
    * their exact bytes, not just the shape.
    */
  private def centroidFingerprint(cm: Array[Array[Double]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bb = java.nio.ByteBuffer.allocate(8)
    cm.foreach(_.foreach { d =>
      bb.clear(); bb.putLong(java.lang.Double.doubleToLongBits(d))
      md.update(bb.array())
    })
    md.digest().map("%02x".format(_)).mkString
  }

  private def cellsMeta(cm: Array[Array[Double]]): String =
    s"nCells=${cm.length} dim=${cm.headOption.map(_.length).getOrElse(0)} " +
      s"centroids=${centroidFingerprint(cm)}"

  private def cellIndexSchema(): StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("emb", ArrayType(DoubleType)),
    StructField("cell", IntegerType), StructField("epoch", LongType),
    StructField("batch_id", LongType)))

  /** [[ensureBandIndex]] for the cell index: create-and-pin on a fresh
    * corpus, ONE atomic backfill when adopting a corpus that already
    * holds (embedding, cell) columns, loud refusal when the pinned
    * centroids differ from this sink's (probing cells assigned under
    * other centroids silently misses near-dups).
    */
  private def ensureCellIndex(spark: SparkSession, corpusPath: String,
      cm: Array[Array[Double]]): Unit = {
    val (fs, corpusDir) = fsFor(spark, corpusPath)
    val idx = new Path(corpusDir, CellsDir)
    val expected = cellsMeta(cm)
    def readMeta(at: Path): Option[String] = {
      val f = new Path(at, BandsMetaFile)
      if (!fs.exists(f)) None
      else {
        val in = fs.open(f)
        try Some(new String(in.readAllBytes(), "UTF-8").trim) finally in.close()
      }
    }
    def writeMeta(at: Path): Unit = {
      val out = fs.create(new Path(at, BandsMetaFile), true)
      try out.write(expected.getBytes("UTF-8")) finally out.close()
    }
    if (fs.exists(idx)) {
      require(readMeta(idx).contains(expected),
        s"cell index at $idx was built under different centroids/shape " +
          s"(${readMeta(idx).getOrElse("unknown")} vs $expected) — use the " +
          "original centroids or delete the index to trigger a backfill")
    } else if (hasData(fs, corpusDir)) {
      val tmp = new Path(corpusDir, CellsDir + ".tmp")
      fs.delete(tmp, true)
      spark.read.parquet(corpusPath)
        .select(col("doc_id").cast("long").as("doc_id"),
          col("embedding").cast("array<double>").as("emb"),
          col("cell").cast("int").as("cell"),
          col("epoch").cast("long").as("epoch"),
          col("batch_id").cast("long").as("batch_id"))
        .write.mode("overwrite")
        .partitionBy("cell", "epoch", "batch_id")
        .parquet(tmp.toString)
      writeMeta(tmp)
      if (!fs.rename(tmp, idx)) {
        fs.delete(tmp, true)
        require(readMeta(idx).contains(expected),
          s"concurrent cell-index build at $idx finished with different centroids")
      }
    } else {
      fs.mkdirs(idx)
      writeMeta(idx)
    }
  }

  /** Stored same-cell vectors, minus the batch's own partition (replay
    * must not probe what it is about to rewrite). `cell`/`epoch`/
    * `batch_id` prune directories.
    */
  private[streaming] def probeCells(spark: SparkSession, corpusPath: String,
      epoch: Long, batchId: Long, cells: Seq[Int]): DataFrame =
    spark.read.schema(cellIndexSchema())
      .parquet(new Path(new Path(corpusPath), CellsDir).toString)
      .filter(col("cell").isin(cells: _*) &&
        !(col("epoch") === lit(epoch) && col("batch_id") === lit(batchId)))
      .select(col("cell"), col("emb").as("__corpus_emb"))

  /** Start the SEMANTIC-dedup corpus sink — SemDeDup (Abbas et al.
    * 2023) as an incremental stream: a batch doc is dropped when some
    * SAME-CELL vector already in the corpus, or a smaller-id same-cell
    * doc of its own batch, has cosine ≥ `threshold` with it. Completes
    * the sink family: exact (state-backed hashes), lexical near-dup
    * (LSH bands), semantic (embedding cells).
    *
    * `centroids` is the qe08-shaped (cell_id, centroid) table — fit
    * offline ([[Similarity.Ivf.fit]]) and FIXED for the life of the
    * corpus; the index pins their exact bytes and refuses drift.
    *
    * Scale shape: cell assignment is the narrow kernel; the batch's
    * distinct cell ids are a metadata-sized driver collect (≤ nCells);
    * the probe reads ONLY those cell directories minus the batch's own
    * partition; candidate pairs are cell equi-joins (never all-pairs,
    * the qe10 rule). Replay: intact checkpoint → same (epoch,
    * batch_id) partition rewritten identically (probe excludes it);
    * lost checkpoint → fresh epoch, replayed docs cosine-match their
    * originals in the probe and write nothing. A crash between the
    * corpus and index writes re-fires the batch and rewrites both.
    */
  def startSemanticDedupCorpusSink(docs: DataFrame, corpusPath: String,
      checkpoint: String, centroids: DataFrame, threshold: Double = 0.9,
      minTokens: Int = 1,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    requireDocSchema(docs)
    require(docs.columns.contains("embedding"),
      s"semantic sink input needs an embedding column; got ${docs.columns.mkString(", ")}")
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val epoch = queryEpoch(docs.sparkSession, corpusPath, checkpoint)
    val cm = Similarity.Ivf.centroidMatrix(centroids)
    ensureCellIndex(docs.sparkSession, corpusPath, cm)
    docs.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val assigned = batch
          .filter(TextAnalysis.tokenCount(col("text")) >= minTokens)
          .select(col("doc_id").cast("long").as("doc_id"), col("text"),
            col("embedding").cast("array<double>").as("emb"))
          .withColumn("cell",
            element_at(NativeExpressions.nearestCells(col("emb"), cm, 1), 1))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cellsHit = assigned.select("cell").distinct()
          .collect().map(_.getInt(0)).toSeq
        val vsCorpus = assigned
          .join(probeCells(spark, corpusPath, epoch, batchId, cellsHit), "cell")
          .filter(round(Similarity.cosine(col("emb"), col("__corpus_emb")), 6)
            >= threshold)
          .select(col("doc_id"))
        val vsBatch = assigned.select(col("doc_id"), col("cell"), col("emb"))
          .join(assigned.select(col("doc_id").as("__b_id"), col("cell"),
            col("emb").as("__b_emb")), "cell")
          .filter(col("__b_id") < col("doc_id") &&
            round(Similarity.cosine(col("emb"), col("__b_emb")), 6) >= threshold)
          .select(col("doc_id"))
        // persisted: BOTH writes below consume keepers — unmaterialized,
        // each would re-run the probe read, both cosine joins, and the
        // anti-join (the near-dup sink gets the same effect from
        // incrementalNearDupFromSig's eager checkpoint)
        val keepers = assigned
          .join(vsCorpus.union(vsBatch).distinct(), Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("text"), col("emb").as("embedding"),
            col("cell"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        keepers
          .withColumn("epoch", lit(epoch))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("epoch", "batch_id")
          .parquet(corpusPath)
        keepers
          .select(col("doc_id"), col("embedding").as("emb"), col("cell"))
          .withColumn("epoch", lit(epoch))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("cell", "epoch", "batch_id")
          .parquet(new Path(new Path(corpusPath), CellsDir).toString)
        keepers.unpersist(false)
        assigned.unpersist(false)
        ()
      }
      .start()
  }

  /** Start the deduped-corpus sink. `docs` must carry `doc_id` and
    * `text`; rows under `minTokens` are dropped by the quality gate.
    *
    * Conf-flip caveat: the RocksDB provider conf must read RocksDB when
    * THIS query starts (the stream captures its own session-conf copy at
    * `start()`), so the session value is set before and restored right
    * after, under [[providerFlipLock]] — concurrent corpus-sink starts
    * serialize and never see each other's flip. A NON-graft streaming
    * query started concurrently inside that window from another thread
    * still captures the flipped value (Spark exposes no public per-query
    * conf or `cloneSession`); if that query carries an HDFS-format state
    * checkpoint, start it outside a corpus-sink start window.
    */
  def startDedupedCorpusSink(docs: DataFrame, corpusPath: String,
      checkpoint: String, minTokens: Int = 1,
      benchmark: Option[DataFrame] = None, benchTextCol: String = "text",
      benchGramN: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = docs.sparkSession
    import spark.implicits._
    requireDocSchema(docs)
    val epoch = queryEpoch(spark, corpusPath, checkpoint)
    // the contamination gate runs in foreachBatch (AFTER the state
    // probe): a contaminated doc claims its hash in state but never
    // lands in the corpus — any later doc with the same hash is a
    // duplicate of a contaminated doc (same normalized text, so the
    // same grams up to case/whitespace) and dropping it too is the
    // gate's intent, not a loss
    val gated = docs
      .filter(TextAnalysis.tokenCount(col("text")) >= minTokens)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        TextAnalysis.fingerprint(col("text")).as("content_hash"))
      .as[CorpusDoc]
    val keepers = gated.groupByKey(_.content_hash)
      .transformWithState(new SeenHashProcessor,
        TimeMode.None(), OutputMode.Append(), initialSeen(spark, corpusPath))
    providerFlipLock.synchronized {
      val prior = spark.conf.getAll.get(ProviderKey)
      ensureRocksDb(spark)
      // built AFTER the provider check — a refused start must not leave
      // a persisted gram set behind
      val benchGrams = benchGramSet(benchmark, benchTextCol, benchGramN)
      try {
        keepers.writeStream
          .outputMode("append")
          .trigger(trigger)
          .option("checkpointLocation", checkpoint)
          .foreachBatch { (batch: Dataset[CorpusDoc], batchId: Long) =>
            contaminationGate(batch.toDF(), benchGrams, benchGramN)
              .withColumn("epoch", lit(epoch))
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
}
