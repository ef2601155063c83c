package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}

import graft.ops.F1Ops

/** The reference's Structured Streaming core (SURVEY.md §2.7; reference:
  * spark_ingestion.py:80–136): Kafka-shaped source → cast → declared-schema
  * JSON parse → points derivation → completeness filter → checkpointed
  * `foreachBatch` append sink.
  *
  * The transform is source-agnostic (any DataFrame with a `value` column —
  * Kafka, MemoryStream, file, rate) which is what makes it testable without
  * a broker (SURVEY.md §7.5.4) and portable to Kinesis-style sources. The
  * plan is narrow end-to-end: parse/derive/filter pipeline in one stage, no
  * shuffle, so ingest scales with source partitions alone.
  */
object RaceIngest {

  /** P1–P6 chain — pure, batch/stream agnostic. */
  def transform(raw: DataFrame): DataFrame =
    F1Ops.deriveRace(F1Ops.parseRaceJson(raw))

  /** T1–T3: append-mode foreachBatch parquet sink with checkpoint —
    * WRITE-SIDE exactly-once.
    *
    * The reference ignores `batchId` and blind-appends, so a replayed
    * micro-batch duplicates rows (at-least-once; spark_ingestion.py:116–125,
    * SURVEY.md §4). Here each batch writes its own `batch_id=N` partition
    * with dynamic partition overwrite: a replay of batch N overwrites
    * exactly partition N with identical content — idempotent at the sink,
    * no read-side dedup required. (`readExactlyOnce` remains for sinks that
    * cannot overwrite.)
    */
  def startParquetSink(raw: DataFrame, outPath: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    transform(raw).writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
        ()
      }
      .start()

  /** Exactly-once read view over the at-least-once sink: the reference
    * ignores `batchId` and can duplicate rows on replay (spark_ingestion
    * .py:116–125; SURVEY.md §4 "exactly-once: not achieved"). Because
    * [[startParquetSink]] stamps every row with its batch id, replayed
    * batches are identifiable and a keyed read-side dedup (keep the first
    * batch per natural key) restores exactly-once semantics without
    * coordinating writers.
    */
  def readExactlyOnce(spark: org.apache.spark.sql.SparkSession, path: String,
      naturalKey: Seq[String] = Seq("session_key", "driver_number")): DataFrame =
    F1Ops.firstWinsDedup(spark.read.parquet(path), naturalKey, Seq(col("batch_id")))

  /** Kafka source wiring (S1; reference: spark_ingestion.py:80–88). Not
    * exercised in tests (no broker in the harness) but the full production
    * entry point: earliest offsets + tolerate data loss, exactly as the
    * reference configures it.
    */
  def kafkaSource(spark: org.apache.spark.sql.SparkSession, servers: String,
      topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("failOnDataLoss", "false")
      .load()

  /** Kafka re-publish sink (S4/S6; reference: kafka_consumer.py:54–62,
    * kafka_producer.py:145–151): key = driver_number, value = JSON of the
    * full record.
    */
  def toKafkaRecords(df: DataFrame): DataFrame =
    df.select(
      col("driver_number").cast("string").as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** S2 — JDBC append sink bridged through foreachBatch (reference:
    * spark_ingestion.py:116–125). Same shape as the reference's
    * `write_to_postgres`; executors open connections, the driver never
    * funnels rows. Not exercised in tests (no database in the harness).
    */
  def startJdbcSink(raw: DataFrame, jdbcUrl: String, table: String,
      props: java.util.Properties, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    transform(raw).writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").jdbc(jdbcUrl, table, props)
        ()
      }
      .start()

  /** S5 — the verification tap (reference: kafka_consumer.py:27–52 pretty-
    * prints every record): console sink on the transformed stream.
    */
  def startConsoleTap(raw: DataFrame): StreamingQuery =
    transform(raw).writeStream
      .outputMode("append")
      .format("console")
      .option("truncate", "false")
      .start()

  /** Stream-static enrichment: join the live stream against the drivers
    * dimension in-stream (the reference defers this join to serving time —
    * streamlit-app.py:41; doing it in the stream makes the sink
    * immediately queryable). Static side broadcast per micro-batch; the
    * stream stays narrow.
    */
  def transformEnriched(raw: DataFrame, drivers: DataFrame): DataFrame =
    F1Ops.enrichWithDim(transform(raw), drivers, "driver_number")

  /** A driver's live championship state. */
  case class DriverTotals(driver_number: String, points: Long, wins: Long, races: Long)

  /** Custom stateful streaming (`mapGroupsWithState`): per-driver running
    * championship totals maintained across micro-batches — the live
    * version of the serving-layer standings (the reference recomputes them
    * from Postgres on every page load; here state is incremental,
    * partitioned by driver, and checkpointed by the engine). Update mode:
    * each batch emits the new totals of drivers that scored.
    */
  def runningTotals(scored: Dataset[(String, Int)]): Dataset[DriverTotals] = {
    import scored.sparkSession.implicits._
    scored.groupByKey(_._1)
      .mapGroupsWithState[DriverTotals, DriverTotals](GroupStateTimeout.NoTimeout) {
        (driver: String, rows: Iterator[(String, Int)], state: GroupState[DriverTotals]) =>
          val prev = state.getOption.getOrElse(DriverTotals(driver, 0L, 0L, 0L))
          val batch = rows.toSeq
          val next = DriverTotals(
            driver,
            prev.points + batch.map(_._2.toLong).sum,
            prev.wins + batch.count(_._2 == 25),
            prev.races + batch.size)
          state.update(next)
          next
      }
  }

  /** [[runningTotals]] on the modern `transformWithState` API (Spark 4's
    * arbitrary-state operator, successor to `mapGroupsWithState`): state
    * lives in named, individually-evolvable `ValueState` handles backed by
    * the RocksDB state store — at scale that means state spills to local
    * disk per executor instead of living on the JVM heap, state schema can
    * evolve without checkpoint invalidation, and TTL is first-class.
    * Semantics are identical to [[runningTotals]] (StreamingSpec asserts
    * both paths batch for batch).
    */
  class DriverTotalsProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, (String, Int), DriverTotals] {
    @transient private var state: ValueState[DriverTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[DriverTotals](
        "totals", Encoders.product[DriverTotals], ttl)

    override def handleInputRows(driver: String, rows: Iterator[(String, Int)],
        timerValues: TimerValues): Iterator[DriverTotals] = {
      val prev = if (state.exists()) state.get()
        else DriverTotals(driver, 0L, 0L, 0L)
      val batch = rows.toSeq
      val next = DriverTotals(
        driver,
        prev.points + batch.map(_._2.toLong).sum,
        prev.wins + batch.count(_._2 == 25),
        prev.races + batch.size)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** [[runningTotals]] via `transformWithState` (requires the RocksDB
    * state store provider — set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`).
    */
  def runningTotalsTws(scored: Dataset[(String, Int)]): Dataset[DriverTotals] = {
    import scored.sparkSession.implicits._
    scored.groupByKey(_._1)
      .transformWithState(new DriverTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** [[runningTotalsTws]] with first-class state TTL: a driver idle for
    * `ttl` of processing time has its ValueState expired by the store,
    * so its next event restarts totals from zero — the bounded-state
    * posture for unbounded key spaces (session-scoped telemetry keys,
    * one-shot drivers) where per-key state must not outlive the key's
    * activity. TTL requires `TimeMode.ProcessingTime` (expiry is
    * store-side, against batch processing time) and the RocksDB state
    * store provider, like every `transformWithState` op here.
    */
  def runningTotalsTwsTtl(scored: Dataset[(String, Int)],
      ttl: java.time.Duration): Dataset[DriverTotals] = {
    import scored.sparkSession.implicits._
    scored.groupByKey(_._1)
      .transformWithState(new DriverTotalsProcessor(TTLConfig(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** A driver's last seen position, carried across micro-batches. */
  case class LastPosition(driver: String, position: Int)

  /** A position-change alert (emitted 0..n times per driver per batch). */
  case class PositionChange(driver_number: String, from_position: Int, to_position: Int)

  /** Custom stateful streaming with a VARIABLE number of outputs per
    * group per batch (`flatMapGroupsWithState` — the 0..n-row sibling of
    * [[runningTotals]]'s mapGroupsWithState): emit an alert row for every
    * position change a driver's events show against the last state, and
    * nothing when a batch only repeats the known position. The first
    * sighting of a driver sets state silently — an alert always has a
    * real `from_position`. State is one small record per driver,
    * partitioned by key and engine-checkpointed, so alert fan-out scales
    * with change rate, not stream rate.
    */
  def positionChangeAlerts(
      positions: Dataset[(String, Int)]): Dataset[PositionChange] = {
    import positions.sparkSession.implicits._
    positions.groupByKey(_._1)
      .flatMapGroupsWithState[LastPosition, PositionChange](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (driver: String, rows: Iterator[(String, Int)],
            state: GroupState[LastPosition]) =>
          var last = state.getOption.map(_.position).getOrElse(Int.MinValue)
          val out = Seq.newBuilder[PositionChange]
          rows.foreach { case (_, p) =>
            if (p != last) {
              if (last != Int.MinValue) out += PositionChange(driver, last, p)
              last = p
            }
          }
          state.update(LastPosition(driver, last))
          out.result().iterator
      }
  }

  /** Convenience: full pipeline → running totals, started on a memory sink
    * in update mode.
    */
  def startRunningTotals(raw: DataFrame, queryName: String): StreamingQuery = {
    val spark = raw.sparkSession
    import spark.implicits._
    val scored = transform(raw)
      .select(col("driver_number"), col("points"))
      .as[(String, Int)]
    runningTotals(scored).writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .start()
  }

  /** Stream-stream inner join with watermarks on BOTH sides — the one
    * Structured Streaming operator class the reference never touches
    * (its dimension join is static/serving-time; streamlit-app.py:41).
    * Score events join driver-profile UPDATE events (also a stream) on
    * driver plus a time-range condition: the profile must be at most
    * `maxAge` older than the score. The range bound is what makes the
    * join viable at scale — it lets the engine expire both sides' state
    * once the watermark passes (unbounded stream-stream state is the
    * classic production OOM), and rows arriving below the watermark are
    * dropped rather than joined.
    *
    * Expected schemas: scores(score_ts timestamp, driver_number string,
    * points int); profiles(profile_ts timestamp, profile_driver string,
    * team string).
    */
  def joinWithProfileUpdates(scores: DataFrame, profiles: DataFrame,
      watermark: String = "10 minutes",
      maxAge: String = "15 minutes"): DataFrame =
    scores.withWatermark("score_ts", watermark)
      .join(
        profiles.withWatermark("profile_ts", watermark),
        expr(s"""driver_number = profile_driver
                |AND profile_ts <= score_ts
                |AND profile_ts >= score_ts - INTERVAL $maxAge""".stripMargin))
      .select(col("driver_number"), col("score_ts"), col("points"),
        col("profile_ts"), col("team"))

  /** [[joinWithProfileUpdates]] with LEFT OUTER semantics: score rows
    * with no in-range profile are still emitted, null-padded — but only
    * once the watermark proves no matching profile can arrive (outer
    * stream-stream results are withheld until event time passes the
    * range bound; that is what makes the null decision final rather than
    * racy).
    */
  def joinWithProfileUpdatesOuter(scores: DataFrame, profiles: DataFrame,
      watermark: String = "10 minutes",
      maxAge: String = "15 minutes"): DataFrame =
    scores.withWatermark("score_ts", watermark)
      .join(
        profiles.withWatermark("profile_ts", watermark),
        expr(s"""driver_number = profile_driver
                |AND profile_ts <= score_ts
                |AND profile_ts >= score_ts - INTERVAL $maxAge""".stripMargin),
        "left_outer")
      .select(col("driver_number"), col("score_ts"), col("points"),
        col("profile_ts"), col("team"))

  /** Windowed event-time aggregation with watermark — the streaming-state
    * generalization the reference lacks (SURVEY.md §2.7 T8): tumbling
    * window counts/sums over an event stream.
    */
  def windowedEventAgg(events: DataFrame, tsCol: String, window_ : String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Session-window aggregation in the STREAM (the stateful sibling of
    * the batch qs03): sessions stay open in the state store while events
    * keep arriving within the gap, and a session emits (append mode)
    * once the watermark passes its end — the engine merges windows and
    * expires state, no custom state code.
    */
  def sessionizedEventAgg(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n"))
}
