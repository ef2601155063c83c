package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.SkewOps
import graft.streaming.RaceIngest

/** Salted aggregation correctness (skew path) and the exactly-once read
  * view over the at-least-once streaming sink.
  */
class SkewAndExactlyOnceSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals the direct aggregation on a skewed key") {
    // hot key: 'hot' has 90% of rows
    val df = (Seq.fill(900)("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.toDF("key", "v")
    val direct = df.groupBy("key")
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .orderBy("key").as[(String, Long, Long)].collect()
    val salted = SkewOps.saltedAgg(df, Seq("key"), salts = 8,
      partials = Seq(sum("v").as("ps"), count(lit(1)).as("pc")),
      combine = Seq(sum("ps").as("s"), sum("pc").as("c")))
      .orderBy("key").as[(String, Long, Long)].collect()
    assert(salted.toSeq === direct.toSeq)
    val counted = SkewOps.saltedCount(df, Seq("key"), salts = 8)
      .filter(col("key") === "hot").select("count").as[Long].head()
    assert(counted === 900L)
  }

  test("AQE skew-join: a planted hot join key is split at runtime (isSkewJoin in the final plan)") {
    // SCALE.md's join-skew posture is "AQE skew-join is on" — this pins
    // that the mechanism actually FIRES on a planted hot key, the same
    // way ScanCountSpec pins scan budgets: a join whose left side sends
    // ~80% of its bytes to one key must come out of adaptive planning
    // with the skewed partition split (SortMergeJoinExec.isSkewJoin —
    // AQE rewrites the skewed side into PartialReducerPartitionSpec
    // chunks, each joined against a duplicate of the other side's
    // partition). Thresholds are lowered to test scale because the
    // defaults (256 MB) target real clusters; factor/advisory semantics
    // are unchanged.
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffled join
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val saved = confs.keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // hot key 7: 25k rows with incompressible ~64 B payloads (md5 hex —
      // shuffle sizes are post-compression, a repetitive pad would
      // deflate under the threshold); 50 cold keys share the remaining 5k
      val left = spark.range(0, 30000).select(
        when(col("id") < 25000, lit(7L)).otherwise(col("id") % 50).as("k"),
        concat(md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string"))).as("payload"))
      val right = spark.range(0, 50).select(
        col("id").as("k"), md5(col("id").cast("string")).as("rv"))
      val joined = left.join(right, "k")
      assert(joined.count() === 30000)
      joined.collect() // finalize THIS df's adaptive plan
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      // QueryStageExec nodes are LEAVES to TreeNode.collect — expand their
      // materialized subplans by hand or the join is invisible
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val nested = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            allNodes(q.plan)
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
            allNodes(w.child)
          case _ => p.children.flatMap(allNodes)
        }
        p +: nested
      }
      val skewJoins = allNodes(finalPlan).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec if j.isSkewJoin => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec if j.isSkewJoin => j
      }
      assert(skewJoins.nonEmpty,
        s"AQE did not mark the join skew-optimized; final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("readExactlyOnce collapses duplicate rows from a replayed batch") {
    implicit val ctx = spark.sqlContext
    val out = tmpDir("eo-out")
    val msg =
      """{"grand_prix":"Bahrain","date":"2023-03-05T15:00:00+00:00","driver_number":"1","position":1,"laps_completed":57,"dnf":false,"gap_to_leader":null,"meeting_key":"m1","session_key":"s1"}"""

    // two sink runs with DIFFERENT checkpoints over the same source ≙ a
    // replay after checkpoint loss — the reference's duplicate scenario
    // (blind append would double every row; spark_ingestion.py:116–125)
    for (i <- 1 to 2) {
      val ms = MemoryStream[String]
      ms.addData(msg)
      val q = RaceIngest.startParquetSink(ms.toDF(), out, tmpDir(s"eo-cp$i"),
        Trigger.AvailableNow())
      q.awaitTermination()
    }
    // write-side exactly-once: the replayed batch overwrote its own
    // batch_id partition, so the RAW sink already has no duplicates
    assert(spark.read.parquet(out).count() === 1)
    val eo = RaceIngest.readExactlyOnce(spark, out)
    assert(eo.count() === 1) // read view agrees (kept for append-only sinks)
    assert(eo.select("points").as[Int].head() === 25)
  }
}
