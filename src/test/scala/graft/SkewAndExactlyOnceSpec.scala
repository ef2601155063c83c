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
