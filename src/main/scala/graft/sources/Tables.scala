package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders (TESTDATA.md). One parquet file per table under
  * `sfDir`. Kept as a single seam so queries never hard-code paths and the
  * scan always goes through the parquet DSv2 reader (column pruning +
  * predicate pushdown verified in `PlanSpec`).
  *
  * Scale note: at 100 TB these would be partitioned/bucketed table reads
  * (`spark.read.table`) — the seam lets that swap happen in one place.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  /** `events.ts` is a nanosecond parquet timestamp, which Spark's vectorized
    * reader rejects (PARQUET_TYPE_ILLEGAL). Read it as raw nanos
    * (`nanosAsLong`) and surface a microsecond TimestampType — Spark's
    * native precision. Truncation is ns→µs only; event ordering ties at
    * identical microseconds are broken by event_id downstream.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every fixture table as a temp view so the whole surface is
    * reachable from pure SQL (`spark.sql("SELECT … FROM lineitem")`).
    */
  def createTempViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach { name =>
      val df = if (name == "events") events(spark, sfDir) else load(spark, sfDir, name)
      df.createOrReplaceTempView(name)
    }
}
