package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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

  /** CSV batch source with a DECLARED schema — inference is never used
    * (it costs an extra full scan and can drift between runs; a 100 TB
    * ingest cannot afford either). Malformed lines land in
    * `_corrupt_record` (PERMISSIVE) instead of failing the scan or
    * silently disappearing — the same accounting contract as the
    * streaming JSON parse. NB: Spark refuses queries that touch ONLY the
    * corrupt column over raw files — `cache()` (or write out) before
    * filtering on it alone.
    */
  def loadCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** JSON-lines batch source, declared schema + corrupt-record column —
    * one narrow scan, no inference pass.
    */
  def loadJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** ORC batch source/sink — the other columnar warehouse format, fully
    * built into Spark. Same DSv2 contract as the parquet scans: column
    * pruning and predicate pushdown reach the file reader
    * (plan-asserted in CatalogAndPlanSpec alongside the parquet
    * equivalents).
    */
  def loadOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def saveOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  /** `events.ts` has shipped in two physical layouts across testdata
    * generations: a NANOSECOND parquet timestamp (which Spark's
    * vectorized reader rejects — PARQUET_TYPE_ILLEGAL — so it is read
    * as raw nanos via `nanosAsLong` and truncated ns→µs), and a native
    * `timestamp[us]` (isAdjustedToUTC=false, which Spark surfaces as
    * TIMESTAMP_NTZ). Both are normalized here to a microsecond
    * TimestampType — Spark's native precision — so every downstream
    * consumer (`unix_micros`, time windows, session windows) sees one
    * type. Sessions run with `spark.sql.session.timeZone=UTC`, so the
    * NTZ→TZ cast is instant-preserving and matches DuckDB's
    * `epoch_us(ts)` on the same file. Ordering ties at identical
    * microseconds are broken by event_id downstream.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => // TIMESTAMP_NTZ (or a future equivalent): reinterpret in UTC
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
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
