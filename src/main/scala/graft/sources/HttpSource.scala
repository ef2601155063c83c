package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** S3 — the reference's HTTP/REST acquisition path (kafka_producer.py:29–31,
  * 84–104: GET /drivers, /sessions, /meetings, /session_result) as a
  * driver-side fetch → `createDataFrame` seam.
  *
  * The fetcher is injected (`String => String`: url → JSON body) so tests
  * run hermetically and production swaps in a real HTTP client. Fetching on
  * the driver is the right scale call here: the reference's API payloads
  * are KB-sized dimension/seed data; a DSv2 TableProvider is only warranted
  * if the source became large or partitioned.
  */
object HttpSource {

  /** Fetch a JSON-array endpoint into a DataFrame with a declared schema
    * (schema policy: fixed, never inferred — SURVEY.md §1.2).
    */
  def fetchJson(spark: SparkSession, fetch: String => String, url: String,
      schema: StructType): DataFrame = {
    import spark.implicits._
    val body = fetch(url)
    // JSON arrays split into one record per element by the JSON source
    val ds: Dataset[String] = spark.createDataset(Seq(body))
    spark.read.schema(schema).json(ds)
  }

  /** The reference's dim-load pipeline (kafka_producer.py:28–50): fetch the
    * drivers endpoint, first-wins dedup on the primary key, ready to upsert
    * via [[graft.ops.CatalogOps.upsertDim]].
    */
  def loadDriversDim(spark: SparkSession, fetch: String => String,
      url: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = fetchJson(spark, fetch, url, graft.model.Schemas.drivers)
      .withColumn("__arrival", monotonically_increasing_id())
    graft.ops.F1Ops.firstWinsDedup(raw, Seq("driver_number"), Seq(col("__arrival")))
      .drop("__arrival")
  }
}
