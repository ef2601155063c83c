package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** DDL / catalog surface of the reference (SURVEY.md §2.1 S8–S11):
  * CREATE TABLE IF NOT EXISTS, catalog introspection, DROP-cascade reset,
  * and the drivers-dimension upsert — re-expressed on the Spark session
  * catalog instead of Postgres system tables.
  */
object CatalogOps {

  /** S8 — declare the reference's two tables on the session catalog
    * (reference: spark_ingestion.py:23–44, kafka_producer.py:19–25).
    */
  def createReferenceTables(spark: SparkSession): Unit = {
    spark.sql(
      """CREATE TABLE IF NOT EXISTS race_results (
        |  grand_prix STRING, date TIMESTAMP, driver_number STRING,
        |  position INT, laps_completed INT, dnf BOOLEAN,
        |  gap_to_leader STRING, meeting_key STRING, session_key STRING,
        |  points INT) USING parquet""".stripMargin)
    spark.sql(
      """CREATE TABLE IF NOT EXISTS drivers (
        |  driver_number STRING, driver_name STRING, headshot_url STRING)
        |USING parquet""".stripMargin)
  }

  /** S9 — catalog introspection (reference: reset_postgres.py:22–27,
    * 35–40 reads information_schema): list user tables of a database as a
    * DataFrame.
    */
  def listUserTables(spark: SparkSession, db: String = "default"): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables(db).collect()
      .map(t => (t.name, t.tableType, t.isTemporary)).toSeq
      .toDF("table_name", "table_type", "is_temporary")
      .orderBy(col("table_name"))
  }

  /** S10 — DROP … reset loop (reference: reset_postgres.py:29–46). */
  def dropAllUserTables(spark: SparkSession, db: String = "default"): Seq[String] = {
    val names = spark.catalog.listTables(db).collect().map(_.name).toSeq
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$db`.`$n`"))
    names
  }

  /** S11 — dimension upsert (reference: kafka_producer.py:42–48
    * `INSERT … ON CONFLICT (driver_number) DO UPDATE`): last-writer-wins
    * merge of `updates` into the stored dim by key, as
    * union → row_number-dedup (updates ranked before existing) →
    * overwrite. Vanilla-Spark equivalent of MERGE INTO for a small dim.
    */
  def upsertDim(existing: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val tagged = updates.withColumn("__src", lit(0))
      .unionByName(existing.withColumn("__src", lit(1)))
    F1Ops.firstWinsDedup(tagged, Seq(key), Seq(col("__src"))).drop("__src")
  }

  /** Persist a dim snapshot (overwrite — the dim is tiny by design). */
  def saveDim(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Persist a fact table partitioned by a (low-cardinality, pruned-on)
    * column — at 100 TB the partition column is what turns a full scan
    * into partition pruning for date/session-scoped queries.
    */
  def saveFactPartitioned(df: DataFrame, table: String,
      partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .format("parquet")
      .saveAsTable(table)

  /** Persist bucketed by join key: two tables bucketed the same way join
    * WITHOUT a shuffle (Exchange elided; asserted in tests). This is the
    * co-located-join strategy for repeated large-table joins at scale —
    * pay the shuffle once at write time, never at read time.
    */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
