package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Versioned model registry on the session catalog — the production
  * shape of the qd79-trained classifier (round-18 verdict: every eval
  * retrained the descent inline because no persisted-model leg
  * existed). A deployment trains ONCE, `save`s the weight vector as an
  * appended version of a catalog table, and every scorer `load`s the
  * frozen artifact — the same train/serve split the BPE merge table
  * and IVF centroid tables follow.
  *
  * Table schema: (model_name, version, feat, weight DECIMAL(20,10),
  * saved_at). Weights persist as exact DECIMALs, so the round trip is
  * bit-identical (ClassifierSpec pins load ≡ trained) and scoring
  * under the loaded vector replays in the oracle unchanged. Versions
  * are append-only: `save` takes max(version)+1 under the model name;
  * `load` defaults to the LATEST. Scale shape: the table is (dim+2)
  * rows per version — pure metadata; save/load never touch the corpus.
  */
object ModelStore {

  val DefaultTable = "graft_models"

  /** The registry is an EXTERNAL table at an explicit warehouse
    * location: a managed CREATE fails with LOCATION_ALREADY_EXISTS when
    * the directory survives a previous session (ephemeral in-memory
    * catalog + durable filesystem — exactly the restart shape), while
    * an external table re-attaches to the surviving versions — the
    * registry outlives any one session, as a model registry must.
    */
  private def ensureTable(spark: SparkSession, table: String): Unit = {
    val loc = spark.conf.get("spark.sql.warehouse.dir")
      .stripSuffix("/") + "/" + table.replace('.', '/')
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $table (
         |  model_name STRING, version INT, feat INT,
         |  weight DECIMAL(20,10), saved_at TIMESTAMP)
         |USING parquet LOCATION '$loc'""".stripMargin)
  }

  /** Append `weights` as the next version of `modelName`; returns the
    * version written. The weight vector arrives as driver metadata
    * (dim+2 entries), so the single-row max(version) read and the
    * (dim+2)-row append are both constant-cost at any corpus size.
    */
  def save(spark: SparkSession, modelName: String,
      weights: Seq[(Int, BigDecimal)],
      table: String = DefaultTable): Int = {
    import spark.implicits._
    ensureTable(spark, table)
    val next = latestVersion(spark, modelName, table).getOrElse(0) + 1
    weights.toDF("feat", "weight")
      // ONE file per version (round 20, guide §6 output sizing): a
      // local Seq parallelizes to defaultParallelism partitions, so
      // every save was appending ~32 sub-KB files for a (dim+2)-row
      // vector — after a few hundred bench/verify runs the registry
      // held 1600+ files and every latestVersion/load scan (twice per
      // qd90 run) paid the listing + per-file open cost. Same rows,
      // same schema, same round-trip identity.
      .coalesce(1)
      .select(lit(modelName).as("model_name"), lit(next).as("version"),
        col("feat"), col("weight").cast(DecimalType(20, 10)).as("weight"),
        current_timestamp().as("saved_at"))
      .write.mode(SaveMode.Append).insertInto(table)
    next
  }

  /** Latest persisted version of `modelName`, if any. */
  def latestVersion(spark: SparkSession, modelName: String,
      table: String = DefaultTable): Option[Int] = {
    ensureTable(spark, table)
    val r = spark.table(table)
      .filter(col("model_name") === modelName)
      .agg(max(col("version"))).head()
    if (r.isNullAt(0)) None else Some(r.getInt(0))
  }

  /** Load one version (default: latest) as the in-memory weight vector
    * — exact decimals, feat-ordered, ready for `scoreOnFeatures` /
    * `narrowScore`. Throws if the model (or version) is absent: a
    * serving path must fail loudly on a missing artifact, never score
    * under an implicit zero vector.
    */
  def load(spark: SparkSession, modelName: String,
      version: Option[Int] = None,
      table: String = DefaultTable): Seq[(Int, BigDecimal)] = {
    val v = version.orElse(latestVersion(spark, modelName, table))
      .getOrElse(throw new IllegalStateException(
        s"no persisted model '$modelName' in $table"))
    val rows = spark.table(table)
      .filter(col("model_name") === modelName && col("version") === v)
      .select(col("feat"), col("weight"))
      .collect()
    require(rows.nonEmpty, s"model '$modelName' version $v is empty")
    rows.map(r => r.getInt(0) -> BigDecimal(r.getDecimal(1)))
      .sortBy(_._1).toSeq
  }

  /** The registry's freshness view: one row per model, its latest
    * version and save time — what a deployment's version assertion
    * reads before serving.
    */
  def freshness(spark: SparkSession,
      table: String = DefaultTable): DataFrame = {
    ensureTable(spark, table)
    spark.table(table)
      .groupBy(col("model_name"))
      .agg(max(col("version")).as("latest_version"),
        max(col("saved_at")).as("saved_at"),
        countDistinct(col("version")).as("n_versions"))
      .orderBy(col("model_name"))
  }
}
