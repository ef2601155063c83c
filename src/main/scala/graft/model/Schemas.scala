package graft.model

import org.apache.spark.sql.types._

/** Declared schemas of the reference's data model (SURVEY.md §1.2).
  *
  * The stream message schema mirrors the reference's explicit 9-field
  * StructType (reference: spark_ingestion.py:67–77); the at-rest fact table
  * adds the derived `points` column (spark_ingestion.py:95–107) and the
  * timestamp-cast `date` (spark_ingestion.py:108–110). Policy is
  * fixed/declared, never inferred: unknown JSON fields drop, missing fields
  * become NULL (`from_json` semantics).
  */
object Schemas {

  /** Kafka message payload schema (reference: spark_ingestion.py:67–77). */
  val raceResultMessage: StructType = StructType(Seq(
    StructField("grand_prix", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("driver_number", StringType, nullable = true),
    StructField("position", IntegerType, nullable = true),
    StructField("laps_completed", IntegerType, nullable = true),
    StructField("dnf", BooleanType, nullable = true),
    StructField("gap_to_leader", StringType, nullable = true),
    StructField("meeting_key", StringType, nullable = true),
    StructField("session_key", StringType, nullable = true),
  ))

  /** Persisted fact table (reference: spark_ingestion.py:23–36). */
  val raceResults: StructType = StructType(
    raceResultMessage.fields.map {
      case StructField("date", _, _, m) => StructField("date", TimestampType, nullable = true, m)
      case f => f
    } :+ StructField("points", IntegerType, nullable = false))

  /** Drivers dimension (reference: spark_ingestion.py:38–44). */
  val drivers: StructType = StructType(Seq(
    StructField("driver_number", StringType, nullable = false),
    StructField("driver_name", StringType, nullable = true),
    StructField("headshot_url", StringType, nullable = true),
  ))
}

/** Typed row for the parsed stream message (pre-derivation). */
case class RaceResultMsg(
    grand_prix: Option[String],
    date: Option[String],
    driver_number: Option[String],
    position: Option[Int],
    laps_completed: Option[Int],
    dnf: Option[Boolean],
    gap_to_leader: Option[String],
    meeting_key: Option[String],
    session_key: Option[String])

/** Typed row for the drivers dimension. */
case class Driver(driver_number: String, driver_name: Option[String], headshot_url: Option[String])
