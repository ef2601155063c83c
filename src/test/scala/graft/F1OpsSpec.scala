package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.F1Ops

/** Golden-fixture tests for the reference's F1 semantics (FIXTURES.md §A.3):
  * a canned 3-GP × 4-driver mini-season with hand-computed standings.
  */
class F1OpsSpec extends SparkSpec {
  import spark.implicits._

  // GP2: driver 44 DNFs with a classified position (0 pts); GP3: driver 16
  // still racing (position null) — must be filtered, not scored.
  private def seasonJson: Seq[String] = Seq(
    // GP1 Bahrain
    """{"grand_prix":"Bahrain","date":"2023-03-05T15:00:00+00:00","driver_number":"1","position":1,"laps_completed":57,"dnf":false,"gap_to_leader":null,"meeting_key":"m1","session_key":"s1"}""",
    """{"grand_prix":"Bahrain","date":"2023-03-05T15:00:00+00:00","driver_number":"11","position":2,"laps_completed":57,"dnf":false,"gap_to_leader":"+11.987","meeting_key":"m1","session_key":"s1"}""",
    """{"grand_prix":"Bahrain","date":"2023-03-05T15:00:00+00:00","driver_number":"44","position":3,"laps_completed":57,"dnf":false,"gap_to_leader":"+38.637","meeting_key":"m1","session_key":"s1"}""",
    """{"grand_prix":"Bahrain","date":"2023-03-05T15:00:00+00:00","driver_number":"16","position":4,"laps_completed":57,"dnf":false,"gap_to_leader":"+48.052","meeting_key":"m1","session_key":"s1"}""",
    // GP2 Jeddah — driver 44 DNF (classified P18 → 0 points)
    """{"grand_prix":"Jeddah","date":"2023-03-19T17:00:00+00:00","driver_number":"11","position":1,"laps_completed":50,"dnf":false,"gap_to_leader":null,"meeting_key":"m2","session_key":"s2"}""",
    """{"grand_prix":"Jeddah","date":"2023-03-19T17:00:00+00:00","driver_number":"1","position":2,"laps_completed":50,"dnf":false,"gap_to_leader":"+5.355","meeting_key":"m2","session_key":"s2"}""",
    """{"grand_prix":"Jeddah","date":"2023-03-19T17:00:00+00:00","driver_number":"16","position":3,"laps_completed":50,"dnf":false,"gap_to_leader":"+20.728","meeting_key":"m2","session_key":"s2"}""",
    """{"grand_prix":"Jeddah","date":"2023-03-19T17:00:00+00:00","driver_number":"44","position":18,"laps_completed":12,"dnf":true,"gap_to_leader":"38 laps","meeting_key":"m2","session_key":"s2"}""",
    // GP3 Melbourne — driver 16 still live (null position, must not score)
    """{"grand_prix":"Melbourne","date":"2023-04-02T05:00:00+00:00","driver_number":"1","position":1,"laps_completed":58,"dnf":false,"gap_to_leader":null,"meeting_key":"m3","session_key":"s3"}""",
    """{"grand_prix":"Melbourne","date":"2023-04-02T05:00:00+00:00","driver_number":"44","position":2,"laps_completed":58,"dnf":false,"gap_to_leader":"+0.179","meeting_key":"m3","session_key":"s3"}""",
    """{"grand_prix":"Melbourne","date":"2023-04-02T05:00:00+00:00","driver_number":"11","position":3,"laps_completed":58,"dnf":false,"gap_to_leader":"+27.245","meeting_key":"m3","session_key":"s3"}""",
    """{"grand_prix":"Melbourne","date":"2023-04-02T05:00:00+00:00","driver_number":"16","position":null,"laps_completed":40,"dnf":false,"gap_to_leader":"+31.0","meeting_key":"m3","session_key":"s3"}""",
  )

  private def driversDim = Seq(
    ("1", "Max Verstappen", "http://img/1"),
    ("11", "Sergio Perez", "http://img/11"),
    ("44", "Lewis Hamilton", "http://img/44"),
    ("16", "Charles Leclerc", "http://img/16"),
  ).toDF("driver_number", "driver_name", "headshot_url")

  private def season = F1Ops.deriveRace(
    F1Ops.parseRaceJson(seasonJson.toDF("value")))

  test("points ladder maps all 10 scoring positions, DNF/NULL/11+ to 0") {
    val got = spark.range(1, 13)
      .select(F1Ops.pointsLadder(col("id")).as("p")).as[Int].collect()
    assert(got.toSeq === Seq(25, 18, 15, 12, 10, 8, 6, 4, 2, 1, 0, 0))
    val nullPos = Seq[Option[Int]](None).toDF("position")
      .select(F1Ops.pointsLadder(col("position")).as("p")).as[Int].head()
    assert(nullPos === 0)
  }

  test("parse filters live-race rows and scores the rest (T9 semantics)") {
    val rows = season.collect()
    assert(rows.length === 11) // 12 messages - 1 null-position row
    assert(season.filter(col("position").isNull).count() === 0)
    // DNF classified P18 scores 0 but IS persisted (reference semantics)
    val dnf = season.filter(col("dnf") === true).select("points").as[Int].head()
    assert(dnf === 0)
  }

  test("from_json declared-schema policy: missing→NULL, unknown→dropped, malformed→dropped") {
    val weird = Seq(
      """{"grand_prix":"X","driver_number":"7","position":5,"bonus_field":42}""",
      """not-json-at-all""",
    ).toDF("value")
    val parsed = F1Ops.parseRaceJson(weird)
    assert(parsed.columns.toSeq === graft.model.Schemas.raceResultMessage.fieldNames.toSeq)
    val ok = F1Ops.deriveRace(parsed).collect()
    assert(ok.length === 1) // malformed row has null position → filtered
    val r = ok.head
    assert(r.getAs[String]("grand_prix") === "X")
    assert(r.getAs[Int]("points") === 10)
    assert(r.getAs[Any]("laps_completed") === null)
  }

  test("audited parse counts corrupt payloads and dead-letters them") {
    val mixed = Seq(
      """{"grand_prix":"X","driver_number":"7","position":5,"meeting_key":"m","session_key":"s"}""",
      """not-json-at-all""",
      """{"broken": """,
    ).toDF("value")
    val audited = F1Ops.parseRaceJsonAudited(mixed)
    assert(audited.count() === 3) // nothing silently dropped
    assert(audited.filter(col("parse_ok")).count() === 1)
    val (clean, dead) = F1Ops.splitDeadLetters(audited)
    assert(clean.columns.toSeq === graft.model.Schemas.raceResultMessage.fieldNames.toSeq)
    assert(clean.count() === 1)
    assert(dead.as[String].collect().toSet === Set("not-json-at-all", """{"broken": """))
  }

  test("null payloads (tombstones) are dead-lettered, not surfaced as all-null clean rows") {
    // from_json(null) returns a null struct whose _corrupt_record is also
    // null — parse_ok must not mistake that for a successful parse
    val mixed = Seq(
      Some("""{"grand_prix":"X","driver_number":"7","position":5,"meeting_key":"m","session_key":"s"}"""),
      None,
    ).toDF("value")
    val audited = F1Ops.parseRaceJsonAudited(mixed)
    assert(audited.count() === 2)
    val (clean, dead) = F1Ops.splitDeadLetters(audited)
    assert(clean.count() === 1)
    assert(dead.count() === 1)
    assert(dead.as[String].collect().toSeq === Seq(null))
  }

  test("flagship standings match the hand-computed season") {
    val totalGps = season.select(countDistinct("grand_prix")).as[Long].head()
    assert(totalGps === 3)
    val got = F1Ops.standings(season, driversDim, lit(totalGps))
      .select("driver_number", "driver_name", "points", "wins", "win_rate")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("1", "Max Verstappen", 68L, 2L, 66.67),
      ("11", "Sergio Perez", 58L, 1L, 33.33),
      ("44", "Lewis Hamilton", 33L, 0L, 0.0),
      ("16", "Charles Leclerc", 27L, 0L, 0.0)))
  }

  test("podium is the top-3 of the standings") {
    val p = F1Ops.podium(F1Ops.standings(season, driversDim, lit(3)))
      .select("driver_number").as[String].collect()
    assert(p.toSeq === Seq("1", "11", "44"))
  }

  test("first-wins dedup keeps the first record per key (J4)") {
    val feed = Seq(
      ("44", "Lewis Hamilton", 1L), ("44", "Duplicate Entry", 2L),
      ("1", "Max Verstappen", 3L),
    ).toDF("driver_number", "driver_name", "arrival")
    val got = F1Ops.firstWinsDedup(feed, Seq("driver_number"), Seq(col("arrival")))
      .orderBy("driver_number")
      .select("driver_number", "driver_name").as[(String, String)].collect()
    assert(got.toSeq === Seq(("1", "Max Verstappen"), ("44", "Lewis Hamilton")))
  }

  test("lookup with default fills unmatched keys (J2/J3)") {
    val sessions = Seq(("m1", "r1"), ("mX", "r2")).toDF("meeting_key", "session_key")
    val meetings = Seq(("m1", "Bahrain GP")).toDF("meeting_key", "meeting_name")
    val got = F1Ops.lookupWithDefault(sessions, meetings, "meeting_key",
      "meeting_name", lit("Inconnu"))
      .orderBy("session_key").select("meeting_name").as[String].collect()
    assert(got.toSeq === Seq("Bahrain GP", "Inconnu"))
  }

  test("season-complete gate (A5)") {
    val df = Seq(21, 22).toDF("n")
      .select(F1Ops.seasonComplete(col("n")).as("s")).as[String].collect()
    assert(df.toSeq === Seq("in_progress", "complete"))
  }

  test("to_timestamp parses ISO-8601 offsets into UTC instants") {
    val ts = season.filter(col("grand_prix") === "Melbourne")
      .select(date_format(col("date"), "yyyy-MM-dd HH:mm").as("d"))
      .distinct().as[String].head()
    assert(ts === "2023-04-02 05:00")
  }
}
