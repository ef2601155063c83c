package graft

import graft.sources.HttpSource

/** S3 acquisition seam: injected fetcher → declared-schema DataFrame,
  * first-wins dedup on the dim key (reference: kafka_producer.py:28–50).
  */
class HttpSourceSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """[{"driver_number":"1","driver_name":"Max Verstappen","headshot_url":"u1"},
      |{"driver_number":"44","driver_name":"Lewis Hamilton","headshot_url":"u44"},
      |{"driver_number":"1","driver_name":"Duplicate Max","headshot_url":"dup"},
      |{"driver_number":"16","driver_name":"Charles Leclerc","extra_unknown_field":1}]""".stripMargin

  test("drivers dim load: declared schema, unknown fields dropped, first-wins dedup") {
    val fetched = new java.util.concurrent.atomic.AtomicReference[String]()
    val dim = HttpSource.loadDriversDim(spark,
      url => { fetched.set(url); body }, "https://example.invalid/v1/drivers")
    assert(dim.columns.toSeq === Seq("driver_number", "driver_name", "headshot_url"))
    val rows = dim.orderBy("driver_number")
      .select("driver_number", "driver_name").as[(String, String)].collect()
    assert(rows.toSeq === Seq(
      ("1", "Max Verstappen"), ("16", "Charles Leclerc"), ("44", "Lewis Hamilton")))
    assert(fetched.get() === "https://example.invalid/v1/drivers")
  }
}
