package graft

import graft.sources.HttpSource

/** S3 acquisition seam: injected fetcher → declared-schema DataFrame,
  * first-wins dedup on the dim key (reference: kafka_producer.py:28–50).
  */
class HttpSourceSpec extends SparkSpec {
  import spark.implicits._

  test("CSV and JSONL batch sources: declared schema, corrupt lines accounted") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val dir = tmpDir("src-fmt")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/t.csv"),
      "id,name\n1,alpha\n2,beta\nnot-a-number,gamma\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/t.jsonl"),
      """{"id":1,"name":"alpha"}
        |{"id":2,"name":"beta"}
        |{broken
        |""".stripMargin)

    // Spark refuses corrupt-record-only queries over raw files — cache
    // first (the documented pattern; see loadCsv's scaladoc)
    val csv = graft.sources.Tables.loadCsv(spark, s"$dir/t.csv", schema).cache()
    assert(csv.count() === 3) // bad line kept, not dropped
    assert(csv.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(csv.filter(col("_corrupt_record").isNull)
      .select("id", "name").as[(Long, String)].collect().toSet ===
      Set((1L, "alpha"), (2L, "beta")))

    val jsonl = graft.sources.Tables.loadJsonl(spark, s"$dir/t.jsonl", schema).cache()
    assert(jsonl.count() === 3)
    assert(jsonl.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(jsonl.filter(col("_corrupt_record").isNull)
      .select("id", "name").as[(Long, String)].collect().toSet ===
      Set((1L, "alpha"), (2L, "beta")))
  }

  private val body =
    """[{"driver_number":"1","driver_name":"Max Verstappen","headshot_url":"u1"},
      |{"driver_number":"44","driver_name":"Lewis Hamilton","headshot_url":"u44"},
      |{"driver_number":"1","driver_name":"Duplicate Max","headshot_url":"dup"},
      |{"driver_number":"16","driver_name":"Charles Leclerc","extra_unknown_field":1}]""".stripMargin

  test("DSv2 graft-http: declared-schema round-trip, one partition per url") {
    import org.apache.spark.sql.functions.col
    graft.sources.HttpFetchers.register("spec-pages", {
      case u if u.endsWith("page=1") =>
        """[{"driver_number":"1","driver_name":"Max Verstappen","headshot_url":"u1"}]"""
      case u if u.endsWith("page=2") =>
        """[{"driver_number":"44","driver_name":"Lewis Hamilton","headshot_url":"u44"},
          |{"driver_number":"16","driver_name":null,"extra_unknown_field":9}]""".stripMargin
      case u => fail(s"unexpected url $u")
    })
    val df = spark.read.format("graft-http")
      .schema(graft.model.Schemas.drivers)
      .option("urls", "https://example.invalid/v1/drivers?page=1, https://example.invalid/v1/drivers?page=2")
      .option("fetcher", "spec-pages")
      .load()
    assert(df.rdd.getNumPartitions === 2) // one InputPartition per endpoint page
    val rows = df.orderBy("driver_number")
      .select("driver_number", "driver_name").collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    assert(rows.toSeq === Seq(
      ("1", Some("Max Verstappen")), ("16", None), ("44", Some("Lewis Hamilton"))))
    // unknown payload fields are dropped by the declared schema
    assert(df.columns.toSeq === Seq("driver_number", "driver_name", "headshot_url"))
    // an unregistered fetcher name fails loudly, not with an empty frame
    val err = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-http").schema(graft.model.Schemas.drivers)
        .option("url", "https://example.invalid/x")
        .option("fetcher", "never-registered").load().count()
    }
    assert(err.getMessage.contains("never-registered")
      || Option(err.getCause).exists(_.getMessage.contains("never-registered")))
  }

  test("DSv2 graft-http: column prune reaches the scan (pushed-down projection)") {
    graft.sources.HttpFetchers.register("spec-prune", _ => body)
    val df = spark.read.format("graft-http")
      .schema(graft.model.Schemas.drivers)
      .option("url", "https://example.invalid/v1/drivers")
      .option("fetcher", "spec-prune")
      .load()
      .select("driver_name")
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    // the scan itself must read ONLY the projected column — proof the
    // prune was pushed into the source, not applied after a full parse
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("driver_name"))
    assert(df.as[String].collect().sorted.toSeq ===
      Seq("Charles Leclerc", "Duplicate Max", "Lewis Hamilton", "Max Verstappen"))
  }

  test("DSv2 graft-http: bounded retry recovers from transient failures; exhausted retries fail loudly") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    graft.sources.HttpFetchers.register("spec-flaky", { _ =>
      if (calls.incrementAndGet() <= 2) throw new java.io.IOException("transient 503")
      body
    })
    val df = spark.read.format("graft-http")
      .schema(graft.model.Schemas.drivers)
      .option("url", "https://example.invalid/v1/drivers")
      .option("fetcher", "spec-flaky")
      .option("maxRetries", "2")
      .option("retryBackoffMs", "1")
      .load()
    assert(df.count() === 4)
    assert(calls.get() === 3, "expected 2 failures + 1 success")

    // with retries exhausted the partition fails with the attempt count
    calls.set(-1000) // next 1000+ calls all throw
    val err = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-http").schema(graft.model.Schemas.drivers)
        .option("url", "https://example.invalid/v1/drivers")
        .option("fetcher", "spec-flaky")
        .option("maxRetries", "1").option("retryBackoffMs", "1")
        .load().count()
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("after 2 attempt(s)"), msgs)
  }

  test("DSv2 graft-http: recordPointer reads a nested array; pagination follows nextPagePointer") {
    // three-page chain: each response nests records under /data/items and
    // names its successor under /data/next (null on the last page)
    graft.sources.HttpFetchers.register("spec-paged", {
      case u if u.endsWith("/start") =>
        """{"data":{"items":[{"driver_number":"1","driver_name":"A","headshot_url":"h"}],
          |"next":"https://example.invalid/p2"}}""".stripMargin
      case u if u.endsWith("/p2") =>
        """{"data":{"items":[{"driver_number":"2","driver_name":"B","headshot_url":"h"},
          |{"driver_number":"3","driver_name":"C","headshot_url":"h"}],
          |"next":"https://example.invalid/p3"}}""".stripMargin
      case u if u.endsWith("/p3") =>
        """{"data":{"items":[{"driver_number":"4","driver_name":"D","headshot_url":"h"}],
          |"next":null}}""".stripMargin
      case u => fail(s"unexpected url $u")
    })
    val df = spark.read.format("graft-http")
      .schema(graft.model.Schemas.drivers)
      .option("url", "https://example.invalid/start")
      .option("fetcher", "spec-paged")
      .option("recordPointer", "/data/items")
      .option("nextPagePointer", "/data/next")
      .load()
    assert(df.select("driver_number").as[String].collect().sorted.toSeq ===
      Seq("1", "2", "3", "4"))
    // the whole chain is ONE partition (one seed URL): pages stream
    // sequentially within it, memory stays one page
    assert(df.rdd.getNumPartitions === 1)

    // a chain longer than maxPages fails LOUDLY (silent truncation would
    // read as "covered everything")
    val err = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-http").schema(graft.model.Schemas.drivers)
        .option("url", "https://example.invalid/start")
        .option("fetcher", "spec-paged")
        .option("recordPointer", "/data/items")
        .option("nextPagePointer", "/data/next")
        .option("maxPages", "2")
        .load().count()
    }
    val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("maxPages=2"), msgs)
  }

  test("DSv2 graft-http: RELATIVE next-page URLs resolve against the current page") {
    // real APIs commonly return "/v1/drivers?page=2" — it must resolve
    // against the page it came from, not reach the HTTP client raw (which
    // failed with an opaque non-absolute-URI error)
    graft.sources.HttpFetchers.register("spec-relative", {
      case "https://example.invalid/v1/start" =>
        """{"items":[{"driver_number":"1","driver_name":"A","headshot_url":"h"}],
          |"next":"/v1/page2"}""".stripMargin // absolute-path relative
      case "https://example.invalid/v1/page2" =>
        """{"items":[{"driver_number":"2","driver_name":"B","headshot_url":"h"}],
          |"next":"page3"}""".stripMargin // sibling relative
      case "https://example.invalid/v1/page3" =>
        """{"items":[{"driver_number":"3","driver_name":"C","headshot_url":"h"}],
          |"next":null}""".stripMargin
      case u => fail(s"relative next-page URL not resolved: $u")
    })
    val df = spark.read.format("graft-http")
      .schema(graft.model.Schemas.drivers)
      .option("url", "https://example.invalid/v1/start")
      .option("fetcher", "spec-relative")
      .option("recordPointer", "/items")
      .option("nextPagePointer", "/next")
      .load()
    assert(df.select("driver_number").as[String].collect().sorted.toSeq ===
      Seq("1", "2", "3"))
  }

  test("jdk-http default fetcher: 2xx body returned; non-2xx fails with status+url (loopback)") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, b: String): Unit = {
      val bytes = b.getBytes("UTF-8")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/ok", ex => respond(ex, 200, body))
    // an error body that IS a JSON array — without the status check this
    // would silently parse as data
    server.createContext("/err", ex => respond(ex, 500, """["internal","error"]"""))
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = spark.read.format("graft-http")
        .schema(graft.model.Schemas.drivers)
        .option("url", s"http://127.0.0.1:$port/ok")
        .load() // no fetcher option → the real jdk-http default
      assert(df.count() === 4)

      val err = intercept[org.apache.spark.SparkException] {
        spark.read.format("graft-http").schema(graft.model.Schemas.drivers)
          .option("url", s"http://127.0.0.1:$port/err")
          .option("maxRetries", "0")
          .load().count()
      }
      val msgs = Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(msgs.contains("HTTP 500") && msgs.contains("/err"), msgs)
    } finally server.stop(0)
  }

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
