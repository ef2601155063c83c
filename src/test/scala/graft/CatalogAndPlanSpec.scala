package graft

import org.apache.spark.sql.functions._

import graft.ops.{CatalogOps, F1Ops}
import graft.sources.Tables

/** Catalog surface (S8–S11) + physical-plan shape assertions: the scale
  * properties (pushdown, pruning, broadcast) are part of correctness here.
  */
class CatalogAndPlanSpec extends SparkSpec {
  import spark.implicits._

  test("S8/S9/S10: create → introspect → drop-all reset") {
    CatalogOps.createReferenceTables(spark)
    val listed = CatalogOps.listUserTables(spark)
      .select("table_name").as[String].collect().toSet
    assert(listed.contains("race_results") && listed.contains("drivers"))
    val dropped = CatalogOps.dropAllUserTables(spark)
    assert(dropped.toSet === listed)
    assert(spark.catalog.listTables("default").collect().isEmpty)
  }

  test("S11: upsertDim = last-writer-wins merge by key") {
    val existing = Seq(("1", "Old Name", "u1"), ("44", "Lewis", "u44"))
      .toDF("driver_number", "driver_name", "headshot_url")
    val updates = Seq(("1", "Max Verstappen", "u1v2"), ("16", "Charles", "u16"))
      .toDF("driver_number", "driver_name", "headshot_url")
    val merged = CatalogOps.upsertDim(existing, updates, "driver_number")
      .orderBy("driver_number")
      .select("driver_number", "driver_name").as[(String, String)].collect()
    assert(merged.toSeq === Seq(
      ("1", "Max Verstappen"), ("16", "Charles"), ("44", "Lewis")))
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    import graft.ops.CatalogOps
    CatalogOps.saveBucketed(Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity"), "li_bucketed", "l_orderkey", 4)
    CatalogOps.saveBucketed(Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
      "ord_bucketed", "l_orderkey", 4)
    // disable broadcast so the join strategy is decided by the bucket
    // layout (at real scale neither side would fit a broadcast anyway)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), "l_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
  }

  test("partitioned fact write enables partition pruning") {
    import graft.ops.CatalogOps
    CatalogOps.saveFactPartitioned(
      Tables.lineitem(spark, sf0001)
        .withColumn("ship_year", year(col("l_shipdate")))
        .select("l_orderkey", "l_quantity", "ship_year"),
      "li_part", "ship_year")
    val q = spark.table("li_part").filter(col("ship_year") === 2000)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ship_year"),
      s"no partition pruning:\n$plan")
    assert(q.count() > 0)
    spark.sql("DROP TABLE IF EXISTS li_part")
  }

  test("temp views make the full surface reachable from pure SQL") {
    import spark.implicits._
    Tables.createTempViews(spark, sf0001)
    val n = spark.sql(
      """SELECT COUNT(*) FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey"""
    ).as[Long].head()
    assert(n === 6000L)
    assert(spark.sql("SELECT date_trunc('hour', ts) FROM events LIMIT 1").count() === 1)
  }

  test("entry smoke: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs on sf0.001 and every oracle key exists") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // spot-run the cheap ones end-to-end (full set runs in Verify)
    for (n <- Seq("q05_total_gps", "q17_season_complete"))
      assert(SparkEntry.queries(n)(spark, sf0001).count() >= 1)
  }

  test("filter + projection push down to the parquet scan (P8/column pruning)") {
    val plan = Tables.lineitem(spark, sf0001)
      .filter(col("l_suppkey") === 3)
      .select("l_orderkey", "l_linenumber")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_suppkey), EqualTo(l_suppkey,3)]"),
      s"filter not pushed:\n$plan")
    // pruned to exactly the projected + filter columns (3 of 11)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint,l_linenumber:int>"),
      s"columns not pruned:\n$plan")
  }

  test("fact⋈dim plans a broadcast join, not a shuffle join (J1)") {
    val plan = F1Ops.enrichWithDim(
      Tables.lineitem(spark, sf0001),
      Tables.supplier(spark, sf0001).withColumnRenamed("s_suppkey", "l_suppkey"),
      "l_suppkey").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }

  test("new training-data operators plan narrow where they should") {
    import graft.functions.{Similarity, TextAnalysis}
    // chunking: map + explode, zero Exchange
    val chunkPlan = TextAnalysis.chunkDocs(
      Tables.documents(spark, sf0001), "doc_id", "text", 64, 8)
      .queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("Exchange"), s"chunking shuffled:\n$chunkPlan")
    // quantize round trip: pure per-row math, zero Exchange
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val qPlan = emb
      .withColumn("deq", Similarity.dequantizeInt8(
        Similarity.quantizeInt8(col("v")), array_min(col("v")), array_max(col("v"))))
      .queryExecution.executedPlan.toString
    assert(!qPlan.contains("Exchange"), s"quantization shuffled:\n$qPlan")
    // PII scrub: narrow regexp chain, zero Exchange
    val piiPlan = Tables.documents(spark, sf0001)
      .select(TextAnalysis.scrubPii(col("text")))
      .queryExecution.executedPlan.toString
    assert(!piiPlan.contains("Exchange"), s"scrub shuffled:\n$piiPlan")
    // budget mix: exactly one Exchange — the window's group partitioning
    val mixPlan = graft.functions.Curation.tokenBudgetMix(
      Tables.documents(spark, sf0001), "source", Seq(col("doc_id")),
      TextAnalysis.tokenCount(col("text")), 800L)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(mixPlan).length === 1,
      s"budget mix should shuffle exactly once:\n$mixPlan")
  }

  test("ORC round-trip: values exact, pushdown and pruning reach the ORC scan") {
    val src = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val path = tmpDir("orc-roundtrip")
    Tables.saveOrc(src, path)
    val back = Tables.loadOrc(spark, path)
    assert(back.orderBy("l_orderkey", "l_suppkey", "l_quantity").collect().toSeq ===
      src.orderBy("l_orderkey", "l_suppkey", "l_quantity").collect().toSeq)
    // same DSv2 contract as parquet: the filter and the 1-column
    // projection must reach the ORC reader
    val plan = back.filter(col("l_suppkey") === 3).select("l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_suppkey), EqualTo(l_suppkey,3)]"),
      plan)
    assert(plan.contains("ReadSchema: struct<l_quantity:") ||
      plan.contains("l_suppkey:"), plan) // pruned read schema, not all columns
  }

  test("BareLocalFileSystem: stock LocalFileSystem behavior with setPermission a no-op") {
    val fs = new graft.sources.BareLocalFileSystem()
    fs.initialize(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    assert(fs.getRawFileSystem.isInstanceOf[graft.sources.NoChmodRawLocalFileSystem])
    val dir = tmpDir("barefs")
    val p = new org.apache.hadoop.fs.Path(s"file:$dir/x.txt")
    val out = fs.create(p)
    out.write(42)
    out.close()
    assert(fs.exists(p))
    // rename — the primitive exactly-once sinks rest on — works
    val p2 = new org.apache.hadoop.fs.Path(s"file:$dir/y.txt")
    assert(fs.rename(p, p2))
    // the permission call is a no-op: file stays readable afterwards
    fs.setPermission(p2, new org.apache.hadoop.fs.permission.FsPermission("000"))
    val in = fs.open(p2)
    assert(in.read() === 42)
    in.close()
  }

  test("sort-audit detector re-finds the qe28 knee shape and respects materialization boundaries") {
    import graft.functions.{NativeExpressions, Similarity}
    import graft.tools.SortAuditProbe
    // the detector walks explicit Exchange nodes, which AQE hides
    // inside adaptive stages — audit under AQE off, as the probe does
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // no limit() here: GlobalLimit plans its own single-partition
      // Exchange, which would (correctly) bound the narrow segment and
      // make the knee fixture vacuous
      val emb = graft.sources.Tables.embeddings(spark, sf0001)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      // the ORIGINAL qe28 shape: global orderBy directly above a heavy
      // narrow kernel chain → the RangePartitioner sampling pass would
      // execute the chain twice → MUST flag
      val knee = emb
        .withColumn("d", Similarity.dot(col("v"), col("v")))
        .orderBy(col("d"))
      assert(SortAuditProbe.audit(knee).nonEmpty, "detector blind to the qe28 shape")
      // the qe28 FIX shape: sort the cheap projection, heavy work below
      // an aggregation Exchange → clean
      val fixed = emb
        .withColumn("d", Similarity.dot(col("v"), col("v")))
        .groupBy(col("vec_id")).agg(sum(col("d")).as("d"))
        .orderBy(col("d"))
      assert(SortAuditProbe.audit(fixed).isEmpty,
        "Exchange must bound the recomputed segment")
      // a checkpoint boundary also protects the chain
      val ckpt = emb
        .withColumn("d", NativeExpressions.vecDot(col("v"), col("v")))
        .localCheckpoint(true)
        .orderBy(col("d"))
      assert(SortAuditProbe.audit(ckpt).isEmpty,
        "checkpointed RDD scan must bound the recomputed segment")
      // TakeOrderedAndProject (orderBy+limit) is not a global sort — no
      // sampling pass, no knee
      val topk = emb
        .withColumn("d", Similarity.dot(col("v"), col("v")))
        .orderBy(col("d")).limit(5)
      assert(SortAuditProbe.audit(topk).isEmpty)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("flagship standings stays whole-stage-codegen'd up to the sort") {
    val df = SparkEntry.queries("q01_standings")(spark, sf0001)
    df.collect() // materialize so AQE settles on the final plan
    val plan = df.queryExecution.executedPlan.toString
    // AQE's final plan renders whole-stage-codegen spans as "*(n)"
    assert("\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined, s"no codegen spans:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected hash agg:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"dim join must broadcast:\n$plan")
    assert(plan.contains("partial_sum"), s"agg must be partial+final:\n$plan")
  }
}
