package graft

import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions
import graft.ops.{SkewOps, TimeSeriesOps}
import graft.sources.Tables

/** The as-of join (hand-computed semantics + the no-cross-product plan
  * contract) and the bloom-pruned semi join (answer preservation + real
  * map-side pruning).
  */
class AsOfAndPruneSpec extends SparkSpec {
  import spark.implicits._

  // right side: quotes per symbol; two quotes tie at ts=5 for A
  private def quotes = Seq(
    ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 5L, 12.0), ("B", 3L, 20.0),
  ).toDF("sym", "qts", "px")

  // left side: trades; one before any quote, one at an equal ts, one with
  // no right rows at all for its key
  private def trades = Seq(
    ("A", 0L, 100L), ("A", 5L, 200L), ("A", 9L, 300L),
    ("B", 2L, 400L), ("C", 7L, 500L),
  ).toDF("sym", "tts", "qty")

  test("asOfJoin: latest right row at or before each left ts, per key") {
    val got = TimeSeriesOps.asOfJoin(trades, quotes, Seq("sym"), "tts", "qts",
        rightPayload = Seq("qts", "px"), prefix = "q_")
      .select("sym", "tts", "qty", "q_qts", "q_px")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    // equal ts matches (inclusive); the ts-5 tie resolves to the greater
    // payload struct (5, 12.0); trades before any quote and keys with no
    // quotes are dropped (inner semantics = DuckDB ASOF JOIN)
    assert(got === Set(
      ("A", 5L, 200L, 5L, 12.0),
      ("A", 9L, 300L, 5L, 12.0)))
  }

  test("asOfJoin left variant keeps unmatched rows with null payload") {
    val got = TimeSeriesOps.asOfJoin(trades, quotes, Seq("sym"), "tts", "qts",
        rightPayload = Seq("qts", "px"), prefix = "q_", inner = false)
      .select("sym", "tts", "q_qts")
      .as[(String, Long, Option[Long])].collect().toSet
    assert(got === Set(
      ("A", 0L, None), ("A", 5L, Some(5L)), ("A", 9L, Some(5L)),
      ("B", 2L, None), ("C", 7L, None)))
  }

  test("asOfJoin: NULL keys never match (SQL equi-join semantics)") {
    val rights = Seq((Some("A"), 1L, 10.0), (None, 1L, 99.0))
      .toDF("sym", "qts", "px")
    val lefts = Seq((Some("A"), 5L, 1L), (None, 5L, 2L))
      .toDF("sym", "tts", "qty")
    val inner = TimeSeriesOps.asOfJoin(lefts, rights, Seq("sym"), "tts", "qts",
        rightPayload = Seq("px"), prefix = "q_")
      .select("sym", "qty", "q_px").as[(Option[String], Long, Double)]
      .collect().toSet
    // the null-key left row is dropped; the null-key right row matches
    // nothing (DuckDB ASOF JOIN ON l.k = r.k behaves identically)
    assert(inner === Set((Some("A"), 1L, 10.0)))
    val outer = TimeSeriesOps.asOfJoin(lefts, rights, Seq("sym"), "tts", "qts",
        rightPayload = Seq("px"), prefix = "q_", inner = false)
      .select("qty", "q_px").as[(Long, Option[Double])].collect().toSet
    assert(outer === Set((1L, Some(10.0)), (2L, None))) // merge_asof: null-padded
  }

  test("asOfJoin plans without any join operator — union + one keyed window") {
    val plan = TimeSeriesOps.asOfJoin(trades, quotes, Seq("sym"), "tts", "qts",
        rightPayload = Seq("qts", "px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("pointInInterval: inclusive bounds, multi-chunk intervals, no nested loop") {
    val intervals = Seq(
      (1L, "2024-01-01", "2024-01-20"), // spans multiple 7-day chunks
      (2L, "2024-02-01", "2024-02-03"),
    ).toDF("iid", "s", "e")
      .select(col("iid"), col("s").cast("date").as("s"), col("e").cast("date").as("e"))
    val points = Seq(
      (10L, "2024-01-01"), // == start → in
      (11L, "2024-01-20"), // == end → in (inclusive)
      (12L, "2024-01-21"), // one day past → out
      (13L, "2024-02-02"), // inside interval 2
      (14L, "2023-12-31"), // before everything → out
    ).toDF("pid", "p").select(col("pid"), col("p").cast("date").as("p"))
    val q = TimeSeriesOps.pointInInterval(points, intervals, "p", "s", "e",
      chunkDays = 7)
    val got = q.select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 1L), (11L, 1L), (13L, 2L)))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("countInInterval ≡ pointInInterval + count; zero-point windows absent; daily side broadcast") {
    val intervals = Seq(
      (1L, "2024-01-01", "2024-01-20"),
      (2L, "2024-02-01", "2024-02-03"), // contains no points → NO row
      (3L, "2024-01-18", "2024-01-25"), // overlaps interval 1's points
      (4L, "2024-01-20", "2024-01-01"), // INVERTED (start > end) → NO row
    ).toDF("iid", "s", "e")
      .select(col("iid"), col("s").cast("date").as("s"), col("e").cast("date").as("e"))
    val points = Seq("2024-01-01", "2024-01-01", "2024-01-20", "2024-01-21",
        "2023-12-31")
      .toDF("p").select(col("p").cast("date").as("p"))
    val fast = TimeSeriesOps.countInInterval(points, intervals, "p", "s", "e")
    val slow = TimeSeriesOps.pointInInterval(points, intervals, "p", "s", "e",
        chunkDays = 7)
      .groupBy("iid", "s", "e").agg(count(lit(1)).as("n_points"))
    assert(fast.select("iid", "n_points").as[(Long, Long)].collect().toSet ===
      slow.select("iid", "n_points").as[(Long, Long)].collect().toSet)
    // interval 2 (zero points in window) yields no row in either form;
    // interval 4 (inverted window) must not sequence()-walk the
    // descending range — pointInInterval's start<=p<=end can never
    // match it, and the fast form agrees
    val fastIds = fast.select("iid").as[Long].collect()
    assert(!fastIds.contains(2L))
    assert(!fastIds.contains(4L))
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("TopK aggregator equals the window top-k and plans with partial aggregation") {
    import graft.functions.TopKAgg
    val li = Tables.lineitem(spark, sf0001)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val viaWindow = li.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("l_suppkey", "rnk", "l_orderkey")
      .as[(Long, Int, Long)].collect().toSet
    val ds = li
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .as[(Long, Double, Long, Long)]
      .map { case (sk, p, ok, ln) => sk -> TopKAgg.Item(p, ok, ln) }
      .groupByKey(_._1).mapValues(_._2)
      .agg(new TopKAgg.TopK(3).toColumn.name("top"))
    val viaAgg = ds.flatMap { case (sk, buf) =>
        buf.items.zipWithIndex.map { case (r, i) => (sk, i + 1, r.orderkey) }
      }.collect().toSet
    assert(viaAgg === viaWindow)
    // bounded-state scale contract: partial + final object hash agg, so
    // heavy groups combine map-side instead of sorting in one reducer
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("partial_topk|ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("bloomSemiJoin equals the plain semi join and prunes before the shuffle") {
    val li = Tables.lineitem(spark, sf0001)
    val hot = Tables.orders(spark, sf0001).filter(col("o_totalprice") > 400000.0d)
    val viaBloom = SkewOps.bloomSemiJoin(li, "l_orderkey", hot, "o_orderkey",
        expectedItems = 10000L, fpp = 0.01)
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    val plain = li.join(
        hot.select(col("o_orderkey").as("l_orderkey")).distinct(),
        Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    assert(viaBloom === plain) // false positives removed by the exact join
    assert(plain.nonEmpty, "selective dim must still match something")

    // the bloom itself must prune most of the fact side map-side
    val bloom = hot.stat.bloomFilter("o_orderkey", 10000L, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val total = li.count()
    val pass = li.filter(
      NativeExpressions.bloomMightContain(col("l_orderkey"), bos.toByteArray)).count()
    assert(pass < total / 2,
      s"bloom should drop most rows before the exchange ($pass of $total passed)")
    // no false negatives: every true key survives the bloom
    assert(pass >= plain.size)
  }
}
