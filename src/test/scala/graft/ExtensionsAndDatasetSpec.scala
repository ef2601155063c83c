package graft

import org.apache.spark.sql.SparkSession

import graft.model.RaceResultMsg
import graft.ops.F1Ops

/** SQL-surface registration of the native kernels (GraftExtensions) and
  * the typed Dataset API path (SURVEY.md §1.3: case-class Encoders for
  * compile-time field checks).
  */
class ExtensionsAndDatasetSpec extends SparkSpec {

  test("native kernels are callable from SQL via GraftExtensions") {
    // a shared session may already exist (withExtensions only applies at
    // build time) → use the existing-session registration path
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT simhash64('the quick brown fox') AS sh,
        |       size(minhash_sig('a b c d e', 8, 2)) AS k,
        |       vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |       sorted_jaccard(shingle_hashes('a b c', 2),
        |                      shingle_hashes('a b c', 2)) AS jac,
        |       minhash_sig_md5('a b c', 4, 2) AS pm,
        |       simhash_md5('hello world') AS psh,
        |       md5_bucket('42', 100) AS bkt,
        |       positional_shingle_hashes('a b a b', 2) AS psp,
        |       size(md5_bucket_bigrams('a b c', 64)) AS mbb,
        |       size(xx_bucket_bigrams('a b c', 64)) AS xbb
        |""".stripMargin).head()
    assert(row.getAs[Long]("sh") !== 0L)
    assert(row.getAs[Int]("k") === 8)
    assert(row.getAs[Double]("dot") === 11.0)
    assert(row.getAs[Double]("jac") === 1.0)
    val pm = row.getAs[scala.collection.Seq[String]]("pm")
    assert(pm.length === 4 && pm.forall(s => s != null && s.length == 32))
    assert(row.getAs[String]("psh").length === 16)
    val b = row.getAs[Int]("bkt")
    assert(b >= 0 && b < 100)
    // positional: "a b" at 0 and 2 hash equal; "b a" at 1 differs
    val psp = row.getAs[scala.collection.Seq[Long]]("psp")
    assert(psp.length === 3)
    assert(psp(0) === psp(2))
    assert(psp(0) !== psp(1))
    assert(row.getAs[Int]("mbb") === 2)
    assert(row.getAs[Int]("xbb") === 2)
  }

  test("opt-in optimizer rule rewrites exact COUNT(DISTINCT) to HLL++") {
    import graft.plans.ApproxDistinctRewrite
    GraftExtensions.register(spark)
    import spark.implicits._
    (0 until 20000).map(_ % 1337).toDF("x").createOrReplaceTempView("__approx_t")
    val sql = "SELECT count(DISTINCT x) AS n FROM __approx_t"
    assert(spark.sql(sql).head().getLong(0) === 1337L) // rule off: exact
    spark.conf.set(ApproxDistinctRewrite.ConfKey, "true")
    try {
      val q = spark.sql(sql)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("approx_count_distinct"), opt)
      assert(!q.queryExecution.executedPlan.toString.contains("Expand"))
      val approx = q.head().getLong(0)
      assert(math.abs(approx - 1337L) <= 1337 * 0.15, s"approx=$approx")
    } finally spark.conf.unset(ApproxDistinctRewrite.ConfKey)
    // conf back off: exact again, same session
    assert(spark.sql(sql).head().getLong(0) === 1337L)
  }

  test("approx rewrite scope: multi-column COUNT(DISTINCT) stays exact") {
    import graft.plans.ApproxDistinctRewrite
    GraftExtensions.register(spark)
    import spark.implicits._
    (0 until 5000).map(i => ((i / 25) % 40, i % 25)).toDF("x", "y")
      .createOrReplaceTempView("__approx_t2")
    spark.conf.set(ApproxDistinctRewrite.ConfKey, "true")
    try {
      // 40×25 = 1000 distinct pairs — must stay EXACT (multi-column
      // distinct sets are out of the rewrite's declared scope)
      val q = spark.sql("SELECT count(DISTINCT x, y) AS n FROM __approx_t2")
      assert(q.head().getLong(0) === 1000L)
      assert(!q.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
    } finally spark.conf.unset(ApproxDistinctRewrite.ConfKey)
  }

  test("opt-in optimizer rule rewrites exact percentile to approx_percentile (doubles only)") {
    import graft.plans.ApproxPercentileRewrite
    GraftExtensions.register(spark)
    import spark.implicits._
    (1 to 10000).map(_.toDouble).toDF("x").createOrReplaceTempView("__pct_t")
    val sql = "SELECT percentile(x, 0.5) AS p FROM __pct_t"
    assert(spark.sql(sql).head().getDouble(0) === 5000.5) // rule off: exact
    spark.conf.set(ApproxPercentileRewrite.ConfKey, "true")
    try {
      val q = spark.sql(sql)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("percentile_approx") || opt.contains("approx_percentile"), opt)
      // accuracy 10000 on 10k rows: rank error ≤ ~1 → value within a hair
      assert(math.abs(q.head().getDouble(0) - 5000.5) <= 10.0)
      // scope: an integral column must stay exact (approx_percentile
      // would change the result type out from under the attribute)
      (1 to 100).toDF("i").createOrReplaceTempView("__pct_int")
      val qi = spark.sql("SELECT percentile(i, 0.5) AS p FROM __pct_int")
      assert(!qi.queryExecution.optimizedPlan.toString.contains("approx"))
      assert(qi.head().getDouble(0) === 50.5)
    } finally spark.conf.unset(ApproxPercentileRewrite.ConfKey)
    assert(spark.sql(sql).head().getDouble(0) === 5000.5) // off again: exact
  }

  test("typed Dataset[RaceResultMsg] round-trips the parse pipeline") {
    import spark.implicits._
    val json =
      """{"grand_prix":"Bahrain","date":"2023-03-05T15:00:00+00:00","driver_number":"1","position":1,"laps_completed":57,"dnf":false,"gap_to_leader":null,"meeting_key":"m1","session_key":"s1"}"""
    val ds = F1Ops.parseRaceJson(Seq(json).toDF("value")).as[RaceResultMsg]
    val msg = ds.head()
    assert(msg.grand_prix === Some("Bahrain"))
    assert(msg.position === Some(1))
    assert(msg.gap_to_leader === None)
    // typed transforms keep the Encoder
    val scored = ds.map(m => m.driver_number.getOrElse("?") -> m.position.getOrElse(-1))
    assert(scored.head() === (("1", 1)))
  }
}
