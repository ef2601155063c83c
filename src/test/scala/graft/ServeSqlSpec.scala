package graft

import org.apache.spark.sql.DataFrame

import graft.serve.SqlReplay

/** DataFrame API ≡ SQL API, query for query: every SqlReplay entry must
  * return exactly the rows (same column names, same values, same order)
  * as its `SparkEntry.queries` twin — the end-to-end proof of the SQL
  * serving surface, including the GraftExtensions kernel registrations
  * (qd07's minhash_sig_md5, qd08's simhash64 run THROUGH spark.sql
  * here, not through the typed Column API).
  */
class ServeSqlSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  test("SQL-only replay: q01–q20 + kernel + curation/retrieval queries match the DataFrame API row for row") {
    GraftExtensions.register(spark)
    graft.sources.Tables.createTempViews(spark, sf0001)
    val names = SqlReplay.sql.keys.toSeq.sorted
    assert(names.size === 30,
      s"expected 20 reference + 2 kernel + 8 curation/retrieval queries, got $names")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf0001)
      val viaSql = SqlReplay.runText(spark, SqlReplay.sql(name))
      assert(viaSql.columns.toSeq === df.columns.toSeq,
        s"$name: SQL column names diverge from the DataFrame API")
      assert(rows(viaSql) === rows(df), s"$name: SQL result diverges")
    }
  }

  test("stage seams are namespaced: a replay never drops a user's same-named default-schema table") {
    // Round-13 ADVICE: the scripts' DROP+CTAS seams used unqualified
    // fixed names, so SqlReplay.run on qd61/qd63/qd65 destructively
    // dropped any same-named permanent table in the caller's catalog.
    // Now they live under the reserved graft_replay schema.
    GraftExtensions.register(spark)
    graft.sources.Tables.createTempViews(spark, sf0001)
    spark.sql("DROP TABLE IF EXISTS g63_sh")
    spark.sql("CREATE TABLE g63_sh USING PARQUET AS SELECT 42 AS user_col")
    try {
      SqlReplay.runText(spark, SqlReplay.sql("qd63_quality_keepers")).collect()
      // the user's table is intact, content and all
      assert(spark.table("g63_sh").collect().map(_.getInt(0)).toSeq === Seq(42),
        "replay clobbered the user's default-schema g63_sh")
      // the seams landed in the reserved schema instead
      val seams = spark.sql(s"SHOW TABLES IN ${SqlReplay.ReplaySchema}")
        .select("tableName").collect().map(_.getString(0)).toSet
      assert(seams.contains("g63_sh"),
        s"stage seam missing from the reserved schema; got $seams")
      // cleanup() removes the whole reserved namespace; user table stays
      SqlReplay.cleanup(spark)
      assert(!spark.sql("SHOW DATABASES").collect()
        .map(_.getString(0)).contains(SqlReplay.ReplaySchema),
        "cleanup left the reserved schema behind")
      assert(spark.table("g63_sh").count() === 1)
    } finally spark.sql("DROP TABLE IF EXISTS g63_sh")
  }
}
