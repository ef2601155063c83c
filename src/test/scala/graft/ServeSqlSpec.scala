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
}
