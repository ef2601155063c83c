package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftExtensions
import graft.sources.Tables

/** SQL-only serving surface: the full q01–q20 reference query set
  * (the serving-layer queries of the reference's streamlit app —
  * standings, points ladder, podium, per-GP classification, JSON
  * round-trips, season gate) re-stated as Spark SQL over
  * [[Tables.createTempViews]], plus kernel-backed queries exercising
  * the [[GraftExtensions]] SQL function registrations (minhash_sig_md5,
  * simhash64). A SQL-first consumer — a JDBC/Thrift gateway, a notebook
  * user, `spark-sql` — gets the same results as the DataFrame API:
  * ServeSqlSpec asserts row-for-row equality against
  * `SparkEntry.queries` for every entry here.
  *
  * Dialect note: these are SPARK SQL texts. They intentionally differ
  * from `SparkEntry.oracleSql` (the DuckDB replay used by the
  * correctness harness) exactly where the dialects diverge —
  * `get_json_object` for `json_extract_string`, `date_format` for
  * `strftime`, `to_json(struct(...))` (Spark omits null fields by
  * default) for the `struct_pack` CASE — and nowhere else, so the two
  * files read as the same query in two dialects. Plans are identical
  * to the DataFrame side's (same Catalyst pipeline), so every scale
  * property (broadcasts, pushdown, no SortMergeJoin in the flagship)
  * carries over unchanged.
  */
object SqlReplay {

  private val standings =
    """SELECT s.s_suppkey, s.s_name,
      |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS points,
      |  COUNT(*) FILTER (WHERE l.l_linenumber = 1) AS wins,
      |  ROUND(COUNT(*) FILTER (WHERE l.l_linenumber = 1)
      |        / (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) * 100, 2) AS win_rate
      |FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |GROUP BY s.s_suppkey, s.s_name
      |ORDER BY points DESC, s.s_suppkey""".stripMargin

  private val pointsCase =
    """CASE l_linenumber WHEN 1 THEN 25 WHEN 2 THEN 18 WHEN 3 THEN 15 WHEN 4 THEN 12
      |    WHEN 5 THEN 10 WHEN 6 THEN 8 WHEN 7 THEN 6 WHEN 8 THEN 4 WHEN 9 THEN 2
      |    WHEN 10 THEN 1 ELSE 0 END""".stripMargin

  /** Spark SQL text per reference query (q01–q20) + kernel replays. */
  val sql: Map[String, String] = Map(
    "q01_standings" -> standings,

    "q02_points_ladder" ->
      s"""SELECT l_orderkey, l_linenumber, $pointsCase AS points
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_points_standings" ->
      s"""SELECT l_suppkey, CAST(SUM($pointsCase) AS BIGINT) AS season_points
         |FROM lineitem GROUP BY l_suppkey
         |ORDER BY season_points DESC, l_suppkey""".stripMargin,

    "q04_wins" ->
      """SELECT l_suppkey, COUNT(*) AS wins FROM lineitem
        |WHERE l_linenumber = 1 GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q05_total_gps" ->
      "SELECT COUNT(DISTINCT o_orderdate) AS total_gps FROM orders",

    "q06_distinct_flags" ->
      """SELECT DISTINCT l_returnflag AS flag FROM lineitem
        |WHERE l_returnflag IS NOT NULL ORDER BY flag""".stripMargin,

    "q07_lookup_default" ->
      """SELECT n.n_nationkey, n.n_name, COALESCE(r.r_name, 'Inconnu') AS region_name
        |FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY n.n_nationkey""".stripMargin,

    "q08_fact_dim_join" ->
      """SELECT o.o_orderkey, o.o_totalprice, c.c_name
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,

    "q09_dedup_first" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q10_podium" -> (standings + " LIMIT 3"),

    "q11_classification" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_suppkey = 3 ORDER BY l_linenumber, l_orderkey""".stripMargin,

    "q12_coalesce_na" ->
      """SELECT event_id, COALESCE(NULLIF(event_type, 'error'), 'N/A') AS event_type_display
        |FROM events ORDER BY event_id""".stripMargin,

    "q13_json_extract" ->
      """SELECT event_id, CAST(get_json_object(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q14_json_encode" ->
      """SELECT event_id, to_json(struct(event_id, event_type)) AS payload
        |FROM events ORDER BY event_id""".stripMargin,

    "q15_cast_roundtrip" ->
      """SELECT o_orderkey, CAST(o_orderkey AS STRING) AS okey_str,
        |  CAST(CAST(o_custkey AS STRING) AS BIGINT) AS ckey_roundtrip
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q16_timestamp_parse" ->
      """SELECT o_orderkey,
        |  CAST(date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS TIMESTAMP) AS parsed_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q17_season_complete" ->
      """SELECT CASE WHEN COUNT(DISTINCT o_orderdate) >= 22 THEN 'complete'
        |  ELSE 'in_progress' END AS season_status,
        |  COUNT(DISTINCT o_orderdate) AS total_gps FROM orders""".stripMargin,

    "q18_rank_standings" ->
      s"""SELECT l_suppkey, season_points,
         |  CAST(RANK() OVER (ORDER BY season_points DESC) AS INT) AS rnk
         |FROM (
         |  SELECT l_suppkey, CAST(SUM($pointsCase) AS BIGINT) AS season_points
         |  FROM lineitem GROUP BY l_suppkey)
         |ORDER BY rnk, l_suppkey""".stripMargin,

    "q19_wins_join_default" ->
      """SELECT s.s_suppkey, s.s_name, COALESCE(w.wins, 0) AS wins
        |FROM supplier s LEFT JOIN (
        |  SELECT l_suppkey, COUNT(*) AS wins FROM lineitem
        |  WHERE l_linenumber = 1 AND l_quantity > 45 GROUP BY l_suppkey) w
        |ON s.s_suppkey = w.l_suppkey ORDER BY s.s_suppkey""".stripMargin,

    "q20_latest_first" ->
      """SELECT DISTINCT o_orderdate AS gp_date FROM orders
        |ORDER BY gp_date DESC LIMIT 5""".stripMargin,

    // kernel-backed replays: the GraftExtensions SQL registrations must
    // produce the native Expressions' exact outputs through spark.sql
    "qd07_minhash_sig" ->
      ("SELECT doc_id, " +
        (0 until 8).map(j => s"sig[$j] AS mh$j").mkString(", ") +
        """ FROM (SELECT doc_id, minhash_sig_md5(text, 8, 2) AS sig
          | FROM documents) ORDER BY doc_id""".stripMargin),

    "qd08_simhash" ->
      """SELECT doc_id, simhash64(text) AS simhash
        |FROM documents ORDER BY doc_id""".stripMargin)

  /** Register views + kernels, then run one named query via pure SQL. */
  def run(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    GraftExtensions.register(spark)
    Tables.createTempViews(spark, sfDir)
    spark.sql(sql(name))
  }
}
