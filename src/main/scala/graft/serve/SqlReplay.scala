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

  /** Reserved namespace for the scripts' materialized stage seams. A
    * dedicated schema keeps the DROP+CTAS churn away from the caller's
    * own catalog: an unqualified `g61_ex` in the default schema would
    * let a replay destructively drop a user's same-named permanent
    * table. Everything under this schema is graft-owned scratch —
    * [[cleanup]] drops it wholesale. `final` + literal (a constant-type
    * member, inlined at use sites): the strict `sql` map below forces
    * the script builders during object init, and a plain val declared
    * after it would still read as null inside them (the round-13
    * init-order lesson).
    */
  final val ReplaySchema = "graft_replay"

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
        |FROM documents ORDER BY doc_id""".stripMargin) ++ opsSql

  // ------------------------------------------------------------------
  // Spark-dialect replays of the curation / retrieval operator surface
  // (qd61–qd66, qe28, qr10): the SAME queries as SparkEntry.oracleSql's
  // DuckDB texts, restated in Spark SQL over the registered kernels
  // (nfc_normalize, md5_bucket, minhash_sig, shingle_hashes,
  // sorted_jaccard, vec_dot). Dialect mapping, and nothing else:
  // regexp_split_to_array→split, list_*→array_*/transform,
  // unnest→explode/LATERAL VIEW, quantile_cont→percentile,
  // md5_number_lower%N→md5_bucket, list_dot_product→vec_dot. The one
  // STRUCTURAL divergence is connected components: Spark's recursive
  // CTEs are UNION ALL-only (cannot terminate on a cyclic edge set), so
  // the oracle's recursive walk is replaced by unrolled min-label
  // propagation — see [[componentsStmts]]. The multi-stage replays
  // (qd61/qd65/qd63) are SQL SCRIPTS — `;`-separated DROP + CREATE TABLE AS
  // (parquet stage seams) run in order by [[runText]] — because their
  // stage seams are multi-referenced, exactly where the DataFrame side
  // persists/checkpoints (see [[stage]] for why tables, not views).
  // ------------------------------------------------------------------

  /** Spark twin of SparkEntry's duckShingles3 (distinct word trigrams
    * of token array `w`). `sequence()` DESCENDS on an empty range,
    * hence the CASE guard for < 3 tokens.
    */
  private lazy val shingles3 =
    "array_distinct(CASE WHEN size(w) >= 3 THEN transform(sequence(1, size(w) - 2), " +
      "i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ', element_at(w, i + 2))) " +
      "ELSE CAST(array() AS ARRAY<STRING>) END)"

  /** Distinct word bigrams of token array `w` (same guard). */
  private lazy val bigrams =
    "CASE WHEN size(w) >= 2 THEN transform(sequence(1, size(w) - 1), " +
      "i -> concat(element_at(w, i), ' ', element_at(w, i + 1))) " +
      "ELSE CAST(array() AS ARRAY<STRING>) END"

  private def cos(a: String, b: String): String =
    s"round(vec_dot($a, $b) / (sqrt(vec_dot($a, $a)) * sqrt(vec_dot($b, $b))), 6)"

  /** Portable-md5 MinHash signature columns over string-shingle set `g`
    * (the withMinHashPortableHOF formulation — byte-equal to the
    * PortableMinHashExpr kernel).
    */
  private lazy val mh16 = (0 until 16)
    .map(j => s"    array_min(transform(g, x -> md5(concat(x, '#$j')))) AS mh$j")
    .mkString(",\n")

  /** LSH band columns band0..3 over mh0..15 (md5 of each 4-signature
    * slice — withLshBands' derivation; `castStr` for the xxhash64 long
    * signatures of the fast path).
    */
  private def bands4(castStr: Boolean) = (0 until 4)
    .map { b =>
      val cols = (4 * b until 4 * b + 4)
        .map(j => if (castStr) s"CAST(element_at(s, ${j + 1}) AS STRING)" else s"mh$j")
        .mkString(", ")
      s"    md5(concat_ws('|', $cols)) AS band$b"
    }.mkString(",\n")

  private lazy val eb4 = (0 until 4)
    .map(b => s"  SELECT doc_id, $b AS band, band$b AS bh FROM bands")
    .mkString("\n  UNION ALL\n")

  /** Connected-components statements over a cached view `${p}_edges(a,
    * b)` (symmetric pairs): cached views `${p}_w0..w{rounds}`, each
    * holding every node's current min LABEL — `w{rounds}` maps id →
    * component min for any component of diameter ≤ 2^rounds. Spark
    * recursive CTEs are UNION ALL-only — on a cyclic edge set the
    * oracle's UNION-dedup walk cannot terminate — so this unrolls
    * min-label propagation (label ← min over self + neighbors), each
    * round followed by one pointer jump (label ← min(label,
    * label(label)) — every label is itself a node id). Each round is
    * its own CACHE TABLE statement, mirroring the DataFrame side's
    * per-round checkpoints (Dedup.nearDupComponents) — without the
    * caches Spark inlines multi-referenced CTEs and the plan fans out
    * exponentially. Near-dup clusters are near-cliques (diameter 1–2
    * in practice; ServeSqlSpec's equality against the convergent
    * DataFrame API is the fixture-scale convergence check); the
    * DataFrame path iterates to an exact fixpoint and remains the
    * 100 TB path.
    */
  /** One materialized stage seam: DROP + CTAS (parquet) under
    * [[ReplaySchema]]. A TEMP VIEW would re-expand its full logical
    * plan at every reference — the multi-round scripts nest views, so
    * analysis alone fans out exponentially even when execution hits the
    * cache; a table read is opaque, exactly like the DataFrame side's
    * checkpoints. `name` must arrive already schema-qualified (the
    * scripts interpolate their `$ReplaySchema.g6x` prefix into every
    * reference too).
    */
  private def stage(name: String, query: String): Seq[String] = Seq(
    s"DROP TABLE IF EXISTS $name",
    s"CREATE TABLE $name USING PARQUET AS\n$query")

  /** Drop every stage seam the scripts have materialized. Safe to call
    * any time between runs; the scripts recreate what they need.
    */
  def cleanup(spark: SparkSession): Unit =
    spark.sql(s"DROP DATABASE IF EXISTS $ReplaySchema CASCADE")

  private def componentsStmts(p: String, rounds: Int): Seq[String] =
    stage(s"${p}_w0",
      s"SELECT DISTINCT a AS id, a AS label FROM ${p}_edges") ++
      (1 to rounds).flatMap { r =>
        stage(s"${p}_w$r",
          s"""WITH n AS (
             |  SELECT x.id, MIN(x.label) AS label FROM (
             |    SELECT id, label FROM ${p}_w${r - 1}
             |    UNION ALL
             |    SELECT e.b AS id, w.label
             |    FROM ${p}_w${r - 1} w JOIN ${p}_edges e ON e.a = w.id) x
             |  GROUP BY x.id)
             |SELECT a.id, LEAST(a.label, b.label) AS label
             |FROM n a JOIN n b ON a.label = b.id""".stripMargin)
      }

  /** qd61 (portable md5 signatures) / qd65 (xxhash64 signatures) — the
    * end-to-end capstone restated as a Spark SQL SCRIPT: fixture build,
    * NFC canon, quality gate, exact dedup, MinHash-LSH near dedup with
    * kernel-verified Jaccard, 3-gram decontamination, 90/5/5 split,
    * temperature mix, 128-token packing, 8-shard manifest. The two
    * variants differ ONLY in the signature/band derivation — exactly
    * the Pipelines.fullPipeline contract. Script form ([[stage]] CTAS
    * per stage seam, `;`-separated, run by [[runText]])
    * because the stages re-enter each other: the DataFrame side persists
    * the exact seam and checkpoints each component round for the same
    * reason, and a single WITH chain would inline every multi-referenced
    * CTE into an exponentially fanned-out plan.
    */
  private def pipelineSql(portable: Boolean): String = {
    // stage tables live under the reserved schema; the benchmark frame
    // is a session-scoped TEMP view (qualification is illegal there,
    // and session scoping is exactly its isolation story) — so it gets
    // the reserved token as a NAME prefix instead: an unqualified
    // `g61_bench` would CREATE OR REPLACE over a user's same-named
    // temp view, the same hazard class the schema fixed for tables
    val v = if (portable) "g61" else "g65"
    val bv = s"${ReplaySchema}_${v}_bench"
    val p = s"$ReplaySchema.$v"
    val fixtureNorm =
      s"""base AS (
         |  SELECT doc_id, source, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, source, concat(upper(text), '  ') AS text
         |  FROM documents
         |  WHERE doc_id % 97 = 1 AND doc_id % 50 <> 0
         |    AND size(split(trim(text), '\\\\s+')) >= 30
         |  UNION ALL
         |  SELECT doc_id + 2000000 AS doc_id, source, concat(text, ' near dup tail token') AS text
         |  FROM documents
         |  WHERE doc_id % 89 = 2 AND doc_id % 50 <> 0
         |    AND size(split(trim(text), '\\\\s+')) >= 30
         |  UNION ALL
         |  SELECT doc_id + 3000001 AS doc_id, source, text FROM documents
         |  WHERE doc_id % 50 = 0 AND doc_id % 7 = 0
         |    AND size(split(trim(text), '\\\\s+')) >= 30),
         |norm AS (
         |  SELECT doc_id, source,
         |    trim(regexp_replace(lower(nfc_normalize(text)), '\\\\s+', ' ')) AS t
         |  FROM base)""".stripMargin
    val ebBody =
      if (portable)
        s"""WITH sig AS (
           |  SELECT doc_id,
           |$mh16
           |  FROM ${p}_sh),
           |bands AS (
           |  SELECT doc_id,
           |${bands4(castStr = false)}
           |  FROM sig)
           |${eb4.replace("  SELECT", "SELECT")}""".stripMargin
      else
        s"""WITH sigarr AS (
           |  SELECT doc_id, minhash_sig(nfc_normalize(t), 16, 3) AS s FROM ${p}_ex),
           |bands AS (
           |  SELECT doc_id,
           |${bands4(castStr = true)}
           |  FROM sigarr)
           |${eb4.replace("  SELECT", "SELECT")}""".stripMargin
    val stmts = Seq(s"CREATE DATABASE IF NOT EXISTS $ReplaySchema") ++
      stage(s"${p}_ex",
      s"""WITH $fixtureNorm,
         |gate AS (
         |  SELECT doc_id, source, t,
         |    CAST(size(split(t, '\\\\s+')) AS BIGINT) AS nt
         |  FROM norm
         |  WHERE doc_id % 50 <> 0 AND size(split(t, '\\\\s+')) >= 20)
         |SELECT doc_id, source, t, nt FROM (
         |  SELECT *, MIN(doc_id) OVER (PARTITION BY md5(t)) AS keep FROM gate)
         |WHERE doc_id = keep""".stripMargin) ++ Seq(
      s"""CREATE OR REPLACE TEMPORARY VIEW $bv AS
         |WITH $fixtureNorm
         |SELECT doc_id, t FROM norm WHERE doc_id % 50 = 0""".stripMargin) ++
      stage(s"${p}_sh",
        s"""SELECT doc_id, $shingles3 AS g
           |FROM (SELECT doc_id, split(t, '\\\\s+') AS w FROM ${p}_ex)""".stripMargin) ++
      stage(s"${p}_shh",
        s"SELECT doc_id, shingle_hashes(nfc_normalize(t), 3) AS hsh FROM ${p}_ex") ++
      stage(s"${p}_eb", ebBody) ++
      stage(s"${p}_edges",
        s"""WITH cand AS (
           |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM ${p}_eb a JOIN ${p}_eb b
           |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
           |prs AS (
           |  SELECT c.id_a, c.id_b
           |  FROM cand c
           |  JOIN ${p}_shh sa ON sa.doc_id = c.id_a
           |  JOIN ${p}_shh sb ON sb.doc_id = c.id_b
           |  WHERE sorted_jaccard(sa.hsh, sb.hsh) >= 0.5)
           |SELECT id_a AS a, id_b AS b FROM prs
           |UNION ALL SELECT id_b, id_a FROM prs""".stripMargin) ++
      componentsStmts(p, rounds = 4) ++
      stage(s"${p}_clean",
        s"""WITH losers AS (SELECT id FROM ${p}_w4 WHERE label <> id),
           |reps AS (
           |  SELECT * FROM ${p}_ex WHERE doc_id NOT IN (SELECT id FROM losers)),
           |bg AS (
           |  SELECT DISTINCT g3 FROM (
           |    SELECT explode(gs) AS g3 FROM (
           |      SELECT $shingles3 AS gs FROM (
           |        SELECT split(t, '\\\\s+') AS w FROM $bv)) bs)),
           |repg AS (
           |  SELECT doc_id, g3 FROM (
           |    SELECT s.doc_id, s.g FROM ${p}_sh s JOIN reps r ON s.doc_id = r.doc_id)
           |  LATERAL VIEW explode(g) gx AS g3),
           |cont AS (SELECT DISTINCT repg.doc_id FROM repg JOIN bg USING (g3))
           |SELECT * FROM reps WHERE doc_id NOT IN (SELECT doc_id FROM cont)""".stripMargin) ++ Seq(
      s"""WITH train AS (
         |  SELECT * FROM ${p}_clean WHERE md5_bucket(CAST(doc_id AS STRING), 100) < 90),
         |m AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS n_tokens
         |      FROM train GROUP BY source),
         |mp AS (SELECT *,
         |         CASE WHEN n_tokens = 0 THEN CAST(0 AS DECIMAL(18,6))
         |              ELSE CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6))
         |         END AS pw
         |       FROM m),
         |gden AS (SELECT CAST(SUM(pw) AS DOUBLE) AS psum FROM mp),
         |thr AS (
         |  SELECT mp.source,
         |    CASE WHEN mp.n_tokens = 0 THEN 0
         |         ELSE CAST(round(LEAST(1.0D, CAST(mp.pw AS DOUBLE) / gden.psum * 5000 / mp.n_tokens) * 10000) AS INT) END AS threshold
         |  FROM mp CROSS JOIN gden),
         |mixed AS (
         |  SELECT tr.doc_id, tr.nt FROM train tr JOIN thr ON tr.source = thr.source
         |  WHERE md5_bucket(concat('mix#', CAST(tr.doc_id AS STRING)), 10000) < thr.threshold),
         |nz AS (SELECT doc_id, nt FROM mixed WHERE nt > 0),
         |cu AS (SELECT doc_id, nt,
         |    CAST(SUM(nt) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM nz),
         |ex2 AS (SELECT doc_id, nt, cum, cum - nt AS noff,
         |    CAST(FLOOR(CAST(cum - nt AS DOUBLE) / 128) AS BIGINT) AS f,
         |    CAST(FLOOR(CAST(cum - 1 AS DOUBLE) / 128) AS BIGINT) AS l
         |  FROM cu),
         |sp AS (SELECT doc_id, cum, noff, i AS seq_id
         |  FROM ex2 LATERAL VIEW explode(sequence(f, l)) u AS i),
         |sl AS (SELECT seq_id, doc_id,
         |    LEAST(cum, (seq_id + 1) * 128) - GREATEST(noff, seq_id * 128) AS take
         |  FROM sp),
         |shards AS (
         |  SELECT md5_bucket(CAST(seq_id AS STRING), 8) AS shard_id,
         |    seq_id, doc_id, take
         |  FROM sl)
         |SELECT shard_id, COUNT(DISTINCT seq_id) AS n_seqs,
         |  COUNT(DISTINCT doc_id) AS n_docs,
         |  CAST(SUM(take) AS BIGINT) AS n_tokens
         |FROM shards GROUP BY shard_id ORDER BY shard_id""".stripMargin)
    stmts.mkString(";\n")
  }

  /** qd63 — quality-aware keeper selection as a Spark SQL script:
    * qd09's pairs (cached band/edge seams — same rationale as
    * [[pipelineSql]]), unrolled components, 4-dp stopword-ratio
    * scoring, per-cluster (score DESC, id ASC) argmax.
    */
  private lazy val qd63Script: String = {
    val p = s"$ReplaySchema.g63"
    val stmts = Seq(s"CREATE DATABASE IF NOT EXISTS $ReplaySchema") ++
      stage(s"${p}_sh",
      s"""SELECT doc_id, $shingles3 AS g
         |FROM (SELECT doc_id, split(trim(nfc_normalize(text)), '\\\\s+') AS w FROM documents)""".stripMargin) ++
      stage(s"${p}_eb",
        s"""WITH sig AS (
           |  SELECT doc_id,
           |$mh16
           |  FROM ${p}_sh),
           |bands AS (
           |  SELECT doc_id,
           |${bands4(castStr = false)}
           |  FROM sig)
           |${eb4.replace("  SELECT", "SELECT")}""".stripMargin) ++
      stage(s"${p}_shh",
        "SELECT doc_id, shingle_hashes(nfc_normalize(text), 3) AS hsh FROM documents") ++
      stage(s"${p}_edges",
        s"""WITH cand AS (
          |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          |  FROM ${p}_eb a JOIN ${p}_eb b
          |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
          |prs AS (
          |  SELECT c.id_a, c.id_b
          |  FROM cand c
          |  JOIN ${p}_shh sa ON sa.doc_id = c.id_a
          |  JOIN ${p}_shh sb ON sb.doc_id = c.id_b
          |  WHERE sorted_jaccard(sa.hsh, sb.hsh) >= 0.5)
          |SELECT id_a AS a, id_b AS b FROM prs
          |UNION ALL SELECT id_b, id_a FROM prs""".stripMargin) ++
      componentsStmts(p, rounds = 4) ++ Seq(
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    round(size(filter(w, x -> x IN ('the','a','an','of','and','to','in','is','it','for')))
         |          / GREATEST(size(w), 1), 4) AS score
         |  FROM (SELECT doc_id, split(trim(text), '\\\\s+') AS w FROM documents)),
         |j AS (SELECT c.id AS doc_id, c.label AS cluster_id, s.score
         |      FROM ${p}_w4 c JOIN scored s ON s.doc_id = c.id),
         |k AS (SELECT cluster_id, doc_id AS keeper_id FROM (
         |    SELECT cluster_id, doc_id,
         |      ROW_NUMBER() OVER (PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rn
         |    FROM j) WHERE rn = 1)
         |SELECT j.doc_id, j.cluster_id, j.score, k.keeper_id,
         |  j.doc_id = k.keeper_id AS is_keeper
         |FROM j JOIN k ON j.cluster_id = k.cluster_id ORDER BY j.doc_id""".stripMargin)
    stmts.mkString(";\n")
  }

  /** qr10's MMR greedy unrolled to its 3 rounds — SparkEntry.qr10Sql in
    * Spark dialect (vec_dot for list_dot_product), same exact-DECIMAL
    * score arithmetic.
    */
  private lazy val qr10SparkSql: String = {
    val score = "CAST(round(CAST(0.7 AS DECIMAL(5,4)) * rel " +
      "- CAST(0.3 AS DECIMAL(5,4)) * ms, 6) AS DOUBLE)"
    val stages = (1 to 3).map { i =>
      val pick =
        s"""pick$i AS (
           |  SELECT query_id, neighbor_id, v, mmr_score, $i AS mmr_rank FROM (
           |    SELECT *, $score AS mmr_score,
           |      ROW_NUMBER() OVER (PARTITION BY query_id
           |        ORDER BY $score DESC, neighbor_id) AS rn
           |    FROM rem$i) WHERE rn = 1)"""
      val rem = if (i == 3) "" else
        s""",
           |rem${i + 1} AS (
           |  SELECT r.query_id, r.neighbor_id, r.v, r.rel,
           |    GREATEST(r.ms, CAST(${cos("r.v", "p.v")} AS DECIMAL(18,6))) AS ms
           |  FROM rem$i r JOIN pick$i p ON r.query_id = p.query_id
           |  WHERE r.neighbor_id <> p.neighbor_id)"""
      pick + rem
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS ARRAY<DOUBLE>) AS qv
       |           FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
       |sc AS (SELECT query_id, neighbor_id, v,
       |         CAST(${cos("v", "qv")} AS DECIMAL(18,6)) AS rel
       |       FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
       |r0 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |         ORDER BY rel DESC, neighbor_id) AS rnk FROM sc),
       |rem1 AS (SELECT query_id, neighbor_id, v, rel,
       |           CAST(0 AS DECIMAL(18,6)) AS ms
       |         FROM r0 WHERE rnk <= 10),
       |$stages,
       |sel AS (SELECT query_id, neighbor_id, mmr_score, mmr_rank FROM pick1
       |  UNION ALL SELECT query_id, neighbor_id, mmr_score, mmr_rank FROM pick2
       |  UNION ALL SELECT query_id, neighbor_id, mmr_score, mmr_rank FROM pick3)
       |SELECT query_id, neighbor_id, mmr_score, mmr_rank
       |FROM sel ORDER BY query_id, mmr_rank""".stripMargin
  }

  private lazy val opsSql: Map[String, String] = Map(
    "qd61_full_pipeline" -> pipelineSql(portable = true),
    "qd65_full_pipeline_fast" -> pipelineSql(portable = false),
    "qr10_mmr_rerank" -> qr10SparkSql,

    "qd62_bigram_nll_gate" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang, split(trim(text), '\\\\s+') AS w FROM documents),
         |bgx AS (
         |  SELECT doc_id, lang, explode($bigrams) AS bg FROM tok),
         |refbg AS (SELECT bg, COUNT(*) AS cab FROM bgx WHERE lang = 'en' GROUP BY bg),
         |refuni AS (
         |  SELECT tk, COUNT(*) AS ca FROM (
         |    SELECT explode(w) AS tk FROM tok WHERE lang = 'en') GROUP BY tk),
         |vv AS (SELECT COUNT(*) AS v FROM refuni),
         |docbg AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM bgx GROUP BY doc_id, bg),
         |sc AS (
         |  SELECT d.doc_id, CAST(SUM(d.cnt) AS BIGINT) AS n_bigrams,
         |    SUM(CAST(round(-ln((COALESCE(rb.cab, 0) + 1)
         |          / CAST(COALESCE(ru.ca, 0) + vv.v AS DOUBLE)), 6) AS DECIMAL(18,6)) * d.cnt) AS s
         |  FROM docbg d
         |  LEFT JOIN refbg rb ON d.bg = rb.bg
         |  LEFT JOIN refuni ru ON ru.tk = split_part(d.bg, ' ', 1)
         |  CROSS JOIN vv
         |  GROUP BY d.doc_id)
         |SELECT t.doc_id, COALESCE(sc.n_bigrams, 0) AS n_bigrams,
         |  round(CAST(sc.s AS DOUBLE) / sc.n_bigrams, 4) AS avg_nll,
         |  COALESCE(round(CAST(sc.s AS DOUBLE) / sc.n_bigrams, 4) <= 3.47, false) AS keep
         |FROM tok t LEFT JOIN sc ON t.doc_id = sc.doc_id ORDER BY t.doc_id""".stripMargin,

    "qd63_quality_keepers" -> qd63Script,

    "qd64_zipf_fit" ->
      """WITH cnt AS (
        |  SELECT source, tk, COUNT(*) AS freq FROM (
        |    SELECT source, explode(split(trim(text), '\\s+')) AS tk
        |    FROM documents) GROUP BY source, tk),
        |types AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types
        |          FROM cnt GROUP BY source),
        |rk AS (
        |  SELECT source, freq,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY freq DESC, tk) AS r
        |  FROM cnt),
        |pts AS (
        |  SELECT source,
        |    CAST(round(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(round(ln(CAST(freq AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
        |  FROM rk WHERE r <= 100 AND freq >= 2),
        |fit AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_fit,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM pts GROUP BY source),
        |ex AS (
        |  SELECT t.source, t.n_types, COALESCE(f.n_fit, 0) AS n_fit,
        |    CAST(f.n_fit AS DOUBLE) AS n,
        |    CAST(f.sx AS DOUBLE) AS dsx, CAST(f.sy AS DOUBLE) AS dsy,
        |    CAST(f.sxy AS DOUBLE) AS dsxy, CAST(f.sxx AS DOUBLE) AS dsxx,
        |    CAST(f.syy AS DOUBLE) AS dsyy
        |  FROM types t LEFT JOIN fit f ON t.source = f.source),
        |cl AS (
        |  SELECT *, n * dsxy - dsx * dsy AS num, n * dsxx - dsx * dsx AS den,
        |    n * dsyy - dsy * dsy AS deny
        |  FROM ex)
        |SELECT source, n_types, n_fit,
        |  CASE WHEN n_fit >= 2 AND abs(den) > 1e-9 THEN round(num / den, 4) END AS slope,
        |  CASE WHEN n_fit >= 2 AND abs(den) > 1e-9
        |       THEN round((dsy - num / den * dsx) / n, 4) END AS intercept,
        |  CASE WHEN n_fit >= 2 AND abs(den) > 1e-9 AND abs(deny) > 1e-9
        |       THEN round(num * num / (den * deny), 4) END AS r2
        |FROM cl ORDER BY source""".stripMargin,

    "qd66_curriculum_packing" ->
      """WITH toks AS (
        |  SELECT doc_id, explode(split(trim(text), '\\s+')) AS tok FROM documents),
        |vocab AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok),
        |total AS (SELECT CAST(SUM(freq) AS DOUBLE) AS n FROM vocab),
        |lp AS (
        |  SELECT t.doc_id,
        |    CAST(round(ln(CAST(v.freq AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lp
        |  FROM toks t JOIN vocab v ON t.tok = v.tok),
        |lmagg AS (SELECT doc_id, COUNT(*) AS n_tok, SUM(lp) AS slp FROM lp GROUP BY doc_id),
        |lm AS (
        |  SELECT doc_id, n_tok,
        |    round(CAST(slp AS DOUBLE) / n_tok - ln((SELECT n FROM total)), 4) AS avg_logprob
        |  FROM lmagg),
        |th AS (SELECT percentile(avg_logprob, 0.25D) AS t1,
        |              percentile(avg_logprob, 0.50D) AS t2,
        |              percentile(avg_logprob, 0.75D) AS t3 FROM lm),
        |bk AS (SELECT l.doc_id, l.n_tok,
        |    1 + CAST(l.avg_logprob >= round(t.t1, 4) AS INT)
        |      + CAST(l.avg_logprob >= round(t.t2, 4) AS INT)
        |      + CAST(l.avg_logprob >= round(t.t3, 4) AS INT) AS bucket,
        |    md5(CAST(l.doc_id AS STRING)) AS h
        |  FROM lm l CROSS JOIN th t),
        |cu AS (SELECT doc_id, n_tok, bucket,
        |    CAST(SUM(n_tok) OVER (ORDER BY bucket, h, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM bk WHERE n_tok > 0),
        |ex2 AS (SELECT doc_id, n_tok, bucket, cum, cum - n_tok AS noff,
        |    CAST(FLOOR(CAST(cum - n_tok AS DOUBLE) / 128) AS BIGINT) AS f,
        |    CAST(FLOOR(CAST(cum - 1 AS DOUBLE) / 128) AS BIGINT) AS l
        |  FROM cu),
        |sp AS (SELECT doc_id, bucket, cum, noff, i AS seq_id
        |  FROM ex2 LATERAL VIEW explode(sequence(f, l)) u AS i),
        |sl AS (SELECT seq_id, doc_id,
        |    GREATEST(noff, seq_id * 128) - noff AS from_tok,
        |    LEAST(cum, (seq_id + 1) * 128) - GREATEST(noff, seq_id * 128) AS take,
        |    GREATEST(noff, seq_id * 128) - seq_id * 128 AS pos_in_seq,
        |    bucket
        |  FROM sp)
        |SELECT seq_id, doc_id, from_tok, take, pos_in_seq, bucket
        |FROM sl ORDER BY seq_id, pos_in_seq""".stripMargin,

    "qe28_int4_fidelity" ->
      s"""WITH b AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
         |r AS (SELECT vec_id, v, array_min(v) AS mn,
         |        (array_max(v) - array_min(v)) / 15.0D AS scale FROM b),
         |q AS (SELECT vec_id, v, mn, scale,
         |  CASE WHEN scale = 0.0D THEN transform(v, x -> 0)
         |       ELSE transform(v, x -> CAST(round((x - mn) / scale) AS INT))
         |  END AS qv
         |  FROM r),
         |p AS (SELECT vec_id, v, mn, scale, size(qv) AS dim,
         |  transform(sequence(1, CAST(floor((size(qv) + 1) / 2.0D) AS INT)),
         |    i -> CAST(element_at(qv, 2*i - 1) * 16 +
         |         CASE WHEN 2*i <= size(qv) THEN element_at(qv, 2*i) ELSE 0 END - 128 AS TINYINT)) AS packed
         |  FROM q),
         |u AS (SELECT vec_id, v, mn, scale, packed,
         |  slice(flatten(transform(packed,
         |    pv -> array(shiftright(CAST(pv AS INT) + 128, 4), (CAST(pv AS INT) + 128) % 16))), 1, dim) AS uq
         |  FROM p),
         |d AS (SELECT vec_id, v, packed,
         |  CASE WHEN scale = 0.0D THEN transform(uq, c -> mn)
         |       ELSE transform(uq, c -> CAST(c AS DOUBLE) * scale + mn)
         |  END AS deq
         |  FROM u)
         |SELECT vec_id, size(packed) AS packed_bytes,
         |  ${cos("v", "deq")} AS fidelity
         |FROM d ORDER BY vec_id""".stripMargin)

  /** Execute a (possibly multi-statement) SQL text: statements are split
    * on `;` at end of line and run in order — the leading ones are the
    * stage-seam DDL (DROP + CREATE TABLE AS) a SQL-script consumer
    * (spark-sql, a notebook) would paste verbatim — and the final
    * statement's frame is returned.
    *
    * Side effect: the multi-stage scripts (qd61/qd63/qd65) materialize
    * their seams as tables under the reserved [[ReplaySchema]] schema
    * and LEAVE them there — the returned frame is lazy and reads them,
    * so the script cannot drop its own output's inputs. Re-running a
    * script DROP+recreates its seams; [[cleanup]] removes the schema
    * wholesale. Two CONCURRENT replays of the same script against one
    * shared warehouse would race on these fixed names — serialize them
    * (distinct-query replays never collide: prefixes are per query).
    */
  def runText(spark: SparkSession, text: String): DataFrame = {
    val stmts = text.split(";\\s*\\n").map(_.trim).filter(_.nonEmpty)
    stmts.init.foreach(spark.sql(_))
    spark.sql(stmts.last)
  }

  /** Register views + kernels, then run one named query via pure SQL. */
  def run(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    GraftExtensions.register(spark)
    Tables.createTempViews(spark, sfDir)
    runText(spark, sql(name))
  }

  /** Unrolled min-label propagation as inline CTEs over `edges(a, b)`
    * (symmetric pairs, any orderable key type incl. the compaction
    * routines' (doc_id, epoch, batch_id) structs): `w$rounds` maps
    * every edge-touched id to its component minimum for components of
    * diameter ≤ 2^rounds (each round is one neighborhood-min plus one
    * pointer jump — [[componentsStmts]]' recurrence, stated inline for
    * fixture-scale replays; production-scale uses the CTAS form or the
    * DataFrame fixpoint). CASE, not LEAST: LEAST on struct keys is the
    * only piece of the recurrence Spark's function registry gates by
    * type, and the CASE form is orderable-universal.
    */
  private def componentCtes(rounds: Int): String =
    (Seq("w0 AS (SELECT DISTINCT a AS id, a AS label FROM edges)") ++
      (1 to rounds).flatMap { r =>
        Seq(
          s"""n$r AS (
             |  SELECT x.id, MIN(x.label) AS label FROM (
             |    SELECT id, label FROM w${r - 1}
             |    UNION ALL
             |    SELECT e.b AS id, w.label
             |    FROM w${r - 1} w JOIN edges e ON e.a = w.id) x
             |  GROUP BY x.id)""".stripMargin,
          s"""w$r AS (
             |  SELECT a.id,
             |    CASE WHEN b.label < a.label THEN b.label ELSE a.label END AS label
             |  FROM n$r a JOIN n$r b ON a.label = b.id)""".stripMargin)
      }).mkString(",\n")

  /** The compaction routines' LOSER-SET derivation as one Spark SQL
    * text over a caller-registered view of the PRE-compaction corpus —
    * the maintenance-path twin of the five-stage ingest twin: the rows
    * `compactNearDupCorpus` / `compactSemanticCorpus` remove must be
    * derivable through `spark.sql` from the same stored state.
    *
    *  - `"neardup"`: candidate pairs from the STORED `band0..3`
    *    columns (one (band, bh) bucket shared ⇒ pair — exactly
    *    [[graft.functions.Dedup.bandsLong]]'s explode + equi-join);
    *  - `"semantic"`: same-cell pairs over the stored (`cell`,
    *    `embedding`) columns scored with the sink's 6-dp-rounded,
    *    NaN-never-matches cosine (vec_dot kernel) against `threshold`;
    *  - `"containment"`: winnowing fingerprints recomputed from stored
    *    TEXT (k-gram md5 window-min over full w-frames, `wk`/`ww`),
    *    df-capped (`maxDf`) shared-fingerprint pairs at `minShared` —
    *    `compactContainmentCorpus`'s candidate rule.
    *
    * Both cluster transitively (unrolled min-label propagation; the
    * keeper is the lexicographic minimum (doc_id, epoch, batch_id)
    * struct — the routines' smallest-key-wins rule) and return the
    * losers as (doc_id, epoch, batch_id) rows ordered by doc_id.
    * Requires [[GraftExtensions.register]] for `vec_dot` (semantic).
    */
  def compactionLoserSql(kind: String, view: String, rounds: Int = 3,
      threshold: Double = 0.9, wk: Int = 3, ww: Int = 4,
      minShared: Int = 2, maxDf: Int = 50): String = {
    val key = (q: String) =>
      s"""named_struct('doc_id', CAST($q.doc_id AS BIGINT),
         |      'epoch', CAST($q.epoch AS BIGINT),
         |      'batch_id', CAST($q.batch_id AS BIGINT))""".stripMargin
    val pairs = kind match {
      case "neardup" =>
        s"""eb AS (
           |  SELECT ${key("s")} AS k, s.band, s.bh FROM (
           |    SELECT doc_id, epoch, batch_id,
           |      stack(4, 0, band0, 1, band1, 2, band2, 3, band3) AS (band, bh)
           |    FROM $view) s),
           |prs AS (
           |  SELECT DISTINCT a.k AS ka, b.k AS kb
           |  FROM eb a JOIN eb b
           |    ON a.band = b.band AND a.bh = b.bh AND a.k < b.k)""".stripMargin
      case "semantic" =>
        s"""v AS (
           |  SELECT ${key(view)} AS k, cell,
           |    CAST(embedding AS ARRAY<DOUBLE>) AS e
           |  FROM $view),
           |prs AS (
           |  SELECT DISTINCT a.k AS ka, b.k AS kb
           |  FROM v a JOIN v b ON a.cell = b.cell AND a.k < b.k
           |  WHERE nanvl(round(
           |      CASE WHEN sqrt(vec_dot(a.e, a.e)) * sqrt(vec_dot(b.e, b.e)) = 0D THEN 0D
           |           ELSE vec_dot(a.e, b.e)
           |                / (sqrt(vec_dot(a.e, a.e)) * sqrt(vec_dot(b.e, b.e))) END, 6),
           |      CAST('-Infinity' AS DOUBLE)) >= ${threshold}D)""".stripMargin
      case "containment" =>
        // winnowing fingerprints recomputed from STORED TEXT (exactly
        // compactContainmentCorpus's derivation): lower+trim canon,
        // k-gram md5s, per-window MIN hash over full w-frames (the
        // composite tie-break key only orders equal hashes, so min(h)
        // yields the identical fp_hash set), df-capped shared-fp pairs
        val gram = (0 until wk).map(j => s"t[i + $j]").mkString(", ")
        s"""toks AS (
           |  SELECT ${key(view)} AS k,
           |    split(trim(lower(text)), '\\\\s+') AS t
           |  FROM $view),
           |grams AS (
           |  SELECT k, pos, md5(g) AS h, size(t) - ${wk - 1} AS ngr
           |  FROM (SELECT k, t FROM toks WHERE size(t) >= $wk)
           |  LATERAL VIEW posexplode(transform(sequence(0, size(t) - $wk),
           |    i -> concat_ws(' ', $gram))) x AS pos, g),
           |winfp AS (
           |  SELECT DISTINCT k, fp FROM (
           |    SELECT k, pos, ngr,
           |      min(h) OVER (PARTITION BY k ORDER BY pos
           |        ROWS BETWEEN CURRENT ROW AND ${ww - 1} FOLLOWING) AS fp
           |    FROM grams)
           |  WHERE pos <= ngr - $ww),
           |dfed AS (
           |  SELECT k, fp FROM (
           |    SELECT k, fp, COUNT(1) OVER (PARTITION BY fp) AS df FROM winfp)
           |  WHERE df <= $maxDf),
           |prs AS (
           |  SELECT a.k AS ka, b.k AS kb
           |  FROM dfed a JOIN dfed b ON a.fp = b.fp AND a.k < b.k
           |  GROUP BY a.k, b.k
           |  HAVING COUNT(1) >= $minShared)""".stripMargin
      case other => throw new IllegalArgumentException(
        s"compactionLoserSql kind must be 'neardup', 'semantic' or 'containment', got '$other'")
    }
    s"""WITH $pairs,
       |edges AS (SELECT ka AS a, kb AS b FROM prs
       |          UNION ALL SELECT kb, ka FROM prs),
       |${componentCtes(rounds)}
       |SELECT id.doc_id AS doc_id, id.epoch AS epoch, id.batch_id AS batch_id
       |FROM w$rounds WHERE NOT (label = id)
       |ORDER BY doc_id""".stripMargin
  }

  /** [[graft.streaming.CorpusIngest.refitCellIndex]]'s re-assignment —
    * the CHANGED-set derivation — as one Spark SQL text over a
    * caller-registered view of the pre-refit corpus (`doc_id, epoch,
    * batch_id, cell, embedding`) and one of the NEW centroids
    * (`cell_id, centroid`): the rows whose cell assignment the refit
    * rewrites, with old and new cells. Closes the last DataFrame-only
    * maintenance computation (round-16 verdict #6) — the argmin is the
    * qe08 deterministic-centroid shape through `vec_dot`.
    *
    * Semantics pinned to the `nearest_cells` kernel, case by case:
    *  - score is `‖c‖² − 2·v·c` (the `‖v‖²` term is argmin-invariant
    *    and the kernel drops it too); `vec_dot` truncates to the
    *    shorter operand exactly like the kernel's dot loop, and
    *    `vec_dot(ce, ce)` is the kernel's full-length `cNorm2`;
    *  - TIES break to the LOWEST cell_id (the kernel's first-index
    *    scan; `ORDER BY score, cell_id`);
    *  - a NaN embedding makes every score NaN: Spark SQL ordering
    *    treats NaN values as equal (and greater than any number), so
    *    the tie-break again yields the lowest cell — the kernel's
    *    explicit NaN fallback, reproduced by the dialect's own
    *    ordering rules; a NaN in ONE centroid sorts that score last,
    *    matching the kernel's comparisons-are-false skip.
    *
    * Requires [[GraftExtensions.register]] for `vec_dot`. Replay/audit
    * scale (the cross join is docs × centroids — the probe the refit
    * itself runs as one broadcast argmin scan).
    */
  /** The trained quality classifier's SCORING leg as pure `spark.sql`
    * — the serving-surface twin of
    * [[graft.functions.Classifier.scoreHashedLogistic]] (training is a
    * driver-sequenced loop and stays API-side; a deployment ships the
    * frozen vector, and THIS is the query it runs). The weight vector
    * rides as a VALUES inline table of exact DECIMAL(20,10) literals;
    * features, margin decimal sums, the 6-dp sigmoid and the decimal
    * threshold compare are the API path's arithmetic verbatim
    * (ServeSqlSpec asserts row-identity).
    */
  def classifierScoreSql(docsView: String,
      weights: Seq[(Int, BigDecimal)], dim: Int, threshold: String): String = {
    val values = weights.map { case (f, wv) =>
      s"($f, CAST('${wv.bigDecimal.toPlainString}' AS DECIMAL(20,10)))"
    }.mkString(",\n    ")
    s"""WITH base AS (
       |  SELECT doc_id, split(trim(text), '\\\\s+') AS toks FROM $docsView),
       |b2 AS (SELECT doc_id, toks, GREATEST(size(toks), 1) AS len FROM base),
       |bow AS (
       |  SELECT doc_id, feat,
       |    CAST(ROUND(CAST(COUNT(1) AS DOUBLE) / CAST(len AS DOUBLE), 6)
       |      AS DECIMAL(10,6)) AS x
       |  FROM (SELECT doc_id, len, CAST(md5_bucket(tk, $dim) AS INT) AS feat
       |        FROM (SELECT doc_id, len, explode(toks) AS tk FROM b2)
       |        WHERE length(tk) > 0)
       |  GROUP BY doc_id, feat, len),
       |feats AS (
       |  SELECT * FROM bow
       |  UNION ALL
       |  SELECT doc_id, $dim AS feat,
       |    CAST(ROUND(CAST(1 AS DOUBLE) / CAST(len AS DOUBLE), 6)
       |      AS DECIMAL(10,6)) AS x FROM b2
       |  UNION ALL
       |  SELECT doc_id, ${dim + 1} AS feat, CAST(1 AS DECIMAL(10,6)) AS x FROM b2),
       |w(feat, wv) AS (VALUES
       |    $values),
       |m AS (SELECT f.doc_id, SUM(w.wv * f.x) AS mm
       |      FROM feats f JOIN w ON w.feat = f.feat GROUP BY f.doc_id)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(CAST(FLOOR((CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + EXP(-CAST(mm AS DOUBLE)))) * 1000000 + 0.5) AS DECIMAL(14,0))
       |    * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(8,6)) AS score,
       |  CAST(CAST(FLOOR((CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + EXP(-CAST(mm AS DOUBLE)))) * 1000000 + 0.5) AS DECIMAL(14,0))
       |    * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(8,6)) >= CAST($threshold AS DECIMAL(8,6)) AS pred
       |FROM m ORDER BY doc_id""".stripMargin
  }

  def refitChangedSql(view: String, centroidsView: String): String =
    s"""WITH v AS (
       |  SELECT doc_id, epoch, batch_id, cell,
       |    CAST(embedding AS ARRAY<DOUBLE>) AS e
       |  FROM $view),
       |c AS (
       |  SELECT CAST(cell_id AS INT) AS cell_id,
       |    CAST(centroid AS ARRAY<DOUBLE>) AS ce
       |  FROM $centroidsView),
       |scored AS (
       |  SELECT v.doc_id, v.epoch, v.batch_id, v.cell, c.cell_id,
       |    vec_dot(c.ce, c.ce) - 2D * vec_dot(v.e, c.ce) AS score
       |  FROM v CROSS JOIN c),
       |assigned AS (
       |  SELECT doc_id, epoch, batch_id, cell, cell_id AS new_cell
       |  FROM (SELECT *, ROW_NUMBER() OVER (
       |          PARTITION BY doc_id, epoch, batch_id
       |          ORDER BY score ASC, cell_id ASC) AS rn
       |        FROM scored)
       |  WHERE rn = 1)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(epoch AS BIGINT) AS epoch,
       |  CAST(batch_id AS BIGINT) AS batch_id,
       |  CAST(cell AS INT) AS old_cell, new_cell
       |FROM assigned WHERE NOT (cell <=> new_cell)
       |ORDER BY doc_id""".stripMargin
}
