package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, StructField, StructType}

import graft.functions.{Classifier, Curation, Dedup, Retrieval, Similarity, TextAnalysis}
import graft.ops.F1Ops
import graft.sources.Tables

/** Driver contract — maps the SURVEY.md §2 operator inventory (plus the
  * training-data extensions) onto the TPC-H-ish fixture tables, one named
  * query per operator, each with a DuckDB-equivalent oracle in
  * [[oracleSql]] (FIXTURES.md §C).
  *
  * Determinism rules used throughout (SURVEY.md §7.5): UTC session TZ;
  * every query ends in an ORDER BY with a full tie-break; money/double
  * aggregates are summed as decimal (order-independent) then surfaced as
  * double; int sums are counts (both engines → int64); float vector math is
  * double, sequential, and rounded before ordering.
  */
object SparkEntry {

  private def revenue: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** Order-independent exact sum of a ≤4-decimal double expression. */
  private def money(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** §3.2 flagship — supplier "championship standings" (J1+A1+A2+A3+P10+
    * P11+O1): fact⋈dim broadcast left join, grouped revenue-points +
    * conditional wins, win-rate vs the global distinct-order count, sorted
    * with tie-break. One shuffle (group key); dim + scalar total broadcast.
    */
  private def standings(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    val total = li.agg(countDistinct("l_orderkey").as("__total"))
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left")
      .groupBy("s_suppkey", "s_name")
      .agg(
        money(revenue).as("points"),
        count(when(col("l_linenumber") === 1, lit(1))).as("wins"))
      .crossJoin(broadcast(total))
      .withColumn("win_rate", round(col("wins") / col("__total") * 100, 2))
      .drop("__total")
      .orderBy(col("points").desc, col("s_suppkey"))
  }

  private val standingsSql: String =
    """SELECT s.s_suppkey, s.s_name,
      |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS points,
      |  COUNT(*) FILTER (WHERE l.l_linenumber = 1) AS wins,
      |  ROUND(COUNT(*) FILTER (WHERE l.l_linenumber = 1)
      |        / (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) * 100, 2) AS win_rate
      |FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |GROUP BY s.s_suppkey, s.s_name
      |ORDER BY points DESC, s.s_suppkey""".stripMargin

  /** Flagship query on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    standings(spark, "/root/testdata/sf0.001")

  /** DuckDB 2-word-shingle set, mirroring [[Dedup.wordShingles]](n=2). */
  private val duckShingles2 =
    """list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))"""

  /** DuckDB 3-word-shingle set, mirroring [[Dedup.wordShingles]](n=3). */
  private val duckShingles3 =
    """list_distinct(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))"""

  /** DuckDB n-word-shingle set for any n, mirroring [[Dedup.wordShingles]]. */
  private def duckShinglesN(n: Int): String = {
    val concat = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, len(w) - ${n - 2}), i -> $concat))"
  }

  private val duckCos =
    "ROUND(list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6)"

  /** qe08's IVF probe-and-rank replayed in SQL (fixed centroids
    * vec_id < 8, probes vec_id < 5, nProbe 2, k 3). qe19 shares it
    * verbatim: the cell-sidecar search scores the same vectors with the
    * same kernel under the same pinned centroids.
    */
  private lazy val duckQe08Sql: String =
    s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS cv FROM c WHERE vec_id < 8),
       |corpus_cells AS (
       |  SELECT vec_id, v, cell_id FROM (
       |    SELECT c.vec_id, c.v, cent.cell_id,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY list_dot_product(cent.cv, cent.cv)
       |                   - 2 * list_dot_product(c.v, cent.cv), cent.cell_id) AS rn
       |    FROM c, cent)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, qv, cell_id FROM (
       |    SELECT c.vec_id AS query_id, c.v AS qv, cent.cell_id,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY list_dot_product(cent.cv, cent.cv)
       |                   - 2 * list_dot_product(c.v, cent.cv), cent.cell_id) AS rn
       |    FROM c, cent WHERE c.vec_id < 5)
       |  WHERE rn <= 2),
       |sc AS (
       |  SELECT p.query_id, cc.vec_id AS neighbor_id,
       |    ROUND(list_dot_product(cc.v, p.qv)
       |      / (sqrt(list_dot_product(cc.v, cc.v)) * sqrt(list_dot_product(p.qv, p.qv))), 6) AS cosine
       |  FROM corpus_cells cc JOIN probes p
       |    ON cc.cell_id = p.cell_id AND cc.vec_id <> p.query_id),
       |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
       |        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
       |      FROM sc)
       |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 3
       |ORDER BY query_id, rnk, neighbor_id""".stripMargin

  /** qe29's oracle: brute-force top-10 truth vs the qe08 IVF pipeline
    * (same probes/cells/kernel, k=10), per-query hit count + recall.
    */
  private lazy val duckQe29Sql: String =
    s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id % 40 = 0),
       |cent AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS cv FROM c WHERE vec_id < 8),
       |truth AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
       |        ROUND(list_dot_product(c.v, q.qv)
       |          / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
       |        c.vec_id) AS rnk
       |    FROM c, q WHERE c.vec_id <> q.query_id)
       |  WHERE rnk <= 10),
       |corpus_cells AS (
       |  SELECT vec_id, v, cell_id FROM (
       |    SELECT c.vec_id, c.v, cent.cell_id,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY list_dot_product(cent.cv, cent.cv)
       |                   - 2 * list_dot_product(c.v, cent.cv), cent.cell_id) AS rn
       |    FROM c, cent)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, qv, cell_id FROM (
       |    SELECT q.query_id, q.qv, cent.cell_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY list_dot_product(cent.cv, cent.cv)
       |                   - 2 * list_dot_product(q.qv, cent.cv), cent.cell_id) AS rn
       |    FROM q, cent)
       |  WHERE rn <= 2),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT p.query_id, cc.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
       |        ROUND(list_dot_product(cc.v, p.qv)
       |          / (sqrt(list_dot_product(cc.v, cc.v)) * sqrt(list_dot_product(p.qv, p.qv))), 6) DESC,
       |        cc.vec_id) AS rnk
       |    FROM corpus_cells cc JOIN probes p
       |      ON cc.cell_id = p.cell_id AND cc.vec_id <> p.query_id)
       |  WHERE rnk <= 10)
       |SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS n_truth,
       |  CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |  ROUND(CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / GREATEST(COUNT(*), 1), 4) AS recall
       |FROM truth t LEFT JOIN approx a
       |  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
       |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin

  /** qe30's oracle: qe29's arithmetic extended per-nProbe — probes keep
    * their rank (rn ≤ 8), a config table fans each candidate to every
    * n_probe ≥ its probe rank, one window per (query, n_probe) ranks
    * top-10, and the sweep aggregates 4-dp per-query recalls as exact
    * DECIMAL sums before one final IEEE divide. `chosen` = the minimal
    * config whose mean recall meets 0.95.
    */
  private lazy val duckQe30Sql: String =
    s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id % 40 = 0),
       |cent AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS cv FROM c WHERE vec_id < 8),
       |truth AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.query_id, c.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
       |        ROUND(list_dot_product(c.v, q.qv)
       |          / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) DESC,
       |        c.vec_id) AS rnk
       |    FROM c, q WHERE c.vec_id <> q.query_id)
       |  WHERE rnk <= 10),
       |corpus_cells AS (
       |  SELECT vec_id, v, cell_id FROM (
       |    SELECT c.vec_id, c.v, cent.cell_id,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY list_dot_product(cent.cv, cent.cv)
       |                   - 2 * list_dot_product(c.v, cent.cv), cent.cell_id) AS rn
       |    FROM c, cent)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, qv, cell_id, CAST(rn AS INTEGER) AS probe_rank FROM (
       |    SELECT q.query_id, q.qv, cent.cell_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.query_id
       |        ORDER BY list_dot_product(cent.cv, cent.cv)
       |                   - 2 * list_dot_product(q.qv, cent.cv), cent.cell_id) AS rn
       |    FROM q, cent)
       |  WHERE rn <= 8),
       |cfg AS (SELECT CAST(unnest(range(1, 9)) AS INTEGER) AS n_probe),
       |approx AS (
       |  SELECT query_id, n_probe, neighbor_id FROM (
       |    SELECT p.query_id, cfg.n_probe, cc.vec_id AS neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY p.query_id, cfg.n_probe ORDER BY
       |        ROUND(list_dot_product(cc.v, p.qv)
       |          / (sqrt(list_dot_product(cc.v, cc.v)) * sqrt(list_dot_product(p.qv, p.qv))), 6) DESC,
       |        cc.vec_id) AS rnk
       |    FROM corpus_cells cc
       |    JOIN probes p ON cc.cell_id = p.cell_id AND cc.vec_id <> p.query_id
       |    JOIN cfg ON cfg.n_probe >= p.probe_rank)
       |  WHERE rnk <= 10),
       |perq AS (
       |  SELECT cfg.n_probe, t.query_id, CAST(COUNT(*) AS BIGINT) AS n_truth,
       |    CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
       |  FROM truth t CROSS JOIN cfg
       |  LEFT JOIN approx a ON a.query_id = t.query_id
       |    AND a.n_probe = cfg.n_probe AND a.neighbor_id = t.neighbor_id
       |  GROUP BY cfg.n_probe, t.query_id),
       |pr AS (SELECT n_probe, query_id,
       |         ROUND(CAST(n_hit AS DOUBLE) / GREATEST(n_truth, 1), 4) AS recall
       |       FROM perq),
       |sw AS (
       |  SELECT n_probe, CAST(COUNT(*) AS BIGINT) AS n_queries,
       |    ROUND(CAST(SUM(CAST(recall AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS mean_recall,
       |    MIN(recall) AS min_recall
       |  FROM pr GROUP BY n_probe),
       |fin AS (SELECT *, mean_recall >= 0.95 AS meets_target FROM sw),
       |best AS (SELECT MIN(n_probe) AS b FROM fin WHERE meets_target)
       |SELECT n_probe, n_queries, mean_recall, min_recall, meets_target,
       |  (meets_target AND n_probe = (SELECT b FROM best)) AS chosen
       |FROM fin ORDER BY n_probe""".stripMargin

  /** Two deterministic Lloyd iterations as a CTE chain ending in
    * `cent2` (cell_id, cv) and `a2` (the final assignment) — qe20
    * SELECTs the centroids, qe23 feeds them into qe08's IVF pattern.
    * Assignment is the qe08 argmin (c·c − 2·v·c, ties on cell_id),
    * means are 6-dp elementwise AVG via range(1,65), empty cells
    * COALESCE to the previous centroid — kmeansFit's retention rule.
    */
  private lazy val duckKmeansCtes: String =
    """c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cent0 AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS cv FROM c WHERE vec_id < 8),
      |a1 AS (SELECT vec_id, v, cell_id FROM (
      |    SELECT c.vec_id, c.v, cent0.cell_id,
      |      ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
      |        list_dot_product(cent0.cv, cent0.cv) - 2 * list_dot_product(c.v, cent0.cv),
      |        cent0.cell_id) AS rn
      |    FROM c, cent0) WHERE rn = 1),
      |m1 AS (SELECT cell_id, i, ROUND(AVG(v[i]), 6) AS av
      |       FROM a1 CROSS JOIN range(1, 65) AS t(i) GROUP BY cell_id, i),
      |cent1 AS (SELECT c0.cell_id, COALESCE(m.cv, c0.cv) AS cv
      |          FROM cent0 c0 LEFT JOIN
      |            (SELECT cell_id, list(av ORDER BY i) AS cv FROM m1 GROUP BY cell_id) m
      |            USING (cell_id)),
      |a2 AS (SELECT vec_id, v, cell_id FROM (
      |    SELECT c.vec_id, c.v, cent1.cell_id,
      |      ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
      |        list_dot_product(cent1.cv, cent1.cv) - 2 * list_dot_product(c.v, cent1.cv),
      |        cent1.cell_id) AS rn
      |    FROM c, cent1) WHERE rn = 1),
      |m2 AS (SELECT cell_id, i, ROUND(AVG(v[i]), 6) AS av
      |       FROM a2 CROSS JOIN range(1, 65) AS t(i) GROUP BY cell_id, i),
      |cent2 AS (SELECT c1.cell_id, COALESCE(m.cv, c1.cv) AS cv
      |          FROM cent1 c1 LEFT JOIN
      |            (SELECT cell_id, list(av ORDER BY i) AS cv FROM m2 GROUP BY cell_id) m
      |            USING (cell_id))""".stripMargin

  /** BM25 scored+ranked CTE chain (qr01's oracle; qe16 reuses it as the
    * sparse leg). Mirrors Retrieval.bm25Search(k1=1.2, b=0.75, Lucene +1
    * idf) term by term: same token analyzer, same arithmetic order, 6-dp
    * DECIMAL partials. `brk` ends ranked (rnk unbounded — consumers cut).
    */
  private lazy val duckBm25Cte: String = duckBm25CteOver("documents")

  /** [[duckBm25Cte]] over any corpus CTE/table with (doc_id, text) —
    * qr03 replays it over the joined hybrid corpus, where N/avgdl are
    * the JOINED corpus's scalars, not the documents table's.
    */
  private def duckBm25CteOver(corpus: String): String = {
    val vals = bm25Queries.map { case (q, t) => s"($q,'$t')" }.mkString(",")
    s"""qt(query_id, term) AS (VALUES $vals),
       |btok AS (SELECT doc_id,
       |    len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS dl,
       |    unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
       |  FROM $corpus),
       |bp AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM btok
       |  WHERE term IN (SELECT DISTINCT term FROM qt)
       |  GROUP BY doc_id, dl, term),
       |bpd AS (SELECT *, COUNT(*) OVER (PARTITION BY term) AS df FROM bp),
       |bst AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(len(regexp_split_to_array(trim(lower(text)), '\\s+'))) AS DOUBLE)
       |      / COUNT(*) AS avgdl
       |  FROM $corpus),
       |bsc AS (SELECT query_id, doc_id,
       |    CAST(ROUND(ln(1 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |        / (CAST(df AS DOUBLE) + 0.5))
       |      * (CAST(tf AS DOUBLE) * 2.2
       |         / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))),
       |      6) AS DECIMAL(18,6)) AS part
       |  FROM bpd JOIN qt USING (term) CROSS JOIN bst),
       |bag AS (SELECT query_id, doc_id, CAST(SUM(part) AS DOUBLE) AS score
       |  FROM bsc GROUP BY query_id, doc_id),
       |brk AS (SELECT *, CAST(ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
       |  FROM bag)""".stripMargin
  }

  /** The full MinHash-LSH near-dup pipeline in DuckDB SQL (qd09's oracle;
    * qd14's cluster oracle builds on it as a CTE).
    */
  private lazy val qd09Sql: String = {
    val mhCols = (0 until 16)
      .map(j => s"    list_min(list_transform(g, x -> md5(x || '#$j'))) AS mh$j")
      .mkString(",\n")
    val bandCols = (0 until 4)
      .map(b => s"    md5(concat_ws('|', ${(4 * b until 4 * b + 4).map(j => s"mh$j").mkString(", ")})) AS band$b")
      .mkString(",\n")
    val ebUnion = (0 until 4)
      .map(b => s"  SELECT doc_id, $b AS band, band$b AS bh FROM bands")
      .mkString("\n  UNION ALL\n")
    s"""WITH sh AS (
       |  SELECT doc_id, $duckShingles3 AS g
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(nfc_normalize(text)), '\\s+') AS w FROM documents)),
       |sig AS (
       |  SELECT doc_id,
       |$mhCols
       |  FROM sh),
       |bands AS (
       |  SELECT doc_id,
       |$bandCols
       |  FROM sig),
       |eb AS (
       |$ebUnion),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM eb a JOIN eb b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |ver AS (
       |  SELECT p.id_a, p.id_b,
       |    len(list_intersect(sa.g, sb.g))
       |      / GREATEST(len(list_distinct(list_concat(sa.g, sb.g))), 1) AS j
       |  FROM pairs p
       |  JOIN sh sa ON sa.doc_id = p.id_a
       |  JOIN sh sb ON sb.doc_id = p.id_b)
       |SELECT id_a, id_b, ROUND(j, 4) AS jaccard FROM ver
       |WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin
  }

  /** qd72's oracle: the recall probe in DuckDB — the md5 doc-Bernoulli
    * sample, brute-force all-pairs Jaccard truth over it, qd09's
    * banding pipeline on the same sample, and the left-join found flag.
    */
  private lazy val qd72Sql: String = {
    val mhCols = (0 until 16)
      .map(j => s"    list_min(list_transform(g, x -> md5(x || '#$j'))) AS mh$j")
      .mkString(",\n")
    val bandCols = (0 until 4)
      .map(b => s"    md5(concat_ws('|', ${(4 * b until 4 * b + 4).map(j => s"mh$j").mkString(", ")})) AS band$b")
      .mkString(",\n")
    val ebUnion = (0 until 4)
      .map(b => s"  SELECT doc_id, $b AS band, band$b AS bh FROM bands")
      .mkString("\n  UNION ALL\n")
    s"""WITH sdocs AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS INTEGER) < 50),
       |sh AS (
       |  SELECT doc_id, $duckShingles3 AS g
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(nfc_normalize(text)), '\\s+') AS w FROM sdocs)),
       |tp AS (
       |  SELECT id_a, id_b, ROUND(j, 4) AS jaccard FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |      len(list_intersect(a.g, b.g))
       |        / GREATEST(len(list_distinct(list_concat(a.g, b.g))), 1) AS j
       |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       |  WHERE j >= 0.5),
       |sig AS (
       |  SELECT doc_id,
       |$mhCols
       |  FROM sh),
       |bands AS (
       |  SELECT doc_id,
       |$bandCols
       |  FROM sig),
       |eb AS (
       |$ebUnion),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM eb a JOIN eb b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |lsh AS (
       |  SELECT p.id_a, p.id_b
       |  FROM cand p
       |  JOIN sh sa ON sa.doc_id = p.id_a
       |  JOIN sh sb ON sb.doc_id = p.id_b
       |  WHERE len(list_intersect(sa.g, sb.g))
       |      / GREATEST(len(list_distinct(list_concat(sa.g, sb.g))), 1) >= 0.5)
       |SELECT tp.id_a, tp.id_b, tp.jaccard,
       |  (l.id_a IS NOT NULL) AS found_by_lsh
       |FROM tp LEFT JOIN lsh l ON tp.id_a = l.id_a AND tp.id_b = l.id_b
       |ORDER BY tp.id_a, tp.id_b""".stripMargin
  }

  /** qd37's oracle: the incremental near-dup probe in DuckDB — portable
    * md5 minhash signatures + LSH bands for corpus AND batch, the
    * band-bucket hit against the corpus, and the within-batch
    * smaller-id-sharer rule, mirroring [[Dedup.incrementalNearDup]]
    * stage for stage.
    */
  private lazy val qd37Sql: String = {
    val mhCols = (0 until 16)
      .map(j => s"    list_min(list_transform(g, x -> md5(x || '#$j'))) AS mh$j")
      .mkString(",\n")
    val bandCols = (0 until 4)
      .map(b => s"    md5(concat_ws('|', ${(4 * b until 4 * b + 4).map(j => s"mh$j").mkString(", ")})) AS band$b")
      .mkString(",\n")
    def eb(src: String) = (0 until 4)
      .map(b => s"  SELECT doc_id, $b AS band, band$b AS bh FROM $src")
      .mkString("\n  UNION ALL\n")
    s"""WITH base AS (SELECT doc_id, text FROM documents),
       |batch AS (
       |  SELECT doc_id, text FROM base WHERE doc_id >= 250
       |  UNION ALL
       |  SELECT doc_id + 8000, text || ' neardup tail' FROM base WHERE doc_id < 5
       |  UNION ALL
       |  SELECT 9000, text || ' coda' FROM base WHERE doc_id = 250),
       |csh AS (
       |  SELECT doc_id, $duckShingles3 AS g
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(nfc_normalize(text)), '\\s+') AS w
       |        FROM base WHERE doc_id < 250)),
       |bsh AS (
       |  SELECT doc_id, $duckShingles3 AS g
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(nfc_normalize(text)), '\\s+') AS w
       |        FROM batch)),
       |csig AS (
       |  SELECT doc_id,
       |$mhCols
       |  FROM csh),
       |bsig AS (
       |  SELECT doc_id,
       |$mhCols
       |  FROM bsh),
       |cbands AS (
       |  SELECT doc_id,
       |$bandCols
       |  FROM csig),
       |bbands AS (
       |  SELECT doc_id,
       |$bandCols
       |  FROM bsig),
       |ceb AS (
       |${eb("cbands")}),
       |beb AS (
       |${eb("bbands")}),
       |crosshit AS (
       |  SELECT DISTINCT b.doc_id FROM beb b
       |  JOIN ceb c ON b.band = c.band AND b.bh = c.bh),
       |withinhit AS (
       |  SELECT DISTINCT b2.doc_id FROM beb b1 JOIN beb b2
       |    ON b1.band = b2.band AND b1.bh = b2.bh AND b1.doc_id < b2.doc_id)
       |SELECT doc_id, band0, band1, band2, band3 FROM bbands
       |WHERE doc_id NOT IN (SELECT doc_id FROM crosshit)
       |  AND doc_id NOT IN (SELECT doc_id FROM withinhit)
       |ORDER BY doc_id""".stripMargin
  }

  /** qd45's oracle: near-dup decontamination in DuckDB — the qd09
    * md5-MinHash/band machinery applied corpus-vs-benchmark, exact
    * sorted-shingle Jaccard verification of band candidates, and the
    * per-doc (count, best-J, flag) rollup, mirroring
    * [[Dedup.fuzzyDecontaminate]] stage for stage.
    */
  private lazy val qd45Sql: String = {
    val mhCols = (0 until 16)
      .map(j => s"    list_min(list_transform(g, x -> md5(x || '#$j'))) AS mh$j")
      .mkString(",\n")
    val bandCols = (0 until 4)
      .map(b => s"    md5(concat_ws('|', ${(4 * b until 4 * b + 4).map(j => s"mh$j").mkString(", ")})) AS band$b")
      .mkString(",\n")
    def eb(src: String, id: String) = (0 until 4)
      .map(b => s"  SELECT $id, $b AS band, band$b AS bh FROM $src")
      .mkString("\n  UNION ALL\n")
    s"""WITH bench AS (
       |  SELECT doc_id + 9000 AS bid, text || ' paraphrased eval tail' AS text
       |  FROM documents WHERE doc_id < 5),
       |dsh AS (
       |  SELECT doc_id, $duckShingles3 AS g
       |  FROM (SELECT doc_id, regexp_split_to_array(trim(nfc_normalize(text)), '\\s+') AS w FROM documents)),
       |bsh AS (
       |  SELECT bid, $duckShingles3 AS g
       |  FROM (SELECT bid, regexp_split_to_array(trim(nfc_normalize(text)), '\\s+') AS w FROM bench)),
       |dsig AS (
       |  SELECT doc_id,
       |$mhCols
       |  FROM dsh),
       |bsig AS (
       |  SELECT bid,
       |$mhCols
       |  FROM bsh),
       |dbands AS (
       |  SELECT doc_id,
       |$bandCols
       |  FROM dsig),
       |bbands AS (
       |  SELECT bid,
       |$bandCols
       |  FROM bsig),
       |deb AS (
       |${eb("dbands", "doc_id")}),
       |beb AS (
       |${eb("bbands", "bid")}),
       |cand AS (
       |  SELECT DISTINCT d.doc_id, b.bid
       |  FROM deb d JOIN beb b ON d.band = b.band AND d.bh = b.bh),
       |ver AS (
       |  SELECT c.doc_id,
       |    ROUND(len(list_intersect(sa.g, sb.g))
       |      / GREATEST(len(list_distinct(list_concat(sa.g, sb.g))), 1), 4) AS j
       |  FROM cand c
       |  JOIN dsh sa ON sa.doc_id = c.doc_id
       |  JOIN bsh sb ON sb.bid = c.bid),
       |hits AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n, MAX(j) AS bj
       |  FROM ver WHERE j >= 0.5 GROUP BY doc_id)
       |SELECT d.doc_id,
       |  COALESCE(h.n, 0) AS n_bench_near_matches,
       |  COALESCE(h.bj, 0.0) AS best_jaccard,
       |  COALESCE(h.n, 0) > 0 AS contaminated_near
       |FROM documents d LEFT JOIN hits h USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** qd61's oracle: the full training-data pipeline replayed end to end
    * in DuckDB — the qd48 NFC canon, the qd10 quality gate, the qd01
    * exact-dedup keeper rule, the qd09 md5-MinHash/band/verify
    * machinery over the deduped corpus, the qd14 recursive connected
    * components, the qd22 3-gram decontamination gate vs the bench
    * slice, the qd23 split buckets, the qd50 temperature plan (salted
    * mix bucket), the qd57 prefix-sum packing, and the qd46-style
    * md5 shard binning — each CTE mirroring its proven sibling's
    * formulation stage for stage.
    */
  private lazy val qd61Sql: String = {
    val mhCols = (0 until 16)
      .map(j => s"    list_min(list_transform(g, x -> md5(x || '#$j'))) AS mh$j")
      .mkString(",\n")
    val bandCols = (0 until 4)
      .map(b => s"    md5(concat_ws('|', ${(4 * b until 4 * b + 4).map(j => s"mh$j").mkString(", ")})) AS band$b")
      .mkString(",\n")
    val ebUnion = (0 until 4)
      .map(b => s"  SELECT doc_id, $b AS band, band$b AS bh FROM bands")
      .mkString("\n  UNION ALL\n")
    s"""WITH RECURSIVE base AS (
       |  SELECT doc_id, source, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, source, upper(text) || '  ' FROM documents
       |  WHERE doc_id % 97 = 1 AND doc_id % 50 <> 0
       |    AND len(regexp_split_to_array(trim(text), '\\s+')) >= 30
       |  UNION ALL
       |  SELECT doc_id + 2000000, source, text || ' near dup tail token' FROM documents
       |  WHERE doc_id % 89 = 2 AND doc_id % 50 <> 0
       |    AND len(regexp_split_to_array(trim(text), '\\s+')) >= 30
       |  UNION ALL
       |  SELECT doc_id + 3000001, source, text FROM documents
       |  WHERE doc_id % 50 = 0 AND doc_id % 7 = 0
       |    AND len(regexp_split_to_array(trim(text), '\\s+')) >= 30),
       |norm AS (
       |  SELECT doc_id, source,
       |    trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g')) AS t
       |  FROM base),
       |bench AS (SELECT doc_id, t FROM norm WHERE doc_id % 50 = 0),
       |gate AS (
       |  SELECT doc_id, source, t,
       |    CAST(len(regexp_split_to_array(t, '\\s+')) AS BIGINT) AS nt
       |  FROM norm
       |  WHERE doc_id % 50 <> 0
       |    AND len(regexp_split_to_array(t, '\\s+')) >= 20),
       |ex AS (
       |  SELECT doc_id, source, t, nt FROM (
       |    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(t)) AS keep FROM gate)
       |  WHERE doc_id = keep),
       |sh AS (
       |  SELECT doc_id, $duckShingles3 AS g
       |  FROM (SELECT doc_id, regexp_split_to_array(t, '\\s+') AS w FROM ex)),
       |sig AS (
       |  SELECT doc_id,
       |$mhCols
       |  FROM sh),
       |bands AS (
       |  SELECT doc_id,
       |$bandCols
       |  FROM sig),
       |eb AS (
       |$ebUnion),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM eb a JOIN eb b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |prs AS (
       |  SELECT p.id_a, p.id_b
       |  FROM cand p
       |  JOIN sh sa ON sa.doc_id = p.id_a
       |  JOIN sh sb ON sb.doc_id = p.id_b
       |  WHERE len(list_intersect(sa.g, sb.g))
       |      / GREATEST(len(list_distinct(list_concat(sa.g, sb.g))), 1) >= 0.5),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM prs
       |  UNION ALL SELECT id_b, id_a FROM prs),
       |nodes AS (SELECT DISTINCT a AS id FROM edges),
       |walk(id, label) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.id),
       |losers AS (SELECT id FROM walk GROUP BY id HAVING id <> MIN(label)),
       |reps AS (
       |  SELECT * FROM ex WHERE doc_id NOT IN (SELECT id FROM losers)),
       |bg AS (
       |  SELECT DISTINCT unnest(gs) AS g3 FROM (
       |    SELECT $duckShingles3 AS gs FROM (
       |      SELECT regexp_split_to_array(t, '\\s+') AS w FROM bench) bw) bs),
       |cont AS (
       |  SELECT DISTINCT rg.doc_id FROM (
       |    SELECT doc_id, unnest(gs) AS g3 FROM (
       |      SELECT doc_id, $duckShingles3 AS gs FROM (
       |        SELECT doc_id, regexp_split_to_array(t, '\\s+') AS w
       |        FROM reps) rw) rs) rg
       |  JOIN bg USING (g3)),
       |clean AS (
       |  SELECT * FROM reps WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
       |train AS (
       |  SELECT * FROM clean
       |  WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 90),
       |m AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS n_tokens
       |      FROM train GROUP BY source),
       |mp AS (SELECT *,
       |         CASE WHEN n_tokens = 0 THEN CAST(0 AS DECIMAL(18,6))
       |              ELSE CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6))
       |         END AS pw
       |       FROM m),
       |gden AS (SELECT CAST(SUM(pw) AS DOUBLE) AS psum FROM mp),
       |thr AS (
       |  SELECT mp.source,
       |    CASE WHEN mp.n_tokens = 0 THEN 0
       |         ELSE CAST(ROUND(LEAST(1.0, CAST(mp.pw AS DOUBLE) / gden.psum * 5000 / mp.n_tokens) * 10000) AS INTEGER) END AS threshold
       |  FROM mp CROSS JOIN gden),
       |mixed AS (
       |  SELECT tr.doc_id, tr.nt FROM train tr JOIN thr ON tr.source = thr.source
       |  WHERE CAST(md5_number_lower('mix#' || CAST(tr.doc_id AS VARCHAR)) % 10000 AS INTEGER) < thr.threshold),
       |nz AS (SELECT doc_id, nt FROM mixed WHERE nt > 0),
       |cu AS (SELECT doc_id, nt,
       |    CAST(SUM(nt) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM nz),
       |ex2 AS (SELECT doc_id, nt, cum, cum - nt AS noff,
       |    CAST(FLOOR(CAST(cum - nt AS DOUBLE) / 128) AS BIGINT) AS f,
       |    CAST(FLOOR(CAST(cum - 1 AS DOUBLE) / 128) AS BIGINT) AS l
       |  FROM cu),
       |sp AS (SELECT doc_id, cum, noff, CAST(i AS BIGINT) AS seq_id
       |  FROM ex2, UNNEST(range(f, l + 1)) AS u(i)),
       |sl AS (SELECT seq_id, doc_id,
       |    LEAST(cum, (seq_id + 1) * 128) - GREATEST(noff, seq_id * 128) AS take
       |  FROM sp),
       |shards AS (
       |  SELECT CAST(md5_number_lower(CAST(seq_id AS VARCHAR)) % 8 AS INTEGER) AS shard_id,
       |    seq_id, doc_id, take
       |  FROM sl)
       |SELECT shard_id, COUNT(DISTINCT seq_id) AS n_seqs,
       |  COUNT(DISTINCT doc_id) AS n_docs,
       |  CAST(SUM(take) AS BIGINT) AS n_tokens
       |FROM shards GROUP BY shard_id ORDER BY shard_id""".stripMargin
  }

  /** qr10's oracle: the MMR greedy loop unrolled to its 3 rounds —
    * same candidate stage as qe02 (dense top-10), same 6-dp score
    * rounding and smaller-id ties, and the score arithmetic in EXACT
    * DECIMAL — λ·(6-dp value) lands on exact .5 at the 7th digit, where
    * double rounding diverges between engines.
    */
  private lazy val qr10Sql: String = {
    def cosExpr(a: String, b: String): String =
      s"ROUND(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"
    val stages = (1 to 3).map { i =>
      val score = "CAST(ROUND(CAST(0.7 AS DECIMAL(5,4)) * rel " +
        "- CAST(0.3 AS DECIMAL(5,4)) * ms, 6) AS DOUBLE)"
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
           |    GREATEST(r.ms, CAST(${cosExpr("r.v", "p.v")} AS DECIMAL(18,6))) AS ms
           |  FROM rem$i r JOIN pick$i p USING (query_id)
           |  WHERE r.neighbor_id <> p.neighbor_id)"""
      pick + rem
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |sc AS (SELECT query_id, neighbor_id, v,
       |         CAST(${cosExpr("v", "qv")} AS DECIMAL(18,6)) AS rel
       |       FROM c, q WHERE neighbor_id <> query_id),
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

  /** Boolean-AND qrels CTEs layered on [[duckBm25Cte]]'s bp/qt — the
    * SQL twin of [[bm25Qrels]] (doc relevant to a query iff EVERY query
    * term has tf >= [[qrelsMinTf]]). Ends with `qrels(query_id, doc_id)`.
    */
  private lazy val duckQrelsCte: String =
    s"""$duckBm25Cte,
       |qcnt AS (SELECT query_id, COUNT(DISTINCT term) AS qt_n FROM qt GROUP BY query_id),
       |qrels0 AS (SELECT q.query_id, d.doc_id, COUNT(DISTINCT d.term) AS nt
       |  FROM bp d JOIN qt q USING (term) WHERE d.tf >= $qrelsMinTf
       |  GROUP BY q.query_id, d.doc_id),
       |qrels AS (SELECT query_id, doc_id FROM qrels0 JOIN qcnt USING (query_id)
       |  WHERE nt = qt_n)""".stripMargin

  /** qr04's whole metric battery as CTEs over [[duckQrelsCte]], ending
    * in `evout(query_id, n_rel, hits, precision_at_k, recall_at_k, rr,
    * ndcg_at_k)` — shared by the per-query (qr04) and corpus-rollup
    * (qr07) oracles so the two can never drift.
    */
  private lazy val duckEvalCte: String =
    s"""$duckQrelsCte,
       |nrel AS (SELECT query_id, COUNT(*) AS n_rel FROM qrels GROUP BY query_id),
       |topk AS (SELECT query_id, doc_id, rnk FROM brk WHERE rnk <= 10),
       |hh AS (SELECT t.query_id, t.rnk,
       |    CAST(ROUND(1.0 / (ln(CAST(t.rnk AS DOUBLE) + 1.0) / ln(2.0)), 6)
       |      AS DECIMAL(18,6)) AS dcg_term
       |  FROM topk t JOIN qrels r ON r.query_id = t.query_id AND r.doc_id = t.doc_id),
       |pq AS (SELECT query_id, COUNT(*) AS hits, CAST(SUM(dcg_term) AS DOUBLE) AS dcg,
       |    MIN(rnk) AS frr
       |  FROM hh GROUP BY query_id),
       |ideal AS (SELECT CAST(i AS BIGINT) AS ideal_i,
       |    CAST(SUM(CAST(ROUND(1.0 / (ln(CAST(i AS DOUBLE) + 1.0) / ln(2.0)), 6)
       |      AS DECIMAL(18,6))) OVER (ORDER BY i) AS DOUBLE) AS idcg
       |  FROM range(1, 11) AS t(i)),
       |evout AS (SELECT n.query_id, n.n_rel, COALESCE(p.hits, 0) AS hits,
       |  ROUND(CAST(COALESCE(p.hits, 0) AS DOUBLE) / 10.0, 6) AS precision_at_k,
       |  ROUND(CAST(COALESCE(p.hits, 0) AS DOUBLE) / CAST(n.n_rel AS DOUBLE), 6) AS recall_at_k,
       |  ROUND(CASE WHEN p.frr IS NOT NULL THEN 1.0 / CAST(p.frr AS DOUBLE)
       |    ELSE 0.0 END, 6) AS rr,
       |  ROUND(COALESCE(p.dcg, 0.0) / i.idcg, 6) AS ndcg_at_k
       |FROM nrel n LEFT JOIN pq p USING (query_id)
       |JOIN ideal i ON i.ideal_i = LEAST(n.n_rel, 10))""".stripMargin

  /** Shared winnowing CTEs (qd51 + qd53 — one site, so the two oracles
    * can never drift): canon tokens with ALL boundary whitespace
    * stripped (mirroring Dedup.wsTrim — DuckDB/Spark `trim` strip only
    * spaces), positional md5 3-grams, and the composite-key window min.
    * Ends with `wins(doc_id, pos, ngr, wk)`; `ww(doc_id, w)` stays
    * visible for gram-set consumers.
    */
  private lazy val duckWinnowCte: String =
    """ww AS (
      |  SELECT doc_id, regexp_split_to_array(
      |    regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+') AS w
      |  FROM documents),
      |gr AS (
      |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
      |    md5(w[CAST(i AS INT)] || ' ' || w[CAST(i + 1 AS INT)] || ' ' || w[CAST(i + 2 AS INT)]) AS h,
      |    CAST(len(w) - 2 AS BIGINT) AS ngr
      |  FROM ww, UNNEST(range(1, GREATEST(len(w) - 2, 0) + 1)) AS t(i)),
      |wins AS (
      |  SELECT doc_id, pos, ngr,
      |    MIN(h || '#' || lpad(CAST(ngr - pos AS VARCHAR), 10, '0'))
      |      OVER (PARTITION BY doc_id ORDER BY pos
      |            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wk
      |  FROM gr)""".stripMargin

  /** The deterministic ±1 JL/SRP planes as DuckDB VALUES rows
    * `(i, plane_list)`, 1-based — qe26's oracle replays the projection
    * against the exact matrix [[Similarity.randomProject]] uses.
    */
  private def duckPlanesValues(nPlanes: Int, dim: Int): String =
    Similarity.planes(nPlanes, dim).zipWithIndex.map { case (p, i) =>
      s"(${i + 1}, ${p.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")})"
    }.mkString(",\n")

  /** The SRP-LSH bucket of `vExpr` in DuckDB: the ±1 plane matrix is
    * deterministic ([[Similarity.planes]]), so it embeds as literals and
    * `list_dot_product` reproduces the sequential-double sign test bit for
    * bit — which is what lets the LSH similarity queries be oracle-checked
    * rather than rows-only.
    */
  private def duckSrpBucket(vExpr: String, nPlanes: Int, dim: Int): String =
    Similarity.planes(nPlanes, dim).zipWithIndex.map { case (p, i) =>
      val lit = p.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product($vExpr, $lit) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** One splitmix64 mix round `(z ^ (z >>> shift)) * mult` replayed in
    * DuckDB over a signed-BIGINT column: DuckDB BIGINT arithmetic errors
    * on overflow instead of wrapping, so the unsigned shift lifts into
    * HUGEINT and the wrapping 64-bit multiply runs as 32-bit limbs —
    * `(a·lo + ((a·hi) mod 2³²)·2³²) mod 2⁶⁴` — with a final signed
    * fold-back. Every intermediate stays under 2⁹⁷ ≪ the 128-bit
    * HUGEINT range.
    */
  private def duckMixRound(zCol: String, shift: Int, mult: Long): String = {
    val lo = mult & 0xffffffffL
    val hi = mult >>> 32
    val two64 = "18446744073709551616::HUGEINT"
    val zu = s"(CAST($zCol AS HUGEINT) + CASE WHEN $zCol < 0 THEN $two64 ELSE 0::HUGEINT END)"
    val x = s"xor($zCol, CAST($zu // ${1L << shift} AS BIGINT))"
    val xu = s"(CAST($x AS HUGEINT) + CASE WHEN $x < 0 THEN $two64 ELSE 0::HUGEINT END)"
    val prod = s"(($xu * $lo + (($xu * $hi) % 4294967296) * 4294967296) % $two64)"
    s"CAST(CASE WHEN $prod >= 9223372036854775808::HUGEINT THEN $prod - $two64 ELSE $prod END AS BIGINT)"
  }

  /** qm04's oracle — the image near-dup pipeline replayed END TO END
    * without decoding a single PNG: [[graft.multimodal.Multimodal
    * .syntheticPng]]'s pixels are a pure splitmix64 function of
    * (src_id, y, x), so the oracle regenerates the raster relationally
    * ([[duckMixRound]] limb arithmetic), folds the 16-bin luminance
    * histogram (counts/64 — a power-of-two denominator, so the Spark
    * side's float32 features are EXACT and the doubles agree
    * bit-for-bit), and replays the qe05 SRP-LSH bucket/pair stage. What
    * the oracle deliberately does NOT cover is the PNG byte round-trip
    * itself — that encode→decode identity is MultimodalSpec's job — but
    * a decoder regression now breaks this hash compare too, because the
    * features would drift off the regenerated raster.
    */
  /** qm02's oracle — the real-PNG-decode query replayed from the same
    * pixel arithmetic as [[qm04Sql]], with the VARIABLE width (8 + id%8)
    * threaded through the grid and the histogram normalizer. The
    * float32 feature values agree with the double replay at 4 dp: every
    * c/(w·8) value whose 5th decimal could round differently is
    * dyadic (denominator a power of two after reduction — the only
    * divisors of both w·8 and 20000 are powers of two), hence exact in
    * BOTH float32 and double.
    */
  /** qm01's oracle — the stub decode's rolling hash + LCG replayed
    * relationally: h = fold(31·h + byte) over the payload's UTF-8
    * bytes (ASCII in this corpus, so `ord` per char IS the byte), then
    * two rounds of h·6364136223846793005 + 1442695040888963407 (mod
    * 2⁶⁴), feature = ((h >>> 40) % 1000)/1000. Both multipliers are
    * < 2⁶³, so every product of a mod-2⁶⁴ value fits HUGEINT directly —
    * no 32-bit limb fold-back (contrast qm02Sql's splitmix constants).
    * The initial hash is PREPENDED to the byte list so an empty payload
    * reduces to it without tripping DuckDB's empty-list reduce error,
    * matching the stub (which hashes zero bytes, then runs the LCG).
    *
    * The `ord(char) = UTF-8 byte` identity holds ONLY for ASCII
    * non-null text, and a violation would not fail — it would
    * hash-MISMATCH silently (multi-byte chars fold as one codepoint
    * here but as 2–4 signed bytes in the stub; NULL text nulls the
    * whole row). The `chk` CTE makes that assumption MECHANICAL: any
    * NULL or text whose char count differs from its UTF-8 byte count
    * raises a loud DuckDB error naming the doc instead of silently
    * diverging from the Spark stub.
    */
  private lazy val qm01Sql: String = {
    val two64 = "18446744073709551616::HUGEINT"
    val lcg = (h: String) =>
      s"($h * 6364136223846793005::HUGEINT + 1442695040888963407::HUGEINT) % $two64"
    val feat = (h: String) =>
      s"round((($h // 1099511627776::HUGEINT) % 1000)::DOUBLE / 1000.0, 4)"
    s"""WITH chk AS (
       |  SELECT doc_id, CASE
       |    WHEN text IS NULL OR length(text) <> octet_length(encode(text))
       |      THEN error('qm01 oracle: non-ASCII or NULL text at doc_id ' || doc_id)
       |    ELSE text END AS text
       |  FROM documents),
       |f AS (
       |  SELECT doc_id AS media_id, octet_length(encode(text)) > 0 AS decode_ok,
       |    list_reduce(
       |      list_prepend(1125899906842597::HUGEINT,
       |        list_transform(string_split(text, ''), c -> ord(c)::HUGEINT)),
       |      (acc, b) -> (31*acc + b) % $two64) AS h
       |  FROM chk),
       |l1 AS (SELECT media_id, decode_ok, ${lcg("h")} AS h1 FROM f),
       |l2 AS (SELECT media_id, decode_ok, h1, ${lcg("h1")} AS h2 FROM l1)
       |SELECT media_id, decode_ok,
       |  ${feat("h1")} AS f0,
       |  ${feat("h2")} AS f1
       |FROM l2 ORDER BY media_id""".stripMargin
  }

  private lazy val qm02Sql: String = {
    val s1 = duckMixRound("z", 30, 0xbf58476d1ce4e5b9L)
    val s2 = duckMixRound("z", 27, 0x94d049bb133111ebL)
    val two64 = "18446744073709551616::HUGEINT"
    val finalXor =
      s"""xor(z, CAST((CAST(z AS HUGEINT) + CASE WHEN z < 0 THEN $two64 ELSE 0::HUGEINT END) // 2147483648 AS BIGINT)) & 16777215"""
    s"""WITH media AS (
       |  SELECT doc_id AS media_id, CAST(8 + doc_id % 8 AS INTEGER) AS w
       |  FROM documents WHERE doc_id < 64),
       |grid AS (
       |  -- constant-bound range + filter, NOT a column-arg lateral
       |  -- UNNEST: joining two CTEs that inline a lateral unnest OOMs
       |  -- DuckDB 1.0 (reproduced on a 64x832-row join)
       |  SELECT media_id, w, CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x
       |  FROM media CROSS JOIN range(0, 8) AS ty(y) CROSS JOIN range(0, 15) AS tx(x)
       |  WHERE x < w),
       |s0 AS (SELECT media_id,
       |  media_id * 1000003 + y * 8191 + x + (-7046029254386353131) AS z FROM grid),
       |s1 AS (SELECT media_id, $s1 AS z FROM s0),
       |s2 AS (SELECT media_id, $s2 AS z FROM s1),
       |px AS (SELECT media_id, $finalXor AS rgb FROM s2),
       |lum AS (SELECT media_id,
       |  ((rgb // 65536) % 256 + (rgb // 256) % 256 + rgb % 256) // 3 AS luma FROM px),
       |hist AS (SELECT media_id, luma // 16 AS bin, COUNT(*) AS c
       |         FROM lum GROUP BY media_id, bin)
       |SELECT m.media_id, true AS decode_ok, m.w AS width, 8 AS height,
       |  ROUND(COALESCE(h0.c, 0) / CAST(m.w * 8 AS DOUBLE), 4) AS f0,
       |  ROUND(COALESCE(h15.c, 0) / CAST(m.w * 8 AS DOUBLE), 4) AS f15
       |FROM media m
       |LEFT JOIN hist h0 ON h0.media_id = m.media_id AND h0.bin = 0
       |LEFT JOIN hist h15 ON h15.media_id = m.media_id AND h15.bin = 15
       |ORDER BY m.media_id""".stripMargin
  }

  /** qm03's oracle — the real-WAV-decode query replayed from
    * [[graft.multimodal.Multimodal.syntheticSamples]]' square wave:
    * sample(i) = ±(1000 + id%7·1000) flipping every (4 + id%13)
    * samples. Every emitted value is integer-derived (sum of exact
    * squares < 2⁵³, peak = amp, zero-crossings = sign-flip count) so
    * the WAV encode→decode identity is the only Spark-side physics —
    * and a codec regression now breaks this hash compare.
    */
  private lazy val qm03Sql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    4 + doc_id % 13 AS half,
      |    CAST(1000 + (doc_id % 7) * 1000 AS BIGINT) AS amp,
      |    CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS rate,
      |    CAST(800 + (doc_id % 5) * 200 AS BIGINT) AS n
      |  FROM documents WHERE doc_id < 64),
      |samp AS (
      |  -- constant-bound range + filter (n <= 1600 by construction);
      |  -- see qm02Sql's grid note on DuckDB 1.0 lateral-unnest joins
      |  SELECT media_id, half, amp, rate, n, CAST(i AS BIGINT) AS i,
      |    CASE WHEN (i // half) % 2 = 0 THEN amp ELSE -amp END AS s
      |  FROM media CROSS JOIN range(0, 1600) AS u(i)
      |  WHERE i < n),
      |agg AS (
      |  SELECT media_id, rate, n,
      |    SUM(CAST(s * s AS DOUBLE)) AS sumsq,
      |    CAST(MAX(abs(s)) AS INTEGER) AS peak,
      |    CAST(SUM(CASE WHEN i >= 1
      |        AND ((i // half) % 2) <> (((i - 1) // half) % 2)
      |        THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
      |  FROM samp GROUP BY media_id, rate, n)
      |SELECT media_id, true AS decode_ok, rate AS sample_rate,
      |  n AS n_samples,
      |  ROUND(CAST(n AS DOUBLE) / rate, 6) AS duration_sec,
      |  ROUND(sqrt(sumsq / n), 4) AS rms,
      |  zero_crossings, peak
      |FROM agg ORDER BY media_id""".stripMargin

  /** qm05's oracle — the real container-metadata parse replayed from
    * the synthetic writers' parameters: the AVI path round-trips fps
    * through the header's integer dwMicroSecPerFrame (1e6/fps0
    * truncated, then 1e6/us re-derived — the parser's honest precision
    * loss, e.g. fps 30 reads back 30.0003) and duration through
    * nFrames·us; the MP4 path is exact integers (duration/timescale
    * divides evenly by construction). The parser's rint(x·1e6)/1e6
    * stabilization never lands on a .5 for these parameter grids, so
    * DuckDB's half-away round replays Scala's half-even rint exactly.
    */
  private lazy val qm05Sql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id,
      |    CAST(320 + (doc_id % 4) * 160 AS INTEGER) AS w,
      |    CAST(240 + (doc_id % 4) * 120 AS INTEGER) AS h,
      |    24 + (doc_id % 3) * 6 AS fps0,
      |    100 + (doc_id % 7) * 50 AS nf_avi,
      |    2 + (doc_id % 5) AS k
      |  FROM documents WHERE doc_id < 64),
      |avi AS (
      |  SELECT media_id, w, h, CAST(nf_avi AS BIGINT) AS n_frames,
      |    1000000 // fps0 AS us
      |  FROM media WHERE media_id % 2 = 0),
      |avi2 AS (
      |  SELECT media_id, true AS parse_ok, 'avi' AS container,
      |    w AS width, h AS height, n_frames,
      |    ROUND(round(1.0e6 / us * 1e6) / 1e6, 4) AS fps,
      |    ROUND(round(CAST(n_frames * us AS DOUBLE) / 1e6 * 1e6) / 1e6, 4) AS duration_sec
      |  FROM avi),
      |mp4 AS (
      |  SELECT media_id, true AS parse_ok, 'mp4' AS container,
      |    w AS width, h AS height, CAST(48 * k AS BIGINT) AS n_frames,
      |    ROUND(CAST(48 AS DOUBLE), 4) AS fps,
      |    ROUND(CAST(k AS DOUBLE), 4) AS duration_sec
      |  FROM media WHERE media_id % 2 = 1)
      |SELECT media_id, parse_ok, container, width, height, n_frames,
      |  fps, duration_sec
      |FROM (SELECT * FROM avi2 UNION ALL SELECT * FROM mp4)
      |ORDER BY media_id""".stripMargin

  /** qm06's oracle — the MJPEG frame decode replayed from the fixture
    * arithmetic alone: the frame at sampled index `i` is a uniform gray
    * `16·bin + 8` with `bin = (media_id·7 + i·13) % 16`, and mid-bin
    * uniform gray round-trips quality-0.95 JPEG EXACTLY (all 16 bins
    * verified on the JDK codec), so the decoded histogram is one-hot:
    * `bin` is the argmax, `f_max` is exactly 1.0. The even-sampling
    * rule (`k·n/maxFrames` integer division) is replayed with `//`.
    * What the oracle covers: the RIFF frame walk, the even sampling,
    * the JPEG decode, the histogram. A regression in any of them moves
    * `bin`, `f_max`, or the row set — all hash-compared.
    */
  private lazy val qm06Sql: String =
    """WITH media AS (
      |  SELECT doc_id AS media_id, 2 + doc_id % 4 AS n
      |  FROM documents WHERE doc_id < 64),
      |ks AS (
      |  SELECT media_id, n, CAST(k AS BIGINT) AS k
      |  FROM media CROSS JOIN range(0, 3) AS t(k)
      |  WHERE k < CASE WHEN n <= 3 THEN n ELSE 3 END),
      |fi AS (
      |  SELECT media_id,
      |    CAST(CASE WHEN n <= 3 THEN k ELSE k * n // 3 END AS INTEGER) AS frame_idx
      |  FROM ks)
      |SELECT media_id, frame_idx, true AS decode_ok,
      |  CAST(16 AS INTEGER) AS width, CAST(12 AS INTEGER) AS height,
      |  CAST((media_id * 7 + frame_idx * 13) % 16 AS INTEGER) AS bin,
      |  CAST(1.0 AS DOUBLE) AS f_max
      |FROM fi ORDER BY media_id, frame_idx""".stripMargin

  private lazy val qm04Sql: String = {
    val s1 = duckMixRound("z", 30, 0xbf58476d1ce4e5b9L)
    val s2 = duckMixRound("z", 27, 0x94d049bb133111ebL)
    val two64 = "18446744073709551616::HUGEINT"
    val finalXor =
      s"""xor(z, CAST((CAST(z AS HUGEINT) + CASE WHEN z < 0 THEN $two64 ELSE 0::HUGEINT END) // 2147483648 AS BIGINT)) & 16777215"""
    s"""WITH media AS (
       |  SELECT doc_id AS media_id,
       |    CASE WHEN doc_id >= 40 THEN doc_id - 40 ELSE doc_id END AS src_id
       |  FROM documents WHERE doc_id < 48),
       |grid AS (
       |  SELECT media_id, src_id, CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x
       |  FROM media CROSS JOIN range(0, 8) AS ty(y) CROSS JOIN range(0, 8) AS tx(x)),
       |s0 AS (SELECT media_id,
       |  src_id * 1000003 + y * 8191 + x + (-7046029254386353131) AS z FROM grid),
       |s1 AS (SELECT media_id, $s1 AS z FROM s0),
       |s2 AS (SELECT media_id, $s2 AS z FROM s1),
       |px AS (SELECT media_id, $finalXor AS rgb FROM s2),
       |lum AS (SELECT media_id,
       |  ((rgb // 65536) % 256 + (rgb // 256) % 256 + rgb % 256) // 3 AS luma FROM px),
       |hist AS (SELECT media_id, luma // 16 AS bin, COUNT(*) AS c
       |         FROM lum GROUP BY media_id, bin),
       |feat AS (
       |  SELECT m.media_id, list(COALESCE(h.c, 0) / 64.0 ORDER BY t.i) AS v
       |  FROM media m CROSS JOIN range(0, 16) AS t(i)
       |  LEFT JOIN hist h ON h.media_id = m.media_id AND h.bin = t.i
       |  GROUP BY m.media_id),
       |b AS (SELECT media_id, v, ${duckSrpBucket("v", 4, 16)} AS bucket FROM feat),
       |prs AS (
       |  SELECT a.media_id AS id_a, b2.media_id AS id_b,
       |    ROUND(list_dot_product(a.v, b2.v)
       |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b2.v, b2.v))), 6) AS cosine
       |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.media_id < b2.media_id)
       |SELECT id_a, id_b, cosine FROM prs WHERE cosine >= 0.999
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB CTE chain computing the portable simhash's hi/lo 32-bit
    * halves per doc — per-bit majority vote over `md5_number_lower(token)`,
    * DuckDB's view of the same 64 bits [[NativeExpressions
    * .PortableSimHashExpr]] votes with; the halves keep every vote sum and
    * bit OR inside signed-int64 territory. Ends with `x(doc_id, hi, lo)`;
    * docs with no tokens have no row in `x` (callers LEFT JOIN +
    * COALESCE). Shared by the qd20 signature oracle and the qd21 near-dup
    * oracle.
    */
  private lazy val duckSimhashHiLoCte: String = {
    val voteCols = (0 until 64)
      .map(b => s"    SUM(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n")
    val lo = (0 until 32)
      .map(b => s"CASE WHEN v$b > 0 THEN CAST(1 AS BIGINT) << $b ELSE 0 END")
      .mkString(" + ")
    val hi = (32 until 64)
      .map(b => s"CASE WHEN v$b > 0 THEN CAST(1 AS BIGINT) << ${b - 32} ELSE 0 END")
      .mkString(" + ")
    s"""e AS (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '')) AS tok
       |  FROM documents),
       |h AS (SELECT doc_id, md5_number_lower(tok) AS hv FROM e),
       |v AS (
       |  SELECT doc_id,
       |$voteCols
       |  FROM h GROUP BY doc_id),
       |x AS (SELECT doc_id, $hi AS hi, $lo AS lo FROM v)""".stripMargin
  }

  /** The Morton interleave of `a`/`b` (low `bits` bits each) as a DuckDB
    * bit-arithmetic expression — mirrors [[graft.ops.LayoutOps.zValue]]
    * term for term.
    */
  private def duckZValue(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($a >> $i) & 1) << ${2 * i})",
      s"((($b >> $i) & 1) << ${2 * i + 1})")).mkString("(", " | ", ")")

  /** The unigram-LM CTE chain over `documents`, ending in
    * `lm(doc_id, n_tok, avg_logprob)` — shared by the qd29 oracle and the
    * qd33 pipeline oracle so the model semantics cannot drift.
    */
  private lazy val duckUnigramLmCte: String =
    """toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents),
      |vocab AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok),
      |total AS (SELECT CAST(SUM(freq) AS DOUBLE) AS n FROM vocab),
      |lp AS (
      |  SELECT t.doc_id,
      |    CAST(ROUND(ln(CAST(v.freq AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lp
      |  FROM toks t JOIN vocab v USING (tok)),
      |lmagg AS (SELECT doc_id, COUNT(*) AS n_tok, SUM(lp) AS slp FROM lp GROUP BY doc_id),
      |lm AS (
      |  SELECT doc_id, n_tok,
      |    ROUND(CAST(slp AS DOUBLE) / n_tok - ln((SELECT n FROM total)), 4) AS avg_logprob
      |  FROM lmagg)""".stripMargin

  /** The DSIR CTE chain over relation `src(doc_id, lang, text, …)` with
    * target = `src` rows where lang = 'en', ending in
    * `perdoc(doc_id, n_feat, wsum)` — shared by qd30 and qd33.
    */
  private def duckDsirCtes(src: String): String =
    s"""feat AS (
       |  SELECT doc_id, lang, CAST(md5_number_lower(g) % 1024 AS INTEGER) AS b
       |  FROM (SELECT doc_id, lang,
       |          unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
       |        FROM (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS w
       |              FROM $src))),
       |raw AS (SELECT b, COUNT(*) AS cr FROM feat GROUP BY b),
       |tgt AS (SELECT b, COUNT(*) AS ct FROM feat WHERE lang = 'en' GROUP BY b),
       |tot AS (SELECT (SELECT CAST(SUM(cr) AS DOUBLE) FROM raw) AS cr_total,
       |               (SELECT CAST(SUM(ct) AS DOUBLE) FROM tgt) AS ct_total),
       |lr AS (
       |  SELECT raw.b,
       |    CAST(ROUND(ln(CAST(COALESCE(tgt.ct, 0) AS DOUBLE) + 1.0) - ln(tot.ct_total + 1024)
       |             - ln(CAST(raw.cr AS DOUBLE) + 1.0) + ln(tot.cr_total + 1024), 6)
       |      AS DECIMAL(18,6)) AS lr
       |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot),
       |perdoc AS (
       |  SELECT f.doc_id, CAST(SUM(cnt) AS BIGINT) AS n_feat, SUM(cnt * lr.lr) AS wsum
       |  FROM (SELECT doc_id, b, COUNT(*) AS cnt FROM feat GROUP BY doc_id, b) f
       |  JOIN lr ON f.b = lr.b GROUP BY f.doc_id)""".stripMargin

  /** The duplicated-passage CTE chain over relation `src(doc_id, text)`,
    * ending in `dupf(doc_id, n_spans, n_dup_spans, dup_frac)` — shared by
    * qd32 and qd33.
    */
  private def duckDupPassageCtes(src: String): String =
    s"""dpd AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM $src),
       |dpg AS (SELECT doc_id, ${duckShinglesN(5)} AS gs FROM dpd),
       |spans AS (SELECT doc_id, unnest(gs) AS g FROM dpg),
       |shared AS (SELECT g FROM spans GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
       |dupc AS (SELECT doc_id, COUNT(*) AS n_dup FROM spans JOIN shared USING (g) GROUP BY doc_id),
       |totc AS (SELECT doc_id, COUNT(*) AS n FROM spans GROUP BY doc_id),
       |dupf AS (
       |  SELECT dpd.doc_id, COALESCE(t.n, 0) AS n_spans,
       |    COALESCE(du.n_dup, 0) AS n_dup_spans,
       |    ROUND(COALESCE(du.n_dup, 0) / GREATEST(COALESCE(t.n, 0), 1), 4) AS dup_frac
       |  FROM dpd LEFT JOIN totc t USING (doc_id) LEFT JOIN dupc du USING (doc_id))""".stripMargin

  /** Sampling-weight maps shared between the Spark queries and their
    * oracles — one source of truth so a weight edit cannot drift.
    */
  // qr01/qe16 fixture: three topic queries over the documents vocabulary
  private val bm25Queries: Seq[(Int, String)] = Seq(
    1 -> "spark", 1 -> "stream", 1 -> "window",
    2 -> "hash", 2 -> "join", 2 -> "merge",
    3 -> "customer", 3 -> "order", 3 -> "value")

  /** Deterministic binary qrels for the retrieval-eval queries (qr04/
    * qr05): a doc is relevant to a query iff EVERY query term occurs in
    * it at least [[qrelsMinTf]] times (boolean-AND over a tf floor — the
    * strictest judgment derivable from the same tokenization BM25 uses,
    * and strict enough on this common-vocabulary fixture that the BM25
    * top-10 contains BOTH hits and misses, keeping qr04's metrics and
    * qr05's negatives non-vacuous). Exactly replayable in SQL.
    * Scale shape: one restricted token explode (semi-joined against the
    * broadcast term set before the shuffle, like BM25's postings) + a
    * grouped tf count and a distinct-term count per (query, doc).
    */
  private val qrelsMinTf = 3

  private def bm25Qrels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val q = broadcast(bm25Queries.toDF("query_id", "term"))
    val qTerms = broadcast(q.select(col("term")).distinct())
    val qCnt = broadcast(q.groupBy(col("query_id"))
      .agg(countDistinct(col("term")).as("qt_n")))
    val docTermTf = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(graft.functions.TextAnalysis.tokens(lower(col("text")))).as("term"))
      .join(qTerms, Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .filter(col("tf") >= qrelsMinTf)
    docTermTf.join(q, "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(countDistinct(col("term")).as("nt"))
      .join(qCnt, "query_id")
      .filter(col("nt") === col("qt_n"))
      .select(col("query_id"), col("doc_id"))
  }

  /** Build-once sidecar-indexed corpora for the serving queries (qr02/
    * qe19/qr03): a tmp path keyed by `tag` + a FINGERPRINT of the source
    * parquet files (names + sizes + mtimes — mtime catches an in-place
    * regeneration that happens to keep byte lengths) — the expensive
    * one-time layout + index build is reused across calls against
    * unchanged data (the production shape: index once, search many) but
    * can never serve a stale corpus after the testdata is regenerated
    * in place.
    */
  private def builtCorpusFor(d: String, tag: String, srcTables: Seq[String])(
      build: String => Unit): String = {
    val parts = srcTables.flatMap { t =>
      val src = new java.io.File(d, t)
      (if (src.isDirectory) Option(src.listFiles()).toSeq.flatten else Seq(src))
        .map(f => s"$t/${f.getName}:${f.length}:${f.lastModified}")
    }.sorted
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest((d + "|" + parts.mkString(",")).getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val root = new java.io.File(sys.props("java.io.tmpdir"), s"graft_${tag}_$fp")
    val corpus = new java.io.File(root, "corpus").toString
    val done = new java.io.File(root, "_built")
    corpusBuildLock.synchronized {
      if (!done.exists()) { // marker LAST: a crashed build rebuilds
        build(corpus)
        done.createNewFile()
      }
    }
    corpus
  }
  private val corpusBuildLock = new Object

  /** qr02's corpus: the documents table in the exact-sink layout
    * (epoch/batch_id partitions + content_hash) with a built postings
    * sidecar.
    */
  private def qr02CorpusFor(s: SparkSession, d: String): String =
    builtCorpusFor(d, "qr02", Seq("documents.parquet")) { corpus =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          TextAnalysis.fingerprint(col("text")).as("content_hash"),
          lit(0L).as("epoch"), lit(0L).as("batch_id"))
        .write.mode("overwrite").partitionBy("epoch", "batch_id")
        .parquet(corpus)
      graft.streaming.CorpusIngest.buildPostingsIndex(s, corpus, buckets = 64)
    }

  /** The deterministic qe08 centroid table (cell_id = vec_id < 8) —
    * shared by qe19/qr03's sidecar builds and searches so the pinned
    * fingerprint always matches.
    */
  private def qe08Centroids(s: SparkSession, d: String) =
    Tables.embeddings(s, d).filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell_id"),
        col("embedding").cast("array<double>").as("centroid"))

  /** qe19's corpus: the embeddings table in the semantic-sink layout
    * (doc_id, embedding, cell under qe08's fixed centroids, epoch/
    * batch_id partitions) with a built cell sidecar.
    */
  private def qe19CorpusFor(s: SparkSession, d: String): String = {
    val cents = qe08Centroids(s, d)
    builtCorpusFor(d, "qe19", Seq("embeddings.parquet")) { corpus =>
      Similarity.Ivf.assign(
          Tables.embeddings(s, d)
            .select(col("vec_id").cast("long").as("doc_id"),
              col("embedding").cast("array<double>").as("embedding")),
          "embedding", cents, out = "cell")
        .select(col("doc_id"), col("embedding"), col("cell").cast("int").as("cell"),
          lit(0L).as("epoch"), lit(0L).as("batch_id"))
        .write.mode("overwrite").partitionBy("epoch", "batch_id")
        .parquet(corpus)
      graft.streaming.CorpusIngest.buildCellIndex(s, corpus, cents)
    }
  }

  /** qr03's corpus: documents ⋈ embeddings (doc_id = vec_id) carrying
    * BOTH retrieval columns, with BOTH sidecars built — the one-corpus
    * hybrid serving layout.
    */
  private def qr03CorpusFor(s: SparkSession, d: String): String = {
    val cents = qe08Centroids(s, d)
    builtCorpusFor(d, "qr03",
        Seq("documents.parquet", "embeddings.parquet")) { corpus =>
      Similarity.Ivf.assign(
          Tables.documents(s, d).select(col("doc_id"), col("text"))
            .join(Tables.embeddings(s, d)
              .select(col("vec_id").as("doc_id"),
                col("embedding").cast("array<double>").as("embedding")),
              Seq("doc_id"))
            .select(col("doc_id"), col("text"),
              TextAnalysis.fingerprint(col("text")).as("content_hash"),
              col("embedding")),
          "embedding", cents, out = "cell")
        .select(col("doc_id"), col("text"), col("content_hash"),
          col("embedding"), col("cell").cast("int").as("cell"),
          lit(0L).as("epoch"), lit(0L).as("batch_id"))
        .write.mode("overwrite").partitionBy("epoch", "batch_id")
        .parquet(corpus)
      graft.streaming.CorpusIngest.buildPostingsIndex(s, corpus, buckets = 64)
      graft.streaming.CorpusIngest.buildCellIndex(s, corpus, cents)
    }
  }

  private val qd25Weights = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.0)
  private val qd27Weights = Map("src0" -> 0.5, "src1" -> 0.25)

  /** The DuckDB threshold CASE (buckets of 10000) for a weight map. */
  private def duckWeightCase(weights: Map[String, Double]): String =
    weights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN '$s' THEN ${math.round(w * 10000)}" }
      .mkString("CASE source ", " ", " ELSE 10000 END")

  /** The recursive greedy-packing walk over a CTE `t(source, doc_id,
    * n_tok, rn)` (rn = per-source ROW_NUMBER by doc_id) — shared by the
    * qd24 packing oracle and the qd27 composition oracle so a packing-
    * semantics edit cannot silently drift between them.
    */
  private def duckPackWalk(budget: Int): String =
    s"""walk(source, rn, doc_id, n_tok, bin_id, used) AS (
       |  SELECT source, rn, doc_id, n_tok, CAST(0 AS BIGINT), n_tok
       |  FROM t WHERE rn = 1
       |  UNION ALL
       |  SELECT t.source, t.rn, t.doc_id, t.n_tok,
       |    CASE WHEN w.used + t.n_tok > $budget THEN w.bin_id + 1 ELSE w.bin_id END,
       |    CASE WHEN w.used + t.n_tok > $budget THEN t.n_tok ELSE w.used + t.n_tok END
       |  FROM walk w JOIN t ON t.source = w.source AND t.rn = w.rn + 1)""".stripMargin

  // =====================================================================
  // One entry per implemented operator from SURVEY.md §2 (+ extensions).
  // =====================================================================
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference parity: serving-layer analytics -------------------
    "q01_standings" -> ((s, d) => standings(s, d)),

    "q02_points_ladder" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          F1Ops.pointsLadder(col("l_linenumber")).as("points"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q03_points_standings" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(sum(F1Ops.pointsLadder(col("l_linenumber"))).as("season_points"))
        .orderBy(col("season_points").desc, col("l_suppkey"))),

    "q04_wins" -> ((s, d) =>
      F1Ops.wins(Tables.lineitem(s, d), key = "l_suppkey", position = "l_linenumber")
        .orderBy(col("l_suppkey"))),

    "q05_total_gps" -> ((s, d) =>
      Tables.orders(s, d).agg(countDistinct("o_orderdate").as("total_gps"))),

    "q06_distinct_flags" -> ((s, d) =>
      Tables.lineitem(s, d).filter(col("l_returnflag").isNotNull)
        .select(col("l_returnflag").as("flag")).distinct().orderBy(col("flag"))),

    "q07_lookup_default" -> ((s, d) =>
      F1Ops.lookupWithDefault(
        Tables.nation(s, d),
        Tables.region(s, d).withColumnRenamed("r_regionkey", "n_regionkey")
          .withColumnRenamed("r_name", "region_name"),
        "n_regionkey", "region_name", lit("Inconnu"))
        .select(col("n_nationkey"), col("n_name"), col("region_name"))
        .orderBy(col("n_nationkey"))),

    "q08_fact_dim_join" -> ((s, d) =>
      F1Ops.enrichWithDim(
        Tables.orders(s, d),
        Tables.customer(s, d).withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"))
        .orderBy(col("o_orderkey"))),

    "q09_dedup_first" -> ((s, d) =>
      F1Ops.firstWinsDedup(Tables.events(s, d), Seq("user_id"),
        Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy(col("user_id"))),

    "q10_podium" -> ((s, d) => standings(s, d).limit(3)),

    "q11_classification" -> ((s, d) =>
      Tables.lineitem(s, d).filter(col("l_suppkey") === 3)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_linenumber"), col("l_orderkey"))),

    "q12_coalesce_na" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          coalesce(nullif(col("event_type"), lit("error")), lit("N/A"))
            .as("event_type_display"))
        .orderBy(col("event_id"))),

    "q13_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k"))
        .orderBy(col("event_id"))),

    "q14_json_encode" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          to_json(struct(col("event_id"), col("event_type"))).as("payload"))
        .orderBy(col("event_id"))),

    "q15_cast_roundtrip" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          col("o_orderkey").cast("string").as("okey_str"),
          col("o_custkey").cast("string").cast("long").as("ckey_roundtrip"))
        .orderBy(col("o_orderkey"))),

    "q16_timestamp_parse" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          to_timestamp(date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
            .as("parsed_date"))
        .orderBy(col("o_orderkey"))),

    "q17_season_complete" -> ((s, d) =>
      Tables.orders(s, d)
        .agg(countDistinct("o_orderdate").as("total_gps"))
        .withColumn("season_status", F1Ops.seasonComplete(col("total_gps"), 22))
        .select(col("season_status"), col("total_gps"))),

    // two-phase global rank (RankOps) — no single-partition WindowExec,
    // so the standings rank survives at any supplier cardinality
    "q18_rank_standings" -> ((s, d) =>
      graft.ops.RankOps.globalRank(
        Tables.lineitem(s, d)
          .groupBy(col("l_suppkey"))
          .agg(sum(F1Ops.pointsLadder(col("l_linenumber"))).as("season_points")),
        col("season_points").desc, out = "rnk")
        .orderBy(col("rnk"), col("l_suppkey"))),

    "q19_wins_join_default" -> ((s, d) => {
      val w = Tables.lineitem(s, d)
        .filter(col("l_linenumber") === 1 && col("l_quantity") > 45)
        .groupBy(col("l_suppkey").as("s_suppkey"))
        .agg(count(lit(1)).as("wins"))
      F1Ops.lookupWithDefault(Tables.supplier(s, d), w, "s_suppkey", "wins", lit(0L))
        .select(col("s_suppkey"), col("s_name"), col("wins"))
        .orderBy(col("s_suppkey"))
    }),

    // ---- beyond-reference relational surface -------------------------
    "q20_latest_first" -> ((s, d) =>
      Tables.orders(s, d).select(col("o_orderdate").as("gp_date"))
        .distinct().orderBy(col("gp_date").desc).limit(5)),

    "q21_region_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(money(revenue).as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy(col("r_name"))),

    "q22_window_monthly" -> ((s, d) => {
      // running sum stays DECIMAL inside the window (exact, order-independent
      // — engines disagree on float accumulation order in window frames),
      // surfaced as double at the end.
      val monthly = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"), date_trunc("month", col("l_shipdate")).as("month"))
        .agg(sum(revenue.cast(DecimalType(18, 4))).as("revenue_dec"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("month"))
      monthly
        .withColumn("revenue", col("revenue_dec").cast("double"))
        .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
        .withColumn("cum_revenue", sum(col("revenue_dec"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
        .drop("revenue_dec")
        .orderBy(col("l_suppkey"), col("month"))
    }),

    "q23_anti_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    "q24_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
        .union(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
        .distinct().orderBy(col("o_custkey"))
    }),

    "q25_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_totalprice") > 400000).select(col("o_custkey"))
        .except(o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    "qs02_sessionize" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // int8 quantize → dequantize round trip, quality surfaced as
    // cosine(original, dequantized) — the 4×-compression path for a
    // 100 TB embedding table, oracle-replayed in DuckDB list ops
    "qe07_quantize_fidelity" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // sort-below-derivation (SortAuditProbe): quantize once, not twice
      emb.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
        .orderBy(col("vec_id"))
        .withColumn("mn", array_min(col("v")))
        .withColumn("mx", array_max(col("v")))
        .withColumn("q", Similarity.quantizeInt8(col("v")))
        .withColumn("deq", Similarity.dequantizeInt8(col("q"), col("mn"), col("mx")))
        .select(col("vec_id"),
          round(Similarity.cosine(col("v"), col("deq")), 6).as("fidelity"))
    }),

    // oracle-checked: int4 quantization fidelity — qe07's 16-level
    // sibling at half int8's footprint (4 bits/dim, codes packed
    // two-per-byte with a −128 tinyint bias); the round trip goes
    // THROUGH the packed form, so the measured fidelity is the stored
    // artifact's, and the whole pack/unpack arithmetic replays in SQL.
    "qe28_int4_fidelity" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // every stage is its OWN column: packInt4 references its codes
      // argument ~2·(dim/2)+1 times and dequantize its unpacked arg
      // twice — inlined trees re-evaluate the upstream transform per
      // reference (measured 58 s vs 0.4 s at sf0.1), while staged
      // columns are multi-referenced non-cheap expressions that
      // CollapseProject keeps materialized once per row
      // sort FIRST, on the cheap projection (round 17, measured at
      // sf3): a trailing global orderBy RANGE-SAMPLES ITS CHILD, so a
      // sort above the heavy quantize/pack/unpack chain executes that
      // chain twice (sample pass + real pass) — and the scan's
      // byte-based file splits give a compute-dense-per-byte table
      // like embeddings only 1–4 tasks regardless of cores, so the
      // duplicated chain also runs near-serially. Sorting the (id,
      // vec) projection instead samples only the scan, and the range
      // exchange fans the heavy chain out across all shuffle
      // partitions: 32.6 → 2.6 s at sf3, rows identical (Project
      // preserves sort order; no rule pushes a projection below Sort)
      emb.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
        .orderBy(col("vec_id"))
        .withColumn("mn", array_min(col("v")))
        .withColumn("mx", array_max(col("v")))
        .withColumn("codes", Similarity.quantizeInt4(col("v")))
        .withColumn("packed", Similarity.packInt4(col("codes")))
        .withColumn("unpacked",
          Similarity.unpackInt4(col("packed"), size(col("v"))))
        .withColumn("deq",
          Similarity.dequantizeInt4(col("unpacked"), col("mn"), col("mx")))
        .select(col("vec_id"),
          size(col("packed")).as("packed_bytes"),
          round(Similarity.cosine(col("v"), col("deq")), 6).as("fidelity"))
    }),

    "qe04_norm_stats" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      emb.select(col("label"),
        Similarity.l2Norm(Similarity.asDouble(col("embedding")))
          .cast(DecimalType(18, 6)).as("norm"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(col("norm")).cast("double").as("total_norm"))
        .withColumn("avg_norm", round(col("total_norm") / col("n"), 6))
        .orderBy(col("label"))
    }),

    "q26_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(money(revenue).as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // arbitrary GROUPING SETS (the general form rollup/cube specialize;
    // Spark 4's Dataset.groupingSets API) with per-column grouping flags
    // — flags, not grouping_id(), because bit order is engine-specific
    // while GROUPING(col) ∈ {0,1} is portable
    "q43_grouping_sets" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(money(revenue).as("revenue"), count(lit(1)).as("n_lines"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))
        .orderBy(col("g_rf"), col("g_ls"),
          col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q27_pivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(money(revenue))
        .orderBy(col("l_returnflag"))),

    "q28_semi_join" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    "q29_scalar_battery" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("pri_upper"),
        substring(col("o_orderpriority"), 1, 1).as("pri_code"),
        regexp_extract(col("o_orderpriority"), "(\\d+)", 1).as("pri_digit"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_pri"),
        abs(col("o_totalprice") - 200000.0d).as("price_dist"),
        floor(col("o_totalprice")).cast("long").as("price_floor"),
        ceil(col("o_totalprice")).cast("long").as("price_ceil"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"))
        .orderBy(col("o_orderkey"))),

    // top-k per group — the per-GP podium generalized (window + limit-k)
    "q31_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("l_suppkey"), col("rnk"), col("l_orderkey"), col("l_extendedprice"))
        .orderBy(col("l_suppkey"), col("rnk"))
    }),

    // the same top-3-per-supplier as q31, computed by the bounded-state
    // typed Aggregator instead of the window: ≤ k entries of state per
    // group with map-side partial aggregation (a 10⁹-row group ships k
    // entries per map task, not 10⁹ rows to one reducer partition).
    // Same oracle SQL as q31 — equality of the two formulations is
    // machine-checked every round.
    "q41_topk_aggregator" -> ((s, d) => {
      import s.implicits._
      val agg = new graft.functions.TopKAgg.TopK(3).toColumn.name("top")
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
        .as[(Long, Double, Long, Long)]
        .map { case (sk, price, ok, ln) =>
          sk -> graft.functions.TopKAgg.Item(price, ok, ln)
        }
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg)
        .flatMap { case (sk, buf) =>
          buf.items.zipWithIndex.map { case (r, i) =>
            (sk, i + 1, r.orderkey, r.price)
          }
        }
        .toDF("l_suppkey", "rnk", "l_orderkey", "l_extendedprice")
        .orderBy(col("l_suppkey"), col("rnk"))
    }),

    // aggregate census beyond sum/count: conditional count, avg/stddev
    // (rounded — float accumulation order differs across engines),
    // min_by/max_by keyed on a UNIQUE column (ties would be
    // nondeterministic), correlation
    "q35_agg_battery" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(when(col("o_totalprice") > 200000, lit(1))).as("n_big"),
          round(avg(col("o_totalprice")), 2).as("avg_price"),
          round(stddev(col("o_totalprice")), 2).as("sd_price"),
          min_by(col("o_orderpriority"), col("o_orderkey")).as("pri_of_min_key"),
          max_by(col("o_orderpriority"), col("o_orderkey")).as("pri_of_max_key"),
          round(corr(col("o_totalprice"), col("o_custkey")), 6).as("price_cust_corr"))
        .orderBy(col("o_orderstatus"))),

    // date-arithmetic census: day/month offsets (month arithmetic clamps
    // end-of-month identically in both engines), day diffs, month ends
    "q36_date_battery" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        date_add(col("o_orderdate"), 30).as("plus30"),
        date_sub(col("o_orderdate"), 7).as("minus7"),
        add_months(col("o_orderdate"), 2).as("plus2mo"),
        datediff(lit(java.sql.Date.valueOf("2025-01-01")), col("o_orderdate")).as("days_to_2025"),
        last_day(col("o_orderdate")).as("month_end"),
        quarter(col("o_orderdate")).as("qtr"))
        .orderBy(col("o_orderkey"))),

    // as-of join (pandas merge_asof / DuckDB ASOF JOIN / kdb aj —
    // missing from Spark): each purchase gets the latest prior click of
    // the same user. Union-tag-window formulation: ONE shuffle on the
    // key, no range cross product (TimeSeriesOps scaladoc + plan assert
    // in AsOfAndPruneSpec). Time key = epoch micros on both engines (the
    // raw parquet ts is ns; Spark reads µs — comparing raw would tie-
    // break differently at sub-µs precision); right side deduped per
    // (user, µs) keeping the max event_id so the tie winner is defined.
    "q37_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d).select(
        col("event_id"), unix_micros(col("ts")).as("tus"),
        col("user_id"), col("event_type"), col("value"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tus"), col("value"))
      val wTie = Window.partitionBy(col("user_id"), col("tus"))
        .orderBy(col("event_id").desc)
      val clicks = e.filter(col("event_type") === "click")
        .withColumn("__rn", row_number().over(wTie)).filter(col("__rn") === 1)
        .select(col("event_id"), col("user_id"), col("tus"), col("value"))
      graft.ops.TimeSeriesOps.asOfJoin(purchases, clicks, Seq("user_id"),
          "tus", "tus", rightPayload = Seq("event_id", "tus", "value"))
        .select(col("event_id"), col("user_id"), col("tus"),
          col("asof_event_id"), col("asof_tus"), col("asof_value"))
        .orderBy(col("event_id"))
    }),

    // sliding (hopping) windows in BATCH: 10-minute windows every 5
    // minutes — each event lands in exactly 2 windows. Spark's window()
    // generates the slots as an array internally (narrow), the only
    // shuffle is the final group-by; the oracle replays the slot algebra
    // with an explicit 2-element unnest. Window starts surface as epoch
    // seconds (grid-aligned, integer-exact in both engines).
    "q38_sliding_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
        .select(unix_timestamp(col("w.start")).as("win_start_sec"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy(col("win_start_sec"), col("event_type"))),

    // interval join without an equi key (lineitems shipped inside any
    // hot order's 7-day window): chunk-bucketed equi-join + exact
    // containment filter instead of the nested-loop range join
    // (TimeSeriesOps.pointInInterval scaladoc; plan assert in
    // AsOfAndPruneSpec)
    "q40_range_join" -> ((s, d) => {
      val hot = Tables.orders(s, d).filter(col("o_totalprice") > 450000.0d)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("w_start"),
          date_add(col("o_orderdate").cast("date"), 7).as("w_end"))
      // round-20 (guide §2.3 "aggregate before you shuffle"): the
      // downstream only COUNTS matches per (order, window), so the
      // point side pre-aggregates to per-DAY counts BEFORE the chunk
      // join — the join then matches O(date-range) day rows instead of
      // materializing every (lineitem, interval) pair through the hash
      // aggregate (28.7 M pairs at sf0.1, quadratic in SF by the
      // query's own semantics; the sf3 probe read 25.8 B). count(*)
      // over pairs ≡ sum of matched day counts, null ship dates match
      // nothing on either path, zero-point windows yield no row on
      // either path (inner join) — same rows, same schema (sum of
      // longs stays long), same oracle SQL. Unlike q44 (the explode-
      // on-days rewrite), the range match itself stays pointInInterval's
      // chunk equi-join + residual containment predicate.
      val daily = Tables.lineitem(s, d)
        .select(col("l_shipdate").cast("date").as("ship"))
        .groupBy(col("ship")).agg(count(lit(1)).as("__day_n"))
      graft.ops.TimeSeriesOps.pointInInterval(daily, hot, "ship",
          "w_start", "w_end", chunkDays = 7)
        .groupBy(col("o_orderkey"), col("w_start"))
        .agg(sum(col("__day_n")).as("n_shipped"))
        .orderBy(col("o_orderkey"))
    }),

    // the aggregate-before-join rewrite of q40 (same oracle SQL — the
    // correctness gate machine-proves the equivalence every round):
    // when the downstream only COUNTS matches, pre-aggregate points to
    // the date-range-bounded per-day table and sum over a broadcast
    // day join instead of materializing every (point, interval) pair —
    // q40's matched pairs grow quadratically in SF by its own
    // semantics (28.7 M sf0.1 → 2.87 B sf1 → 25.8 B sf3); this form
    // stays linear (sf1 41.5 s → 1.4 s).
    "q44_range_count" -> ((s, d) => {
      val hot = Tables.orders(s, d).filter(col("o_totalprice") > 450000.0d)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("w_start"),
          date_add(col("o_orderdate").cast("date"), 7).as("w_end"))
      val pts = Tables.lineitem(s, d)
        .select(col("l_shipdate").cast("date").as("ship"))
      graft.ops.TimeSeriesOps.countInInterval(pts, hot, "ship",
          "w_start", "w_end")
        .select(col("o_orderkey"), col("w_start"),
          col("n_points").as("n_shipped"))
        .orderBy(col("o_orderkey"))
    }),

    // bloom-pruned semi join: the fact side is filtered by a bloom of
    // the (selective) dim keys BEFORE its shuffle; the exact semi join
    // removes false positives, so the oracle is the PLAIN semi join —
    // a green hash proves the pruning is answer-preserving. The pruning
    // itself (most fact rows dropped map-side) is AsOfAndPruneSpec-
    // asserted.
    "q39_bloom_semi_join" -> ((s, d) => {
      val hot = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0d)
      graft.ops.SkewOps.bloomSemiJoin(
          Tables.lineitem(s, d), "l_orderkey", hot, "o_orderkey",
          expectedItems = 100000L, fpp = 0.01)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("total_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // window-function census over a partitioned window (lead/lag/ntile/
    // percent_rank/cume_dist/first/last — §2.6 breadth, all partitioned:
    // no single-partition WindowExec anywhere)
    "q32_window_battery" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first(col("o_orderkey")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_key"))
        .orderBy(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
    }),

    // string-function census: pad/translate/reverse/repeat/split-element/
    // levenshtein (fuzzy matching at the scalar level)
    "q33_string_battery" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        lpad(col("o_orderstatus"), 3, "_").as("st_lpad"),
        rpad(col("o_orderstatus"), 3, "*").as("st_rpad"),
        translate(col("o_orderpriority"), "-", " ").as("pri_spaced"),
        reverse(col("o_orderstatus")).as("st_rev"),
        repeat(col("o_orderstatus"), 2).as("st_twice"),
        element_at(split(col("o_orderpriority"), "-"), 1).as("pri_head"),
        levenshtein(col("o_orderstatus"), lit("OF")).as("lev_of"))
        .orderBy(col("o_orderkey"))),

    // cube: all 4 grouping combinations in one pass (q26's rollup sibling)
    "q34_cube" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(money(revenue).as("revenue"), count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q30_percentiles" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("med_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy(col("o_orderstatus"))),

    // rows-only: HLL sketch distinct counts (engine-specific sketches —
    // accuracy vs exact is ScalaTest-asserted instead of oracle-compared)
    "qa01_approx_distinct" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        approx_count_distinct("l_orderkey").as("approx_orders"),
        approx_count_distinct("l_partkey").as("approx_parts"))),

    // rows-only: the GROUPED sketch family — per-group HLL distincts and
    // KLL percentiles in one partial-aggregating pass (the per-group
    // sketches merge map-side, the 100 TB shape; exact per-group
    // accuracy contract in RankAndSketchSpec)
    "qa03_sketches_by_group" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct("l_orderkey").as("approx_orders"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx_median"))
        .orderBy(col("l_returnflag"))),

    // rows-only: KLL-sketch percentiles — the scale path beside q30's
    // exact percentile (exact needs the full value multiset per group;
    // the sketch is fixed-size, mergeable, one pass). Error bound vs
    // exact is ScalaTest-asserted (PropertySpec accuracy contract).
    "qa02_approx_percentiles" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          round(expr("approx_percentile(o_totalprice, 0.5, 10000)"), 4).as("med_approx"),
          round(expr("approx_percentile(o_totalprice, 0.9, 10000)"), 4).as("p90_approx"))
        .orderBy(col("o_orderstatus"))),

    // oracle-checked: exact per-source heavy tokens — the ground truth
    // the qa05 sketch is contracted against (explode → grouped count →
    // per-source top-10 window, full tie-break)
    "qa04_heavy_tokens_exact" -> ((s, d) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("cnt").desc, col("tok"))
      Tables.documents(s, d)
        .select(col("source"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("tok"))
        .groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .orderBy(col("source"), col("rnk"))
    }),

    // rows-only: the same heavy-token report from the Misra-Gries
    // sketch aggregator — bounded state per group over an unbounded
    // vocabulary (k counters vs the exact path's full distinct-token
    // shuffle). With k=64 ≥ this corpus's vocabulary the counts are
    // exact (RankAndSketchSpec pins equality with qa04; the eviction
    // guarantee is pinned separately on a planted skewed stream).
    "qa05_heavy_tokens_sketch" -> ((s, d) => {
      import s.implicits._
      val agg = new graft.functions.HeavyHittersAgg.MisraGries(64)
        .toColumn.name("hits")
      Tables.documents(s, d)
        .select(col("source"),
          explode(TextAnalysis.tokens(lower(col("text")))).as("tok"))
        .as[(String, String)]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(agg)
        .flatMap { case (src, hits) =>
          hits.take(10).zipWithIndex.map { case (h, i) =>
            (src, h.token, h.est, i + 1)
          }
        }
        .toDF("source", "tok", "cnt", "rnk")
        .orderBy(col("source"), col("rnk"))
    }),

    // ---- extensions: text analysis ----------------------------------
    "qd01_exact_dedup" -> ((s, d) =>
      Dedup.exactDupGroups(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("content_hash"))),

    "qd02_token_count" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          length(col("text")).cast("long").as("n_chars_m"),
          TextAnalysis.bpeTokenEstimate(col("text")).as("bpe_tokens_est"))
        .orderBy(col("doc_id"))),

    "qd03_quality" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          round(TextAnalysis.avgTokenLength(col("text")), 4).as("avg_token_len"),
          round(TextAnalysis.stopwordRatio(col("text")), 4).as("stopword_ratio"),
          (TextAnalysis.tokenCount(col("text")) < 40).as("short_doc"))
        .orderBy(col("doc_id"))),

    "qd04_langid" -> ((s, d) =>
      TextAnalysis.withLangId(Tables.documents(s, d), "text", "lang_pred")
        .select(col("doc_id"), col("lang_pred"))
        .orderBy(col("doc_id"))),

    "qd05_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),

    // end-to-end corpus-cleaning pipeline: quality gate → langid tag →
    // exact dedup (keep smallest id per normalized fingerprint) → stats
    // per predicted language. The composed training-data workload.
    "qd10_corpus_pipeline" -> ((s, d) =>
      graft.ops.Pipelines.corpusPipeline(Tables.documents(s, d))),

    // the complete pre-training data pipeline, end to end: quality gate →
    // PII scrub → exact dedup on the scrubbed fingerprint → context-window
    // chunking → per-source corpus stats. Every stage is individually
    // oracle-proven; this entry proves the COMPOSITION is too.
    "qd19_pretraining_pipeline" -> ((s, d) =>
      graft.ops.Pipelines.pretrainingPipeline(Tables.documents(s, d))),

    // ---- extensions: near-dedup -------------------------------------
    "qd06_ngram_jaccard_topk" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 60)
        .select(col("doc_id"), Dedup.wordShingles(col("text"), 2).as("g"))
      val a = docs.select(col("doc_id").as("id_a"), col("g").as("ga"))
      val b = docs.select(col("doc_id").as("id_b"), col("g").as("gb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Dedup.jaccard(col("ga"), col("gb")), 4).as("jaccard"))
        .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
        .limit(20)
    }),

    "qd07_minhash_sig" -> ((s, d) => {
      // sort-below-derivation (the qe28 fix shape, found by the round-18
      // SortAuditProbe sweep): the global sort's sampling pass re-runs
      // its narrow child, so sorting the SOURCE and letting the kernel
      // projection preserve the order computes the signatures once
      val sig = Dedup.withMinHash(Tables.documents(s, d).orderBy(col("doc_id")),
        "text", k = 8, shingleN = 2, portable = true)
      sig.select(col("doc_id") +: (0 until 8).map(j => col(s"mh$j")): _*)
    }),

    // rows-only (no portable SQL): xxhash64-based SimHash signatures
    "qd08_simhash" -> ((s, d) =>
      // sort-below-derivation (SortAuditProbe): hash once, not twice
      Tables.documents(s, d).orderBy(col("doc_id"))
        .select(col("doc_id"), Dedup.simHash64("text").as("simhash"))),

    // full MinHash-LSH near-dup pipeline, oracle-checked end to end: the
    // portable md5 signature path (native kernel == the DuckDB-expressible
    // HOF form) so signatures, banding, candidate join AND verification
    // all replay in SQL. 3-shingles + 4 bands of 4 → LSH threshold
    // (1/b)^(1/r) ≈ 0.71: tight enough that a common-vocabulary corpus
    // doesn't flood the candidate join (bands=8/r=2 admitted ~1% of ALL
    // pairs here).
    "qd09_minhash_neardups" -> ((s, d) =>
      Dedup.minHashNearDups(Tables.documents(s, d), "doc_id", "text",
        k = 16, bands = 4, shingleN = 3, minJaccard = 0.5, portable = true)
        .orderBy(col("id_a"), col("id_b"))),

    // oracle-checked: LSH recall probe — ground-truth all-pairs Jaccard
    // on a deterministic 50% md5 sample vs the SAME-config qd09 banding:
    // one row per truth pair with a found_by_lsh flag (estimated recall
    // = avg(found)). The banding curve P = 1-(1-j^r)^b measured on this
    // corpus: pairs just under the ≈0.71 LSH threshold are the expected
    // misses, so both flag values are non-vacuous at the driver's SF.
    "qd72_lsh_recall_probe" -> ((s, d) =>
      Dedup.lshRecallProbe(Tables.documents(s, d), "doc_id", "text",
        sampleBuckets = 50, totalBuckets = 100,
        k = 16, bands = 4, shingleN = 3, minJaccard = 0.5, portable = true)
        .orderBy(col("id_a"), col("id_b"))),

    // rows-only: same pipeline on the xxhash64 fast path (the production
    // signature at scale — Spark-internal hashes, no SQL equivalent)
    "qd11_minhash_neardups_fast" -> ((s, d) =>
      Dedup.minHashNearDups(Tables.documents(s, d), "doc_id", "text",
        k = 16, bands = 4, shingleN = 3, minJaccard = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // repetition quality signal: top-token share per doc (Gopher-family
    // repetition filter, relational formulation — no per-row O(n²))
    "qd17_repetition" -> ((s, d) =>
      TextAnalysis.topTokenFraction(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("top_count"), col("n_tokens"), col("top_token_frac"))
        .orderBy(col("doc_id"))),

    // PII redaction: every row gets planted PII appended so the masking
    // is exercised on all 100% of rows, not just whatever the fixture has
    "qd18_pii_scrub" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextAnalysis.scrubPii(concat(col("text"),
            lit(" contact user.name+tag@example.co.uk or https://example.com/a?b=1 end")))
            .as("scrubbed"))
        .orderBy(col("doc_id"))),

    // training-mix curation: per-language cap (balanced sample — first-N
    // under a total order, so it replays exactly in any engine)
    "qd15_balanced_sample" -> ((s, d) =>
      graft.functions.Curation.balancedSample(
        Tables.documents(s, d), "lang", Seq(col("doc_id")), nPerGroup = 50)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))),

    // training-mix curation: greedy per-source prefix under a token
    // budget (exact integer running sum — the data-mixing step)
    "qd16_token_budget_mix" -> ((s, d) =>
      graft.functions.Curation.tokenBudgetMix(
        Tables.documents(s, d), "source", Seq(col("doc_id")),
        TextAnalysis.tokenCount(col("text")), budget = 800L)
        .select(col("source"), col("doc_id"), col("cum_tokens"))
        .orderBy(col("source"), col("doc_id"))),

    // token-window chunking with overlap — context-window segmentation,
    // the row-growth step of a pre-training pipeline
    "qd13_chunking" -> ((s, d) =>
      TextAnalysis.chunkDocs(Tables.documents(s, d), "doc_id", "text",
        chunkTokens = 64, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // near-dup pair list → connected components → per-cluster keeper: the
    // decision step of near-dedup, oracle-checked via a recursive CTE over
    // the same (oracle-green) qd09 pair pipeline
    "qd14_neardup_clusters" -> ((s, d) => {
      val pairs = Dedup.minHashNearDups(Tables.documents(s, d), "doc_id", "text",
        k = 16, bands = 4, shingleN = 3, minJaccard = 0.5, portable = true)
      Dedup.nearDupComponents(pairs).orderBy(col("doc_id"))
    }),

    // oracle-checked: engine-portable SimHash signatures (md5-vote
    // variant — qd08's xxhash path stays the production default)
    "qd20_simhash_portable" -> ((s, d) =>
      // sort-below-derivation (SortAuditProbe): hash once, not twice
      Tables.documents(s, d).orderBy(col("doc_id"))
        .select(col("doc_id"), Dedup.simHash64Portable("text").as("simhash_hex"))),

    // rows-only: SimHash near-dup pairs — Manku multi-table blocking
    // (exact recall at Hamming≤3 by pigeonhole) then Hamming verification.
    // Non-vacuous on the fixture (the planted near-dup docs sit at
    // Hamming 0–3); xxhash64-based so no SQL oracle; semantics are
    // DedupSpec-tested and qd21 oracle-checks the identical blocking on
    // the portable signature.
    "qd12_simhash_neardups" -> ((s, d) =>
      Dedup.simHashNearDups(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))),

    // oracle-checked SimHash near-dups: the md5-portable signature (qd20)
    // + the SAME exact-recall blocking as qd12. Because recall at the
    // radius is exact, the blocked result must equal DuckDB's all-pairs
    // bit_count(xor) filter — the oracle both checks the values and
    // machine-verifies the pigeonhole recall argument.
    "qd21_simhash_neardups_portable" -> ((s, d) =>
      Dedup.simHashNearDupsPortable(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))),

    // incremental dedup: docs arriving as a "new batch" (doc_id ≥ 250)
    // deduped within the batch AND against the already-ingested corpus
    // (doc_id < 250) by content fingerprint — the per-batch production
    // shape (the corpus is touched only via its pruned fingerprint
    // column, never rescanned in full). The raw fixture has no exact
    // dups, so the batch PLANTS both kinds: re-ingested copies of 5
    // corpus docs (cross-corpus drops) and a duplicated batch doc
    // (within-batch drop) — kept count < batch size is load-bearing.
    "qd26_incremental_dedup" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val corpus = base.filter(col("doc_id") < 250)
      val fresh = base.filter(col("doc_id") >= 250)
      val batch = fresh
        .unionByName(corpus.filter(col("doc_id") < 5)
          .select((col("doc_id") + 8000L).as("doc_id"), col("text")))
        .unionByName(fresh.filter(col("doc_id") === 250)
          .select(lit(9000L).as("doc_id"), col("text")))
      Dedup.incrementalDedup(batch, corpus, "doc_id", "text")
        .select(col("doc_id"), col("content_hash"))
        .orderBy(col("doc_id"))
    }),

    // greedy context-window packing (the step between chunking and batch
    // assembly): consecutive docs per source packed into ≤512-token
    // bins. One shuffle + in-partition sort + a streaming O(1)-state
    // scan; the oracle replays the sequential walk as a recursive CTE.
    "qd24_sequence_packing" -> ((s, d) =>
      graft.functions.Curation.packSequences(
          Tables.documents(s, d)
            .select(col("source"), col("doc_id"),
              TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok")),
          "source", "doc_id", "n_tok", budget = 512L)
        .orderBy(col("source"), col("doc_id"))),

    // oracle-checked: context-window packing by TRAINED-tokenizer
    // counts — qd24 packs by whitespace tokens, but a data loader
    // budgets the sequence in SUBWORD pieces, so the production packer
    // runs on the qd68 fertility leg's n_pieces: train the qd67 merges,
    // encode the distinct-word table, roll per-doc piece counts, pack
    // greedily at 512. Composition adds no new semantics; the oracle
    // chains the BPE-encode CTEs into qd24's recursive pack walk.
    // Round 18: the composition runs the PRODUCTION-VOCAB path end to
    // end — trainFast's in-memory merge loop + the BpeCountExpr kernel
    // encode — against the same unrolled-CTE oracle, machine-proving
    // fast ≡ distributed every round (the q44/q40 shared-oracle
    // discipline).
    "qd73_bpe_packing" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val m = graft.functions.Bpe.trainFast(docs, "text", numMerges = 8)
        .select("lhs", "rhs").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      val counts = graft.functions.Bpe.encodeFertility(docs, "doc_id", "text", m)
        .select(col("doc_id"), col("n_pieces"))
      graft.functions.Curation.packSequences(
          docs.select(col("source"), col("doc_id")).join(counts, "doc_id"),
          "source", "doc_id", "n_pieces", budget = 512L)
        .orderBy(col("source"), col("doc_id"))
    }),

    // per-source sampling weights (Pile/LLaMA mixture recipes) via the
    // portable md5 bucket — reproducible across engines and runs
    "qd25_weighted_sample" -> ((s, d) =>
      graft.functions.Curation.weightedSample(Tables.documents(s, d),
          "source", "doc_id", qd25Weights)
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
        .orderBy(col("source"))),

    // vocabulary building (tokenizer-training prep): corpus-wide token
    // frequencies, top-100 by (freq desc, token). Explode → grouped
    // count (map-side partials on the uniform token key) → top-k via
    // orderBy+limit, which plans TakeOrderedAndProject — per-partition
    // top-k + driver merge, no global sort at any corpus size.
    "qd28_vocab" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(100)),

    // benchmark decontamination (GPT-3 App. C / C4 §2.3): per corpus doc,
    // distinct 3-grams shared with a held-out benchmark set (docs with
    // doc_id % 50 == 0 stand in for the eval set). Benchmark grams
    // broadcast; corpus explodes (id, gram) only. 257 docs contaminated
    // at sf0.01 — non-vacuous.
    "qd22_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.decontaminate(
          docs.filter(col("doc_id") % 50 =!= 0), "doc_id", "text",
          docs.filter(col("doc_id") % 50 === 0), "text", n = 3)
        .orderBy(col("doc_id"))
    }),

    // oracle-checked: per-doc benchmark-contamination REPORT — qd22's
    // audit-report sibling (n_grams, overlapped grams, fraction; the
    // statistic contamination reports publish and pipelines threshold).
    // Same benchmark split as qd22; denominator is a narrow size() over
    // the per-doc gram array, no second explode.
    "qd38_contamination_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.contaminationReport(
          docs.filter(col("doc_id") % 50 =!= 0), "doc_id", "text",
          docs.filter(col("doc_id") % 50 === 0), "text", n = 3)
        .orderBy(col("doc_id"))
    }),

    // oracle-checked: NEAR-dup decontamination — qd22's fuzzy sibling:
    // a synthetic benchmark of paraphrased corpus rows (doc_id < 5 with
    // an appended tail — the leaked-but-reworded eval row the exact
    // n-gram gate under-weights), flagged via md5 MinHash-LSH bands
    // (qd09's portable machinery) + exact sorted-shingle Jaccard ≥ 0.5.
    // Candidates, verification, and the per-doc rollup all replay in SQL.
    "qd45_fuzzy_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bench = docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 9000L).as("bench_id"),
          concat(col("text"), lit(" paraphrased eval tail")).as("text"))
      Dedup.fuzzyDecontaminate(docs, "doc_id", "text", bench, "bench_id",
          "text", minJaccard = 0.5, portable = true)
        .orderBy(col("doc_id"))
    }),

    // oracle-checked: deterministic shard-export manifest — the
    // training-data "last mile": after cleaning/dedup/mix the corpus is
    // globally shuffled and cut into fixed shards for the loader.
    // Shard = md5_bucket(doc_id, 16) (uniform, engine-portable,
    // skew-proof), shuffle order = md5 hex of the id; the manifest
    // rolls up doc/token volume and first/last order hash per shard —
    // every term replays in SQL. writeShards (CurationSpec) emits the
    // actual shard_id=N/ parquet layout in this order.
    "qd46_shard_manifest" -> ((s, d) =>
      Curation.shardManifest(Tables.documents(s, d), "doc_id", "text",
        nShards = 16)),

    // oracle-checked: LEAKAGE-SAFE split — qd23's split hashes each doc
    // independently, so a near-dup pair can straddle train/test (eval
    // contamination); here the md5 bucket hashes the doc's near-dup
    // CLUSTER representative (qd14's connected components over qd09's
    // pairs), so whole clusters move between splits as a unit. The
    // composition — LSH pairs, recursive CC, representative hash —
    // replays end to end in SQL. Non-vacuous at sf0.01: the planted
    // near-dup docs form multi-doc clusters whose members would split
    // apart under qd23's per-doc hash.
    // oracle-checked: canonical text normalization (NFC + lower + trim
    // + whitespace collapse) — the step that makes hash-based dedup
    // see "Café" composed and decomposed as the same document. The
    // fixture is ASCII, so the query PLANTS decomposed/mixed-case/
    // messy-whitespace rows (the qe05 pattern): their norm_text must
    // equal the canonical form, so an identity implementation
    // hash-mismatches. NFC itself is a custom codegen'd Expression
    // (Spark ships no normalizer builtin); DuckDB replays it with
    // nfc_normalize — both implement UAX #15.
    "qd48_normalize_text" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      // DECOMPOSED on purpose (combining marks as escapes so no tool
      // silently recomposes them): e+U+0301, i+U+0308, A+U+030A — NFC
      // must fuse each into its precomposed codepoint
      val planted = Seq(
        (9000001L, "Cafe\u0301  LATTE"),
        (9000002L, "nai\u0308ve\tre\u0301sume\u0301 "),
        (9000003L, "A\u030Angstro\u0308m units")
      ).toDF("doc_id", "text")
      docs.unionByName(planted)
        .select(col("doc_id"), col("text"),
          graft.functions.TextAnalysis.normalizeText(col("text")).as("norm_text"))
        .withColumn("changed", col("norm_text") =!= col("text"))
        .drop("text")
        .orderBy(col("doc_id"))
    }),

    // rows-only: zlib-deflate compression ratio — the Dolma/RedPajama
    // templating signal (low ratio = boilerplate/machine-generated).
    // DuckDB ships no deflate, so there is no SQL replay; determinism,
    // bounds, repetition-separates-from-prose, and partitioning
    // invariance are TextAnalysisSpec contracts (the qa01 pattern). The
    // ranking output is stable: ratio rounded 4 dp, ties on doc_id.
    "qd49_compression_ratio" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          round(graft.functions.NativeExpressions.deflateRatio(col("text")), 4)
            .as("deflate_ratio"),
          graft.functions.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        // sort key is kernel-DERIVED, so the sort cannot hoist below the
        // deflate: a result-sized hash exchange bounds the range-sampling
        // pass instead — deflate runs once, only report rows reshuffle
        // (SortAuditProbe, round 18)
        .repartition(col("doc_id"))
        .orderBy(col("deflate_ratio"), col("doc_id"))),

    // oracle-checked: temperature-scaled source mixing (Gopher §A3.1) —
    // α=0.5 keeps the power exactly IEEE-portable (sqrt is correctly
    // rounded, so DuckDB replays the driver-side weights bit-equal)
    "qd50_temperature_mix" -> ((s, d) =>
      Curation.temperatureMix(Tables.documents(s, d), "source", "doc_id",
          "text", alpha = 0.5, tokenBudget = 10000L)
        .orderBy(col("source"))),

    // oracle-checked: winnowing document fingerprints (Schleimer et al.
    // 2003 — the MOSS local fingerprinting algorithm): md5 word-3-gram
    // hashes, window w=4, per-window min hash with rightmost tie-break;
    // the whole selection (composite-key window min + decode) replays
    // in SQL. Guarantee: any shared run of >= w+k-1 = 6 tokens
    // contributes a common fingerprint to both docs.
    "qd51_winnowing" -> ((s, d) =>
      Dedup.winnowFingerprints(Tables.documents(s, d), "doc_id", "text",
          k = 3, w = 4)
        // derived sort key (fp_pos): boundary-exchange, winnow once
        .repartition(col("doc_id"))
        .orderBy(col("doc_id"), col("fp_pos"))),

    // oracle-checked: corpus snapshot diff — the dataset-versioning
    // ledger (added/removed/changed/unchanged per doc id, by normalized
    // content fingerprint). The "new" snapshot is a deterministic
    // mutation of documents (drop id%17=3, revise id%13=1, add id%29=0
    // under id+1e6) so every status is non-vacuous and the whole diff
    // replays in SQL.
    "qd52_corpus_diff" -> ((s, d) => {
      val old = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val revised = old.filter(col("doc_id") % 17 =!= 3)
        .withColumn("text", when(col("doc_id") % 13 === 1,
          concat(col("text"), lit(" revised"))).otherwise(col("text")))
      val added = old.filter(col("doc_id") % 29 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("new doc "), col("doc_id").cast("string")).as("text"))
      Curation.corpusDiff(old, revised.unionByName(added), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // oracle-checked: ASYMMETRIC containment pairs (Broder C(A,B) =
    // |A∩B|/|A|) — quote/subset detection that resemblance-tuned LSH
    // structurally misses; candidates from shared winnowing fingerprints
    // (guarantee fires regardless of size asymmetry), verified exactly
    // on distinct-gram sets.
    "qd53_containment" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
          k = 3, w = 4, minShared = 2, maxDf = 50, minContainment = 0.5,
          portable = true)
        .orderBy(col("id_a"), col("id_b"))),

    // rows-only by design (Spark-internal xxhash64 gram sets): qd53's
    // production twin — same md5 winnowing candidates, 8-byte hashed
    // verification; DedupSpec pins fast ≡ portable value-for-value.
    "qd59_containment_fast" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
          k = 3, w = 4, minShared = 2, maxDf = 50, minContainment = 0.5)
        .orderBy(col("id_a"), col("id_b"))),

    // oracle-checked: Min-K% Prob membership score (Shi et al. 2023) —
    // mean log-prob of each doc's 20% least likely tokens under the
    // corpus unigram LM; the membership-inference complement of the
    // decontamination gates. Boundary-exact occurrence selection via a
    // running-count window; kFrac=1 ≡ qd29 (spec-pinned).
    "qd54_min_k_prob" -> ((s, d) =>
      TextAnalysis.minKProb(Tables.documents(s, d), "doc_id", "text",
          kFrac = 0.2)
        .orderBy(col("doc_id"))),

    // oracle-checked: per-source bigram Shannon diversity — the
    // datacard entropy signal (templated sources concentrate n-gram
    // mass; diverse ones approach ln(distinct)); −p·ln p terms 10-dp
    // DECIMAL-summed, order-free.
    "qd55_ngram_diversity" -> ((s, d) =>
      TextAnalysis.sourceNgramDiversity(Tables.documents(s, d), "source",
          "text", n = 2)
        .orderBy(col("source"))),

    // oracle-checked: per-source token-length winsorization — exact
    // interpolated p90 cut per source (q30's quantile_cont parity),
    // clip + flag; the length-tail gate of balanced curation.
    "qd58_winsorize" -> ((s, d) =>
      Curation.winsorizeTokenCounts(Tables.documents(s, d), "source",
          "doc_id", "text", p = 0.9)
        .orderBy(col("doc_id"))),

    // oracle-checked: concat-then-chunk packing (the GPT-2/LLaMA
    // recipe: docs laid on one global token stream in doc_id order,
    // cut into 128-token sequences, SPLIT at boundaries — zero padding
    // waste) — the global offset is the two-phase range-partitioned
    // prefix sum, no single-partition window.
    "qd57_stream_packing" -> ((s, d) =>
      Curation.packStream(Tables.documents(s, d), "doc_id",
          TextAnalysis.tokenCount(col("text")).cast("long"), contextLen = 128)
        .orderBy(col("seq_id"), col("pos_in_seq"))),

    // oracle-checked: PMI-ranked bigram collocations (Church & Hanks
    // 1990) — phrase discovery / tokenizer-merge curation / boilerplate
    // forensics; counts exact, PMI 6-dp-rounded before the global
    // top-50 cut (TakeOrderedAndProject, never a global sort).
    "qd60_collocations" -> ((s, d) =>
      TextAnalysis.collocations(Tables.documents(s, d), "text",
        minCount = 5L, topK = 50)),

    // oracle-checked: directed source-containment matrix — qd41's
    // asymmetric reading (is crawl A a SUBSET of B? near-zero Jaccard
    // but containment ≈ 1); a pair-table-sized derivation of the same
    // overlap machinery, no extra corpus pass.
    "qd56_source_containment" -> ((s, d) =>
      Dedup.sourceContainment(
          Dedup.sourceOverlap(Tables.documents(s, d), "source", "text",
            n = 3, portable = true))
        .orderBy(col("source"), col("other"))),

    "qd47_leakage_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minHashNearDups(docs, "doc_id", "text",
        k = 16, bands = 4, shingleN = 3, minJaccard = 0.5, portable = true)
      Curation.leakageSafeSplit(docs, "doc_id", Dedup.nearDupComponents(pairs))
        .select(col("doc_id"), col("group_key"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // oracle-checked: the composed Gopher rule battery (Rae et al.
    // 2021 A1.1) — token-count/word-length bounds, stopword-ratio
    // minimum, top-token-share and dup-3-gram maxima, each signal
    // individually oracle-proven (qd03/qd17/qd35), plus the final
    // keep decision; non-vacuous at sf0.01 (multiple rules bind)
    "qd39_gopher_filter" -> ((s, d) =>
      TextAnalysis.gopherFilter(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // oracle-checked: per-source corpus datacard (the dataset-card
    // rollup corpus releases publish) — doc/token volume, mean length,
    // mean stopword ratio (DECIMAL-summed 4-dp values: order-free),
    // English fraction (qd04's argmax rule), exact-dup fraction
    // (qd01's fingerprint) — one grouped aggregation, every term
    // deterministic so the whole card replays in SQL
    "qd40_corpus_datacard" -> ((s, d) =>
      TextAnalysis.corpusDatacard(Tables.documents(s, d), "text", "source")),

    // oracle-checked: BM25 top-k keyword retrieval (Robertson & Zaragoza
    // 2009, Lucene +1 idf) — the sparse leg of the retrieval stack.
    // Three fixed topic queries; the explode is semi-joined against the
    // broadcast term set BEFORE any shuffle, df is a window count on
    // the restricted postings, partials 6-dp DECIMAL-summed: the whole
    // ranking replays in SQL.
    "qr01_bm25_topk" -> ((s, d) => {
      import s.implicits._
      Retrieval.bm25Search(Tables.documents(s, d), "doc_id", "text",
          bm25Queries.toDF("query_id", "term"), "query_id", "term", k = 5)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"))
    }),

    // oracle-checked: qr01 through the POSTINGS SIDECAR — the documents
    // table laid out as an exact-sink corpus, indexed once
    // (buildPostingsIndex; cached across calls keyed by a source
    // fingerprint, so repeated runs measure pure sidecar search), then
    // searched with bm25OverCorpus: ZERO tokenization, term-bucket
    // directory pruning, stats from the per-batch sidecar table. Scores
    // are identical to qr01's inline path by construction (one shared
    // kernel — StreamingSpec pins sidecar ≡ recomputation and
    // bm25OverCorpus ≡ bm25Search), so it shares qr01's oracle SQL.
    "qr02_bm25_sidecar" -> ((s, d) => {
      import s.implicits._
      graft.streaming.CorpusIngest.bm25OverCorpus(s, qr02CorpusFor(s, d),
          bm25Queries.toDF("query_id", "term"), "query_id", "term", k = 5)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"))
    }),

    // oracle-checked: qe08 through the CELL SIDECAR — the embeddings
    // table laid out as a semantic-sink corpus (cells under qe08's
    // fixed centroids), indexed once (buildCellIndex; fingerprint-cached
    // like qr02), then searched with annOverCorpus: ZERO corpus passes,
    // cell-directory pruning, Ivf.search's scoring kernel. Identical to
    // qe08 by construction (StreamingSpec pins annOverCorpus ≡
    // Ivf.search), so it shares qe08's oracle SQL.
    "qe19_ann_sidecar" -> ((s, d) =>
      graft.streaming.CorpusIngest.annOverCorpus(s, qe19CorpusFor(s, d),
          Tables.embeddings(s, d).filter(col("vec_id") < 5),
          "vec_id", "embedding", qe08Centroids(s, d), k = 3, nProbe = 2)
        .withColumnRenamed("score", "cosine")
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"), col("neighbor_id"))),

    // oracle-checked: deterministic full-corpus Lloyd's k-means — 2
    // iterations from the qe08 fixed seeds, centroids rounded 6 dp at
    // every iteration boundary so the SQL replay assigns identical
    // cells. The bit-replayable fit behind IVF (a curation audit trail
    // can re-derive exactly which cluster selected a document);
    // centroids exploded to scalars (cell_id, i, c_val, n) for hashing.
    "qe20_kmeans_fit" -> ((s, d) => {
      val init = Similarity.Ivf.centroidMatrix(qe08Centroids(s, d))
      graft.functions.Clustering
        .kmeansFit(Tables.embeddings(s, d), "embedding", init, iters = 2)
        .select(col("cell_id"),
          posexplode(col("centroid")).as(Seq("pos", "c_val")), col("n"))
        .select(col("cell_id"), (col("pos") + 1).cast("long").as("i"),
          col("c_val"), col("n"))
        .orderBy(col("cell_id"), col("i"))
    }),

    // oracle-checked: nearest-class-mean (Rocchio) classification — the
    // embedding-space quality/domain classifier of curation pipelines.
    // Train on vec_id % 4 != 0 (per-label 6-dp-rounded mean vectors),
    // classify the held-out quarter by best cosine (lowest label wins a
    // tie). Scoring is a pure narrow projection: the k×dim means ride
    // into the plan as literals, no join, no shuffle (plan-asserted).
    "qe21_class_mean" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val means = graft.functions.Clustering.classMeans(
        emb.filter(col("vec_id") % 4 =!= 0), "label", "embedding")
      // sort-below-derivation (SortAuditProbe): score once, not twice
      graft.functions.Clustering
        .nearestClassMean(emb.filter(col("vec_id") % 4 === 0)
          .orderBy(col("vec_id")), "embedding", means)
        .select(col("vec_id"), col("label"), col("predicted"), col("score"))
    }),

    // oracle-checked: per-source embedding affinity matrix — the dense
    // twin of qd41's n-gram overlap matrix: cosine between per-source
    // mean unit vectors. One docs⋈embeddings equi-join + one S×dim
    // aggregation + an S×S pair join — never doc×doc.
    // SortAuditProbe adjudicated exemption: the final sort's sampling
    // pass re-runs the S×S class-mean cosine cross — S = source count,
    // corpus-size-independent metadata (≤ S² trivially small rows)
    "qe22_source_affinity" -> ((s, d) =>
      graft.functions.Clustering.sourceAffinity(
          Tables.documents(s, d), "doc_id", "source",
          Tables.embeddings(s, d), "vec_id", "embedding")
        .orderBy(col("src_a"), col("src_b"))),

    // oracle-checked: EXACT embedding-space decontamination — the dense
    // sibling of qd22/qd45's n-gram gates: every corpus row scored
    // against the full benchmark (vec_id < 20) via the broadcast
    // narrow kernel, no false negatives. Planted jittered copies of
    // benchmark rows (the qe05 pattern) must flag at 0.99 — an
    // all-false result would be vacuous and hash-mismatch.
    "qe24_semantic_decontaminate" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val bench = emb.filter(col("vec_id") < 20)
      val jit = emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x * (lit(1.0d) + (i % 3 - 1).cast("double") * 0.005d))
            .as("embedding"))
      Similarity.semanticDecontaminate(
          emb.filter(col("vec_id") >= 20).unionByName(jit), "vec_id", "embedding",
          bench, "vec_id", "embedding", minCosine = 0.99)
        .select(col("vec_id"), col("bench_id"), col("max_cos"), col("contaminated"))
        // the corpus leg is a union (hoisting a sort through union does
        // not preserve global order): boundary-exchange, max-cos once
        .repartition(col("vec_id"))
        .orderBy(col("vec_id"))
    }),

    // oracle-checked: the fit→serve composition — qe20's deterministic
    // Lloyd centroids drive qe08's IVF probe-and-rank, proving the
    // trained index is bit-consistent end to end (fit, assignment, and
    // search all replay in one SQL chain).
    "qe23_kmeans_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val init = Similarity.Ivf.centroidMatrix(qe08Centroids(s, d))
      val fitted = graft.functions.Clustering
        .kmeansFit(emb, "embedding", init, iters = 2)
        .select(col("cell_id"), col("centroid"))
      Similarity.Ivf.search(emb.filter(col("vec_id") < 5), emb, "vec_id",
          "embedding", fitted, k = 3, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"), col("neighbor_id"))
    }),

    // oracle-checked: the IVF cell-health report (occupancy, share,
    // mean member→centroid distance, empty cells surfaced) under the
    // qe08 fixed prefix centroids — the batch axis of the re-fit
    // decision whose time axis is the CentroidDrift monitor
    "qe25_cell_stats" -> ((s, d) =>
      Similarity.Ivf.cellStats(Tables.embeddings(s, d),
          "embedding", qe08Centroids(s, d))
        .orderBy(col("cell_id"))),

    // oracle-checked: embedding-space outlier report — per-cell distance
    // z-score under qe08's pinned centroids (the SemDeDup/DataComp
    // far-tail pruning signal); distances/moments 6-dp DECIMAL-summed so
    // flags replay bit-equal in SQL. z=1 here: nearest-cell assignment
    // truncates the right tail (a would-be 2σ member is usually nearer
    // some other cell), so on this uniform fixture z=1 is the largest
    // threshold that still flags rows — non-vacuous by measurement.
    "qe27_embedding_outliers" -> ((s, d) =>
      Similarity.Ivf.outliers(Tables.embeddings(s, d), "vec_id", "embedding",
          qe08Centroids(s, d), z = 1.0)
        .orderBy(col("vec_id"))),

    // oracle-checked: Johnson–Lindenstrauss random projection
    // (Achlioptas 2003 ±1 matrix, deterministic splitmix planes shared
    // with the SRP-LSH bucketer) — 64-dim → 16-dim, scaled 1/√16;
    // flattened to (vec_id, i, p_val) so the projected matrix hashes.
    "qe26_random_projection" -> ((s, d) =>
      Similarity.randomProject(Tables.embeddings(s, d), "embedding",
          outDim = 16, dim = 64)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("pos", "p_val")))
        .select(col("vec_id"), (col("pos") + 1).cast("long").as("i"), col("p_val"))
        // derived sort key (i from the explode): boundary-exchange,
        // project once
        .repartition(col("vec_id"))
        .orderBy(col("vec_id"), col("i"))),

    // oracle-checked: the full hybrid SERVING stack over one corpus
    // carrying BOTH sidecars (documents ⋈ embeddings, postings + cells
    // built once) — BM25 from the postings index, IVF ANN from the cell
    // index (probes vec 101..103 remapped to the BM25 query ids,
    // external-id space so no self-exclusion), RRF-fused. Zero corpus
    // passes end to end; every stage (BM25 arithmetic, IVF assignment/
    // probe, rank fusion) replays in SQL over the same joined corpus.
    "qr03_hybrid_sidecar" -> ((s, d) => {
      import s.implicits._
      val vecQ = Tables.embeddings(s, d)
        .filter(col("vec_id").isin(101L, 102L, 103L))
        .select((col("vec_id") - 100L).cast("int").as("query_id"),
          col("embedding").as("qv"))
      graft.streaming.CorpusIngest.hybridOverCorpus(s, qr03CorpusFor(s, d),
          bm25Queries.toDF("query_id", "term"), "term",
          vecQ, "qv", "query_id",
          qe08Centroids(s, d), k = 5, nProbe = 2, kPerLeg = 10)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"))
    }),

    // oracle-checked: trec_eval metric battery over the BM25 run vs the
    // boolean-AND qrels — per query precision@10 / recall@10 / MRR /
    // nDCG@10, every DCG term 6-dp DECIMAL-summed so the whole battery
    // replays in SQL.
    "qr04_retrieval_eval" -> ((s, d) => {
      import s.implicits._
      val run = Retrieval.bm25Search(Tables.documents(s, d), "doc_id", "text",
        bm25Queries.toDF("query_id", "term"), "query_id", "term", k = 10)
      Retrieval.evalRun(run, bm25Qrels(s, d), k = 10).orderBy(col("query_id"))
    }),

    // oracle-checked: hard-negative mining (the DPR / contrastive
    // fine-tuning recipe) — each query's top-ranked UN-judged docs from
    // the BM25 run, anti-joined against the qrels, re-ranked.
    "qr05_hard_negatives" -> ((s, d) => {
      import s.implicits._
      val run = Retrieval.bm25Search(Tables.documents(s, d), "doc_id", "text",
        bm25Queries.toDF("query_id", "term"), "query_id", "term", k = 10)
      Retrieval.hardNegatives(run, bm25Qrels(s, d), nNeg = 5)
        .orderBy(col("query_id"), col("neg_rank"))
    }),

    // oracle-checked: pseudo-relevance-feedback expansion (Rocchio/RM3
    // family) — top-3 feedback docs per query, tf·ln(N/df)-scored
    // expansion terms (original terms excluded), second BM25 pass with
    // the enriched queries; the whole two-pass chain replays in SQL.
    "qr09_prf_expansion" -> ((s, d) => {
      import s.implicits._
      Retrieval.prfExpandedSearch(Tables.documents(s, d), "doc_id", "text",
          bm25Queries.toDF("query_id", "term"), "query_id", "term",
          fbDocs = 3, fbTerms = 2, k = 5)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"))
    }),

    // oracle-checked: MMR diverse re-ranking (Carbonell & Goldstein
    // 1998) — the dedup-aware final retrieval stage: greedy
    // λ·rel − (1−λ)·max-sim-to-selected over each query's dense top-10,
    // unrolled relationally (k=3 rounds) so every pick replays in SQL.
    "qr10_mmr_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cands = Similarity.knnJoin(emb.filter(col("vec_id") < 5), emb,
          "vec_id", "embedding", k = 10)
        .join(emb.select(col("vec_id").as("neighbor_id"),
          col("embedding").cast("array<double>").as("v")), "neighbor_id")
      Similarity.mmrRerank(cands, "query_id", "neighbor_id", "cosine", "v",
          k = 3, lambda = 0.7)
        .orderBy(col("query_id"), col("mmr_rank"))
    }),

    // oracle-checked: the corpus-level eval rollup — macro means (MRR
    // et al.) over qr04's per-query battery; one reporting row.
    "qr07_retrieval_eval_summary" -> ((s, d) => {
      import s.implicits._
      val run = Retrieval.bm25Search(Tables.documents(s, d), "doc_id", "text",
        bm25Queries.toDF("query_id", "term"), "query_id", "term", k = 10)
      Retrieval.evalSummary(Retrieval.evalRun(run, bm25Qrels(s, d), k = 10))
    }),

    // oracle-checked: the whole retrieval-quality loop as ONE corpus
    // pass — postings derived once, serving stats, the BM25 run, the
    // tf-floor qrels, the eval battery AND the hard-negative counts
    // (ScanCountSpec pins the budget; qr04/qr05 are the standalone
    // forms).
    "qr08_retrieval_pipeline" -> ((s, d) => {
      import s.implicits._
      graft.ops.Pipelines.retrievalEvalPipeline(Tables.documents(s, d),
          bm25Queries.toDF("query_id", "term"))
        .orderBy(col("query_id"))
    }),

    // oracle-checked: per-doc tf-idf keyword extraction (topic tagging /
    // facet indexing) — top-3 terms by tf·ln(N/df), df >= 2, every value
    // an exact function of integer statistics.
    "qr06_tfidf_keywords" -> ((s, d) =>
      Retrieval.tfidfKeywords(Tables.documents(s, d), "doc_id", "text",
          m = 3, minDf = 2L)
        .orderBy(col("doc_id"), col("rnk"))),

    // oracle-checked: hybrid retrieval — reciprocal-rank fusion (Cormack
    // et al. 2009, k=60) of the BM25 leg over documents and the dense
    // cosine leg over the matching embeddings (doc_id = vec_id at this
    // SF). Rank-only fusion: both legs' score scales are irrelevant;
    // 1/(60+rank) contributions are 6-dp DECIMAL-summed, ties on doc.
    "qe16_hybrid_rrf" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      // corpus stats built once up front (the production shape for
      // repeated query batches); score-identical to the inline path
      val stats = Retrieval.bm25CorpusStats(docs, "text")
      val sparse = Retrieval.bm25Search(docs, "doc_id", "text",
        bm25Queries.toDF("query_id", "term"), "query_id", "term", k = 10,
        corpusStats = Some(stats))
      // dense leg: one probe vector per BM25 query id (vec_id 100+qid —
      // fixed probes; knnJoin's self-exclusion drops the probe itself),
      // remapped to the BM25 query ids after ranking
      val dense = Similarity.knnJoin(
          emb.filter(col("vec_id").isin(101L, 102L, 103L)),
          emb, "vec_id", "embedding", k = 10)
        .select((col("query_id") - 100L).cast("int").as("query_id"),
          col("neighbor_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(Seq(sparse.select(col("query_id"), col("doc_id"),
          col("rank")), dense), k = 5)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"))
    }),

    // oracle-checked: source-overlap matrix — distinct 3-gram Jaccard
    // between every pair of sources sharing at least one gram (the
    // "which crawl duplicates which" forensics rollup). Portable path:
    // raw shingle strings, replayed verbatim in SQL.
    "qd41_source_overlap" -> ((s, d) =>
      Dedup.sourceOverlap(Tables.documents(s, d), "source", "text", n = 3,
          portable = true)
        .orderBy(col("source_a"), col("source_b"))),

    // rows-only: qd41's production form — xxhash64 gram keys (8-byte
    // shuffle keys vs the oracle path's raw shingle strings; DedupSpec
    // pins the two paths equal row-for-row on the fixture corpus, the
    // qd11/qd36 fast-twin convention)
    "qd43_source_overlap_fast" -> ((s, d) =>
      Dedup.sourceOverlap(Tables.documents(s, d), "source", "text", n = 3)
        .orderBy(col("source_a"), col("source_b"))),

    // rows-only: the SKETCHED overlap matrix — per-doc native MinHash
    // signatures element-wise-min-aggregated per source (one corpus
    // pass, zero gram rows, O(sources × k) state, broadcast signature
    // self-join; sizes from the same minima via the k-minimum-value
    // estimator) instead of qd41/qd43's exact distinct-gram self-join;
    // the 100 TB form where even 8-byte gram keys are too much shuffle.
    // The permutation family is Spark-internal (no SQL twin); DedupSpec
    // pins the estimate within the MinHash error bound of the exact
    // Jaccard on fixtures.
    "qd44_source_overlap_sketch" -> ((s, d) =>
      Dedup.sourceOverlapSketch(Tables.documents(s, d), "source", "text",
          n = 3)
        .orderBy(col("source_a"), col("source_b"))),

    // deterministic train/val/test split: portable md5 bucket of the id
    // (DuckDB md5_number_lower % 100 — bit-identical), 90/5/5. A doc's
    // split depends only on its id: stable across runs, engines, and
    // corpus growth, unlike rand(seed) under repartitioning.
    "qd23_split_assign" -> ((s, d) =>
      graft.functions.Curation.withSplit(Tables.documents(s, d), "doc_id")
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("split"), col("lang"))),

    // oracle-checked: curriculum / difficulty buckets — per-source
    // quartiles of the qd29 unigram-LM quality score (ntile over the
    // (score, id) total order), rolled up to (source, bucket) counts and
    // order-free DECIMAL mean scores. The quantile-binning step of
    // difficulty-ordered training schedules.
    "qd42_curriculum_buckets" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val lp = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      Curation.curriculumBuckets(
        docs.select(col("doc_id"), col("source")).join(lp, "doc_id"),
        "source", "doc_id", "avg_logprob", nBuckets = 4)
    }),

    // the round-3 capstone composition — a full training-mix assembly:
    // train split (portable hash) → per-source sampling weights →
    // benchmark decontamination gate → greedy context-window packing →
    // per-source mix stats. Every stage is individually oracle-proven
    // (qd23, qd25, qd22, qd24); this proves the COMPOSITION end to end,
    // the qd19 pattern applied to the new operator set.
    "qd27_mix_pipeline" -> ((s, d) =>
      graft.ops.Pipelines.mixPipeline(Tables.documents(s, d), qd27Weights)),

    // oracle-checked (round 14): multimodal plumbing — documents' bytes
    // stand in for media payloads; stub decode → fixed-width features.
    // The stub's rolling hash + LCG is a pure function of the payload
    // bytes (ASCII text here), and both multipliers are < 2^63, so the
    // whole chain replays in DuckDB HUGEINT arithmetic without limb
    // decomposition (qm01Sql) — the mapPartitions seam, encoder-free
    // payload path, and feature plumbing are all hash-compared.
    "qm01_media_features" -> ((s, d) => {
      import s.implicits._
      // plain select into the MediaRow shape — no typed .map, so the
      // payload never takes an extra encoder round-trip before the seam
      val media = Tables.documents(s, d)
        .select(col("doc_id").as("media_id"), lit("image").as("kind"),
          col("text").cast("binary").as("bytes"),
          lit(640).cast("int").as("width"), lit(480).cast("int").as("height"),
          lit(null).cast("int").as("sample_rate"),
          lit(null).cast("int").as("n_frames"))
        .as[graft.multimodal.Multimodal.MediaRow]
      graft.multimodal.Multimodal.extractFeatures(media)
        .toDF()
        // cast BEFORE rounding (the qm02 lesson): round on FloatType
        // stays float, and k/1000f carries float residue no double
        // oracle can reproduce; float→double→round(4) is exact
        .select(col("media_id"), col("decode_ok"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("f0"),
          round(element_at(col("feature"), 2).cast("double"), 4).as("f1"))
        .orderBy(col("media_id"))
    }),

    // oracle-checked (round 13): REAL image decode through the multimodal
    // seam — encode a deterministic PNG per doc, decode it with
    // javax.imageio (an actual JDK codec, not the stub), surface raster
    // dims + luminance-histogram features; the oracle regenerates the
    // pixels relationally (qm02Sql), so the decode chain is
    // hash-compared, and exact feature values are MultimodalSpec-asserted.
    "qm02_image_decode" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d).filter(col("doc_id") < 64)
        .select(col("doc_id")).as[Long]
        .map { id =>
          graft.multimodal.Multimodal.MediaRow(
            id, "image",
            graft.multimodal.Multimodal.syntheticPng(id, 8 + (id % 8).toInt, 8),
            None, None, None, None)
        }
      graft.multimodal.Multimodal.decodeImages(media)
        .toDF()
        // cast BEFORE rounding: round on a FloatType stays float, and a
        // 4-dp decimal is generally not float-representable (float32
        // 0.0125 widens to 0.0125000002), so the emitted doubles would
        // carry float residue the oracle's double rounding cannot match
        .select(col("media_id"), col("decode_ok"), col("width"), col("height"),
          round(element_at(col("feature"), 1).cast("double"), 4).as("f0"),
          round(element_at(col("feature"), 16).cast("double"), 4).as("f15"))
        .orderBy(col("media_id"))
    }),

    // oracle-checked (round 13): REAL audio decode through the multimodal
    // seam — encode a deterministic 16-bit PCM WAV per doc, decode it with
    // javax.sound.sampled (an actual JDK codec, not the stub), surface
    // format metadata + waveform features (RMS / zero-crossings / peak).
    // All features are integer-derived → exactly reproducible, and the
    // oracle replays the square-wave PCM relationally (qm03Sql). Only
    // video remains stubbed.
    "qm03_audio_decode" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d).filter(col("doc_id") < 64)
        .select(col("doc_id")).as[Long]
        .map { id =>
          graft.multimodal.Multimodal.MediaRow(
            id, "audio",
            graft.multimodal.Multimodal.syntheticWav(
              id, 8000 + (id % 4).toInt * 4000, 800 + (id % 5).toInt * 200),
            None, None, None, None)
        }
      graft.multimodal.Multimodal.decodeAudio(media)
        .toDF()
        .select(col("media_id"), col("decode_ok"), col("sample_rate"),
          col("n_samples"), round(col("duration_sec"), 6).as("duration_sec"),
          round(col("rms"), 4).as("rms"), col("zero_crossings"), col("peak"))
        .orderBy(col("media_id"))
    }),

    // oracle-checked (round 13): REAL video container-metadata parse
    // through the multimodal seam — encode a deterministic AVI (even
    // ids) or MP4 (odd ids) header per doc, parse
    // width/height/fps/frame-count back out of the actual RIFF `avih` /
    // ISO-BMFF `mvhd`+`tkhd`+`stsz` bytes (pure JVM — no codec needed
    // for metadata). The oracle (qm05Sql) replays the writers'
    // parameter arithmetic incl. the AVI header's integer-us fps
    // round-trip, so the byte parse chain is hash-compared; only
    // frame-pixel decode remains stubbed.
    "qm05_video_meta" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d).filter(col("doc_id") < 64)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val w = 320 + (id % 4).toInt * 160
          val h = 240 + (id % 4).toInt * 120
          val bytes =
            if (id % 2 == 0)
              graft.multimodal.Multimodal.syntheticAvi(
                w, h, fps = 24 + (id % 3).toInt * 6, nFrames = 100 + (id % 7).toInt * 50)
            else
              graft.multimodal.Multimodal.syntheticMp4(
                w, h, timescale = 600, duration = 600L * (2 + (id % 5)),
                nFrames = 48 * (2 + (id % 5)))
          graft.multimodal.Multimodal.MediaRow(
            id, "video", bytes, None, None, None, None)
        }
      graft.multimodal.Multimodal.decodeVideoMeta(media)
        .toDF()
        .select(col("media_id"), col("parse_ok"), col("container"),
          col("width"), col("height"), col("n_frames"),
          round(col("fps"), 4).as("fps"),
          round(col("duration_sec"), 4).as("duration_sec"))
        .orderBy(col("media_id"))
    }),

    // oracle-checked (round 15; MP4 parity round 16): REAL video
    // FRAME-PIXEL decode — the round-14 de-stub. Each doc becomes an
    // MJPEG container whose frames are real JPEGs of uniform MID-BIN
    // grays — MJPEG-in-AVI for even ids (RIFF `movi` chunk walk),
    // MJPEG-in-MP4 for odd ids (ISO `stsz`/`stco` sample walk) — and
    // decodeVideoFrames samples up to 3 frames evenly and decodes each
    // through ImageIO. Mid-bin uniform gray survives quality-0.95 JPEG
    // exactly (all 16 bins verified), so the decoded histogram is
    // one-hot and the oracle (qm06Sql) regenerates bin/f_max from the
    // gray-level arithmetic, container-independent — a codec or
    // frame-walk regression in EITHER container breaks the hash
    // compare, not just a row count.
    "qm06_video_frames" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d).filter(col("doc_id") < 64)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val n = 2 + (id % 4).toInt
          val grays = (0 until n)
            .map(j => ((id * 7 + j * 13) % 16).toInt * 16 + 8)
          val bytes =
            if (id % 2 == 0)
              graft.multimodal.Multimodal.syntheticMjpegAvi(16, 12, 10, grays)
            else
              graft.multimodal.Multimodal.syntheticMjpegMp4(
                16, 12, timescale = 600, duration = 60L * n, grays)
          graft.multimodal.Multimodal.MediaRow(
            id, "video", bytes, None, None, None, None)
        }
      graft.multimodal.Multimodal.decodeVideoFrames(media, maxFrames = 3)
        .toDF()
        .select(col("media_id"), col("frame_idx"), col("decode_ok"),
          col("width"), col("height"),
          (array_position(col("feature"), array_max(col("feature"))) - 1)
            .cast("int").as("bin"),
          // cast BEFORE round: round on FloatType returns float residue
          // no double oracle can match (the qm02 lesson)
          round(array_max(col("feature")).cast("double"), 4).as("f_max"))
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // oracle-checked (round 13): the multimodal→similarity composition —
    // real image decode feeds luminance-histogram features into the
    // SRP-LSH embedding near-dup operator. Ids 40–47 re-encode the SAME
    // pixels as ids 0–7, so the planted pairs (i, i+40) MUST surface at
    // cosine 1 (MultimodalSpec asserts the full plant recovery); the
    // oracle regenerates the pixels relationally (qm04Sql), so the whole
    // decode→feature→LSH chain is hash-compared, not just row-counted.
    "qm04_image_neardups" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d).filter(col("doc_id") < 48)
        .select(col("doc_id")).as[Long]
        .map { id =>
          val srcId = if (id >= 40) id - 40 else id
          graft.multimodal.Multimodal.MediaRow(
            id, "image", graft.multimodal.Multimodal.syntheticPng(srcId, 8, 8),
            None, None, None, None)
        }
      val feats = graft.multimodal.Multimodal.decodeImages(media).toDF()
        .filter(col("decode_ok"))
        .select(col("media_id"), col("feature").cast("array<double>").as("embedding"))
      Similarity.embeddingNearDups(feats, "media_id", "embedding",
          minCosine = 0.999, nPlanes = 4, dim = 16)
        // derived sort keys: boundary-exchange so the decode+feature
        // chain runs once (the qm06-adjacent decode-duplication shape)
        .repartition(col("id_a"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ---- extensions: similarity search ------------------------------
    "qe01_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.topKCosine(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
        emb.filter(col("vec_id") === 0), "embedding", k = 10)
    }),

    "qe02_knn_join" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.knnJoin(emb.filter(col("vec_id") < 5), emb, "vec_id", "embedding", k = 3)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"))
    }),

    // oracle-checked: embedding-cosine near-dup pairs via SRP-LSH buckets
    // (plane matrix is deterministic → replayed in DuckDB as literals).
    // The raw fixture has no true near-dups at 0.95, so the query plants
    // them: a jittered copy of vec_id<3 (per-element scale ±0.5%, cosine
    // ≈ 0.99997 to the original) unioned in under offset ids — the entry
    // must return the planted pairs, so an empty result is a failure, not
    // a vacuous pass (recall vs exact pairs is SimilaritySpec-asserted).
    "qe05_embedding_neardups" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val jittered = emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x * (lit(1.0d) + (i % 3 - 1).cast("double") * 0.005d))
            .as("embedding"))
      Similarity.embeddingNearDups(emb.unionByName(jittered), "vec_id",
        "embedding", minCosine = 0.95, nPlanes = 8, dim = 64)
        // derived sort keys: boundary-exchange, verify-cosine once
        .repartition(col("id_a"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // oracle-checked: LSH-bucketed approximate k-NN (the 100 TB scale
    // path; bucketing + ranking replayed in DuckDB via plane literals)
    "qe03_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.annLshJoin(emb.filter(col("vec_id") < 5), emb, "vec_id",
        "embedding", k = 3, nPlanes = 4, dim = 64)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"), col("neighbor_id"))
    }),

    // EXACT cosine-threshold self-join over qe05's exact inputs (base
    // vec_id < 60 plus the same jittered plants) — the all-pairs
    // correctness baseline the SRP-LSH path trades against: qe05's
    // bucketed result must be a subset of this, and here the planted
    // pairs (cosine ≈ 0.99997) guarantee a non-vacuous answer. All-pairs
    // deliberately capped to 63 vectors (the scale path IS qe05).
    "qe09_exact_threshold_join" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).filter(col("vec_id") < 60)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val jittered = emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("v"),
            (x, i) => x * (lit(1.0d) + (i % 3 - 1).cast("double") * 0.005d)).as("v"))
      val all = emb.unionByName(jittered)
      val a = all.select(col("vec_id").as("id_a"), col("v").as("va"))
      val b = all.select(col("vec_id").as("id_b"), col("v").as("vb"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Similarity.cosine(col("va"), col("vb")), 6).as("cosine"))
        .filter(col("cosine") >= 0.95)
        // derived sort keys: boundary-exchange so the all-pairs cosine
        // scan (the documented brute-force baseline) runs once
        .repartition(col("id_a"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // rows-only: IVF ANN (learned centroids) serving under the nProbe
    // the qe30 sizing sweep CHOSE — the production loop closed (size on
    // a query sample against the recall target, freeze the config,
    // serve with it), not a hardcoded probe count (round-18 verdict #6)
    "qe06_ivf_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 5)
      val centroids = Similarity.Ivf.fit(emb, "embedding", nCells = 8)
      // sizing sample = the qe30 stride; the truth leg brute-forces
      // only this bounded sample, and maxNProbe = nCells guarantees a
      // chosen config exists (probing all cells is exact — spec-pinned)
      val nProbe = Similarity.chosenNProbe(Similarity.sizeNProbe(
        emb.filter(col("vec_id") % 40 === 0), emb, "vec_id", "embedding",
        centroids, k = 3, targetRecall = 0.95, maxNProbe = 8))
      // rows-only entry, so the retrieval quality rides IN the output
      // (recall_at_k vs the exact brute-force baseline, per query) AND
      // gates the result: a collapsed learned fit fails loudly at
      // serving time instead of quietly returning garbage neighbors
      // (floor = non-degeneracy bound; the SIZED config clears it with
      // margin — the sweep targeted 0.95 mean on the sizing sample)
      Similarity.requireMeanRecallFloor(
          Similarity.withRecallAtK(
            Similarity.Ivf.search(queries, emb, "vec_id",
              "embedding", centroids, k = 3, nProbe = nProbe),
            queries, emb, "vec_id", "embedding", k = 3),
          floor = 0.3, what = "qe06_ivf_ann")
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"), col("neighbor_id"))
    }),

    // oracle-checked IVF: same assign/search machinery as qe06 (the
    // narrow NearestCellsExpr kernel, cell equi-join, cosine top-k) but
    // with DETERMINISTIC centroids — the 8 lowest-vec_id vectors — which
    // a SQL oracle can rebuild from the same table and replay as an
    // explicit (score, cell_id) argmin. Proves the whole IVF pipeline's
    // values; qe06 keeps the learned-centroid production path.
    // oracle-checked: product-quantization ANN (Jégou et al., TPAMI
    // 2011) — 64-dim float vectors stored as 8 sub-space codes (32×
    // compression), asymmetric-distance search = cosine of the full-
    // precision query vs the codebook reconstruction (identical to the
    // per-subspace LUT sum). Deterministic prefix codebooks (vec_id<16
    // sub-slices — the qe08 fixed-centroid convention) make the WHOLE
    // pipeline SQL-replayable: slicing, per-subspace argmin encode,
    // reconstruction, scoring, ranking. The learned-codebook path is
    // Pq.fitCodebooks (seeded per-subspace KMeans; SimilaritySpec
    // asserts it reconstructs no worse than the prefix books).
    "qe12_pq_ann" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val m = Similarity.Pq.codebookMatrices(
        Similarity.Pq.prefixCodebooks(emb, "vec_id", "embedding",
          nSub = 8, nCodes = 16))
      Similarity.Pq.search(emb.filter(col("vec_id") < 5), emb, "vec_id",
          "embedding", m, k = 3)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"), col("neighbor_id"))
    }),

    // oracle-checked: IVF-PQ (the FAISS IVFPQ architecture) — coarse
    // prefix centroids + product-quantized RESIDUALS; search probes 2
    // cells scoring the query against centroid + decoded residual.
    // Composition of the qe08 and qe12 machinery, scan budget pinned
    // (ScanCountSpec: 1 embedding pass).
    "qe13_ivfpq_ann" -> ((s, d) =>
      graft.ops.Pipelines.ivfPq(Tables.embeddings(s, d))),

    // rows-only: qe12's PRODUCTION path — per-subspace seeded-KMeans
    // codebooks (Pq.fitCodebooks, the qe06 learned-centroid convention;
    // no DuckDB equivalent for the KMeans fit). Same encode/ADC-search
    // machinery as the oracle-checked qe12; SimilaritySpec pins a
    // recall@k contract vs the qe09-style exact baseline showing the
    // learned books retrieve AT LEAST as well as qe12's prefix books.
    "qe14_pq_ann_learned" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      // fit on a 25% sample — the production posture (codebooks need a
      // sketch of each subspace's distribution, not every row; encode
      // and search still run over the full corpus)
      val m = Similarity.Pq.codebookMatrices(
        Similarity.Pq.fitCodebooks(emb, "embedding", nSub = 8, nCodes = 16,
          sampleFraction = 0.25))
      val queries = emb.filter(col("vec_id") < 5)
      // rows-only entry — measured recall_at_k rides in the output AND
      // gates it (floor = 10× the ≈0.003 chance recall@3 on this
      // random fixture, far under the noisy healthy draw ≈ 0.13; PQ on
      // clusterless random vectors is inherently low-recall)
      Similarity.requireMeanRecallFloor(
          Similarity.withRecallAtK(
            Similarity.Pq.search(queries, emb, "vec_id", "embedding", m, k = 3),
            queries, emb, "vec_id", "embedding", k = 3),
          floor = 0.03, what = "qe14_pq_ann_learned")
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"), col("neighbor_id"))
    }),

    // oracle-checked: Matryoshka truncated-rerank ANN (Kusupati et al.
    // 2022) — stage 1 ranks by cosine over the first 16 of 64 dims
    // (1/4 the scoring cost per pair), keeps 3×4 candidates; stage 2
    // re-scores only those at full dimension. Both stages' rounding and
    // tie-breaks replay in SQL.
    "qe15_mrl_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.mrlSearch(emb.filter(col("vec_id") < 5), emb, "vec_id",
          "embedding", dPrefix = 16, k = 3, rerankFactor = 4)
        .withColumnRenamed("rank", "rnk")
        // SortAuditProbe adjudicated exemption: the segment the final
        // sort's sampling pass re-runs is the post-window rerank cosine
        // over k·rerankFactor rows PER QUERY — funnel-bounded serving
        // constants, not corpus-sized (a boundary exchange on query_id
        // elides as redundant against the window's own partitioning)
        .orderBy(col("query_id"), col("rnk"), col("neighbor_id"))
    }),

    // oracle-checked: cluster-capped diversity sampling — assign to the
    // qe08 fixed cells, keep the `cap` most prototypical vectors per
    // cell (closest to centroid, full L2² rounded 6 dp, tie on id).
    // Bounds any dense region's contribution to the kept set.
    "qe17_cluster_cap_sample" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cell_id"),
          col("embedding").cast("array<double>").as("centroid"))
      Similarity.Ivf.clusterCapSample(emb, "vec_id", "embedding",
          centroids, cap = 25)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("cell_id"), col("rnk"))
    }),

    // oracle-checked: the composed production ANN funnel — IVF cell
    // probing (qe08's fixed cells) for candidate generation, MRL
    // truncated-prefix coarse rank (qe15 stage 1) inside the probed
    // cells, exact full-dimension rerank (stage 2). Every stage
    // deterministic; the whole funnel replays in SQL.
    "qe18_ivf_mrl_funnel" -> ((s, d) =>
      graft.ops.Pipelines.ivfMrlFunnel(Tables.embeddings(s, d))),

    "qe08_ivf_ann_oracle" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cell_id"),
          col("embedding").cast("array<double>").as("centroid"))
      Similarity.Ivf.search(emb.filter(col("vec_id") < 5), emb, "vec_id",
        "embedding", centroids, k = 3, nProbe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"), col("neighbor_id"))
    }),

    // oracle-checked: ANN recall probe — qd72's dense twin: per-query
    // recall@10 of the qe08-config IVF (deterministic vec_id<8
    // centroids, nProbe=2 of 8 cells) against the exact brute-force
    // top-10. Both legs share the cosine kernel and tie-break, so
    // hits/misses are pure cell geometry; nProbe=2 leaves out-of-probe
    // neighbors, so sub-1.0 recalls are non-vacuous at the driver's SF.
    "qe29_ann_recall_probe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cell_id"),
          col("embedding").cast("array<double>").as("centroid"))
      Similarity.annRecallProbe(emb.filter(col("vec_id") % 40 === 0), emb,
          "vec_id", "embedding", centroids, k = 10, nProbe = 2)
        .orderBy(col("query_id"))
    }),

    // oracle-checked: IVF config sizing — qe29's measurement turned
    // into a decision (round-17 verdict #2): ONE grouped sweep over
    // every nProbe in [1, 8] (candidates fan to configs via their
    // probe rank — no per-config re-run), mean/min recall@10 per
    // config against the brute-force truth, and `chosen` marks the
    // minimal config meeting mean recall ≥ 0.95. Monotonicity and
    // exactness-at-nProbe=nCells are SimilaritySpec-pinned.
    "qe30_ivf_size_nprobe" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cell_id"),
          col("embedding").cast("array<double>").as("centroid"))
      Similarity.sizeNProbe(emb.filter(col("vec_id") % 40 === 0), emb,
          "vec_id", "embedding", centroids, k = 10, targetRecall = 0.95,
          maxNProbe = 8)
        .orderBy(col("n_probe"))
    }),

    // oracle-checked: semantic dedup (SemDeDup, Abbas et al. 2023) —
    // deterministic centroids (vec_id < 8, the qe08 pattern), jittered
    // near-dup plants (the qe05 pattern), within-cluster cosine ≥ 0.95
    // drops the higher id of every pair. kept=false rows are the planted
    // dups — an all-true result would be vacuous and is spec-rejected.
    "qe10_semantic_dedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val jittered = emb.filter(col("vec_id") < 3)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x * (lit(1.0d) + (i % 3 - 1).cast("double") * 0.005d))
            .as("embedding"))
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cell_id"), col("embedding").as("centroid"))
      Similarity.semanticDedup(emb.unionByName(jittered), "vec_id", "embedding",
          centroids, minCosine = 0.95)
        .orderBy(col("vec_id"))
    }),

    // oracle-checked: unigram-LM quality score (the engine-portable
    // member of the CCNet perplexity-filter family) — corpus token
    // frequencies ARE the model; score = mean ln P(token) per doc
    "qd29_unigram_logprob" -> ((s, d) =>
      TextAnalysis.unigramLogProb(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // oracle-checked: DSIR importance weights (Xie et al. 2023) — every
    // doc scored by the hashed-bigram log ratio of target (lang='en')
    // vs raw corpus distributions; the selection knob of data curation
    "qd30_dsir" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.functions.Curation.dsirWeights(docs, "doc_id", "text",
          docs.filter(col("lang") === "en"), "text", buckets = 1024)
        .orderBy(col("doc_id"))
    }),

    // oracle-checked: Z-order (Morton) layout — interleave the low 8
    // bits of (l_partkey%256, l_suppkey%256); a z-bucket (top 4 bits of
    // each dim) must span ≤ 16 values in BOTH dims, which is exactly the
    // file-stats locality a zOrderLayout write gives a parquet reader
    // (ZOrderSpec asserts the bound and the write-side layout).
    "q42_zorder" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select((col("l_partkey") % 256).as("pa"), (col("l_suppkey") % 256).as("sb"))
        .withColumn("zval", graft.ops.LayoutOps.zValue(col("pa"), col("sb"), 8))
        .withColumn("zbucket", shiftrightunsigned(col("zval"), 8))
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("pa")).as("min_a"), max(col("pa")).as("max_a"),
          min(col("sb")).as("min_b"), max(col("sb")).as("max_b"))
        .orderBy(col("zbucket"))),

    // oracle-checked: tokenizer application — greedy longest-match
    // segmentation under a top-10 corpus vocab (WordPiece-family
    // inference); fertility = pieces/word measures vocab fit. k=10 of
    // the corpus's ~31 token types, so out-of-vocab words really get
    // char-segmented (fertility > 1 — a full-coverage vocab would make
    // the query vacuously all-1.0). The vocab collect is a 10-row
    // metadata action (the vocab IS the model, like IVF centroids);
    // segmentation is a narrow native-kernel map. The oracle replays the
    // greedy walk as a per-word recursive CTE.
    "qd31_wordpiece" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val vocab = TextAnalysis.topVocab(docs, "text", 10)
      // sort-below-derivation (SortAuditProbe): encode once, not twice
      TextAnalysis.tokenizerFertility(docs.orderBy(col("doc_id")),
        "doc_id", "text", vocab)
    }),

    // oracle-checked: cross-document duplicated-passage profile (the
    // exact-substring dedup family, Lee et al. 2021) — a 5-token span is
    // duplicated iff it appears in ≥ 2 distinct docs; per doc, the
    // duplicated fraction of its spans (avg ≈ 9% on the fixture, with
    // fully-duplicated docs hitting 1.0 — non-vacuous spread)
    "qd32_dup_passages" -> ((s, d) =>
      Dedup.dupPassageProfile(Tables.documents(s, d), "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))),

    // oracle-checked: the REMOVAL counterpart of qd32 (Lee et al.
    // 2021's actual dedup step) — every token covered by a cross-doc
    // duplicated 5-token span is scrubbed; clean_text plus removal
    // accounting per doc. Positional span keys (the unsorted sibling
    // of the qd32 kernel); the oracle replays positions relationally.
    "qd34_scrub_spans" -> ((s, d) =>
      Dedup.scrubDuplicatedSpans(Tables.documents(s, d), "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))),

    // rows-only: DSIR on the xxhash64 featurize — the production fast
    // path at scale (the qd11 precedent: Spark-internal hash, no SQL
    // equivalent). Scores differ from qd30's md5 bucketing (any fixed
    // hash is a valid DSIR featurization); n_feat is hash-invariant
    // and TextAnalysisSpec asserts it matches the portable path row-for-row
    "qd36_dsir_fast" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.functions.Curation.dsirWeights(docs, "doc_id", "text",
        docs.filter(col("lang") === "en"), "text", buckets = 1024,
        portable = false)
        .orderBy(col("doc_id"))
    }),

    // oracle-checked: Gopher-family intra-doc repetition signal (Rae
    // et al. 2021 duplicate-n-gram fraction) — fraction of each doc's
    // tokens covered by a 3-gram repeating within the doc (n=3 gives a
    // non-vacuous spread on the fixture's small-vocab docs)
    "qd35_dup_ngram_frac" -> ((s, d) =>
      Dedup.intraDocDupNgramFraction(Tables.documents(s, d), "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))),

    // oracle-checked: incremental NEAR-dup dedup — qd26's fuzzy sibling
    // and the batch form of the streaming near-dup sink's probe
    // (CorpusIngest.startNearDupCorpusSink): the batch is deduped
    // against the corpus's STORED LSH band columns only. Planted: 5
    // near-copies of corpus docs (one appended token — cross-corpus
    // band hits, NOT exact dups) and a within-batch near-dup of doc
    // 250. Portable md5 minhash path, so DuckDB replays the whole
    // probe: signatures, bands, semi-join, smaller-id-sharer rule.
    "qd37_incremental_neardup" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val corpus = base.filter(col("doc_id") < 250)
      val batch = base.filter(col("doc_id") >= 250)
        .unionByName(corpus.filter(col("doc_id") < 5)
          .select((col("doc_id") + 8000L).as("doc_id"),
            concat(col("text"), lit(" neardup tail")).as("text")))
        .unionByName(base.filter(col("doc_id") === 250)
          .select(lit(9000L).as("doc_id"),
            concat(col("text"), lit(" coda")).as("text")))
      val corpusBands = Dedup.withLshBands(
        Dedup.withMinHash(corpus, "text", k = 16, shingleN = 3, portable = true),
        k = 16, bands = 4)
        .select("band0", "band1", "band2", "band3")
      Dedup.incrementalNearDup(batch, corpusBands, "doc_id", "text",
          k = 16, bands = 4, shingleN = 3, portable = true)
        .select(col("doc_id"), col("band0"), col("band1"), col("band2"),
          col("band3"))
        .orderBy(col("doc_id"))
    }),

    // the round-4 capstone composition — a modern curation pipeline
    // over the round's new operators, each stage individually
    // oracle-proven (qd29, qd32, qd30): unigram-LM quality gate (drops
    // the rare-token tail, 500→450 at sf0.01) → duplicated-passage gate
    // (drops boilerplate-heavy docs, −40+) → DSIR target-likeness
    // selection (raw = survivors, target = their English subset, →~80)
    // → per-language mix stats. Dedup-before-selection is the
    // conventional order, and every stage both drops and keeps rows at
    // sf0.01 — no vacuous link in the chain.
    //
    // Stage-boundary persistence + scan budget documented (and
    // regression-tested) at [[graft.ops.Pipelines.curationPipeline]].
    "qd33_curation_pipeline" -> ((s, d) =>
      graft.ops.Pipelines.curationPipeline(Tables.documents(s, d))),

    // oracle-checked: the END-TO-END training-data capstone — NFC
    // normalize → quality gate → exact dedup → MinHash-LSH near dedup
    // (components, min-id keeper) → exact 3-gram decontamination vs
    // the bench slice → train split → α=0.5 temperature mix under a
    // 5k-token budget (sized to BIND at sf0.001's train-token mass) → 128-token stream packing → 8-shard export
    // manifest. Every stage is an individually oracle-proven operator;
    // the composed oracle chains their CTEs (qd48+qd09+qd14+qd22+
    // qd23+qd50+qd57) end to end.
    "qd61_full_pipeline" -> ((s, d) =>
      graft.ops.Pipelines.fullPipeline(
        graft.ops.Pipelines.fullPipelineFixture(Tables.documents(s, d)))),

    // rows-only by design: qd61's PRODUCTION twin — identical
    // composition on the xxhash64 MinHash signatures (the 100 TB
    // posture; no DuckDB twin for Spark-internal hashing). Every stage
    // except the LSH candidate draw is hash-independent; PipelineSpec
    // pins the twins' manifests within the near-dup wiggle.
    "qd65_full_pipeline_fast" -> ((s, d) =>
      graft.ops.Pipelines.fullPipeline(
        graft.ops.Pipelines.fullPipelineFixture(Tables.documents(s, d)),
        portable = false)),

    // oracle-checked: bigram-LM perplexity gate (the CCNet/KenLM
    // filter, Wenzek et al. 2020) — add-one bigram model trained on
    // the lang='en' slice scores every doc; high mean NLL = far from
    // the reference register. Non-vacuous at sf0.01: non-en docs score
    // higher NLL than en prose. Threshold 3.47 ≈ the fixture's p80, so
    // BOTH keep outcomes are present at every SF (the synthetic corpus
    // shares one token generator across langs — the spread is tight;
    // real crawls separate by whole nats).
    "qd62_bigram_nll_gate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.bigramNllGate(docs, "doc_id", "text",
          docs.filter(col("lang") === "en"), "text", threshold = 3.47)
        .orderBy(col("doc_id"))
    }),

    // oracle-checked: quality-aware near-dup keeper selection — the
    // SemDeDup "keep one per cluster" step with an explicit quality
    // policy (4-dp stopword ratio, ties to the smaller id) instead of
    // the arbitrary min-id rule; composes qd09's pairs + qd14's
    // components + qd03's quality signal, all individually proven.
    "qd63_quality_keepers" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minHashNearDups(docs, "doc_id", "text",
        k = 16, bands = 4, shingleN = 3, minJaccard = 0.5, portable = true)
      val scored = docs.select(col("doc_id"),
        round(TextAnalysis.stopwordRatio(col("text")), 4).as("score"))
      Dedup.qualityKeepers(Dedup.nearDupComponents(pairs), scored,
          "doc_id", "score")
        .orderBy(col("doc_id"))
    }),

    // oracle-checked: curriculum-ordered stream packing — qd42's
    // LM-difficulty quantiles composed with qd57's packer: sequences
    // ascend easiest→hardest (global quantile buckets as broadcast
    // threshold comparisons, never a global ntile window), md5-shuffled
    // within a bucket. The schedule artifact curriculum training reads.
    "qd66_curriculum_packing" -> ((s, d) =>
      Curation.curriculumPackStream(Tables.documents(s, d), "doc_id",
          "text", nBuckets = 4, contextLen = 128)
        .orderBy(col("seq_id"), col("pos_in_seq"))),

    // oracle-checked: distributed BPE tokenizer TRAINING (Sennrich et
    // al. 2016) — the learning step beside qd28's vocab counts and
    // qd31's fixed-vocab encode: one corpus pass builds the word-
    // frequency table (how SentencePiece/HF trainers scale), then 8
    // merge iterations over that vocab-sized table (pair-count argmax
    // with a deterministic tie break, greedy left-to-right apply). The
    // oracle unrolls the whole loop as DuckDB CTEs — the learned merge
    // table is engine-portable by construction.
    "qd67_bpe_train" -> ((s, d) =>
      graft.functions.Bpe.train(Tables.documents(s, d), "text", numMerges = 8)),

    // oracle-checked: the PRODUCTION-VOCAB trainer against qd67's own
    // unrolled-CTE oracle VERBATIM — one corpus pass builds the word
    // table, the exact merge loop then runs in memory (lazy-deletion
    // heap + incremental pair deltas; Bpe.trainFastLocal has the
    // batching-rejection rationale). Semantics are machine-proved
    // identical to the distributed loop every round; the win is
    // s/merge — sublinear in K vs the distributed loop's flat
    // ~0.9 s/merge of per-iteration job latency (measured ladder in
    // SCALE.md round 18: ~40× at K=1024, widening with K).
    "qd74_bpe_train_fast" -> ((s, d) =>
      graft.functions.Bpe.trainFast(Tables.documents(s, d), "text",
        numMerges = 8)),

    // oracle-checked: the token-ID stream a data loader consumes —
    // qd68 reports the fertility METRIC, this emits per-doc (pos,
    // piece, token_id) under the canonical vocab layout (seed chars by
    // binary order, then merges by rank; MIN id on spelling
    // collisions). trainFast + the kernel segment end to end; the
    // oracle chains qd67's merge CTEs into the vocab/position walk.
    "qd76_bpe_encode_ids" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val m = graft.functions.Bpe.trainFast(docs, "text", numMerges = 8)
        .select("lhs", "rhs").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      graft.functions.Bpe.encodeIds(docs, "doc_id", "text", m)
        .orderBy(col("doc_id"), col("pos"))
    }),

    // oracle-checked: per-doc fertility under the qd67-trained BPE —
    // qd31's metric with LEARNED merges in place of the fixed wordpiece
    // vocab. Encode applies merges to the DISTINCT-word table only
    // (per-word, not per-occurrence cost), broadcast-joined back to the
    // doc word stream.
    "qd68_bpe_encode" -> ((s, d) =>
      graft.functions.Bpe.trainAndEncode(Tables.documents(s, d), "doc_id",
          "text", numMerges = 8)
        .orderBy(col("doc_id"))),

    // oracle-checked: water-filling token-budget allocation — the
    // redistribution step qd50's temperature mix omits (its capped
    // sources' budget share is simply lost): take_s = min(a_s, λ·w_s)
    // with the water level λ solved so Σ take = B, via the sorted-ratio
    // prefix-sum closed form. Exact micro-unit weights + IEEE-only
    // float derivation, so the whole solve replays in SQL. B=25000 ≈
    // 92% of sf0.01's corpus → 2 capped / 18 uncapped (both branches
    // non-vacuous at the driver's SF).
    "qd71_mix_waterfill" -> ((s, d) =>
      graft.functions.Curation.waterFillMix(Tables.documents(s, d),
        "source", "text", alpha = 0.5, tokenBudget = 25000L)),

    // oracle-checked: qd50's temperature mix with the lost capped share
    // REDISTRIBUTED (round-17 verdict #3) — the same tempered weights
    // routed through qd71's water-fill solve, then qd50's md5-Bernoulli
    // keep at threshold round(min(1, take/a)·10⁴). B=25000 binds 2 of
    // 20 caps at the driver's SF, so the redistribution branch is
    // non-vacuous; CurationSpec pins Σ take ∈ (B−S, B] vs the plain
    // recipe's lost share.
    "qd75_temperature_waterfill" -> ((s, d) =>
      graft.functions.Curation.temperatureMixWaterFill(Tables.documents(s, d),
        "source", "doc_id", "text", alpha = 0.5, tokenBudget = 25000L)),

    // oracle-checked: unigram-LM subword tokenizer TRAINING via Viterbi
    // hard-EM (Kudo 2018 — the SentencePiece model), qd67's sibling:
    // BPE learns merges bottom-up, this starts from a substring seed
    // vocabulary and re-estimates piece probabilities from its own best
    // segmentations. Every step engine-portable (scaled-integer 6-dp
    // log-probs, all-ties broken deterministically), so the WHOLE EM
    // loop — seed counts, two Viterbi rounds, hard pruning — replays as
    // unrolled DuckDB CTEs with an all-paths enumeration proof.
    "qd69_unigram_train" -> ((s, d) =>
      graft.functions.UnigramLm.train(Tables.documents(s, d), "text",
        maxPieceLen = 4, topM = 40, iters = 2)),

    // oracle-checked: per-doc fertility under the qd69-trained unigram
    // model — qd68's shape with Viterbi segmentation in place of BPE
    // merges (segment the DISTINCT-word table once, broadcast-join
    // piece counts back).
    "qd70_unigram_fertility" -> ((s, d) =>
      graft.functions.UnigramLm.trainAndFertility(Tables.documents(s, d),
          "doc_id", "text", maxPieceLen = 4, topM = 40, iters = 2)
        .orderBy(col("doc_id"))),

    // oracle-checked: the unigram token-ID stream — qd76's twin for the
    // SentencePiece family: per-doc (pos, piece, token_id) with ids in
    // the model's published (cnt desc, piece) order; Viterbi kernel on
    // the distinct-word table, broadcast vocab, one position window.
    "qd77_unigram_encode_ids" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val vocab = graft.functions.UnigramLm.trainVocab(docs, "text",
        maxPieceLen = 4, topM = 40, iters = 2)
      graft.functions.UnigramLm.encodeIds(docs, "doc_id", "text", vocab)
        .orderBy(col("doc_id"), col("pos"))
    }),

    // oracle-checked: interpolated Kneser–Ney bigram scoring — the
    // smoothing the production perplexity-filter stack uses (KenLM /
    // CCNet), beside qd62's add-one baseline: fixed 0.75 discount on
    // seen bigrams, reclaimed mass redistributed over the continuation
    // distribution (distinct-predecessor counts), unseen contexts back
    // off to it entirely. Threshold 3.44 ≈ the fixture's p70 — both
    // keep outcomes present at every SF (measured sf0.001/0.01/0.1).
    "qd78_kn_bigram_nll" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.knBigramNll(docs, "doc_id", "text",
          docs.filter(col("lang") === "en"), "text",
          discount = 0.75, threshold = 3.44)
        .orderBy(col("doc_id"))
    }),

    // oracle-checked: in-engine quality-classifier TRAINING — the
    // fastText/DCLM pattern (distill a rule battery into a fast linear
    // model): hashed-BOW + inverse-length + bias features, labels from
    // qd39's Gopher keep, 24 full-batch GD iterations at lr=5 — every
    // step exact decimal or 6-dp-pinned, so the whole descent replays
    // in SQL as unrolled CTEs (the qd67 BPE-trainer discipline). The
    // output is the model artifact: the (feat, weight) vector.
    "qd79_quality_classifier_train" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      // the TRAIN query measures the descent every run (Seed, not Memo
      // — min-of-2 benching would otherwise erase the training cost);
      // the eval siblings reuse the artifact this seeds
      val w = Classifier.trainHashedLogisticSeed(d, docs, "doc_id", "text",
        labels, "keep", dim = 64, iters = 24, lr = 5.0)
      // exposed DOUBLE via the exact scaled integer — raw DECIMAL
      // columns hash differently across result readers (r18's lesson)
      Classifier.weightsDf(s, w)
        .select(col("feat"),
          Classifier.weightAsDouble(col("weight")).as("weight"))
        .orderBy(col("feat"))
    }),

    // oracle-checked: the trained model applied back over the corpus —
    // per-doc score, keep decision at the calibrated 0.73 operating
    // point (the training base rate: a 24-step descent separates
    // around the prior, not around 0.5), and agreement with the rule
    // battery it distills (precision 0.91 vs the 0.73 base at sf0.01).
    "qd80_quality_classifier_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val w = Classifier.trainHashedLogisticMemo(d, docs, "doc_id", "text",
        labels, "keep", dim = 64, iters = 24, lr = 5.0)
      Classifier.scoreHashedLogistic(docs, "doc_id", "text", w, 64,
          new java.math.BigDecimal("0.730000"))
        .join(labels, "doc_id")
        .select(col("doc_id"),
          Classifier.scoreAsDouble(col("score")).as("score"), col("pred"),
          col("keep").as("label"), (col("pred") === col("keep")).as("correct"))
        .orderBy(col("doc_id"))
    }),

    // oracle-checked: ROC-AUC of the classifier against its training
    // labels — average-rank Mann–Whitney over the grouped distinct-score
    // frame (integer arithmetic via doubled ranks; one bounded window).
    // ≈0.84 at sf0.01: the model genuinely ranks, the eval op proves it.
    "qd81_quality_classifier_auc" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val w = Classifier.trainHashedLogisticMemo(d, docs, "doc_id", "text",
        labels, "keep", dim = 64, iters = 24, lr = 5.0)
      val scored = Classifier.scoreHashedLogistic(docs, "doc_id", "text",
          w, 64, new java.math.BigDecimal("0.730000"))
        .join(labels, "doc_id")
      Classifier.binaryAuc(scored, "score", "keep")
    }),

    // oracle-checked: the bigram-augmented classifier's AUC — the
    // fastText word-ngrams option (Joulin et al. 2016) measured by the
    // same eval: hashed bigrams lift 0.8423 (qd81's 24-iter unigram
    // model) → 0.8722 at sf0.01 in HALF the iterations — the wider
    // frame both ranks better and converges faster (at equal iters the
    // lift is 0.8851; 12 is the bench point because per-iteration cost
    // is linear in feature rows and the bigram block is 5× of them).
    "qd89_classifier_bigram_auc" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      // no memo: the bigram model has no other consumer, so a memo here
      // would only blind this query's own min-of-2 descent floor
      val w = Classifier.trainHashedLogisticBigram(docs, "doc_id", "text",
        labels, "keep", uniDim = 64, biDim = 128, iters = 12, lr = 5.0)
      val scored = Classifier.scoreOnFeatureArrays(
          Classifier.hashedFeatureArrays(docs, "doc_id", "text", 64, 128),
          "doc_id", w)
        .join(labels, "doc_id")
      Classifier.binaryAuc(scored, "score", "keep")
    }),

    // oracle-checked: model-vs-rule DISAGREEMENT audit — the error
    // analysis a distilled filter gets before deployment: every doc
    // where the classifier's keep decision contradicts the Gopher
    // battery, with the battery's own signals and the FIRST rule the
    // doc fails (rule order = the battery's declaration order), so
    // each disagreement is attributable. False-keeps cluster on rules
    // invisible to length-normalized BOW (the min-token rule) — the
    // audit names the feature gap.
    "qd88_classifier_disagreement" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val g = TextAnalysis.gopherFilter(docs, "doc_id", "text")
      val w = Classifier.trainHashedLogisticMemo(d, docs, "doc_id", "text",
        g.select(col("doc_id"), col("keep")), "keep",
        dim = 64, iters = 24, lr = 5.0)
      Classifier.scoreHashedLogistic(docs, "doc_id", "text", w, 64,
          new java.math.BigDecimal("0.730000"))
        .join(g, "doc_id")
        .filter(col("pred") =!= col("keep"))
        .select(col("doc_id"),
          Classifier.scoreAsDouble(col("score")).as("score"), col("pred"),
          col("keep").as("label"), col("n_tokens"), col("avg_token_len"),
          col("stopword_ratio"), col("top_token_frac"), col("dup_ngram_frac"),
          when(col("n_tokens") < 30, lit("n_tokens_low"))
            .when(col("n_tokens") > 100000, lit("n_tokens_high"))
            .when(col("avg_token_len") < 3.0, lit("avg_len_low"))
            .when(col("avg_token_len") > 10.0, lit("avg_len_high"))
            .when(col("stopword_ratio") < 0.02, lit("stopword_low"))
            .when(col("top_token_frac") > 0.15, lit("ttf_high"))
            .when(col("dup_ngram_frac") > 0.8, lit("dup_high"))
            .otherwise(lit("none")).as("fail_rule"))
        .orderBy(col("doc_id"))
    }),

    // oracle-checked: the classifier's precision–recall curve — the
    // imbalanced-class eval (a quality filter operates at a keep-rate
    // point, not 0.5): per distinct threshold descending, tp/fp and
    // integer-half-up precision/recall.
    "qd86_classifier_pr_curve" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val w = Classifier.trainHashedLogisticMemo(d, docs, "doc_id", "text",
        labels, "keep", dim = 64, iters = 24, lr = 5.0)
      val scored = Classifier.scoreHashedLogistic(docs, "doc_id", "text",
          w, 64, new java.math.BigDecimal("0.730000"))
        .join(labels, "doc_id")
      Classifier.prCurve(scored, "score", "keep")
        .select(Classifier.scoreAsDouble(col("score")).as("score"),
          col("tp"), col("fp"), col("precision"), col("recall"))
        .orderBy(col("score"))
    }),

    // oracle-checked: average precision (the PR curve's step-sum
    // scalar, sklearn convention) — per-threshold contributions
    // rounded half-up at 1e-8 as integers before the sum, so the
    // different-denominator rationals never meet a double.
    "qd87_classifier_avg_precision" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val w = Classifier.trainHashedLogisticMemo(d, docs, "doc_id", "text",
        labels, "keep", dim = 64, iters = 24, lr = 5.0)
      val scored = Classifier.scoreHashedLogistic(docs, "doc_id", "text",
          w, 64, new java.math.BigDecimal("0.730000"))
        .join(labels, "doc_id")
      Classifier.averagePrecision(scored, "score", "keep")
    }),

    // oracle-checked: scoring under the PERSISTED model — the
    // production serving shape (train once, save the vector as a
    // versioned catalog table, score under the LOADED artifact). The
    // round trip is exact-decimal, in-query asserted (load ≡ trained —
    // a silently-corrupted artifact fails loudly, the qe06 floor-gate
    // discipline), and the version/freshness contract is
    // ClassifierSpec-pinned. Decouples every eval from re-running the
    // descent: the memoized trainer is this query's in-session twin.
    "qd90_persisted_model_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val w = Classifier.trainHashedLogisticMemo(d, docs, "doc_id", "text",
        labels, "keep", dim = 64, iters = 24, lr = 5.0)
      val version = graft.ops.ModelStore.save(s, "quality_clf_64", w)
      val loaded = graft.ops.ModelStore.load(s, "quality_clf_64",
        Some(version))
      require(loaded == w.sortBy(_._1),
        s"persisted model round-trip drifted at version $version")
      Classifier.scoreOnFeatureArrays(
          Classifier.hashedFeatureArrays(docs, "doc_id", "text", 64),
          "doc_id", loaded)
        .select(col("doc_id"),
          Classifier.scoreAsDouble(col("score")).as("score"),
          (col("score") >= lit(new java.math.BigDecimal("0.730000"))
            .cast(org.apache.spark.sql.types.DecimalType(8, 6))).as("pred"))
        .orderBy(col("doc_id"))
    }),

    // oracle-checked: the held-out eval under L2 WEIGHT DECAY — acting
    // on the generalization gap qd84 measured (train AUC ~0.83 vs test
    // ~0.64 on 64 hashed dims): shrink = round(λ·w, 10) per update in
    // the same exact-decimal replayable discipline. Measured at sf0.01
    // (λ=0.01): val 0.6458→0.6489, test 0.6413→0.6423, train
    // 0.8301→0.8293 — decay nudges the gap the right way but the gap
    // is feature-capacity/label-noise-bound, not an optimizer artifact
    // (the qd88 disagreement audit names the invisible rules); the
    // documented-negative contract, like qd84 itself.
    "qd91_l2_heldout_auc" -> ((s, d) => {
      val docs = Curation.withSplit(Tables.documents(s, d), "doc_id",
        trainPct = 70, valPct = 15)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val w = Classifier.trainHashedLogisticMemo(s"$d|train70|l2",
        docs.filter(col("split") === "train"), "doc_id", "text",
        labels, "keep", dim = 64, iters = 24, lr = 5.0,
        l2 = BigDecimal("0.01"))
      val scored = Classifier.scoreHashedLogistic(docs, "doc_id", "text",
          w, 64, new java.math.BigDecimal("0.730000"))
        .join(labels, "doc_id")
        .join(docs.select(col("doc_id"), col("split")), "doc_id")
      Classifier.binaryAucBy(scored, "score", "keep", "split")
        .orderBy(col("split"))
    }),

    // oracle-checked: operating-point sizing — qd86's PR curve turned
    // into a DECISION (the qe30→qe06 pattern applied to the threshold):
    // per candidate threshold the integer-disciplined precision/recall,
    // meets_target vs the 4-dp precision floor, chosen = the minimal
    // meeting threshold (= max recall subject to the floor — the
    // deployment pick qd80's hand-chosen 0.73 came from). The sweep
    // frame is the distinct-score table — bounded at any corpus size.
    "qd92_threshold_sweep" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val w = Classifier.trainHashedLogisticMemo(d, docs, "doc_id", "text",
        labels, "keep", dim = 64, iters = 24, lr = 5.0)
      val scored = Classifier.scoreHashedLogistic(docs, "doc_id", "text",
          w, 64, new java.math.BigDecimal("0.730000"))
        .join(labels, "doc_id")
      Classifier.sizeThreshold(scored, "score", "keep",
          new java.math.BigDecimal("0.9000"))
        .select(Classifier.scoreAsDouble(col("threshold")).as("threshold"),
          col("tp"), col("fp"), col("precision"), col("recall"),
          col("meets_target"), col("chosen"))
        .orderBy(col("threshold"))
    }),

    // oracle-checked: per-source calibration — qd83's ECE/Brier grouped
    // by the corpus source column: the batch twin of the streaming
    // calibration-drift monitor, and the diagnostic that names WHICH
    // source broke the score→quality mapping when the global number
    // moves. |sources|·nBins metadata rows; same integer discipline.
    "qd93_calibration_by_source" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val w = Classifier.trainHashedLogisticMemo(d, docs, "doc_id", "text",
        labels, "keep", dim = 64, iters = 24, lr = 5.0)
      val scored = Classifier.scoreHashedLogistic(docs, "doc_id", "text",
          w, 64, new java.math.BigDecimal("0.730000"))
        .join(labels, "doc_id")
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      Classifier.calibrationMetricsBy(scored, "score", "keep", "source")
        .orderBy(col("source"))
    }),

    // oracle-checked: isotonic calibration (PAV, Zadrozny & Elkan
    // 2002) — the nonparametric score→probability remap: exact
    // integer-rational pooling on the driver over the DISTINCT-score
    // table (bounded ≤ 10⁶+1 rows at any corpus size), 4-dp integer
    // half-up block values; the oracle replays it through the minimax
    // identity max_{j≤i} min_{k≥i} mean(j..k), exact because half-up
    // rounding commutes with min/max (monotone). The mapping a scorer
    // applies as a broadcast join.
    "qd95_isotonic_calibration" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val w = Classifier.trainHashedLogisticMemo(d, docs, "doc_id", "text",
        labels, "keep", dim = 64, iters = 24, lr = 5.0)
      val scored = Classifier.scoreHashedLogistic(docs, "doc_id", "text",
          w, 64, new java.math.BigDecimal("0.730000"))
        .join(labels, "doc_id")
      Classifier.isotonicCalibrate(scored, "score", "keep")
        .select(Classifier.scoreAsDouble(col("score")).as("score"),
          col("n"), col("n_pos"), col("calibrated"))
        .orderBy(col("score"))
    }),

    // oracle-checked: CHECKPOINTED descent resume — train 12
    // iterations, persist the vector (ModelStore), load it and resume
    // 12 MORE from the loaded artifact. The oracle is qd79's straight
    // 24-iteration replay VERBATIM: the descent is a pure function of
    // (weights, data), so resume ≡ straight-through bit-for-bit — the
    // property that makes a multi-hour 100 TB descent checkpointable,
    // machine-proven through a second engine here (a resume bug of any
    // kind — scale drift, missing feature, stale artifact — breaks the
    // hash). Exposed via the same exact-integer double discipline.
    "qd94_resume_training" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val w12 = Classifier.trainHashedLogisticMemo(s"$d|half", docs,
        "doc_id", "text", labels, "keep", dim = 64, iters = 12, lr = 5.0)
      val version = graft.ops.ModelStore.save(s, "quality_clf_64_ckpt", w12)
      val resumed = Classifier.trainHashedLogisticFrom(
        graft.ops.ModelStore.load(s, "quality_clf_64_ckpt", Some(version)),
        docs, "doc_id", "text", labels, "keep",
        dim = 64, iters = 12, lr = 5.0)
      Classifier.weightsDf(s, resumed)
        .select(col("feat"),
          Classifier.weightAsDouble(col("weight")).as("weight"))
        .orderBy(col("feat"))
    }),

    // oracle-checked: data-constrained EPOCH allocation (Muennighoff
    // et al. 2023) — when unique supply binds, repeat good sources at
    // diminishing value (decay 0.5/epoch, 3 epochs max) instead of
    // widening into junk. Weight = the per-source mean stopword ratio
    // (qd40's quality signal) by integer half-up division; budget =
    // 160% of total supply, so epoch 1 fills everywhere and epoch 2
    // goes to the best sources with one fractional cut — all three
    // outcomes (1.0 / fractional / 2.0 epochs) present at every SF.
    "qd85_epoch_allocation" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sw = docs.select(col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("__nt"),
        (round(TextAnalysis.stopwordRatio(col("text")), 4)
          .cast(DecimalType(18, 4)) * lit(10000L)).cast("long").as("__sw4"))
      val src = sw.groupBy(col("source"))
        .agg(sum(col("__nt")).cast("long").as("u"),
          sum(col("__sw4")).cast("long").as("__s4"),
          count(lit(1)).cast("long").as("__n"))
        .withColumn("w4", expr("(2 * __s4 + __n) div (2 * __n)"))
        .withColumn("weight", col("w4").cast(DecimalType(18, 4)) *
          lit(new java.math.BigDecimal("0.0001")))
      val total = src.agg(sum(col("u"))).head.getLong(0)
      Curation.epochAllocate(src, "source", "u", "weight",
          tokenBudget = total * 8L / 5L, maxEpochs = 3,
          decay = new java.math.BigDecimal("0.5"))
        .withColumn("weight", col("weight").cast("double"))
        .orderBy(col("source"))
    }),

    // oracle-checked: HELD-OUT evaluation — train on the md5 train
    // split only (the qd11 deterministic split), score the whole
    // corpus, AUC per split via the grouped Mann–Whitney: the
    // train-vs-val AUC gap IS the generalization check every deployed
    // quality filter publishes. Non-vacuous: all three splits carry
    // both classes at every SF.
    "qd84_heldout_auc" -> ((s, d) => {
      val docs = Curation.withSplit(Tables.documents(s, d), "doc_id",
        trainPct = 70, valPct = 15)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val w = Classifier.trainHashedLogisticMemo(s"$d|train70",
        docs.filter(col("split") === "train"), "doc_id", "text",
        labels, "keep", dim = 64, iters = 24, lr = 5.0)
      val scored = Classifier.scoreHashedLogistic(docs, "doc_id", "text",
          w, 64, new java.math.BigDecimal("0.730000"))
        .join(labels, "doc_id")
        .join(docs.select(col("doc_id"), col("split")), "doc_id")
      Classifier.binaryAucBy(scored, "score", "keep", "split")
        .orderBy(col("split"))
    }),

    // oracle-checked: the classifier's reliability table (Guo et al.
    // 2017 calibration diagnostic) — equal-width score bins, per-bin
    // count/positives/mean-prediction/observed-fraction. Every ratio is
    // an integer half-up division over scaled exact sums: bin fractions
    // are small-integer rationals, the one place round(double, 4)
    // genuinely diverges between engines.
    "qd82_classifier_calibration" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val w = Classifier.trainHashedLogisticMemo(d, docs, "doc_id", "text",
        labels, "keep", dim = 64, iters = 24, lr = 5.0)
      val scored = Classifier.scoreHashedLogistic(docs, "doc_id", "text",
          w, 64, new java.math.BigDecimal("0.730000"))
        .join(labels, "doc_id")
      Classifier.calibrationReport(scored, "score", "keep", nBins = 10)
        .orderBy(col("bin"))
    }),

    // oracle-checked: scalar calibration metrics — ECE (bin-weighted
    // |observed − predicted| from qd82's 4-dp integers) and the Brier
    // score (exact decimal squared error, half-up at 6 dp). One row.
    "qd83_classifier_calib_metrics" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val labels = TextAnalysis.gopherFilter(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep"))
      val w = Classifier.trainHashedLogisticMemo(d, docs, "doc_id", "text",
        labels, "keep", dim = 64, iters = 24, lr = 5.0)
      val scored = Classifier.scoreHashedLogistic(docs, "doc_id", "text",
          w, 64, new java.math.BigDecimal("0.730000"))
        .join(labels, "doc_id")
      Classifier.calibrationMetrics(scored, "score", "keep", nBins = 10)
    }),

    // oracle-checked: per-source Zipf rank-frequency fit — OLS of
    // ln(freq) on ln(rank) over each source's top-100 types; slope ≈ −1
    // is natural language, flat is templated text. The datacard health
    // signal beside qd55 entropy and qd49 compressibility.
    "qd64_zipf_fit" -> ((s, d) =>
      TextAnalysis.zipfFit(Tables.documents(s, d), "source", "text",
          topR = 100, minCount = 2L)
        .orderBy(col("source"))),

    // oracle-checked: IVF search over an int8-QUANTIZED index — the
    // memory-resident ANN pattern (4× smaller vectors; qe07 proves the
    // round trip, qe08 the IVF machinery; this composes them: the index,
    // centroids and all, lives in dequantized int8 space). Exact values
    // replay in SQL because quantization and search are both
    // deterministic.
    "qe11_quantized_ivf" -> ((s, d) =>
      graft.ops.Pipelines.quantizedIvf(Tables.embeddings(s, d))),

    // ---- extensions: event-stream batch view -------------------------
    "qs01_hourly_events" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
        .orderBy(col("hour"), col("event_type"))),

    // Spark's built-in session_window in batch mode (qs02 is the manual
    // lag/cumsum formulation — this covers the native operator; both
    // sessionize on epoch-µs so the ns parquet source can't skew gap
    // comparisons). Boundary semantics (StreamingSpec-pinned): an event
    // at EXACTLY last + gap merges into the session; a new session needs
    // strictly more — hence the oracle's > comparison.
    "qs03_session_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_micros(col("w.start")).as("sess_start_us"),
          unix_micros(col("w.end")).as("sess_end_us"), col("n_events"))
        .orderBy(col("user_id"), col("sess_start_us"))),
  )

  // =====================================================================
  // DuckDB oracles — same column names, same ordering, same rounding.
  // Keys absent here (qd08, qd11, qd12, qd44, qe06, qe14,
  // qa01/qa02/qa03) are
  // rows-only checks by design: they depend on Spark-internal xxhash64 /
  // engine sketches / learned centroids
  // with no DuckDB equivalent; their semantics are ScalaTest-verified
  // instead. (The SRP-LSH queries qe03/qe05 ARE oracle-checked — the
  // deterministic plane matrix embeds as SQL literals; qm02/qm04 replay
  // the synthetic PIXEL arithmetic via 128-bit limb math, qm03 the
  // synthetic square-wave PCM, and qm01 the stub decode's payload-byte
  // rolling hash — see qm01Sql..qm05Sql — so every multimodal chain is
  // hash-compared.)
  // =====================================================================
  def oracleSql: Map[String, String] = Map(
    "q01_standings" -> standingsSql,

    "q02_points_ladder" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE l_linenumber WHEN 1 THEN 25 WHEN 2 THEN 18 WHEN 3 THEN 15 WHEN 4 THEN 12
        |    WHEN 5 THEN 10 WHEN 6 THEN 8 WHEN 7 THEN 6 WHEN 8 THEN 4 WHEN 9 THEN 2
        |    WHEN 10 THEN 1 ELSE 0 END AS points
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_points_standings" ->
      """SELECT l_suppkey,
        |  CAST(SUM(CASE l_linenumber WHEN 1 THEN 25 WHEN 2 THEN 18 WHEN 3 THEN 15
        |    WHEN 4 THEN 12 WHEN 5 THEN 10 WHEN 6 THEN 8 WHEN 7 THEN 6 WHEN 8 THEN 4
        |    WHEN 9 THEN 2 WHEN 10 THEN 1 ELSE 0 END) AS BIGINT) AS season_points
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

    "q10_podium" -> (standingsSql + " LIMIT 3"),

    "q11_classification" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_suppkey = 3 ORDER BY l_linenumber, l_orderkey""".stripMargin,

    "q12_coalesce_na" ->
      """SELECT event_id, COALESCE(NULLIF(event_type, 'error'), 'N/A') AS event_type_display
        |FROM events ORDER BY event_id""".stripMargin,

    "q13_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    // to_json both sides: DuckDB escapes like Spark; the CASE mirrors
    // Spark's null-field omission (DuckDB keeps "event_type":null)
    "q14_json_encode" ->
      """SELECT event_id,
        |  CASE WHEN event_type IS NULL
        |    THEN to_json(struct_pack(event_id := event_id))::VARCHAR
        |    ELSE to_json(struct_pack(event_id := event_id, event_type := event_type))::VARCHAR
        |  END AS payload
        |FROM events ORDER BY event_id""".stripMargin,

    "q15_cast_roundtrip" ->
      """SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS okey_str,
        |  CAST(CAST(o_custkey AS VARCHAR) AS BIGINT) AS ckey_roundtrip
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q16_timestamp_parse" ->
      """SELECT o_orderkey,
        |  CAST(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS parsed_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q17_season_complete" ->
      """SELECT CASE WHEN COUNT(DISTINCT o_orderdate) >= 22 THEN 'complete'
        |  ELSE 'in_progress' END AS season_status,
        |  COUNT(DISTINCT o_orderdate) AS total_gps FROM orders""".stripMargin,

    "q18_rank_standings" ->
      """SELECT l_suppkey, season_points,
        |  CAST(RANK() OVER (ORDER BY season_points DESC) AS INTEGER) AS rnk
        |FROM (
        |  SELECT l_suppkey,
        |    CAST(SUM(CASE l_linenumber WHEN 1 THEN 25 WHEN 2 THEN 18 WHEN 3 THEN 15
        |      WHEN 4 THEN 12 WHEN 5 THEN 10 WHEN 6 THEN 8 WHEN 7 THEN 6 WHEN 8 THEN 4
        |      WHEN 9 THEN 2 WHEN 10 THEN 1 ELSE 0 END) AS BIGINT) AS season_points
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

    "q21_region_rollup" ->
      """SELECT r.r_name,
        |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin,

    "q22_window_monthly" ->
      """WITH monthly AS (
        |  SELECT l_suppkey, date_trunc('month', l_shipdate) AS month,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS revenue_dec
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_suppkey, month, CAST(revenue_dec AS DOUBLE) AS revenue,
        |  lag(CAST(revenue_dec AS DOUBLE), 1) OVER (PARTITION BY l_suppkey ORDER BY month) AS prev_revenue,
        |  CAST(SUM(revenue_dec) OVER (PARTITION BY l_suppkey ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_revenue
        |FROM monthly ORDER BY l_suppkey, month""".stripMargin,

    "q23_anti_join" ->
      """SELECT c.c_custkey, c.c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c.c_custkey""".stripMargin,

    "q24_union" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 400000
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,

    "q25_except" ->
      """SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,

    "qs02_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1800 * 1000000
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "qe04_norm_stats" ->
      """WITH norms AS (
        |  SELECT label,
        |    CAST(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                               CAST(embedding AS DOUBLE[]))) AS DECIMAL(18,6)) AS norm
        |  FROM embeddings)
        |SELECT label, COUNT(*) AS n, CAST(SUM(norm) AS DOUBLE) AS total_norm,
        |  ROUND(CAST(SUM(norm) AS DOUBLE) / COUNT(*), 6) AS avg_norm
        |FROM norms GROUP BY label ORDER BY label""".stripMargin,

    "q26_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q27_pivot" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) END) AS DOUBLE) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q28_semi_join" ->
      """SELECT c.c_custkey, c.c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c.c_custkey""".stripMargin,

    "q29_scalar_battery" ->
      """SELECT o_orderkey,
        |  upper(o_orderpriority) AS pri_upper,
        |  substr(o_orderpriority, 1, 1) AS pri_code,
        |  regexp_extract(o_orderpriority, '(\d+)', 1) AS pri_digit,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS status_pri,
        |  abs(o_totalprice - 200000.0) AS price_dist,
        |  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
        |  CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |  CAST(day(o_orderdate) AS INTEGER) AS o_day
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q31_topk_per_group" ->
      """SELECT l_suppkey, rnk, l_orderkey, l_extendedprice FROM (
        |  SELECT l_suppkey, l_orderkey, l_extendedprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS INTEGER) AS rnk
        |  FROM lineitem)
        |WHERE rnk <= 3 ORDER BY l_suppkey, rnk""".stripMargin,

    // identical SQL to q31 by construction: the Aggregator and the
    // window formulation must agree row for row
    "q41_topk_aggregator" ->
      """SELECT l_suppkey, rnk, l_orderkey, l_extendedprice FROM (
        |  SELECT l_suppkey, l_orderkey, l_extendedprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS INTEGER) AS rnk
        |  FROM lineitem)
        |WHERE rnk <= 3 ORDER BY l_suppkey, rnk""".stripMargin,

    "q35_agg_battery" ->
      """SELECT o_orderstatus,
        |  COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
        |  ROUND(AVG(o_totalprice), 2) AS avg_price,
        |  ROUND(STDDEV_SAMP(o_totalprice), 2) AS sd_price,
        |  min_by(o_orderpriority, o_orderkey) AS pri_of_min_key,
        |  max_by(o_orderpriority, o_orderkey) AS pri_of_max_key,
        |  ROUND(corr(o_totalprice, o_custkey), 6) AS price_cust_corr
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // the parquet date surfaces as TIMESTAMP in DuckDB → cast to DATE once
    "q36_date_battery" ->
      """WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT o_orderkey,
        |  d + 30 AS plus30,
        |  d - 7 AS minus7,
        |  CAST(d + INTERVAL 2 MONTH AS DATE) AS plus2mo,
        |  CAST(date_diff('day', d, DATE '2025-01-01') AS INTEGER) AS days_to_2025,
        |  last_day(d) AS month_end,
        |  CAST(quarter(d) AS INTEGER) AS qtr
        |FROM o ORDER BY o_orderkey""".stripMargin,

    // DuckDB's native ASOF JOIN replays the operator exactly; both
    // engines compare epoch-µs longs so ns-vs-µs precision can't skew
    // the inequality, and the right side is tie-deduped identically
    "q37_asof_join" ->
      """WITH e AS (SELECT event_id, epoch_us(ts) AS tus, user_id, event_type, value FROM events),
        |l AS (SELECT event_id, user_id, tus, value FROM e WHERE event_type = 'purchase'),
        |r AS (SELECT event_id, user_id, tus, value FROM e WHERE event_type = 'click'
        |      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, tus ORDER BY event_id DESC) = 1)
        |SELECT l.event_id, l.user_id, l.tus,
        |  r.event_id AS asof_event_id, r.tus AS asof_tus, r.value AS asof_value
        |FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.tus >= r.tus
        |ORDER BY l.event_id""".stripMargin,

    // slot algebra of window(ts, 10 min, 5 min): an event at t belongs
    // to starts {floor(t/300)*300, floor(t/300)*300 - 300} (seconds)
    "q38_sliding_window" ->
      """WITH e AS (SELECT epoch_us(ts) AS tus, event_type, value FROM events),
        |slots AS (
        |  SELECT unnest([(tus // 300000000) * 300, (tus // 300000000) * 300 - 300]) AS win_start_sec,
        |    event_type, value
        |  FROM e)
        |SELECT win_start_sec, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM slots GROUP BY 1, 2
        |ORDER BY win_start_sec, event_type""".stripMargin,

    // plain BETWEEN join — the Spark side's chunk bucketing must be
    // containment-exact, so any chunk-boundary bug hashes red here
    "q40_range_join" ->
      """WITH hot AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS w_start,
        |         CAST(o_orderdate AS DATE) + 7 AS w_end
        |  FROM orders WHERE o_totalprice > 450000),
        |pts AS (SELECT CAST(l_shipdate AS DATE) AS ship FROM lineitem)
        |SELECT h.o_orderkey, h.w_start, COUNT(*) AS n_shipped
        |FROM hot h JOIN pts p ON p.ship BETWEEN h.w_start AND h.w_end
        |GROUP BY h.o_orderkey, h.w_start
        |ORDER BY h.o_orderkey""".stripMargin,

    // IDENTICAL SQL to q40 by design: the aggregate-before-join form
    // must produce the same counts as the pair-materializing form
    "q44_range_count" ->
      """WITH hot AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS w_start,
        |         CAST(o_orderdate AS DATE) + 7 AS w_end
        |  FROM orders WHERE o_totalprice > 450000),
        |pts AS (SELECT CAST(l_shipdate AS DATE) AS ship FROM lineitem)
        |SELECT h.o_orderkey, h.w_start, COUNT(*) AS n_shipped
        |FROM hot h JOIN pts p ON p.ship BETWEEN h.w_start AND h.w_end
        |GROUP BY h.o_orderkey, h.w_start
        |ORDER BY h.o_orderkey""".stripMargin,

    // every stage replayed: hash split, weighted draw, n-gram gate,
    // recursive packing walk, mix stats
    "qd27_mix_pipeline" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS w
         |  FROM documents),
         |bench AS (SELECT doc_id, w FROM d WHERE doc_id % 50 = 0),
         |corpus AS (SELECT * FROM d WHERE doc_id % 50 <> 0),
         |train AS (
         |  SELECT * FROM corpus
         |  WHERE CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS INTEGER) < 90),
         |sampled AS (
         |  SELECT * FROM train
         |  WHERE CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 10000 AS INTEGER)
         |    < ${duckWeightCase(qd27Weights)}),
         |bg AS (SELECT DISTINCT unnest($duckShingles3) AS g FROM bench),
         |cg AS (SELECT doc_id, unnest($duckShingles3) AS g FROM sampled),
         |contaminated AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (g)),
         |clean AS (
         |  SELECT source, doc_id, CAST(len(w) AS BIGINT) AS n_tok FROM sampled
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |t AS (
         |  SELECT source, doc_id, n_tok,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
         |  FROM clean),
         |${duckPackWalk(512)}
         |SELECT source, COUNT(DISTINCT bin_id) AS n_bins, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens
         |FROM walk GROUP BY source ORDER BY source""".stripMargin,

    "qd28_vocab" ->
      """SELECT token, COUNT(*) AS freq FROM (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents)
        |GROUP BY token ORDER BY freq DESC, token LIMIT 100""".stripMargin,

    "qd26_incremental_dedup" ->
      """WITH base AS (SELECT doc_id, text FROM documents),
        |batch AS (
        |  SELECT doc_id, text FROM base WHERE doc_id >= 250
        |  UNION ALL
        |  SELECT doc_id + 8000, text FROM base WHERE doc_id < 5
        |  UNION ALL
        |  SELECT 9000, text FROM base WHERE doc_id = 250),
        |f AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))) AS content_hash
        |  FROM batch),
        |fresh AS (
        |  SELECT doc_id, content_hash FROM f
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) = 1)
        |SELECT doc_id, content_hash FROM fresh
        |WHERE content_hash NOT IN (
        |  SELECT md5(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')))
        |  FROM base WHERE doc_id < 250)
        |ORDER BY doc_id""".stripMargin,

    // the greedy pack replayed as a recursive walk: row rn joins row
    // rn+1 carrying (bin, used) state — the sequential semantics the
    // Spark side computes in one streaming partition pass
    "qd24_sequence_packing" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT source, doc_id,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tok,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
         |  FROM documents),
         |${duckPackWalk(512)}
         |SELECT source, doc_id, n_tok, bin_id
         |FROM walk ORDER BY source, doc_id""".stripMargin,

    // the BPE-count packer replayed: qd67's unrolled merge CTEs →
    // per-word pieces → per-doc piece counts → qd24's recursive walk
    "qd73_bpe_packing" ->
      s"""WITH RECURSIVE ${graft.functions.Bpe.oracleCtes(8)},
         |enc AS (SELECT word, CAST(len(str_split(trim(toks), '  ')) AS BIGINT) AS pieces
         |        FROM toks8),
         |docw AS (
         |  SELECT doc_id, source, word FROM (
         |    SELECT doc_id, source,
         |      unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
         |    FROM documents)
         |  WHERE len(word) > 0),
         |t AS (
         |  SELECT source, doc_id, CAST(SUM(pieces) AS BIGINT) AS n_tok,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
         |  FROM docw JOIN enc USING (word) GROUP BY source, doc_id),
         |${duckPackWalk(512)}
         |SELECT source, doc_id, n_tok AS n_pieces, bin_id
         |FROM walk ORDER BY source, doc_id""".stripMargin,

    "qd25_weighted_sample" ->
      s"""WITH b AS (
         |  SELECT source,
         |    CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 10000 AS INTEGER) AS bucket
         |  FROM documents),
         |kept AS (SELECT source FROM b WHERE bucket < ${duckWeightCase(qd25Weights)})
         |SELECT source, COUNT(*) AS n_kept FROM kept
         |GROUP BY source ORDER BY source""".stripMargin,

    "qd22_decontaminate" ->
      s"""WITH d AS (
         |  SELECT doc_id, regexp_split_to_array(trim(nfc_normalize(text)), '\\s+') AS w FROM documents),
         |g AS (SELECT doc_id, $duckShingles3 AS gs FROM d),
         |bg AS (SELECT DISTINCT unnest(gs) AS g FROM g WHERE doc_id % 50 = 0),
         |cg AS (SELECT doc_id, unnest(gs) AS g FROM g WHERE doc_id % 50 <> 0),
         |hits AS (SELECT doc_id, COUNT(*) AS n FROM cg JOIN bg USING (g) GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(h.n, 0) AS n_contaminated_grams,
         |  COALESCE(h.n, 0) > 0 AS contaminated
         |FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id
         |WHERE d.doc_id % 50 <> 0
         |ORDER BY d.doc_id""".stripMargin,

    "qd38_contamination_report" ->
      s"""WITH d AS (
         |  SELECT doc_id, regexp_split_to_array(trim(nfc_normalize(text)), '\\s+') AS w FROM documents),
         |g AS (SELECT doc_id, $duckShingles3 AS gs FROM d),
         |bg AS (SELECT DISTINCT unnest(gs) AS g FROM g WHERE doc_id % 50 = 0),
         |cg AS (SELECT doc_id, unnest(gs) AS g FROM g WHERE doc_id % 50 <> 0),
         |hits AS (SELECT doc_id, COUNT(*) AS n FROM cg JOIN bg USING (g) GROUP BY doc_id)
         |SELECT g.doc_id, CAST(len(g.gs) AS BIGINT) AS n_grams,
         |  COALESCE(h.n, 0) AS n_contaminated_grams,
         |  ROUND(CAST(COALESCE(h.n, 0) AS DOUBLE)
         |    / GREATEST(len(g.gs), 1), 4) AS contamination_frac
         |FROM g LEFT JOIN hits h ON g.doc_id = h.doc_id
         |WHERE g.doc_id % 50 <> 0
         |ORDER BY g.doc_id""".stripMargin,

    // near-dup decontamination replayed band for band (qd09's md5
    // machinery, corpus vs benchmark, exact-Jaccard verification)
    "qd45_fuzzy_decontaminate" -> qd45Sql,

    // shard-export manifest: the md5-bucket shard kernel (qd23's
    // md5_number_lower form), the md5-hex shuffle-order key, token
    // counts per qd02, rolled up per shard
    "qd46_shard_manifest" ->
      """WITH s AS (
        |  SELECT CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 16 AS INTEGER)
        |      AS shard_id,
        |    md5(CAST(doc_id AS VARCHAR)) AS h,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt
        |  FROM documents)
        |SELECT shard_id, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_tokens,
        |  MIN(h) AS first_doc_hash, MAX(h) AS last_doc_hash
        |FROM s GROUP BY shard_id ORDER BY shard_id""".stripMargin,

    // the Gopher battery: qd03's signal forms + qd17's top-token CTE +
    // qd35's positional-span dup fraction, thresholded identically on
    // the same 4-dp rounded values
    "qd39_gopher_filter" ->
      """WITH t AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_tokens,
        |    ROUND(length(regexp_replace(text, '\s+', '', 'g')) / GREATEST(len(w), 1), 4) AS avg_token_len,
        |    ROUND(len(list_filter(w, x -> x IN ('the','a','an','of','and','to','in','is','it','for')))
        |          / GREATEST(len(w), 1), 4) AS stopword_ratio
        |  FROM t),
        |e AS (SELECT doc_id, unnest(w) AS tok FROM t),
        |cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM e GROUP BY 1, 2),
        |ttf AS (SELECT doc_id, ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS BIGINT), 4) AS top_token_frac
        |        FROM cnt GROUP BY doc_id),
        |pos1 AS (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM t),
        |pspans AS (SELECT doc_id, i - 1 AS pos, w[i+0] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM pos1),
        |rep AS (SELECT doc_id, g FROM pspans GROUP BY doc_id, g HAVING COUNT(*) >= 2),
        |cov AS (SELECT DISTINCT doc_id, pos + j AS cpos
        |        FROM (SELECT p.doc_id, p.pos, unnest(range(0, 3)) AS j
        |              FROM pspans p JOIN rep USING (doc_id, g))),
        |covn AS (SELECT doc_id, COUNT(*) AS nc FROM cov GROUP BY doc_id),
        |dupf AS (SELECT t.doc_id, ROUND(COALESCE(c.nc, 0) / GREATEST(len(t.w), 1), 4) AS dup_ngram_frac
        |         FROM t LEFT JOIN covn c USING (doc_id))
        |SELECT s.doc_id, s.n_tokens, s.avg_token_len, s.stopword_ratio,
        |  COALESCE(f.top_token_frac, 0.0) AS top_token_frac,
        |  COALESCE(d.dup_ngram_frac, 0.0) AS dup_ngram_frac,
        |  (s.n_tokens >= 30 AND s.n_tokens <= 100000
        |   AND s.avg_token_len >= 3.0 AND s.avg_token_len <= 10.0
        |   AND s.stopword_ratio >= 0.02
        |   AND COALESCE(f.top_token_frac, 0.0) <= 0.15
        |   AND COALESCE(d.dup_ngram_frac, 0.0) <= 0.8) AS keep
        |FROM sig s
        |LEFT JOIN ttf f USING (doc_id)
        |LEFT JOIN dupf d USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin,

    // the datacard rollup: qd03's stopword signal (DECIMAL-summed),
    // qd04's language argmax (en wins ties, all-zero = und), qd01's
    // normalization fingerprint for the dup fraction
    "qd40_corpus_datacard" ->
      """WITH b AS (SELECT source, text,
        |    regexp_split_to_array(trim(text), '\s+') AS w,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS lw
        |  FROM documents),
        |t AS (SELECT source,
        |    CAST(len(w) AS BIGINT) AS nt,
        |    CAST(ROUND(len(list_filter(w, x -> x IN ('the','a','an','of','and','to','in','is','it','for')))
        |      / GREATEST(len(w), 1), 4) AS DECIMAL(18,4)) AS sw,
        |    len(list_filter(lw, x -> x IN ('the','and','of','to','is','with'))) AS en,
        |    len(list_filter(lw, x -> x IN ('le','la','les','et','des','une'))) AS fr,
        |    len(list_filter(lw, x -> x IN ('el','los','las','y','una','para'))) AS es,
        |    len(list_filter(lw, x -> x IN ('der','die','das','und','nicht','ein'))) AS de,
        |    md5(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))) AS fp
        |  FROM b)
        |SELECT source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
        |  ROUND(CAST(SUM(nt) * 10000 AS DOUBLE) / COUNT(*), 0) / 10000 AS avg_doc_tokens,
        |  ROUND(CAST(CAST(SUM(sw) * 10000 AS BIGINT) AS DOUBLE) / COUNT(*), 0)
        |    / 10000 AS mean_stopword_ratio,
        |  ROUND(CAST(SUM(CASE WHEN GREATEST(en, fr, es, de) > 0
        |      AND en = GREATEST(en, fr, es, de) THEN 1 ELSE 0 END) * 10000 AS DOUBLE)
        |    / COUNT(*), 0) / 10000 AS en_frac,
        |  ROUND(CAST((COUNT(*) - COUNT(DISTINCT fp)) * 10000 AS DOUBLE)
        |    / COUNT(*), 0) / 10000 AS dup_frac
        |FROM t GROUP BY source ORDER BY source""".stripMargin,

    // exact heavy tokens replayed: explode, grouped count, per-source
    // ranked cut
    "qa04_heavy_tokens_exact" ->
      """WITH t AS (SELECT source,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |g AS (SELECT source, tok, COUNT(*) AS cnt FROM t GROUP BY source, tok),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
        |    PARTITION BY source ORDER BY cnt DESC, tok) AS INTEGER) AS rnk FROM g)
        |SELECT source, tok, cnt, rnk FROM r WHERE rnk <= 10
        |ORDER BY source, rnk""".stripMargin,

    // the curriculum binning replayed: qd29's LM CTE, source join,
    // per-source ntile over the same total order, decimal-mean rollup
    "qd42_curriculum_buckets" ->
      s"""WITH $duckUnigramLmCte,
         |sc AS (SELECT d.source, l.doc_id, l.avg_logprob
         |       FROM lm l JOIN documents d USING (doc_id)),
         |b AS (SELECT source, avg_logprob, CAST(NTILE(4) OVER (
         |    PARTITION BY source ORDER BY avg_logprob, doc_id) AS INTEGER) AS bucket
         |  FROM sc)
         |SELECT source, bucket, COUNT(*) AS n_docs,
         |  ROUND(CAST(CAST(SUM(CAST(avg_logprob AS DECIMAL(18,4))) * 10000 AS BIGINT)
         |      AS DOUBLE) / COUNT(*), 0) / 10000 AS mean_score
         |FROM b GROUP BY source, bucket ORDER BY source, bucket""".stripMargin,

    // the overlap matrix replayed: distinct (source, gram) set, sizes,
    // gram equi-join pair counts, Jaccard
    "qd41_source_overlap" ->
      s"""WITH sg AS (SELECT DISTINCT source AS s, g FROM (
         |    SELECT source, unnest($duckShingles3) AS g
         |    FROM (SELECT source, regexp_split_to_array(trim(text), '\\s+') AS w
         |          FROM documents))),
         |sz AS (SELECT s, COUNT(*) AS n FROM sg GROUP BY s),
         |pr AS (SELECT a.s AS source_a, b.s AS source_b, COUNT(*) AS n_shared_grams
         |       FROM sg a JOIN sg b USING (g) WHERE a.s < b.s GROUP BY a.s, b.s)
         |SELECT source_a, source_b, za.n AS n_grams_a, zb.n AS n_grams_b,
         |  n_shared_grams,
         |  ROUND(CAST(n_shared_grams AS DOUBLE)
         |    / CAST(za.n + zb.n - n_shared_grams AS DOUBLE), 6) AS jaccard
         |FROM pr JOIN sz za ON za.s = source_a JOIN sz zb ON zb.s = source_b
         |ORDER BY source_a, source_b""".stripMargin,

    // Min-K% replayed: qd29's toks/vocab/total CTEs + per-(doc, token)
    // counts, (ln freq, token)-ordered running-count window, boundary-
    // exact take, decimal Σ lp·take, mean minus ln N
    "qd54_min_k_prob" ->
      s"""WITH $duckUnigramLmCte,
         |tfq2 AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY doc_id, tok),
         |mk AS (SELECT t.doc_id, t.tok, t.cnt,
         |    CAST(ROUND(ln(CAST(v.freq AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lpv
         |  FROM tfq2 t JOIN vocab v USING (tok)),
         |c1 AS (SELECT *,
         |    CAST(SUM(cnt) OVER (PARTITION BY doc_id ORDER BY lpv, tok
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |    CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS ntok
         |  FROM mk),
         |c2 AS (SELECT *,
         |    GREATEST(1, CAST(CEIL(0.2 * CAST(ntok AS DOUBLE)) AS BIGINT)) AS k
         |  FROM c1),
         |c3 AS (SELECT doc_id, ntok, k, lpv,
         |    LEAST(cum, k) - LEAST(cum - cnt, k) AS tk FROM c2
         |  WHERE LEAST(cum, k) - LEAST(cum - cnt, k) > 0),
         |ag AS (SELECT doc_id, MAX(ntok) AS n_tok, MAX(k) AS k_used,
         |    SUM(lpv * tk) AS s
         |  FROM c3 GROUP BY doc_id)
         |SELECT doc_id, n_tok, k_used,
         |  ROUND(CAST(s AS DOUBLE) / k_used - ln((SELECT n FROM total)), 4)
         |    AS min_k_logprob
         |FROM ag ORDER BY doc_id""".stripMargin,

    // per-source bigram entropy replayed: occurrence counts, exact-ratio
    // p, 10-dp DECIMAL −p·ln p terms, rollup + ln(distinct) normalizer
    "qd55_ngram_diversity" ->
      """WITH gr AS (
        |  SELECT source,
        |    unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
        |  FROM (SELECT source, regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |cnt AS (SELECT source, g, COUNT(*) AS c FROM gr GROUP BY source, g),
        |tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS total FROM cnt GROUP BY source),
        |terms AS (SELECT c.source,
        |    CAST(ROUND(-(CAST(c.c AS DOUBLE) / CAST(t.total AS DOUBLE))
        |      * ln(CAST(c.c AS DOUBLE) / CAST(t.total AS DOUBLE)), 10)
        |      AS DECIMAL(38,10)) AS term
        |  FROM cnt c JOIN tot t USING (source)),
        |ag AS (SELECT source, COUNT(*) AS distinct_ngrams,
        |    CAST(SUM(term) AS DOUBLE) AS h
        |  FROM terms GROUP BY source)
        |SELECT a.source, t.total AS total_ngrams, a.distinct_ngrams,
        |  ROUND(a.h, 6) AS entropy,
        |  CASE WHEN a.distinct_ngrams > 1
        |       THEN ROUND(a.h / ln(CAST(a.distinct_ngrams AS DOUBLE)), 6)
        |       ELSE 0.0 END AS entropy_norm
        |FROM ag a JOIN tot t USING (source) ORDER BY a.source""".stripMargin,

    // stream packing replayed: one ordered cumulative window (the SQL
    // twin of the two-phase prefix sum), integer chunk arithmetic,
    // per-doc sequence fan-out
    "qd57_stream_packing" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |nz AS (SELECT * FROM d WHERE n_tok > 0),
        |cu AS (SELECT doc_id, n_tok,
        |    CAST(SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM nz),
        |ex AS (SELECT doc_id, n_tok, cum, cum - n_tok AS noff,
        |    CAST(FLOOR(CAST(cum - n_tok AS DOUBLE) / 128) AS BIGINT) AS f,
        |    CAST(FLOOR(CAST(cum - 1 AS DOUBLE) / 128) AS BIGINT) AS l
        |  FROM cu),
        |sp AS (SELECT doc_id, n_tok, cum, noff, CAST(i AS BIGINT) AS seq_id
        |  FROM ex, UNNEST(range(f, l + 1)) AS t(i)),
        |sl AS (SELECT seq_id, doc_id,
        |    GREATEST(noff, seq_id * 128) - noff AS from_tok,
        |    LEAST(cum, (seq_id + 1) * 128) - GREATEST(noff, seq_id * 128) AS take,
        |    GREATEST(noff, seq_id * 128) - seq_id * 128 AS pos_in_seq,
        |    n_tok
        |  FROM sp)
        |SELECT seq_id, doc_id, from_tok, take, pos_in_seq, n_tok FROM sl
        |ORDER BY seq_id, pos_in_seq""".stripMargin,

    // collocations replayed: unigram/bigram occurrence counts, the two
    // scalar totals, the exact PMI expression shape, 6-dp round, and
    // the tie-broken top-50 cut
    "qd60_collocations" ->
      """WITH tok AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
        |  FROM documents),
        |uni AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
        |tt AS (SELECT CAST(SUM(c) AS DOUBLE) AS T FROM uni),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS g
        |  FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS w
        |        FROM documents)),
        |btot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS B FROM bg),
        |bgc AS (SELECT g, COUNT(*) AS n_ab FROM bg GROUP BY g
        |        HAVING COUNT(*) >= 5),
        |j AS (
        |  SELECT bgc.g AS bigram, bgc.n_ab, ua.c AS n_a, ub.c AS n_b
        |  FROM bgc
        |  JOIN uni ua ON ua.t = split_part(bgc.g, ' ', 1)
        |  JOIN uni ub ON ub.t = split_part(bgc.g, ' ', 2)),
        |sc AS (
        |  SELECT bigram, n_ab, n_a, n_b,
        |    ROUND(ln((CAST(n_ab AS DOUBLE) / B)
        |      / ((CAST(n_a AS DOUBLE) / T) * (CAST(n_b AS DOUBLE) / T))), 6) AS pmi
        |  FROM j CROSS JOIN btot CROSS JOIN tt)
        |SELECT bigram, n_ab, n_a, n_b, pmi FROM sc
        |ORDER BY pmi DESC, bigram LIMIT 50""".stripMargin,

    // directed containment replayed: qd41's sg/sz/pr CTEs, both ordered
    // rows emitted from each unordered pair
    "qd56_source_containment" ->
      s"""WITH sg AS (SELECT DISTINCT source AS s, g FROM (
         |    SELECT source, unnest($duckShingles3) AS g
         |    FROM (SELECT source, regexp_split_to_array(trim(text), '\\s+') AS w
         |          FROM documents))),
         |sz AS (SELECT s, COUNT(*) AS n FROM sg GROUP BY s),
         |pr AS (SELECT a.s AS sa, b.s AS sb, COUNT(*) AS ns
         |       FROM sg a JOIN sg b USING (g) WHERE a.s < b.s GROUP BY a.s, b.s),
         |bothd AS (
         |  SELECT sa AS source, sb AS other, za.n AS n_grams, ns AS n_shared_grams,
         |    ROUND(CAST(ns AS DOUBLE) / CAST(za.n AS DOUBLE), 6) AS containment
         |  FROM pr JOIN sz za ON za.s = sa
         |  UNION ALL
         |  SELECT sb, sa, zb.n, ns, ROUND(CAST(ns AS DOUBLE) / CAST(zb.n AS DOUBLE), 6)
         |  FROM pr JOIN sz zb ON zb.s = sb)
         |SELECT source, other, n_grams, n_shared_grams, containment
         |FROM bothd ORDER BY source, other""".stripMargin,

    // BM25 replayed end to end: restricted postings, window df, scalar
    // (N, avgdl), 6-dp DECIMAL partial sum, ranked cut
    "qr01_bm25_topk" ->
      s"""WITH $duckBm25Cte
         |SELECT query_id, doc_id, score, rnk FROM brk WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin,

    // the sidecar path scores the SAME corpus with the SAME kernel —
    // qr01's oracle verbatim is exactly the claim being checked
    "qr02_bm25_sidecar" ->
      s"""WITH $duckBm25Cte
         |SELECT query_id, doc_id, score, rnk FROM brk WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin,

    // the trec_eval battery replayed: boolean-AND qrels from the same
    // tokenization, top-10 run hits, 6-dp DECIMAL DCG terms, the k-row
    // cumulative IDCG table joined on min(n_rel, 10), exact integer
    // ratios for precision/recall/RR
    "qr04_retrieval_eval" ->
      s"""WITH $duckEvalCte
         |SELECT query_id, n_rel, hits, precision_at_k, recall_at_k, rr, ndcg_at_k
         |FROM evout ORDER BY query_id""".stripMargin,

    // PRF replayed end to end: first-pass brk → top-3 feedback docs →
    // tf-in-feedback × 6-dp ln(N/df) expansion scoring (original terms
    // excluded via NOT EXISTS) → expanded qt2 → the full BM25 chain a
    // second time over qt2-restricted postings
    // the MMR greedy replayed round for round — see qr10Sql
    "qr10_mmr_rerank" -> qr10Sql,

    "qr09_prf_expansion" ->
      s"""WITH $duckBm25Cte,
         |fb AS (SELECT query_id, doc_id FROM brk WHERE rnk <= 3),
         |ft AS (SELECT f.query_id, t.term, COUNT(*) AS tf
         |  FROM btok t JOIN fb f ON f.doc_id = t.doc_id
         |  GROUP BY f.query_id, t.term),
         |dfv AS (SELECT term, COUNT(DISTINCT doc_id) AS dfq FROM btok
         |  WHERE term IN (SELECT DISTINCT term FROM ft) GROUP BY term),
         |exq AS (SELECT ft.query_id, ft.term,
         |    ROUND(CAST(ft.tf AS DOUBLE)
         |      * ROUND(ln(CAST((SELECT n FROM bst) AS DOUBLE)
         |          / CAST(dfv.dfq AS DOUBLE)), 6), 6) AS score
         |  FROM ft JOIN dfv USING (term)
         |  WHERE NOT EXISTS (SELECT 1 FROM qt
         |    WHERE qt.query_id = ft.query_id AND qt.term = ft.term)),
         |expt AS (SELECT query_id, term FROM (
         |    SELECT query_id, term, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY score DESC, term) AS rn
         |    FROM exq)
         |  WHERE rn <= 2),
         |qt2 AS (SELECT query_id, term FROM qt
         |        UNION SELECT query_id, term FROM expt),
         |bp2 AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM btok
         |  WHERE term IN (SELECT DISTINCT term FROM qt2)
         |  GROUP BY doc_id, dl, term),
         |bpd2 AS (SELECT *, COUNT(*) OVER (PARTITION BY term) AS df FROM bp2),
         |bsc2 AS (SELECT q2.query_id, bpd2.doc_id,
         |    CAST(ROUND(ln(1 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |        / (CAST(df AS DOUBLE) + 0.5))
         |      * (CAST(tf AS DOUBLE) * 2.2
         |         / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))),
         |      6) AS DECIMAL(18,6)) AS part
         |  FROM bpd2 JOIN qt2 q2 USING (term) CROSS JOIN bst),
         |bag2 AS (SELECT query_id, doc_id, CAST(SUM(part) AS DOUBLE) AS score
         |  FROM bsc2 GROUP BY query_id, doc_id),
         |brk2 AS (SELECT *, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
         |  FROM bag2)
         |SELECT query_id, doc_id, score, rnk FROM brk2 WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin,

    // the corpus-level rollup shares qr04's evout CTE verbatim — macro
    // means over the already-6-dp per-query metrics, DECIMAL-summed
    "qr07_retrieval_eval_summary" ->
      s"""WITH $duckEvalCte
         |SELECT COUNT(*) AS n_queries,
         |  ROUND(CAST(SUM(CAST(precision_at_k AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         |    AS mean_precision_at_k,
         |  ROUND(CAST(SUM(CAST(recall_at_k AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         |    AS mean_recall_at_k,
         |  ROUND(CAST(SUM(CAST(rr AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_rr,
         |  ROUND(CAST(SUM(CAST(ndcg_at_k AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         |    AS mean_ndcg_at_k
         |FROM evout""".stripMargin,

    // the one-pass pipeline replays on the SAME evout CTE as qr04/qr07
    // plus a capped negatives count — composition adds no new semantics
    "qr08_retrieval_pipeline" ->
      s"""WITH $duckEvalCte,
         |negc AS (SELECT b.query_id, LEAST(COUNT(*), 5) AS n_hard_negatives
         |  FROM brk b LEFT JOIN qrels r ON r.query_id = b.query_id AND r.doc_id = b.doc_id
         |  WHERE b.rnk <= 10 AND r.doc_id IS NULL GROUP BY b.query_id)
         |SELECT e.query_id, e.n_rel, e.hits, e.precision_at_k, e.recall_at_k,
         |  e.rr, e.ndcg_at_k, COALESCE(negc.n_hard_negatives, 0) AS n_hard_negatives
         |FROM evout e LEFT JOIN negc USING (query_id)
         |ORDER BY e.query_id""".stripMargin,

    // winsorization replayed: per-source quantile_cont (the q30-pinned
    // interpolation), 4-dp round, floor cut, clip + flag
    "qd58_winsorize" ->
      """WITH base AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |cuts AS (SELECT source, ROUND(quantile_cont(n_tokens, 0.9), 4) AS p_cut
        |  FROM base GROUP BY source),
        |c2 AS (SELECT source, p_cut, CAST(FLOOR(p_cut) AS BIGINT) AS cut_tokens FROM cuts)
        |SELECT b.doc_id, b.source, b.n_tokens, c2.p_cut, c2.cut_tokens,
        |  LEAST(b.n_tokens, c2.cut_tokens) AS clipped_n,
        |  b.n_tokens > c2.cut_tokens AS is_clipped
        |FROM base b JOIN c2 USING (source) ORDER BY b.doc_id""".stripMargin,

    // hard negatives replayed: top-10 run rows with no qrels judgment,
    // re-ranked per query
    "qr05_hard_negatives" ->
      s"""WITH $duckQrelsCte,
         |negs AS (SELECT b.query_id, b.doc_id, b.rnk FROM brk b
         |  LEFT JOIN qrels r ON r.query_id = b.query_id AND r.doc_id = b.doc_id
         |  WHERE b.rnk <= 10 AND r.doc_id IS NULL),
         |nr AS (SELECT query_id, doc_id, rnk AS run_rank,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rnk, doc_id) AS INTEGER) AS neg_rank
         |  FROM negs)
         |SELECT query_id, doc_id, run_rank, neg_rank FROM nr WHERE neg_rank <= 5
         |ORDER BY query_id, neg_rank""".stripMargin,

    // the whole hybrid serving stack replayed over the JOINED corpus:
    // BM25 chain with hyb's N/avgdl (NOT the documents table's), IVF
    // assignment/probe under qe08's fixed centroids (probes vec
    // 101..103 remapped, no self-exclusion — external query-id space),
    // both legs' top-10 RRF-fused with qe16's rank arithmetic
    "qr03_hybrid_sidecar" ->
      s"""WITH hyb AS (
         |  SELECT d.doc_id, d.text, CAST(e.embedding AS DOUBLE[]) AS emb
         |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         |${duckBm25CteOver("hyb")},
         |cent AS (SELECT CAST(vec_id AS INTEGER) AS cell_id,
         |    CAST(embedding AS DOUBLE[]) AS cv FROM embeddings WHERE vec_id < 8),
         |hc AS (SELECT doc_id, emb AS v, cell_id FROM (
         |    SELECT hyb.doc_id, hyb.emb, cent.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY hyb.doc_id
         |        ORDER BY list_dot_product(cent.cv, cent.cv)
         |                   - 2 * list_dot_product(hyb.emb, cent.cv), cent.cell_id) AS rn
         |    FROM hyb, cent)
         |  WHERE rn = 1),
         |dq AS (SELECT CAST(vec_id - 100 AS INTEGER) AS query_id,
         |    CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id IN (101, 102, 103)),
         |dpr AS (SELECT query_id, qv, cell_id FROM (
         |    SELECT dq.query_id, dq.qv, cent.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY dq.query_id
         |        ORDER BY list_dot_product(cent.cv, cent.cv)
         |                   - 2 * list_dot_product(dq.qv, cent.cv), cent.cell_id) AS rn
         |    FROM dq, cent)
         |  WHERE rn <= 2),
         |dsc AS (SELECT query_id, doc_id, $duckCos AS cosine
         |  FROM hc JOIN dpr USING (cell_id)),
         |drk AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS rnk FROM dsc),
         |sp AS (SELECT query_id, doc_id,
         |    CAST(ROUND(1.0 / (60 + CAST(rnk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS part
         |  FROM brk WHERE rnk <= 10),
         |dp AS (SELECT query_id, doc_id,
         |    CAST(ROUND(1.0 / (60 + CAST(rnk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS part
         |  FROM drk WHERE rnk <= 10),
         |fu AS (SELECT query_id, doc_id, CAST(SUM(part) AS DOUBLE) AS score
         |  FROM (SELECT * FROM sp UNION ALL SELECT * FROM dp) GROUP BY query_id, doc_id),
         |fr AS (SELECT *, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) AS rnk FROM fu)
         |SELECT query_id, doc_id, score, rnk FROM fr WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin,

    // hybrid RRF: the BM25 chain (top-10) + a dense cosine top-10 leg
    // (probes vec_id 101..103 remapped to query ids), each row
    // contributing ROUND(1/(60+rank), 6) as DECIMAL, grouped sum, final
    // ranked cut — rank arithmetic only, both legs' scores discarded
    "qe16_hybrid_rrf" ->
      s"""WITH $duckBm25Cte,
         |sp AS (SELECT query_id, doc_id,
         |    CAST(ROUND(1.0 / (60 + CAST(rnk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS part
         |  FROM brk WHERE rnk <= 10),
         |dq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id IN (101, 102, 103)),
         |dc AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |dsc AS (SELECT query_id, neighbor_id, $duckCos AS cosine
         |  FROM dc, dq WHERE neighbor_id <> query_id),
         |drk AS (SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk FROM dsc),
         |dn AS (SELECT CAST(query_id - 100 AS INTEGER) AS query_id,
         |    neighbor_id AS doc_id,
         |    CAST(ROUND(1.0 / (60 + CAST(rnk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS part
         |  FROM drk WHERE rnk <= 10),
         |un AS (SELECT * FROM sp UNION ALL SELECT * FROM dn),
         |fag AS (SELECT query_id, doc_id, CAST(SUM(part) AS DOUBLE) AS score
         |  FROM un GROUP BY query_id, doc_id),
         |frk AS (SELECT *, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) AS rnk
         |  FROM fag)
         |SELECT query_id, doc_id, score, rnk FROM frk WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin,

    // md5_number_lower(id) % 100 is bit-identical to the Md5BucketExpr
    // kernel (LE uint64 of digest bytes 8..15, unsigned mod)
    "qd23_split_assign" ->
      """WITH b AS (
        |  SELECT lang,
        |    CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 AS INTEGER) AS bucket
        |  FROM documents),
        |s AS (
        |  SELECT lang, CASE WHEN bucket < 90 THEN 'train'
        |                    WHEN bucket < 95 THEN 'val'
        |                    ELSE 'test' END AS split
        |  FROM b)
        |SELECT split, lang, COUNT(*) AS n FROM s
        |GROUP BY split, lang ORDER BY split, lang""".stripMargin,

    // gap boundary is strictly > (StreamingSpec-pinned: Spark merges an
    // event at exactly last + gap into the session)
    "qs03_session_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, tus,
        |    CASE WHEN lag(tus, 1) OVER w IS NULL
        |      OR tus - lag(tus, 1) OVER w > 1800 * 1000000
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |sess AS (
        |  SELECT user_id, tus,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, MIN(tus) AS sess_start_us,
        |  MAX(tus) + 1800 * 1000000 AS sess_end_us, COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, sess_start_us""".stripMargin,

    // the oracle is the PLAIN semi join: the Spark side's bloom is a
    // pre-filter whose false positives the exact join removes, so any
    // answer drift would surface as a hash mismatch here
    "q39_bloom_semi_join" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q32_window_battery" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  ROUND(percent_rank() OVER w, 6) AS pct_rank,
        |  ROUND(cume_dist() OVER w, 6) AS cume,
        |  first_value(o_orderkey) OVER (
        |    PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderstatus, o_totalprice, o_orderkey""".stripMargin,

    "q33_string_battery" ->
      """SELECT o_orderkey,
        |  lpad(o_orderstatus, 3, '_') AS st_lpad,
        |  rpad(o_orderstatus, 3, '*') AS st_rpad,
        |  translate(o_orderpriority, '-', ' ') AS pri_spaced,
        |  reverse(o_orderstatus) AS st_rev,
        |  repeat(o_orderstatus, 2) AS st_twice,
        |  split_part(o_orderpriority, '-', 1) AS pri_head,
        |  CAST(levenshtein(o_orderstatus, 'OF') AS INTEGER) AS lev_of
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q34_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q43_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines,
        |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q30_percentiles" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS med_price,
        |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // fingerprint = md5 of lowercase whitespace-collapsed text — the same
    // canonicalization exactDedup keys on
    "qd01_exact_dedup" ->
      """SELECT md5(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))) AS content_hash,
        |  MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
        |FROM documents
        |GROUP BY 1 ORDER BY content_hash""".stripMargin,

    "qd02_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_m,
        |  CAST(CEIL(length(text) / 4.0) AS BIGINT) AS bpe_tokens_est
        |FROM documents ORDER BY doc_id""".stripMargin,

    "qd03_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |    regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        |SELECT doc_id,
        |  CAST(len(w) AS INTEGER) AS n_tokens,
        |  ROUND(length(regexp_replace(text, '\s+', '', 'g')) / GREATEST(len(w), 1), 4) AS avg_token_len,
        |  ROUND(len(list_filter(w, x -> x IN ('the','a','an','of','and','to','in','is','it','for')))
        |        / GREATEST(len(w), 1), 4) AS stopword_ratio,
        |  len(w) < 40 AS short_doc
        |FROM t ORDER BY doc_id""".stripMargin,

    "qd04_langid" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_filter(w, x -> x IN ('the','and','of','to','is','with'))) AS en,
        |  len(list_filter(w, x -> x IN ('le','la','les','et','des','une'))) AS fr,
        |  len(list_filter(w, x -> x IN ('el','los','las','y','una','para'))) AS es,
        |  len(list_filter(w, x -> x IN ('der','die','das','und','nicht','ein'))) AS de
        |  FROM t)
        |SELECT doc_id, CASE
        |  WHEN GREATEST(en, fr, es, de) = 0 THEN 'und'
        |  WHEN en = GREATEST(en, fr, es, de) THEN 'en'
        |  WHEN fr = GREATEST(en, fr, es, de) THEN 'fr'
        |  WHEN es = GREATEST(en, fr, es, de) THEN 'es'
        |  ELSE 'de' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,

    "qd05_fingerprint" ->
      """SELECT doc_id, md5(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "qd10_corpus_pipeline" ->
      """WITH q AS (
        |  SELECT doc_id, text,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens
        |  FROM documents
        |  WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 20),
        |t AS (
        |  SELECT doc_id, n_tokens,
        |    regexp_split_to_array(trim(lower(text)), '\s+') AS w,
        |    md5(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))) AS fp
        |  FROM q),
        |s AS (
        |  SELECT doc_id, n_tokens, fp,
        |    len(list_filter(w, x -> x IN ('the','and','of','to','is','with'))) AS en,
        |    len(list_filter(w, x -> x IN ('le','la','les','et','des','une'))) AS fr,
        |    len(list_filter(w, x -> x IN ('el','los','las','y','una','para'))) AS es,
        |    len(list_filter(w, x -> x IN ('der','die','das','und','nicht','ein'))) AS de
        |  FROM t),
        |lang AS (
        |  SELECT doc_id, n_tokens, fp, CASE
        |    WHEN GREATEST(en, fr, es, de) = 0 THEN 'und'
        |    WHEN en = GREATEST(en, fr, es, de) THEN 'en'
        |    WHEN fr = GREATEST(en, fr, es, de) THEN 'fr'
        |    WHEN es = GREATEST(en, fr, es, de) THEN 'es'
        |    ELSE 'de' END AS lang_pred
        |  FROM s),
        |dedup AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |    FROM lang) WHERE rn = 1)
        |SELECT lang_pred, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM dedup GROUP BY lang_pred ORDER BY lang_pred""".stripMargin,

    "qd06_ngram_jaccard_topk" ->
      s"""WITH sh AS (
         |  SELECT doc_id, $duckShingles2 AS g
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
         |        FROM documents WHERE doc_id < 60))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  ROUND(len(list_intersect(a.g, b.g))
         |        / GREATEST(len(list_distinct(list_concat(a.g, b.g))), 1), 4) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |ORDER BY jaccard DESC, id_a, id_b LIMIT 20""".stripMargin,

    "qd07_minhash_sig" -> {
      val mhCols = (0 until 8)
        .map(j => s"  list_min(list_transform(g, x -> md5(x || '#$j'))) AS mh$j")
        .mkString(",\n")
      s"""WITH sh AS (
         |  SELECT doc_id, $duckShingles2 AS g
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents))
         |SELECT doc_id,
         |$mhCols
         |FROM sh ORDER BY doc_id""".stripMargin
    },

    // the whole MinHash-LSH pipeline in SQL: portable md5 signatures →
    // 4 bands of 4 → bucket self-join → exact-Jaccard verification.
    // Mirrors Dedup.{withMinHash(portable),withLshBands,lshCandidatePairs,
    // minHashNearDups} stage for stage.
    "qd09_minhash_neardups" -> qd09Sql,
    // the recall probe replayed: sampled truth pairs by brute-force
    // set Jaccard, qd09's banding over the same sample, found flag
    "qd72_lsh_recall_probe" -> qd72Sql,

    "qd37_incremental_neardup" -> qd37Sql,

    "qd19_pretraining_pipeline" ->
      """WITH gated AS (
        |  SELECT doc_id, source,
        |    regexp_replace(
        |      regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      'https?://[^\s]+', '<URL>', 'g') AS text
        |  FROM documents
        |  WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 20),
        |f AS (
        |  SELECT *, md5(trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))) AS fp
        |  FROM gated),
        |deduped AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |    FROM f) WHERE rn = 1),
        |t AS (
        |  SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM deduped),
        |n AS (
        |  SELECT doc_id, source, w,
        |    GREATEST(1, CAST(CEIL((len(w) - 8) / 56.0) AS INTEGER)) AS nc
        |  FROM t),
        |ch AS (SELECT doc_id, source, w, unnest(range(0, nc)) AS ci FROM n)
        |SELECT source, COUNT(*) AS n_chunks,
        |  CAST(SUM(len(w[ci * 56 + 1 : ci * 56 + 64])) AS BIGINT) AS total_chunk_tokens
        |FROM ch GROUP BY source ORDER BY source""".stripMargin,

    "qd20_simhash_portable" ->
      s"""WITH $duckSimhashHiLoCte
         |SELECT d.doc_id,
         |  COALESCE(printf('%08x%08x', x.hi, x.lo), '0000000000000000') AS simhash_hex
         |FROM documents d LEFT JOIN x ON d.doc_id = x.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // all-pairs Hamming ≤ 3 over the portable signature: the Spark side
    // runs Manku multi-table blocking, which is EXACT at the radius, so
    // a green hash here is also a machine proof of the blocking's recall
    // (any missed pair would surface as an oracle mismatch)
    "qd21_simhash_neardups_portable" ->
      s"""WITH $duckSimhashHiLoCte,
         |sgn AS (
         |  SELECT d.doc_id, COALESCE(x.hi, 0) AS hi, COALESCE(x.lo, 0) AS lo
         |  FROM documents d LEFT JOIN x ON d.doc_id = x.doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
         |FROM sgn a JOIN sgn b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    "qd17_repetition" ->
      """WITH e AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM e GROUP BY 1, 2)
        |SELECT doc_id, MAX(cnt) AS top_count, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
        |  ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS BIGINT), 4) AS top_token_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // 'g' flag: DuckDB replaces first match by default, Spark replaces all
    "qd18_pii_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      text || ' contact user.name+tag@example.co.uk or https://example.com/a?b=1 end',
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^\s]+', '<URL>', 'g') AS scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,

    "qe07_quantize_fidelity" ->
      """WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |r AS (SELECT vec_id, v, list_min(v) AS mn,
        |        (list_max(v) - list_min(v)) / 255.0 AS scale FROM b),
        |q AS (SELECT vec_id, v, mn, scale,
        |  CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
        |       ELSE list_transform(v, x -> CAST(round((x - mn) / scale) AS INTEGER) - 128)
        |  END AS qv
        |  FROM r),
        |d AS (SELECT vec_id, v,
        |  CASE WHEN scale = 0 THEN list_transform(qv, x -> mn)
        |       ELSE list_transform(qv, x -> CAST(x + 128 AS DOUBLE) * scale + mn)
        |  END AS deq
        |  FROM q)
        |SELECT vec_id,
        |  ROUND(list_dot_product(v, deq)
        |    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(deq, deq))), 6) AS fidelity
        |FROM d ORDER BY vec_id""".stripMargin,

    // qe07's quantize/dequant CTEs feeding qe08's assign/probe/search —
    // the whole quantized index replayed value-exactly
    "qe11_quantized_ivf" ->
      s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
         |qr AS (SELECT vec_id, v0, list_min(v0) AS mn,
         |         (list_max(v0) - list_min(v0)) / 255.0 AS scale FROM b),
         |qz AS (SELECT vec_id, mn, scale,
         |  CASE WHEN scale = 0 THEN list_transform(v0, x -> 0)
         |       ELSE list_transform(v0, x -> CAST(round((x - mn) / scale) AS INTEGER) - 128)
         |  END AS qv
         |  FROM qr),
         |c AS (SELECT vec_id,
         |  CASE WHEN scale = 0 THEN list_transform(qv, x -> mn)
         |       ELSE list_transform(qv, x -> CAST(x + 128 AS DOUBLE) * scale + mn)
         |  END AS v
         |  FROM qz),
         |cent AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS cv FROM c WHERE vec_id < 8),
         |corpus_cells AS (
         |  SELECT vec_id, v, cell_id FROM (
         |    SELECT c.vec_id, c.v, cent.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |        ORDER BY list_dot_product(cent.cv, cent.cv)
         |                   - 2 * list_dot_product(c.v, cent.cv), cent.cell_id) AS rn
         |    FROM c, cent)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, qv2, cell_id FROM (
         |    SELECT c.vec_id AS query_id, c.v AS qv2, cent.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |        ORDER BY list_dot_product(cent.cv, cent.cv)
         |                   - 2 * list_dot_product(c.v, cent.cv), cent.cell_id) AS rn
         |    FROM c, cent WHERE c.vec_id < 5)
         |  WHERE rn <= 2),
         |sc AS (
         |  SELECT p.query_id, cc.vec_id AS neighbor_id,
         |    ROUND(list_dot_product(cc.v, p.qv2)
         |      / (sqrt(list_dot_product(cc.v, cc.v)) * sqrt(list_dot_product(p.qv2, p.qv2))), 6) AS cosine
         |  FROM corpus_cells cc JOIN probes p
         |    ON cc.cell_id = p.cell_id AND cc.vec_id <> p.query_id),
         |rk AS (SELECT *, CAST(ROW_NUMBER() OVER (
         |         PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
         |       FROM sc)
         |SELECT query_id, neighbor_id, cosine, rnk FROM rk WHERE rnk <= 3
         |ORDER BY query_id, rnk, neighbor_id""".stripMargin,

    "qd15_balanced_sample" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 50 ORDER BY lang, doc_id""".stripMargin,

    "qd16_token_budget_mix" ->
      """SELECT source, doc_id, cum_tokens FROM (
        |  SELECT source, doc_id,
        |    CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
        |      OVER (PARTITION BY source ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM documents)
        |WHERE cum_tokens <= 800 ORDER BY source, doc_id""".stripMargin,

    // chunk i covers tokens [i*56+1, i*56+64] (1-based list slicing);
    // nChunks = max(1, ceil((n_tokens - overlap) / stride))
    "qd13_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |n AS (
        |  SELECT doc_id, w,
        |    GREATEST(1, CAST(CEIL((len(w) - 8) / 56.0) AS INTEGER)) AS nc
        |  FROM t),
        |ch AS (
        |  SELECT doc_id, w, unnest(range(0, nc)) AS chunk_id FROM n)
        |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
        |  array_to_string(w[chunk_id * 56 + 1 : chunk_id * 56 + 64], ' ') AS chunk_text,
        |  CAST(len(w[chunk_id * 56 + 1 : chunk_id * 56 + 64]) AS INTEGER) AS chunk_tokens
        |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,

    // connected components over the qd09 pairs via a recursive CTE:
    // labels flow along (bidirectional) edges until every node has seen
    // every label in its component; MIN label = cluster id = keeper
    "qd14_neardup_clusters" ->
      s"""WITH RECURSIVE prs AS ($qd09Sql),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM prs
         |  UNION ALL SELECT id_b, id_a FROM prs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |walk(id, label) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.id)
         |SELECT id AS doc_id, MIN(label) AS cluster_id,
         |  (id = MIN(label)) AS is_keeper
         |FROM walk GROUP BY id ORDER BY doc_id""".stripMargin,

    // the normalize chain replayed: nfc_normalize (DuckDB's UAX #15
    // NFC, same spec as java.text.Normalizer) → lower → trim →
    // whitespace collapse; plants carry the identical decomposed
    // codepoints via the same escape sequences
    "qd48_normalize_text" ->
      s"""WITH base AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT * FROM (VALUES
        |    (9000001, 'Café  LATTE'),
        |    (9000002, 'naïve\trésumé '),
        |    (9000003, 'Ångström units')) v(doc_id, text)),
        |n AS (SELECT doc_id, text,
        |        trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g')) AS norm_text
        |      FROM base)
        |SELECT doc_id, norm_text, norm_text <> text AS changed
        |FROM n ORDER BY doc_id""".stripMargin,

    // temperature mix replayed: α=0.5 makes the power a correctly-
    // rounded IEEE sqrt, and the weight denominator sums 6-dp DECIMAL
    // powers (order-free, matching the driver's exact decimal fold —
    // an unordered double SUM could differ in the last ulp and flip a
    // rounding boundary); the keep predicate is the qd25 md5 bucket
    "qd50_temperature_mix" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(COALESCE(len(regexp_split_to_array(trim(text), '\s+')), 0) AS BIGINT) AS nt,
        |    CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 10000 AS INTEGER) AS b
        |  FROM documents),
        |m AS (SELECT source, COUNT(*) AS n_docs,
        |             CAST(SUM(nt) AS BIGINT) AS n_tokens
        |      FROM d GROUP BY source),
        |mp AS (SELECT *,
        |         CASE WHEN n_tokens = 0 THEN CAST(0 AS DECIMAL(18,6))
        |              ELSE CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6))
        |         END AS pw
        |       FROM m),
        |g AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tot,
        |             CAST(SUM(pw) AS DOUBLE) AS psum FROM mp),
        |p AS (
        |  SELECT mp.source, mp.n_docs, mp.n_tokens,
        |    CASE WHEN g.tot = 0 THEN 0.0
        |         ELSE ROUND(mp.n_tokens / g.tot, 6) END AS nat_frac,
        |    CASE WHEN mp.n_tokens = 0 THEN 0.0
        |         ELSE ROUND(CAST(mp.pw AS DOUBLE) / g.psum, 6) END AS temp_weight,
        |    CASE WHEN mp.n_tokens = 0 THEN 0
        |         ELSE CAST(ROUND(CAST(mp.pw AS DOUBLE) / g.psum * 10000) AS BIGINT) END AS target_tokens,
        |    CASE WHEN mp.n_tokens = 0 THEN 0
        |         ELSE CAST(ROUND(LEAST(1.0, CAST(mp.pw AS DOUBLE) / g.psum * 10000 / mp.n_tokens) * 10000) AS INTEGER) END AS threshold
        |  FROM mp CROSS JOIN g),
        |k AS (
        |  SELECT d.source, COUNT(*) AS kept_docs,
        |    CAST(SUM(d.nt) AS BIGINT) AS kept_tokens
        |  FROM d JOIN p ON d.source = p.source WHERE d.b < p.threshold
        |  GROUP BY d.source)
        |SELECT p.source, p.n_docs, p.n_tokens, p.nat_frac, p.temp_weight,
        |  p.target_tokens, p.threshold,
        |  COALESCE(k.kept_docs, 0) AS kept_docs,
        |  COALESCE(k.kept_tokens, 0) AS kept_tokens
        |FROM p LEFT JOIN k ON p.source = k.source ORDER BY p.source""".stripMargin,

    // winnowing replayed: positional md5 3-gram hashes, the 43-char
    // composite-key window min (hash asc, rightmost pos on ties), full
    // windows only, decoded and deduplicated
    "qd51_winnowing" ->
      s"""WITH $duckWinnowCte,
         |sel AS (
         |  SELECT DISTINCT doc_id,
         |    ngr - CAST(substr(wk, 34, 10) AS BIGINT) AS fp_pos,
         |    substr(wk, 1, 32) AS fp_hash
         |  FROM wins WHERE pos <= ngr - 4)
         |SELECT doc_id, fp_pos, fp_hash FROM sel
         |ORDER BY doc_id, fp_pos""".stripMargin,

    // containment replayed: qd51's winnowing CTEs → df-capped
    // fingerprint pair join → exact distinct-gram verification with
    // both containment directions + Jaccard, filter on the ROUNDED max
    "qd53_containment" ->
      s"""WITH $duckWinnowCte,
        |sel AS (
        |  SELECT DISTINCT doc_id, substr(wk, 1, 32) AS fp_hash
        |  FROM wins WHERE pos <= ngr - 4),
        |fdf AS (
        |  SELECT doc_id, fp_hash FROM (
        |    SELECT doc_id, fp_hash,
        |      COUNT(*) OVER (PARTITION BY fp_hash) AS dfc FROM sel)
        |  WHERE dfc <= 50),
        |prs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fps
        |  FROM fdf a JOIN fdf b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= 2),
        |gs AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(w) - 1),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM ww),
        |ver AS (
        |  SELECT p.id_a, p.id_b, p.shared_fps,
        |    CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE) AS i,
        |    CAST(len(ga.g) AS DOUBLE) AS na, CAST(len(gb.g) AS DOUBLE) AS nb
        |  FROM prs p JOIN gs ga ON ga.doc_id = p.id_a
        |  JOIN gs gb ON gb.doc_id = p.id_b),
        |sc AS (
        |  SELECT id_a, id_b, shared_fps,
        |    ROUND(i / GREATEST(na, 1.0), 4) AS containment_a,
        |    ROUND(i / GREATEST(nb, 1.0), 4) AS containment_b,
        |    ROUND(i / GREATEST(na + nb - i, 1.0), 4) AS jaccard
        |  FROM ver)
        |SELECT id_a, id_b, shared_fps, containment_a, containment_b, jaccard
        |FROM sc WHERE GREATEST(containment_a, containment_b) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // tf-idf keywords replayed: postings tf, window df, the N scalar,
    // round(tf · round(ln(N/df), 6), 6), per-doc top-3
    "qr06_tfidf_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tfq AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
        |pd AS (SELECT *, COUNT(*) OVER (PARTITION BY term) AS df FROM tfq),
        |nn AS (SELECT COUNT(*) AS n FROM documents),
        |sc AS (
        |  SELECT doc_id, term, tf, df,
        |    ROUND(CAST(tf AS DOUBLE)
        |      * ROUND(ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)), 6), 6) AS score
        |  FROM pd CROSS JOIN nn WHERE df >= 2),
        |r AS (
        |  SELECT doc_id, term, tf, df, score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term) AS INTEGER) AS rnk
        |  FROM sc)
        |SELECT doc_id, term, tf, df, score, rnk FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,

    // the snapshot diff replayed: the same deterministic v2 mutation,
    // portable fingerprints, FULL OUTER JOIN on the id
    "qd52_corpus_diff" ->
      """WITH old AS (SELECT doc_id, text FROM documents),
        |revised AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 1 THEN text || ' revised' ELSE text END AS text
        |  FROM old WHERE doc_id % 17 <> 3),
        |addedd AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |    'new doc ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM old WHERE doc_id % 29 = 0),
        |newc AS (SELECT * FROM revised UNION ALL SELECT * FROM addedd),
        |ofp AS (SELECT doc_id,
        |    md5(trim(regexp_replace(lower(nfc_normalize(COALESCE(text, ''))), '\s+', ' ', 'g'))) AS fp_old FROM old),
        |nfp AS (SELECT doc_id,
        |    md5(trim(regexp_replace(lower(nfc_normalize(COALESCE(text, ''))), '\s+', ' ', 'g'))) AS fp_new FROM newc)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fp_old <> n.fp_new THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  o.fp_old, n.fp_new
        |FROM ofp o FULL OUTER JOIN nfp n ON o.doc_id = n.doc_id
        |ORDER BY COALESCE(o.doc_id, n.doc_id)""".stripMargin,

    // qd14's recursive-CC CTE + the qd23 md5-bucket kernel applied to the
    // cluster representative (COALESCE to the doc's own id for singletons)
    "qd47_leakage_split" ->
      s"""WITH RECURSIVE prs AS ($qd09Sql),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM prs
         |  UNION ALL SELECT id_b, id_a FROM prs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |walk(id, label) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.id),
         |comp AS (SELECT id, MIN(label) AS cluster_id FROM walk GROUP BY id),
         |g AS (
         |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS group_key
         |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
         |b AS (
         |  SELECT doc_id, group_key,
         |    CAST(md5_number_lower(CAST(group_key AS VARCHAR)) % 100 AS INTEGER) AS bucket
         |  FROM g)
         |SELECT doc_id, group_key,
         |  CASE WHEN bucket < 90 THEN 'train'
         |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,

    "qe01_cosine_topk" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0)
         |SELECT c.vec_id, $duckCos AS cosine
         |FROM c, q ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,

    "qe02_knn_join" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |sc AS (SELECT query_id, neighbor_id, $duckCos AS cosine
         |       FROM c, q WHERE neighbor_id <> query_id),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
         |        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
         |      FROM sc)
         |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 3
         |ORDER BY query_id, rnk""".stripMargin,

    "qs01_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    // the MRL funnel replayed stage by stage: truncated-slice cosine
    // (v[1:16] — DuckDB slices are 1-based inclusive, = Spark's
    // slice(v,1,16)), coarse row_number window, candidate cut, full
    // cosine, final window. Single list_dot_product per score keeps
    // sequential-double parity with VecDot.
    "qe15_mrl_rerank" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |           FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |coarse AS (
         |  SELECT query_id, neighbor_id, v, qv,
         |    ROUND(list_dot_product(v[1:16], qv[1:16])
         |      / (sqrt(list_dot_product(v[1:16], v[1:16]))
         |         * sqrt(list_dot_product(qv[1:16], qv[1:16]))), 6) AS coarse_cosine
         |  FROM c, q WHERE neighbor_id <> query_id),
         |cand AS (SELECT * FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY coarse_cosine DESC, neighbor_id) AS crank
         |    FROM coarse) WHERE crank <= 12),
         |rescored AS (SELECT query_id, neighbor_id, $duckCos AS cosine FROM cand),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
         |        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
         |      FROM rescored)
         |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 3
         |ORDER BY query_id, rnk, neighbor_id""".stripMargin,

    // SRP-LSH ANN replayed end to end: plane literals → bucket equi-join →
    // cosine ranking. Mirrors Similarity.annLshJoin(k=3, nPlanes=4, dim=64).
    "qe03_ann_lsh" ->
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cb AS (SELECT vec_id, v, ${duckSrpBucket("v", 4, 64)} AS bucket FROM c),
         |qb AS (SELECT vec_id AS query_id, v AS qv, bucket FROM cb WHERE vec_id < 5),
         |sc AS (
         |  SELECT q.query_id, cb.vec_id AS neighbor_id, $duckCos AS cosine
         |  FROM cb JOIN qb q ON cb.bucket = q.bucket AND cb.vec_id <> q.query_id),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
         |        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
         |      FROM sc)
         |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 3
         |ORDER BY query_id, rnk, neighbor_id""".stripMargin,

    "qe09_exact_threshold_join" ->
      s"""WITH base AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings WHERE vec_id < 60),
         |jit AS (
         |  SELECT vec_id + 1000000 AS vec_id,
         |    list_transform(range(1, len(v) + 1),
         |      i -> v[i] * (1.0 + CAST((i - 1) % 3 - 1 AS DOUBLE) * 0.005)) AS v
         |  FROM base WHERE vec_id < 3),
         |c AS (SELECT * FROM base UNION ALL SELECT * FROM jit)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ROUND(list_dot_product(a.v, b.v)
         |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
         |FROM c a JOIN c b ON a.vec_id < b.vec_id
         |WHERE ROUND(list_dot_product(a.v, b.v)
         |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.95
         |ORDER BY id_a, id_b""".stripMargin,

    // PQ replayed end to end with deterministic prefix codebooks
    // (vec_id < 16 sub-slices): per-subspace `||c||² − 2·v·c` argmin
    // encode (the NearestCellsExpr metric, ties to the lower code),
    // reconstruction via ORDER BY sub flatten (so the dot product
    // accumulates in the same sequential element order as the Spark
    // side's concatenated vector), approx-cosine top-3
    "qe12_pq_ann" ->
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cb AS (
         |  SELECT t.sub, CAST(c.vec_id AS INTEGER) AS code,
         |    list_slice(c.v, t.sub * 8 + 1, t.sub * 8 + 8) AS cvec
         |  FROM c CROSS JOIN (SELECT unnest(range(8)) AS sub) t
         |  WHERE c.vec_id < 16),
         |codes AS (
         |  SELECT vec_id, sub, code FROM (
         |    SELECT c.vec_id, cb.sub, cb.code,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id, cb.sub
         |        ORDER BY list_dot_product(cb.cvec, cb.cvec)
         |          - 2 * list_dot_product(
         |              list_slice(c.v, cb.sub * 8 + 1, cb.sub * 8 + 8), cb.cvec),
         |          cb.code) AS rn
         |    FROM c CROSS JOIN cb)
         |  WHERE rn = 1),
         |vhat AS (
         |  SELECT codes.vec_id, flatten(list(cb.cvec ORDER BY codes.sub)) AS vh
         |  FROM codes JOIN cb ON cb.sub = codes.sub AND cb.code = codes.code
         |  GROUP BY codes.vec_id),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 5),
         |sc AS (
         |  SELECT q.query_id, vhat.vec_id AS neighbor_id,
         |    ROUND(list_dot_product(vh, qv)
         |      / (sqrt(list_dot_product(vh, vh)) * sqrt(list_dot_product(qv, qv))), 6)
         |      AS approx_cosine
         |  FROM vhat CROSS JOIN q WHERE vhat.vec_id <> q.query_id),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
         |        PARTITION BY query_id ORDER BY approx_cosine DESC, neighbor_id)
         |        AS INTEGER) AS rnk
         |      FROM sc)
         |SELECT query_id, neighbor_id, approx_cosine, rnk FROM r WHERE rnk <= 3
         |ORDER BY query_id, rnk, neighbor_id""".stripMargin,

    // IVF-PQ replayed end to end: qe08's cell assignment + qe12's
    // codebook machinery applied to RESIDUALS (list_transform index
    // arithmetic keeps element order identical to the Spark zip_with)
    "qe13_ivfpq_ann" ->
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS cv FROM c WHERE vec_id < 8),
         |asg AS (
         |  SELECT vec_id, v, cell_id, cv FROM (
         |    SELECT c.vec_id, c.v, cent.cell_id, cent.cv,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |        ORDER BY list_dot_product(cent.cv, cent.cv)
         |          - 2 * list_dot_product(c.v, cent.cv), cent.cell_id) AS rn
         |    FROM c, cent) WHERE rn = 1),
         |res AS (SELECT vec_id, cell_id, cv,
         |    list_transform(range(1, 65), i -> v[i] - cv[i]) AS r FROM asg),
         |rcb AS (
         |  SELECT t.sub, CAST(res.vec_id AS INTEGER) AS code,
         |    list_slice(res.r, t.sub * 8 + 1, t.sub * 8 + 8) AS cvec
         |  FROM res CROSS JOIN (SELECT unnest(range(8)) AS sub) t
         |  WHERE res.vec_id < 16),
         |codes AS (
         |  SELECT vec_id, sub, code FROM (
         |    SELECT res.vec_id, rcb.sub, rcb.code,
         |      ROW_NUMBER() OVER (PARTITION BY res.vec_id, rcb.sub
         |        ORDER BY list_dot_product(rcb.cvec, rcb.cvec)
         |          - 2 * list_dot_product(
         |              list_slice(res.r, rcb.sub * 8 + 1, rcb.sub * 8 + 8), rcb.cvec),
         |          rcb.code) AS rn
         |    FROM res CROSS JOIN rcb) WHERE rn = 1),
         |rhat AS (
         |  SELECT codes.vec_id, flatten(list(rcb.cvec ORDER BY codes.sub)) AS rh
         |  FROM codes JOIN rcb ON rcb.sub = codes.sub AND rcb.code = codes.code
         |  GROUP BY codes.vec_id),
         |xhat AS (
         |  SELECT res.vec_id, res.cell_id,
         |    list_transform(range(1, 65), i -> res.cv[i] + rhat.rh[i]) AS xh
         |  FROM res JOIN rhat ON res.vec_id = rhat.vec_id),
         |probes AS (
         |  SELECT query_id, qv, cell_id FROM (
         |    SELECT c.vec_id AS query_id, c.v AS qv, cent.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |        ORDER BY list_dot_product(cent.cv, cent.cv)
         |          - 2 * list_dot_product(c.v, cent.cv), cent.cell_id) AS rn
         |    FROM c, cent WHERE c.vec_id < 5) WHERE rn <= 2),
         |sc AS (
         |  SELECT p.query_id, x.vec_id AS neighbor_id,
         |    ROUND(list_dot_product(x.xh, p.qv)
         |      / (sqrt(list_dot_product(x.xh, x.xh)) * sqrt(list_dot_product(p.qv, p.qv))), 6)
         |      AS approx_cosine
         |  FROM xhat x JOIN probes p ON x.cell_id = p.cell_id AND x.vec_id <> p.query_id),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
         |        PARTITION BY query_id ORDER BY approx_cosine DESC, neighbor_id)
         |        AS INTEGER) AS rnk
         |      FROM sc)
         |SELECT query_id, neighbor_id, approx_cosine, rnk FROM r WHERE rnk <= 3
         |ORDER BY query_id, rnk, neighbor_id""".stripMargin,

    // IVF replayed end to end with deterministic centroids (vec_id < 8):
    // cell assignment is the same `||c||² − 2·v·c` squared-L2 argmin the
    // NearestCellsExpr kernel computes (sequential double dot products on
    // both engines; ties to the lower cell id), queries probe their 2
    // nearest cells, cosine top-3 inside probed cells
    // the composed funnel replayed stage by stage: qe08's assignment +
    // probes, qe15's truncated coarse rank + cut + full rerank
    "qe18_ivf_mrl_funnel" ->
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS cv FROM c WHERE vec_id < 8),
         |cc AS (
         |  SELECT vec_id, v, cell_id FROM (
         |    SELECT c.vec_id, c.v, cent.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |        ORDER BY list_dot_product(cent.cv, cent.cv)
         |                   - 2 * list_dot_product(c.v, cent.cv), cent.cell_id) AS rn
         |    FROM c, cent)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, qv, cell_id FROM (
         |    SELECT c.vec_id AS query_id, c.v AS qv, cent.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |        ORDER BY list_dot_product(cent.cv, cent.cv)
         |                   - 2 * list_dot_product(c.v, cent.cv), cent.cell_id) AS rn
         |    FROM c, cent WHERE c.vec_id < 5)
         |  WHERE rn <= 2),
         |coarse AS (
         |  SELECT p.query_id, cc.vec_id AS neighbor_id, cc.v, p.qv,
         |    ROUND(list_dot_product(cc.v[1:16], p.qv[1:16])
         |      / (sqrt(list_dot_product(cc.v[1:16], cc.v[1:16]))
         |         * sqrt(list_dot_product(p.qv[1:16], p.qv[1:16]))), 6) AS coarse_cosine
         |  FROM cc JOIN probes p
         |    ON cc.cell_id = p.cell_id AND cc.vec_id <> p.query_id),
         |cand AS (SELECT * FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY coarse_cosine DESC, neighbor_id) AS crank
         |    FROM coarse) WHERE crank <= 12),
         |rescored AS (SELECT query_id, neighbor_id, $duckCos AS cosine FROM cand),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
         |        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
         |      FROM rescored)
         |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 3
         |ORDER BY query_id, rnk, neighbor_id""".stripMargin,

    // cluster-cap sampling replayed: qe08's cell assignment (‖c‖²−2v·c
    // ranking, tie on cell), centroid re-join, full L2² within-cell
    // window, cap cut
    "qe17_cluster_cap_sample" ->
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS cv FROM c WHERE vec_id < 8),
         |cc AS (
         |  SELECT vec_id, v, cell_id FROM (
         |    SELECT c.vec_id, c.v, cent.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
         |        ORDER BY list_dot_product(cent.cv, cent.cv)
         |                   - 2 * list_dot_product(c.v, cent.cv), cent.cell_id) AS rn
         |    FROM c, cent)
         |  WHERE rn = 1),
         |d AS (SELECT cc.cell_id, cc.vec_id,
         |    ROUND(list_dot_product(cc.v, cc.v) - 2 * list_dot_product(cc.v, cent.cv)
         |      + list_dot_product(cent.cv, cent.cv), 6) AS dist2
         |  FROM cc JOIN cent USING (cell_id)),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY cell_id ORDER BY dist2, vec_id) AS INTEGER) AS rnk FROM d)
         |SELECT cell_id, vec_id, dist2, rnk FROM r WHERE rnk <= 25
         |ORDER BY cell_id, rnk""".stripMargin,

    "qe08_ivf_ann_oracle" -> duckQe08Sql,
    // the recall probe replayed: brute-force truth window, qe08's IVF
    // pipeline at k=10, per-query hit count + recall arithmetic
    "qe29_ann_recall_probe" -> duckQe29Sql,

    // the per-nProbe sweep + minimal-meeting-config choice replayed
    "qe30_ivf_size_nprobe" -> duckQe30Sql,

    // the cell-sidecar path scores the SAME vectors with the SAME
    // kernel under the SAME pinned centroids — qe08's oracle verbatim
    // is exactly the claim being checked
    "qe19_ann_sidecar" -> duckQe08Sql,

    // cell-health report replayed: qe08's argmin assignment, per-member
    // distances rounded 6 dp and summed as DECIMAL (order-free), empty
    // cells kept via the centroid-side left join
    "qe25_cell_stats" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS cv FROM c WHERE vec_id < 8),
        |cc AS (
        |  SELECT vec_id, v, cell_id, cv FROM (
        |    SELECT c.vec_id, c.v, cent.cell_id, cent.cv,
        |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
        |        ORDER BY list_dot_product(cent.cv, cent.cv)
        |                   - 2 * list_dot_product(c.v, cent.cv), cent.cell_id) AS rn
        |    FROM c, cent)
        |  WHERE rn = 1),
        |m AS (
        |  SELECT cell_id, COUNT(*) AS n,
        |    SUM(CAST(ROUND(sqrt(GREATEST(0.0,
        |      list_dot_product(v, v) - 2 * list_dot_product(v, cv)
        |        + list_dot_product(cv, cv))), 6) AS DECIMAL(18,6))) AS sd
        |  FROM cc GROUP BY cell_id),
        |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM m)
        |SELECT cent.cell_id, COALESCE(m.n, 0) AS n,
        |  ROUND(COALESCE(m.n, 0) / tot.tot, 6) AS frac,
        |  ROUND(CAST(m.sd AS DOUBLE) / m.n, 6) AS mean_dist
        |FROM cent LEFT JOIN m ON cent.cell_id = m.cell_id CROSS JOIN tot
        |ORDER BY cent.cell_id""".stripMargin,

    // the outlier report replayed: qe25's assignment CTE + 6-dp
    // distances, DECIMAL Σd/Σd², the identical mean/std double formula,
    // and the flag compared on the ROUNDED values
    "qe27_embedding_outliers" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS cv FROM c WHERE vec_id < 8),
        |cc AS (
        |  SELECT vec_id, v, cell_id, cv FROM (
        |    SELECT c.vec_id, c.v, cent.cell_id, cent.cv,
        |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
        |        ORDER BY list_dot_product(cent.cv, cent.cv)
        |                   - 2 * list_dot_product(c.v, cent.cv), cent.cell_id) AS rn
        |    FROM c, cent)
        |  WHERE rn = 1),
        |md AS (
        |  SELECT vec_id, cell_id,
        |    ROUND(sqrt(GREATEST(0.0, list_dot_product(v, v)
        |      - 2 * list_dot_product(v, cv) + list_dot_product(cv, cv))), 6) AS dist
        |  FROM cc),
        |mo AS (
        |  SELECT cell_id, COUNT(*) AS n,
        |    SUM(CAST(dist AS DECIMAL(18,6))) AS sd,
        |    SUM(CAST(CAST(dist AS DECIMAL(18,6)) * CAST(dist AS DECIMAL(18,6))
        |      AS DECIMAL(38,12))) AS sq
        |  FROM md GROUP BY cell_id),
        |ms AS (
        |  SELECT cell_id,
        |    ROUND(CAST(sd AS DOUBLE) / n, 6) AS cell_mean,
        |    ROUND(sqrt(GREATEST(0.0, CAST(sq AS DOUBLE) / n
        |      - (CAST(sd AS DOUBLE) / n) * (CAST(sd AS DOUBLE) / n))), 6) AS cell_std
        |  FROM mo)
        |SELECT md.vec_id, md.cell_id, md.dist, ms.cell_mean, ms.cell_std,
        |  md.dist > ms.cell_mean + 1.0 * ms.cell_std AS is_outlier
        |FROM md JOIN ms USING (cell_id) ORDER BY md.vec_id""".stripMargin,

    // the JL projection replayed against the exact splitmix ±1 matrix
    // (16 planes × 64 dims as literals), scale 1/√16 = 0.25
    "qe26_random_projection" ->
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |p(i, pl) AS (VALUES
         |${duckPlanesValues(16, 64)})
         |SELECT c.vec_id, CAST(p.i AS BIGINT) AS i,
         |  ROUND(list_dot_product(c.v, p.pl) * 0.25, 6) AS p_val
         |FROM c CROSS JOIN p
         |ORDER BY c.vec_id, i""".stripMargin,

    // Lloyd's replayed iteration by iteration: assignment is the qe08
    // argmin pattern (c·c − 2·v·c, ties on cell_id), means are 6-dp
    // elementwise AVG via a range(1,65) expansion, empty cells COALESCE
    // to the previous centroid — the same retention rule as kmeansFit.
    "qe20_kmeans_fit" ->
      s"""WITH $duckKmeansCtes,
        |cnt2 AS (SELECT cell_id, COUNT(*) AS n FROM a2 GROUP BY cell_id)
        |SELECT c2.cell_id, t.i, c2.cv[CAST(t.i AS INT)] AS c_val, COALESCE(cnt2.n, 0) AS n
        |FROM cent2 c2 CROSS JOIN range(1, 65) AS t(i)
        |LEFT JOIN cnt2 ON cnt2.cell_id = c2.cell_id
        |ORDER BY c2.cell_id, t.i""".stripMargin,

    // the fit→serve composition: the same Lloyd CTEs produce cent2,
    // which then drives qe08's IVF probe-and-rank pattern.
    "qe23_kmeans_ivf" ->
      s"""WITH $duckKmeansCtes,
        |corpus_cells AS (SELECT vec_id, v, cell_id FROM (
        |    SELECT c.vec_id, c.v, k.cell_id,
        |      ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
        |        list_dot_product(k.cv, k.cv) - 2 * list_dot_product(c.v, k.cv),
        |        k.cell_id) AS rn
        |    FROM c, cent2 k) WHERE rn = 1),
        |probes AS (SELECT query_id, qv, cell_id FROM (
        |    SELECT c.vec_id AS query_id, c.v AS qv, k.cell_id,
        |      ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
        |        list_dot_product(k.cv, k.cv) - 2 * list_dot_product(c.v, k.cv),
        |        k.cell_id) AS rn
        |    FROM c, cent2 k WHERE c.vec_id < 5) WHERE rn <= 2),
        |sc AS (SELECT p.query_id, cc.vec_id AS neighbor_id,
        |    ROUND(list_dot_product(cc.v, p.qv)
        |      / (sqrt(list_dot_product(cc.v, cc.v)) * sqrt(list_dot_product(p.qv, p.qv))), 6) AS cosine
        |  FROM corpus_cells cc JOIN probes p
        |    ON cc.cell_id = p.cell_id AND cc.vec_id <> p.query_id),
        |r AS (SELECT *, CAST(ROW_NUMBER() OVER (
        |        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rnk
        |      FROM sc)
        |SELECT query_id, neighbor_id, cosine, rnk FROM r WHERE rnk <= 3
        |ORDER BY query_id, rnk, neighbor_id""".stripMargin,

    // Rocchio replayed: per-label 6-dp elementwise means over the
    // training rows, each held-out row scored by cosine against every
    // class mean, best (score DESC, label ASC) kept.
    "qe21_class_mean" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
        |tr AS (SELECT * FROM e WHERE vec_id % 4 <> 0),
        |te AS (SELECT * FROM e WHERE vec_id % 4 = 0),
        |me AS (SELECT label, i, ROUND(AVG(v[i]), 6) AS av
        |       FROM tr CROSS JOIN range(1, 65) AS t(i) GROUP BY label, i),
        |m AS (SELECT label AS cand, list(av ORDER BY i) AS mv FROM me GROUP BY label),
        |sc AS (SELECT te.vec_id, te.label, m.cand,
        |         ROUND(list_dot_product(te.v, m.mv)
        |           / (sqrt(list_dot_product(te.v, te.v)) * sqrt(list_dot_product(m.mv, m.mv))), 6) AS score
        |       FROM te CROSS JOIN m),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cand) AS rn FROM sc)
        |SELECT vec_id, label, cand AS predicted, score FROM r WHERE rn = 1
        |ORDER BY vec_id""".stripMargin,

    // the exact gate replayed: normalized benchmark, per-corpus-row
    // argmax by the qe08 argmin pattern over unit benchmark vectors
    // (≡ argmax cosine; ties → lowest bench_id), jitter plants from
    // qe05's replay.
    "qe24_semantic_decontaminate" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |jit AS (SELECT vec_id + 1000000 AS vec_id,
        |    list_transform(range(1, len(v) + 1),
        |      i -> v[i] * (1.0 + CAST((i - 1) % 3 - 1 AS DOUBLE) * 0.005)) AS v
        |  FROM e WHERE vec_id < 3),
        |corp AS (SELECT * FROM e WHERE vec_id >= 20 UNION ALL SELECT * FROM jit),
        |b AS (SELECT vec_id AS bench_id,
        |        list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS bv
        |      FROM e WHERE vec_id < 20),
        |r AS (SELECT c.vec_id, b.bench_id,
        |        ROUND(list_dot_product(c.v, b.bv)
        |          / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.bv, b.bv))), 6) AS max_cos,
        |        ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY
        |          list_dot_product(b.bv, b.bv) - 2 * list_dot_product(c.v, b.bv),
        |          b.bench_id) AS rn
        |      FROM corp c CROSS JOIN b)
        |SELECT vec_id, bench_id, max_cos, max_cos >= 0.99 AS contaminated
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    // affinity matrix replayed: per-document unit vectors, per-source
    // 6-dp elementwise means, S×S upper-triangle cosine.
    "qe22_source_affinity" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |j AS (SELECT d.source, list_transform(e.v, x -> x / sqrt(list_dot_product(e.v, e.v))) AS nv
        |      FROM documents d JOIN e ON d.doc_id = e.vec_id
        |      WHERE list_dot_product(e.v, e.v) > 0
        |        AND NOT isnan(list_dot_product(e.v, e.v))),
        |me AS (SELECT source, i, ROUND(AVG(nv[i]), 6) AS av
        |       FROM j CROSS JOIN range(1, 65) AS t(i) GROUP BY source, i),
        |m AS (SELECT source, list(av ORDER BY i) AS mv FROM me GROUP BY source)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  ROUND(list_dot_product(a.mv, b.mv)
        |    / (sqrt(list_dot_product(a.mv, a.mv)) * sqrt(list_dot_product(b.mv, b.mv))), 6) AS affinity
        |FROM m a CROSS JOIN m b WHERE a.source < b.source
        |ORDER BY src_a, src_b""".stripMargin,

    // embedding near-dups replayed end to end, planted jitter included:
    // mirror of Similarity.embeddingNearDups(minCosine=0.95, nPlanes=8,
    // dim=64) over base ∪ jittered(vec_id<3). DuckDB lists are 1-based, so
    // the jitter index maps (i-1) ↔ Spark's 0-based transform index.
    "qe05_embedding_neardups" ->
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |jit AS (
         |  SELECT vec_id + 1000000 AS vec_id,
         |    list_transform(range(1, len(v) + 1),
         |      i -> v[i] * (1.0 + CAST((i - 1) % 3 - 1 AS DOUBLE) * 0.005)) AS v
         |  FROM base WHERE vec_id < 3),
         |allv AS (SELECT * FROM base UNION ALL SELECT * FROM jit),
         |b AS (SELECT vec_id, v, ${duckSrpBucket("v", 8, 64)} AS bucket FROM allv),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
         |    ROUND(list_dot_product(a.v, b2.v)
         |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b2.v, b2.v))), 6) AS cosine
         |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
         |SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.95
         |ORDER BY id_a, id_b""".stripMargin,

    // the multimodal queries replayed from their generators' / stub's
    // arithmetic — see qm01Sql..qm05Sql
    "qm01_media_features" -> qm01Sql,
    "qm02_image_decode" -> qm02Sql,
    "qm03_audio_decode" -> qm03Sql,
    "qm04_image_neardups" -> qm04Sql,
    "qm05_video_meta" -> qm05Sql,
    "qm06_video_frames" -> qm06Sql,

    // SemDeDup replayed end to end: the qe08 deterministic-centroid
    // argmin assignment + the qe05 jitter plants, within-cell pair
    // cosine ≥ 0.95, drop = higher id of any qualifying pair
    "qe10_semantic_dedup" ->
      s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |jit AS (
         |  SELECT vec_id + 1000000 AS vec_id,
         |    list_transform(range(1, len(v) + 1),
         |      i -> v[i] * (1.0 + CAST((i - 1) % 3 - 1 AS DOUBLE) * 0.005)) AS v
         |  FROM base WHERE vec_id < 3),
         |allv AS (SELECT * FROM base UNION ALL SELECT * FROM jit),
         |cent AS (SELECT CAST(vec_id AS INTEGER) AS cell_id, v AS cv FROM base WHERE vec_id < 8),
         |assigned AS (
         |  SELECT vec_id, v, cell_id FROM (
         |    SELECT a.vec_id, a.v, cent.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY list_dot_product(cent.cv, cent.cv)
         |                   - 2 * list_dot_product(a.v, cent.cv), cent.cell_id) AS rn
         |    FROM allv a, cent)
         |  WHERE rn = 1),
         |dropped AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM assigned a JOIN assigned b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
         |  WHERE ROUND(list_dot_product(a.v, b.v)
         |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.95)
         |SELECT a.vec_id, a.cell_id,
         |  a.vec_id NOT IN (SELECT vec_id FROM dropped) AS kept
         |FROM assigned a ORDER BY a.vec_id""".stripMargin,

    // per-token ln(freq) rounded to 6 dp and summed as DECIMAL — order-
    // independent, so the only cross-engine risk is a 1-ulp ln() landing
    // exactly on a rounding boundary (see TextAnalysis.unigramLogProb)
    "qd29_unigram_logprob" ->
      s"""WITH $duckUnigramLmCte
         |SELECT doc_id, n_tok, avg_logprob FROM lm ORDER BY doc_id""".stripMargin,

    // DSIR replayed end to end: hashed-bigram buckets via the portable
    // md5 bucket, add-1 smoothed log ratio per bucket rounded to 6 dp as
    // DECIMAL, per-doc Σ count·lr — bit-equal to Curation.dsirWeights
    // ROUND the decimal wsum BEFORE casting to double (half-boundary
    // sums round differently across engines after the cast)
    "qd30_dsir" ->
      s"""WITH ${duckDsirCtes("documents")}
         |SELECT d.doc_id, COALESCE(p.n_feat, 0) AS n_feat,
         |  COALESCE(CAST(ROUND(p.wsum, 4) AS DOUBLE), 0.0) AS dsir_logratio
         |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // duplicated-passage detection replayed relationally: span → docs
    // holding it → spans held by ≥2 docs → per-doc duplicated fraction
    "qd32_dup_passages" ->
      s"""WITH ${duckDupPassageCtes("documents")}
         |SELECT doc_id, n_spans, n_dup_spans, dup_frac
         |FROM dupf ORDER BY doc_id""".stripMargin,

    // intra-doc duplicate n-gram coverage replayed with the same
    // positional-span machinery, grouped per (doc, gram) instead of
    // cross-doc
    "qd35_dup_ngram_frac" -> {
      val n = 3
      val concat = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
      s"""WITH dpd AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
         |  FROM documents),
         |pos1 AS (
         |  SELECT doc_id, w, unnest(range(1, len(w) - ${n - 2})) AS i FROM dpd),
         |pspans AS (SELECT doc_id, i - 1 AS pos, $concat AS g FROM pos1),
         |rep AS (
         |  SELECT doc_id, g FROM pspans GROUP BY doc_id, g HAVING COUNT(*) >= 2),
         |cov AS (
         |  SELECT DISTINCT doc_id, pos + j AS cpos
         |  FROM (SELECT p.doc_id, p.pos, unnest(range(0, $n)) AS j
         |        FROM pspans p JOIN rep USING (doc_id, g))),
         |covn AS (SELECT doc_id, COUNT(*) AS nc FROM cov GROUP BY doc_id)
         |SELECT d.doc_id, len(d.w) AS n_tokens,
         |  COALESCE(c.nc, 0) AS n_dup_covered,
         |  ROUND(COALESCE(c.nc, 0) / GREATEST(len(d.w), 1), 4) AS dup_ngram_frac
         |FROM dpd d LEFT JOIN covn c USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },

    // span scrubbing replayed relationally with POSITIONAL spans:
    // duplicated span starts → covered token positions (start + 0..n−1)
    // → anti-join tokens on position → ordered re-aggregation
    "qd34_scrub_spans" -> {
      val n = 5
      val concat = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
      s"""WITH dpd AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
         |  FROM documents),
         |pos1 AS (
         |  SELECT doc_id, w, unnest(range(1, len(w) - ${n - 2})) AS i FROM dpd),
         |pspans AS (SELECT doc_id, i - 1 AS pos, $concat AS g FROM pos1),
         |shared AS (
         |  SELECT g FROM (SELECT DISTINCT doc_id, g FROM pspans)
         |  GROUP BY g HAVING COUNT(*) >= 2),
         |cov1 AS (SELECT doc_id, pos FROM pspans JOIN shared USING (g)),
         |cov AS (
         |  SELECT DISTINCT doc_id, pos + j AS cpos
         |  FROM (SELECT doc_id, pos, unnest(range(0, $n)) AS j FROM cov1)),
         |tok1 AS (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM dpd),
         |tok AS (SELECT doc_id, i - 1 AS pos, w[i] AS tk FROM tok1),
         |keep AS (
         |  SELECT t.doc_id, t.pos, t.tk
         |  FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.cpos
         |  WHERE c.cpos IS NULL),
         |clean AS (
         |  SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS ct
         |  FROM keep GROUP BY doc_id),
         |rem AS (SELECT doc_id, COUNT(*) AS nr FROM cov GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(c.ct, '') AS clean_text,
         |  len(d.w) AS n_tokens, COALESCE(r.nr, 0) AS n_removed_tokens
         |FROM dpd d LEFT JOIN clean c USING (doc_id) LEFT JOIN rem r USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },

    // the capstone replayed stage by stage on the SHARED CTE chains
    // (duckUnigramLmCte / duckDsirCtes / duckDupPassageCtes — the same
    // SQL the standalone qd29/qd30/qd32 oracles prove), each stage
    // re-fit on its surviving input exactly as the Spark side does
    "qd33_curation_pipeline" ->
      s"""WITH $duckUnigramLmCte,
         |s1 AS (
         |  SELECT d.doc_id, d.lang, d.text, l.n_tok
         |  FROM documents d JOIN lm l USING (doc_id)
         |  WHERE l.avg_logprob >= -3.41),
         |${duckDupPassageCtes("s1")},
         |s2 AS (
         |  SELECT s1.*, f.dup_frac
         |  FROM s1 JOIN dupf f USING (doc_id) WHERE f.dup_frac <= 0.5),
         |${duckDsirCtes("s2")},
         |dsir AS (
         |  SELECT s2.doc_id, COALESCE(CAST(ROUND(p.wsum, 4) AS DOUBLE), 0.0) AS w
         |  FROM s2 LEFT JOIN perdoc p USING (doc_id)),
         |s3 AS (
         |  SELECT s2.lang, s2.n_tok, s2.dup_frac
         |  FROM s2 JOIN dsir USING (doc_id) WHERE dsir.w > 0)
         |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         |  ROUND(CAST(SUM(CAST(dup_frac AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_dup_frac
         |FROM s3 GROUP BY lang ORDER BY lang""".stripMargin,

    // the end-to-end capstone replayed stage for stage — see qd61Sql's
    // scaladoc for the CTE↔operator mapping
    "qd61_full_pipeline" -> qd61Sql,

    // the bigram model replayed: reference bigram/context counts from
    // the lang='en' slice, add-one smoothing with the type-count V,
    // unseen contexts degrading to ln(1/V), 6-dp decimal NLL terms
    // scaled by exact counts, 4-dp mean, the 3.47-nat keep threshold
    "qd62_bigram_nll_gate" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |refbg AS (
        |  SELECT bg, COUNT(*) AS cab FROM (
        |    SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
        |    FROM tok WHERE lang = 'en') GROUP BY bg),
        |refuni AS (
        |  SELECT tk, COUNT(*) AS ca FROM (
        |    SELECT unnest(w) AS tk FROM tok WHERE lang = 'en') GROUP BY tk),
        |vv AS (SELECT COUNT(*) AS v FROM refuni),
        |docbg AS (
        |  SELECT doc_id, bg, COUNT(*) AS cnt FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
        |    FROM tok) GROUP BY doc_id, bg),
        |sc AS (
        |  SELECT d.doc_id, CAST(SUM(d.cnt) AS BIGINT) AS n_bigrams,
        |    SUM(CAST(ROUND(-ln((COALESCE(rb.cab, 0) + 1)
        |          / CAST(COALESCE(ru.ca, 0) + vv.v AS DOUBLE)), 6) AS DECIMAL(18,6)) * d.cnt) AS s
        |  FROM docbg d
        |  LEFT JOIN refbg rb USING (bg)
        |  LEFT JOIN refuni ru ON ru.tk = split_part(d.bg, ' ', 1)
        |  CROSS JOIN vv
        |  GROUP BY d.doc_id)
        |SELECT t.doc_id, COALESCE(sc.n_bigrams, 0) AS n_bigrams,
        |  ROUND(CAST(sc.s AS DOUBLE) / sc.n_bigrams, 4) AS avg_nll,
        |  COALESCE(ROUND(CAST(sc.s AS DOUBLE) / sc.n_bigrams, 4) <= 3.47, false) AS keep
        |FROM tok t LEFT JOIN sc USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    // quality-aware keeper selection replayed: qd09's pairs, qd14's
    // recursive components, qd03's 4-dp stopword ratio, and the
    // per-cluster (score DESC, id ASC) argmax
    "qd63_quality_keepers" ->
      s"""WITH RECURSIVE prs AS ($qd09Sql),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM prs
         |  UNION ALL SELECT id_b, id_a FROM prs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |walk(id, label) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.id),
         |comp AS (SELECT id AS doc_id, MIN(label) AS cluster_id
         |         FROM walk GROUP BY id),
         |scored AS (
         |  SELECT doc_id,
         |    ROUND(len(list_filter(w, x -> x IN ('the','a','an','of','and','to','in','is','it','for')))
         |          / GREATEST(len(w), 1), 4) AS score
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
         |        FROM documents)),
         |j AS (SELECT c.doc_id, c.cluster_id, s.score
         |      FROM comp c JOIN scored s USING (doc_id)),
         |k AS (SELECT cluster_id,
         |        first(doc_id ORDER BY score DESC, doc_id) AS keeper_id
         |      FROM j GROUP BY cluster_id)
         |SELECT j.doc_id, j.cluster_id, j.score, k.keeper_id,
         |  j.doc_id = k.keeper_id AS is_keeper
         |FROM j JOIN k USING (cluster_id) ORDER BY j.doc_id""".stripMargin,

    // the curriculum pack replayed: LM scores, 4-dp quantile_cont
    // thresholds (q30 parity), the broadcast-comparison bucket, the
    // (bucket, md5, id)-ordered cumsum and qd57's chunk arithmetic
    "qd66_curriculum_packing" ->
      s"""WITH $duckUnigramLmCte,
         |th AS (SELECT quantile_cont(avg_logprob, 0.25) AS t1,
         |              quantile_cont(avg_logprob, 0.50) AS t2,
         |              quantile_cont(avg_logprob, 0.75) AS t3 FROM lm),
         |bk AS (SELECT l.doc_id, l.n_tok,
         |    1 + CAST(l.avg_logprob >= ROUND(t.t1, 4) AS INTEGER)
         |      + CAST(l.avg_logprob >= ROUND(t.t2, 4) AS INTEGER)
         |      + CAST(l.avg_logprob >= ROUND(t.t3, 4) AS INTEGER) AS bucket,
         |    md5(CAST(l.doc_id AS VARCHAR)) AS h
         |  FROM lm l CROSS JOIN th t),
         |cu AS (SELECT doc_id, n_tok, bucket,
         |    CAST(SUM(n_tok) OVER (ORDER BY bucket, h, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM bk WHERE n_tok > 0),
         |ex2 AS (SELECT doc_id, n_tok, bucket, cum, cum - n_tok AS noff,
         |    CAST(FLOOR(CAST(cum - n_tok AS DOUBLE) / 128) AS BIGINT) AS f,
         |    CAST(FLOOR(CAST(cum - 1 AS DOUBLE) / 128) AS BIGINT) AS l
         |  FROM cu),
         |sp AS (SELECT doc_id, bucket, cum, noff, CAST(i AS BIGINT) AS seq_id
         |  FROM ex2, UNNEST(range(f, l + 1)) AS u(i)),
         |sl AS (SELECT seq_id, doc_id,
         |    GREATEST(noff, seq_id * 128) - noff AS from_tok,
         |    LEAST(cum, (seq_id + 1) * 128) - GREATEST(noff, seq_id * 128) AS take,
         |    GREATEST(noff, seq_id * 128) - seq_id * 128 AS pos_in_seq,
         |    bucket
         |  FROM sp)
         |SELECT seq_id, doc_id, from_tok, take, pos_in_seq, bucket
         |FROM sl ORDER BY seq_id, pos_in_seq""".stripMargin,

    // the BPE training loop replayed: 8 unrolled merge iterations —
    // pair counts from positional list indexing over the double-space
    // segmentation strings, count-desc/lexicographic argmax, greedy
    // left-to-right replace-apply (DuckDB replace ≡ Spark
    // StringReplace; BpeSpec pins the overlap contract on both)
    "qd67_bpe_train" -> graft.functions.Bpe.trainOracleSql(8),

    // the production-vocab trainer shares qd67's oracle VERBATIM — the
    // in-memory merge loop is machine-proved ≡ the distributed one
    // (and ≡ the reference algorithm) every round
    "qd74_bpe_train_fast" -> graft.functions.Bpe.trainOracleSql(8),

    // the token-ID stream: merge CTEs → vocab (binary-ordered seed
    // chars + rank-ordered merges, MIN on collisions) → positional
    // (word, piece) walk → per-doc ROW_NUMBER positions
    "qd76_bpe_encode_ids" -> graft.functions.Bpe.encodeIdsOracleSql(8),

    // the encode leg: the same unrolled merges, per-word piece counts
    // from the final segmentation, per-doc join + fertility arithmetic
    "qd68_bpe_encode" -> graft.functions.Bpe.encodeOracleSql(8),

    // the water-fill solve replayed: round-6 sqrt weights in
    // DECIMAL(18,6), ratio sort, exclusive window prefix sums, the
    // cap condition, λ* from the capped set, floor(λ·w) takes
    "qd71_mix_waterfill" ->
      """WITH m AS (
        |  SELECT source,
        |    CAST(SUM(COALESCE(len(regexp_split_to_array(trim(text), '\s+')), 0)) AS BIGINT) AS a
        |  FROM documents GROUP BY source
        |  HAVING CAST(SUM(COALESCE(len(regexp_split_to_array(trim(text), '\s+')), 0)) AS BIGINT) > 0),
        |w AS (SELECT source, a,
        |        CAST(ROUND(sqrt(CAST(a AS DOUBLE)), 6) AS DECIMAL(18,6)) AS pw
        |      FROM m),
        |r AS (SELECT *, a / CAST(pw AS DOUBLE) AS ratio FROM w),
        |t AS (SELECT CAST(SUM(pw) AS DECIMAL(38,6)) AS wtot FROM r),
        |pre AS (
        |  SELECT r.*,
        |    COALESCE(CAST(SUM(a)  OVER (ORDER BY ratio, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS apre,
        |    COALESCE(CAST(SUM(pw) OVER (ORDER BY ratio, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS DECIMAL(38,6)), 0) AS wpre
        |  FROM r),
        |fl AS (
        |  SELECT pre.*,
        |    CASE WHEN CAST(t.wtot - pre.wpre AS DOUBLE) <= 0 THEN TRUE
        |         ELSE pre.ratio < (25000 - pre.apre) / CAST(t.wtot - pre.wpre AS DOUBLE)
        |    END AS capped
        |  FROM pre CROSS JOIN t),
        |lam AS (
        |  SELECT CASE WHEN CAST(t.wtot - COALESCE(cw.wc, 0) AS DOUBLE) <= 0 THEN 0.0
        |              ELSE (25000 - COALESCE(cw.ac, 0)) / CAST(t.wtot - COALESCE(cw.wc, 0) AS DOUBLE)
        |         END AS l
        |  FROM t LEFT JOIN (
        |    SELECT CAST(SUM(a) AS BIGINT) AS ac, CAST(SUM(pw) AS DECIMAL(38,6)) AS wc
        |    FROM fl WHERE capped) cw ON TRUE)
        |SELECT fl.source, fl.a AS n_tokens, CAST(fl.pw AS DOUBLE) AS weight, fl.capped,
        |  CASE WHEN fl.capped THEN fl.a
        |       ELSE CAST(FLOOR(lam.l * CAST(fl.pw AS DOUBLE)) AS BIGINT) END AS take_tokens
        |FROM fl CROSS JOIN lam ORDER BY fl.source""".stripMargin,

    // qd71's solve re-used under qd50's doc-Bernoulli keep: same
    // weights/prefix-sums/λ*, plus the per-source threshold
    // round(min(1, take/a)·10⁴) and the kept accounting
    "qd75_temperature_waterfill" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(COALESCE(len(regexp_split_to_array(trim(text), '\s+')), 0) AS BIGINT) AS nt,
        |    CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 10000 AS INTEGER) AS b
        |  FROM documents),
        |m AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(nt) AS BIGINT) AS a
        |  FROM d GROUP BY source
        |  HAVING CAST(SUM(nt) AS BIGINT) > 0),
        |w AS (SELECT source, n_docs, a,
        |        CAST(ROUND(sqrt(CAST(a AS DOUBLE)), 6) AS DECIMAL(18,6)) AS pw
        |      FROM m),
        |r AS (SELECT *, a / CAST(pw AS DOUBLE) AS ratio FROM w),
        |t AS (SELECT CAST(SUM(pw) AS DECIMAL(38,6)) AS wtot FROM r),
        |pre AS (
        |  SELECT r.*,
        |    COALESCE(CAST(SUM(a)  OVER (ORDER BY ratio, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS apre,
        |    COALESCE(CAST(SUM(pw) OVER (ORDER BY ratio, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS DECIMAL(38,6)), 0) AS wpre
        |  FROM r),
        |fl AS (
        |  SELECT pre.*,
        |    CASE WHEN CAST(t.wtot - pre.wpre AS DOUBLE) <= 0 THEN TRUE
        |         ELSE pre.ratio < (25000 - pre.apre) / CAST(t.wtot - pre.wpre AS DOUBLE)
        |    END AS capped
        |  FROM pre CROSS JOIN t),
        |lam AS (
        |  SELECT CASE WHEN CAST(t.wtot - COALESCE(cw.wc, 0) AS DOUBLE) <= 0 THEN 0.0
        |              ELSE (25000 - COALESCE(cw.ac, 0)) / CAST(t.wtot - COALESCE(cw.wc, 0) AS DOUBLE)
        |         END AS l
        |  FROM t LEFT JOIN (
        |    SELECT CAST(SUM(a) AS BIGINT) AS ac, CAST(SUM(pw) AS DECIMAL(38,6)) AS wc
        |    FROM fl WHERE capped) cw ON TRUE),
        |alloc AS (
        |  SELECT fl.source, fl.n_docs, fl.a, CAST(fl.pw AS DOUBLE) AS weight, fl.capped,
        |    CASE WHEN fl.capped THEN fl.a
        |         ELSE CAST(FLOOR(lam.l * CAST(fl.pw AS DOUBLE)) AS BIGINT) END AS take_tokens
        |  FROM fl CROSS JOIN lam),
        |tk AS (
        |  SELECT alloc.*,
        |    CAST(ROUND(LEAST(1.0, CAST(take_tokens AS DOUBLE) / a) * 10000) AS INTEGER) AS threshold
        |  FROM alloc),
        |k AS (
        |  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS kept_docs,
        |    CAST(SUM(d.nt) AS BIGINT) AS kept_tokens
        |  FROM d JOIN tk ON d.source = tk.source WHERE d.b < tk.threshold
        |  GROUP BY d.source)
        |SELECT tk.source, tk.n_docs, tk.a AS n_tokens, tk.weight, tk.capped,
        |  tk.take_tokens, tk.threshold,
        |  COALESCE(k.kept_docs, 0) AS kept_docs,
        |  COALESCE(k.kept_tokens, 0) AS kept_tokens
        |FROM tk LEFT JOIN k ON tk.source = k.source ORDER BY tk.source""".stripMargin,

    // the unigram hard-EM loop replayed: substring seed counts, two
    // unrolled EM iterations (scaled-integer scores, ALL segmentations
    // of every word enumerated by recursive CTE and ranked with the
    // kernel's exact order — an all-paths proof of the Viterbi DP),
    // keep-alive floor, hard pruning, final model scores
    "qd69_unigram_train" ->
      graft.functions.UnigramLm.trainOracleSql(maxPieceLen = 4, topM = 40, iters = 2),

    // the fertility leg: one more all-paths Viterbi under the final
    // model, per-word piece counts, per-doc join + fertility arithmetic
    "qd70_unigram_fertility" ->
      graft.functions.UnigramLm.fertilityOracleSql(maxPieceLen = 4, topM = 40, iters = 2),

    // the unigram token-ID stream: model-order ids + positional walk
    "qd77_unigram_encode_ids" ->
      graft.functions.UnigramLm.encodeIdsOracleSql(maxPieceLen = 4, topM = 40, iters = 2),

    // the whole gradient descent replayed: Gopher labels, hashed
    // features, 24 unrolled (margin → residual → gradient → update)
    // CTE blocks of exact decimal arithmetic
    "qd79_quality_classifier_train" ->
      Classifier.trainOracleSql(dim = 64, iters = 24, lr = 5.0),

    // the trained vector applied in SQL: same margin sum, 6-dp sigmoid,
    // decimal threshold compare, agreement vs the label CTE
    "qd80_quality_classifier_score" ->
      Classifier.scoreOracleSql(dim = 64, iters = 24, lr = 5.0, threshold = "0.73"),

    // the average-rank Mann–Whitney replay: grouped scores, doubled
    // ranks, one integer rollup and a single rounded division
    "qd81_quality_classifier_auc" ->
      Classifier.aucOracleSql(dim = 64, iters = 24, lr = 5.0),

    // the bigram-augmented AUC replayed: the wider feature frame
    // through the same GD + rank CTEs
    "qd89_classifier_bigram_auc" ->
      Classifier.bigramAucOracleSql(uniDim = 64, biDim = 128,
        iters = 12, lr = 5.0),

    // the disagreement audit replayed: label-CTE signals + scores +
    // the first-failing-rule CASE
    "qd88_classifier_disagreement" ->
      Classifier.disagreementOracleSql(dim = 64, iters = 24, lr = 5.0,
        threshold = "0.73"),

    // the PR curve replayed: descending-threshold cumulative windows,
    // integer half-up precision/recall
    "qd86_classifier_pr_curve" ->
      Classifier.prCurveOracleSql(dim = 64, iters = 24, lr = 5.0),

    // average precision replayed: 1e-8 integer step terms
    "qd87_classifier_avg_precision" ->
      Classifier.apOracleSql(dim = 64, iters = 24, lr = 5.0),

    // the epoch greedy replayed: integer-half-up source weights, exact
    // decimal marginals over the (source, epoch) grid, one global
    // cumulative-supply window, integer takes and epoch arithmetic
    "qd85_epoch_allocation" ->
      """WITH sw AS (
        |  SELECT source, CAST(len(w) AS BIGINT) AS nt,
        |    CAST(CAST(ROUND(len(list_filter(w, x -> x IN ('the','a','an','of','and','to','in','is','it','for')))
        |      / GREATEST(len(w), 1), 4) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS sw4
        |  FROM (SELECT source, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)),
        |src AS (
        |  SELECT source, CAST(SUM(nt) AS BIGINT) AS u,
        |    (2 * CAST(SUM(sw4) AS BIGINT) + COUNT(*)) // (2 * COUNT(*)) AS w4
        |  FROM sw GROUP BY source),
        |bgt AS (SELECT (CAST(SUM(u) AS BIGINT) * 8) // 5 AS b FROM src),
        |grid AS (
        |  SELECT s.source, s.u,
        |    CAST(s.w4 AS DECIMAL(18,4)) * CAST(0.0001 AS DECIMAL(5,4)) AS w,
        |    e.k, CAST(s.w4 AS DECIMAL(18,4)) * CAST(0.0001 AS DECIMAL(5,4)) * e.dk AS m
        |  FROM src s CROSS JOIN (VALUES
        |    (1, CAST(1.00 AS DECIMAL(12,2))),
        |    (2, CAST(0.50 AS DECIMAL(12,2))),
        |    (3, CAST(0.25 AS DECIMAL(12,2)))) e(k, dk)),
        |cum AS (
        |  SELECT *, COALESCE(SUM(u) OVER (ORDER BY m DESC, source, k
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM grid),
        |tk AS (SELECT source, u, w, m,
        |    GREATEST(LEAST(u, (SELECT b FROM bgt) - bef), 0) AS take
        |  FROM cum)
        |SELECT source, ANY_VALUE(u) AS unique_tokens,
        |  CAST(ANY_VALUE(w) AS DOUBLE) AS weight,
        |  CAST(SUM(take) AS BIGINT) AS tokens_taken,
        |  CAST((2 * CAST(SUM(take) AS BIGINT) * 10000 + ANY_VALUE(u))
        |    // (2 * ANY_VALUE(u)) AS DOUBLE) / 10000.0 AS epochs,
        |  CAST(ROUND(SUM(m * take), 4) AS DOUBLE) AS effective_value
        |FROM tk GROUP BY source ORDER BY source""".stripMargin,

    // the held-out walk replayed: train-slice features feed the same
    // GD CTEs (N = the slice size), a second all-docs feature frame
    // feeds scoring, split-partitioned average ranks
    "qd84_heldout_auc" ->
      Classifier.heldoutAucOracleSql(dim = 64, iters = 24, lr = 5.0,
        trainPct = 70, valPct = 15),

    // the reliability table replayed: same trained vector, bin by
    // exact decimal floor, integer half-up divisions throughout
    "qd82_classifier_calibration" ->
      Classifier.calibrationOracleSql(dim = 64, iters = 24, lr = 5.0, nBins = 10),

    // ECE + Brier replayed on the same integer discipline
    "qd83_classifier_calib_metrics" ->
      Classifier.calibrationMetricsOracleSql(dim = 64, iters = 24, lr = 5.0, nBins = 10),

    // persisted-model scoring replayed: the same trained-vector chain —
    // what the engine side proves extra is that the SAVED catalog
    // artifact reproduces it (round-trip require in the query)
    "qd90_persisted_model_score" ->
      Classifier.persistedScoreOracleSql(dim = 64, iters = 24, lr = 5.0,
        threshold = "0.73"),

    // the held-out walk under L2: one extra ROUND(λ·w, 10) shrink term
    // per unrolled update CTE, same split-partitioned ranks
    "qd91_l2_heldout_auc" ->
      Classifier.heldoutAucOracleSql(dim = 64, iters = 24, lr = 5.0,
        trainPct = 70, valPct = 15, l2 = "0.01"),

    // the threshold sweep + choice replayed: the qd86 cumulative chain
    // plus the 4-dp integer precision-floor compare and MIN-meeting pick
    "qd92_threshold_sweep" ->
      Classifier.sizeThresholdOracleSql(dim = 64, iters = 24, lr = 5.0,
        targetPrecision = new java.math.BigDecimal("0.9000")),

    // per-source calibration replayed: qd83's integer-bin arithmetic
    // grouped by the documents source column
    "qd93_calibration_by_source" ->
      Classifier.calibrationBySourceOracleSql(dim = 64, iters = 24,
        lr = 5.0, nBins = 10),

    // resume ≡ straight-through: the oracle is the UNSPLIT 24-iteration
    // descent — the engine's 12+12 through a persisted checkpoint must
    // hash-match it exactly
    "qd94_resume_training" ->
      Classifier.trainOracleSql(dim = 64, iters = 24, lr = 5.0),

    // PAV replayed via the minimax identity over the distinct-score
    // index (O(n²) interval means as 4-dp integers + one suffix-min
    // window per j) — rounding commutes with min/max, so it is
    // bit-equal to the engine's round-after-exact-PAV
    "qd95_isotonic_calibration" ->
      Classifier.isotonicOracleSql(dim = 64, iters = 24, lr = 5.0),

    // the interpolated-KN model replayed: bigram/context/continuation
    // tables from the en slice, the same CASE (unseen-context backoff /
    // discount-plus-interpolation) probability, 6-dp decimal NLL sums
    "qd78_kn_bigram_nll" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS w
        |  FROM documents),
        |refbg AS (
        |  SELECT bg, COUNT(*) AS cab FROM (
        |    SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
        |    FROM tok WHERE lang = 'en') GROUP BY bg),
        |ctx AS (SELECT split_part(bg, ' ', 1) AS a, CAST(SUM(cab) AS BIGINT) AS ca,
        |        CAST(COUNT(*) AS BIGINT) AS n1f FROM refbg GROUP BY 1),
        |cont AS (SELECT split_part(bg, ' ', 2) AS b, CAST(COUNT(*) AS BIGINT) AS n1b
        |         FROM refbg GROUP BY 1),
        |s0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1all FROM refbg),
        |vv AS (SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v FROM (
        |  SELECT unnest(w) AS tk FROM tok WHERE lang = 'en')),
        |docbg AS (
        |  SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
        |    FROM tok) GROUP BY doc_id, bg),
        |sc AS (
        |  SELECT d.doc_id, CAST(SUM(d.cnt) AS BIGINT) AS n_bigrams,
        |    SUM(CAST(ROUND(-ln(
        |      CASE WHEN c.ca IS NULL
        |        THEN (COALESCE(ct.n1b, 0) + 1) / CAST(s.n1all + v.v + 1 AS DOUBLE)
        |      ELSE (GREATEST(CAST(COALESCE(rb.cab, 0) AS DOUBLE) - 0.75, 0.0)
        |            + CAST(0.75 AS DOUBLE) * c.n1f
        |              * ((COALESCE(ct.n1b, 0) + 1) / CAST(s.n1all + v.v + 1 AS DOUBLE)))
        |           / CAST(c.ca AS DOUBLE) END), 6) AS DECIMAL(18,6)) * d.cnt) AS ssum
        |  FROM docbg d
        |  LEFT JOIN refbg rb USING (bg)
        |  LEFT JOIN ctx c ON c.a = split_part(d.bg, ' ', 1)
        |  LEFT JOIN cont ct ON ct.b = split_part(d.bg, ' ', 2)
        |  CROSS JOIN s0 s CROSS JOIN vv v
        |  GROUP BY d.doc_id)
        |SELECT t.doc_id, COALESCE(sc.n_bigrams, 0) AS n_bigrams,
        |  ROUND(CAST(sc.ssum AS DOUBLE) / sc.n_bigrams, 4) AS avg_nll,
        |  COALESCE(ROUND(CAST(sc.ssum AS DOUBLE) / sc.n_bigrams, 4) <= 3.44, false) AS keep
        |FROM tok t LEFT JOIN sc USING (doc_id) ORDER BY t.doc_id""".stripMargin,

    // the Zipf OLS replayed: per-source token counts, (freq DESC, token)
    // rank, 6-dp decimal ln moments summed exactly, and the identical
    // closed-form slope/intercept/r2 expressions
    "qd64_zipf_fit" ->
      """WITH cnt AS (
        |  SELECT source, tk, COUNT(*) AS freq FROM (
        |    SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tk
        |    FROM documents) GROUP BY source, tk),
        |types AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types
        |          FROM cnt GROUP BY source),
        |rk AS (
        |  SELECT source, freq,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY freq DESC, tk) AS r
        |  FROM cnt),
        |pts AS (
        |  SELECT source,
        |    CAST(ROUND(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
        |    CAST(ROUND(ln(CAST(freq AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
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
        |  FROM types t LEFT JOIN fit f USING (source)),
        |cl AS (
        |  SELECT *, n * dsxy - dsx * dsy AS num, n * dsxx - dsx * dsx AS den,
        |    n * dsyy - dsy * dsy AS deny
        |  FROM ex)
        |SELECT source, n_types, n_fit,
        |  CASE WHEN n_fit >= 2 AND abs(den) > 1e-9 THEN ROUND(num / den, 4) END AS slope,
        |  CASE WHEN n_fit >= 2 AND abs(den) > 1e-9
        |       THEN ROUND((dsy - num / den * dsx) / n, 4) END AS intercept,
        |  CASE WHEN n_fit >= 2 AND abs(den) > 1e-9 AND abs(deny) > 1e-9
        |       THEN ROUND(num * num / (den * deny), 4) END AS r2
        |FROM cl ORDER BY source""".stripMargin,

    // int4 pack/unpack replayed value-exactly: codes, −128-biased byte
    // pairs, nibble recovery via the same integer arithmetic, cosine
    "qe28_int4_fidelity" ->
      """WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |r AS (SELECT vec_id, v, list_min(v) AS mn,
        |        (list_max(v) - list_min(v)) / 15.0 AS scale FROM b),
        |q AS (SELECT vec_id, v, mn, scale,
        |  CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
        |       ELSE list_transform(v, x -> CAST(round((x - mn) / scale) AS INTEGER))
        |  END AS qv
        |  FROM r),
        |p AS (SELECT vec_id, v, mn, scale,
        |  list_transform(range(1, CAST(floor((len(qv) + 1) / 2.0) AS INTEGER) + 1),
        |    i -> qv[2*i-1] * 16 + COALESCE(qv[2*i], 0) - 128) AS packed,
        |  len(qv) AS dim
        |  FROM q),
        |u AS (SELECT vec_id, v, mn, scale, packed,
        |  list_transform(
        |    flatten(list_transform(packed, pv -> [(pv + 128) // 16, (pv + 128) % 16])),
        |    c -> c)[1:dim] AS uq
        |  FROM p),
        |d AS (SELECT vec_id, v, packed,
        |  CASE WHEN scale = 0 THEN list_transform(uq, c -> mn)
        |       ELSE list_transform(uq, c -> CAST(c AS DOUBLE) * scale + mn)
        |  END AS deq
        |  FROM u)
        |SELECT vec_id, CAST(len(packed) AS INTEGER) AS packed_bytes,
        |  ROUND(list_dot_product(v, deq)
        |    / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(deq, deq))), 6) AS fidelity
        |FROM d ORDER BY vec_id""".stripMargin,

    // the greedy longest-match walk replayed per word: each recursion
    // step consumes the longest vocab entry matching at the cursor (or
    // one UNK char); MAX(pieces) per word = its terminal piece count
    "qd31_wordpiece" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok AS token FROM toks GROUP BY tok
        |  ORDER BY COUNT(*) DESC, tok LIMIT 10),
        |words AS (
        |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS wid, tok FROM toks),
        |walk(wid, doc_id, tok, pos, pieces) AS (
        |  SELECT wid, doc_id, tok, 1, 0 FROM words
        |  UNION ALL
        |  SELECT w.wid, w.doc_id, w.tok,
        |    w.pos + GREATEST(COALESCE((SELECT MAX(len(v.token)) FROM vocab v
        |      WHERE v.token = substr(w.tok, w.pos, len(v.token))), 1), 1),
        |    w.pieces + 1
        |  FROM walk w WHERE w.pos <= len(w.tok)),
        |fin AS (SELECT doc_id, wid, MAX(pieces) AS p FROM walk GROUP BY doc_id, wid),
        |agg AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
        |    CAST(SUM(p) AS BIGINT) AS n_pieces
        |  FROM fin GROUP BY doc_id)
        |SELECT doc_id, n_words, n_pieces,
        |  ROUND(CAST(n_pieces AS DOUBLE) / GREATEST(n_words, 1), 4) AS fertility
        |FROM agg ORDER BY doc_id""".stripMargin,

    // Morton interleave mirrored term for term (duckZValue); the bucket
    // min/max IS the locality claim: ≤ 16 distinct values per dim
    "q42_zorder" ->
      s"""WITH p AS (SELECT l_partkey % 256 AS pa, l_suppkey % 256 AS sb FROM lineitem),
         |z AS (SELECT pa, sb, ${duckZValue("pa", "sb", 8)} AS zval FROM p)
         |SELECT zval >> 8 AS zbucket, COUNT(*) AS n,
         |  MIN(pa) AS min_a, MAX(pa) AS max_a, MIN(sb) AS min_b, MAX(sb) AS max_b
         |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin,
  )
}
