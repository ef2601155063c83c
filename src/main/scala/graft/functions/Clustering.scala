package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Embedding-space clustering and classification over `Array[Float]`
  * columns (k-means per Lloyd 1982; nearest-class-mean per Rocchio
  * 1971, the centroid classifier modern curation pipelines use for
  * embedding-based quality/domain filtering): a distributed element-wise vector mean (the primitive every
  * centroid computation needs), a deterministic full-corpus Lloyd's
  * k-means, a nearest-class-mean (Rocchio) classifier — the
  * embedding-side analogue of the fastText-style quality classifiers
  * used to filter pretraining corpora — and a per-source embedding
  * affinity matrix (the dense twin of `Dedup.sourceOverlap`'s n-gram
  * matrix).
  *
  * Scale shape, for every member: the corpus is touched only by (a)
  * narrow per-row projections (normalize, score — no Exchange) and (b)
  * ONE hash aggregation per pass whose partial state is k×dim doubles
  * per map task ([[VecMean]] participates in partial aggregation, so a
  * 10⁹-row group ships one dim-length sum per task, not 10⁹ rows).
  * Centroid tables are metadata (k×dim), collected and re-broadcast the
  * same way a broadcast join ships its small side. Nothing here joins
  * corpus×corpus.
  *
  * Determinism convention (oracle parity with DuckDB): centroids are
  * rounded to 6 dp at every iteration boundary — float drift from
  * partial-aggregation merge order is ~1e-13 and vanishes in the
  * rounding, so Spark and the SQL replay assign identical cells — and
  * every emitted score is `round(…, 6)` with id/label tie-breaks,
  * matching the repo-wide float convention (see SURVEY.md).
  */
object Clustering {

  /** Element-wise running sum + count. `sums` is sized lazily from the
    * first vector so one aggregator serves any dimension.
    */
  case class VecBuf(sums: Array[Double], n: Long)

  /** Element-wise mean of a vector column as a typed `Aggregator` —
    * partial-aggregation-friendly (ObjectHashAggregate partial+final):
    * each map task ships one (dim doubles, count) buffer per group, so
    * the shuffle is O(groups × dim) regardless of corpus size. The
    * in-place `sums` mutation is safe: object-buffer aggregators own
    * their deserialized buffer between serializations.
    */
  class VecMean extends Aggregator[Seq[Double], VecBuf, Seq[Double]] {
    override def zero: VecBuf = VecBuf(Array.emptyDoubleArray, 0L)
    override def reduce(b: VecBuf, a: Seq[Double]): VecBuf =
      // an empty vector carries no information: skipping it entirely
      // (not counting it in n) keeps the mean partition-independent and
      // avoids a 0-length buffer poisoning merge()
      if (a == null || a.isEmpty) b
      else {
        val s = if (b.sums.length == 0) new Array[Double](a.size) else b.sums
        require(s.length == a.size,
          s"VecMean: mixed dimensions ${s.length} vs ${a.size}")
        var i = 0
        val it = a.iterator
        while (it.hasNext) { s(i) += it.next(); i += 1 }
        VecBuf(s, b.n + 1)
      }
    override def merge(a: VecBuf, b: VecBuf): VecBuf =
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        require(a.sums.length == b.sums.length,
          s"VecMean: mixed dimensions ${a.sums.length} vs ${b.sums.length}")
        var i = 0
        while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
        VecBuf(a.sums, a.n + b.n)
      }
    override def finish(r: VecBuf): Seq[Double] =
      if (r.n == 0L) Seq.empty
      else r.sums.map(_ / r.n).toSeq
    override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** `vecMean(v)` as an untyped aggregate column. `v` must already be
    * `array<double>` (use `Similarity.asDouble`).
    */
  def vecMean(v: Column): Column =
    udaf(new VecMean, ExpressionEncoder[Seq[Double]]()).apply(v)

  /** Round every element to 6 dp with the same HALF_UP rule as
    * Spark's `round` and DuckDB's `ROUND` — the iteration-boundary
    * determinism anchor.
    */
  private[functions] def round6(xs: Seq[Double]): Array[Double] =
    xs.map(x =>
      if (x.isNaN || x.isInfinite) x
      else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    ).toArray

  /** Full-corpus Lloyd's k-means with DETERMINISTIC, replayable
    * semantics: caller-supplied initial centroids (e.g. the first k
    * vectors by id — the qe08 fixed-centroid convention; at 100 TB seed
    * from `Ivf.fit`'s sampled k-means‖ instead), a fixed iteration
    * count, squared-L2 assignment with lowest-cell tie-break
    * (`NativeExpressions.nearestCells` — the same kernel IVF assignment
    * uses, so fit and serve can never disagree), and centroids rounded
    * to 6 dp at each iteration boundary. A cell that goes empty keeps
    * its previous centroid (standard Lloyd's degeneracy handling).
    *
    * Cost: `iters` passes over `df`, each ONE narrow assignment
    * projection + ONE aggregation shuffling k×dim partials per map
    * task; the k×dim collect per iteration is index metadata, the same
    * ~100 KB a broadcast join ships. Persist `df` when it is not
    * already a cheap scan. Unlike `Ivf.fit` (MLlib k-means‖ on a
    * sample — fast, but seeded-run reproducible only), this fit is
    * bit-replayable from its inputs, which is what a data-curation
    * audit trail needs: the cluster assignment that selected a training
    * document can be re-derived exactly, engine-independently.
    *
    * Returns (cell_id, centroid, n) — centroid rounded, `n` the final
    * iteration's member count (0 for an empty cell).
    */
  def kmeansFit(df: DataFrame, vecCol: String,
      init: Array[Array[Double]], iters: Int): DataFrame = {
    require(init.nonEmpty, "kmeansFit: need at least one initial centroid")
    require(iters >= 1, "kmeansFit: iters must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    var cents: Array[Array[Double]] = init.map(_.clone())
    var counts: Array[Long] = Array.fill(init.length)(0L)
    val v = Similarity.asDouble(col(vecCol))
    for (_ <- 1 to iters) {
      // null vectors would surface as a null-cell group and NPE the
      // fold below — drop them (same posture as sourceAffinity)
      val assigned = df.filter(v.isNotNull).withColumn("_cell",
        element_at(NativeExpressions.nearestCells(v, cents, 1), 1))
      val stats = assigned.groupBy(col("_cell"))
        .agg(vecMean(v).as("_m"), count(lit(1)).as("_n"))
        .collect()
      val next = cents.map(_.clone())
      val nextN = Array.fill(cents.length)(0L)
      stats.foreach { r =>
        val cell = r.getInt(0)
        next(cell) = round6(r.getSeq[Double](1))
        nextN(cell) = r.getLong(2)
      }
      cents = next
      counts = nextN
    }
    cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq, counts(i)) }.toSeq
      .toDF("cell_id", "centroid", "n")
  }

  /** Per-class mean embeddings from labeled training rows — the "train"
    * half of the nearest-class-mean classifier. One aggregation pass,
    * fully distributed (no collect — the rounding is the Spark `round`,
    * the same HALF_UP as [[round6]]); output is (label, centroid) with
    * 6-dp-rounded centroids, k rows, label type preserved (int, long,
    * or string classes all work).
    */
  def classMeans(train: DataFrame, labelCol: String, vecCol: String): DataFrame =
    train
      .filter(col(labelCol).isNotNull &&
        Similarity.asDouble(col(vecCol)).isNotNull)
      .groupBy(col(labelCol))
      .agg(transform(vecMean(Similarity.asDouble(col(vecCol))),
        x => round(x, 6)).as("centroid"))

  /** Nearest-class-mean (Rocchio) classification: score every row
    * against each class centroid by cosine, keep the best class —
    * lowest label wins a tie. The embedding-space quality/domain
    * classifier of curation pipelines (score docs against a "high
    * quality" vs "web junk" centroid pair, keep above threshold),
    * run as a PURE narrow projection: the k×dim centroid matrix rides
    * into the expression tree as literals (broadcast-by-plan), every
    * row computes its k cosines and an argmax in place — no join, no
    * shuffle, no row growth, whole-stage-codegen-friendly
    * (plan-asserted in ClusteringSpec). Output adds `predicted` and
    * `score` (= round(cosine, 6)) columns; the predicted column keeps
    * the label column's own type (int, long, or string classes).
    */
  def nearestClassMean(df: DataFrame, vecCol: String, means: DataFrame,
      labelCol: String = "label", predictedCol: String = "predicted",
      scoreCol: String = "score"): DataFrame = {
    val raw = means.select(col(labelCol), col("centroid").cast("array<double>"))
      .collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.get(0), r.getSeq[Double](1).toArray))
    require(raw.nonEmpty, "nearestClassMean: means table is empty")
    // sorted ascending so the FIRST max (array_position) is the lowest
    // label; typed per the label column so `predicted` keeps its type
    val (m, labels: Column) = raw.head._1 match {
      case _: Int =>
        val s = raw.map { case (l, c) => (l.asInstanceOf[Int], c) }.sortBy(_._1)
        (s.map(_._2), typedlit(s.map(_._1).toSeq))
      case _: Long =>
        val s = raw.map { case (l, c) => (l.asInstanceOf[Long], c) }.sortBy(_._1)
        (s.map(_._2), typedlit(s.map(_._1).toSeq))
      case _: String =>
        val s = raw.map { case (l, c) => (l.asInstanceOf[String], c) }.sortBy(_._1)
        (s.map(_._2), typedlit(s.map(_._1).toSeq))
      case other => throw new IllegalArgumentException(
        s"nearestClassMean: unsupported label type ${other.getClass.getSimpleName}" +
          " — use int, long, or string classes")
    }
    val v = Similarity.asDouble(col(vecCol))
    val scores = array(m.map { c =>
      round(Similarity.cosine(v, typedlit(c.toSeq)), 6)
    }.toIndexedSeq: _*)
    df.withColumn("_scores", scores)
      .withColumn(scoreCol, array_max(col("_scores")))
      // array_position returns the FIRST index of the max → ties resolve
      // to the lowest label (means are label-sorted)
      .withColumn(predictedCol,
        element_at(labels,
          array_position(col("_scores"), col(scoreCol)).cast("int")))
      .drop("_scores")
  }

  /** Per-source embedding affinity matrix — the dense twin of
    * `Dedup.sourceOverlap`'s n-gram Jaccard matrix: how close two
    * corpus sources sit in embedding space, measured as the cosine
    * between their mean UNIT vectors (normalizing per document first
    * makes the mean a direction profile, not a magnitude-weighted one;
    * rows with zero/NaN norm are excluded). Answers the curation
    * question "which sources say the same things" without any
    * doc×doc work: one equi-join docs⋈embeddings, one aggregation
    * (S×dim partials), then an S×S broadcast pair join — at 100 TB the
    * corpus cost is one pass and the pair cost is S², never N².
    *
    * Output: (src_a, src_b, affinity) for src_a < src_b, 6-dp rounds
    * at the mean and score boundaries (the qd41 matrix convention).
    */
  def sourceAffinity(docs: DataFrame, docIdCol: String, srcCol: String,
      emb: DataFrame, vecIdCol: String, vecCol: String): DataFrame = {
    val v = Similarity.asDouble(col(vecCol))
    val norm2 = NativeExpressions.vecDot(col("_v"), col("_v"))
    val joined = docs.select(col(docIdCol), col(srcCol).as("_src"))
      .join(emb.select(col(vecIdCol).as(docIdCol), v.as("_v")), docIdCol)
      .filter(norm2.isNotNull && !isnan(norm2) && norm2 > 0.0)
      // materialize the norm ONCE per row before the element-wise
      // lambda: HOF bodies get no common-subexpression elimination, so
      // an inline sqrt(vecDot) would re-run the O(dim) dot per ELEMENT
      .withColumn("_n", sqrt(norm2))
      .withColumn("_nv", transform(col("_v"), x => x / col("_n")))
    val spark = docs.sparkSession
    import spark.implicits._
    val means = joined.groupBy(col("_src"))
      .agg(vecMean(col("_nv")).as("_m"))
      .collect()
      .map(r => (r.getString(0), round6(r.getSeq[Double](1)).toSeq))
      .toSeq.sortBy(_._1)
      .toDF("_src", "_m")
    val a = means.select(col("_src").as("src_a"), col("_m").as("_ma"))
    val b = means.select(col("_src").as("src_b"), col("_m").as("_mb"))
    a.crossJoin(b)
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(Similarity.cosine(col("_ma"), col("_mb")), 6).as("affinity"))
  }
}
