package graft

import org.apache.spark.sql.functions._
import graft.functions.{Clustering, Similarity}

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def sse(df: org.apache.spark.sql.DataFrame, vecCol: String,
      cents: Array[Array[Double]]): Double = {
    val v = Similarity.asDouble(col(vecCol))
    df.withColumn("_cell",
        element_at(graft.functions.NativeExpressions.nearestCells(v, cents, 1), 1))
      .withColumn("_c", element_at(typedlit(cents.map(_.toSeq).toSeq), col("_cell") + 1))
      .withColumn("_d2",
        graft.functions.NativeExpressions.vecDot(v, v)
          - lit(2.0) * graft.functions.NativeExpressions.vecDot(v, col("_c"))
          + graft.functions.NativeExpressions.vecDot(col("_c"), col("_c")))
      .agg(sum(col("_d2"))).head.getDouble(0)
  }

  private def centMatrix(fit: org.apache.spark.sql.DataFrame): Array[Array[Double]] =
    fit.orderBy("cell_id").collect()
      .map(_.getSeq[Double](1).toArray)

  test("VecMean matches the posexplode reference") {
    val df = (0 until 200)
      .map(i => (i % 3, Seq.tabulate(8)(j => math.sin(i * 31 + j).toDouble)))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(Clustering.vecMean(col("v")).as("m"))
      .select(col("g"), posexplode(col("m")).as(Seq("i", "x")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val want = df.select(col("g"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy("g", "i").agg(avg(col("x")).as("x"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, x) =>
      assert(math.abs(x - want(k)) < 1e-12, s"$k: $x vs ${want(k)}") }
  }

  test("kmeansFit: SSE is non-increasing across iterations (up to the 6-dp rounding)") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001).cache()
    val init = Similarity.Ivf.centroidMatrix(
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cell_id"),
          col("embedding").cast("array<double>").as("centroid")))
    val fits = (1 to 3).map(it =>
      centMatrix(Clustering.kmeansFit(emb, "embedding", init, iters = it)))
    val sses = (Seq(init) ++ fits).map(m => sse(emb, "embedding", m))
    sses.sliding(2).foreach { case Seq(a, b) =>
      // 6-dp centroid rounding can move SSE by at most ~dim·2·|v|·5e-7
      assert(b <= a + 1e-3, s"SSE increased: $sses")
    }
    // and the fit actually moved: one Lloyd step must beat the raw seeds
    assert(sses(1) < sses(0) * 0.99, s"no improvement: $sses")
    emb.unpersist()
  }

  test("kmeansFit: an empty cell keeps its previous centroid, n=0") {
    val pts = Seq.tabulate(50)(i =>
      (i.toLong, Seq(10.0 + (i % 5) * 0.01, 10.0))).toDF("id", "v")
    // seed 0 sits on the data; seed 1 is far away and captures nothing
    val far = Array(-1000.0, -1000.0)
    val fit = Clustering.kmeansFit(pts, "v", Array(Array(10.0, 10.0), far), iters = 2)
      .orderBy("cell_id").collect()
    assert(fit(0).getLong(2) === 50L)
    assert(fit(1).getLong(2) === 0L)
    assert(fit(1).getSeq[Double](1) === far.toSeq)
  }

  test("nearestClassMean: perfectly separable clusters classify exactly; ties take the lowest label") {
    val train = (0 until 90).map { i =>
      val c = i % 3
      (i.toLong, c, Seq(c * 10.0 + (i % 7) * 0.01, (2 - c) * 10.0))
    }.toDF("id", "label", "v")
    val test_ = Seq((100L, 0, Seq(0.02, 20.0)), (101L, 1, Seq(10.0, 10.03)),
      (102L, 2, Seq(20.0, 0.01))).toDF("id", "label", "v")
    val means = Clustering.classMeans(train, "label", "v")
    val out = Clustering.nearestClassMean(test_, "v", means)
      .select("id", "label", "predicted").collect()
    out.foreach(r => assert(r.getInt(1) === r.getInt(2), r.toString))
    // tie: two identical class means → the lowest label must win
    val tied = Seq((0, Seq(1.0, 0.0)), (1, Seq(1.0, 0.0))).toDF("label", "centroid")
    val t = Clustering.nearestClassMean(Seq((0L, Seq(2.0, 0.0))).toDF("id", "v"),
      "v", tied).select("predicted").head.getInt(0)
    assert(t === 0)
  }

  test("nearestClassMean scoring plans as a narrow map: no Exchange, no Join, no Window") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(200)
    val means = Clustering.classMeans(emb, "label", "embedding")
    val plan = Clustering.nearestClassMean(emb, "embedding", means)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("sourceAffinity: full upper triangle, bounded scores, identical sources score 1") {
    val docs = (0L until 40L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    // src0 and src2 get identical direction profiles → affinity 1.0
    val emb = (0L until 40L).map { i =>
      val g = (i % 4).toInt
      val dir = if (g == 2) 0 else g
      (i, Seq.tabulate(4)(j => if (j == dir) 2.0 + (i % 3) else 0.0))
    }.toDF("vec_id", "embedding")
    val out = Clustering.sourceAffinity(docs, "doc_id", "source", emb, "vec_id", "embedding")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out.size === 6, out)
    out.values.foreach(x => assert(x >= -1.0001 && x <= 1.0001, out))
    assert(math.abs(out(("src0", "src2")) - 1.0) < 1e-6, out)
    assert(out(("src0", "src1")) < 0.01, out)
  }

  test("kmeansFit and classMeans are partitioning-invariant: 6-dp rounding absorbs merge-order drift") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001).cache()
    val init = Similarity.Ivf.centroidMatrix(
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cell_id"),
          col("embedding").cast("array<double>").as("centroid")))
    val one = Clustering.kmeansFit(emb.repartition(1), "embedding", init, iters = 2)
      .orderBy("cell_id").collect().map(r => (r.getInt(0), r.getSeq[Double](1), r.getLong(2)))
    val many = Clustering.kmeansFit(emb.repartition(7, col("vec_id")),
        "embedding", init, iters = 2)
      .orderBy("cell_id").collect().map(r => (r.getInt(0), r.getSeq[Double](1), r.getLong(2)))
    assert(one.toSeq === many.toSeq,
      "kmeansFit differs across partitionings — the determinism contract is broken")
    val m1 = Clustering.classMeans(emb.repartition(1), "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    val m7 = Clustering.classMeans(emb.repartition(7, col("label")), "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    assert(m1 === m7,
      "classMeans differs across partitionings — the determinism contract is broken")
    emb.unpersist()
  }

  test("VecMean skips empty vectors entirely — they neither crash merge nor dilute the mean") {
    // the empty row isolated in its own partition exercises the
    // 0-length-buffer merge path; co-partitioned it exercises dilution
    val df = Seq((0, Seq(2.0, 4.0)), (0, Seq(4.0, 8.0)), (0, Seq.empty[Double]))
      .toDF("g", "v")
    Seq(df.repartition(3), df.repartition(1)).foreach { d =>
      val m = d.groupBy("g").agg(Clustering.vecMean(col("v")).as("m"))
        .head.getSeq[Double](1)
      assert(m === Seq(3.0, 6.0), s"empty vector affected the mean: $m")
    }
  }

  test("classMeans + nearestClassMean work with STRING class labels") {
    val train = Seq(
      ("good", Seq(1.0, 0.0)), ("good", Seq(1.0, 0.02)),
      ("junk", Seq(0.0, 1.0)), ("junk", Seq(0.02, 1.0))
    ).toDF("label", "v")
    val means = Clustering.classMeans(train, "label", "v")
    val out = Clustering.nearestClassMean(
        Seq((1L, Seq(0.9, 0.01)), (2L, Seq(0.01, 0.9))).toDF("id", "v"),
        "v", means)
      .select("id", "predicted").as[(Long, String)].collect().toMap
    assert(out(1L) === "good")
    assert(out(2L) === "junk")
  }

  test("sourceAffinity drops zero-norm vectors instead of poisoning the mean") {
    val docs = Seq((0L, "a"), (1L, "a"), (2L, "b")).toDF("doc_id", "source")
    val emb = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val out = Clustering.sourceAffinity(docs, "doc_id", "source", emb, "vec_id", "embedding")
      .collect()
    assert(out.length === 1)
    assert(math.abs(out(0).getDouble(2) - 1.0) < 1e-6, out.mkString(","))
  }
}
