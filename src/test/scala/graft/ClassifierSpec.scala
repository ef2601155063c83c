package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Classifier

/** In-engine quality-classifier semantics: feature construction, one
  * hand-computed GD step, learnability on a separable fixture, replay
  * determinism, and the average-rank AUC against hand values.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def bucketOf(tok: String, dim: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    // lower 64 bits of the md5, unsigned mod (md5Bucket's contract,
    // DuckDB md5_number_lower parity — pinned in PropertySpec for ids)
    val lo = java.nio.ByteBuffer.wrap(d, 8, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    java.lang.Long.remainderUnsigned(lo, dim.toLong).toInt
  }

  test("hashedFeatures: bias + inverse-length rows per doc; bucket mass sums to ~1; bucket ids match md5Bucket") {
    val docs = Seq((1L, "a a b c"), (2L, "x")).toDF("doc_id", "text")
    val dim = 16
    val f = Classifier.hashedFeatures(docs, "doc_id", "text", dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), BigDecimal(r.getDecimal(2))))
    val d1 = f.filter(_._1 == 1L)
    // bias
    assert(d1.exists(t => t._2 == dim + 1 && t._3 == BigDecimal("1.000000")))
    // inverse length: 1/4
    assert(d1.exists(t => t._2 == dim && t._3 == BigDecimal("0.250000")))
    // bucket rows: a→2/4, b→1/4, c→1/4 at their md5 buckets
    assert(d1.exists(t => t._2 == bucketOf("a", dim) && t._3 == BigDecimal("0.500000")))
    val bowMass = d1.filter(_._2 < dim).map(_._3).sum
    assert(bowMass == BigDecimal("1.000000"))
    // every feat in range
    assert(f.forall(t => t._2 >= 0 && t._2 <= dim + 1))
  }

  test("hashedFeatureArrays kernel ≡ relational hashedFeatures(+Bigram), fixture corpus + edges (round 19)") {
    // the array kernel is what gdTrain and the batch scorers now consume;
    // flattened it must reproduce the relational featurize EXACTLY
    // (same buckets, same round(cnt/len, 6) decimals) — including on
    // empty/whitespace-only/single-token docs and real corpus text
    // doc 6: NULL text (ADVICE r19) — the relational featurize emits
    // invLen+bias rows for it (explode(null) drops only the bow block),
    // and the array path must reproduce that, not a null struct
    val edges = Seq((0L, "a a b c"), (1L, "x"), (2L, ""), (3L, "  \t "),
      (4L, "p q p q r"), (5L, (0 until 200).map(i => s"w${i % 7}").mkString(" ")),
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val corpus = graft.sources.Tables.documents(spark, sf0001).select(
      col("doc_id"), col("text"))
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), posexplode(arrays_zip(col("feats"), col("xs"))))
        .select(col("doc_id"), col("col.feats").as("feat"), col("col.xs").as("x"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), BigDecimal(r.getDecimal(2))))
        .sortBy(t => (t._1, t._2)).toSeq
    def rel(df: org.apache.spark.sql.DataFrame, u: Int, b: Int) =
      (if (b == 0) Classifier.hashedFeatures(df, "doc_id", "text", u)
       else Classifier.hashedFeaturesBigram(df, "doc_id", "text", u, b))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), BigDecimal(r.getDecimal(2))))
        .sortBy(t => (t._1, t._2)).toSeq
    for ((df, u, b) <- Seq((edges, 16, 0), (edges, 16, 32),
        (corpus, 64, 0), (corpus, 64, 128))) {
      assert(flat(Classifier.hashedFeatureArrays(df, "doc_id", "text", u, b))
        === rel(df, u, b), s"mismatch at uniDim=$u biDim=$b")
    }
  }

  test("null-text docs train and score on the array path (ADVICE r19, round 20)") {
    // gdTrain used to NPE on a labeled null-text doc (null feats Seq in
    // mapPartitions) and batch scoring emitted a null score; with the
    // invLen+bias null encoding both behave like the relational path
    val docs = Seq((1L, "a a b"), (2L, null.asInstanceOf[String]), (3L, "b c d"))
      .toDF("doc_id", "text")
    val labels = Seq((1L, true), (2L, false), (3L, true)).toDF("doc_id", "keep")
    val w = Classifier.trainHashedLogistic(docs, "doc_id", "text",
      labels, "keep", dim = 8, iters = 2, lr = 1.0)
    val scores = Classifier.scoreOnFeatureArrays(
        Classifier.hashedFeatureArrays(docs, "doc_id", "text", 8), "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(scores.size === 3 && scores.values.forall(_ != null))
  }

  test("hashedFeaturesBigram: block layout, bigram normalization, single-token docs carry no bigram rows") {
    val docs = Seq((1L, "a b a"), (2L, "x")).toDF("doc_id", "text")
    val (u, b) = (16, 32)
    val f = Classifier.hashedFeaturesBigram(docs, "doc_id", "text", u, b)
      .collect().map(r => (r.getLong(0), r.getInt(1), BigDecimal(r.getDecimal(2))))
    val d1 = f.filter(_._1 == 1L)
    // unigram block: a→2/3, b→1/3
    assert(d1.exists(t => t._2 == bucketOf("a", u) && t._3 == BigDecimal("0.666667")))
    // bigram block at offset u: "a b"(1), "b a"(1) over blen=2 → 0.5 each
    assert(d1.exists(t => t._2 == u + bucketOf("a b", b) && t._3 == BigDecimal("0.500000")))
    assert(d1.exists(t => t._2 == u + bucketOf("b a", b) && t._3 == BigDecimal("0.500000")))
    // invlen at u+b (1/3), bias at u+b+1
    assert(d1.exists(t => t._2 == u + b && t._3 == BigDecimal("0.333333")))
    assert(d1.exists(t => t._2 == u + b + 1 && t._3 == BigDecimal("1.000000")))
    // single-token doc: unigram + invlen + bias only, nothing in the bigram block
    val d2 = f.filter(_._1 == 2L)
    assert(d2.count(t => t._2 >= u && t._2 < u + b) === 0)
    assert(d2.length === 3)
  }

  test("trainHashedLogistic: one iteration from zero weights matches the hand-computed exact-decimal step") {
    // two docs, one feature dimension collision-free by construction
    val docs = Seq((1L, "a a"), (2L, "b b")).toDF("doc_id", "text")
    val labels = Seq((1L, true), (2L, false)).toDF("doc_id", "keep")
    val dim = 16
    val w = Classifier.trainHashedLogistic(docs, "doc_id", "text",
      labels, "keep", dim = dim, iters = 1, lr = 5.0).toMap
    // zero weights → margin 0 → p = 0.500000 → r = ±0.5
    // x(a in doc1) = 1.0, x(b in doc2) = 1.0; grad(a) = 1.0·(0.5−1) = −0.5
    // eta = round(5/2, 12) = 2.5; step(a) = round(2.5·(−0.5), 10) = −1.25
    val eta = BigDecimal("2.5")
    val stepA = (eta * BigDecimal("-0.5")).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    assert(w(bucketOf("a", dim)) == -stepA)
    assert(w(bucketOf("b", dim)) == stepA) // grad(b) = +0.5, symmetric
    // bias sees both docs: grad = (0.5−1) + (0.5−0) = 0 → weight stays 0
    assert(w(dim + 1) == BigDecimal(0).setScale(10))
    // inverse-length: both docs len 2 → x = 0.5 each: grad = 0.5·(−0.5) + 0.5·0.5 = 0
    assert(w(dim) == BigDecimal(0).setScale(10))
  }

  test("trainHashedLogistic learns a separable fixture; scoring separates and replays deterministically") {
    val docs = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "good solid prose here")
      else (i.toLong, "junk junk junk spam")
    }.toDF("doc_id", "text")
    val labels = (0 until 20).map(i => (i.toLong, i % 2 == 0)).toDF("doc_id", "keep")
    val w1 = Classifier.trainHashedLogistic(docs, "doc_id", "text",
      labels, "keep", dim = 32, iters = 12, lr = 5.0)
    val w2 = Classifier.trainHashedLogistic(docs, "doc_id", "text",
      labels, "keep", dim = 32, iters = 12, lr = 5.0)
    assert(w1 == w2, "replay must be bit-identical")
    val scored = Classifier.scoreHashedLogistic(docs, "doc_id", "text",
        w1, 32, new java.math.BigDecimal("0.500000"))
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getDecimal(1))).toMap
    val posMin = (0 until 20 by 2).map(i => scored(i.toLong)).min
    val negMax = (1 until 20 by 2).map(i => scored(i.toLong)).max
    assert(posMin > negMax, s"separable fixture must separate: $posMin vs $negMax")
    // perfectly separated scores → AUC exactly 1
    val auc = Classifier.binaryAuc(
      Classifier.scoreHashedLogistic(docs, "doc_id", "text", w1, 32,
        new java.math.BigDecimal("0.500000")).join(labels, "doc_id"),
      "score", "keep").collect()(0)
    assert(auc.getDouble(0) === 1.0)
    assert(auc.getLong(1) === 10L && auc.getLong(2) === 10L)
  }

  test("GD iteration plan (round 19): kernel margin + partition-local gradient — ZERO Exchange above the cache") {
    // the round-18 form paid, per iteration, a broadcast weight join +
    // a decimal margin window + a (dim+2)-key gradient shuffle; the
    // array restructure makes each iteration one narrow pass over the
    // cached per-doc frame — no exchange, no join, no window
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "c d"), (3L, "a a")).toDF("doc_id", "text")
    val labels = Seq((1L, true), (2L, false), (3L, true)).toDF("doc_id", "keep")
    val feats = Classifier.hashedFeatureArrays(docs, "doc_id", "text", 16)
      .join(labels.select(col("doc_id"),
        when(col("keep"), lit(1)).otherwise(lit(0))
          .cast(DecimalType(8, 6)).as("__y")), Seq("doc_id"))
      .repartition(col("doc_id"))
      .select(col("feats"), col("xs"), col("__y"))
      .persist()
    feats.count()
    val wArr = Array.fill(18)(java.math.BigDecimal.ZERO.setScale(10))
    val iter = feats.select(col("feats"), col("xs"),
        (graft.functions.NativeExpressions
          .decimalDot(col("feats"), col("xs"), wArr) - col("__y").cast("double"))
          .as("__r"))
      .as[(Seq[Int], Seq[java.math.BigDecimal], Double)]
      .mapPartitions(it => Iterator.single(it.size))
    val plan = iter.queryExecution.executedPlan.toString
      .split("InMemoryRelation")(0)
    assert(!plan.contains("Exchange"),
      s"iteration must run exchange-free above the cache:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"no window, no join in the iteration plan:\n$plan")
    feats.unpersist()
  }

  test("narrowScore (serving path) tracks the exact scorer within the feature-rounding bound") {
    val docs = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "good solid prose here and more words")
      else (i.toLong, "junk junk junk spam spam")
    }.toDF("doc_id", "text")
    val labels = (0 until 20).map(i => (i.toLong, i % 2 == 0)).toDF("doc_id", "keep")
    val w = Classifier.trainHashedLogistic(docs, "doc_id", "text",
      labels, "keep", dim = 32, iters = 12, lr = 5.0)
    val exact = Classifier.scoreHashedLogistic(docs, "doc_id", "text",
        w, 32, new java.math.BigDecimal("0.500000"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    val narrow = docs.select(col("doc_id"),
        Classifier.narrowScore(col("text"), w, 32).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    exact.foreach { case (id, e) =>
      assert(math.abs(e - narrow(id)) <= 1e-4,
        s"doc $id: exact $e vs narrow ${narrow(id)}")
    }
    // and the narrow plan is genuinely narrow: zero Exchange
    val plan = docs.select(Classifier.narrowScore(col("text"), w, 32))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"narrow scorer shuffled:\n$plan")
  }

  test("calibrationReport/Metrics: hand-computed bins, ECE and Brier; score 1.0 clamps to the top bin") {
    val rows = Seq((0.95, true), (0.85, true), (0.85, false), (0.05, false))
      .toDF("s", "y")
      .select(col("s").cast(DecimalType(8, 6)).as("s"), col("y"))
    val rep = Classifier.calibrationReport(rows, "s", "y", nBins = 10)
      .orderBy("bin").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(rep(0) === ((1L, 0L, 0.05, 0.0)))
    assert(rep(8) === ((2L, 1L, 0.85, 0.5)))
    assert(rep(9) === ((1L, 1L, 0.95, 1.0)))
    val m = Classifier.calibrationMetrics(rows, "s", "y", nBins = 10).collect()(0)
    // ECE = (1·|0−.05| + 2·|.5−.85| + 1·|1−.95|)/4 = 0.2
    assert(m.getDouble(0) === 0.2)
    // Brier = (.0025 + .0225 + .7225 + .0025)/4 = 0.1875
    assert(m.getDouble(1) === 0.1875)
    assert(m.getLong(2) === 4L)
    // exact top score lands in the last bin, not past it
    val one = Seq((1.0, true)).toDF("s", "y")
      .select(col("s").cast(DecimalType(8, 6)).as("s"), col("y"))
    val b = Classifier.calibrationReport(one, "s", "y", nBins = 10).collect()(0)
    assert(b.getInt(0) === 9 && b.getDouble(3) === 1.0)
  }

  test("binaryAucBy: per-group AUC equals binaryAuc run on each slice; ranks never cross groups") {
    val rows = Seq(("a", 0.9, true), ("a", 0.8, true), ("a", 0.8, false), ("a", 0.1, false),
        ("b", 0.3, true), ("b", 0.7, false), ("b", 0.5, true))
      .toDF("g", "s", "y")
      .select(col("g"), col("s").cast(DecimalType(8, 6)).as("s"), col("y"))
    val by = Classifier.binaryAucBy(rows, "s", "y", "g").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    Seq("a", "b").foreach { g =>
      val solo = Classifier.binaryAuc(rows.filter(col("g") === g), "s", "y")
        .collect()(0)
      val exp = if (solo.isNullAt(0)) None else Some(solo.getDouble(0))
      assert(by(g) === exp, s"group $g")
    }
    assert(by("a") === Some(0.875))
  }

  test("prCurve/averagePrecision: hand-computed thresholds, sklearn step-sum AP, degenerate inputs") {
    def mk(rows: Seq[(Double, Boolean)]) =
      rows.toDF("s", "y").select(col("s").cast(DecimalType(8, 6)).as("s"), col("y"))
    val df = mk(Seq((0.9, true), (0.8, false), (0.7, true), (0.6, false)))
    val curve = Classifier.prCurve(df, "s", "y").orderBy(col("score").desc)
      .collect().map(r => (r.getDecimal(0).doubleValue(), r.getLong(1),
        r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(curve.toSeq === Seq(
      (0.9, 1L, 0L, 1.0, 0.5),
      (0.8, 1L, 1L, 0.5, 0.5),
      (0.7, 2L, 1L, 0.6667, 1.0),
      (0.6, 2L, 2L, 0.5, 1.0)))
    val ap = Classifier.averagePrecision(df, "s", "y").collect()(0)
    // AP = 1·(1/2) + 0 + (2/3)·(1/2) + 0 = 0.5 + 0.33333333 (1e-8 half-up)
    assert(ap.getDouble(0) === 0.83333333)
    assert(ap.getLong(1) === 2L && ap.getLong(2) === 2L)
    // perfect ranking → AP 1.0
    val perfect = Classifier.averagePrecision(
      mk(Seq((0.9, true), (0.8, true), (0.2, false))), "s", "y").collect()(0)
    assert(perfect.getDouble(0) === 1.0)
    // single-class (no positives) → NULL ap
    val mono = Classifier.averagePrecision(
      mk(Seq((0.3, false), (0.7, false))), "s", "y").collect()(0)
    assert(mono.isNullAt(0) && mono.getLong(1) === 0L)
  }

  test("binaryAuc: average-rank tie handling, degenerate inputs") {
    def auc(rows: Seq[(Double, Boolean)]): org.apache.spark.sql.Row =
      Classifier.binaryAuc(
        rows.toDF("s", "y").select(
          col("s").cast(DecimalType(8, 6)).as("s"), col("y")),
        "s", "y").collect()(0)
    // ties across classes: scores .9(+) .8(+) .8(−) .1(−)
    // ranks: .1→1, .8→2.5 each, .9→4 → U = (4+2.5) − 3 = 3.5 → AUC 0.875
    val tied = auc(Seq((0.9, true), (0.8, true), (0.8, false), (0.1, false)))
    assert(tied.getDouble(0) === 0.875)
    // all-identical scores → AUC exactly 0.5 at any class mix
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, false))).getDouble(0) === 0.5)
    // anti-separation → 0
    assert(auc(Seq((0.1, true), (0.9, false))).getDouble(0) === 0.0)
    // single-class input → NULL auc, counts still reported
    val mono = auc(Seq((0.3, true), (0.7, true)))
    assert(mono.isNullAt(0) && mono.getLong(1) === 2L && mono.getLong(2) === 0L)
  }

  test("sigmoid6 discipline: scoring pins hand-computed 6-dp values and saturates exactly") {
    // drive the IEEE-pinned sigmoid through scoreOnFeatures with a
    // one-feature frame: margin = w·x, so the score IS sigmoid6(margin)
    def scoreAt(w: BigDecimal): BigDecimal = {
      val feats = Seq((1L, 0, new java.math.BigDecimal("1.000000")))
        .toDF("doc_id", "feat", "x")
        .select(col("doc_id"), col("feat"),
          col("x").cast(DecimalType(10, 6)).as("x"))
      val r = Classifier.scoreOnFeatures(feats, "doc_id", Seq(0 -> w))
        .collect()(0)
      BigDecimal(r.getDecimal(1))
    }
    assert(scoreAt(BigDecimal(0)) == BigDecimal("0.500000"))
    // sigmoid(1.25) = 0.7772998... → floor(·1e6 + 0.5) = 777300
    assert(scoreAt(BigDecimal("1.25")) == BigDecimal("0.777300"))
    assert(scoreAt(BigDecimal("-1.25")) == BigDecimal("0.222700"))
    // saturation: the 6-dp grid clamps to exactly 1 / 0, never beyond
    assert(scoreAt(BigDecimal(40)) == BigDecimal("1.000000"))
    assert(scoreAt(BigDecimal(-40)) == BigDecimal("0.000000"))
  }

  test("scoreAsDouble / weightAsDouble expose DECIMALs as exact float64") {
    val df = Seq(("0.777300", "-1.6817500000"), ("0.000001", "0.0000000001"))
      .toDF("s", "w")
      .select(col("s").cast(DecimalType(8, 6)).as("s"),
        col("w").cast(DecimalType(20, 10)).as("w"))
    val rows = df.select(Classifier.scoreAsDouble(col("s")).as("sd"),
      Classifier.weightAsDouble(col("w")).as("wd")).collect()
    // scaled-int → one IEEE division: both engines emit this exact double
    assert(rows(0).getDouble(0) === 777300L.toDouble / 1000000.0)
    assert(rows(0).getDouble(1) === -16817500000L.toDouble / 1.0e10)
    assert(rows(1).getDouble(0) === 1L.toDouble / 1000000.0)
    assert(rows(1).getDouble(1) === 1L.toDouble / 1.0e10)
  }

  test("L2 weight decay: two hand-computed iterations; l2=0 is identical to the plain trainer") {
    val docs = Seq((1L, "a a"), (2L, "b b")).toDF("doc_id", "text")
    val labels = Seq((1L, true), (2L, false)).toDF("doc_id", "keep")
    val dim = 16
    // iter 1 (w=0, shrink over w=0 is 0): w(a) = 1.25, w(b) = −1.25
    // iter 2: m(doc1)=1.25 → p=0.777300, r=−0.222700; g(a)=−0.2227
    //   step(a) = round(2.5·−0.2227, 10) = −0.55675
    //   shrink(a) = round(0.1·1.25, 10) = 0.125
    //   w(a) = 1.25 + 0.55675 − 0.125 = 1.68175 (symmetric for b)
    val w = Classifier.trainHashedLogistic(docs, "doc_id", "text",
      labels, "keep", dim = dim, iters = 2, lr = 5.0,
      l2 = BigDecimal("0.1")).toMap
    assert(w(bucketOf("a", dim)) == BigDecimal("1.6817500000"))
    assert(w(bucketOf("b", dim)) == BigDecimal("-1.6817500000"))
    // and without decay the same steps land at 1.80675
    val w0 = Classifier.trainHashedLogistic(docs, "doc_id", "text",
      labels, "keep", dim = dim, iters = 2, lr = 5.0).toMap
    assert(w0(bucketOf("a", dim)) == BigDecimal("1.8067500000"))
    // l2 = 0 must be the plain trainer bit-for-bit
    val wz = Classifier.trainHashedLogistic(docs, "doc_id", "text",
      labels, "keep", dim = dim, iters = 2, lr = 5.0, l2 = BigDecimal(0))
    assert(wz.toMap == w0)
  }

  test("train-once memo: same key returns the cached vector; params are part of the key") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val labels = Seq((1L, true), (2L, false)).toDF("doc_id", "keep")
    val k = s"memo-spec-${System.nanoTime()}"
    val w1 = Classifier.trainHashedLogisticMemo(k, docs, "doc_id", "text",
      labels, "keep", dim = 16, iters = 2, lr = 5.0)
    val w2 = Classifier.trainHashedLogisticMemo(k, docs, "doc_id", "text",
      labels, "keep", dim = 16, iters = 2, lr = 5.0)
    assert(w1 eq w2, "second call must return the memoized artifact")
    // a different iter count is a different model, never a false hit
    val w3 = Classifier.trainHashedLogisticMemo(k, docs, "doc_id", "text",
      labels, "keep", dim = 16, iters = 3, lr = 5.0)
    assert(!(w3 eq w1) && w3 != w1)
    // the TRAIN query's Seed variant retrains (fresh object) and its
    // artifact is what subsequent memo reads return
    val ws = Classifier.trainHashedLogisticSeed(k, docs, "doc_id", "text",
      labels, "keep", dim = 16, iters = 2, lr = 5.0)
    assert(!(ws eq w1) && ws == w1, "retrain must be fresh and bit-identical")
    val w4 = Classifier.trainHashedLogisticMemo(k, docs, "doc_id", "text",
      labels, "keep", dim = 16, iters = 2, lr = 5.0)
    assert(w4 eq ws, "memo must serve the seeded artifact")
  }

  test("ModelStore: save/load round-trip is exact; versions append; latest wins; missing model fails loudly") {
    import graft.ops.ModelStore
    val tbl = s"clf_spec_models_${System.nanoTime()}"
    val v1Weights = Seq(0 -> BigDecimal("1.6817500000"),
      1 -> BigDecimal("-0.0000000001"), 2 -> BigDecimal(0).setScale(10))
    val v1 = ModelStore.save(spark, "m", v1Weights, tbl)
    assert(v1 === 1)
    // exact-decimal round trip: load ≡ saved, feat-ordered
    assert(ModelStore.load(spark, "m", Some(1), tbl) == v1Weights)
    // append a second version; latest wins, v1 still addressable
    val v2Weights = Seq(0 -> BigDecimal("2.0000000000"))
    assert(ModelStore.save(spark, "m", v2Weights, tbl) === 2)
    assert(ModelStore.latestVersion(spark, "m", tbl) === Some(2))
    assert(ModelStore.load(spark, "m", None, tbl) == v2Weights)
    assert(ModelStore.load(spark, "m", Some(1), tbl) == v1Weights)
    // versions are per model name
    assert(ModelStore.save(spark, "other", v2Weights, tbl) === 1)
    val fresh = ModelStore.freshness(spark, tbl).collect()
    assert(fresh.map(r => (r.getString(0), r.getInt(1), r.getLong(3))).toSeq ==
      Seq(("m", 2, 2L), ("other", 1, 1L)))
    // serving must fail loudly on a missing artifact
    intercept[IllegalStateException] {
      ModelStore.load(spark, "nope", None, tbl)
    }
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("warm-start resume: 6+6 through a checkpoint is bit-identical to the straight 12; init is respected") {
    val docs = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "good solid prose here")
      else (i.toLong, "junk junk junk spam")
    }.toDF("doc_id", "text")
    val labels = (0 until 20).map(i => (i.toLong, i % 2 == 0)).toDF("doc_id", "keep")
    val straight = Classifier.trainHashedLogistic(docs, "doc_id", "text",
      labels, "keep", dim = 32, iters = 12, lr = 5.0)
    val half = Classifier.trainHashedLogistic(docs, "doc_id", "text",
      labels, "keep", dim = 32, iters = 6, lr = 5.0)
    val resumed = Classifier.trainHashedLogisticFrom(half, docs, "doc_id",
      "text", labels, "keep", dim = 32, iters = 6, lr = 5.0)
    assert(resumed == straight,
      "resume through a checkpoint must be bit-identical to straight-through")
    // a sparse init pads missing features with zero and is actually used:
    // one iteration from a nonzero single-feature init differs from the
    // one-iteration cold start at exactly that feature's influence
    val cold = Classifier.trainHashedLogistic(docs, "doc_id", "text",
      labels, "keep", dim = 32, iters = 1, lr = 5.0).toMap
    val warm = Classifier.trainHashedLogisticFrom(
      Seq(33 -> BigDecimal("1.0000000000")), // feat 33 = bias (dim+1)
      docs, "doc_id", "text", labels, "keep",
      dim = 32, iters = 1, lr = 5.0).toMap
    assert(warm != cold, "a nonzero init must change the descent")
    // out-of-range init features fail loudly
    intercept[IllegalArgumentException] {
      Classifier.trainHashedLogisticFrom(Seq(34 -> BigDecimal(1)),
        docs, "doc_id", "text", labels, "keep", dim = 32, iters = 1, lr = 5.0)
    }
  }

  test("sizeThreshold: hand-computed sweep, minimal meeting threshold chosen, serving under the choice matches the winning row") {
    def sweep(target: String) = Classifier.sizeThreshold(
      Seq((0.9, true), (0.8, true), (0.8, false), (0.1, false))
        .toDF("s", "y")
        .select(col("s").cast(DecimalType(8, 6)).as("s"), col("y")),
      "s", "y", new java.math.BigDecimal(target))
    // thresholds desc: 0.9 → tp1/al1 p4=10000; 0.8 → tp2/al3
    // p4=(2·2·10⁴+3)//6=6667; 0.1 → tp2/al4 p4=5000
    val rows = sweep("0.66")
      .select(col("threshold").cast("double"), col("tp"), col("fp"),
        col("precision"), col("recall"), col("meets_target"), col("chosen"))
      .orderBy(col("threshold").desc)
      .as[(Double, Long, Long, Double, Double, Boolean, Boolean)]
      .collect().toSeq
    assert(rows.map(r => (r._1, r._2, r._3, r._4, r._6)) === Seq(
      (0.9, 1L, 0L, 1.0, true),
      (0.8, 2L, 1L, 0.6667, true),
      (0.1, 2L, 2L, 0.5, false)))
    // chosen = MINIMAL meeting threshold (max recall under the floor)
    assert(rows.filter(_._7).map(_._1) === Seq(0.8))
    assert(Classifier.chosenThreshold(sweep("0.66"))
      .compareTo(new java.math.BigDecimal("0.800000")) === 0)
    // a tighter floor moves the choice up
    assert(Classifier.chosenThreshold(sweep("0.8"))
      .compareTo(new java.math.BigDecimal("0.900000")) === 0)
    // serving under the chosen threshold reproduces the winning row's
    // confusion counts exactly — the loop is closed, not approximated
    val tau = Classifier.chosenThreshold(sweep("0.66"))
    val served = Seq((0.9, true), (0.8, true), (0.8, false), (0.1, false))
      .toDF("s", "y")
      .select(col("s").cast(DecimalType(8, 6)).as("s"), col("y"))
      .filter(col("s") >= lit(tau).cast(DecimalType(8, 6)))
    assert(served.count() === 3L)
    assert(served.filter(col("y")).count() === 2L) // tp of the winning row
    // unreachable floor (the top score is a false positive, so NO
    // threshold reaches 0.9 precision): sweep chooses nothing, the
    // reader refuses — no silent fallback operating point
    val noMeet = Classifier.sizeThreshold(
      Seq((0.9, false), (0.8, true), (0.1, false)).toDF("s", "y")
        .select(col("s").cast(DecimalType(8, 6)).as("s"), col("y")),
      "s", "y", new java.math.BigDecimal("0.9"))
    assert(noMeet.filter(col("chosen")).count() === 0L)
    intercept[IllegalArgumentException] {
      Classifier.chosenThreshold(noMeet)
    }
  }

  test("isotonicCalibrate: hand-computed PAV pools, monotone output, mass preserved, calibration improves") {
    def iso(rows: Seq[(Double, Boolean)]): Seq[(Double, Long, Long, Double)] =
      Classifier.isotonicCalibrate(
        rows.toDF("s", "y").select(
          col("s").cast(DecimalType(8, 6)).as("s"), col("y")),
        "s", "y")
        .select(col("score").cast("double"), col("n"), col("n_pos"),
          col("calibrated"))
        .orderBy(col("score"))
        .as[(Double, Long, Long, Double)].collect().toSeq
    // hand fixture: ascending means 0,1,0,1 → PAV pools the middle
    // violator pair into 0.5: iso = [0, 0.5, 0.5, 1]
    val r = iso(Seq((0.1, false), (0.2, true), (0.3, false), (0.4, true)))
    assert(r.map(_._4) === Seq(0.0, 0.5, 0.5, 1.0))
    // weighted violator pooling: (0.1: 3 neg), (0.2: 2 of 2 pos),
    // (0.3: 0 of 1) → pool(0.2, 0.3) = 2/3 → 0.6667 half-up at 4 dp
    val r2 = iso(Seq((0.1, false), (0.1, false), (0.1, false),
      (0.2, true), (0.2, true), (0.3, false)))
    assert(r2.map(_._4) === Seq(0.0, 0.6667, 0.6667))
    // already-isotonic input is untouched (identity on sorted means)
    val r3 = iso(Seq((0.2, false), (0.5, true), (0.5, false), (0.9, true)))
    assert(r3.map(_._4) === Seq(0.0, 0.5, 1.0))
    // properties on a trained fixture: monotone non-decreasing and
    // label mass preserved (Σ n·iso = Σ pos, a PAV invariant — here in
    // 4-dp arithmetic, so compare at 4-dp tolerance per block)
    val docs = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "good solid prose here")
      else (i.toLong, "junk junk junk spam")
    }.toDF("doc_id", "text")
    val labels = (0 until 20).map(i => (i.toLong, i % 2 == 0)).toDF("doc_id", "keep")
    val w = Classifier.trainHashedLogistic(docs, "doc_id", "text",
      labels, "keep", dim = 32, iters = 12, lr = 5.0)
    val scored = Classifier.scoreHashedLogistic(docs, "doc_id", "text",
        w, 32, new java.math.BigDecimal("0.500000"))
      .join(labels, "doc_id")
    val m = Classifier.isotonicCalibrate(scored, "score", "keep")
      .select(col("score").cast("double"), col("n"), col("n_pos"),
        col("calibrated"))
      .orderBy(col("score")).as[(Double, Long, Long, Double)].collect().toSeq
    m.sliding(2).foreach { case Seq(a, b) =>
      assert(a._4 <= b._4, s"isotonic output must be monotone: $m")
    }
    val mass = m.map(x => x._2 * x._4).sum
    val pos = m.map(_._3).sum
    assert(math.abs(mass - pos) <= m.length * 0.00005 * m.map(_._2).max,
      s"PAV must preserve label mass: $mass vs $pos")
    // remapped scores calibrate at least as well as the raw ones
    val mapped = scored.join(
        Classifier.isotonicCalibrate(scored, "score", "keep")
          .select(col("score"), col("calibrated")), Seq("score"))
      .select(col("calibrated").cast(DecimalType(8, 6)).as("cs"), col("keep"))
    val rawEce = Classifier.calibrationMetrics(scored, "score", "keep")
      .select(col("ece")).as[Double].head()
    val isoEce = Classifier.calibrationMetrics(mapped, "cs", "keep")
      .select(col("ece")).as[Double].head()
    assert(isoEce <= rawEce, s"isotonic must not worsen ECE: $isoEce vs $rawEce")
  }

  test("calibrationMetricsBy: per-group ECE/Brier equals calibrationMetrics run on each slice") {
    val df = Seq(
      ("a", 0.9, true), ("a", 0.8, true), ("a", 0.3, false), ("a", 0.2, false),
      ("b", 0.9, false), ("b", 0.7, false), ("b", 0.4, true))
      .toDF("g", "s", "y")
      .select(col("g"), col("s").cast(DecimalType(8, 6)).as("s"), col("y"))
    val by = Classifier.calibrationMetricsBy(df, "s", "y", "g")
      .orderBy(col("g"))
      .as[(String, Double, Double, Long)].collect().toSeq
    for ((g, ece, brier, n) <- by) {
      val solo = Classifier.calibrationMetrics(df.filter(col("g") === g), "s", "y")
        .as[(Double, Double, Long)].collect()(0)
      assert((ece, brier, n) === solo, s"group $g")
    }
    assert(by.map(_._1) === Seq("a", "b"))
  }
}
