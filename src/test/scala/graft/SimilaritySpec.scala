package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Similarity-search invariants: cosine math, brute-force top-k vs k-NN
  * join agreement, SRP-LSH bucket collision for identical vectors.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // near 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),  // opposite of 0
    (4L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // identical to 0
  ).toDF("vec_id", "embedding")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val c = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(
          Similarity.asDouble(col("a.embedding")),
          Similarity.asDouble(col("b.embedding"))).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(c((0L, 4L)) - 1.0) < 1e-12)
    assert(math.abs(c((0L, 2L))) < 1e-12)
    assert(math.abs(c((0L, 3L)) + 1.0) < 1e-12)
  }

  test("native vecDot matches the zip_with+aggregate formulation exactly") {
    import org.apache.spark.sql.functions.{aggregate, lit, zip_with}
    val both = graft.sources.Tables.embeddings(spark, sf0001).limit(50)
      .select(Similarity.asDouble(col("embedding")).as("v"))
      .select(
        Similarity.dot(col("v"), col("v")).as("native"),
        aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
          lit(0.0d), (acc, v) => acc + v).as("hof"))
      .as[(Double, Double)].collect()
    assert(both.forall { case (n, h) => n == h })
  }

  test("topKCosine ranks identical > near > orthogonal > opposite") {
    val got = Similarity.topKCosine(
      vecs.filter(col("vec_id") =!= 0), "vec_id", "embedding",
      vecs.filter(col("vec_id") === 0), "embedding", k = 4)
      .select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(4L, 1L, 2L, 3L))
  }

  test("knnJoin agrees with brute-force top-k for each query") {
    val knn = Similarity.knnJoin(vecs.filter(col("vec_id") < 2), vecs,
      "vec_id", "embedding", k = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(knn === Set((0L, 4L, 1), (0L, 1L, 2), (1L, 0L, 1), (1L, 4L, 2)))
  }

  test("SRP-LSH: identical vectors share a bucket; ANN finds the identical twin") {
    val b = Similarity.withSrpBucket(vecs, "embedding", nPlanes = 8, dim = 4)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(b(0L) === b(4L))
    val ann = Similarity.annLshJoin(vecs.filter(col("vec_id") === 0), vecs,
      "vec_id", "embedding", k = 1, nPlanes = 8, dim = 4)
      .select("neighbor_id").as[Long].collect()
    assert(ann.toSeq === Seq(4L))
  }

  test("IVF: fit/assign/search finds the identical twin through its cell") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(200)
    val centroids = Similarity.Ivf.fit(emb, "embedding", nCells = 4)
    assert(centroids.count() === 4)
    val assigned = Similarity.Ivf.assign(emb, "embedding", centroids)
    assert(assigned.select("cell_id").distinct().count() <= 4)
    assert(assigned.count() === 200)
    // a vector searched against the corpus must find itself excluded and
    // its nearest neighbor ranked 1 — compare against brute force
    val queries = emb.filter(col("vec_id") < 3)
    val ivf = Similarity.Ivf.search(queries, emb, "vec_id", "embedding",
      centroids, k = 1, nProbe = 4) // nProbe=all cells ⇒ exact
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val brute = Similarity.knnJoin(queries, emb, "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(ivf === brute)
  }

  test("annRecallProbe: all-cells probe reads 1.0; a planted out-of-probe neighbor reads the miss") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(200)
    val centroids = Similarity.Ivf.fit(emb, "embedding", nCells = 4)
    val queries = emb.filter(col("vec_id") < 3)
    // nProbe = all cells ⇒ IVF ≡ brute force ⇒ recall 1.0 everywhere
    val full = Similarity.annRecallProbe(queries, emb, "vec_id", "embedding",
        centroids, k = 5, nProbe = 4)
      .select("query_id", "n_truth", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect()
    assert(full.nonEmpty)
    full.foreach { case (_, nt, nh, r) => assert(nt === nh && r === 1.0) }

    // planted geometry: query probes cell 0 only (nProbe=1) but its
    // true nearest neighbor lives in cell 1 → recall 0 at k=1
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
      .toDF("cell_id", "centroid")
    val corpus = Seq(
      (10L, Seq(0.6, 0.8)),   // cell 1 — the TRUE nearest to q
      (11L, Seq(1.0, -0.5)),  // cell 0 filler
      (12L, Seq(1.0, -0.9))). // cell 0 filler
      toDF("vec_id", "embedding")
    val q = Seq((99L, Seq(1.0, 0.9))).toDF("vec_id", "embedding") // probes cell 0
    val miss = Similarity.annRecallProbe(q, corpus, "vec_id", "embedding",
        cents, k = 1, nProbe = 1)
      .select("n_truth", "n_hit", "recall").as[(Long, Long, Double)].head()
    assert(miss === ((1L, 0L, 0.0)))
    // widening the probe to both cells recovers it
    val rec = Similarity.annRecallProbe(q, corpus, "vec_id", "embedding",
        cents, k = 1, nProbe = 2)
      .select("recall").as[Double].head()
    assert(rec === 1.0)
  }

  test("sizeNProbe: monotone in nProbe, exact at all cells, per-config ≡ annRecallProbe, chosen = minimal meeting config") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(200)
    val centroids = Similarity.Ivf.fit(emb, "embedding", nCells = 4)
    val queries = emb.filter(col("vec_id") % 20 === 0)
    val sweep = Similarity.sizeNProbe(queries, emb, "vec_id", "embedding",
        centroids, k = 5, targetRecall = 0.9, maxNProbe = 4)
      .orderBy("n_probe")
      .select("n_probe", "n_queries", "mean_recall", "min_recall",
        "meets_target", "chosen")
      .as[(Int, Long, Double, Double, Boolean, Boolean)].collect().toSeq
    assert(sweep.map(_._1) === Seq(1, 2, 3, 4))
    // recall is monotone non-decreasing in nProbe (candidate sets grow;
    // a truth member in the candidate set always makes the approx top-k)
    sweep.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3 <= b._3, s"mean recall not monotone: $sweep")
      assert(a._4 <= b._4, s"min recall not monotone: $sweep")
    }
    // probing every cell IS the brute force
    assert(sweep.last._3 === 1.0 && sweep.last._4 === 1.0)
    // each sweep row equals an independent annRecallProbe at that config
    for (p <- 1 to 4) {
      val probe = Similarity.annRecallProbe(queries, emb, "vec_id",
          "embedding", centroids, k = 5, nProbe = p)
        .select("recall").as[Double].collect()
      val meanVia = (probe.map(BigDecimal(_)).sum / probe.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val row = sweep(p - 1)
      assert(row._2 === probe.length.toLong, s"nProbe=$p")
      assert(math.abs(row._3 - meanVia) < 1e-9, s"nProbe=$p: ${row._3} vs $meanVia")
      assert(row._4 === probe.min, s"nProbe=$p")
    }
    // chosen = the minimal config meeting the target, exactly one when
    // any config meets it (nProbe=4 reads 1.0, so one always does here)
    val meeting = sweep.filter(_._5)
    assert(meeting.nonEmpty)
    assert(sweep.count(_._6) === 1)
    assert(sweep.find(_._6).map(_._1) === meeting.headOption.map(_._1))
    // and an unreachable target chooses nothing (no silent fallback)
    val none = Similarity.sizeNProbe(queries, emb, "vec_id", "embedding",
        centroids, k = 5, targetRecall = 1.1, maxNProbe = 4)
      .select("meets_target", "chosen").as[(Boolean, Boolean)].collect()
    assert(none.forall(r => !r._1 && !r._2))
  }

  test("chosenNProbe closes the sizing loop: search under the chosen config reproduces the sweep's winning row") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(200)
    val centroids = Similarity.Ivf.fit(emb, "embedding", nCells = 4)
    val queries = emb.filter(col("vec_id") % 20 === 0)
    val sweep = Similarity.sizeNProbe(queries, emb, "vec_id", "embedding",
      centroids, k = 5, targetRecall = 0.9, maxNProbe = 4)
    val p = Similarity.chosenNProbe(sweep)
    val winner = sweep.filter(col("chosen"))
      .select("n_probe", "mean_recall", "min_recall")
      .as[(Int, Double, Double)].collect()
    assert(winner.length === 1 && winner(0)._1 === p)
    // serving under the chosen config measures EXACTLY the recall the
    // sweep promised for it — the sweep's fan-out candidate sets are
    // the real per-config searches, not an approximation of them
    val served = Similarity.annRecallProbe(queries, emb, "vec_id",
        "embedding", centroids, k = 5, nProbe = p)
      .select("recall").as[Double].collect()
    val servedMean = (served.map(BigDecimal(_)).sum / served.length)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(servedMean - winner(0)._2) < 1e-9,
      s"served $servedMean vs sweep ${winner(0)._2}")
    assert(served.min === winner(0)._3)
    // and the choice honors the target it was sized for
    assert(winner(0)._2 >= 0.9)
    // no-meeting sweep refuses to choose (serving would be silent garbage)
    intercept[IllegalArgumentException] {
      Similarity.chosenNProbe(Similarity.sizeNProbe(queries, emb, "vec_id",
        "embedding", centroids, k = 5, targetRecall = 1.1, maxNProbe = 4))
    }
  }

  test("IVF fit on a sample still yields a usable full-coverage index") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val centroids = Similarity.Ivf.fit(emb, "embedding", nCells = 4,
      sampleFraction = 0.5)
    assert(centroids.count() === 4)
    // every corpus row still gets a cell from the sampled centroids
    val assigned = Similarity.Ivf.assign(emb, "embedding", centroids)
    assert(assigned.filter(col("cell_id").isNull).count() === 0)
    assert(assigned.count() === emb.count())
  }

  test("IVF assign plans as a narrow map: no Exchange, no Window, no Join") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(100)
    val centroids = Similarity.Ivf.fit(emb, "embedding", nCells = 4)
    val plan = Similarity.Ivf.assign(emb, "embedding", centroids)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("IVF assigns by Euclidean distance, not dot product") {
    // centroid 1 has a huge norm: by dot product it would swallow every
    // vector; by L2 (the KMeans training metric) v=(1,0) belongs to cell 0
    val centroids = Seq(
      (0, Array(0.0d, 0.0d)),
      (1, Array(10.0d, 10.0d))).toDF("cell_id", "centroid")
    val df = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cell = Similarity.Ivf.assign(df, "embedding", centroids)
      .select("cell_id").as[Int].head()
    assert(cell === 0)
  }

  test("a NaN embedding falls back to a cell instead of killing the task") {
    // NaN scores make every comparison false — best stays -1 and the old
    // kernel threw ArrayIndexOutOfBounds; one corrupt embedding must not
    // fail a 10k-task stage
    val centroids = Seq(
      (0, Array(0.0d, 0.0d)),
      (1, Array(10.0d, 10.0d))).toDF("cell_id", "centroid")
    val df = Seq(
      (0L, Array(Float.NaN, 1.0f)),
      (1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cells = Similarity.Ivf.assign(df, "embedding", centroids)
      .select("vec_id", "cell_id").as[(Long, Int)].collect().toMap
    assert(cells(0L) === 0) // deterministic fallback: lowest unused cell
    assert(cells(1L) === 0) // sane rows unaffected
  }

  test("planted jittered near-dups are recovered (the qe05 shape is non-vacuous)") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val jittered = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0d) + (i % 3 - 1).cast("double") * 0.005d))
          .as("embedding"))
    val got = Similarity.embeddingNearDups(emb.unionByName(jittered), "vec_id",
      "embedding", minCosine = 0.95, nPlanes = 8, dim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every planted pair is an exact near-dup (cosine ≈ 0.99997); SRP-LSH
    // must recover them all here — plant-and-recover is the recall check
    assert(Seq(0L, 1L, 2L).forall(i => got.contains((i, i + 1000000L))), got)
  }

  test("withRecallAtK: exact-as-approx scores 1.0; planted structure floors the learned paths; bounds hold") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
    // identity contract: feeding the exact baseline through the
    // annotator must report recall 1.0 on every row
    val self = Similarity.withRecallAtK(
      Similarity.knnJoin(queries, emb, "vec_id", "embedding", k = 3),
      queries, emb, "vec_id", "embedding", k = 3)
    assert(self.select("recall_at_k").as[Double].collect().forall(_ === 1.0))

    // planted structure: 3 jittered copies of each query (cosine
    // ≈ 0.99997) dominate its exact top-3; the learned IVF path must
    // find most of them THROUGH the fitted cells — the spec floor the
    // qe06/qe14 output column is pinned against (random sf tables have
    // no cluster structure, so floors live here, on planted data)
    val jit = (1 to 3).map { j =>
      queries.select((col("vec_id") + lit(1000000L * j)).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0d) + (i % 3 - 1).cast("double") * (0.003d * j)))
          .as("embedding"))
    }.reduce(_ unionByName _)
    val corpus = emb.unionByName(jit)
    val cents = Similarity.Ivf.fit(corpus, "embedding", nCells = 8)
    val ivf = Similarity.withRecallAtK(
      Similarity.Ivf.search(queries, corpus, "vec_id", "embedding",
        cents, k = 3, nProbe = 2),
      queries, corpus, "vec_id", "embedding", k = 3)
    val perQ = ivf.select("query_id", "recall_at_k").distinct()
      .as[(Long, Double)].collect().toMap
    assert(perQ.values.forall(r => r >= 0.0 && r <= 1.0), perQ)
    val mean = perQ.values.sum / perQ.size
    assert(mean >= 2.0 / 3.0,
      s"IVF recall_at_k mean $mean under the planted-structure floor ($perQ)")
  }

  test("mmrRerank: redundancy penalized — the diverse candidate beats a near-duplicate of the first pick; lambda=1 is plain top-k") {
    // candidates for one query: a (rel .99) and its near-clone b (rel
    // .98, cosine(a,b) ≈ 1) and a diverse c (rel .90, orthogonal-ish)
    val cands = Seq(
      (1L, 10L, 0.99, Array(1.0, 0.0, 0.0)),
      (1L, 11L, 0.98, Array(0.999, 0.045, 0.0)),
      (1L, 12L, 0.90, Array(0.0, 1.0, 0.0)))
      .toDF("query_id", "neighbor_id", "rel", "v")
    val got = Similarity.mmrRerank(cands, "query_id", "neighbor_id",
        "rel", "v", k = 3, lambda = 0.7)
      .select("neighbor_id", "mmr_rank").as[(Long, Int)].collect()
      .sortBy(_._2).map(_._1)
    // rank 1: highest rel (10). rank 2: the clone 11 scores
    // .7·.98 − .3·1 ≈ .386 < the diverse 12's .7·.9 − .3·0 = .63
    assert(got.toSeq === Seq(10L, 12L, 11L), s"got ${got.toSeq}")
    // λ=1 degenerates to plain relevance order
    val plain = Similarity.mmrRerank(cands, "query_id", "neighbor_id",
        "rel", "v", k = 3, lambda = 1.0)
      .select("neighbor_id", "mmr_rank").as[(Long, Int)].collect()
      .sortBy(_._2).map(_._1)
    assert(plain.toSeq === Seq(10L, 11L, 12L))
    // fewer candidates than k: each query yields what it has
    val short = Similarity.mmrRerank(cands.filter(col("neighbor_id") === 10L),
      "query_id", "neighbor_id", "rel", "v", k = 3, lambda = 0.7)
    assert(short.count() === 1L)
  }

  test("int4 quantize/pack: codes round-trip through the packed bytes exactly; fidelity bounds; odd dims and flat vectors safe") {
    val vecs = Seq(
      (0L, Array(0.0, 1.0, 0.5, 0.25)),          // even dim
      (1L, Array(-2.0, 3.0, 0.0)),               // odd dim → padded nibble
      (2L, Array(7.0, 7.0, 7.0, 7.0)),           // flat → scale 0
      (3L, (0 until 64).map(i => math.sin(i.toDouble)).toArray))
      .toDF("vec_id", "v")
    val rt = vecs
      .withColumn("codes", Similarity.quantizeInt4(col("v")))
      .withColumn("packed", Similarity.packInt4(col("codes")))
      .withColumn("back", Similarity.unpackInt4(col("packed"), size(col("v"))))
      .withColumn("deq", Similarity.dequantizeInt4(col("back"),
        array_min(col("v")), array_max(col("v"))))
    val rows = rt.select("vec_id", "codes", "back", "packed", "v", "deq")
      .collect().map(r => r.getLong(0) -> r).toMap
    // pack→unpack is the identity on codes, for even AND odd dims
    rows.values.foreach { r =>
      assert(r.getSeq[Int](1) === r.getSeq[Int](2), s"roundtrip broke: $r")
    }
    // ⌈dim/2⌉ bytes
    assert(rows(1L).getSeq[Byte](3).length === 2)
    assert(rows(3L).getSeq[Byte](3).length === 32)
    // flat vector dequantizes exactly
    assert(rows(2L).getSeq[Double](5) === Seq(7.0, 7.0, 7.0, 7.0))
    // 16 levels bound the per-dim error at scale/2 = (mx-mn)/30
    rows.values.foreach { r =>
      val v = r.getSeq[Double](4); val d = r.getSeq[Double](5)
      val tol = (v.max - v.min) / 30.0 + 1e-12
      v.zip(d).foreach { case (x, y) =>
        assert(math.abs(x - y) <= tol, s"dim error ${math.abs(x - y)} > $tol") }
    }
  }

  test("requireMeanRecallFloor: a collapsed ANN structure fails loudly; healthy results pass through") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
    // DELIBERATELY BROKEN structure: an "approx" result whose neighbors
    // are just the queries' own far-away ids shifted out of the exact
    // top-k — the output shape a drifted/degenerate centroid fit
    // produces (plausible rows, zero overlap with the true neighbors)
    val broken = queries.select(col("vec_id").as("query_id"))
      .crossJoin(emb.filter(col("vec_id") >= 400 && col("vec_id") < 403)
        .select(col("vec_id").as("neighbor_id")))
      .withColumn("cosine", lit(0.99))
      .withColumn("rank", lit(1))
    val annotated = Similarity.withRecallAtK(broken, queries, emb,
      "vec_id", "embedding", k = 3)
    val e = intercept[IllegalArgumentException] {
      Similarity.requireMeanRecallFloor(annotated, floor = 0.3,
        what = "broken-centroids-test")
    }
    assert(e.getMessage.contains("collapsed"), e.getMessage)
    assert(e.getMessage.contains("broken-centroids-test"), e.getMessage)
    // the healthy deterministic IVF path passes the same floor
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell_id"),
        col("embedding").cast("array<double>").as("centroid"))
    val healthy = Similarity.withRecallAtK(
      Similarity.Ivf.search(queries, emb, "vec_id", "embedding",
        cents, k = 3, nProbe = 2),
      queries, emb, "vec_id", "embedding", k = 3)
    assert(Similarity.requireMeanRecallFloor(healthy, floor = 0.3,
      what = "healthy").count() > 0)
    // empty query batches pass vacuously (nothing served, nothing to gate)
    val empty = Similarity.withRecallAtK(
      broken.filter(lit(false)), queries.filter(lit(false)), emb,
      "vec_id", "embedding", k = 3)
    assert(Similarity.requireMeanRecallFloor(empty, floor = 0.99,
      what = "empty").count() === 0)
  }

  test("requireMeanRecallFloor: consumes the inner recall checkpoint — one resident frame per gate, idempotent on a leaf") {
    // The gate materializes its OWN checkpoint and must free the one
    // withRecallAtK pinned inside the input plan, or a serving session
    // gating recall per request accumulates one resident RDD per call
    // until session end (round-13 ADVICE).
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.knnJoin(queries, emb, "vec_id", "embedding", 3)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val gated = Similarity.requireMeanRecallFloor(
      Similarity.withRecallAtK(exact, queries, emb, "vec_id", "embedding", 3),
      floor = 0.3, what = "leak-test")
    val afterGate = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(afterGate.size === 1,
      s"gate must leave exactly ONE resident frame (its own), got ${afterGate.size}")
    // an already-gated (bare checkpoint leaf) frame passes through with
    // no second copy and stays readable
    val again = Similarity.requireMeanRecallFloor(gated, floor = 0.3,
      what = "leak-test-again")
    assert(spark.sparkContext.getPersistentRDDs.keySet -- before === afterGate,
      "double-gating must not add a second resident copy")
    assert(again.count() === gated.count() && again.count() > 0)
    graft.functions.Dedup.freeLocalCheckpoint(gated)
    // the REFUSAL path frees its own checkpoint too: per-request gating
    // of a collapsed structure throws every call, and without the free
    // each refusal would leak one resident queries×k frame
    val base2 = spark.sparkContext.getPersistentRDDs.keySet
    intercept[IllegalArgumentException] {
      Similarity.requireMeanRecallFloor(
        Similarity.withRecallAtK(exact, queries, emb, "vec_id", "embedding", 3),
        floor = 1.01, what = "leak-test-refusal")
    }
    assert(spark.sparkContext.getPersistentRDDs.keySet -- base2 === Set.empty,
      "a refused gate must not leave a resident frame behind")
  }

  test("cellStats: counts sum to corpus, fracs sum to 1, empty cells surface with n=0, assignment-consistent") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    // two far-away planted centroids nothing assigns to → must appear
    // with n=0 (the mis-fit signal a report that drops them would hide)
    val planted = Seq(
      (100, Seq.fill(64)(1.0e6)), (101, Seq.fill(64)(-1.0e6)))
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell_id"),
        col("embedding").cast("array<double>").as("centroid"))
      .unionByName(planted.toDF("cell_id", "centroid"))
    val stats = Similarity.Ivf.cellStats(emb, "embedding", cents)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), Option(r.get(3)))).toMap
    assert(stats.keySet === (0 until 8).toSet ++ Set(100, 101))
    assert(stats.values.map(_._1).sum === emb.count())
    assert(math.abs(stats.values.map(_._2).sum - 1.0) < 1e-4)
    assert(stats(100)._1 === 0L && stats(101)._1 === 0L)
    assert(stats(100)._3.isEmpty, "empty cell must have null mean_dist")
    // occupancy agrees with the assignment kernel directly
    val m = Similarity.Ivf.centroidMatrix(cents)
    val direct = emb.select(
        element_at(graft.functions.NativeExpressions.nearestCells(
          col("embedding").cast("array<double>"), m, 1), 1).as("c"))
      .groupBy("c").count().as[(Int, Long)].collect().toMap
    (0 until 8).foreach(c =>
      assert(stats(c)._1 === direct.getOrElse(c, 0L), s"cell $c"))
    // sparse id space: the kernel's positional index must translate back
    // to the caller's cell_id (ids {5, 17}, members land on BOTH)
    val sparseCents = Seq((5, Seq(0.0, 0.0)), (17, Seq(10.0, 0.0)))
      .toDF("cell_id", "centroid")
    val sparseCorpus = Seq((1L, Seq(0.1, 0.0)), (2L, Seq(9.9, 0.0)),
      (3L, Seq(10.2, 0.0))).toDF("vec_id", "embedding")
    val sparse = Similarity.Ivf.cellStats(sparseCorpus,
        "embedding", sparseCents)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sparse === Map(5 -> 1L, 17 -> 2L), sparse.toString)
  }

  test("int8 quantization round trip: high cosine fidelity, constant vectors exact") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("mn", array_min(col("v")))
      .withColumn("mx", array_max(col("v")))
    val fid = emb
      .withColumn("deq", Similarity.dequantizeInt8(
        Similarity.quantizeInt8(col("v")), col("mn"), col("mx")))
      .select(Similarity.cosine(col("v"), col("deq")).as("f"))
      .as[Double].collect()
    assert(fid.nonEmpty && fid.forall(_ > 0.999)) // 8-bit range loss only
    // constant vector: scale 0 → quantizes to zeros, dequantizes exactly
    val const = Seq((0L, Array(2.5d, 2.5d, 2.5d))).toDF("vec_id", "v")
      .withColumn("q", Similarity.quantizeInt8(col("v")))
      .withColumn("deq", Similarity.dequantizeInt8(col("q"), lit(2.5d), lit(2.5d)))
      .select(col("q"), col("deq")).as[(Seq[Int], Seq[Double])].head()
    assert(const._1 === Seq(0, 0, 0))
    assert(const._2 === Seq(2.5d, 2.5d, 2.5d))
  }

  test("embeddingNearDups flags the identical pair at high threshold") {
    val nd = Similarity.embeddingNearDups(vecs, "vec_id", "embedding",
      minCosine = 0.999, nPlanes = 4, dim = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd.contains((0L, 4L)))
  }

  test("semanticDedup plans equi-joins only: no cartesian, no nested loop") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val centroids = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cell_id"),
        col("embedding").cast("array<double>").as("centroid"))
    val plan = Similarity.semanticDedup(emb, "vec_id", "embedding", centroids,
        minCosine = 0.95)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("semanticDedup keeps one representative per within-cluster dup pair") {
    val centroids = Seq(
      (0, Array(1.0d, 0.0d, 0.0d)),
      (1, Array(0.0d, 1.0d, 0.0d))).toDF("cell_id", "centroid")
    val df = Seq(
      (0L, Array(1.0f, 0.01f, 0.0f)),  // cell 0
      (1L, Array(1.0f, 0.012f, 0.0f)), // cell 0, near-dup of 0 → dropped
      (2L, Array(0.9f, 0.4f, 0.0f)),   // cell 0, cosine ≈ 0.918 → kept
      (3L, Array(0.0f, 1.0f, 0.1f)),   // cell 1
      (4L, Array(0.0f, 1.0f, 0.1f)))   // cell 1, exact dup of 3 → dropped
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(df, "vec_id", "embedding", centroids,
        minCosine = 0.999)
      .select("vec_id", "cell_id", "kept").as[(Long, Int, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L) === ((0, true)))   // lowest id of the chain survives
    assert(out(1L) === ((0, false)))
    assert(out(2L) === ((0, true)))   // below threshold: untouched
    assert(out(3L) === ((1, true)))
    assert(out(4L) === ((1, false)))
  }

  test("PQ: codebook-member vectors encode to themselves and decode exactly (qe12)") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val m = Similarity.Pq.codebookMatrices(
      Similarity.Pq.prefixCodebooks(emb, "vec_id", "embedding", nSub = 8, nCodes = 16))
    assert(m.length === 8 && m.forall(_.length === 16) && m(0)(0).length === 8)
    // a vector whose sub-slices ARE codebook entries reconstructs exactly:
    // encode must pick its own code per subspace (distance 0 wins)
    val members = emb.filter(col("vec_id") < 16)
    val rt = Similarity.Pq.encode(members, "embedding", m)
      .select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("orig"),
        Similarity.Pq.decode(col("pq_code"), m).as("rec"))
      .withColumn("exact", col("orig") === col("rec"))
      .select("vec_id", "exact").as[(Long, Boolean)].collect().toMap
    assert(rt.size === 16 && rt.values.forall(identity),
      s"codebook members failed exact round-trip: ${rt.filterNot(_._2).keys}")
    // codes are 0-based and within range
    val codes = Similarity.Pq.encode(emb.limit(100), "embedding", m)
      .select(explode(col("pq_code"))).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 16))
  }

  test("PQ: learned codebooks reconstruct at least as well as prefix codebooks") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    def avgFidelity(m: Array[Array[Array[Double]]]): Double =
      Similarity.Pq.encode(emb, "embedding", m)
        .select(avg(Similarity.cosine(
          Similarity.asDouble(col("embedding")),
          Similarity.Pq.decode(col("pq_code"), m))))
        .head().getDouble(0)
    val prefix = avgFidelity(Similarity.Pq.codebookMatrices(
      Similarity.Pq.prefixCodebooks(emb, "vec_id", "embedding", 8, 16)))
    val learned = avgFidelity(Similarity.Pq.codebookMatrices(
      Similarity.Pq.fitCodebooks(emb, "embedding", 8, 16)))
    // seeded KMeans minimizes exactly the quantization error the prefix
    // books ignore — it must not reconstruct worse (small slack for the
    // cosine-vs-L2 objective mismatch)
    assert(learned >= prefix - 0.005, f"learned=$learned%.4f prefix=$prefix%.4f")
    assert(learned > 0.5, f"learned codebooks reconstruct poorly: $learned%.4f")
  }

  test("PQ quality (qe14): learned codebooks strictly beat prefix on SSE; recall at parity with prefix") {
    // the qe14 contract: learned codebooks must strictly beat the
    // prefix books on quantization SSE (the k-means objective — stable
    // across fits), and ADC recall@k vs the EXACT brute-force baseline
    // (knnJoin) must be at parity-within-noise with the oracle-checked
    // prefix-codebook search (qe12) and far above chance
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") < 20)
    val k = 5
    def topSets(res: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      res.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(Similarity.knnJoin(queries, emb, "vec_id", "embedding", k))
    def recall(m: Array[Array[Array[Double]]]): Double = {
      val approx = topSets(Similarity.Pq.search(queries, emb, "vec_id", "embedding", m, k))
      val hits = exact.map { case (q, ex) =>
        approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
      }
      hits.sum / hits.size
    }
    val prefixM = Similarity.Pq.codebookMatrices(
      Similarity.Pq.prefixCodebooks(emb, "vec_id", "embedding", 8, 16))
    val learnedM = Similarity.Pq.codebookMatrices(
      Similarity.Pq.fitCodebooks(emb, "embedding", 8, 16))
    // the STABLE learned-vs-prefix contract is quantization SSE — the
    // objective k-means actually optimizes; learned books must strictly
    // beat data-point books on it
    def sse(m: Array[Array[Array[Double]]]): Double =
      Similarity.Pq.encode(emb, "embedding", m)
        .select(sum(pow(Similarity.l2Norm(
          org.apache.spark.sql.functions.zip_with(
            Similarity.asDouble(col("embedding")),
            Similarity.Pq.decode(col("pq_code"), m),
            (a, b) => a - b)), 2)))
        .head().getDouble(0)
    val prefixSse = sse(prefixM)
    val learnedSse = sse(learnedM)
    assert(learnedSse < prefixSse,
      f"learned SSE $learnedSse%.2f not below prefix SSE $prefixSse%.2f")
    // recall@k on this RANDOM fixture is a noisy draw: the same
    // k-means|| fit moves ±0.07 recall under a mere row-order change
    // (measured 0.19 vs 0.26), because random embeddings give codebooks
    // no cluster structure to exploit. The honest recall contract is
    // parity-within-noise with the prefix books plus non-degeneracy
    // (chance recall@5 against ~1k vectors is ≈ 0.005).
    val prefixRecall = recall(prefixM)
    val learnedRecall = recall(learnedM)
    assert(learnedRecall >= prefixRecall - 0.08,
      f"learned=$learnedRecall%.3f far below prefix=$prefixRecall%.3f")
    assert(learnedRecall > 0.1,
      f"learned-codebook recall@$k degenerate: $learnedRecall%.3f")
    // sampled fit (the 100 TB path): on sf0.001's ~1k-vector fixture a
    // 50% sample leaves few rows per code, so only a non-degeneracy
    // bound is honest here — half the full-fit's recall floor
    val sampledRecall = recall(Similarity.Pq.codebookMatrices(
      Similarity.Pq.fitCodebooks(emb, "embedding", 8, 16, sampleFraction = 0.5)))
    assert(sampledRecall > 0.1,
      f"sampled-fit recall@$k degenerate: $sampledRecall%.3f " +
        f"(learned=$learnedRecall%.3f prefix=$prefixRecall%.3f)")
  }

  test("MRL truncated-rerank (qe15): funnel shape, and a full-width funnel equals exact k-NN") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") < 5)
    // shape: k rows per query, contiguous ranks, no self-matches
    val got = Similarity.mrlSearch(queries, emb, "vec_id", "embedding",
        dPrefix = 16, k = 3, rerankFactor = 4)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.length === 15)
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._4).sorted.toSeq === Seq(1, 2, 3), s"query $q ranks")
      assert(!rows.exists(_._2 == q), s"query $q returned itself")
    }
    // degenerate-funnel equivalence: with a rerank window as wide as the
    // corpus, stage 2 sees every candidate and the result must be
    // EXACTLY knnJoin's (same rounding, same tie-breaks) — pins that the
    // two-stage machinery adds no scoring drift
    val n = emb.count().toInt
    val wide = Similarity.mrlSearch(queries, emb, "vec_id", "embedding",
        dPrefix = 16, k = 3, rerankFactor = n)
      .as[(Long, Long, Double, Int)].collect().toSet
    val exact = Similarity.knnJoin(queries, emb, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(wide === exact, "full-width funnel diverged from exact k-NN")
    // and the real funnel's recall vs exact is far above chance. The
    // fixture embeddings are RANDOM — a 16/64 prefix carries only ~1/4
    // of the signal, unlike MRL-trained embeddings which concentrate
    // semantics in the prefix — so the honest bound here is
    // non-degeneracy: chance recall for a 12-candidate funnel over ~1k
    // vectors is ≈ 0.01
    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val gotSets = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exactSets.map { case (q, ex) =>
      gotSets(q).intersect(ex.toSet).size.toDouble / ex.size }.sum / exactSets.size
    assert(recall > 0.15, f"funnel recall@3 degenerate: $recall%.3f")
  }

  test("ivfMrlFunnel (qe18): recall@k vs exact baseline, and more probes never hurt") {
    // qe15 pins MRL-only (full-width funnel == exact) and qe14 pins the
    // codebook fit; this is the COMPOSED funnel's contract. The fixture
    // embeddings are random, so absolute recall is RNG-pinned
    // (memory: ±0.07 under a row-order change) — the honest bounds are
    // (a) far above chance, (b) probing ALL cells with a corpus-wide
    // rerank window recovers the exact result, (c) recall is
    // non-decreasing in nProbe on this fixture.
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.knnJoin(queries, emb, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Double, Int)].collect()
    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallAt(nProbe: Int, rerankFactor: Int = 4): Double = {
      val got = graft.ops.Pipelines.ivfMrlFunnel(emb, nProbe = nProbe,
          rerankFactor = rerankFactor)
        .as[(Long, Long, Double, Int)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exactSets.map { case (q, ex) =>
        got.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
      }.sum / exactSets.size
    }
    // (a) default settings (the qe18 query): chance recall for a
    // 12-candidate funnel over ~1k vectors is ≈ 0.01
    val atDefault = recallAt(nProbe = 2)
    assert(atDefault > 0.1, f"funnel recall@3 degenerate: $atDefault%.3f")
    // (b) exhaustive settings degrade to exact: all 8 cells probed, the
    // rerank window as wide as the corpus
    val n = emb.count().toInt
    val exhaustive = graft.ops.Pipelines.ivfMrlFunnel(emb, nProbe = 8,
        rerankFactor = n)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2, r._3, r._4)).toSet
    assert(exhaustive === exact.toSet,
      "exhaustive funnel settings diverged from exact k-NN")
    // (c) monotonicity: with the rerank window covering every candidate
    // (rerankFactor = corpus size) the funnel is exact-top-k over the
    // probed cells, and a GROWING candidate set can only displace a
    // kept row with a true top-k member — so recall is provably
    // non-decreasing in nProbe. (At a FINITE rerank window this does
    // NOT hold — measured here: nProbe 2→4 dropped 0.40→0.33 at
    // rerankFactor=4, because extra coarse candidates displaced a
    // stage-1 survivor that would have won stage 2. That trade of
    // monotonicity for bounded rerank cost is the funnel design, and
    // bound (a) is what guards the default operating point.)
    val ladder = Seq(1, 2, 4, 8).map(p => p -> recallAt(p, rerankFactor = n))
    ladder.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(rb >= ra - 1e-9,
        s"recall fell when probing more cells: nProbe=$pa→$ra, nProbe=$pb→$rb " +
          s"(full ladder: $ladder)")
    }
    assert(ladder.last._2 === 1.0, s"nProbe=8 + full rerank must be exact: $ladder")
  }

  test("clusterCapSample (qe17): caps per cell, keeps closest-to-centroid, full cap = identity") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 2-D fixture: two well-separated clusters around (0,0) and (10,10)
    val corpus = Seq(
      (1L, Seq(0.0f, 0.1f)), (2L, Seq(0.2f, 0.0f)), (3L, Seq(1.0f, 1.0f)),
      (4L, Seq(10.0f, 10.1f)), (5L, Seq(10.2f, 10.0f)), (6L, Seq(9.0f, 9.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(0.0, 0.0)), (1, Seq(10.0, 10.0)))
      .toDF("cell_id", "centroid")
    val got = Similarity.Ivf.clusterCapSample(corpus, "vec_id", "embedding", cents, cap = 2)
      .as[(Int, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    // cell 0 holds {1,2,3}: closest two are 1 (0.01) and 2 (0.04); 3 (2.0) cut
    // cell 1 holds {4,5,6}: closest two are 4 and 5; 6 cut
    assert(got.map(r => (r._1, r._2, r._4)).toSeq ===
      Seq((0, 1L, 1), (0, 2L, 2), (1, 4L, 1), (1, 5L, 2)))
    assert(got.map(_._3).toSeq === Seq(0.01, 0.04, 0.01, 0.04))
    // cap >= cell size keeps everything, ranks contiguous
    val all = Similarity.Ivf.clusterCapSample(corpus, "vec_id", "embedding", cents, cap = 10)
      .as[(Int, Long, Double, Int)].collect()
    assert(all.length === 6)
    all.groupBy(_._1).values.foreach(rs =>
      assert(rs.map(_._4).sorted.toSeq === (1 to rs.length).toSeq))
  }

  test("clusterCapSample plan: broadcast centroid join, exactly one shuffle (the per-cell window)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cell_id"),
        col("embedding").cast("array<double>").as("centroid"))
    val res = Similarity.Ivf.clusterCapSample(emb, "vec_id", "embedding", cents, cap = 5)
    res.collect()
    // the AdaptiveSparkPlan toString appends the pre-AQE "Initial Plan"
    // — count Exchanges only in the final section
    val plan = res.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"), s"centroid join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffled join:\n$plan")
    // the corpus side must shuffle once — for the window — and only once
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"$exchanges corpus shuffles (want 1, the window):\n$plan")
  }

  test("PQ encode plans as a narrow map: no Exchange, no Window, no Join") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(100)
    val m = Similarity.Pq.codebookMatrices(
      Similarity.Pq.prefixCodebooks(
        graft.sources.Tables.embeddings(spark, sf0001), "vec_id", "embedding", 8, 16))
    val plan = Similarity.Pq.encode(emb, "embedding", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("PQ search: k rows per query, ranks contiguous, self excluded") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val m = Similarity.Pq.codebookMatrices(
      Similarity.Pq.prefixCodebooks(emb, "vec_id", "embedding", 8, 16))
    val got = Similarity.Pq.search(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", m, k = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(got.length === 15) // 5 queries × 3
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._4).sorted.toSeq === Seq(1, 2, 3), s"query $q ranks")
      assert(!rows.exists(_._2 == q), s"query $q returned itself")
    }
  }

  test("semanticDecontaminate: matches the brute-force max against every benchmark row") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val bench = emb.filter(col("vec_id") < 10)
    val corpus = emb.filter(col("vec_id") >= 10 && col("vec_id") < 60)
    val got = Similarity.semanticDecontaminate(corpus, "vec_id", "embedding",
        bench, "vec_id", "embedding", minCosine = 0.9)
      .select("vec_id", "bench_id", "max_cos").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // brute force: every (corpus, bench) cosine, keep the max per corpus row
    val scored = corpus.select(col("vec_id"), col("embedding").as("v"))
      .crossJoin(bench.select(col("vec_id").as("b"), col("embedding").as("bv")))
      .withColumn("cos", round(Similarity.cosine(col("v"), col("bv")), 6))
      .select("vec_id", "b", "cos").as[(Long, Long, Double)]
      .collect().groupBy(_._1)
    assert(got.keySet === scored.keySet)
    got.foreach { case (id, (bId, cos)) =>
      val rows = scored(id)
      val maxCos = rows.map(_._3).max
      assert(math.abs(cos - maxCos) < 2e-6, s"$id: $cos vs $maxCos")
      // bench id must agree when the 6-dp max is unique; on a tie any
      // of the tied ids is a correct argmax
      val atMax = rows.filter(_._3 == maxCos).map(_._2)
      assert(atMax.contains(bId), s"$id: $bId not in ${atMax.toSeq}")
      if (atMax.length == 1) assert(bId === atMax.head, s"$id")
    }
  }

  test("semanticDecontaminate: planted near-copies flag, orthogonal rows don't; narrow plan") {
    import org.apache.spark.sql.functions._
    val bench = Seq((0L, Seq(1.0, 0.0, 0.0)), (1L, Seq(0.0, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (100L, Seq(0.999, 0.01, 0.0)),  // near bench 0 → flagged
      (101L, Seq(0.0, 0.0, 5.0)),     // orthogonal → clean
      (102L, Seq(0.0, -2.0, 0.0))     // anti-parallel to bench 1 → clean
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(corpus, "vec_id", "embedding",
      bench, "vec_id", "embedding", minCosine = 0.99)
    val byId = out.select("vec_id", "bench_id", "contaminated")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(byId(100L)._2 === 0L && byId(100L)._3 === true, byId(100L).toString)
    assert(byId(101L)._3 === false)
    assert(byId(102L)._3 === false)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("semanticDecontaminate: a zero-norm benchmark row cannot shadow a real match") {
    import org.apache.spark.sql.functions._
    // bench 5 is a zero vector; the corpus row is a SHORT parallel of
    // bench 7 (v = 0.4·b), so the unnormalized argmin would prefer the
    // zero row (score 0 < 0.2) and miss a perfect-cosine match
    val bench = Seq((5L, Seq(0.0, 0.0)), (7L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val corpus = Seq((100L, Seq(0.4, 0.0))).toDF("vec_id", "embedding")
    val r = Similarity.semanticDecontaminate(corpus, "vec_id", "embedding",
        bench, "vec_id", "embedding", minCosine = 0.99)
      .select("bench_id", "max_cos", "contaminated")
      .as[(Long, Double, Boolean)].head()
    assert(r === ((7L, 1.0, true)), r.toString)
  }

  test("semanticDecontaminate: a NaN corpus embedding is never reported contaminated") {
    import org.apache.spark.sql.functions._
    val bench = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val corpus = Seq((100L, Seq(Double.NaN, 1.0)), (101L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(corpus, "vec_id", "embedding",
        bench, "vec_id", "embedding", minCosine = 0.99)
      .select("vec_id", "max_cos", "contaminated")
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(100L)._3 === false, s"NaN row flagged: ${out(100L)}")
    assert(out(100L)._2.isNegInfinity, out(100L).toString)
    assert(out(101L)._3 === true)
  }

  test("cellStats and outliers survive corrupt embeddings: excluded, never thrown or poisoned") {
    // ANSI mode is on: an unguarded NaN distance would fail the
    // NaN→DECIMAL cast outright; a guard that only dropped whole-null
    // vectors would still let one NaN ELEMENT poison its cell's moments
    val cents = Seq((0, Seq(0.0, 0.0)), (1, Seq(10.0, 10.0)))
      .toDF("cell_id", "centroid")
    val rows = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(Double.NaN, 0.5)),
      (5L, Seq(10.0, 11.0)))
      .toDF("vec_id", "embedding")
      .unionByName(Seq((4L, Option.empty[Seq[Double]])).toDF("vec_id", "embedding"))
    val stats = Similarity.Ivf.cellStats(rows, "embedding", cents)
      .as[(Int, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(stats(0)._2 === 2L && stats(1)._2 === 1L, stats.toString)
    assert(stats.values.forall(r => !r._4.isNaN), s"poisoned mean: $stats")
    val out = Similarity.Ivf.outliers(rows, "vec_id", "embedding", cents, z = 1.0)
      .as[(Long, Int, Double, Double, Double, Boolean)].collect()
    assert(out.map(_._1).toSet === Set(1L, 2L, 5L), out.toSeq.toString)
    assert(out.forall(r => !r._3.isNaN && !r._4.isNaN && !r._5.isNaN))
  }

  // ------------------------------------------- embedding outliers (qe27)

  test("Ivf.outliers (qe27): hand-computed moments; far-tail member flags, near members don't") {
    // cell 0 at origin: 10 members at distance 1, one planted at 20 —
    // mean = 30/11 ≈ 2.7273, σ ≈ 5.4617, mean + 2σ ≈ 13.65 < 20.
    // cell 1 far away holds a singleton (std 0 → can never flag).
    val cents = Seq((0, Seq(0.0, 0.0)), (1, Seq(1000.0, 1000.0)))
      .toDF("cell_id", "centroid")
    val near = (1L to 10L).map(i => (i, Seq(math.cos(i.toDouble), math.sin(i.toDouble))))
    val rows = (near :+ ((100L, Seq(20.0, 0.0))) :+ ((200L, Seq(1000.0, 999.0))))
      .toDF("vec_id", "embedding")
    val out = Similarity.Ivf.outliers(rows, "vec_id", "embedding", cents, z = 2.0)
      .as[(Long, Int, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size === 12)
    assert(out(100L)._2 === 0 && out(100L)._3 === 20.0)
    assert(out(100L)._6, "planted far-tail member not flagged")
    (1L to 10L).foreach(i => assert(!out(i)._6, s"unit-distance member $i flagged"))
    // hand moments: all distances round to 1.0 or 20.0
    val mean = BigDecimal((10 * 1.0 + 20.0) / 11).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(math.abs(out(1L)._4 - mean.toDouble) < 1e-6, s"mean ${out(1L)._4}")
    // singleton cell: std 0, dist == mean, never an outlier
    assert(out(200L)._2 === 1 && out(200L)._5 === 0.0 && !out(200L)._6)
  }

  test("Ivf.outliers: z=0 flags every above-mean member; huge z flags none; partitioning-invariant") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val cents = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cell_id"),
        col("embedding").cast("array<double>").as("centroid"))
    def run(df: org.apache.spark.sql.DataFrame, z: Double) =
      Similarity.Ivf.outliers(df, "vec_id", "embedding", cents, z)
        .as[(Long, Int, Double, Double, Double, Boolean)].collect()
    val z0 = run(emb, 0.0)
    z0.foreach(r => assert(r._6 === (r._3 > r._4), s"z=0 flag mismatch: $r"))
    assert(z0.count(_._6) > 0)
    assert(run(emb, 1e6).count(_._6) === 0)
    val a = run(emb.repartition(1), 2.0).sortBy(_._1).toSeq
    val b = run(emb.repartition(7), 2.0).sortBy(_._1).toSeq
    assert(a === b)
  }

  // ------------------------------------------- JL random projection (qe26)

  test("randomProject (qe26): shape, determinism, and linearity up to rounding") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(100)
    val proj = Similarity.randomProject(emb, "embedding", outDim = 16, dim = 64)
      .select(col("vec_id"), col("proj"))
    val rows = proj.as[(Long, Seq[Double])].collect().toMap
    assert(rows.values.forall(_.length === 16))
    // partitioning-invariant (pure narrow projection, 6-dp rounded)
    val re = Similarity.randomProject(emb.repartition(7), "embedding",
        outDim = 16, dim = 64)
      .select(col("vec_id"), col("proj")).as[(Long, Seq[Double])].collect().toMap
    assert(re === rows)
    // linearity: proj(2v) = 2·proj(v) within the 6-dp rounding of each side
    val doubled = emb.select(col("vec_id"),
      transform(col("embedding"), x => x * 2.0d).as("embedding"))
    val p2 = Similarity.randomProject(doubled, "embedding", outDim = 16, dim = 64)
      .select(col("vec_id"), col("proj")).as[(Long, Seq[Double])].collect().toMap
    rows.foreach { case (id, p) =>
      p.zip(p2(id)).foreach { case (a, b) =>
        assert(math.abs(2.0 * a - b) < 3e-6, s"vec $id not linear: $a vs $b")
      }
    }
  }

  test("randomProject: JL distance preservation on the fixture (loose statistical bound)") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(60)
    val proj = Similarity.randomProject(emb, "embedding", outDim = 16, dim = 64)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"), col("proj"))
      .as[(Long, Seq[Double], Seq[Double])].collect()
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- proj.indices; j <- (i + 1) until proj.length
      orig = d2(proj(i)._2, proj(j)._2) if orig > 1e-9
    } yield d2(proj(i)._3, proj(j)._3) / orig
    // E[ratio] = 1 under JL; with k=16 individual pairs swing, but the
    // median over ~1.7k pairs concentrates hard
    val med = ratios.sorted.apply(ratios.length / 2)
    assert(med > 0.7 && med < 1.3, s"median distortion $med")
    // and no catastrophic collapse: no pair loses more than ~95% of its distance
    assert(ratios.min > 0.05, s"worst-pair distortion ${ratios.min}")
  }

  test("randomProject plans as a pure narrow projection: no Exchange, no Window, no Join") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val plan = Similarity.randomProject(emb, "embedding", outDim = 16, dim = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("randomProject rejects outDim outside [1, dim]") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001).limit(1)
    val e = intercept[IllegalArgumentException] {
      Similarity.randomProject(emb, "embedding", outDim = 65, dim = 64)
    }
    assert(e.getMessage.contains("outDim"))
  }
}
