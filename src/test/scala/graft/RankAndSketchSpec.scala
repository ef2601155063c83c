package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, NativeExpressions}
import graft.ops.RankOps
import graft.sources.Tables

/** The scalable two-phase rank vs the single-partition window reference,
  * the approx_percentile accuracy contract (qa02), and proof the native
  * kernels really participate in whole-stage codegen.
  */
class RankAndSketchSpec extends SparkSpec {
  import spark.implicits._

  test("globalRank equals single-partition window rank on real data") {
    val df = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).cast("double").as("v"))
    val expected = df
      .withColumn("rnk", rank().over(Window.orderBy(col("v").desc)))
      .select("l_suppkey", "rnk").as[(Long, Int)].collect().toMap
    val got = RankOps.globalRank(df, col("v").desc)
      .select("l_suppkey", "rnk").as[(Long, Int)].collect().toMap
    assert(got === expected)
  }

  test("globalRank preserves rank() tie semantics under heavy ties") {
    // 100 rows over 5 distinct values: every value is a 20-way tie, and
    // partitions outnumber distinct keys, so some range partitions are
    // empty — both edge cases at once
    val df = Seq.tabulate(100)(i => (i.toLong, (i % 5).toDouble)).toDF("id", "v")
    val expected = df
      .withColumn("rnk", rank().over(Window.orderBy(col("v").desc, col("id"))))
      .select("id", "rnk").as[(Long, Int)].collect().toMap
    val got = RankOps.globalRank(df, col("v").desc, numPartitions = 8)
      .withColumn("rnk2", rank().over(
        Window.partitionBy(col("rnk")).orderBy(col("id"))))
      .select(col("id"), (col("rnk") + col("rnk2") - 1).cast("int").as("r"))
      .as[(Long, Int)].collect().toMap
    // tie-broken comparison: globalRank(v) + within-group id rank == full rank
    assert(got === expected)
    // and the raw ranks themselves: 20-way ties share one rank value
    val raw = RankOps.globalRank(df, col("v").desc, numPartitions = 8)
      .groupBy("rnk").count().as[(Int, Long)].collect().toMap
    assert(raw === Map(1 -> 20L, 21 -> 20L, 41 -> 20L, 61 -> 20L, 81 -> 20L))
  }

  test("globalPrefixSum equals single-partition window cumsum; empty partitions safe") {
    val df = Tables.lineitem(spark, sf0001)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("v"))
    val expected = df
      .withColumn("cum", sum(col("v")).over(Window.orderBy(col("l_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("l_orderkey", "cum").as[(Long, Long)].collect().toMap
    val got = RankOps.globalPrefixSum(df, col("l_orderkey"), col("v"))
      .select("l_orderkey", "cum").as[(Long, Long)].collect().toMap
    assert(got === expected)
    // more partitions than rows → some range partitions empty
    val tiny = Seq((1L, 10L), (2L, 5L), (3L, 7L)).toDF("id", "v")
    val t = RankOps.globalPrefixSum(tiny, col("id"), col("v"), numPartitions = 8)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(t === Map(1L -> 10L, 2L -> 15L, 3L -> 22L))
    // null values fold to 0 — an all-null range partition must not NPE
    // the driver-side offset cumulation
    val withNulls = Seq((1L, Some(10L)), (2L, None), (3L, None), (4L, Some(7L)))
      .toDF("id", "v")
    val nn = RankOps.globalPrefixSum(withNulls, col("id"), col("v"),
        numPartitions = 4)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(nn === Map(1L -> 10L, 2L -> 10L, 3L -> 10L, 4L -> 17L))
  }

  test("curriculumPackStream (qd66): sequences ascend the difficulty buckets; conservation holds; empty orderBy keeps qd57 semantics") {
    val docs = Tables.documents(spark, sf0001)
    val packed = graft.functions.Curation.curriculumPackStream(
        docs, "doc_id", "text", nBuckets = 4, contextLen = 128)
      .as[(Long, Long, Long, Long, Long, Int)].collect()
    // buckets span the full range and the stream order is monotone in
    // the bucket: a sequence's minimum bucket never drops below any
    // earlier sequence's maximum minus the one boundary-straddling doc
    val buckets = packed.map(_._6).distinct.sorted
    assert(buckets.head === 1 && buckets.last === 4, buckets.toSeq.toString)
    val bySeq = packed.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (seq, rows) => (seq, rows.map(_._6).min, rows.map(_._6).max) }
    bySeq.sliding(2).foreach {
      case Seq((_, _, maxPrev), (s2, minNext, _)) =>
        assert(minNext >= maxPrev - 1,
          s"curriculum order broken at seq $s2: $minNext < $maxPrev - 1")
      case _ => ()
    }
    // conservation: total packed tokens = corpus tokens (lm covers every
    // tokenized doc)
    val n = docs.select(sum(
      graft.functions.TextAnalysis.tokenCount(col("text")).cast("long")))
      .as[Long].head()
    assert(packed.map(_._4).sum === n)
    // the generalized packStream with NO explicit order is byte-identical
    // to the qd57 layout (regression guard on the orderBy refactor)
    val a = graft.functions.Curation.packStream(docs, "doc_id",
        graft.functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        contextLen = 128)
      .orderBy("seq_id", "pos_in_seq").collect().map(_.toString).toSeq
    val b = graft.functions.Curation.packStream(docs, "doc_id",
        graft.functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        contextLen = 128, orderBy = Nil)
      .orderBy("seq_id", "pos_in_seq").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("packStream (qd57): every token placed once, sequences exactly full except the last") {
    val docs = Tables.documents(spark, sf0001)
    val n = docs.select(sum(
      graft.functions.TextAnalysis.tokenCount(col("text")).cast("long")))
      .as[Long].head()
    val packed = graft.functions.Curation.packStream(docs, "doc_id",
        graft.functions.TextAnalysis.tokenCount(col("text")).cast("long"),
        contextLen = 128)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // conservation: per-doc takes sum to the doc's token count, and the
    // grand total equals the corpus token count
    val perDoc = packed.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    val nTokOf = packed.map(r => r._2 -> r._6).toMap
    perDoc.foreach { case (id, s) => assert(s === nTokOf(id), s"doc $id tokens") }
    assert(packed.map(_._4).sum === n)
    // every sequence except the last is exactly full and contiguous
    val lastSeq = packed.map(_._1).max
    packed.groupBy(_._1).foreach { case (seq, rows) =>
      val sorted = rows.sortBy(_._5)
      // slices tile the sequence: each begins where the previous ended
      sorted.foldLeft(0L) { case (pos, r) =>
        assert(r._5 === pos, s"seq $seq gap at ${r._5}"); pos + r._4
      }
      val filled = sorted.map(_._4).sum
      if (seq != lastSeq) assert(filled === 128L, s"seq $seq not full: $filled")
      else assert(filled === (if (n % 128 == 0) 128L else n % 128), "last seq")
    }
    // slices within a doc are consecutive spans of it
    packed.groupBy(_._2).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._3)
      sorted.foldLeft(0L) { case (from, r) =>
        assert(r._3 === from, s"doc $id slice gap"); from + r._4
      }
    }
  }

  test("packStream is partitioning-invariant and drops zero-token docs") {
    val docs = Seq((1L, 5L), (2L, 0L), (3L, 130L), (4L, 251L))
      .toDF("doc_id", "n")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.functions.Curation.packStream(df, "doc_id", col("n"), contextLen = 128)
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._5)).toSeq
    val a = run(docs.repartition(1))
    assert(a === run(docs.repartition(5)))
    assert(!a.exists(_._2 == 2L), "zero-token doc emitted")
    // doc 3 (130 tokens at offset 5) straddles seq 0/1; doc 4 spans 3 seqs
    assert(a.filter(_._2 == 3L).map(_._1).toSet === Set(0L, 1L))
    assert(a.filter(_._2 == 4L).map(_._1).size === 3)
  }

  test("globalRank materializes the shuffle once — downstream jobs add zero input scans") {
    // a scan-counting accumulator in the source RDD. Two passes are
    // inherent to repartitionByRange (the range sampler reads the input,
    // then the checkpointed shuffle map does): acc lands at exactly 2n.
    // What the eager localCheckpoint buys: the counts job and the rank
    // job both read the materialized blocks and contribute ZERO further
    // scans — before the round-3 fix each action re-derived sampler +
    // shuffle (4n), and offset correctness leaned on the sampler
    // re-seeding identically across the two executions.
    val acc = spark.sparkContext.longAccumulator("source-scans")
    val rdd = spark.sparkContext.parallelize(1 to 1000, 4).map { i =>
      acc.add(1); org.apache.spark.sql.Row(i.toDouble)
    }
    val df = spark.createDataFrame(rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
    val out = RankOps.globalRank(df, col("v"), numPartitions = 8)
    assert(out.count() === 1000L)
    val afterFirst = acc.value
    assert(afterFirst === 2000L,
      s"input scanned ${afterFirst / 1000.0}x (sampler + checkpoint expected)")
    // a second action over the SAME returned frame re-reads the
    // checkpoint, not the source
    assert(out.agg(max("rnk")).head().getInt(0) === 1000)
    assert(acc.value === afterFirst, "second action must not rescan the input")
  }

  test("approx_percentile stays within 2% of the exact percentile (qa02 contract)") {
    val rows = Tables.orders(spark, sf0001)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("exact_med"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("approx_med"),
        expr("percentile(o_totalprice, 0.9)").as("exact_p90"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)").as("approx_p90"))
      .select("exact_med", "approx_med", "exact_p90", "approx_p90")
      .as[(Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (em, am, e9, a9) =>
      assert(math.abs(am - em) / em < 0.02, s"median $am vs $em")
      assert(math.abs(a9 - e9) / e9 < 0.02, s"p90 $a9 vs $e9")
    }
  }

  test("grouped sketches stay within error of per-group exacts (qa03 contract)") {
    val li = Tables.lineitem(spark, sf0001)
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct("l_orderkey").as("exact_d"),
        approx_count_distinct("l_orderkey").as("approx_d"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_med"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx_med"))
      .select("exact_d", "approx_d", "exact_med", "approx_med")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.length === 3)
    rows.foreach { case (ed, ad, em, am) =>
      assert(math.abs(ad - ed).toDouble / ed < 0.06, s"distinct $ad vs $ed") // 3σ at rsd default
      assert(math.abs(am - em) / em < 0.02, s"median $am vs $em")
    }
  }

  test("native kernels generate code inside whole-stage codegen (no fallback island)") {
    import org.apache.spark.sql.execution.debug.codegenString
    val df = Tables.documents(spark, sf0001).limit(10)
      .select(
        Dedup.simHash64("text").as("sh"),
        NativeExpressions.minhashSig(col("text"), 4, 2).as("sig"),
        NativeExpressions.winnowFingerprints(lower(col("text")), 3, 4).as("wf"),
        NativeExpressions.vecDot(
          array(lit(1.0d), lit(2.0d)), array(lit(3.0d), lit(4.0d))).as("d"))
    val plan = df.queryExecution.executedPlan
    // "*(1) Project" is the whole-stage-codegen marker in the plan tree
    assert(plan.toString.contains("*(1) Project"), plan.toString)
    // the generated Java must call into the kernels — proves doGenCode ran,
    // not the interpreted eval path
    val code = codegenString(plan)
    assert(code.contains(".compute("), code.take(2000))
    // and the codegen'd result is right
    assert(df.select("d").as[Double].head() === 11.0d)
  }

  test("Misra-Gries sketch (qa05): exact when k >= vocab, and the MG guarantee under eviction") {
    import graft.functions.HeavyHittersAgg
    import spark.implicits._
    // equality contract: at k=64 >= the fixture vocabulary nothing is
    // ever evicted — the qa05 sketch report must EQUAL the qa04 exact
    // report, row for row
    val exact = SparkEntry.queries("qa04_heavy_tokens_exact")(spark, sf0001)
      .as[(String, String, Long, Int)].collect()
    val sketch = SparkEntry.queries("qa05_heavy_tokens_sketch")(spark, sf0001)
      .as[(String, String, Long, Int)].collect()
    assert(sketch.nonEmpty)
    assert(sketch === exact)
    // guarantee contract: a planted zipf-ish stream with k FAR below the
    // vocabulary — every token with true frequency > n/(k+1) must
    // survive eviction, and estimates never overcount / undercount by
    // more than n/(k+1)
    val tokens =
      Seq.fill(400)("alpha") ++ Seq.fill(200)("beta") ++ Seq.fill(100)("gamma") ++
        (0 until 300).map(i => s"noise${i % 150}")
    val n = tokens.length
    val k = 5
    val truth = tokens.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val agg = new HeavyHittersAgg.MisraGries(k).toColumn.name("hits")
    val got = tokens.zipWithIndex.toDF("tok", "i").as[(String, Long)]
      .map { case (t, _) => ("g", t) }
      .groupByKey(_._1).mapValues(_._2).agg(agg)
      .head()._2.map(h => h.token -> h.est).toMap
    val bound = n.toDouble / (k + 1)
    truth.filter(_._2 > bound).keys.foreach { heavy =>
      assert(got.contains(heavy), s"heavy hitter $heavy (${truth(heavy)} > $bound) evicted")
    }
    got.foreach { case (t, est) =>
      val tr = truth(t)
      assert(est <= tr, s"$t overcounted: est=$est true=$tr")
      assert(tr - est <= bound + 1, s"$t undercounted past the bound: est=$est true=$tr")
    }
  }
}
