package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Dedup-family invariants on planted fixtures: exact dedup determinism,
  * MinHash-LSH recall of near-identical docs, SimHash Hamming locality,
  * shingle/jaccard correctness.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again until dawn"
  private val nearDup = base.replace("dawn", "dusk") // 1 token differs
  private val distinct1 = "completely unrelated text about spark catalyst optimizer rules and codegen stages"

  private def docs = Seq(
    (0L, base), (1L, nearDup), (2L, distinct1), (3L, base), // 3 = exact dup of 0
  ).toDF("doc_id", "text")

  test("wordShingles builds distinct n-grams; short docs yield empty") {
    val sh = Seq(("a b c d", 1L), ("a b", 2L)).toDF("text", "id")
      .select(Dedup.wordShingles(col("text"), 3).as("s")).as[Seq[String]].collect()
    assert(sh(0) === Seq("a b c", "b c d"))
    assert(sh(1) === Seq.empty)
  }

  test("jaccard: identical=1, disjoint=0") {
    val j = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        Dedup.jaccard(
          Dedup.wordShingles(col("a.text"), 2),
          Dedup.wordShingles(col("b.text"), 2)).as("j"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((0L, 3L)) === 1.0)
    assert(j((0L, 2L)) === 0.0)
    assert(j((0L, 1L)) > 0.5 && j((0L, 1L)) < 1.0)
  }

  test("exactDedup keeps the smallest id per content hash") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(0L, 1L, 2L)) // 3 dropped (dup of 0)
  }

  test("MinHash-LSH finds the planted near-dup pair and the exact pair") {
    val pairs = Dedup.minHashNearDups(docs, "doc_id", "text",
      k = 16, bands = 8, shingleN = 2, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // exact dup always collides
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated never
  }

  test("SimHash: identical docs equal, near-dups close, unrelated far") {
    val sig = docs.select(col("doc_id"), Dedup.simHash64("text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sig(0L) === sig(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(0L), sig(1L)) < ham(sig(0L), sig(2L)))
    assert(ham(sig(0L), sig(1L)) <= 12)
  }

  test("native simhash kernel matches the HOF executable spec exactly") {
    val both = Tables.documents(spark, sf0001).limit(50)
      .select(Dedup.simHash64("text").as("native"),
        Dedup.simHash64HOF("text").as("hof"))
      .as[(Long, Long)].collect()
    assert(both.forall { case (n, h) => n == h })
  }

  test("portable simhash: hand-computed single-token signature, empty doc → zeros") {
    val got = Seq((0L, ""), (1L, "hello"), (2L, "hello")).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simHash64Portable("text").as("h"))
      .as[(Long, String)].collect().toMap
    assert(got(0L) === "0000000000000000")
    assert(got(1L) === got(2L) && got(1L).length === 16)
    // one token → signature IS that token's 64 md5-derived bits
    // (little-endian uint64 of md5 digest bytes 8..15, hand-computed here)
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8"))
    var h = 0L
    for (i <- 0 until 8) h |= (d(8 + i) & 0xffL) << (8 * i)
    assert(got(1L) === f"${h >>> 32}%08x${h & 0xffffffffL}%08x")
  }

  test("simhash native/HOF parity holds on empty and whitespace-only docs") {
    val both = Seq("", "   ", " \t\n ", "x").toDF("text")
      .select(Dedup.simHash64("text").as("native"),
        Dedup.simHash64HOF("text").as("hof"))
      .as[(Long, Long)].collect()
    assert(both.forall { case (n, h) => n == h }, both.toSeq)
    assert(both(0)._1 === 0L) // no tokens → no votes → 0
  }

  test("native portable minhash matches the md5 HOF executable spec exactly") {
    val k = 8
    val fixture = Tables.documents(spark, sf0001).limit(50)
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((9001L, ""), (9002L, "  "), (9003L, "one two"),
        (9004L, "one two three")).toDF("doc_id", "text"))
    val native = Dedup.withMinHash(fixture, "text", k, shingleN = 3, portable = true)
    val hof = Dedup.withMinHashPortableHOF(fixture, "text", k, shingleN = 3)
    val cols = col("doc_id") +: (0 until k).map(j => col(s"mh$j"))
    val n = native.select(cols: _*).orderBy("doc_id").collect().map(_.toSeq)
    val h = hof.select(cols: _*).orderBy("doc_id").collect().map(_.toSeq)
    assert(n.toSeq === h.toSeq)
    // short docs (< shingleN tokens) → all-null signature on both paths
    val short = n.find(_.head == 9003L).get
    assert(short.drop(1).forall(_ == null))
    // exactly shingleN tokens → one shingle → real signature
    val oneShingle = n.find(_.head == 9004L).get
    assert(oneShingle.drop(1).forall(_ != null))
  }

  test("exactDupGroups canonicalizes like exactDedup: case/whitespace variants collapse") {
    val variants = Seq((0L, "Hello  World"), (1L, "hello world"), (2L, "other"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactDupGroups(variants, "doc_id", "text")
      .select("keeper_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(groups === Set((0L, 2L), (2L, 1L))) // 0 and 1 share a fingerprint
  }

  test("simHashNearDups surfaces the exact-dup pair via bucketing") {
    val got = Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 3L)))
  }

  test("simhash blocking recall is exact at the radius — incl. bits inside the old prefix") {
    // the round-2 single-prefix blocking missed any pair whose differing
    // bit fell in the high 16 bits; the pigeonhole multi-table blocking
    // must find it
    val sigs = Seq(
      (0L, 0L),                  // base
      (1L, 1L << 63),            // Hamming 1 — differing bit IN the old prefix
      (2L, 7L),                  // Hamming 3 vs base, all in one low block
      (3L, (1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)), // Hamming 4
    ).toDF("doc_id", "simhash")
    val got = Dedup.simHashNearDupPairs(sigs, "doc_id", "simhash", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L)), "pair differing inside the old prefix must be found")
    assert(got.contains((0L, 2L)))
    assert(!got.contains((0L, 3L)), "Hamming 4 is beyond the radius")
  }

  test("portable simhash near-dups equal the brute-force Hamming filter (recall proof)") {
    val fixture = Tables.documents(spark, sf0001)
    val got = Dedup.simHashNearDupsPortable(fixture, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val sigs = fixture
      .select(col("doc_id"), Dedup.simHash64Portable("text").as("h"))
      .as[(Long, String)].collect()
      .map { case (id, h) => id -> java.lang.Long.parseUnsignedLong(h, 16) }
    val brute = (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(brute.nonEmpty, "fixture must contain planted simhash near-dups")
    assert(got === brute)
  }

  test("incrementalDedup: within-batch dups collapse, corpus-known content drops") {
    val corpus = Seq((1L, "already ingested text"), (2L, "other old text")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "brand new text"),
      (11L, "brand new text"),        // within-batch dup of 10
      (12L, "Already  Ingested TEXT"), // corpus dup modulo normalization
      (13L, "another fresh one"),
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(batch, corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(10L, 13L))
  }

  test("nearDupComponents: chains merge transitively, keeper is the min id") {
    // component {1,2,3} via chain 1-2, 2-3 (1 and 3 never share an edge);
    // separate component {7,9}; node 5 appears in no pair → absent
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.nearDupComponents(pairs)
      .select("doc_id", "cluster_id", "is_keeper")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (7L, 7L, true), (9L, 7L, false)))
  }

  test("incrementalNearDup: probes stored band columns, drops cross-corpus and within-batch near-dups") {
    // corpus: two long docs, stored as their LSH band columns only
    val tA = (0 until 60).map(i => s"alpha$i").mkString(" ")
    val tB = (0 until 60).map(i => s"beta$i").mkString(" ")
    val corpus = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
    val corpusBands = Dedup.withLshBands(
      Dedup.withMinHash(corpus, "text", k = 16, shingleN = 3), k = 16, bands = 4)
      .select("band0", "band1", "band2", "band3")
    // batch: a NEAR-dup of corpus doc A (one appended word, not an exact
    // copy), a fresh doc, and a within-batch near-dup pair (smaller id wins)
    val tC = (0 until 60).map(i => s"gamma$i").mkString(" ")
    val batch = Seq(
      (10L, tA + " extra"),  // near-dup of corpus A → dropped
      (11L, tC),             // fresh → kept
      (12L, tC + " coda"),   // near-dup of 11 within batch → dropped
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalNearDup(batch, corpusBands, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(11L))
    // survivors carry their band columns (what the corpus sink stores)
    val cols = Dedup.incrementalNearDup(batch, corpusBands, "doc_id", "text").columns.toSet
    assert(Set("band0", "band1", "band2", "band3").subsetOf(cols))
    // portable (md5 minhash) path agrees on the keep decision — the form
    // the qd37 oracle replays
    val corpusBandsP = Dedup.withLshBands(
      Dedup.withMinHash(corpus, "text", k = 16, shingleN = 3, portable = true),
      k = 16, bands = 4).select("band0", "band1", "band2", "band3")
    val keptP = Dedup.incrementalNearDup(batch, corpusBandsP, "doc_id", "text",
        portable = true)
      .select("doc_id").as[Long].collect().toSet
    assert(keptP === Set(11L))
  }

  test("nearDupComponents frees superseded round checkpoint blocks (≤1 RDD resident after)") {
    // localCheckpoint persistence is RDD-level, not CacheManager-level —
    // Dataset.unpersist was a silent no-op on it. The fix unpersists via
    // the LogicalRDD handle; after the run, only the FINAL labels frame
    // (which the returned plan reads) may remain, regardless of how many
    // propagation rounds the component diameter forced.
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // a 12-node chain → many propagation rounds → many per-round checkpoints
    val pairs = (0L until 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.nearDupComponents(pairs)
    assert(got.select("cluster_id").distinct().count() === 1L)
    val leftover = sc.getPersistentRDDs.keySet -- before
    assert(leftover.size <= 1,
      s"expected ≤1 resident checkpoint RDD (the final labels), got ${leftover.size}")
  }

  test("dupPassageProfile counts spans shared across distinct docs") {
    // n=2 spans: doc0 {a b, b c}, doc1 {b c, c d}, doc2 {x y}, doc3 "a"
    // shared (≥2 docs): {b c} → doc0 1/2, doc1 1/2, doc2 0/1, doc3 0/0
    val docs = Seq(
      (0L, "a b c"), (1L, "b c d"), (2L, "x y"), (3L, "a"))
      .toDF("doc_id", "text")
    val out = Dedup.dupPassageProfile(docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(0L) === ((2L, 1L, 0.5)))
    assert(out(1L) === ((2L, 1L, 0.5)))
    assert(out(2L) === ((1L, 0L, 0.0)))
    assert(out(3L) === ((0L, 0L, 0.0))) // sub-n doc: no spans, no division blowup
    // a doc repeating a span INTERNALLY only is not cross-doc duplicated
    val solo = Seq((0L, "p q p q"), (1L, "r s")).toDF("doc_id", "text")
    val soloOut = Dedup.dupPassageProfile(solo, "doc_id", "text", n = 2)
      .filter(col("doc_id") === 0).select("n_dup_spans").as[Long].head()
    assert(soloOut === 0L)
  }

  test("scrubDuplicatedSpans removes exactly the cross-doc duplicated spans") {
    // n=2: docs 0/1 share "b c" → in doc 0 ("a b c d") positions 1..2
    // are covered, keeping "a d"; doc 1 ("b c e") covers 0..1, keeping
    // "e". Doc 2 shares nothing → untouched. Doc 3 is sub-n → untouched.
    // Doc 4 repeats "p q" internally only (one doc) → NOT duplicated.
    val docs = Seq(
      (0L, "a b c d"), (1L, "b c e"), (2L, "x y z"), (3L, "a"),
      (4L, "p q p q"))
      .toDF("doc_id", "text")
    val out = Dedup.scrubDuplicatedSpans(docs, "doc_id", "text", n = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(0L) === (("a d", 4L, 2L)))
    assert(out(1L) === (("e", 3L, 2L)))
    assert(out(2L) === (("x y z", 3L, 0L)))
    assert(out(3L) === (("a", 1L, 0L)))
    assert(out(4L) === (("p q p q", 4L, 0L)))
    // a fully-duplicated doc scrubs to the empty string
    val full = Seq((0L, "m n o"), (1L, "m n o")).toDF("doc_id", "text")
    val fullOut = Dedup.scrubDuplicatedSpans(full, "doc_id", "text", n = 3)
      .select("clean_text", "n_removed_tokens").as[(String, Long)].collect()
    assert(fullOut.toSet === Set(("", 3L)))
    // overlapping duplicated spans cover the union, not double-count:
    // docs share "a b" and "b c" → doc 0 covers 0..2 (3 tokens), not 4
    val ovl = Seq((0L, "a b c x"), (1L, "a b q"), (2L, "r b c"))
      .toDF("doc_id", "text")
    val ovlOut = Dedup.scrubDuplicatedSpans(ovl, "doc_id", "text", n = 2)
      .filter(col("doc_id") === 0)
      .select("clean_text", "n_removed_tokens").as[(String, Long)].head()
    assert(ovlOut === (("x", 3L)))
  }

  test("scrubDuplicatedSpans: positional-hash fast path ≡ portable string path") {
    val corpus = Tables.documents(spark, sf0001)
    def run(portable: Boolean) =
      Dedup.scrubDuplicatedSpans(corpus, "doc_id", "text", n = 5, portable)
        .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val fast = run(portable = false)
    val port = run(portable = true)
    assert(fast === port)
    // scrub agrees with the qd32 profile: zero dup_frac ⇔ zero removals
    val prof = Dedup.dupPassageProfile(corpus, "doc_id", "text", n = 5)
      .select("doc_id", "n_dup_spans").as[(Long, Long)].collect().toMap
    fast.foreach { case (id, _, _, removed) =>
      assert((prof(id) > 0) === (removed > 0),
        s"doc $id: profile n_dup_spans=${prof(id)} but scrub removed=$removed")
    }
  }

  test("scrubDuplicatedSpans: 50k-token docs scrub exactly the shared block (linear re-assembly)") {
    // Two long docs, unique except for one 500-token block planted in the
    // middle of each. With n=5, only spans wholly inside the block repeat
    // cross-doc (boundary spans mix in unique tokens), so covered indices
    // are exactly the block: 500 removals per doc. Exercises the
    // 100k-token tail the old per-token array_contains re-assembly paid
    // O(m·c) on — this completes in seconds, not minutes, when linear.
    val block = (0 until 500).map(i => s"s$i").mkString(" ")
    def doc(prefix: String): String = {
      val head = (0 until 25000).map(i => s"$prefix$i").mkString(" ")
      val tail = (25000 until 49500).map(i => s"$prefix$i").mkString(" ")
      s"$head $block $tail"
    }
    val docs = Seq((1L, doc("a")), (2L, doc("b"))).toDF("doc_id", "text")
    val out = Dedup.scrubDuplicatedSpans(docs, "doc_id", "text", n = 5)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    out.foreach { case (id, clean, nTok, removed) =>
      assert(nTok === 50000L, s"doc $id token count")
      assert(removed === 500L, s"doc $id removals")
      val cleanToks = clean.split(" ")
      assert(cleanToks.length === 49500, s"doc $id survivor count")
      assert(!cleanToks.exists(_.startsWith("s")), s"doc $id block survived")
    }
    // survivors keep their original ORDER (indexed gather, not a set op)
    val aClean = out.find(_._1 == 1L).get._2.split(" ")
    assert(aClean.take(3).toSeq === Seq("a0", "a1", "a2"))
    assert(aClean.last === "a49499")
    assert(aClean(25000) === "a25000") // token right after the scrubbed block
  }

  test("intraDocDupNgramFraction covers tokens of within-doc repeated n-grams") {
    // n=2: "p q p q" → "p q" occurs at 0 and 2 ("q p" once) → covered
    // {0,1,2,3} = 4/4; "a b c" has no repeats → 0; "x x x" → "x x" at
    // 0,1 → covered {0,1,2} = 3/3
    val docs = Seq((0L, "p q p q"), (1L, "a b c"), (2L, "x x x"))
      .toDF("doc_id", "text")
    val out = Dedup.intraDocDupNgramFraction(docs, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(0L) === ((4L, 4L, 1.0)))
    assert(out(1L) === ((3L, 0L, 0.0)))
    assert(out(2L) === ((3L, 3L, 1.0)))
    // fast ≡ portable on the fixture corpus
    val corpus = Tables.documents(spark, sf0001)
    def run(portable: Boolean) =
      Dedup.intraDocDupNgramFraction(corpus, "doc_id", "text", n = 3, portable)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(run(portable = false) === run(portable = true))
  }

  test("dupPassageProfile: xxhash64 fast path ≡ portable string-span path") {
    // the fast path keys the profile's shuffles by 8-byte shingle
    // hashes instead of raw span strings — same counts row for row
    // (collisions would need two different spans hashing equal in 64
    // bits); the portable path IS the oracle formulation qd32 replays
    val corpus = Tables.documents(spark, sf0001)
    val fast = Dedup.dupPassageProfile(corpus, "doc_id", "text", n = 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val portable = Dedup.dupPassageProfile(corpus, "doc_id", "text", n = 5,
      portable = true)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(fast.length === portable.length)
    assert(fast === portable)
  }

  test("sourceOverlap (qd41): hand-computed pair matrix; zero-overlap pairs omitted") {
    val docs = Seq(
      (1L, "a b c d", "srcA"), (2L, "a b c", "srcA"),   // A = {a b c, b c d}
      (3L, "b c d e", "srcB"),                          // B = {b c d, c d e}
      (4L, "x y z w", "srcC"))                          // C disjoint
      .toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(docs, "source", "text", n = 3, portable = true)
      .as[(String, String, Long, Long, Long, Double)].collect()
    // only A-B share a gram ({b c d}): J = 1/(2+2-1) = 1/3
    assert(got.toSeq === Seq(("srcA", "srcB", 2L, 2L, 1L, 0.333333)))
  }

  test("sourceOverlap: xxhash64 fast path agrees with the portable path") {
    val corpus = Tables.documents(spark, sf0001)
    val fast = Dedup.sourceOverlap(corpus, "source", "text", n = 3)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))
    val portable = Dedup.sourceOverlap(corpus, "source", "text", n = 3,
        portable = true)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2))
    assert(fast.length === portable.length)
    assert(fast === portable)
  }

  test("sourceOverlapSketch (qd44): estimate within the MinHash error bound of exact Jaccard") {
    // Controlled-overlap fixture: A and B share a 100-word block (~98
    // shared 3-gram shingles) plus ~100 unique shingles each → exact
    // J ≈ 0.33; C is disjoint. k=256 gives σ = √(J(1−J)/256) ≈ 0.03;
    // the 0.1 tolerance is >3σ, and the xxhash permutations make the
    // estimate deterministic, so this is a stable contract, not a
    // flaky sample.
    val shared = (0 until 100).map(i => s"common$i").mkString(" ")
    val ua = (0 until 100).map(i => s"aonly$i").mkString(" ")
    val ub = (0 until 100).map(i => s"bonly$i").mkString(" ")
    val uc = (0 until 50).map(i => s"conly$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared $ua", "srcA"), (2L, s"$shared $ub", "srcB"),
      (3L, uc, "srcC")).toDF("doc_id", "text", "source")
    val exact = Dedup.sourceOverlap(docs, "source", "text", n = 3)
      .select("source_a", "source_b", "jaccard")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val est = Dedup.sourceOverlapSketch(docs, "source", "text", n = 3)
      .select("source_a", "source_b", "jaccard_est")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // full matrix: all 3 pairs present, including the disjoint ones
    assert(est.keySet === Set(("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")))
    val j = exact(("srcA", "srcB"))
    assert(j > 0.2 && j < 0.5, s"fixture drifted: exact J = $j")
    assert(math.abs(est(("srcA", "srcB")) - j) <= 0.1,
      s"sketch estimate ${est(("srcA", "srcB"))} vs exact $j out of bound")
    // disjoint sources: no permutation can collide outside hash luck
    assert(est(("srcA", "srcC")) === 0.0 && est(("srcB", "srcC")) === 0.0)

    // and on the real fixture corpus: every exact pair's estimate within
    // the same bound; pairs the exact form omits (zero overlap) stay ≈ 0
    val corpus = Tables.documents(spark, sf0001)
    val exactC = Dedup.sourceOverlap(corpus, "source", "text", n = 3)
      .select("source_a", "source_b", "jaccard")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val estC = Dedup.sourceOverlapSketch(corpus, "source", "text", n = 3)
      .select("source_a", "source_b", "jaccard_est")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    exactC.foreach { case (pair, ex) =>
      assert(math.abs(estC(pair) - ex) <= 0.1,
        s"pair $pair: sketch ${estC(pair)} vs exact $ex out of bound")
    }
    (estC.keySet -- exactC.keySet).foreach { pair =>
      assert(estC(pair) <= 0.05, s"zero-overlap pair $pair estimated ${estC(pair)}")
    }
  }

  test("sourceOverlapSketch: a source whose texts are all shorter than n tokens still appears, with zero estimates") {
    // "tiny" yields ZERO 3-gram shingles (both texts under 3 tokens) —
    // round 9 silently dropped it from the matrix; it must appear in
    // every pair with Ĵ = 0 and size 0 (its true values)
    val docs = Seq(
      (1L, (0 until 50).map(i => s"ww$i").mkString(" "), "big"),
      (2L, (0 until 50).map(i => s"vv$i").mkString(" "), "big2"),
      (3L, "too short", "tiny"), (4L, "also", "tiny")).toDF("doc_id", "text", "source")
    val est = Dedup.sourceOverlapSketch(docs, "source", "text", n = 3)
      .select("source_a", "source_b", "n_grams_a_est", "n_grams_b_est",
        "n_shared_grams_est", "jaccard_est")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(est.keySet === Set(("big", "big2"), ("big", "tiny"), ("big2", "tiny")),
      s"matrix incomplete: ${est.keySet}")
    val (na, _, shared, j) = est(("big", "tiny"))
    assert(na > 0L && est(("big", "tiny"))._2 === 0L)
    assert(shared === 0L && j === 0.0)
    assert(est(("big2", "tiny"))._4 === 0.0)
  }

  test("fuzzyDecontaminate (qd45): paraphrased benchmark rows flagged, clean docs and sub-threshold overlaps kept") {
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),                                      // leaked (paraphrased in bench)
      (2L, (0 until 60).map(i => s"other$i").mkString(" ")), // clean
      (3L, (0 until 60).map(i => s"misc$i").mkString(" ")))  // clean
      .toDF("doc_id", "text")
    val bench = Seq(
      (9001L, base + " reworded tail"),                // near-dup of doc 1
      (9002L, (0 until 60).map(i => s"eval$i").mkString(" "))) // unrelated eval row
      .toDF("bench_id", "text")
    val out = Dedup.fuzzyDecontaminate(docs, "doc_id", "text",
        bench, "bench_id", "text", minJaccard = 0.5)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet === Set(1L, 2L, 3L), "one row per corpus doc")
    val (n1, j1, c1) = out(1L)
    assert(c1 && n1 === 1L && j1 > 0.9, s"leaked doc not flagged: $n1 $j1")
    assert(out(2L) === ((0L, 0.0, false)))
    assert(out(3L) === ((0L, 0.0, false)))
    // the exact gate under-weights the same leak: doc 1 shares MOST of
    // its grams, which fuzzyDecontaminate turns into J ≈ 0.95 — while a
    // doc sharing a couple of stock phrases stays unflagged here even
    // though the exact gate counts its grams
    val stock = "as shown in figure one"
    val docs2 = Seq((1L, base), (4L, s"$stock " +
      (0 until 55).map(i => s"own$i").mkString(" "))).toDF("doc_id", "text")
    val bench2 = Seq((9001L, base + " reworded tail"),
      (9003L, s"$stock " + (0 until 55).map(i => s"bench$i").mkString(" ")))
      .toDF("bench_id", "text")
    val out2 = Dedup.fuzzyDecontaminate(docs2, "doc_id", "text",
        bench2, "bench_id", "text", minJaccard = 0.5)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out2(1L) && !out2(4L),
      "stock-phrase overlap must stay below the near-dup threshold")
    // portable (md5) and fast (xxhash) paths agree on the flag set
    val fast = Dedup.fuzzyDecontaminate(docs, "doc_id", "text",
        bench, "bench_id", "text", minJaccard = 0.5, portable = false)
      .filter(col("contaminated_near")).select("doc_id").as[Long].collect().toSet
    val portable = Dedup.fuzzyDecontaminate(docs, "doc_id", "text",
        bench, "bench_id", "text", minJaccard = 0.5, portable = true)
      .filter(col("contaminated_near")).select("doc_id").as[Long].collect().toSet
    assert(fast === portable && fast === Set(1L))
  }

  test("fingerprint is whitespace/case-insensitive; rollingTokenHash is order-sensitive") {
    // "a b c\n": boundary tab/newline must fold onto the bare form (trim
    // strips only spaces, so the canon collapses whitespace BEFORE trim)
    val fp = Seq(("A  b\tc", 1), ("a b c", 2), ("c b a", 3), ("a b c\n", 4),
        ("\ta b c", 5)).toDF("text", "id")
      .select(TextAnalysis.fingerprint(col("text")).as("f"),
        TextAnalysis.rollingTokenHash(col("text")).as("r"))
      .as[(String, Long)].collect()
    assert(fp(0)._1 === fp(1)._1) // normalization collapses case+whitespace
    assert(fp(1)._1 !== fp(2)._1)
    assert(fp(1)._2 !== fp(2)._2) // rolling hash sees token order
    assert(fp(3)._1 === fp(1)._1) // trailing newline variant dedups
    assert(fp(4)._1 === fp(1)._1) // leading tab variant dedups
  }

  test("qualityKeepers: the best-scoring cluster member wins over the min id; ties break to the smaller id") {
    val comps = Seq((1L, 1L), (5L, 1L), (9L, 1L), (20L, 20L), (21L, 20L))
      .toDF("doc_id", "cluster_id")
    val scored = Seq((1L, 0.10), (5L, 0.40), (9L, 0.40), (20L, 0.25),
      (21L, 0.25)).toDF("doc_id", "score")
    val got = Dedup.qualityKeepers(comps, scored, "doc_id", "score")
      .select("doc_id", "keeper_id", "is_keeper")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // cluster 1: docs 5 and 9 tie on 0.40 → smaller id 5 wins (NOT the
    // min-id member 1, whose score is worst)
    assert(got(1L) === (5L, false))
    assert(got(5L) === (5L, true))
    assert(got(9L) === (5L, false))
    // cluster 20: exact tie → min id
    assert(got(20L) === (20L, true))
    assert(got(21L) === (20L, false))
  }

  test("NFC canon: composed and decomposed spellings dedup together — and the legacy canon provably fails") {
    // "Café" composed (U+00E9) vs decomposed (e + U+0301): visually
    // identical, byte-distinct. Combining marks as escapes so no tool
    // silently recomposes them.
    val composed = "Caf\u00e9 latte with cr\u00e8me"
    val decomposed = "Cafe\u0301 latte with cre\u0300me"
    val df = Seq((1L, composed), (2L, decomposed), (3L, "unrelated doc text"))
      .toDF("doc_id", "text")
    // exact dedup: the pair collapses under the NFC canon
    val kept = Dedup.exactDedup(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L))
    // the legacy (pre-NFC) canon hashes them APART — the leak the
    // unification closes; delete this assert if legacyFingerprint is
    // ever removed
    val legacy = df.filter(col("doc_id") <= 2)
      .select(TextAnalysis.legacyFingerprint(col("text"))).distinct().count()
    assert(legacy === 2L)
    val current = df.filter(col("doc_id") <= 2)
      .select(TextAnalysis.fingerprint(col("text"))).distinct().count()
    assert(current === 1L)
    // MinHash near-dup: the decomposed twin now verifies at jaccard 1.0
    val pairs = Dedup.minHashNearDups(df, "doc_id", "text",
      k = 16, bands = 8, shingleN = 2, minJaccard = 0.9)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.toSeq === Seq((1L, 2L, 1.0)))
    // exact n-gram decontamination: a decomposed leak of a composed
    // benchmark row still gates
    val gate = TextAnalysis.decontaminate(
      Seq((10L, decomposed)).toDF("doc_id", "text"), "doc_id", "text",
      Seq(Tuple1(composed)).toDF("text"), "text", n = 2)
    assert(gate.filter(col("contaminated")).count() === 1L)
  }

  // ------------------------------------------------- winnowing (qd51)

  test("winnowFingerprints: the winnowing guarantee — a shared >= w+k-1 token run yields a shared fingerprint") {
    // k=3, w=4 → guarantee threshold = 6 tokens; the planted run is 8
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel"
    val docs = Seq(
      (1L, s"one two three $shared nine ten eleven twelve"),
      (2L, s"aa bb cc dd ee $shared zz yy xx"),
      (3L, "totally disjoint words with no overlap at all here friend"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .as[(Long, Long, String)].collect()
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty, "planted run missed")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty, "disjoint docs share a fingerprint")
  }

  test("winnowFingerprints: rightmost-min tie rule and full-window-only selection") {
    // every 3-gram of a constant doc hashes identically, so each window's
    // winner is its RIGHTMOST gram: starts 0..ngr-w pick pos w-1..ngr-1 —
    // hash-value-independent, so this pins the tie rule exactly
    val n = 10 // tokens
    val docs = Seq((1L, Seq.fill(n)("x").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .as[(Long, Long, String)].collect().map(_._2).sorted.toSeq
    val ngr = n - 3 + 1 // 8 grams
    assert(got === (3L until ngr.toLong)) // pos w-1=3 .. ngr-1=7
  }

  test("winnowFingerprints: density bound and gap bound on fixture docs; short docs yield nothing") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .as[(Long, Long, String)].collect()
    assert(fps.nonEmpty)
    // winnowing property: consecutive selected positions differ by <= w
    // (every window has a winner), and far fewer grams are kept than exist
    fps.groupBy(_._1).foreach { case (id, rows) =>
      val pos = rows.map(_._2).sorted
      pos.zip(pos.tail).foreach { case (a, b) =>
        assert(b - a <= 4, s"doc $id: selection gap ${b - a} > w")
      }
    }
    // a doc with fewer than w full grams (< k+w-1 = 6 tokens) selects nothing
    val short = Seq((9L, "just five tokens right here")).toDF("doc_id", "text")
    assert(Dedup.winnowFingerprints(short, "doc_id", "text", k = 3, w = 4)
      .count() === 0L)
  }

  test("winnowFingerprints kernel ≡ relational formulation, including degenerate docs") {
    // ids far outside the fixture range — doc ids must be unique (the
    // relational window keys on them; the kernel is per-row either way).
    // 900095/900096 pin the boundary-whitespace canon: `trim` strips
    // only spaces, so without wsTrim a trailing \n / leading \t makes
    // split() emit a phantom "" token and the two paths diverge
    val edge = Seq((900090L, ""), (900091L, "   \t  "), (900092L, "just two"),
      (900093L, "a b c d e f"), (900094L, "x  y\tz  x y z x y z"),
      (900095L, "alpha bravo charlie delta echo foxtrot golf hotel\n"),
      (900096L, "\tword1 word2 word3 word4 word5 word6 word7\r\n"))
      .toDF("doc_id", "text")
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .unionByName(edge)
    def run(relational: Boolean) =
      Dedup.winnowFingerprints(docs, "doc_id", "text", relational = relational)
        .as[(Long, Long, String)].collect().toSet
    assert(run(relational = false) === run(relational = true))
  }

  test("winnowFingerprints plans: kernel is shuffle-FREE; relational runs exactly one") {
    val docs = Tables.documents(spark, sf0001)
    def finalPlan(relational: Boolean): String = {
      val res = Dedup.winnowFingerprints(docs, "doc_id", "text",
        relational = relational)
      res.collect() // finalize the adaptive plan
      // the AQE plan string prints final AND initial sections — count
      // Exchanges in the final plan only
      res.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    }
    val kernel = finalPlan(relational = false)
    assert(!kernel.contains("Exchange"), s"kernel shuffled:\n$kernel")
    assert(!kernel.contains("Window"), s"kernel windowed:\n$kernel")
    // window partition (doc_id) ⊇-satisfies the distinct's clustering on
    // (doc, pos, hash) — a second Exchange here would mean that reuse broke
    val rel = finalPlan(relational = true)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(rel).length
    assert(exchanges === 1, s"$exchanges exchanges:\n$rel")
  }

  test("winnowFingerprints is partitioning-invariant") {
    val docs = Tables.documents(spark, sf0001).limit(30)
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.winnowFingerprints(df, "doc_id", "text", k = 3, w = 4)
        .as[(Long, Long, String)].collect().toSet
    assert(run(docs.repartition(1)) === run(docs.repartition(7)))
  }

  test("winnowOverlapPairs: planted near-copy surfaces; maxDf caps boilerplate fan-out") {
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (
      // 20 docs sharing ONLY a boilerplate prefix + unique tails
      (1L to 20L).map(i => (i, s"$boiler unique$i tail$i words$i here$i now$i")) :+
      // a planted near-copy pair with a long distinct shared run
      (100L, "zeta eta theta iota kappa lambda mu nu xi omicron pi rho") :+
      (101L, "intro zeta eta theta iota kappa lambda mu nu xi omicron pi rho outro"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
    // with the cap at 5, the 20-doc boilerplate fingerprints (df=20) are
    // dropped — the planted pair (df=2) must still surface
    val pairs = Dedup.winnowOverlapPairs(fps, minShared = 2, maxDf = 5)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 === 100L && p._2 === 101L), s"planted pair missed: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 <= 20L && p._2 <= 20L),
      s"boilerplate-only pair survived the df cap: ${pairs.toSeq}")
    // without the cap the boilerplate pairs flood in — the cap is load-bearing
    val uncapped = Dedup.winnowOverlapPairs(fps, minShared = 2, maxDf = 1000)
      .as[(Long, Long, Long)].collect()
    assert(uncapped.count(p => p._1 <= 20L && p._2 <= 20L) > 100)
  }

  test("containmentPairs (qd53): a verbatim quote has high containment but low Jaccard") {
    val quote = "portable oracle replay keeps both engines honest always"
    val long = (1 to 30).map(i => s"filler$i").mkString(" ") +
      s" $quote " + (31 to 60).map(i => s"filler$i").mkString(" ")
    val docs = Seq(
      (1L, quote),                  // 8 tokens — entirely inside doc 2
      (2L, long),
      (3L, "unrelated content words that match nothing else at all today"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        minShared = 1, minContainment = 0.5)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    val p = got.find(r => r._1 == 1L && r._2 == 2L)
    assert(p.nonEmpty, s"quote pair missed: ${got.toSeq}")
    // doc 1's grams all occur in doc 2 → containment_a = 1.0; the
    // resemblance is tiny — exactly the pair Jaccard-LSH misses
    assert(p.get._4 === 1.0, s"containment_a ${p.get._4}")
    assert(p.get._6 < 0.2, s"jaccard ${p.get._6}")
    assert(!got.exists(r => r._1 == 3L || r._2 == 3L))
  }

  test("sourceContainment (qd56): a subset source shows containment 1.0 at low Jaccard") {
    // source A's entire gram set occurs inside source B's bigger text
    val aText = "alpha bravo charlie delta echo foxtrot"      // 4 3-grams
    val bText = s"intro1 intro2 intro3 $aText tail1 tail2 tail3 tail4 tail5 tail6"
    val docs = Seq(("A", 1L, aText), ("B", 2L, bText),
      ("C", 3L, "totally different words in here my friend now then"))
      .toDF("source", "doc_id", "text")
    val overlap = Dedup.sourceOverlap(docs, "source", "text", n = 3, portable = true)
    val got = Dedup.sourceContainment(overlap)
      .as[(String, String, Long, Long, Double)].collect()
      .map(x => (x._1, x._2) -> x).toMap
    assert(got(("A", "B"))._5 === 1.0, s"A in B: ${got(("A", "B"))}")
    assert(got(("B", "A"))._5 < 0.5, s"B in A: ${got(("B", "A"))}")
    // directed rows are exactly 2x the unordered pairs, and containment
    // always bounds the symmetric Jaccard from above
    val ov = overlap.as[(String, String, Long, Long, Long, Double)].collect()
    assert(got.size === 2 * ov.length)
    ov.foreach { o =>
      assert(got((o._1, o._2))._5 >= o._6 - 1e-9)
      assert(got((o._2, o._1))._5 >= o._6 - 1e-9)
    }
  }

  test("containmentPairs: containment bounds Jaccard; threshold filters; fast ≡ portable") {
    val docs = Tables.documents(spark, sf0001)
    def run(portable: Boolean) = Dedup.containmentPairs(docs, "doc_id", "text",
        minShared = 2, maxDf = 50, minContainment = 0.3, portable = portable)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    val got = run(portable = true)
    assert(got.nonEmpty, "no containment pairs on the fixture")
    got.foreach { r =>
      assert(r._4 >= r._6 - 1e-9 && r._5 >= r._6 - 1e-9,
        s"containment below jaccard: $r")
      assert(math.max(r._4, r._5) >= 0.3)
      assert(r._4 <= 1.0 && r._5 <= 1.0 && r._6 <= 1.0)
    }
    // hashed-gram production twin: identical pair set AND values (the
    // shared md5 winnowing candidates + collision-free xxhash64 sets)
    assert(run(portable = false).sortBy(r => (r._1, r._2)).toSeq ===
      got.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("lshRecallProbe: sampling respected, flags consistent with the banding, misses surface") {
    import graft.functions.NativeExpressions
    // find ids on each side of the 50-bucket sample line
    val buckets = spark.range(0, 200)
      .select(col("id"), NativeExpressions.md5Bucket(col("id").cast("string"), 100).as("b"))
      .as[(Long, Long)].collect().toMap
    val inIds = (0L until 200L).filter(buckets(_) < 50)
    val outIds = (0L until 200L).filter(buckets(_) >= 50)
    assert(inIds.size >= 25 && outIds.size >= 2)

    val baseWords = (0 until 40).map(i => s"base$i")
    def variant(seed: Int): String =
      // keep the first 28 base words, replace the tail -> shingle
      // jaccard ≈ 26/50 ≈ 0.52: above the 0.5 truth threshold, well
      // under the ≈0.71 banding threshold, so the 4x4 bands miss a
      // P=1-(1-j^4)^4 ≈ 0.32 fraction... i.e. ~2/3 of these plants
      (baseWords.take(28) ++ (0 until 12).map(j => s"v${seed}u$j")).mkString(" ")

    val base = baseWords.mkString(" ")
    val nearClone = (baseWords.take(39) :+ "clonetail").mkString(" ") // j ≈ 0.9
    val docs =
      Seq((inIds(0), base), (inIds(1), nearClone)) ++           // found plant
      (2 until 22).map(i => (inIds(i), variant(i))) ++          // miss plants
      Seq((outIds(0), base), (outIds(1), nearClone))            // OUT of sample
    val df = docs.toDF("doc_id", "text")

    val probe = graft.functions.Dedup.lshRecallProbe(df, "doc_id", "text",
      sampleBuckets = 50, totalBuckets = 100, minJaccard = 0.5, portable = true)
      .select("id_a", "id_b", "found_by_lsh")
      .as[(Long, Long, Boolean)].collect().toSeq

    // sampling: the out-of-sample clone pair never appears
    assert(!probe.exists(p => p._1 == outIds(0) || p._2 == outIds(0) ||
      p._1 == outIds(1) || p._2 == outIds(1)))
    // the 0.9-jaccard pair is truth and found
    val clonePair = probe.filter(p =>
      Set(p._1, p._2) == Set(inIds(0), inIds(1)).map(identity))
    assert(clonePair.map(_._3) === Seq(true))
    // the probe's flags ARE the banding's verdicts: found set == the
    // production pair set over the same sample
    val sample = df.filter(
      NativeExpressions.md5Bucket(col("doc_id").cast("string"), 100) < lit(50))
    val lshPairs = graft.functions.Dedup.minHashNearDups(sample, "doc_id", "text",
        k = 16, bands = 4, shingleN = 3, minJaccard = 0.5, portable = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    probe.foreach { case (a, b, f) => assert(f === lshPairs.contains((a, b)), s"($a,$b)") }
    // the mid-jaccard plants exercise BOTH flag values (the banding
    // curve leaves ~2/3 of j≈0.52 pairs uncandidated; deterministic
    // given the md5 signatures)
    assert(probe.exists(!_._3), "expected at least one banding miss")
    assert(probe.exists(_._3))
  }
}
