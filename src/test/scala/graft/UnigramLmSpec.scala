package graft

import org.apache.spark.sql.functions._

import graft.functions.{NativeExpressions, UnigramLm}

/** Unigram-LM hard-EM semantics: Viterbi kernel vs a brute-force
  * all-paths reference (the same proof shape the oracle uses), the
  * deterministic tie ladder, seed-vocab contract, EM pruning/keep-alive
  * behavior, char-fallback totality, and partitioning invariance.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force: enumerate every segmentation, rank with the kernel's
    * exact order (score desc, pieces asc, seg asc).
    */
  private def bruteBest(w: String, sc: Map[String, Long]): String = {
    def paths(rest: String): Seq[List[String]] =
      if (rest.isEmpty) Seq(Nil)
      else (1 to rest.length).flatMap { l =>
        val p = rest.take(l)
        if (sc.contains(p)) paths(rest.drop(l)).map(p :: _) else Nil
      }
    paths(w)
      .map(ps => (ps.map(sc).sum, ps.length, ps.mkString(" ")))
      .minBy { case (s, n, seg) => (-s, n, seg) }._3
  }

  private def viterbi(w: String, pieces: Seq[(String, Long)]): String =
    Seq(w).toDF("word")
      .select(NativeExpressions.unigramViterbi(col("word"), pieces).as("seg"))
      .as[String].head()

  test("Viterbi kernel equals the all-paths brute force on real corpus words") {
    val docs = graft.sources.Tables.documents(spark, sf0001).limit(150)
    val vocab = UnigramLm.seedVocab(
      UnigramLm.wordFreqs(docs, "text").localCheckpoint(), 4, 40)
    val sc = UnigramLm.scores(vocab)
    val scMap = sc.toMap
    val words = UnigramLm.wordFreqs(docs, "text")
      .select("word").as[String].collect().toSeq
    val got = docs.sparkSession.createDataset(words).toDF("word")
      .select(col("word"), NativeExpressions.unigramViterbi(col("word"), sc).as("seg"))
      .as[(String, String)].collect().toMap
    words.foreach { w =>
      assert(got(w) === bruteBest(w, scMap), s"word=$w")
    }
  }

  test("tie ladder: equal score -> fewer pieces; equal both -> lexicographic") {
    // 'ab' with {a:-10, b:-10, ab:-20}: both segmentations score -20;
    // 'ab' has fewer pieces
    assert(viterbi("ab", Seq(("a", -10L), ("b", -10L), ("ab", -20L))) === "ab")
    // 'aa' with {a:-10, aa:-20}: scores tie, 'aa' wins on pieces;
    // remove 'aa' -> 'a a'
    assert(viterbi("aa", Seq(("a", -10L), ("aa", -20L))) === "aa")
    assert(viterbi("aa", Seq(("a", -10L))) === "a a")
    // score dominates: cheaper two-piece split beats expensive one piece
    assert(viterbi("ab", Seq(("a", -1L), ("b", -1L), ("ab", -20L))) === "a b")
    // equal score AND equal pieces -> lexicographically smallest seg
    assert(viterbi("abc",
      Seq(("ab", -10L), ("c", -10L), ("a", -10L), ("bc", -10L))) === "a bc")
  }

  test("char fallback is total: uncovered characters segment as single chars") {
    assert(viterbi("axb", Seq(("a", -1L), ("b", -1L))) === "a x b")
    assert(viterbi("x", Seq(("a", -1L))) === "x")
  }

  test("char fallback emits whole code points, never lone surrogates") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, two UTF-16 units
    // uncovered astral char falls back as ONE two-unit piece
    assert(viterbi(s"a${clef}b", Seq(("a", -1L), ("b", -1L))) === s"a $clef b")
    // astral-only word: one piece, not two surrogate halves
    assert(viterbi(clef + clef, Seq(("a", -1L))) === s"$clef $clef")
    // a vocab piece CONTAINING the astral char still matches whole
    assert(viterbi(s"$clef", Seq((clef, -1L))) === clef)
    // and mixed: vocab covers the astral char, fallback covers the rest
    assert(viterbi(s"x$clef", Seq((clef, -1L))) === s"x $clef")
  }

  test("seed vocab: topM + all single chars, overlap-counted") {
    val words = Seq("aaa").toDF("text")
    val v = UnigramLm.seedVocab(
      UnigramLm.wordFreqs(words, "text"), maxPieceLen = 2, topM = 1).toMap
    // substrings of 'aaa': a x3, aa x2 (overlapping); topM=1 keeps 'a',
    // chars add nothing new
    assert(v === Map("a" -> 3L))
    val v2 = UnigramLm.seedVocab(
      UnigramLm.wordFreqs(Seq("ab ab").toDF("text"), "text"), 2, 1).toMap
    // top-1 is 'a' (cnt 2, lexicographic over b/ab); chars keep 'b'
    assert(v2 === Map("a" -> 2L, "b" -> 2L))
  }

  test("EM prunes multi-char losers, keep-alive floors chars") {
    // corpus 'ab' x3: seed (topM=4) = {a:3, ab:3, b:3}; scores equal for
    // a/ab/b, Viterbi picks 'ab' (fewer pieces) -> a,b lose all counts
    // but survive at floor 1; 'ab' keeps cnt 3
    val vocab = UnigramLm.trainVocab(Seq("ab ab ab").toDF("text"), "text",
      maxPieceLen = 2, topM = 4, iters = 2).toMap
    assert(vocab === Map("ab" -> 3L, "a" -> 1L, "b" -> 1L))
  }

  test("model is a pure function of the corpus: partitioning-invariant") {
    val base = graft.sources.Tables.documents(spark, sf0001).limit(120)
    val one = UnigramLm.train(base.repartition(1), "text", 4, 30, 2)
      .select("piece", "cnt").as[(String, Long)].collect().toSeq
    val many = UnigramLm.train(base.repartition(7), "text", 4, 30, 2)
      .select("piece", "cnt").as[(String, Long)].collect().toSeq
    assert(one === many)
  }

  test("encodeIds: model-order ids, dense positions, reassembly, explicit UNK") {
    val vocab = Seq(("lo", 10L), ("w", 5L), ("l", 1L), ("o", 1L))
    val rows = UnigramLm.encodeIds(
        Seq((1L, "low lo"), (2L, "w")).toDF("doc_id", "text"),
        "doc_id", "text", vocab)
      .orderBy("doc_id", "pos")
      .select("doc_id", "pos", "piece", "token_id")
      .as[(Long, Int, String, Int)].collect().toSeq
    // ids in (cnt desc, piece asc) order: lo=0, w=1, l=2, o=3
    // doc 1: low → lo w; lo → lo. doc 2: w.
    assert(rows === Seq(
      (1L, 0, "lo", 0), (1L, 1, "w", 1), (1L, 2, "lo", 0),
      (2L, 0, "w", 1)))
    // a tie on cnt breaks to the lexicographically smaller piece
    val tied = UnigramLm.encodeIds(
        Seq((1L, "ba")).toDF("doc_id", "text"),
        "doc_id", "text", Seq(("a", 3L), ("b", 3L)))
      .orderBy("pos").select("piece", "token_id")
      .as[(String, Int)].collect().toSeq
    assert(tied === Seq(("b", 1), ("a", 0)))
    // char-fallback pieces outside the vocab are explicit -1, not drops
    val unk = UnigramLm.encodeIds(
        Seq((1L, "az")).toDF("doc_id", "text"),
        "doc_id", "text", Seq(("a", 3L)))
      .orderBy("pos").select("piece", "token_id")
      .as[(String, Int)].collect().toSeq
    assert(unk === Seq(("a", 0), ("z", -1)))
  }

  test("fertility: segmentation piece counts roll up per doc") {
    val vocab = Seq(("lo", 10L), ("w", 5L), ("l", 1L), ("o", 1L))
    val got = UnigramLm.fertility(
        Seq((1L, "low low"), (2L, "lo")).toDF("doc_id", "text"),
        "doc_id", "text", vocab)
      .orderBy("doc_id")
      .select("doc_id", "n_words", "n_pieces", "fertility")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // 'low' -> lo w (2 pieces), 'lo' -> lo (1)
    assert(got === Seq((1L, 2L, 4L, 2.0), (2L, 1L, 1L, 1.0)))
  }
}
