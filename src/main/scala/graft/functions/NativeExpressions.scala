package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row kernels of the dedup /
  * similarity operators. The higher-order-function formulations
  * (transform/aggregate/zip_with) are semantically identical but evaluate
  * one interpreted Catalyst expression node per array element — at 50k
  * docs × ~100 shingles × 8 permutations that is tens of millions of
  * interpreted evals (measured: 69 s / 105 s at sf0.1). These kernels do
  * one JVM-tight loop per row instead (measured: >20× faster), the
  * preference-order (b) path of the build rules: a custom `Expression`
  * before a custom operator, a UDF never.
  *
  * Hashing matches `functions.xxhash64` exactly (XXH64, seed 42), so the
  * HOF and native paths are interchangeable.
  */
object NativeExpressions {

  private final val Seed = 42L

  /** Byte-level ASCII-whitespace tokenizer over the UTF8String's backing
    * bytes: multi-byte UTF-8 code points never contain ASCII whitespace
    * bytes, so this is split-on-\s+ without materializing substrings.
    * Callback receives (base, offsetInBase, lengthBytes) per token.
    */
  @inline private def foreachToken(s: UTF8String)(f: (Object, Long, Int) => Unit): Unit = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      while (i < n && isSpace(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      val start = i
      while (i < n && !isSpace(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
      if (i > start) f(base, off + start, i - start)
    }
  }

  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** splitmix64 — deterministic per-permutation coefficients. */
  private[functions] def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash of a whitespace-tokenized string: per token, vote ±1
    * on each bit of xxhash64(token); simhash bit = sign of the vote.
    * Identical semantics to the HOF formulation in [[Dedup.simHash64HOF]].
    */
  case class SimHash64Expr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override protected def nullSafeEval(input: Any): Any = {
      val votes = new Array[Int](64)
      foreachToken(input.asInstanceOf[UTF8String]) { (base, off, len) =>
        val h = XXH64.hashUnsafeBytes(base, off, len, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // -------------------------------------------------------------- MinHash

  /** k-permutation MinHash signature over word n-gram shingles, one pass:
    * shingle base hash = xxhash64 chain over its token hashes; permutation
    * j applies universal hashing h_j = a_j·h + b_j (a_j odd, splitmix-
    * derived); output = array of k minima. Duplicate shingles need no
    * dedup — min over a multiset equals min over its set.
    */
  case class MinHashSigExpr(child: Expression, k: Int, shingleN: Int)
      extends UnaryExpression with CodegenFallback {
    require(k > 0 && shingleN > 0)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    private lazy val as: Array[Long] = Array.tabulate(k)(j => splitmix(2L * j) | 1L)
    private lazy val bs: Array[Long] = Array.tabulate(k)(j => splitmix(2L * j + 1))

    override protected def nullSafeEval(input: Any): Any = {
      // token hashes first (each token hashed once, reused across shingles)
      var tokenHashes = new Array[Long](16)
      var nTok = 0
      foreachToken(input.asInstanceOf[UTF8String]) { (base, off, len) =>
        if (nTok == tokenHashes.length)
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTok * 2)
        tokenHashes(nTok) = XXH64.hashUnsafeBytes(base, off, len, Seed)
        nTok += 1
      }
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i <= nTok - shingleN) {
        var h = Seed
        var j = 0
        while (j < shingleN) { h = XXH64.hashLong(tokenHashes(i + j), h); j += 1 }
        var p = 0
        while (p < k) {
          val hp = as(p) * h + bs(p)
          if (hp < mins(p)) mins(p) = hp
          p += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Sorted distinct word n-gram shingle hashes (same hash chain as
    * [[MinHashSigExpr]]). The long-array form of `wordShingles`: exact-
    * Jaccard verification intersects these instead of shingle strings —
    * ~8 bytes/shingle instead of a string, and sorted so the comparison
    * is a linear merge.
    */
  case class ShingleHashesExpr(child: Expression, shingleN: Int)
      extends UnaryExpression with CodegenFallback {
    require(shingleN > 0)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"

    override protected def nullSafeEval(input: Any): Any = {
      var tokenHashes = new Array[Long](16)
      var nTok = 0
      foreachToken(input.asInstanceOf[UTF8String]) { (base, off, len) =>
        if (nTok == tokenHashes.length)
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTok * 2)
        tokenHashes(nTok) = XXH64.hashUnsafeBytes(base, off, len, Seed)
        nTok += 1
      }
      val nSh = math.max(0, nTok - shingleN + 1)
      val out = new Array[Long](nSh)
      var i = 0
      while (i < nSh) {
        var h = Seed
        var j = 0
        while (j < shingleN) { h = XXH64.hashLong(tokenHashes(i + j), h); j += 1 }
        out(i) = h
        i += 1
      }
      java.util.Arrays.sort(out)
      // distinct in place over the sorted array
      var w = 0
      i = 0
      while (i < nSh) {
        if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
        i += 1
      }
      new GenericArrayData(if (w == nSh) out else java.util.Arrays.copyOf(out, w))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Jaccard similarity of two sorted distinct long arrays via linear
    * merge — the verification kernel for MinHash-LSH candidates.
    */
  case class SortedJaccardExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "sorted_jaccard"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData].toLongArray()
      val ys = b.asInstanceOf[ArrayData].toLongArray()
      var i = 0
      var j = 0
      var inter = 0
      while (i < xs.length && j < ys.length) {
        if (xs(i) == ys(j)) { inter += 1; i += 1; j += 1 }
        else if (xs(i) < ys(j)) i += 1
        else j += 1
      }
      val union = xs.length + ys.length - inter
      if (union == 0) 0.0d else inter.toDouble / union.toDouble
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // -------------------------------------------------------------- vectors

  /** Dot product of two double arrays — the kernel under cosine/norm. One
    * tight loop instead of zip_with+aggregate's per-element interpreted
    * eval; numerically identical (sequential left-to-right double adds).
    */
  case class VecDotExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val xs = a.asInstanceOf[ArrayData].toDoubleArray()
      val ys = b.asInstanceOf[ArrayData].toDoubleArray()
      val n = math.min(xs.length, ys.length)
      var acc = 0.0d
      var i = 0
      while (i < n) { acc += xs(i) * ys(i); i += 1 }
      acc
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // -------------------------------------------------------------- Columns

  import GraftBridge.{column, expression}

  def simhash64(c: Column): Column = column(SimHash64Expr(expression(c)))

  def minhashSig(c: Column, k: Int, shingleN: Int): Column =
    column(MinHashSigExpr(expression(c), k, shingleN))

  def vecDot(a: Column, b: Column): Column =
    column(VecDotExpr(expression(a), expression(b)))

  def shingleHashes(c: Column, shingleN: Int): Column =
    column(ShingleHashesExpr(expression(c), shingleN))

  def sortedJaccard(a: Column, b: Column): Column =
    column(SortedJaccardExpr(expression(a), expression(b)))
}
