package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Classifier, NativeExpressions}

/** Dev diagnostic (not library surface): quality-classifier trainer
  * scale probe — does [[Classifier.trainHashedLogistic]] hold at
  * PRODUCTION feature dimensions (fastText ships 2^21 hash buckets;
  * DCLM's filter is fastText-sized), or does it need a trainFast-style
  * treatment like the BPE trainer did?
  *
  * The structural claim it measures: the driver-sequenced dimension is
  * `iters` (a small constant), and each iteration's distributed work is
  * corpus-bound — the feature frame has ≤ (distinct tokens per doc + 2)
  * rows per doc regardless of `dim`, the weight vector rides as a
  * broadcast (dim+2)-row frame, and the gradient collect is dim+2 rows.
  * So per-iteration wall should read ~FLAT in dim, with only the
  * broadcast/collect terms (linear in dim, tiny constants) moving — if
  * that holds, this probe is the recorded negative for any "shard the
  * model" treatment; if broadcast/collect dominate at 2^16+, that is
  * the measured knee to fix.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt -batch "runMain graft.tools.ClfProbe"
  *
  * Env: CLFPROBE_DIMS (default 64,4096,65536), CLFPROBE_ITERS
  * (default 8), CLFPROBE_HEX_WORDS (default 20 — the BpeProbe hex
  * corpus, because the 31-type template vocabulary cannot exercise
  * large bucket spaces; 0 = raw corpus).
  */
object ClfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dims = sys.env.getOrElse("CLFPROBE_DIMS", "64,4096,65536")
      .split(",").map(_.trim.toInt).toSeq
    val iters = sys.env.getOrElse("CLFPROBE_ITERS", "8").toInt
    val hexWords = sys.env.getOrElse("CLFPROBE_HEX_WORDS", "20").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = graft.sources.Tables.documents(spark, sfDir)
    val docs = (if (hexWords <= 0) raw else raw.select(col("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(hexWords - 1)),
          i => md5(concat(col("doc_id").cast("string"), lit("#"),
            i.cast("string"))))).as("text")))
      .localCheckpoint()
    val nDocs = docs.count()
    // balanced deterministic labels — the probe measures wall clock,
    // not model quality
    val labels = docs.select(col("doc_id"),
      (col("doc_id") % 2 === 0).as("keep"))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    println(s"clfprobe: docs=$nDocs iters=$iters hexWords=$hexWords sf=$sfDir")
    dims.foreach { dim =>
      // featurize cost measured separately from the iteration loop
      val (featRows, featSec) = time {
        val f = Classifier.hashedFeatures(docs, "doc_id", "text", dim)
        f.count()
      }
      val (w, totalSec) = time {
        Classifier.trainHashedLogistic(docs, "doc_id", "text",
          labels, "keep", dim = dim, iters = iters, lr = 5.0)
      }
      val nonZero = w.count(_._2.signum != 0)
      println(f"clfprobe: dim=$dim%6d featRows=$featRows%9d " +
        f"featurizeSec=$featSec%6.2f totalSec=$totalSec%7.2f " +
        f"secPerIter=${totalSec / iters}%6.3f nonZeroWeights=$nonZero")
    }
    spark.stop()
  }
}
