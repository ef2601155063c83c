package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.streaming.QualityDrift

/** Dev diagnostic (not library surface): the round-15 verdict asked
  * whether the curation sink's quality gate re-tokenizes per metric —
  * [[QualityDrift.keepNarrow]] references `tokens(text)` four times
  * (two size bounds, mean-word-length aggregate, stopword-ratio
  * filter) and the sink's filter adds a fifth via
  * [[TextAnalysis.tokenCount]]. Spark's subexpression elimination may
  * or may not fold those five `split` calls into one under
  * whole-stage codegen, and a wrong guess here is exactly the class of
  * premise round 15 caught by profiling first.
  *
  * Measures, over the sfDir documents table (xN inflated):
  *  - `current`: the sink's literal filter shape;
  *  - `fused`: one projected token array feeding all rule columns,
  *    then the filter over the derived columns;
  * plus a codegen dump grep counting `split(` call sites in the
  * generated code for the current shape.
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("GATEPROBE_MULT", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val docs = (1 until mult).foldLeft(docs0)((d, i) =>
      d.union(docs0.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count()
    println(s"docs=$n")

    def currentGate(text: Column): Column =
      TextAnalysis.tokenCount(text) >= 1 && QualityDrift.keepNarrow(text)

    def fusedFrame(df: DataFrame): DataFrame = {
      val stopLits = TextAnalysis.EnglishStopwords.map(lit)
      df.withColumn("__tk", TextAnalysis.tokens(col("text")))
        .withColumn("__n", greatest(size(col("__tk")), lit(1)).cast("double"))
        .filter(size(col("__tk")) >= 30 && size(col("__tk")) <= 100000 &&
          round(aggregate(col("__tk"), lit(0L), (acc, t) => acc + length(t))
            .cast("double") / col("__n"), 4).between(3.0, 10.0) &&
          round(size(filter(col("__tk"), t => t.isin(stopLits: _*)))
            .cast("double") / col("__n"), 4) >= 0.02)
        .drop("__tk", "__n")
    }

    def time(label: String, f: => Long): Unit = {
      // 3 passes, min — the docs frame is persisted so I/O is flat
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val c = f
        ((System.nanoTime() - t0) / 1e9, c)
      }
      println(f"$label min=${ts.map(_._1).min}%.2fs all=${ts.map(t => f"${t._1}%.2f").mkString(",")} rows=${ts.head._2}")
    }
    // keeper-identity cross-check while timing
    val a = docs.filter(currentGate(col("text")))
    val b = fusedFrame(docs)
    time("current", a.count())
    time("fused  ", b.count())
    val diff = a.select("doc_id").exceptAll(b.select("doc_id")).count() +
      b.select("doc_id").exceptAll(a.select("doc_id")).count()
    println(s"keeper_diff=$diff")

    // how many split call sites survive codegen for the current shape?
    val code = org.apache.spark.sql.execution.debug.codegenString(
      a.queryExecution.executedPlan)
    val splits = "\\.split\\(".r.findAllIn(code).size
    val stringSplits = "stringSplit|StringSplit".r.findAllIn(code).size
    println(s"codegen_split_calls=$splits string_split_nodes=$stringSplits")
    spark.stop()
  }
}
