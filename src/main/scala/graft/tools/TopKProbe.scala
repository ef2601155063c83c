package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

/** Dev diagnostic (not library surface): attributes q41's typed-path
  * cost at scale. Three formulations of the same top-3-per-suppkey:
  *   window  — q31's row_number window (codegen baseline);
  *   typed   — q41's map → groupByKey → agg → flatMap Dataset shape;
  *   udaf    — the SAME TopK Aggregator applied as an untyped udaf
  *             column on the DataFrame (no outer encode/decode passes);
  * each also A/B'd against spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold (default 128 keys/task → sort-based fallback on
  * any realistic group count).
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf3 sbt -batch "runMain graft.tools.TopKProbe"
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))

    def windowForm(): Long = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      li.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3).count()
    }

    def typedForm(): Long = {
      val agg = new TopKAgg.TopK(3).toColumn.name("top")
      li.as[(Long, Double, Long, Long)]
        .map { case (sk, price, ok, ln) => sk -> TopKAgg.Item(price, ok, ln) }
        .groupByKey(_._1).mapValues(_._2).agg(agg)
        .flatMap { case (sk, buf) =>
          buf.items.zipWithIndex.map { case (r, i) => (sk, i + 1, r.orderkey, r.price) }
        }.count()
    }

    def udafForm(): Long = {
      val topk = udaf(new TopKAgg.TopK(3),
        org.apache.spark.sql.Encoders.product[TopKAgg.Item])
      li.groupBy(col("l_suppkey"))
        .agg(topk(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")).as("top"))
        .select(col("l_suppkey"), posexplode(col("top.items")))
        .count()
    }

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"topkprobe: $label n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    for (thr <- Seq("128", "4194304")) {
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr)
      println(s"--- fallbackThreshold=$thr sf=$sfDir")
      time("window")(windowForm())
      time("typed")(typedForm())
      time("udaf")(udafForm())
    }
    spark.stop()
  }
}
