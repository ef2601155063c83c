package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
import org.apache.spark.sql.execution.{RDDScanExec, SparkPlan}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{Exchange, ShuffleExchangeExec}

import graft.functions.NativeExpressions._

/** Dev diagnostic (not library surface): the qe28 lesson, mechanized
  * (round-17 verdict #6). qe28's sf3 knee was a GLOBAL sort placed
  * directly above a heavy narrow derivation: `SortExec(global = true)`
  * runs a RangePartitioner SAMPLING pass over its child RDD before the
  * real pass, so everything between the sort and the nearest
  * MATERIALIZATION BOUNDARY executes TWICE. Work below a boundary is
  * computed once and reused by both passes — shuffle stages
  * (Exchange), broadcast builds, cached/checkpointed scans — which is
  * why most `orderBy`-terminated reports are safe: their kernels sit
  * below a groupBy/join Exchange and only the cheap post-shuffle
  * projection re-runs. The knee shape is a heavy kernel in the NARROW
  * segment directly under a global sort (qe28: the int4 quantize chain;
  * fix = sort the cheap projection first).
  *
  * This probe sweeps every `SparkEntry.queries` entry at a small SF,
  * walks the physical plan (AQE off, so Exchanges are visible as
  * nodes rather than adaptive stages), and for each RANGE Exchange —
  * the node whose RangePartitioner construction runs the sampling job —
  * reports heavy native kernels reachable from its child WITHOUT
  * crossing another Exchange / InMemoryTableScan / RDD (checkpoint)
  * scan.
  * Hits need adjudication against the known bounded exemption (qm06 —
  * decode-produced sort keys, duplication bounded by frame sampling,
  * documented in Multimodal.scala); anything else should be
  * restructured like qe28. Findings recorded in SCALE.md round 18.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
  *     sbt -batch "runMain graft.tools.SortAuditProbe"
  */
object SortAuditProbe {
  private val heavyNames: Set[String] = Set(
    classOf[VecDotExpr], classOf[NearestCellsExpr],
    classOf[UnigramViterbiExpr], classOf[BpeCountExpr],
    classOf[BpeSegmentExpr], classOf[WordpieceCountExpr],
    classOf[DeflateRatioExpr], classOf[MinHashSigExpr],
    classOf[PortableMinHashExpr], classOf[SimHash64Expr],
    classOf[PortableSimHashExpr], classOf[WinnowExpr],
    classOf[ShingleHashesExpr], classOf[PositionalShingleHashesExpr],
    classOf[Md5BucketBigramsExpr], classOf[XxBucketBigramsExpr]
  ).map(_.getName)

  /** All (global Sort → heavy kernels in its narrow segment) findings
    * for one query — empty means the plan is knee-free. Exposed for the
    * spec that pins the detector against the original qe28 shape
    * (a sweep that can't re-find the bug it mechanizes proves nothing).
    * Callers must analyze under AQE OFF (see main's builder note).
    */
  private[graft] def audit(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
    df.queryExecution.executedPlan.collect {
      // a global sort plans as Sort over Exchange(RangePartitioning);
      // the RANGE exchange is the sampler itself — building its
      // RangePartitioner runs a sampling job over the exchange's CHILD,
      // so that child subtree (to the next boundary) is what executes
      // twice. Flag on the range exchange, not the Sort node: it also
      // catches a repartitionByRange-over-heavy-chain without a Sort.
      case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[RangePartitioning] =>
        narrowHeavy(e.child)
    }.filter(_.nonEmpty)

  /** Heavy kernels in the narrow (recomputed-by-sampling) segment:
    * descent stops at materialization boundaries.
    */
  private def narrowHeavy(p: SparkPlan): Seq[String] = p match {
    case _: Exchange => Nil
    case _: InMemoryTableScanExec => Nil
    case _: RDDScanExec => Nil
    case other =>
      val own = other.expressions.flatMap(_.collect {
        case e if heavyNames.contains(e.getClass.getName) =>
          e.getClass.getSimpleName
      })
      (own ++ other.children.flatMap(narrowHeavy)).distinct
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val filter = args.headOption.map(_.r)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false") // plain tree: Exchanges visible, no AdaptiveSparkPlanExec wrapper
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var hits = 0
    var swept = 0
    var failed = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (filter.forall(_.findFirstIn(name).isDefined)) {
        try {
          val df = fn(spark, sfDir)
          swept += 1
          val sortsOverHeavy = audit(df)
          if (sortsOverHeavy.nonEmpty) {
            hits += 1
            println(s"sortaudit: HIT $name global-Sort over narrow " +
              sortsOverHeavy.map(_.mkString("+")).mkString("; "))
          }
        } catch {
          case t: Throwable =>
            failed += 1
            println(s"sortaudit: SKIP $name (${t.getClass.getSimpleName}: " +
              s"${Option(t.getMessage).getOrElse("").take(100)})")
        }
      }
    }
    println(s"sortaudit: swept=$swept hits=$hits failed=$failed sf=$sfDir")
    spark.stop()
  }
}
