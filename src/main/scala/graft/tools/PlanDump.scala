package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: dump `.explain("formatted")` for declared queries to
  * per-query text files — the optimization-round evidence artifact
  * (plans/rNN/<query>_before.txt / _after.txt). Args:
  *   <sfDir> <outDir> [nameRegex] [suffix]
  * Writes <outDir>/<name><suffix>.txt for every matching query in
  * [[graft.SparkEntry.queries]]. Uses the SAME session conf as
  * [[graft.Bench]] (AQE on, shuffle partitions = cores, sort shuffle
  * writer) so the dumped plan is the plan the bench actually runs —
  * `explain` shows the initial AQE plan (isFinalPlan=false), which is
  * where Exchange counts / join strategies / PushedFilters live.
  *
  * Round-20 fix (verdict #2): queries that `localCheckpoint` an
  * intermediate execute that seam DURING construction, so the final
  * plan starts at `Scan ExistingRDD` and the dump proved nothing
  * (the round-19 qd39/qd79/qd94 dumps were vacuous). A
  * QueryExecutionListener now captures every query execution
  * triggered while the query is being built (checkpoint seams,
  * eager stats collects) and the dump file carries each executed
  * segment's formatted plan ABOVE the final plan — the pre-checkpoint
  * exchanges are visible again.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val nameFilter = args.lift(2).map(_.r)
    val suffix = args.lift(3).getOrElse("")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    // construction-time executions (localCheckpoint seams, eager stats
    // actions) captured via the listener bus; events arrive async, so
    // each query polls until the capture count settles
    val captured =
      new java.util.concurrent.CopyOnWriteArrayList[(String, String)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        captured.add((funcName, qe.explainString(
          org.apache.spark.sql.execution.FormattedMode)))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    })
    def drainCaptured(): Seq[(String, String)] = {
      var last = -1
      var stable = 0
      while (stable < 3) { // 3 consecutive 100 ms polls with no growth
        Thread.sleep(100)
        val now = captured.size()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      import scala.jdk.CollectionConverters._
      val out = captured.asScala.toSeq
      captured.clear()
      out
    }
    graft.SparkEntry.queries
      .filter { case (name, _) => nameFilter.forall(_.findFirstIn(name).isDefined) }
      .foreach { case (name, fn) =>
        try {
          captured.clear()
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val segments = drainCaptured()
          val pre = segments.zipWithIndex.map { case ((fname, p), i) =>
            s"== executed during construction [${i + 1}/${segments.size}: $fname] ==\n$p"
          }
          val body =
            if (pre.isEmpty) plan
            else (pre :+ s"== final plan ==\n$plan").mkString("\n")
          Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), body)
          println(s"[plandump] wrote $name (${segments.size} construction segments)")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: $e")
        }
      }
    spark.stop()
  }
}
