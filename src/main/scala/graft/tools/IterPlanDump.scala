package graft.tools

import java.nio.file.{Files, Paths}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Dev-only: run named registered queries with a [[PlanProbe]] sink
  * installed and dump a REPRESENTATIVE mid-iteration round plan per tapped
  * operator — round 2 where the iteration gets that far (round 1 can carry
  * seed-only shapes), else round 1. Session config mirrors Bench.
  *
  * Run: `runMain graft.tools.IterPlanDump <outDir> <suffix> <q1,q2,...>`
  * → writes `<outDir>/<query>__<tag-prefix>_<suffix>.txt`.
  */
object IterPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: IterPlanDump <outDir> <suffix> <q1,q2,...>")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(',').toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val seen = mutable.Map.empty[String, Int]
      val captured = mutable.LinkedHashMap.empty[String, String]
      PlanProbe.sink = (tag, df) => {
        val prefix = tag.replaceAll("_\\d+$", "")
        val n = seen.getOrElse(prefix, 0) + 1
        seen(prefix) = n
        if (n <= 2) { // keep round 2 (overwrite round 1's provisional capture)
          // EXECUTE the tapped frame's own queryExecution first: with AQE
          // on, exchange reuse / coalescing / broadcast demotion are
          // runtime decisions — the initial plan prints both union-agg
          // branches separately and never shows a ReusedExchange, which is
          // exactly the shape the dump exists to document. The round's
          // inputs are checkpoints, so this re-runs only the round's own
          // joins/aggregates (dev-only tool; cost is irrelevant).
          df.queryExecution.toRdd.count(): Unit
          captured(prefix) = s"== tapped round frame: $tag " +
            "(FINAL adaptive plan, after execution) ==\n" +
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
        }
      }
      try {
        graft.SparkEntry.queries(name)(spark, sfDir).count(): Unit
      } finally {
        PlanProbe.sink = null
        graft.Checkpoints.releaseTracked()
      }
      captured.foreach { case (prefix, plan) =>
        val f = s"${name}__${prefix}_$suffix.txt"
        Files.write(outDir.resolve(f), plan.getBytes("UTF-8"))
        System.err.println(s"[iterplan] wrote $f")
      }
      if (captured.isEmpty)
        System.err.println(s"[iterplan] $name tapped nothing (no iterative op?)")
    }
    spark.stop()
  }
}
