package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only: dump `.explain("formatted")` for named registered queries to
  * files — the before/after plan evidence the optimization rounds commit
  * under `plans/rNN/`. The session mirrors Bench's config (local[32], 32
  * shuffle partitions, AQE on) so the captured plan is the one the bench
  * actually runs.
  *
  * Run: `runMain graft.tools.ExplainDump <outDir> <suffix> <q1,q2,...>`
  * → writes `<outDir>/<query>_<suffix>.txt` per query. The query is
  * EXECUTED first (noop-equivalent `count` on its own queryExecution) so
  * AQE finalizes and the dumped plan shows real join strategies. Both the
  * pre-execution formatted plan and the final AQE executedPlan are written.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <suffix> <q1,q2,...>")
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
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // execute df's OWN queryExecution so AQE finalizes in place
      df.queryExecution.toRdd.count(): Unit
      val finalPlan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val body =
        s"""== explain("formatted") ==
           |$formatted
           |== final AQE executedPlan (after execution) ==
           |$finalPlan""".stripMargin
      Files.write(outDir.resolve(s"${name}_$suffix.txt"), body.getBytes("UTF-8"))
      graft.Checkpoints.releaseTracked()
      System.err.println(s"[explain] wrote ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
