package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: one-line plan-shape summary per registered query — joins,
  * exchanges, scan pushdown — to catch shuffle/broadcast regressions. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        // collect() executes df's OWN queryExecution, finalizing AQE so the
        // inspected plan shows real stages + codegen (count() would plan a
        // separate aggregate and leave this one unfinalized)
        df.collect()
        // final AQE plan only — the adaptive toString appends the initial
        // plan as a second subtree, which would double every count
        val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
        def c(p: String) = p.r.findAllIn(plan).size
        // codegen stages render as "*(n)" prefixes in the plan string
        val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
        println(f"[AUDIT] $name%-24s bhj=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")} " +
          f"exch=${c("Exchange")} scans=${c("Scan parquet")} pushed=${c("PushedFilters: \\[[^\\]]")} " +
          f"wsc=$wsc")
      } catch { case e: Throwable => println(s"[AUDIT] $name ERROR ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
