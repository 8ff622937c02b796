package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print row-level diff of one query, fault-free vs chaos. */
object ChaosDiff {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val name = args(1); val seed = args(2).toLong
    def run(chaos: Boolean): Seq[String] = {
      val b = SparkSession.builder()
        .appName(s"diff-$chaos")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions)
      if (chaos) {
        val absCp = sys.props("java.class.path").split(java.io.File.pathSeparator)
          .filter(_.nonEmpty).map(p => new java.io.File(p).getAbsolutePath)
          .mkString(java.io.File.pathSeparator)
        b.master("local-cluster[2,2,2048]")
          .config("spark.executor.extraClassPath", absCp)
          .config("spark.plugins", "graft.tools.ChaosPlugin")
          .config("spark.graft.chaos.seed", seed.toString)
          .config("spark.graft.chaos.pct", "30")
      } else b.master("local-cluster[2,2,2048]")
        .config("spark.executor.extraClassPath",
          sys.props("java.class.path").split(java.io.File.pathSeparator)
            .filter(_.nonEmpty).map(p => new java.io.File(p).getAbsolutePath)
            .mkString(java.io.File.pathSeparator))
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val cols = df.columns.sorted
      val rows = df.select(cols.head, cols.tail: _*).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
      graft.Checkpoints.releaseTracked()
      spark.stop()
      rows
    }
    val a = run(false); val bb = run(true)
    println(s"[diff] clean=${a.size} chaos=${bb.size}")
    (a.toSet -- bb.toSet).toSeq.sorted.take(10).foreach(r => println(s"[diff] only-clean: $r"))
    (bb.toSet -- a.toSet).toSeq.sorted.take(10).foreach(r => println(s"[diff] only-chaos: $r"))
  }
}
