package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Jobs-per-query probe: runs named registered queries and prints how many
  * Spark jobs each build+materialize issued — the evidence artifact for
  * round-discipline work (e.g. the round-12 BFS trim: every frontier round
  * must cost exactly ONE job, because at 100 TB the per-round job floor
  * times the graph diameter is real money; the round-11 shape paid 3).
  *
  * Run: `runMain graft.tools.JobCountProbe <sfDir> <q1,q2,...>`. */
object JobCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(',').toSeq else Seq("graph_bfs")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
    })
    // the listener bus is async: poll until the count stabilizes
    def settled(): Int = {
      var prev = -1; var cur = jobs.get()
      while (cur != prev) { Thread.sleep(300); prev = cur; cur = jobs.get() }
      cur
    }
    names.foreach { name =>
      val before = settled()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      graft.Checkpoints.releaseTracked()
      val after = settled()
      println(s"[jobs] $name: ${after - before} jobs, $n rows")
    }
    spark.stop()
  }
}
