package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: per-stage wall/task-time breakdown for named registered
  * queries — where inside a slow query the time actually goes (guide §1/§7:
  * decide shuffle-read vs compute vs scheduling before touching code).
  *
  * Run: `runMain graft.tools.StageTimeProbe <sfDir> <q1,q2,...>` — prints,
  * per query, every completed stage over 50 ms: wall duration, summed
  * executor run time, GC time, shuffle read/write bytes, input bytes, task
  * count, and the first line of the stage's call site. */
object StageTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(',').toSeq else Seq("graph_bfs")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = mutable.ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        if (wall >= 50) {
          val m = i.taskMetrics
          stages += f"    stage ${i.stageId}%4d wall=${wall}%6dms run=${m.executorRunTime}%7dms " +
            f"gc=${m.jvmGCTime}%5dms cpu=${m.executorCpuTime / 1000000}%7dms " +
            f"sRead=${m.shuffleReadMetrics.totalBytesRead / 1024}%8dKB " +
            f"sWrite=${m.shuffleWriteMetrics.bytesWritten / 1024}%8dKB " +
            f"input=${m.inputMetrics.bytesRead / 1024}%8dKB tasks=${i.numTasks}%4d  " +
            i.details.linesIterator.take(1).mkString
        }
      }
    })
    names.foreach { name =>
      // warm pass (plan cache + JIT), then the measured pass
      graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(): Unit
      graft.Checkpoints.releaseTracked()
      Thread.sleep(500)
      stages.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e6
      graft.Checkpoints.releaseTracked()
      Thread.sleep(800) // listener bus drain
      println(f"[stages] $name total=${dt}%.0fms rows=$n stages>=50ms:")
      stages.foreach(println)
    }
    spark.stop()
  }
}
