package graft.mr

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's behavioral probes (SURVEY §2.7), re-expressed on Spark's
  * execution model instead of marker files and process kills:
  *
  *   - mtiming/rtiming (/root/reference/src/mrapps/mtiming.go:22-80,
  *     rtiming.go:20-63) count concurrently-running workers by scanning
  *     timestamp marker files. Here each task emits its own (start, end)
  *     interval and max concurrency is computed *as a query* — a sweep-line
  *     (+1/-1, running sum) over event boundaries.
  *   - crash.go's maybeCrash (33% exit,
  *     /root/reference/src/mrapps/crash.go:23-35) exercises master-side task
  *     reassignment; [[chaosOnce]] throws on every task's FIRST attempt so
  *     Spark's task retry (the DAGScheduler's version of
  *     master.go:116-134 timeout/reassign) must re-run it — output must be
  *     identical to the fault-free run.
  */
object Probes {

  final case class TaskSpan(partition: Int, attempt: Int, start: Long, end: Long)

  /** Run a trivially-parallel pass over `n` slices of work (>= `sliceMs` ms
    * each) and record per-task wall-clock spans. */
  def taskSpans(spark: SparkSession, n: Int, sliceMs: Long = 200): Dataset[TaskSpan] = {
    import spark.implicits._
    spark.range(n).repartition(n).mapPartitions { it =>
      val tc = TaskContext.get()
      val start = System.currentTimeMillis()
      it.size // drain
      Thread.sleep(sliceMs)
      Iterator.single(TaskSpan(tc.partitionId(), tc.attemptNumber(),
        start, System.currentTimeMillis()))
    }
  }

  /** Max observed task concurrency, computed as a sweep-line query over the
    * span boundaries: explode each span to (+1 at start, -1 at end), running
    * sum in time order, take the max. One row per probe run. */
  def maxConcurrency(spans: Dataset[TaskSpan]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("t"), col("delta").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spans
      .select(explode(array(
        struct(col("start").as("t"), lit(1).as("delta")),
        struct(col("end").as("t"), lit(-1).as("delta")))).as("ev"))
      .select(col("ev.t").as("t"), col("ev.delta").as("delta"))
      .withColumn("running", sum(col("delta")).over(w))
      .agg(max(col("running")).as("max_concurrent"))
  }

  /** Wrap an MrApp's map with first-attempt fault injection: every task
    * throws once, forcing a retry; the retried attempt succeeds. Determinism
    * of the final output *is the assertion* — Spark task retry must reproduce
    * the fault-free result exactly (the crash-test contract of
    * /root/reference/src/main/test-mr.sh:155-200). */
  def chaosOnce(app: MrApp): MrApp = new MrApp {
    val name: String = app.name + "_chaos"
    def map(filename: String, contents: String): Iterator[KV] = {
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0)
        throw new RuntimeException(s"[chaosOnce] injected failure, task ${tc.partitionId()} attempt 0")
      app.map(filename, contents)
    }
    def reduce(key: String, values: Iterator[String]): String = app.reduce(key, values)
  }
}
