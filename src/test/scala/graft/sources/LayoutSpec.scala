package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("sort-on-write: row-group stats prune a range scan; unsorted layout cannot") {
    import spark.implicits._
    // synthetic fact table large enough for many row groups per file; the
    // key is hash-scattered so ARRIVAL order carries no locality at all
    val n = 2000000L
    val sel = n / 100 // 1% range predicate
    val df = spark.range(n).select(
      (abs(xxhash64(col("id"))) % n).as("k"),
      (col("id") % 997).cast("double").as("v"))
    val sorted = java.nio.file.Files.createTempDirectory("laysorted").toString + "/t"
    val unsorted = java.nio.file.Files.createTempDirectory("layunsorted").toString + "/t"
    Layout.sortedWrite(df, sorted, Seq("k"), nFiles = 4, rowGroupBytes = 1 << 18)
    // same data, same file count, same row-group size — only the ORDER differs
    df.repartition(4).write.mode("overwrite")
      .option("parquet.block.size", (1 << 18).toLong).parquet(unsorted)

    // layout property, read straight from the parquet footers: how many row
    // groups can a [0, sel) range predicate on k possibly touch?
    def rowGroups(path: String): Seq[(Long, Long, Long)] = {
      val conf = spark.sessionState.newHadoopConf()
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      fs.listStatus(dir).toSeq.filter(_.getPath.getName.endsWith(".parquet")).flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getBlocks.asScala.toSeq.map { b =>
            val c = b.getColumns.asScala.find(_.getPath.toDotString == "k").get
            val st = c.getStatistics.asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
            (st.getMin, st.getMax, b.getRowCount)
          }
        } finally r.close()
      }
    }
    val sortedGroups = rowGroups(sorted)
    val unsortedGroups = rowGroups(unsorted)
    assert(sortedGroups.size > 8, s"too few row groups (${sortedGroups.size}) to prove pruning")
    def touched(gs: Seq[(Long, Long, Long)]) = gs.count { case (mn, mx, _) => mn < sel && mx >= 0 }
    val sortedTouched = touched(sortedGroups)
    val unsortedTouched = touched(unsortedGroups)
    // hash-scattered order: EVERY row group spans the key domain → none skippable
    assert(unsortedTouched == unsortedGroups.size,
      s"unsorted layout unexpectedly prunable ($unsortedTouched/${unsortedGroups.size})")
    // sorted order: only the groups covering the 1% interval are touchable
    assert(sortedTouched * 5 < sortedGroups.size,
      s"sorted layout not selective: $sortedTouched of ${sortedGroups.size} groups touched")

    // and Spark's scan REALLY skips them: the scan node emits only the
    // surviving groups' rows on the sorted layout, all n on the unsorted
    // SparkPlan.collect stops at AQE / query-stage leaves; walk through them
    def deepScan(p: org.apache.spark.sql.execution.SparkPlan)
    : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val here = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case _ => Seq.empty
      }
      val through = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ through.flatMap(deepScan)
    }
    def scanOutputRows(path: String): (Long, Long) = {
      val q = spark.read.parquet(path).filter(col("k") >= 0 && col("k") < sel)
        .agg(count(lit(1)), sum(col("v")))
      val cnt = q.collect()(0).getLong(0)
      val scan = deepScan(q.queryExecution.executedPlan).head
      (scan.metrics("numOutputRows").value, cnt)
    }
    val (sortedScanRows, sortedCnt) = scanOutputRows(sorted)
    val (unsortedScanRows, unsortedCnt) = scanOutputRows(unsorted)
    assert(sortedCnt == unsortedCnt && sortedCnt > 0, s"$sortedCnt vs $unsortedCnt")
    assert(unsortedScanRows == n, s"unsorted scan emitted $unsortedScanRows of $n")
    val sortedRowBound = sortedGroups.filter { case (mn, mx, _) => mn < sel && mx >= 0 }
      .map(_._3).sum
    assert(sortedScanRows <= sortedRowBound,
      s"sorted scan emitted $sortedScanRows > surviving-group bound $sortedRowBound")
    assert(sortedScanRows * 5 < n,
      s"sorted scan emitted $sortedScanRows of $n — row groups were not skipped")
  }
}
