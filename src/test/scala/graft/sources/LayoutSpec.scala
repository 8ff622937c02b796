package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** (min, max, rowCount) of `colName`'s stats per row group, straight from
    * the parquet footers — the layout property itself, independent of any
    * engine's scan. */
  def rowGroups(path: String, colName: String): Seq[(Long, Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    fs.listStatus(dir).toSeq.filter(_.getPath.getName.endsWith(".parquet")).flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val c = b.getColumns.asScala.find(_.getPath.toDotString == colName).get
          val st = c.getStatistics.asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
          (st.getMin, st.getMax, b.getRowCount)
        }
      } finally r.close()
    }
  }

  /** How many row groups a `[0, sel)` predicate on the column can touch. */
  def touched(gs: Seq[(Long, Long, Long)], sel: Long): Int =
    gs.count { case (mn, mx, _) => mn < sel && mx >= 0 }

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

  /** (scan numOutputRows, query count) for a `[0, sel)` filter on `colName`. */
  def scanOutputRows(path: String, colName: String, sel: Long): (Long, Long) = {
    val q = spark.read.parquet(path).filter(col(colName) >= 0 && col(colName) < sel)
      .agg(count(lit(1)), sum(col("v")))
    val cnt = q.collect()(0).getLong(0)
    val scan = deepScan(q.queryExecution.executedPlan).head
    (scan.metrics("numOutputRows").value, cnt)
  }

  test("sort-on-write: row-group stats prune a range scan; unsorted layout cannot") {
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

    val sortedGroups = rowGroups(sorted, "k")
    val unsortedGroups = rowGroups(unsorted, "k")
    assert(sortedGroups.size > 8, s"too few row groups (${sortedGroups.size}) to prove pruning")
    val sortedTouched = touched(sortedGroups, sel)
    val unsortedTouched = touched(unsortedGroups, sel)
    // hash-scattered order: EVERY row group spans the key domain → none skippable
    assert(unsortedTouched == unsortedGroups.size,
      s"unsorted layout unexpectedly prunable ($unsortedTouched/${unsortedGroups.size})")
    // sorted order: only the groups covering the 1% interval are touchable
    assert(sortedTouched * 5 < sortedGroups.size,
      s"sorted layout not selective: $sortedTouched of ${sortedGroups.size} groups touched")

    // and Spark's scan REALLY skips them: the scan node emits only the
    // surviving groups' rows on the sorted layout, all n on the unsorted
    val (sortedScanRows, sortedCnt) = scanOutputRows(sorted, "k", sel)
    val (unsortedScanRows, unsortedCnt) = scanOutputRows(unsorted, "k", sel)
    assert(sortedCnt == unsortedCnt && sortedCnt > 0, s"$sortedCnt vs $unsortedCnt")
    assert(unsortedScanRows == n, s"unsorted scan emitted $unsortedScanRows of $n")
    val sortedRowBound = sortedGroups.filter { case (mn, mx, _) => mn < sel && mx >= 0 }
      .map(_._3).sum
    assert(sortedScanRows <= sortedRowBound,
      s"sorted scan emitted $sortedScanRows > surviving-group bound $sortedRowBound")
    assert(sortedScanRows * 5 < n,
      s"sorted scan emitted $sortedScanRows of $n — row groups were not skipped")
  }

  test("z-order: BOTH columns' range predicates prune; a dedicated sort prunes only its own") {
    // two INDEPENDENT uniform keys — no layout can exploit correlation
    val n = 2000000L
    val dom = 1L << 16
    val sel = dom / 32 // 1/32 range predicate per column
    val df = spark.range(n).select(
      (abs(xxhash64(col("id"))) % dom).as("k1"),
      (abs(xxhash64(col("id") + 7777777L)) % dom).as("k2"),
      (col("id") % 997).cast("double").as("v"))
    val zpath = java.nio.file.Files.createTempDirectory("layz").toString + "/t"
    val k1path = java.nio.file.Files.createTempDirectory("layk1").toString + "/t"
    Layout.zorderWrite(df, zpath, Seq("k1" -> (dom - 1), "k2" -> (dom - 1)),
      nFiles = 4, rowGroupBytes = 1 << 18)
    Layout.sortedWrite(df, k1path, Seq("k1"), nFiles = 4, rowGroupBytes = 1 << 18)

    val zG1 = rowGroups(zpath, "k1"); val zG2 = rowGroups(zpath, "k2")
    val sG1 = rowGroups(k1path, "k1"); val sG2 = rowGroups(k1path, "k2")
    assert(zG1.size > 16, s"too few row groups (${zG1.size}) to prove pruning")
    // dedicated k1 sort: razor-sharp on k1, blind on k2 (every group spans it)
    assert(touched(sG1, sel) * 5 < sG1.size,
      s"k1-sorted layout not selective on k1: ${touched(sG1, sel)}/${sG1.size}")
    // ≥95%, not ==100%: each group's k2 min/max is a sample of ~n/groups
    // uniform draws, so a group can miss the 1/32 range by chance (observed
    // once at 184/185 — the blindness claim is statistical, not exact)
    assert(touched(sG2, sel) * 20 >= sG2.size * 19,
      s"k1-sorted layout unexpectedly selective on k2: ${touched(sG2, sel)}/${sG2.size}")
    // z-order: a hyper-rectangle per group ⇒ BOTH predicates skip most groups
    // ((1/32)^(1/2) ≈ 18% is the curve's theoretical touch fraction)
    assert(touched(zG1, sel) * 2 < zG1.size,
      s"z-order not selective on k1: ${touched(zG1, sel)}/${zG1.size}")
    assert(touched(zG2, sel) * 2 < zG2.size,
      s"z-order not selective on k2: ${touched(zG2, sel)}/${zG2.size}")

    // the scan really skips on the SECOND column, where the sorted layout
    // must decode everything
    val (zScanRows, zCnt) = scanOutputRows(zpath, "k2", sel)
    val (sScanRows, sCnt) = scanOutputRows(k1path, "k2", sel)
    assert(zCnt == sCnt && zCnt > 0, s"$zCnt vs $sCnt")
    assert(sScanRows == n, s"k1-sorted scan on k2 emitted $sScanRows of $n")
    assert(zScanRows * 2 < n, s"z-order scan on k2 emitted $zScanRows of $n — no skipping")
  }

  test("partitionedWrite: dynamic partition pruning — a filtered-dim join reads ONLY the joined partition") {
    val n = 200000L
    val nParts = 20
    val fact = spark.range(n).select(col("id"),
      (col("id") % nParts).cast("int").as("pk"),
      (col("id") % 997).cast("double").as("v"))
    val p = java.nio.file.Files.createTempDirectory("laydpp").toString + "/t"
    Layout.partitionedWrite(fact, p, "pk")
    val dim = spark.range(nParts)
      .select(col("id").cast("int").as("pk"), concat(lit("g"), col("id")).as("name"))
      .filter(col("name") === "g7") // selective dim predicate NOT on the key itself
    val q = spark.read.parquet(p).join(broadcast(dim), "pk")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val row = q.collect()(0)
    assert(row.getLong(0) == n / nParts, s"join result wrong: ${row.getLong(0)}")
    // the fact scan carries the runtime-planted partition filter…
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DynamicPruningExpression on the fact scan:\n${plan.take(1800)}")
    // …and actually read only partition pk=7's rows (no row-level filter in
    // the query, so scan numOutputRows == rows physically read)
    val scan = deepScan(q.queryExecution.executedPlan).head
    assert(scan.metrics("numOutputRows").value == n / nParts,
      s"scan read ${scan.metrics("numOutputRows").value} rows — partitions were not pruned")
  }

  test("compactSmallFiles: 64 tiny files become ~target-sized files, content row-identical") {
    val df = spark.range(300000).select(col("id"), (col("id") % 997).cast("double").as("v"))
    val p1 = java.nio.file.Files.createTempDirectory("cmp1").toString + "/t"
    val p2 = java.nio.file.Files.createTempDirectory("cmp2").toString + "/t"
    df.repartition(64).write.parquet(p1)
    def dataFiles(p: String) = {
      val dir = new org.apache.hadoop.fs.Path(p)
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(dir).toSeq.filter(_.getPath.getName.endsWith(".parquet"))
    }
    val before = dataFiles(p1)
    assert(before.size == 64, s"setup: expected 64 scattered files, got ${before.size}")
    val totalBytes = before.map(_.getLen).sum
    val n = Layout.compactSmallFiles(spark, p1, p2,
      targetFileBytes = totalBytes / 4)
    val after = dataFiles(p2)
    assert(after.size == n && n <= 5,
      s"expected ~4 compacted files, got ${after.size} (returned $n)")
    // size-targeted, not count-targeted: every output file is within 2x of target
    after.foreach(f => assert(f.getLen < totalBytes / 2,
      s"a compacted file exceeded twice the target: ${f.getLen}"))
    // content preserved row-for-row
    val a = spark.read.parquet(p1).collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    val b = spark.read.parquet(p2).collect().map(r => (r.getLong(0), r.getDouble(1))).sorted
    assert(a.sameElements(b), "compaction must not change content")
  }

  def deepCollect[T](p: org.apache.spark.sql.execution.SparkPlan)(
      pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, T]): Seq[T] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val here = pf.lift(p).toSeq
    val through = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    here ++ through.flatMap(deepCollect(_)(pf))
  }

  test("bucketedJoin: zero Exchange below the join, values equal the plain shuffle join") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val sf = SparkTestSession.sf
    val wh = java.nio.file.Files.createTempDirectory("bktspec").toString
    val orders = graft.Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderstatus"))
    val li = graft.Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    Layout.bucketedWrite(orders, "bktspec_orders", s"$wh/o", "o_orderkey", 4)
    Layout.bucketedWrite(li, "bktspec_lineitem", s"$wh/l", "l_orderkey", 4)
    // force the big-table regime: at fixture scale the planner would just
    // broadcast (bucketing "disabled by query planner" — a BHJ has no
    // shuffle to avoid); the property under test is the 100 TB plan, where
    // broadcast is off the table and bucketing must eat both exchanges
    val thresholdBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan = try {
      val joined = Layout.bucketedJoin(spark, "bktspec_orders", "bktspec_lineitem",
        "o_orderkey", "l_orderkey")
      // run the frame's OWN QueryExecution so the inspected plan is AQE-final
      joined.queryExecution.toRdd.count()
      joined.queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdBefore)
    val exchanges = deepCollect(plan) { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty, s"bucketed join must not exchange:\n$plan")
    assert(deepCollect(plan) { case j: SortMergeJoinExec => j }.nonEmpty,
      s"expected a sort-merge join over the bucketed scans:\n$plan")
    val joined = Layout.bucketedJoin(spark, "bktspec_orders", "bktspec_lineitem",
      "o_orderkey", "l_orderkey")
    // the layout buys the plan, never the answer: equal to the plain join
    val plain = orders.join(li, col("o_orderkey") === col("l_orderkey"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).sorted
    assert(canon(joined).sameElements(canon(plain)))
    spark.sql("DROP TABLE IF EXISTS bktspec_orders")
    spark.sql("DROP TABLE IF EXISTS bktspec_lineitem")
  }
}
