package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CapStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("streaming source cap equals the batch cap across micro-batches, bounded state") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("capin").toString
    val out = java.nio.file.Files.createTempDirectory("capout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("capckpt").toString

    // the SAME salted-hash priority as the batch operator, computed on the
    // way in; two files => two micro-batches, so batch-1 winners must be
    // EVICTED by higher-hash batch-2 arrivals purely through state
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        graft.functions.Fnv32.fnv32(
          concat(col("doc_id").cast("string"), lit(":cap"))).as("h"))
    // batch 1 is processed BEFORE the second file exists (the option-based
    // maxFilesPerTrigger split is not guaranteed for the initial listing),
    // so the two-batch structure is deterministic. Split on doc_id < 250,
    // NOT parity: the fixture assigns sources by doc_id modulo, so a parity
    // split gives every source to exactly ONE batch and no group would
    // ever merge state across batches (observed: the eviction assert below
    // is what caught it)
    docs.filter(col("doc_id") < 250).coalesce(1).write.mode("append").parquet(in)
    val q = CapStream.sourceCapStream(
        spark.readStream.schema(docs.schema).parquet(in).as[CapStream.CapDoc]).toDF()
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }.start()
    val progress = try {
      q.processAllAvailable()
      docs.filter(col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(in)
      q.processAllAvailable()
      q.recentProgress.map(p => (p.batchId, p.numInputRows)).toSeq
    } finally q.stop()
    // both halves actually arrived as separate micro-batches
    assert(progress.count(_._2 > 0) == 2, s"expected 2 data batches, got $progress")

    val emitted = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("h"), r.getAs[Long]("rank"), r.getAs[Long]("gen")))
    // the final answer is each source's highest-generation emission
    val finalRows = emitted.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val lastGen = rows.map(_._5).max
      rows.filter(_._5 == lastGen).toSeq
    }.map { case (s, id, h, rank, _) => (s, id, h, rank) }.toSet

    val batch = graft.sample.Sampling.sourceCap(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("h"), r.getAs[Long]("rank"))).toSet
    assert(finalRows.nonEmpty)
    assert(finalRows == batch,
      s"stream-only=${(finalRows -- batch).take(5)} batch-only=${(batch -- finalRows).take(5)}")
    // cross-batch eviction actually happened: some batch-1 winner is
    // absent from the final set of its source (displaced by a higher-hash
    // batch-2 arrival purely through state)
    val gen1 = emitted.filter(_._5 == 1L).map(t => (t._1, t._2)).toSet
    val finalIds = finalRows.map(t => (t._1, t._2))
    assert((gen1 -- finalIds).nonEmpty,
      "no batch-1 winner was ever evicted — the spec is not exercising state")
    // and the per-source emission never exceeds the cap (bounded state)
    emitted.groupBy(r => (r._1, r._5)).foreach { case ((s, g), rows) =>
      assert(rows.size <= 10, s"source $s gen $g emitted ${rows.size} rows")
    }
  }

  test("cap winner state survives a checkpoint restart (separate queries)") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("capr_in").toString
    val out = java.nio.file.Files.createTempDirectory("capr_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("capr_ckpt").toString
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        graft.functions.Fnv32.fnv32(
          concat(col("doc_id").cast("string"), lit(":cap"))).as("h"))

    // each half runs under its OWN query instance; only the checkpoint
    // carries the winner sets across the restart
    def runToCompletion(): Unit = {
      val q = CapStream.sourceCapStream(
          spark.readStream.schema(docs.schema).parquet(in).as[CapStream.CapDoc]).toDF()
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(out)
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    docs.filter(col("doc_id") < 250).coalesce(1).write.mode("append").parquet(in)
    runToCompletion()
    docs.filter(col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(in)
    runToCompletion()

    val emitted = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("h"), r.getAs[Long]("rank"), r.getAs[Long]("gen")))
    val finalRows = emitted.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val lastGen = rows.map(_._5).max
      rows.filter(_._5 == lastGen).toSeq
    }.map { case (s, id, h, rank, _) => (s, id, h, rank) }.toSet
    val batch = graft.sample.Sampling.sourceCap(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("h"), r.getAs[Long]("rank"))).toSet
    // post-restart winner sets must reflect PRE-restart arrivals: equality
    // with the batch cap is only possible if state crossed the restart
    assert(finalRows == batch,
      s"stream-only=${(finalRows -- batch).take(5)} batch-only=${(batch -- finalRows).take(5)}")
    assert(emitted.map(_._5).max == 2L, "second query did not resume group generations")
  }
}
