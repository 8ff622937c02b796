package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.kv.OpLog

class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("streaming hourly agg equals batch evHourlyAgg") {
    val stream = EventStreams.runOnce(spark, sf, "hourly_stream",
        EventStreams.hourlyAgg, OutputMode.Complete())
      .select("hour_ms", "event_type", "n_events").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.relational.RelationalQueries.evHourlyAgg(spark, sf)
      .select("hour_ms", "event_type", "n_events").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("streaming KV store final state equals batch materialize") {
    import spark.implicits._
    val streamed = EventStreams.runKvStream(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val batch = OpLog.materialize(
      OpLog.opsFromEvents(spark, sf).as[graft.kv.Op]).collect()
      .map(s => s.key -> s.value).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("KV state survives checkpoint restart; retries across restart dedup (R5)") {
    import spark.implicits._
    import graft.kv.{KvState, Op}
    val in = java.nio.file.Files.createTempDirectory("oplog").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("kvout").toString
    val opSchema = org.apache.spark.sql.Encoders.product[Op].schema

    def runToCompletion(): Unit = {
      val stream = spark.readStream.schema(opSchema).parquet(in).as[Op]
      val q = EventStreams.kvStore(stream).toDF()
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("batch_id", lit(id)).write.mode("append").parquet(out)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    val ops1 = Seq(Op(1, 1, 1, "append", "k", "a"), Op(2, 1, 2, "append", "k", "b"),
      Op(3, 2, 1, "append", "j", "x"))
    // second delivery includes a RETRY of (client 1, seq 2) from before the
    // restart — dedup must hold across the checkpoint boundary
    val ops2 = Seq(Op(2, 1, 2, "append", "k", "b"), Op(4, 1, 3, "append", "k", "c"),
      Op(5, 2, 2, "append", "j", "y"))

    spark.createDataset(ops1).write.mode("append").parquet(in)
    runToCompletion()
    spark.createDataset(ops2).write.mode("append").parquet(in)
    runToCompletion()

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("batch_id").desc)
    val finalState = spark.read.parquet(out)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("key", "value").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(finalState == Map("k" -> "abc", "j" -> "xy"),
      s"state after restart: $finalState")
  }

  test("streaming KV store dedups retried ops across the stream") {
    import spark.implicits._
    // one batch containing retries: duplicates of (clientId, seq) fold once
    val ops = Seq(
      graft.kv.Op(1, 1, 1, "append", "k", "a"),
      graft.kv.Op(1, 1, 1, "append", "k", "a"), // retry
      graft.kv.Op(2, 1, 2, "append", "k", "b"))
    val out = EventStreams.kvStore(spark.createDataset(ops)).collect()
    assert(out.map(s => s.key -> s.value).toMap == Map("k" -> "ab"))
  }
}
