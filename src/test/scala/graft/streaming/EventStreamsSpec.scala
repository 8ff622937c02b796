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
