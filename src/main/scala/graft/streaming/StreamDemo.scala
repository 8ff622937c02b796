package graft.streaming

import org.apache.spark.sql.SparkSession

/** Runnable surface for the streaming module: runs the event stream through
  * the windowed aggregation and the stateful KV store (memory sink, one
  * micro-batch over the fixture dir) and prints a summary line for each.
  *
  *   sbt "runMain graft.streaming.StreamDemo /root/testdata/sf0.001"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val hourly = EventStreams.runOnce(spark, dir, "demo_hourly",
      EventStreams.hourlyAgg,
      org.apache.spark.sql.streaming.OutputMode.Complete())
    println(s"[stream-demo] hourly windows: ${hourly.count()} rows")
    hourly.orderBy("hour_ms", "event_type").show(5, truncate = false)

    val kv = EventStreams.runKvStream(spark, dir)
    println(s"[stream-demo] kv keys materialized: ${kv.count()} rows")
    kv.orderBy("key").show(3, truncate = false)

    spark.stop()
  }
}
