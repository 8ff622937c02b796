package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestSession
import graft.shard.Sharding

class ShardStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("in-stream config changes reproduce the batch migration hop census; " +
      "gid transitions match migrationPlan; ops keep serving between hops") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("shardin").toString
    val ckpt = java.nio.file.Files.createTempDirectory("shardckpt").toString
    val out = java.nio.file.Files.createTempDirectory("shardout").toString
    val schema = org.apache.spark.sql.Encoders.product[ShardStream.ShardIn].schema

    // data ops: one per event, key = user_id string (the batch census base)
    val ops = ShardStream.opRows(
      graft.Tables.events(spark, sf)
        .select(graft.Tables.eventMs.as("ms"), col("user_id").cast("string").as("key"))
        .as[(Long, String)])
    ops.write.mode("append").parquet(in)

    // one continuous query — config changes arrive as control MESSAGES in
    // later micro-batches, never as restarts
    val configs = Sharding.configScript :+
      Sharding.join(Sharding.configScript.last, Map(7 -> Seq("g7a")))
    val stream = spark.readStream.schema(schema).parquet(in)
      .as[ShardStream.ShardIn]
    val q = ShardStream.shardKvStream(stream, configs).toDF()
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }.start()
    try {
      q.processAllAvailable() // fold all data ops
      val cfgMs = Long.MaxValue / 2
      for (t <- 1 to 6) { // the full batch config script, one hop per batch
        ShardStream.configRows(spark, t, cfgMs + t).write.mode("append").parquet(in)
        q.processAllAvailable()
      }
      // serve-during-migration: MORE ops after six migrations, same state
      val extra = Seq((cfgMs + 10, "5x"), (cfgMs + 11, "5y"))
      ShardStream.opRows(spark.createDataset(extra)).write.mode("append").parquet(in)
      ShardStream.configRows(spark, 7, cfgMs + 20).write.mode("append").parquet(in)
      q.processAllAvailable()
    } finally q.stop()

    val sub = spark.read.parquet(out)
    val streamed = ShardStream.shardCensus(sub.filter(col("config_num") <= 6))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    val batch = Sharding.migrationCensus(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(streamed == batch, s"stream census != batch census " +
      s"(stream-only: ${(streamed.keySet -- batch.keySet).take(5)}, " +
      s"batch-only: ${(batch.keySet -- streamed.keySet).take(5)})")

    // every hop's (shard, from, to) transitions == the batch migrationPlan
    for (t <- 2 to 6) {
      val want = Sharding.migrationPlan(configs(t - 1), configs(t))
        .map { case (s, f, g) => (s.toLong, f.toLong, g.toLong) }.toSet
      val got = sub.filter(col("config_num") === t && col("from_gid") =!= col("gid"))
        .select(col("shard"), col("from_gid"), col("gid")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"hop $t transitions: got $got want $want")
    }

    // the post-migration ops landed: census 7 == local truth over base+extra
    val baseCounts = graft.Tables.events(spark, sf)
      .groupBy(col("user_id").cast("string").as("key")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val allCounts = (baseCounts ++ Seq("5x" -> 1L, "5y" -> 1L))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val want7 = allCounts.toSeq
      .map { case (k, n) => (Sharding.key2shard(k), n) }
      .groupBy { case (s, _) => (s, configs(7).shards(s)) }
      .map { case ((s, g), xs) => (7L, s.toLong, g.toLong) -> (xs.size.toLong, xs.map(_._2).sum) }
    val got7 = ShardStream.shardCensus(sub.filter(col("config_num") === 7))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got7 == want7, s"census 7: got $got7 want $want7")
  }

  test("a control message naming an unknown config fails with a clear error, not an index bound") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("shardbadin").toString
    val ckpt = java.nio.file.Files.createTempDirectory("shardbadckpt").toString
    ShardStream.configRows(spark, configNum = 99, ms = 1L)
      .write.mode("append").parquet(in)
    val schema = org.apache.spark.sql.Encoders.product[ShardStream.ShardIn].schema
    val stream = spark.readStream.schema(schema).parquet(in).as[ShardStream.ShardIn]
    val q = ShardStream.shardKvStream(stream, Sharding.configScript).toDF()
      .writeStream.format("memory").queryName("shard_bad")
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("config history has entries")),
      s"expected the clear control-plane error, got: ${messages(e).mkString(" | ")}")
  }
}
