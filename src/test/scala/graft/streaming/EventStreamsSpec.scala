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

  test("stream-stream range join equals the batch range join's matched rows") {
    val stream = EventStreams.runOnce(spark, sf, "rjoin_stream",
        df => EventStreams.rangeJoinStream(df))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch truth: the same (purchase, view) pairs, derived independently
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), expr("ts DIV 1000000").as("ms"),
        col("event_id"), col("event_type"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ms").as("pms"), col("event_id").as("purchase_id"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ms").as("vms"))
    val batch = p.join(v, col("vu") === col("user_id") &&
        col("vms") >= col("pms") - 3600000L && col("vms") < col("pms"))
      .select(col("user_id"), col("purchase_id"), col("pms"), col("vms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(stream == batch)
    assert(stream.nonEmpty, "fixture produced no purchase-view matches — spec is vacuous")
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

  test("K7 streaming: config change at restart keeps KV state, re-routes moved shards") {
    import spark.implicits._
    import graft.kv.Op
    import graft.shard.Sharding
    val in = java.nio.file.Files.createTempDirectory("migin").toString
    val ckpt = java.nio.file.Files.createTempDirectory("migckpt").toString
    val out = java.nio.file.Files.createTempDirectory("migout").toString
    val opSchema = org.apache.spark.sql.Encoders.product[Op].schema

    // config A: groups {1,2}; config B: join(3) moves some shards onto 3
    val cfgA = Sharding.join(Sharding.join(Sharding.initial, Map(1 -> Seq("a"))), Map(2 -> Seq("b")))
    val cfgB = Sharding.join(cfgA, Map(3 -> Seq("c")))

    // the streaming form of shard migration: the keyed state store survives
    // the restart via the checkpoint (Spark's state rescale story), and the
    // OUTPUT routing column switches to the new config atomically at the
    // restart boundary — unaffected shards keep their gid, moved shards
    // re-route, and values concatenate across the boundary (state intact)
    def runWith(cfg: graft.shard.ShardConfig, batchTag: Int): Unit = {
      val stream = spark.readStream.schema(opSchema).parquet(in).as[Op]
      val q = EventStreams.kvStore(stream).toDF()
        .withColumn("shard", Sharding.shardCol(col("key")))
        .withColumn("gid", Sharding.gidCol(cfg, col("shard")))
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.withColumn("tag", lit(batchTag)).write.mode("append").parquet(out)
        }.start()
      try q.processAllAvailable() finally q.stop()
    }

    // keys "0x".."9x" cover all shards
    val ops1 = (0 to 9).map(d => Op(d.toLong, 1, 1, "append", s"${d}x", "A"))
    spark.createDataset(ops1).write.mode("append").parquet(in)
    runWith(cfgA, 1)
    val ops2 = (0 to 9).map(d => Op(100L + d, 1, 2, "append", s"${d}x", "B"))
    spark.createDataset(ops2).write.mode("append").parquet(in)
    runWith(cfgB, 2)

    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("value"),
        r.getAs[Int]("shard"), r.getAs[Int]("gid"), r.getAs[Int]("tag")))
    val phase2 = rows.filter(_._5 == 2)
    assert(phase2.length == 10)
    phase2.foreach { case (key, value, shard, gid, _) =>
      assert(value == "AB", s"state lost across restart for $key: $value")
      assert(gid == cfgB.shards(shard), s"$key at gid $gid, want ${cfgB.shards(shard)}")
    }
    // and phase-1 rows were routed by config A — moved shards demonstrably
    // changed owner at the boundary
    val phase1 = rows.filter(_._5 == 1)
    phase1.foreach { case (_, _, shard, gid, _) => assert(gid == cfgA.shards(shard)) }
    val moved = Sharding.migrationPlan(cfgA, cfgB).map(_._1).toSet
    assert(moved.nonEmpty)
    assert(phase2.exists(r => moved.contains(r._3)), "no moved-shard key observed")
  }

  test("streaming sessionize (flatMapGroupsWithState + event-time timeout) equals batch") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("sessin").toString
    val out = java.nio.file.Files.createTempDirectory("sessout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sessckpt").toString

    val real = graft.Tables.events(spark, sf)
      .select(col("user_id"), graft.Tables.eventMs.as("ms"))
      .select(col("user_id"), col("ms"), timestamp_millis(col("ms")).as("ts_ts"))
      .as[EventStreams.SessIn]
    val maxMs = real.agg(max(col("ms"))).collect()(0).getLong(0)
    // sentinel event far in the future: advances the watermark past every
    // real session's (end + gap), so all real sessions emit via timeout
    val sentinel = Seq(EventStreams.SessIn(-1L, maxMs + 86400000L,
      new java.sql.Timestamp(maxMs + 86400000L))).toDS()
    real.unionAll(sentinel).write.mode("overwrite").parquet(in)

    val schema = org.apache.spark.sql.Encoders.product[EventStreams.SessIn].schema
    val q = EventStreams.sessionize(
        spark.readStream.schema(schema).parquet(in).as[EventStreams.SessIn]).toDF()
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }.start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(out).filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val batch = graft.relational.RelationalQueries.evSessionize(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
  }

  test("streaming transitions (per-user last-type state, cross-batch) equal the batch matrix") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("transin").toString
    val out = java.nio.file.Files.createTempDirectory("transout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("transckpt").toString

    val real = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), graft.Tables.eventMs.as("ms"), col("event_id"))
      .as[EventStreams.TransIn].collect().sortBy(e => (e.ms, e.event_id))
    // three TIME-SLICED files + maxFilesPerTrigger=1: transitions that span
    // micro-batch boundaries must come from carried per-user state
    val cuts = Seq(real.length / 3, 2 * real.length / 3).map(i => real(i).ms)
    Seq(
      real.filter(_.ms < cuts(0)),
      real.filter(e => e.ms >= cuts(0) && e.ms < cuts(1)),
      real.filter(_.ms >= cuts(1))
    ).zipWithIndex.foreach { case (slice, i) =>
      slice.toSeq.toDS().coalesce(1).write.parquet(s"$in/f$i")
    }
    val schema = org.apache.spark.sql.Encoders.product[EventStreams.TransIn].schema
    val q = EventStreams.transitionsStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$in/f*").as[EventStreams.TransIn]).toDF()
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }.start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(out)
      .groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.relational.RelationalQueries.evTransitions(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
  }

  test("streaming SCD2 (closed intervals on arrival, cross-batch) equals batch minus open rows") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("scdin").toString
    val out = java.nio.file.Files.createTempDirectory("scdout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scdckpt").toString
    val real = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), graft.Tables.eventMs.as("ms"), col("event_id"))
      .as[EventStreams.TransIn].collect().sortBy(e => (e.ms, e.event_id))
    // time-sliced files: intervals that OPEN in one micro-batch and CLOSE
    // in a later one must come from carried state
    val cuts = Seq(real.length / 3, 2 * real.length / 3).map(i => real(i).ms)
    Seq(
      real.filter(_.ms < cuts(0)),
      real.filter(e => e.ms >= cuts(0) && e.ms < cuts(1)),
      real.filter(_.ms >= cuts(1))
    ).zipWithIndex.foreach { case (slice, i) =>
      slice.toSeq.toDS().coalesce(1).write.parquet(s"$in/f$i")
    }
    val schema = org.apache.spark.sql.Encoders.product[EventStreams.TransIn].schema
    val q = EventStreams.scd2Stream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$in/f*").as[EventStreams.TransIn]).toDF()
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }.start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    // batch truth minus each user's open (sentinel-closed) interval
    val batch = graft.relational.RelationalQueries.evScd2(spark, sf)
      .filter(col("valid_to_ms") =!= 253402300800000L).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
  }

  test("streaming funnel (flatMapGroupsWithState + event-time timeout) equals batch") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("funin").toString
    val out = java.nio.file.Files.createTempDirectory("funout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("funckpt").toString

    val real = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), graft.Tables.eventMs.as("ms"))
      .select(col("user_id"), col("event_type"), col("ms"),
        timestamp_millis(col("ms")).as("ts_ts"))
      .as[EventStreams.FunIn]
    val maxMs = real.agg(max(col("ms"))).collect()(0).getLong(0)
    // sentinel far in the future: watermark passes every user's last + quiet
    val sentinel = Seq(EventStreams.FunIn(-1L, "view", maxMs + 86400000L,
      new java.sql.Timestamp(maxMs + 86400000L))).toDS()
    real.unionAll(sentinel).write.mode("overwrite").parquet(in)

    val schema = org.apache.spark.sql.Encoders.product[EventStreams.FunIn].schema
    val q = EventStreams.funnelStream(
        spark.readStream.schema(schema).parquet(in).as[EventStreams.FunIn]).toDF()
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }.start()
    try q.processAllAvailable() finally q.stop()

    def optAt(r: org.apache.spark.sql.Row, i: Int): Option[Long] =
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    val streamed = spark.read.parquet(out).filter(col("user_id") >= 0)
      .collect().map(r => r.getLong(0) -> (optAt(r, 1), optAt(r, 2), optAt(r, 3), r.getInt(4))).toMap
    val batch = graft.relational.RelationalQueries.evFunnel(spark, sf)
      .collect().map(r => r.getLong(0) -> (optAt(r, 1), optAt(r, 2), optAt(r, 3), r.getInt(4))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
  }

  test("ingest-time decontamination column: streaming == batch == local recomputation") {
    import spark.implicits._
    val evalGrams = graft.dedup.Dedup.evalGramSet(spark, sf)
    assert(evalGrams.nonEmpty && evalGrams.sameElements(evalGrams.sorted))

    val batch = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.dedup.Dedup.decontamStreamCol(col("text"), evalGrams).as("n_shared"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    // same column over a readStream source: stateless, append-mode, no
    // watermark — the ingest-gate shape
    val out = java.nio.file.Files.createTempDirectory("decout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("decckpt").toString
    val schema = graft.Tables.documents(spark, sf).schema
    // the fixture is a single parquet FILE; the file stream source wants a dir
    val docsDir = java.nio.file.Files.createTempDirectory("decin")
    java.nio.file.Files.copy(
      new java.io.File(sf, "documents.parquet").toPath,
      docsDir.resolve("documents.parquet"))
    val q = spark.readStream.schema(schema).parquet(docsDir.toString)
      .select(col("doc_id"),
        graft.dedup.Dedup.decontamStreamCol(col("text"), evalGrams).as("n_shared"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }.start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(out)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed == batch)

    // independent local recomputation on string shingles
    val evalSet = evalGrams.toSet
    val local = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect().map { r =>
        val toks = r.getString(1).toLowerCase.split("[^\\p{L}]+").toSeq.filter(_.nonEmpty)
        val grams = graft.dedup.Dedup.shingles(toks, w = 5).map(graft.dedup.Dedup.fnv64)
        r.getLong(0) -> grams.count(evalSet.contains)
      }.toMap
    assert(batch == local)
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

  test("streaming windowed top-k: finalized-window ranking equals batch") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("topkin").toString
    val out = java.nio.file.Files.createTempDirectory("topkout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("topkckpt").toString

    val ev = graft.Tables.events(spark, sf).select(col("ts"), col("event_type"))
    val maxTs = ev.agg(max(col("ts"))).collect()(0).getLong(0)
    ev.coalesce(1).write.mode("append").parquet(in)
    // sentinel in a LATER file: advances the watermark past every real
    // window so append mode finalizes them all; its own window never closes
    Thread.sleep(1100) // file-source orders batches by mod time (second granularity)
    Seq((maxTs + 3L * 86400 * 1000000000L, "zzz_sentinel")).toDF("ts", "event_type")
      .coalesce(1).write.mode("append").parquet(in)

    val q = EventStreams.hourlyTypeCounts(
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1").parquet(in))
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // all groups of a closed window arrive in the same micro-batch, so
        // sink-side ranking sees complete windows
        EventStreams.topKOfFinalized(df, k = 3).write.mode("append").parquet(out)
      }.start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getString(1), r.getLong(2))).toMap
    val batch = EventStreams.topKOfFinalized(
        graft.relational.RelationalQueries.evHourlyAgg(spark, sf)
          .select(col("hour_ms"), col("event_type"), col("n_events")), k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getString(1), r.getLong(2))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"stream-only=${(streamed.toSet -- batch.toSet).take(3)} batch-only=${(batch.toSet -- streamed.toSet).take(3)}")
  }

  test("streaming LSH near-dup pairs equal batch minhashLsh across micro-batches") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("lshin").toString
    val out = java.nio.file.Files.createTempDirectory("lshout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lshckpt").toString

    // fixture docs split into two files => two micro-batches: near-dup pairs
    // spanning the split can only be found through the bucket STATE
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(in)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(in)

    val q = EventStreams.nearDupPairsStream(
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", "1").parquet(in),
        threshold = 0.7).toDF()
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }.start()
    val progress = try {
      q.processAllAvailable()
      q.recentProgress.map(p => (p.batchId, p.numInputRows)).toSeq
    } finally q.stop()
    // the split really became two micro-batches, so cross-file pairs can
    // only surface through bucket state (CapStreamSpec round-8 lesson)
    assert(progress.count(_._2 > 0) >= 2, s"expected >=2 data batches, got $progress")

    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.dedup.Dedup.minhashLsh(spark, sf, threshold = 0.7).collect()
      .map(p => (p.d1, p.d2, p.est_jaccard)).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      s"stream-only=${(streamed -- batch).take(5)} batch-only=${(batch -- streamed).take(5)}")
    // and pairs genuinely span the file split (one even + one odd doc id)
    assert(streamed.exists { case (d1, d2, _) => (d1 % 2) != (d2 % 2) },
      "no cross-batch pair — the split is not exercising bucket state")
  }

  test("KV store client marks are bounded: idle clients evict past the dedup horizon") {
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.kv.Op
    val horizon = 1000L
    val state = TestGroupState.create[EventStreams.KvSessionState](
      optionalState = org.apache.spark.api.java.Optional.empty(),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    // batch 1: three clients write
    EventStreams.applyOpsToState(horizon)("k", Iterator(
      Op(10, 1, 1, "append", "k", "a"),
      Op(20, 2, 1, "append", "k", "b"),
      Op(30, 3, 1, "append", "k", "c")), state)
    assert(state.get.marks.keySet == Set(1L, 2L, 3L))
    // batch 2: only client 3 is active, far past the horizon → 1 and 2 evict
    EventStreams.applyOpsToState(horizon)("k", Iterator(
      Op(5000, 3, 2, "append", "k", "d")), state)
    assert(state.get.marks.keySet == Set(3L), s"marks: ${state.get.marks}")
    assert(state.get.value == "abcd")
    // a stale retry from evicted client 1 now re-applies — the documented
    // watermark trade-off (same contract as dropDuplicatesWithinWatermark)
    val out = EventStreams.applyOpsToState(horizon)("k", Iterator(
      Op(5001, 1, 1, "append", "k", "a")), state)
    assert(out.value == "abcda")
  }

  test("dropDuplicatesWithinWatermark removes redelivered events across micro-batches") {
    val in = java.nio.file.Files.createTempDirectory("dedupin").toString
    val out = java.nio.file.Files.createTempDirectory("dedupout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("dedupckpt").toString

    // two identical deliveries of the fixture events as separate files;
    // maxFilesPerTrigger=1 forces the duplicate copy into a LATER
    // micro-batch, so dedup must work through state, not within a batch
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    ev.coalesce(1).write.mode("overwrite").parquet(in)
    val firstFile = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(firstFile.toPath,
      new java.io.File(in, "copy-" + firstFile.getName).toPath)

    val schema = ev.schema
    val q = EventStreams.dedupStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(in),
        idCols = Seq("event_id"))
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }.start()
    val progress = try {
      q.processAllAvailable()
      q.recentProgress.map(p => (p.batchId, p.numInputRows)).toSeq
    } finally q.stop()
    // the redelivery really arrived in a LATER micro-batch — otherwise the
    // spec tests within-batch dedup, not state (CapStreamSpec round-8
    // lesson: a split that silently collapses proves nothing)
    assert(progress.count(_._2 > 0) >= 2, s"expected >=2 data batches, got $progress")

    val got = spark.read.parquet(out)
    val nDistinct = ev.select("event_id").distinct().count()
    assert(got.count() == nDistinct, "every event exactly once despite redelivery")
    assert(got.select("event_id").distinct().count() == nDistinct)
  }
  test("streaming CDC snapshot (commutative argmax state) equals batch MERGE-apply, " +
    "even with SHUFFLED arrival order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val in = java.nio.file.Files.createTempDirectory("cdcin").toString
    val out = java.nio.file.Files.createTempDirectory("cdcout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdcckpt").toString
    val real = graft.Tables.events(spark, sf)
      .select(col("user_id"), graft.Tables.eventMs.as("ms"), col("event_id"),
        col("event_type"), col("value"))
      .as[EventStreams.CdcIn].collect()
    // DISORDERED slices on purpose (sorted by a hash of event_id, not time):
    // the commutative fold must not care — this is the property that
    // distinguishes CDC apply from the order-contracted transition twins
    val shuffled = real.sortBy(e => (e.event_id * 2654435761L) % 1000003)
    val k = shuffled.length / 3
    Seq(shuffled.take(k), shuffled.slice(k, 2 * k), shuffled.drop(2 * k))
      .zipWithIndex.foreach { case (slice, i) =>
        slice.toSeq.toDS().coalesce(1).write.parquet(s"$in/f$i")
      }
    val schema = org.apache.spark.sql.Encoders.product[EventStreams.CdcIn].schema
    val q = EventStreams.cdcStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$in/f*").as[EventStreams.CdcIn]).toDF()
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.withColumn("batch_id", lit(id)).write.mode("append").parquet(out)
      }.start()
    try q.processAllAvailable() finally q.stop()
    // the LAST emission per user is the settled snapshot
    val emitted = spark.read.parquet(out).collect()
      .groupBy(_.getLong(0)).map { case (u, rs) =>
        val last = rs.maxBy(_.getLong(5))
        u -> (last.getString(1), last.getDouble(2), last.getLong(3), last.getLong(4))
      }
    val batch = graft.relational.RelationalQueries.qCdcApply(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    val streamedLive = emitted.collect { case (u, ("U", v, ms, n)) => u -> (v, ms, n) }.toMap
    assert(streamedLive == batch, "settled streaming snapshot != batch MERGE-apply")
    // tombstones are SAID in the stream (op D), merely OMITTED in batch
    val dead = emitted.collect { case (u, ("D", _, _, _)) => u }.toSet
    assert(dead.nonEmpty && (dead & batch.keySet).isEmpty)
    assert(emitted.size == dead.size + batch.size, "every user settles exactly once")
  }

  test("streaming attribution (on-arrival last/first-touch) equals batch ev_attribution " +
    "across time-sliced micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val in = java.nio.file.Files.createTempDirectory("attrin").toString
    val out = java.nio.file.Files.createTempDirectory("attrout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("attrckpt").toString
    val real = graft.Tables.events(spark, sf)
      .select(col("user_id"), graft.Tables.eventMs.as("ms"), col("event_id"),
        col("event_type"), col("value"))
      .as[EventStreams.AttrIn].collect()
      .sortBy(e => (e.ms, e.event_id)) // arrival respects event time — the twin's contract
    val k = real.length / 3
    Seq(real.take(k), real.slice(k, 2 * k), real.drop(2 * k))
      .zipWithIndex.foreach { case (slice, i) =>
        slice.toSeq.toDS().coalesce(1).write.parquet(s"$in/f$i")
      }
    val schema = org.apache.spark.sql.Encoders.product[EventStreams.AttrIn].schema
    val q = EventStreams.attributionStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$in/f*").as[EventStreams.AttrIn]).toDF()
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(out)
      }.start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row): (Long, Long) = (r.getLong(0), r.getLong(1))
    def payload(r: org.apache.spark.sql.Row) =
      (r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6),
        r.getBoolean(7),
        if (r.isNullAt(8)) -1L else r.getLong(8))
    val streamed = spark.read.parquet(out)
      .select("user_id", "purchase_id", "purchase_ms", "value", "click_id",
        "click_ms", "gap_ms", "attributed", "first_click_id")
      .collect().map(r => key(r) -> payload(r)).toMap
    val batch = graft.relational.RelationalQueries.evAttribution(spark, sf)
      .select(col("user_id"), col("purchase_id"), col("purchase_ms"), col("value"),
        col("click_id"), col("click_ms"), col("gap_ms"), col("attributed"),
        col("first_click_id"))
      .collect().map(r => key(r) -> payload(r)).toMap
    assert(streamed == batch, {
      val extra = (streamed.keySet -- batch.keySet).take(3)
      val missing = (batch.keySet -- streamed.keySet).take(3)
      val diff = streamed.collect {
        case (k2, v) if batch.get(k2).exists(_ != v) => (k2, v, batch(k2))
      }.take(2)
      s"extra=$extra missing=$missing diff=$diff"
    })
    assert(streamed.nonEmpty && streamed.values.exists(_._6),
      "no attributed purchase at fixture scale — degenerate")
  }
}
