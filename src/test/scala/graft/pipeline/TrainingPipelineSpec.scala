package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.dedup.Dedup

/** The capstone composition: every stage verdict must agree with its
  * standalone registered query (the flags are computed FUSED, the stage
  * queries are the semantic truth), and the funnel/packing accounting must
  * close. */
class TrainingPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  lazy val flags = TrainingPipeline.stageFlags(spark, sf).collect()
    .map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Boolean]("pass_hygiene"), r.getAs[Boolean]("keep_dedup"),
        r.getAs[Boolean]("pass_decontam"), r.getAs[Boolean]("pass_mixture"),
        r.getAs[Boolean]("kept"), r.getAs[Long]("n_tokens")))).toMap

  test("fused stage verdicts equal the standalone stage queries") {
    // hygiene == NOT blocked (wordlist) AND gopher_ok (shape rules)
    val blocked = graft.text.TextAnalysis.blocklist(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val gopher = graft.text.TextAnalysis.gopherFilters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    flags.foreach { case (id, (ph, _, _, _, _, _)) =>
      val want = !blocked(id) && gopher.getOrElse(id, false)
      assert(ph == want, s"hygiene mismatch for doc $id")
    }
    // dedup == the canonical keep-list
    val keep = Dedup.nearDupComponents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    flags.foreach { case (id, (_, kd, _, _, _, _)) => assert(kd == keep(id)) }
    // decontam == not an eval doc and not in the exact overlap's train set
    val contaminated = Dedup.decontamOverlap(spark, sf).collect()
      .map(_.getLong(0)).toSet
    flags.foreach { case (id, (_, _, pd, _, _, _)) =>
      assert(pd == (id % 50 != 0 && !contaminated(id)), s"decontam mismatch for $id")
    }
    // mixture == the hash-fate keep set
    val mixKeep = graft.sample.Sampling.mixture(spark, sf).collect()
      .map(_.getLong(0)).toSet
    flags.foreach { case (id, (_, _, _, pm, _, _)) => assert(pm == mixKeep(id)) }
  }

  test("the funnel row closes against the flags; stages are non-degenerate") {
    val row = TrainingPipeline.trainingSetCounts(spark, sf).collect()(0)
    val Seq(total, hy, dd, dc, mx, toks, seqs) = (0 until 7).map(row.getLong)
    assert(total == flags.size)
    assert(hy == flags.values.count(_._1))
    assert(dd == flags.values.count(f => f._1 && f._2))
    assert(dc == flags.values.count(f => f._1 && f._2 && f._3))
    assert(mx == flags.values.count(_._5))
    assert(toks == flags.values.collect { case f if f._5 => f._6 }.sum)
    assert(seqs == (toks + 511) / 512)
    // a funnel, and every stage actually cuts on this fixture
    assert(total > hy && hy > dd && dd >= dc && dc > mx && mx > 0,
      s"degenerate funnel: $total -> $hy -> $dd -> $dc -> $mx")
  }

  test("assemble: packing accounting closes over the kept set") {
    val packed = TrainingPipeline.assemble(spark, sf).collect()
    val kept = flags.filter(_._2._5)
    assert(packed.length == kept.size)
    val packedTokens = packed.map(_.getAs[Long]("n_tokens")).sum
    assert(packedTokens == kept.values.map(_._6).sum)
    // chunk ids tile the token stream: last doc's last_chunk is the
    // sequence count minus one, offsets are dense
    val lastChunk = packed.map(_.getAs[Long]("last_chunk")).max
    assert(lastChunk == (packedTokens + 511) / 512 - 1)
    val starts = packed.sortBy(_.getAs[Long]("token_start"))
    starts.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("token_start") + a.getAs[Long]("n_tokens") ==
          b.getAs[Long]("token_start"), "offset gap in packed stream")
      case _ =>
    }
  }

  test("writeTrainingSet: the written artifact equals assemble and is chunk-range laid out") {
    val out = java.nio.file.Files.createTempDirectory("trainset").toString + "/t"
    val written = TrainingPipeline.writeTrainingSet(spark, sf, out, nFiles = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("token_start"), r.getAs[Long]("first_chunk"))).toMap
    val want = TrainingPipeline.assemble(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("token_start"), r.getAs[Long]("first_chunk"))).toMap
    assert(written == want)
    // layout: each parquet file covers a disjoint first_chunk interval
    // (range partitioning), so footer stats can prune chunk-range reads
    val perFile = spark.read.parquet(out)
      .select(org.apache.spark.sql.functions.input_file_name().as("f"), col("first_chunk"))
      .collect().groupBy(_.getString(0))
      .map { case (f, rs) => f -> (rs.map(_.getLong(1)).min, rs.map(_.getLong(1)).max) }
    val spans = perFile.values.toSeq.sortBy(_._1)
    spans.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 <= b._1, s"file chunk ranges overlap: $spans")
      case _ =>
    }
  }

  test("streaming ingest gate == batch stageFlags under the frozen keep-list; " +
    "unseen docs default to keep") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val evalGrams = graft.dedup.Dedup.evalGramSet(spark, sf)
    val keep = graft.dedup.Dedup.nearDupComponents(spark, sf)
      .select(col("doc_id"), col("keep")).localCheckpoint()
    val stream = graft.Tables.streamSource(spark, sf, "documents")
    val gated = TrainingPipeline.ingestGateStream(stream, evalGrams, keep)
      .select("doc_id", "pass_hygiene", "keep_dedup", "pass_decontam", "pass_mixture", "kept")
    val q = gated.writeStream.format("memory").queryName("ingest_gate")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))
    val got = spark.table("ingest_gate").collect().map(key).toSet
    val expect = TrainingPipeline.stageFlags(spark, sf)
      .select("doc_id", "pass_hygiene", "keep_dedup", "pass_decontam", "pass_mixture", "kept")
      .collect().map(key).toSet
    assert(got == expect, "stream-scored verdicts must equal the batch funnel's")
    assert(got.nonEmpty && got.exists(!_._6) && got.exists(_._6), "degenerate fixture")
    // frozen-keep-list semantics: a doc the last build never saw defaults to
    // keep (dedup is the NEXT build's job) — empty keep-list keeps everyone
    val emptyKeep = keep.filter(lit(false)).localCheckpoint()
    val gated2 = TrainingPipeline.ingestGateStream(stream, evalGrams, emptyKeep)
      .select("doc_id", "keep_dedup")
    val q2 = gated2.writeStream.format("memory").queryName("ingest_gate_empty")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table("ingest_gate_empty").collect().forall(_.getBoolean(1)),
      "unseen docs must default to keep_dedup = true")
  }
}
