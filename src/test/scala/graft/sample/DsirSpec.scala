package graft.sample

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.Fnv32

/** Semantics pins for DSIR importance selection (the value oracle is the
  * driver's DuckDB compare on the fixed-point micro-llr surface). */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  val B = Dsir.NumBuckets

  def grams(text: String): Seq[String] = {
    val tk = text.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq
    tk ++ tk.zip(tk.drop(1)).map { case (a, b) => s"$a $b" }
  }

  /** (per-doc bucket counts, per-bucket integer micro-llr) on the exact
    * surface: same tokenization, same FNV buckets, same one-rounding-per-
    * bucket llr as the engine. */
  lazy val (perDoc, llrLocal) = {
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perDoc = docs.map { case (id, lang, text) =>
      val counts = grams(text).groupBy(g => Fnv32.hash(g) % B)
        .map { case (b, gs) => b -> gs.size.toLong }
      (id, lang, counts)
    }
    val rc = perDoc.flatMap(_._3).groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val tc = perDoc.filter(_._2 == "en").flatMap(_._3).groupBy(_._1)
      .map { case (b, xs) => b -> xs.map(_._2).sum }
    val rtot = rc.values.sum
    val ttot = tc.values.sum
    val llr = (0 until B).map { b =>
      b -> rc.get(b).map { r =>
        BigDecimal((math.log((tc.getOrElse(b, 0L) + 1).toDouble / (ttot + B)) -
          math.log((r + 1).toDouble / (rtot + B))) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }.getOrElse(0L)
    }.toMap
    (perDoc, llr)
  }

  /** doc_id -> (score_fx, n_grams) over every non-empty doc. */
  lazy val localScores: Map[Long, (Long, Long)] =
    perDoc.filter(_._3.nonEmpty).map { case (id, _, counts) =>
      id -> (counts.map { case (b, c) => c * llrLocal(b) }.sum, counts.values.sum)
    }.toMap

  lazy val localTop: Seq[(Long, Long, Long)] =
    localScores.toSeq.map { case (id, (s, n)) => (id, s, n) }
      .sortBy { case (id, s, _) => (-s, id) }.take(Dsir.TopN)

  test("importanceTop equals the local reference on the exact integer surface") {
    val got = Dsir.importanceTop(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy { case (id, s, _) => (-s, id) }
    assert(got == localTop, {
      val diff = got.zip(localTop).collectFirst { case (g, w) if g != w => (g, w) }
      s"first divergence: $diff (got ${got.size} rows, want ${localTop.size})"
    })
  }

  test("selection skews toward the target language — the operator's whole point") {
    val langs = graft.Tables.documents(spark, sf).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val corpusEnFrac = langs.values.count(_ == "en").toDouble / langs.size
    val top = Dsir.importanceTop(spark, sf).collect().map(_.getLong(0))
    val topEnFrac = top.count(id => langs(id) == "en").toDouble / top.length
    assert(topEnFrac > corpusEnFrac,
      s"top-${top.length} en fraction $topEnFrac <= corpus $corpusEnFrac — no importance signal")
  }

  test("frozen-llr score-on-arrival: streaming scores == local reference, bit-exact") {
    import org.apache.spark.sql.streaming.OutputMode
    val llr = Dsir.trainLlr(spark, sf)
    (0 until B).foreach(b => assert(llr(b) == llrLocal(b), s"llr bucket $b: ${llr(b)} != ${llrLocal(b)}"))
    val in = java.nio.file.Files.createTempDirectory("dsirin")
    java.nio.file.Files.copy(new java.io.File(sf, "documents.parquet").toPath,
      in.resolve("documents.parquet"))
    val ckpt = java.nio.file.Files.createTempDirectory("dsirckpt").toString
    val schema = graft.Tables.documents(spark, sf).schema
    val q = Dsir.scoreOnArrival(
        spark.readStream.schema(schema).parquet(in.toString), llr)
      .writeStream.option("checkpointLocation", ckpt)
      .format("memory").queryName("dsir_stream").outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("dsir_stream").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == localScores)
  }

  test("plan: bounded top-N (TakeOrderedAndProject), broadcast llr join, no global sort") {
    val plan = Dsir.importanceTop(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"plan:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"), "llr table should broadcast")
    assert(!plan.contains("CartesianProduct"))
  }
}
