package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  lazy val vecs = Similarity.vectors(spark, sf)
  lazy val book = Pq.train(vecs, m = 8, ksub = 16)

  test("codebook: m x ksub x dsub shape, sub-norms match centroids") {
    assert(book.m == 8 && book.dsub == 8)
    assert(book.centroids.length == 8)
    assert(book.centroids.forall(_.length == 16))
    assert(book.centroids.forall(_.forall(_.length == 8)))
    for (j <- 0 until 8; c <- 0 until 16)
      assert(book.subNorm2(j)(c) == Similarity.dot(book.centroids(j)(c), book.centroids(j)(c)))
  }

  test("training is deterministic for a fixed partitioning (recall floors depend on it)") {
    val again = Pq.train(vecs, m = 8, ksub = 16)
    for (j <- 0 until 8; c <- 0 until 16)
      assert(book.centroids(j)(c).toSeq == again.centroids(j)(c).toSeq, s"subspace $j centroid $c")
  }

  test("encode is deterministic and codes are in range") {
    val c1 = Pq.encode(vecs, book).collect().sortBy(_.vec_id)
    val c2 = Pq.encode(vecs, book).collect().sortBy(_.vec_id)
    assert(c1.length == vecs.count())
    c1.zip(c2).foreach { case (a, b) =>
      assert(a.vec_id == b.vec_id && a.codes.toSeq == b.codes.toSeq)
      assert(a.codes.forall(code => (code & 0xff) < 16))
    }
  }

  test("rerank = corpus size reproduces brute force row-for-row (endpoint by construction)") {
    val n = vecs.count().toInt
    val brute = Similarity.bruteForceTopK(spark, sf).collect()
      .map(h => (h.query_id, h.rank) -> (h.neighbor_id, h.cosine)).toMap
    val pq = Pq.pqTopK(spark, sf, rerank = n, trained = Some(book)).collect()
    assert(pq.length == brute.size)
    pq.foreach { h =>
      assert(brute((h.query_id, h.rank)) == ((h.neighbor_id, h.cosine)), h)
    }
  }

  test("recall is monotone in rerank width and the sweep is all recall_ok") {
    val brute = Similarity.bruteForceTopK(spark, sf).collect()
      .groupBy(_.query_id).map { case (q, hs) => q -> hs.map(_.neighbor_id).toSet }
    def matchedMin(rr: Int): Int = {
      val pq = Pq.pqTopK(spark, sf, rerank = rr, trained = Some(book)).collect()
        .groupBy(_.query_id).map { case (q, hs) => q -> hs.map(_.neighbor_id).toSet }
      pq.map { case (q, ids) => (ids intersect brute(q)).size }.min
    }
    val m40 = matchedMin(40)
    val m160 = matchedMin(160)
    assert(m40 >= 2, s"width-40 recall floor broke: $m40")   // pinned sweep floor
    assert(m160 >= 5, s"width-160 recall floor broke: $m160") // pinned sweep floor
    assert(m160 >= m40, "recall not monotone in rerank width")
    val sweep = Pq.pqRecallSweep(spark, sf).collect()
    assert(sweep.length == 24) // 3 widths x 8 queries
    assert(sweep.forall(_.getAs[Boolean]("recall_ok")), sweep.filterNot(_.getAs[Boolean]("recall_ok")).mkString(";"))
    assert(sweep.forall(_.getAs[Long]("n_hits") == 10L))
  }

  test("PQ encode-on-arrival: streaming encode with a FROZEN codebook == batch") {
    import org.apache.spark.sql.streaming.OutputMode
    import org.apache.spark.sql.{Encoders, functions => F}
    // codebook trained once on the at-rest corpus; ingest then encodes new
    // arrivals with the frozen book (map-only broadcast, no state) — the
    // codebook-refresh decision is compaction's, same as the IVF lifecycle
    val vecs = Similarity.vectors(spark, sf)
    val book = Pq.train(vecs, m = 8, ksub = 16)
    val batch = Pq.encode(vecs, book).collect()
      .map(c => c.vec_id -> c.codes.toSeq).toMap
    val in = java.nio.file.Files.createTempDirectory("pqin")
    java.nio.file.Files.copy(new java.io.File(sf, "embeddings.parquet").toPath,
      in.resolve("embeddings.parquet"))
    val out = java.nio.file.Files.createTempDirectory("pqout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pqckpt").toString
    val schema = graft.Tables.embeddings(spark, sf).schema
    val stream = spark.readStream.schema(schema).parquet(in.toString)
      .select(F.col("vec_id"), F.col("embedding"))
      .as[Similarity.Vec](Encoders.product[Similarity.Vec])
    val q = Pq.encode(stream, book).writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append())
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Pq.PqCode], _: Long) =>
        ds.write.mode("append").parquet(out)
      }.start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.schema(Encoders.product[Pq.PqCode].schema)
      .parquet(out).as[Pq.PqCode](Encoders.product[Pq.PqCode]).collect()
      .map(c => c.vec_id -> c.codes.toSeq).toMap
    assert(streamed == batch)
  }
}
