package graft.streaming

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkTestSession
import graft.sim.Similarity

/** Parity of the streaming IVF upsert with its batch twin: same frozen
  * codebook, same appended rows, same max-merged radii, identical search
  * results — and the base generation's files byte-untouched by the stream. */
class IndexStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  private def census(dir: String): Map[String, Long] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) Map.empty
    else {
      val it = Files.walk(root).iterator()
      val m = scala.collection.mutable.Map.empty[String, Long]
      while (it.hasNext) {
        val p = it.next()
        if (Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
          m(root.relativize(p).toString) = Files.size(p)
      }
      m.toMap
    }
  }

  private def copyTree(from: String, to: String): Unit = {
    val src = Paths.get(from); val dst = Paths.get(to)
    val it = Files.walk(src).iterator()
    while (it.hasNext) {
      val p = it.next()
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }

  test("streaming upsert == batch upsert: rows, radii, search; base files untouched") {
    import spark.implicits._
    val vecs = Similarity.vectors(spark, sf)
    val base  = vecs.filter(_.vec_id % 5 != 4)
    val delta = vecs.filter(_.vec_id % 5 == 4).collect()
    assert(delta.nonEmpty)
    // RANGE split of the delta into two stream files (a modulo split would
    // ride the fixture's id-modulo structure — the round-8 trap)
    val mid = delta.map(_.vec_id).sorted.apply(delta.length / 2)
    val (d1, d2) = (delta.filter(_.vec_id < mid), delta.filter(_.vec_id >= mid))
    assert(d1.nonEmpty && d2.nonEmpty)

    val batchPath  = Files.createTempDirectory("ivfb").toString + "/index"
    val streamPath = Files.createTempDirectory("ivfs").toString + "/index"
    val baseIdx = Similarity.buildIvfIndexFrom(base, batchPath, nlist = 16)
    // identical base generation for the streaming side: copy the files, keep
    // the SAME frozen codebook + radii metadata
    copyTree(batchPath, streamPath)
    val baseCensus = census(streamPath)
    val streamBase = Similarity.IvfIndex(streamPath, baseIdx.centroids, baseIdx.radius)

    // batch twin: one-shot upsert of the whole delta
    val batchIdx = Similarity.upsertIvfIndex(baseIdx, spark.createDataset(delta.toSeq))

    // streaming side: one file per micro-batch through the shared code path
    val in = Files.createTempDirectory("ivfin")
    def writeHalf(rows: Array[Similarity.Vec], name: String): Unit = {
      val tmp = Files.createTempDirectory("ivfh").toString + "/out"
      spark.createDataset(rows.toSeq).coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp)).iterator()
      var src: Path = null
      while (part.hasNext) { val p = part.next(); if (p.toString.endsWith(".parquet")) src = p }
      Files.copy(src, in.resolve(name))
    }
    writeHalf(d1, "a.parquet")
    writeHalf(d2, "b.parquet")
    val ckpt = Files.createTempDirectory("ivfck").toString
    val schema = spark.createDataset(delta.toSeq).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in.toString)
      .select(col("vec_id"), col("embedding")).as[Similarity.Vec]
    val (q, snapshot) = IndexStream.upsertIvfStream(stream, streamBase, ckpt)
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "delta arrived in one micro-batch — streaming merge untested")
    val streamIdx = snapshot()

    // 1. base generation untouched: every pre-stream file still there, same size
    val after = census(streamPath)
    baseCensus.foreach { case (f, sz) =>
      assert(after.get(f).contains(sz), s"base file $f rewritten by the stream")
    }
    assert(after.size > baseCensus.size, "stream appended no new files")

    // 2. same rows with the same frozen-codebook assignments as the batch twin
    def rows(path: String) = spark.read.parquet(path)
      .select(col("vec_id"), col("list_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows(streamPath) == rows(batchPath))

    // 3. radii max-merge is split-invariant
    assert(streamIdx.radius == batchIdx.radius)

    // 4. identical search results over both generations (and both exact)
    val queries = vecs.filter(_.vec_id < 8).collect()
    def hits(idx: Similarity.IvfIndex) =
      Similarity.searchStoredIndex(spark, idx, queries, k = 10, nprobe = 4)
        .collect().map(h => (h.query_id, h.rank, h.neighbor_id, h.cosine)).toSet
    assert(hits(streamIdx) == hits(batchIdx))
  }
}
