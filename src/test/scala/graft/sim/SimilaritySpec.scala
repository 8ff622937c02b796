package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  lazy val all: Array[Similarity.Vec] = Similarity.vectors(spark, sf).collect()

  test("brute-force top-k matches a driver-local exact computation") {
    val k = 10
    val hits = Similarity.bruteForceTopK(spark, sf, numQueries = 4, k = k).collect()
      .groupBy(_.query_id)
    (0L until 4L).foreach { q =>
      val qv = all.find(_.vec_id == q).get
      val expected = all.filter(_.vec_id != q)
        .map(v => (Similarity.cosine(qv.embedding, v.embedding), v.vec_id))
        .sortBy { case (c, id) => (-c, id) }.take(k)
        .map { case (c, id) =>
          (BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, id) }
      val got = hits(q).sortBy(_.rank).map(h => (h.cosine, h.neighbor_id)).toSeq
      assert(got == expected.toSeq, s"query $q")
    }
  }

  test("hard negatives: exact top-k among DIFFERENT-label vectors only") {
    val labeled = graft.Tables.embeddings(spark, sf).select("label", "vec_id", "embedding")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    val k = 10
    val hits = Similarity.hardNegatives(spark, sf, numQueries = 4, k = k).collect()
      .groupBy(_.query_id)
    val labelOf = labeled.map(v => v._2 -> v._1).toMap
    (0L until 4L).foreach { q =>
      val (ql, _, qe) = labeled.find(_._2 == q).get
      val expected = labeled.filter(_._1 != ql)
        .map { case (_, id, e) => (Similarity.cosine(qe, e), id) }
        .sortBy { case (c, id) => (-c, id) }.take(k)
        .map { case (c, id) =>
          (BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, id) }
      val got = hits(q).sortBy(_.rank).map(h => (h.cosine, h.neighbor_id)).toSeq
      assert(got == expected.toSeq, s"query $q")
      hits(q).foreach(h => assert(labelOf(h.neighbor_id) != ql,
        s"same-label vector ${h.neighbor_id} leaked into query $q's negatives"))
    }
  }

  test("top-k ranks are 1..k with descending cosine") {
    val hits = Similarity.bruteForceTopK(spark, sf, numQueries = 2, k = 5).collect()
      .groupBy(_.query_id)
    hits.values.foreach { hs =>
      val sorted = hs.sortBy(_.rank)
      assert(sorted.map(_.rank).toSeq == (1 to 5))
      assert(sorted.sliding(2).forall(p => p(0).cosine >= p(1).cosine))
    }
  }

  test("IVF recall vs brute force is reasonable at nprobe=4/nlist=16") {
    val k = 10
    val brute = Similarity.bruteForceTopK(spark, sf, numQueries = 8, k = k).collect()
      .groupBy(_.query_id).view.mapValues(_.map(_.neighbor_id).toSet).toMap
    val ivf = Similarity.ivfTopK(spark, sf, numQueries = 8, k = k).collect()
      .groupBy(_.query_id).view.mapValues(_.map(_.neighbor_id).toSet).toMap
    val recalls = brute.keys.map { q =>
      ivf.getOrElse(q, Set.empty).intersect(brute(q)).size.toDouble / k
    }.toSeq
    val mean = recalls.sum / recalls.size
    // near-orthogonal random embeddings are a worst case for IVF; just
    // require it finds a meaningful fraction and runs the pruned path
    assert(mean > 0.2, s"mean recall $mean")
  }

  test("SQ8-searched top-k equals brute force exactly (error-ball rescan)") {
    val brute = Similarity.bruteForceTopK(spark, sf).collect()
      .map(h => (h.query_id, h.rank) -> (h.neighbor_id, h.cosine)).toMap
    val sq8 = Similarity.sq8TopK(spark, sf).collect()
      .map(h => (h.query_id, h.rank) -> (h.neighbor_id, h.cosine)).toMap
    assert(sq8 == brute)
  }

  test("sq8Index codes are int8-ranged and reconstruct within scale/2 per coord") {
    import spark.implicits._
    val idx = Similarity.sq8Index(Similarity.vectors(spark, sf)).collect()
    val orig = all.map(v => v.vec_id -> v.embedding).toMap
    idx.foreach { sv =>
      val x = orig(sv.vec_id)
      sv.q.zip(x).foreach { case (q, xi) =>
        assert(q >= -127 && q <= 127)
        if (sv.scale != 0.0)
          assert(math.abs(xi.toDouble - q * sv.scale) <= sv.scale / 2 + 1e-12)
      }
    }
  }

  test("sq8 encode-on-arrival: streaming encode == batch index (stateless twin)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val batch = Similarity.sq8Index(Similarity.vectors(spark, sf)).collect()
      .map(sv => sv.vec_id -> ((sv.scale, sv.q.toSeq))).toMap
    // the fixture is a single parquet FILE; the file stream source wants a dir
    val in = java.nio.file.Files.createTempDirectory("sq8in")
    java.nio.file.Files.copy(new java.io.File(sf, "embeddings.parquet").toPath,
      in.resolve("embeddings.parquet"))
    val out = java.nio.file.Files.createTempDirectory("sq8out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sq8ckpt").toString
    val schema = graft.Tables.embeddings(spark, sf).schema
    val stream = spark.readStream.schema(schema).parquet(in.toString)
      .select(col("vec_id"), col("embedding")).as[Similarity.Vec]
    val q = Similarity.sq8Index(stream).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Similarity.SqVec], _: Long) =>
        ds.write.mode("append").parquet(out)
      }.start()
    try q.processAllAvailable() finally q.stop()
    import org.apache.spark.sql.Encoders
    val streamed = spark.read.schema(Encoders.product[Similarity.SqVec].schema)
      .parquet(out).as[Similarity.SqVec].collect()
      .map(sv => sv.vec_id -> ((sv.scale, sv.q.toSeq))).toMap
    assert(streamed == batch)
  }

  test("embedding near-dups are symmetric-free (d1 < d2) and above threshold") {
    val dups = Similarity.embeddingNearDups(spark, sf, threshold = 0.3).collect()
    assert(dups.nonEmpty)
    dups.foreach { p =>
      assert(p.d1 < p.d2)
      assert(p.cosine >= 0.3)
    }
  }

  test("stored IVF index: exact results AND parquet partition pruning on probes") {
    val path = java.nio.file.Files.createTempDirectory("ivfspec").toString + "/index"
    val stored = Similarity.ivfTopKStored(spark, sf, path, numQueries = 4, k = 5)
      .collect().map(h => (h.query_id, h.rank) -> (h.neighbor_id, h.cosine)).toMap
    val brute = Similarity.bruteForceTopK(spark, sf, numQueries = 4, k = 5)
      .collect().map(h => (h.query_id, h.rank) -> (h.neighbor_id, h.cosine)).toMap
    assert(stored == brute, "stored-index search must be exact")
    // the index is physically partitioned by list id...
    val dirs = new java.io.File(path).listFiles().filter(_.getName.startsWith("list_id="))
    assert(dirs.length > 1, s"expected multiple list partitions, got ${dirs.toSeq}")
    // ...and a probe's scan plan prunes to the requested partitions
    val probe = Similarity.storedLists(spark, path, Set(0, 1))
    probe.collect()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert("PartitionFilters: \\[[^\\]]*list_id".r.findFirstIn(plan).isDefined,
      s"no partition filter on list_id in:\n$plan")
  }

  test("index upsert: append-only base files, radii only grow, search stays exact") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val path = Files.createTempDirectory("upsertspec").toString + "/index"
    val vecs = Similarity.vectors(spark, sf)
    val base  = vecs.filter(_.vec_id % 5 != 4)
    val delta = vecs.filter(_.vec_id % 5 == 4)
    val idx0 = Similarity.buildIvfIndexFrom(base, path, nlist = 16)
    def census(): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val root = Paths.get(path)
      Files.walk(root).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString ->
          ((Files.size(p), Files.getLastModifiedTime(p).toMillis)))
        .toMap
    }
    val before = census()
    assert(before.nonEmpty)
    val idx = Similarity.upsertIvfIndex(idx0, delta)
    val after = census()
    // the ingest claim: upsert APPENDS — no base file is rewritten or lost
    before.foreach { case (f, meta) =>
      assert(after.get(f).contains(meta), s"base file $f rewritten by upsert")
    }
    assert(after.size > before.size, "delta produced no new index files")
    assert(spark.read.parquet(path).count() == vecs.count())
    // max-merged radii can only grow — the soundness condition for ball
    // pruning over the merged index
    idx0.radius.foreach { case (l, r) =>
      assert(idx.radius(l) >= r, s"list $l radius shrank")
    }
    // and the search over an upserted index equals brute force end-to-end
    val p2 = Files.createTempDirectory("upsertspec2").toString + "/index"
    val got = Similarity.ivfTopKUpsert(spark, sf, p2, numQueries = 4, k = 5)
      .collect().map(h => (h.query_id, h.rank) -> (h.neighbor_id, h.cosine)).toMap
    val brute = Similarity.bruteForceTopK(spark, sf, numQueries = 4, k = 5)
      .collect().map(h => (h.query_id, h.rank) -> (h.neighbor_id, h.cosine)).toMap
    assert(got == brute, "upserted-index search must stay exact")
  }

  test("compaction: new generation, old files untouched, search stays exact") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val gen0 = Files.createTempDirectory("compactspec").toString + "/gen0"
    val vecs = Similarity.vectors(spark, sf)
    // lifecycle: build on the base, upsert the delta (drifted codebook) ...
    val idx = Similarity.upsertIvfIndex(
      Similarity.buildIvfIndexFrom(vecs.filter(_.vec_id % 5 != 4), gen0, nlist = 16),
      vecs.filter(_.vec_id % 5 == 4))
    def census(path: String): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val root = Paths.get(path)
      Files.walk(root).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString ->
          ((Files.size(p), Files.getLastModifiedTime(p).toMillis)))
        .toMap
    }
    val oldGen = census(gen0)
    // ... compact into a NEW generation: retrained codebook, rewritten lists
    val gen1 = gen0.stripSuffix("gen0") + "gen1"
    val idx2 = Similarity.compactIvfIndex(spark, idx, gen1, nlist = 16)
    assert(idx2.path == gen1)
    // zero read downtime: the old generation is byte-identical post-compact
    assert(census(gen0) == oldGen, "compaction touched the old generation")
    // nothing lost: the new generation holds the full corpus
    assert(spark.read.parquet(gen1).count() == vecs.count())
    // in-place compaction is refused outright
    intercept[IllegalArgumentException] {
      Similarity.compactIvfIndex(spark, idx2, gen1)
    }
    // both generations answer exactly: search == brute force before & after
    val brute = Similarity.bruteForceTopK(spark, sf, numQueries = 4, k = 5)
      .collect().map(h => (h.query_id, h.rank) -> (h.neighbor_id, h.cosine)).toMap
    val queries = vecs.filter(_.vec_id < 4).collect()
    def search(ix: Similarity.IvfIndex) = Similarity.searchStoredIndex(
        spark, ix, queries, k = 5, nprobe = 4)
      .collect().map(h => (h.query_id, h.rank) -> (h.neighbor_id, h.cosine)).toMap
    assert(search(idx) == brute, "pre-compaction search drifted")
    assert(search(idx2) == brute, "post-compaction search drifted")
  }

  test("filtered top-k: exact within the query's label, predicate pushed to the scan") {
    val k = 10
    val labelOf = graft.Tables.embeddings(spark, sf).select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Similarity.filteredTopK(spark, sf, numQueries = 4, k = k)
    val byQ = out.collect().groupBy(_.query_id)
    (0L until 4L).foreach { q =>
      val qv = all.find(_.vec_id == q).get
      val expected = all.filter(v => v.vec_id != q && labelOf(v.vec_id) == labelOf(q))
        .map(v => (Similarity.cosine(qv.embedding, v.embedding), v.vec_id))
        .sortBy { case (c, id) => (-c, id) }.take(k)
        .map { case (c, id) =>
          (BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, id) }
      val got = byQ(q).sortBy(_.rank).map(h => (h.cosine, h.neighbor_id)).toSeq
      assert(got == expected.toSeq, s"query $q")
    }
    // pre-filter vs post-filter is a real distinction on this fixture:
    // restricting brute force's GLOBAL top-k to the label must lose hits
    val brute = Similarity.bruteForceTopK(spark, sf, numQueries = 4, k = k)
      .collect().groupBy(_.query_id)
    val postFiltered = (0L until 4L).map { q =>
      brute(q).count(h => labelOf(h.neighbor_id) == labelOf(q))
    }
    assert(postFiltered.exists(_ < k),
      s"fixture degenerate: post-filtering would also deliver k ($postFiltered)")
    // the label IN (...) predicate reaches the parquet scan
    val plan = Similarity.filteredTopK(spark, sf, numQueries = 4, k = k)
      .queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*In\\(label".r.findFirstIn(plan).isDefined,
      s"label filter not pushed:\n${plan.take(1500)}")
  }

  test("chunked near-dups on a hot label: equal to all-pairs, every task group bounded") {
    import spark.implicits._
    // ONE label with 600 vectors — the skew case that used to be a single
    // quadratic task; with maxBlock=64 it becomes (10 choose 2)+10 bounded
    // chunk-pair groups
    val rnd = new scala.util.Random(11)
    val dim = 8
    val vecs = (0L until 600L).map { id =>
      (7, id, Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    }
    val maxBlock = 64
    val got = Similarity.chunkedNearDups(spark.createDataset(vecs), threshold = 0.8,
        maxBlock = maxBlock).collect()
      .map(p => (p.d1, p.d2, p.cosine)).sorted.toSeq
    val want = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until vecs.length
      c = Similarity.cosine6(vecs(i)._3, vecs(j)._3)
      if c >= 0.8
    } yield (vecs(i)._2, vecs(j)._2, c)).toSeq.sorted
    assert(want.nonEmpty, "fixture produced no qualifying pairs")
    assert(got == want)
    // no group may approach label size: 2*maxBlock + hash-imbalance slack
    val nc = (600 + maxBlock - 1) / maxBlock
    val chunkSizes = vecs.groupBy(v => math.floorMod(
      Similarity.mix64(v._2), nc.toLong).toInt).view.mapValues(_.size)
    assert(chunkSizes.values.max <= 2 * maxBlock,
      s"hash imbalance beyond slack: $chunkSizes")
  }

  test("knnGraph: chunk-pair decomposition is lossless — tiny blocks == one block == driver-local truth") {
    def asMap(edges: Array[Similarity.KnnEdge]) =
      edges.map(e => (e.vec_id, e.rank) -> (e.neighbor_id, e.cosine)).toMap
    val oneBlock = asMap(Similarity.knnGraph(spark, sf, k = 3, maxBlock = 1 << 20).collect())
    val manyBlocks = asMap(Similarity.knnGraph(spark, sf, k = 3, maxBlock = 7).collect())
    assert(manyBlocks == oneBlock)
    // driver-local truth for a few vectors
    all.take(3).foreach { q =>
      val want = all.filter(_.vec_id != q.vec_id)
        .map(v => (v.vec_id, Similarity.cosine(q.embedding, v.embedding)))
        .sortBy { case (id, c) => (-c, id) }.take(3)
      val got = (1 to 3).map(r => oneBlock((q.vec_id, r)))
      got.zip(want).foreach { case ((gid, gc), (wid, wc)) =>
        assert(gid == wid)
        assert(gc == BigDecimal(wc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    // the registered fixed-count diagnostic form: at spec sf the sample IS
    // the whole table, so sampling must be a no-op on values (the device
    // that pins the quadratic exchange at sampleN² rows forever)
    val sampled = asMap(Similarity.knnGraph(spark, sf, k = 3, sampleN = 2000).collect())
    val full = asMap(Similarity.knnGraph(spark, sf, k = 3).collect())
    assert(sampled == full, "sample != table at spec sf — sampleN device broke values")
  }

  test("delta-generation upsert (upsertIvfIndexTo): base untouched, " +
      "repeated registered invocations byte-stable") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val basePath = Files.createTempDirectory("gentospec").toString + "/base"
    val vecs = Similarity.vectors(spark, sf)
    val base  = vecs.filter(_.vec_id % 5 != 4)
    val delta = vecs.filter(_.vec_id % 5 == 4)
    val idx0 = Similarity.buildIvfIndexFrom(base, basePath, nlist = 16)
    def census(): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val root = Paths.get(basePath)
      Files.walk(root).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => root.relativize(p).toString ->
          ((Files.size(p), Files.getLastModifiedTime(p).toMillis)))
        .toMap
    }
    val before = census()
    val dPath = basePath.stripSuffix("base") + "delta1"
    val idx = Similarity.upsertIvfIndexTo(idx0, delta, dPath)
    // the LSM claim: the base generation's files are PHYSICALLY identical
    // (not just present) after the upsert — the delta lives in its own dir
    assert(census() == before, "delta-generation upsert touched base files")
    assert(idx.path == s"$basePath,$dPath")
    // nothing lost across the union of generations (read separately —
    // unrelated roots, the storedLists contract)
    assert(spark.read.parquet(basePath).count() + spark.read.parquet(dPath).count()
      == vecs.count())
    // writing onto an existing generation is refused
    intercept[IllegalArgumentException] {
      Similarity.upsertIvfIndexTo(idx, delta, basePath)
    }
    // radii only grow (ball-pruning soundness across generations)
    idx0.radius.foreach { case (l, r) => assert(idx.radius(l) >= r) }
    // the registered query folds a FRESH delta generation per invocation
    // onto one cached base: a second invocation must reproduce the first
    // byte-for-byte (no duplicate accumulation across generations)
    def run() = {
      val p = Files.createTempDirectory("gentoreg").toString + "/index"
      Similarity.ivfTopKUpsert(spark, sf, p, numQueries = 4, k = 5)
        .collect().map(h => (h.query_id, h.rank) -> (h.neighbor_id, h.cosine)).toMap
    }
    val first = run()
    assert(run() == first, "repeated sim_index_upsert invocations drifted")
    val brute = Similarity.bruteForceTopK(spark, sf, numQueries = 4, k = 5)
      .collect().map(h => (h.query_id, h.rank) -> (h.neighbor_id, h.cosine)).toMap
    assert(first == brute, "upserted multi-generation search must stay exact")
  }
}
