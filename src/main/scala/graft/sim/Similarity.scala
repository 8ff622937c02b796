package graft.sim

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Approximate-nearest-neighbor search over the `embeddings` fixture
  * (`Array[Float]`, 64-dim).
  *
  * Scale design: queries are a small, bounded set broadcast to executors; the
  * corpus is scanned once, each partition keeps a per-query top-k heap, and
  * only Q×k candidate rows cross the wire (a groupByKey on Q keys — tiny
  * exchange). The IVF variant prunes the scan to nprobe/nlist of the corpus
  * per query, the standard trade of recall for a ~nlist/nprobe speedup; at
  * 100 TB the corpus would additionally be *stored* partitioned by list id so
  * probing prunes parquet partitions, not just rows.
  */
object Similarity {

  final case class Vec(vec_id: Long, embedding: Array[Float])
  final case class Hit(query_id: Long, neighbor_id: Long, cosine: Double, rank: Int)

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val d = norm(a) * norm(b)
    if (d == 0.0) 0.0 else dot(a, b) / d
  }

  def vectors(spark: SparkSession, dir: String): Dataset[Vec] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")).as[Vec]
  }

  /** Exact brute-force top-k: baseline and recall oracle for the ANN path.
    * Deterministic tie-break on (cosine desc, neighbor_id asc). */
  def bruteForceTopK(spark: SparkSession, dir: String, numQueries: Int = 8,
                     k: Int = 10): Dataset[Hit] = {
    import spark.implicits._
    val vecs = vectors(spark, dir)
    val queries = vecs.filter(_.vec_id < numQueries).collect() // bounded: Q rows
    val bc = spark.sparkContext.broadcast(queries)
    val candidates = vecs.mapPartitions { it =>
      val qs = bc.value
      val heaps = qs.map(q => scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
        Ordering.by[(Double, Long), (Double, Long)] { case (c, id) => (-c, id) }))
      it.foreach { v =>
        var qi = 0
        while (qi < qs.length) {
          val q = qs(qi)
          if (v.vec_id != q.vec_id) {
            val c = cosine(q.embedding, v.embedding)
            val h = heaps(qi)
            if (h.size < k) h.enqueue((c, v.vec_id))
            else if (c > h.head._1 || (c == h.head._1 && v.vec_id < h.head._2)) {
              h.dequeue(); h.enqueue((c, v.vec_id))
            }
          }
          qi += 1
        }
      }
      qs.iterator.zip(heaps.iterator).flatMap { case (q, h) =>
        h.iterator.map { case (c, id) => (q.vec_id, id, c) }
      }
    }
    candidates.groupByKey(_._1).flatMapGroups { (qid, it) =>
      it.toArray.sortBy { case (_, id, c) => (-c, id) }.take(k)
        .iterator.zipWithIndex.map { case ((_, id, c), r) => Hit(qid, id, c, r + 1) }
    }
  }

  /** IVF (inverted-file) ANN: nlist deterministic centroids (lowest vec_ids —
    * a stand-in for a k-means codebook), corpus assigned to nearest centroid,
    * queries probe the nprobe nearest lists only. */
  def ivfTopK(spark: SparkSession, dir: String, numQueries: Int = 8, k: Int = 10,
              nlist: Int = 16, nprobe: Int = 4): Dataset[Hit] = {
    import spark.implicits._
    val vecs = vectors(spark, dir)
    val centroids = vecs.filter(_.vec_id < nlist).collect().sortBy(_.vec_id)
    val bcCent = spark.sparkContext.broadcast(centroids)
    val assigned = vecs.map { v =>
      val cs = bcCent.value
      var best = 0; var bestC = Double.NegativeInfinity
      var i = 0
      while (i < cs.length) {
        val c = cosine(v.embedding, cs(i).embedding)
        if (c > bestC) { bestC = c; best = i }
        i += 1
      }
      (best, v)
    }
    val queries = vecs.filter(_.vec_id < numQueries).collect()
    val bcQ = spark.sparkContext.broadcast(queries.map { q =>
      val cs = bcCent.value
      val probes = cs.indices.map(i => (cosine(q.embedding, cs(i).embedding), i))
        .sortBy { case (c, i) => (-c, i) }.take(nprobe).map(_._2).toSet
      (q, probes)
    })
    val candidates = assigned.mapPartitions { it =>
      val qs = bcQ.value
      val heaps = qs.map(_ => scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
        Ordering.by[(Double, Long), (Double, Long)] { case (c, id) => (-c, id) }))
      it.foreach { case (list, v) =>
        var qi = 0
        while (qi < qs.length) {
          val (q, probes) = qs(qi)
          if (probes.contains(list) && v.vec_id != q.vec_id) {
            val c = cosine(q.embedding, v.embedding)
            val h = heaps(qi)
            if (h.size < k) h.enqueue((c, v.vec_id))
            else if (c > h.head._1) { h.dequeue(); h.enqueue((c, v.vec_id)) }
          }
          qi += 1
        }
      }
      qs.iterator.zip(heaps.iterator).flatMap { case ((q, _), h) =>
        h.iterator.map { case (c, id) => (q.vec_id, id, c) }
      }
    }
    candidates.groupByKey(_._1).flatMapGroups { (qid, it) =>
      it.toArray.sortBy { case (_, id, c) => (-c, id) }.take(k)
        .iterator.zipWithIndex.map { case ((_, id, c), r) => Hit(qid, id, c, r + 1) }
    }
  }

  final case class EmbDup(d1: Long, d2: Long, cosine: Double)

  /** Embedding-cosine near-dup pairs, blocked by `label` (the coarse cluster
    * the fixture provides): all-pairs only within a block. */
  def embeddingNearDups(spark: SparkSession, dir: String,
                        threshold: Double = 0.95): Dataset[EmbDup] = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"), col("embedding"))
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val vs = it.map { case (_, id, e) => (id, e, norm(e)) }.toArray.sortBy(_._1)
        for {
          i <- vs.indices.iterator
          j <- (i + 1) until vs.length
          c = { val d = vs(i)._3 * vs(j)._3
                if (d == 0.0) 0.0 else dot(vs(i)._2, vs(j)._2) / d }
          if c >= threshold
        } yield EmbDup(vs(i)._1, vs(j)._1, c)
      }
  }
}
