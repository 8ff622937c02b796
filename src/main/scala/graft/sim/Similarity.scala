package graft.sim

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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

  /** NOTE (r14, measured): spreading this family's single-split scans via
    * `Tables.spreadSmall` was tried on every heap-scan/encode consumer and
    * REVERTED — an 18-query A/B (two sim-only bench runs per config,
    * per-query min) showed the family 1.25× SLOWER spread (10.4 s → 12.9 s
    * at sf0.1): these scans are fixed-cost-bound (50-250 ms stages whose
    * real CPU is single-digit ms at sub-MB corpus sizes), so the added
    * exchange + 32-task scheduling outweighs the parallelism everywhere
    * except the n²-dense [[knnGraph]] chunk kernel, which keeps its own
    * explicit repartition below. At real scale the scan yields ≥ cores
    * splits by itself, so nothing is lost. */

  /** The bounded broadcast query set, collected through a COLUMN predicate
    * so it pushes into the parquet scan — the former typed
    * `.filter(_.vec_id < q)` deserialized the whole corpus into Vec objects
    * per collect (once per registered query in this family). */
  private[sim] def queryArr(spark: SparkSession, dir: String, numQueries: Int): Array[Vec] = {
    import spark.implicits._
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < numQueries).as[Vec].collect()
  }

  /** Exact brute-force top-k: baseline and recall oracle for the ANN path.
    * Deterministic tie-break on (cosine desc, neighbor_id asc). */
  def bruteForceTopK(spark: SparkSession, dir: String, numQueries: Int = 8,
                     k: Int = 10): Dataset[Hit] = {
    import spark.implicits._
    val queries = queryArr(spark, dir, numQueries) // bounded: Q rows
    val bc = spark.sparkContext.broadcast(queries)
    val candidates = vectors(spark, dir).mapPartitions { it =>
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
        .iterator.zipWithIndex.map { case ((_, id, c), r) =>
          Hit(qid, id, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, r + 1) }
    }
  }

  /** HARD-NEGATIVE MINING for contrastive training (the retrieval-training
    * data op of DPR, Karpukhin et al. 2020 / SimCSE): per query, the top-k
    * most-similar vectors with a DIFFERENT label — maximally confusable
    * non-matches, which is exactly what a contrastive loss wants on its
    * negative side. The dual of `sim_topk_filtered` (same-label pre-filter
    * → different-label anti-filter); identical scale shape to
    * [[bruteForceTopK]]: Q broadcast queries, one corpus scan, per-partition
    * per-query bounded heaps, Q×k rows through the only exchange. The
    * label test rides the scan (a != on two broadcast-resident values), so
    * the negative constraint costs zero extra shuffle. */
  def hardNegatives(spark: SparkSession, dir: String, numQueries: Int = 8,
                    k: Int = 10): Dataset[Hit] = {
    import spark.implicits._
    val base = Tables.embeddings(spark, dir)
      .select(col("label"), col("vec_id"), col("embedding"))
    // column predicate (pushes to the scan) for the bounded query collect
    val queries = base.filter(col("vec_id") < numQueries)
      .as[(Int, Long, Array[Float])].collect() // bounded: Q rows
    val bc = spark.sparkContext.broadcast(queries)
    val candidates = base
      .as[(Int, Long, Array[Float])].mapPartitions { it =>
      val qs = bc.value
      val heaps = qs.map(_ => scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
        Ordering.by[(Double, Long), (Double, Long)] { case (c, id) => (-c, id) }))
      it.foreach { case (vLabel, vId, vEmb) =>
        var qi = 0
        while (qi < qs.length) {
          val (qLabel, _, qEmb) = qs(qi)
          if (vLabel != qLabel) {
            val c = cosine(qEmb, vEmb)
            val h = heaps(qi)
            if (h.size < k) h.enqueue((c, vId))
            else if (c > h.head._1 || (c == h.head._1 && vId < h.head._2)) {
              h.dequeue(); h.enqueue((c, vId))
            }
          }
          qi += 1
        }
      }
      qs.iterator.zip(heaps.iterator).flatMap { case ((_, qid, _), h) =>
        h.iterator.map { case (c, id) => (qid, id, c) }
      }
    }
    candidates.groupByKey(_._1).flatMapGroups { (qid, it) =>
      it.toArray.sortBy { case (_, id, c) => (-c, id) }.take(k)
        .iterator.zipWithIndex.map { case ((_, id, c), r) =>
          Hit(qid, id, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, r + 1) }
    }
  }

  /** Trained IVF codebook: a few distributed Lloyd iterations of spherical
    * k-means (assign by max cosine; new centroid = element-wise mean — the
    * cosine argmax is scale-invariant, so the mean needs no renormalizing).
    * Each iteration is one `treeAggregate` pass: every partition folds its
    * rows into nlist local (sum, count) accumulators and the accumulators
    * combine PAIRWISE up a tree, so the driver receives exactly ONE
    * nlist × dim accumulator — strictly tighter than shipping
    * O(partitions × nlist × dim) partials through a shuffle, at 10k
    * partitions the difference between kilobytes and gigabytes at the
    * driver. Locally it also removes one shuffle stage per iteration.
    * Addition order within a (partition, centroid) cell is the iterator
    * order and cross-partition combining is index-aligned, so the result is
    * deterministic for a fixed partitioning. Init is a deterministic seeded
    * sample (order by xxhash64 of vec_id), not the first nlist ids. Empty
    * clusters keep their previous centroid. */
  def trainCentroids(vecs: Dataset[Vec], nlist: Int, iters: Int = 4): Array[Array[Float]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    var centroids: Array[Array[Float]] = vecs.toDF()
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(nlist).as[Vec].collect().map(_.embedding)
    val dim = if (centroids.isEmpty) 0 else centroids(0).length
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(centroids)
      val zero = (Array.fill(nlist)(new Array[Double](dim)), new Array[Long](nlist))
      val (sums, counts) = vecs.rdd.treeAggregate(zero)(
        seqOp = { case ((sums, counts), v) =>
          val cs = bc.value
          var best = 0; var bestC = Double.NegativeInfinity
          var i = 0
          while (i < cs.length) {
            val c = cosine(v.embedding, cs(i))
            if (c > bestC) { bestC = c; best = i }
            i += 1
          }
          counts(best) += 1
          var d = 0
          while (d < dim) { sums(best)(d) += v.embedding(d).toDouble; d += 1 }
          (sums, counts)
        },
        combOp = { case ((s1, c1), (s2, c2)) =>
          var i = 0
          while (i < nlist) {
            var d = 0
            while (d < dim) { s1(i)(d) += s2(i)(d); d += 1 }
            c1(i) += c2(i)
            i += 1
          }
          (s1, c1)
        })
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        if (counts(i) > 0) sums(i).map(x => (x / counts(i)).toFloat) else old
      }
      bc.unpersist()
    }
    centroids
  }

  /** IVF (inverted-file) ANN with a trained k-means codebook: corpus assigned
    * to its nearest centroid, queries probe only the nprobe nearest lists —
    * the recall/speedup trade. At 100 TB the corpus would additionally be
    * *stored* partitioned by list id so probing prunes parquet partitions. */
  def ivfTopK(spark: SparkSession, dir: String, numQueries: Int = 8, k: Int = 10,
              nlist: Int = 16, nprobe: Int = 4,
              trained: Option[Array[Array[Float]]] = None): Dataset[Hit] = {
    import spark.implicits._
    val vecs = vectors(spark, dir)
    val centroids = trained.getOrElse(trainCentroids(vecs, nlist))
    val bcCent = spark.sparkContext.broadcast(centroids)
    val assigned = vecs.map { v =>
      val cs = bcCent.value
      var best = 0; var bestC = Double.NegativeInfinity
      var i = 0
      while (i < cs.length) {
        val c = cosine(v.embedding, cs(i))
        if (c > bestC) { bestC = c; best = i }
        i += 1
      }
      (best, v)
    }
    val queries = queryArr(spark, dir, numQueries)
    val bcQ = spark.sparkContext.broadcast(queries.map { q =>
      val cs = bcCent.value
      val probes = cs.indices.map(i => (cosine(q.embedding, cs(i)), i))
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
            else if (c > h.head._1 || (c == h.head._1 && v.vec_id < h.head._2)) {
              h.dequeue(); h.enqueue((c, v.vec_id))
            }
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

  /** IVF with provable ball-pruning — EXACT top-k (recall 1.0 by
    * construction), not best-effort probing:
    *
    *   1. Train the codebook; assign every vector to its max-cosine list;
    *      record each list's angular radius r = max angle(member, centroid).
    *   2. Probe the nprobe nearest lists to the query → k-th best cosine τ
    *      (a lower bound on the true k-th best).
    *   3. A skipped list can hold a vector at angle >= θ(q, centroid) − r,
    *      so its best possible cosine is cos(max(θ − r, 0)); scan only
    *      lists where that bound >= τ, merge with the probe candidates.
    *
    * Any vector in a pruned list provably scores below τ <= true k-th best,
    * so the result equals brute force exactly — which is the oracle. On an
    * isotropic corpus (this fixture) the bound prunes little and the win is
    * correctness at IVF cost; on clustered corpora (the realistic 100 TB
    * case) step 3 skips most lists, and storage partitioned by list id turns
    * the skip into parquet partition pruning. */
  def ivfTopKExact(spark: SparkSession, dir: String, numQueries: Int = 8, k: Int = 10,
                   nlist: Int = 16, nprobe: Int = 4): Dataset[Hit] = {
    import spark.implicits._
    val vecs = vectors(spark, dir)
    val centroids = trainCentroids(vecs, nlist)
    val bcCent = spark.sparkContext.broadcast(centroids)
    // a local `val` lambda, not a `def`: a local def lifts to a method on the
    // non-serializable Similarity$ object and the task closure would capture it
    val nearestList: (Array[Array[Float]], Array[Float]) => Int = (cs, e) => {
      var best = 0; var bestC = Double.NegativeInfinity
      var i = 0
      while (i < cs.length) {
        val c = cosine(e, cs(i)); if (c > bestC) { bestC = c; best = i }; i += 1
      }
      best
    }
    val assigned = vecs
      .map(v => (nearestList(bcCent.value, v.embedding), v))
      .persist() // consumed by the radius agg + up to two scan passes
    val radius = listRadii(assigned.rdd.map { case (l, v) => (l, v.embedding) },
      bcCent, nlist)
    val queries = queryArr(spark, dir, numQueries)
    val out = exactScanMerge(spark, _ => assigned, centroids, radius, queries, k, nprobe)
    assigned.unpersist()
    out
  }

  /** Per-list angular radius r(l) = max angle(member, centroid), as one
    * treeAggregate fold into an nlist-sized min-cosine accumulator — the
    * driver receives nlist doubles, not per-partition groups (same shape
    * argument as [[trainCentroids]]). Lists absent from the data are absent
    * from the map. */
  private def listRadii(assigned: org.apache.spark.rdd.RDD[(Int, Array[Float])],
                        bcCent: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]],
                        nlist: Int): Map[Int, Double] = {
    val mins = assigned.treeAggregate(Array.fill(nlist)(Double.NaN))(
      seqOp = { (acc, lv) =>
        val (l, e) = lv
        val c = cosine(e, bcCent.value(l))
        if (acc(l).isNaN || c < acc(l)) acc(l) = c
        acc
      },
      combOp = { (a, b) =>
        var i = 0
        while (i < nlist) {
          if (a(i).isNaN || (!b(i).isNaN && b(i) < a(i))) a(i) = b(i)
          i += 1
        }
        a
      })
    mins.zipWithIndex.collect { case (cmin, l) if !cmin.isNaN =>
      l -> math.acos(math.max(-1.0, math.min(1.0, cmin)))
    }.toMap
  }

  /** Shared two-phase exact IVF search over any (list, vector) source —
    * the in-memory path passes the persisted assignment; the stored-index
    * path passes a parquet read PRUNED to the requested lists. `scanSource`
    * may over-deliver rows (the scan re-checks per-query list membership);
    * each scan ships at most Q × k candidate rows per partition and the
    * merge stays distributed (groupByKey on Q keys). */
  private def exactScanMerge(spark: SparkSession,
                             scanSource: Set[Int] => Dataset[(Int, Vec)],
                             centroids: Array[Array[Float]],
                             radius: Map[Int, Double],
                             queries: Array[Vec], k: Int, nprobe: Int): Dataset[Hit] = {
    import spark.implicits._
    val bcCent = spark.sparkContext.broadcast(centroids)
    val probeSets: Array[(Vec, Set[Int])] = queries.map { q =>
      val cs = bcCent.value
      val probes = cs.indices.map(i => (cosine(q.embedding, cs(i)), i))
        .sortBy { case (c, i) => (-c, i) }.take(nprobe).map(_._2).toSet
      (q, probes)
    }
    def scan(listsPerQuery: Array[(Vec, Set[Int])]): Dataset[(Long, Long, Double)] = {
      val bcQ = spark.sparkContext.broadcast(listsPerQuery)
      scanSource(listsPerQuery.iterator.flatMap(_._2).toSet).mapPartitions { it =>
        val qs = bcQ.value
        val heaps = qs.map(_ => scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
          Ordering.by[(Double, Long), (Double, Long)] { case (c, id) => (-c, id) }))
        it.foreach { case (list, v) =>
          var qi = 0
          while (qi < qs.length) {
            val (q, lists) = qs(qi)
            if (lists.contains(list) && v.vec_id != q.vec_id) {
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
        qs.iterator.zip(heaps.iterator).flatMap { case ((q, _), h) =>
          h.iterator.map { case (c, id) => (q.vec_id, id, c) }
        }
      }
    }
    val phase1 = scan(probeSets).persist()
    // τ (k-th best cosine per query) via a distributed top-k merge; only the
    // Q-row (qid, τ) table reaches the driver
    val tau: Map[Long, Double] = phase1.groupByKey(_._1).mapGroups { (qid, it) =>
      val top = it.map(_._3).toArray.sorted(Ordering.Double.TotalOrdering.reverse)
      (qid, if (top.length >= k) top(k - 1) else Double.NegativeInfinity)
    }.collect().toMap
    val survivors: Array[(Vec, Set[Int])] = probeSets.map { case (q, probed) =>
      val cs = bcCent.value
      val t = tau.getOrElse(q.vec_id, Double.NegativeInfinity)
      val extra = cs.indices.filter { l =>
        !probed.contains(l) && radius.contains(l) && {
          val theta = math.acos(math.max(-1.0, math.min(1.0, cosine(q.embedding, cs(l)))))
          math.cos(math.max(theta - radius(l), 0.0)) >= t
        }
      }.toSet
      (q, extra)
    }
    val needPhase2 = survivors.filter(_._2.nonEmpty)
    // probe lists and survivor lists are disjoint per query, and within one
    // scan each vector lives in exactly one partition's heap, so no (q, id)
    // candidate repeats — the union is duplicate-free by construction
    val all = if (needPhase2.nonEmpty) phase1.union(scan(needPhase2)) else phase1
    val out = all.groupByKey(_._1).flatMapGroups { (qid, it) =>
      it.toArray.sortBy { case (_, id, c) => (-c, id) }.take(k)
        .iterator.zipWithIndex.map { case ((_, id, c), r) =>
          Hit(qid, id, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, r + 1) }
    }.persist()
    out.count() // materialize (Q × k rows) so the intermediates can be freed
    phase1.unpersist()
    out
  }

  // ------------------------------------------------ stored IVF index

  final case class IvfIndex(path: String, centroids: Array[Array[Float]],
                            radius: Map[Int, Double])

  /** Build the AT-REST form of the IVF index: the corpus written as a
    * parquet table `PARTITIONED BY (list_id)` — one directory per inverted
    * list — plus the codebook and per-list angular radii as driver-side
    * metadata (at 100 TB these tiny tables live next to the index). Probing
    * then prunes PARQUET PARTITIONS, not just rows: a query that probes
    * nprobe of nlist lists opens nprobe/nlist of the corpus bytes. This is
    * the storage layout the in-memory `ivfTopK*` docs promise. */
  def buildIvfIndex(spark: SparkSession, dir: String, path: String,
                    nlist: Int = 16): IvfIndex =
    buildIvfIndexFrom(vectors(spark, dir), path, nlist)

  /** [[buildIvfIndex]] over an explicit vector set — the base-corpus build
    * step of the incremental-maintenance path ([[ivfTopKUpsert]]), which
    * trains the codebook on the base only and folds later arrivals in via
    * [[upsertIvfIndex]]. */
  def buildIvfIndexFrom(vecs: Dataset[Vec], path: String,
                        nlist: Int = 16): IvfIndex = {
    val spark = vecs.sparkSession
    val centroids = trainCentroids(vecs, nlist)
    val bcCent = spark.sparkContext.broadcast(centroids)
    val assigned = assignLists(vecs, bcCent).persist()
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)
    val radius = assignedRadii(assigned, bcCent, centroids.length)
    assigned.unpersist()
    IvfIndex(path, centroids, radius)
  }

  /** Map-only nearest-centroid assignment, shared by build and upsert. */
  private def assignLists(vecs: Dataset[Vec],
                          bcCent: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]])
  : DataFrame = {
    import vecs.sparkSession.implicits._
    val nearestList: (Array[Array[Float]], Array[Float]) => Int = (cs, e) => {
      var best = 0; var bestC = Double.NegativeInfinity
      var i = 0
      while (i < cs.length) {
        val c = cosine(e, cs(i)); if (c > bestC) { bestC = c; best = i }; i += 1
      }
      best
    }
    vecs.map(v => (nearestList(bcCent.value, v.embedding), v.vec_id, v.embedding))
      .toDF("list_id", "vec_id", "embedding")
  }

  private def assignedRadii(assigned: DataFrame,
                            bcCent: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]],
                            nlist: Int): Map[Int, Double] = {
    import assigned.sparkSession.implicits._
    listRadii(
      assigned.select(col("list_id"), col("embedding")).as[(Int, Array[Float])]
        .rdd.map { case (l, e) => (l, e) },
      bcCent, nlist)
  }

  /** Incremental IVF maintenance — the INGEST path at 100 TB, where
    * retraining and rewriting the index on every arriving batch is not an
    * option. Each delta vector is assigned to its nearest EXISTING centroid
    * (map-only, no Lloyd iterations) and appended to that list's parquet
    * partition directory — base files are never rewritten (append-only
    * economics, spec-pinned by a file-census check). The per-list angular
    * radii are max-merged with the delta's: the radius can only grow, which
    * keeps the ball-pruning bound SOUND — an understated radius could prune
    * a list holding a true neighbor, an overstated one only costs an extra
    * list scan. Search over the upserted index therefore stays EXACT
    * (equals brute force over base ∪ delta) even though the codebook never
    * saw the delta: codebook drift degrades list balance — cost — never
    * correctness. Rebalancing is then a background compaction decision
    * driven by observable list sizes, not a correctness deadline. */
  def upsertIvfIndex(idx: IvfIndex, delta: Dataset[Vec]): IvfIndex = {
    val spark = delta.sparkSession
    val bcCent = spark.sparkContext.broadcast(idx.centroids)
    val assigned = assignLists(delta, bcCent).persist()
    assigned.write.mode("append").partitionBy("list_id").parquet(idx.path)
    val deltaRadius = assignedRadii(assigned, bcCent, idx.centroids.length)
    assigned.unpersist()
    val merged = (idx.radius.keySet ++ deltaRadius.keySet).iterator.map { l =>
      l -> math.max(idx.radius.getOrElse(l, -1.0), deltaRadius.getOrElse(l, -1.0))
    }.toMap
    IvfIndex(idx.path, idx.centroids, merged)
  }

  /** [[upsertIvfIndex]] writing the delta as its OWN generation directory
    * instead of appending into the base's partition dirs — the LSM-ish
    * at-rest shape (immutable base segment + delta segments, a reader
    * unions the generations; compaction later folds them). Semantically
    * identical to the in-place append — same assignment, same radius
    * max-merge, same exact search — but the base generation's files are
    * physically untouched, which is what lets one cached base build serve
    * many upsert batches (each registered `sim_index_upsert` invocation
    * appends ITS OWN delta generation and searches base ∪ delta). */
  def upsertIvfIndexTo(idx: IvfIndex, delta: Dataset[Vec], deltaPath: String): IvfIndex = {
    val spark = delta.sparkSession
    require(!idx.path.split(',').contains(deltaPath),
      "delta generation must be a NEW directory, never an existing generation")
    val bcCent = spark.sparkContext.broadcast(idx.centroids)
    val assigned = assignLists(delta, bcCent).persist()
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(deltaPath)
    val deltaRadius = assignedRadii(assigned, bcCent, idx.centroids.length)
    assigned.unpersist()
    val merged = (idx.radius.keySet ++ deltaRadius.keySet).iterator.map { l =>
      l -> math.max(idx.radius.getOrElse(l, -1.0), deltaRadius.getOrElse(l, -1.0))
    }.toMap
    IvfIndex(s"${idx.path},$deltaPath", idx.centroids, merged)
  }

  /** Background COMPACTION — the third phase of the index lifecycle
    * (build → upsert... → compact): after enough upserts drift the list
    * balance (the codebook never saw the deltas, so hot lists grow and
    * radii only widen), retrain on the CURRENT contents and rewrite into a
    * fresh generation at `newPath`. Never in place: readers keep probing
    * the old generation until the owner swaps the pointer, so compaction
    * is a background job with zero read downtime — the decision to run it
    * is driven by observable list sizes/radii, never by correctness (both
    * generations answer exactly; the spec pins search-before == search-
    * after == brute force). */
  def compactIvfIndex(spark: SparkSession, idx: IvfIndex, newPath: String,
                      nlist: Int = 16): IvfIndex = {
    import spark.implicits._
    require(!idx.path.split(',').contains(newPath),
      "compaction writes a new generation, never in place")
    val current = spark.read.parquet(idx.path.split(',').toIndexedSeq: _*)
      .select(col("vec_id"), col("embedding")).as[Vec]
    buildIvfIndexFrom(current, newPath, nlist)
  }

  /** Reader for one probe pass over the stored index: only the requested
    * lists' partition directories are opened (partition pruning on
    * `list_id` — spec-asserted via the scan's PartitionFilters). */
  /** The stored-index generation layout is CONSTANT by construction
    * ([[assignLists]] → partitionBy(list_id)): declaring it skips the
    * parquet footer-inference job every probe pass paid per generation
    * (guide §6 — two generations × up to two scan passes per upsert
    * search). */
  private val StoredGenSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("vec_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("embedding",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
    org.apache.spark.sql.types.StructField("list_id",
      org.apache.spark.sql.types.IntegerType)))

  def storedLists(spark: SparkSession, indexPath: String, lists: Set[Int]): DataFrame =
    // comma-separated = multi-generation index (base + delta segments, the
    // upsertIvfIndexTo layout). Each generation is its own partitioned
    // table rooted elsewhere, so they are read separately and unioned
    // (multi-path parquet reads insist on a shared base path); the list_id
    // filter pushes through the union, so partition pruning still applies
    // per generation
    indexPath.split(',').iterator
      .map(p => spark.read.schema(StoredGenSchema).parquet(p)).reduce(_ unionByName _)
      .filter(col("list_id").isin(lists.toSeq.map(Int.box): _*))
      .select(col("list_id"), col("vec_id"), col("embedding"))

  /** EXACT ball-pruned search over an existing stored-index generation —
    * the one read path shared by freshly built, upserted and compacted
    * generations (they differ only in how the files and radii came to be;
    * the soundness argument is identical). */
  def searchStoredIndex(spark: SparkSession, idx: IvfIndex, queries: Array[Vec],
                        k: Int = 10, nprobe: Int = 4): Dataset[Hit] = {
    import spark.implicits._
    exactScanMerge(spark,
      lists => storedLists(spark, idx.path, lists)
        .as[(Int, Long, Array[Float])]
        .map { case (l, id, e) => (l, Vec(id, e)) },
      idx.centroids, idx.radius, queries, k, nprobe)
  }

  /** EXACT top-k over the stored index — same ball-pruned two-phase search
    * and the same brute-force oracle as [[ivfTopKExact]], but every scan
    * reads only the probed/surviving lists' parquet partitions. */
  def ivfTopKStored(spark: SparkSession, dir: String, indexPath: String,
                    numQueries: Int = 8, k: Int = 10,
                    nlist: Int = 16, nprobe: Int = 4): Dataset[Hit] = {
    import spark.implicits._
    // one index generation per fixture state: the build (k-means train +
    // partitioned write) is the ingest; the registered query is the
    // partition-pruned SEARCH through it (ArtifactCache contract). The
    // IvfIndex metadata (codebook + radii) memoizes alongside the files.
    val idx = graft.sources.ArtifactCache.memo(
      s"ivfstored:$indexPath:$nlist:${graft.sources.ArtifactCache.fixtureKey(dir)}")(
      buildIvfIndex(spark, dir, indexPath, nlist))
    val queries = queryArr(spark, dir, numQueries)
    searchStoredIndex(spark, idx, queries, k, nprobe)
  }

  /** EXACT top-k over an INCREMENTALLY MAINTAINED stored index: the
    * codebook is trained on the base corpus only (deterministic 80% split
    * `vec_id % 5 != 4`), the remaining 20% arrives later and is folded in
    * by [[upsertIvfIndex]] — assign-and-append, no retrain, no base-file
    * rewrite. The ball-pruned search then runs over the merged index and
    * must equal brute force over the FULL corpus (same all-pairs oracle as
    * `sim_topk_brute`): the operator's claim is precisely that index
    * maintenance never costs correctness. */
  def ivfTopKUpsert(spark: SparkSession, dir: String, indexPath: String,
                    numQueries: Int = 8, k: Int = 10,
                    nlist: Int = 16, nprobe: Int = 4): Dataset[Hit] = {
    import spark.implicits._
    val vecs = vectors(spark, dir)
    // column predicates (codegen + scan-evaluable), not typed lambdas that
    // force a whole-corpus deserialize before the split
    val base  = vecs.filter(col("vec_id") % 5 =!= 4)
    val delta = vecs.filter(col("vec_id") % 5 === 4)
    // the BASE build (codebook train + partitioned write) is ingest — one
    // generation per fixture state (ArtifactCache contract); the UPSERT
    // (delta assign + append + merged-radius search) IS the operation and
    // stays inside the query: each invocation folds its own fresh delta
    // generation onto the immutable cached base (upsertIvfIndexTo)
    val baseIdx = graft.sources.ArtifactCache.memo(
      s"ivfupsbase:$nlist:${graft.sources.ArtifactCache.fixtureKey(dir)}") {
      val basePath = graft.sources.ArtifactCache.sessionPath(spark, "ivfupsbase") + "/index"
      buildIvfIndexFrom(base, basePath, nlist)
    }
    val deltaPath = s"$indexPath/delta_${upsertGen.incrementAndGet()}"
    val idx = upsertIvfIndexTo(baseIdx, delta, deltaPath)
    val queries = queryArr(spark, dir, numQueries)
    searchStoredIndex(spark, idx, queries, k, nprobe)
  }

  /** Monotone suffix for per-invocation delta generation dirs — each
    * [[ivfTopKUpsert]] call appends a NEW segment next to the cached base. */
  private val upsertGen = new java.util.concurrent.atomic.AtomicInteger

  // ---------------------------------------------- metadata-filtered top-k

  final case class LVec(vec_id: Long, embedding: Array[Float], label: Int)

  /** Metadata-FILTERED exact top-k: each query retrieves its k nearest
    * neighbors among corpus vectors sharing the query's `label` — the
    * standard filtered vector search (a WHERE clause on index metadata).
    * PRE-filtering, not post-: the predicate restricts the corpus before
    * scoring, so the result is exact within the filtered set by
    * construction — post-filtering a plain top-k would under-deliver
    * whenever fewer than k of the global neighbors carry the label.
    *
    * Scale shape: the query labels are known driver-side, so the scan
    * carries `label IN (...)` — a pushable parquet predicate (row-group
    * stats and dictionary pruning at rest; a corpus stored partitioned or
    * bucketed by label turns it into partition pruning, the same economics
    * as IVF probes). The scan itself is the [[bruteForceTopK]] pattern:
    * per-partition Q bounded heaps, only Q×k candidate rows cross the
    * wire. */
  def filteredTopK(spark: SparkSession, dir: String, numQueries: Int = 8,
                   k: Int = 10): Dataset[Hit] = {
    import spark.implicits._
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), col("label"))
    // column predicate for the bounded query collect (pushes to the scan)
    val queries = base.filter(col("vec_id") < numQueries).as[LVec].collect()
    val labels = queries.map(_.label).distinct.sorted
    val bc = spark.sparkContext.broadcast(queries)
    // the label IN (...) pre-filter pushes into the parquet scan
    val candidates = base
      .filter(col("label").isin(labels.map(Int.box).toSeq: _*)).as[LVec]
      .mapPartitions { it =>
        val qs = bc.value
        val heaps = qs.map(_ => scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
          Ordering.by[(Double, Long), (Double, Long)] { case (c, id) => (-c, id) }))
        it.foreach { v =>
          var qi = 0
          while (qi < qs.length) {
            val q = qs(qi)
            if (v.label == q.label && v.vec_id != q.vec_id) {
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
        .iterator.zipWithIndex.map { case ((_, id, c), r) =>
          Hit(qid, id, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, r + 1) }
    }
  }

  /** Recall@k of the *approximate* IVF path against the exact brute-force
    * top-k, swept over nprobe: the hard signal that the trained codebook +
    * probe pruning actually retrieves the true neighbors, and that recall
    * is monotone in probe width. The nprobe = nlist endpoint probes every
    * list, so the candidate set equals brute force's and recall is exactly
    * 1.0 *by construction* — robust to any float-order jitter in k-means
    * training. Intermediate thresholds are fixture floors with margin
    * (measured minima at sf0.01: 2/10 at nprobe=4, 4/10 at nprobe=8 on this
    * near-orthogonal corpus — IVF's worst case; clustered corpora recall far
    * higher). `recall_ok` is the oracle surface (brute force is itself
    * oracle-checked against DuckDB, so the chain grounds out in an
    * independent engine). */
  def ivfRecallSweep(spark: SparkSession, dir: String, numQueries: Int = 8,
                     k: Int = 10, nlist: Int = 16): DataFrame = {
    val vecs = vectors(spark, dir)
    val centroids = trainCentroids(vecs, nlist)
    val brute = bruteForceTopK(spark, dir, numQueries, k).toDF()
      .select(col("query_id"), col("neighbor_id"))
    // (nprobe, min matched-out-of-k for recall_ok); drop intermediate probe
    // widths that collide with nlist so no sweep row duplicates
    val sweep = Seq(4 -> 1, 8 -> 3).filter(_._1 < nlist) :+ (nlist -> k)
    val ivfAll = sweep.map { case (np, _) =>
      ivfTopK(spark, dir, numQueries, k, nlist, np, trained = Some(centroids)).toDF()
        .select(lit(np).as("nprobe"), col("query_id"), col("neighbor_id"))
    }.reduce(_ unionAll _)
    val matched = ivfAll.join(brute, Seq("query_id", "neighbor_id"))
      .groupBy(col("nprobe"), col("query_id")).agg(count(lit(1)).as("n_matched"))
    val thr = sweep.tail.foldLeft(when(col("nprobe") === sweep.head._1, lit(sweep.head._2))) {
      case (acc, (np, t)) => acc.when(col("nprobe") === np, lit(t))
    }
    ivfAll.groupBy(col("nprobe"), col("query_id")).agg(count(lit(1)).as("n_hits"))
      .join(matched, Seq("nprobe", "query_id"), "left")
      .select(col("nprobe"), col("query_id"), col("n_hits"),
        (coalesce(col("n_matched"), lit(0L)) >= thr).as("recall_ok"))
  }

  /** Scalar int8 quantization report over the embedding corpus: per vector
    * the SQ8 scale and reconstruction error (see
    * [[graft.functions.Quantize]]), plus the corpus decision row a storage
    * engine acts on. Map-only — the whole point of SQ8 at 100 TB is that a
    * linear scan re-encodes the index at 4× smaller with bounded error. */
  def quantizeSq8(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    Tables.embeddings(spark, dir).select(
      col("vec_id"),
      graft.functions.Quantize.sq8StatsCol(col("embedding")).as("s"))
      .select(col("vec_id"), col("s")(0).as("scale"),
        col("s")(1).as("mse"), col("s")(2).as("max_err"))
  }

  // --------------------------------------------- SQ8-searched exact top-k

  final case class SqVec(vec_id: Long, scale: Double, q: Array[Byte])

  /** The compressed at-rest index [[sq8TopK]] searches: int8 codes + scale,
    * 4× smaller than the float32 corpus (same arithmetic as
    * [[graft.functions.Quantize.sq8Stats]]).
    *
    * The scale is PER VECTOR (max |coord| / 127), so the encode is a
    * stateless per-row map with no trained artifact — it applies unchanged
    * to a `readStream` source as the ingest-time encode-on-arrival twin
    * (new vectors join the compressed index without a batch re-encode;
    * streaming == batch parity is spec-pinned in SimilaritySpec). */
  def sq8Index(vecs: Dataset[Vec]): Dataset[SqVec] = {
    import vecs.sparkSession.implicits._
    vecs.map { v =>
      val x = v.embedding
      var maxAbs = 0.0
      var i = 0
      while (i < x.length) { val a = math.abs(x(i).toDouble); if (a > maxAbs) maxAbs = a; i += 1 }
      val scale = maxAbs / 127.0
      val q = new Array[Byte](x.length)
      if (scale != 0.0) {
        i = 0
        while (i < x.length) { q(i) = math.floor(x(i) / scale + 0.5).toByte; i += 1 }
      }
      SqVec(v.vec_id, scale, q)
    }
  }

  /** EXACT top-k searched through the QUANTIZED index — recall 1.0 by
    * construction, like [[ivfTopKExact]] but with an error-ball instead of
    * a centroid-ball:
    *
    *   1. Scan the int8 index, scoring every vector by the cosine of its
    *      DEQUANTIZED form, with the provable per-vector bound
    *      |approx − exact| <= sqrt(d)·scale / |b~|  (each coordinate's
    *      dequantization error is <= scale/2, so ||e|| <= sqrt(d)·scale/2,
    *      and normalizing perturbs a unit dot by <= 2||e||/|b~|).
    *   2. Exact-rerank the approx top-k (a Q×k join against the float
    *      corpus) → τ = each query's k-th best EXACT cosine.
    *   3. Rescan the index: any vector with approx + bound >= τ could
    *      still belong in the top-k — exact-score exactly those (another
    *      bounded join); everything excluded provably scores < τ.
    *
    * The float corpus is touched only for the (small) rerank joins; both
    * full scans read the 4× smaller index — the actual economics of SQ8 at
    * 100 TB. Output equals [[bruteForceTopK]] row-for-row (ties at τ are
    * INCLUDED by the >= filter, so the final (-cos, id) sort reproduces
    * brute force's tie-break exactly); the oracle is the same brute-force
    * SQL. A 1e-6 slack on the bound absorbs the float rounding of the
    * dequantized coordinates (half-ulp each, ~6e-8 normalized worst case)
    * and the double arithmetic of the scoring — three orders of magnitude
    * of margin, still ~10⁴× below the bound itself. */
  def sq8TopK(spark: SparkSession, dir: String, numQueries: Int = 8,
              k: Int = 10): Dataset[Hit] = {
    import spark.implicits._
    val vecs = vectors(spark, dir)
    val queries = queryArr(spark, dir, numQueries)
    val bcQ = spark.sparkContext.broadcast(queries)
    val idx = sq8Index(vecs).persist()

    // one dequantize + per-query scoring pass; emits per-partition heaps so
    // only Q×k rows leave each partition
    val approxTopK: Dataset[(Long, Long, Double)] =
      idx.mapPartitions { it =>
        val qs = bcQ.value
        val heaps = qs.map(_ => scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
          Ordering.by[(Double, Long), (Double, Long)] { case (c, id) => (-c, id) }))
        it.foreach { sv =>
          val d = sv.q.length
          val deq = new Array[Float](d)
          var i = 0
          while (i < d) { deq(i) = (sv.q(i) * sv.scale).toFloat; i += 1 }
          var qi = 0
          while (qi < qs.length) {
            val q = qs(qi)
            if (sv.vec_id != q.vec_id) {
              val c = cosine(q.embedding, deq)
              val h = heaps(qi)
              if (h.size < k) h.enqueue((c, sv.vec_id))
              else if (c > h.head._1 || (c == h.head._1 && sv.vec_id < h.head._2)) {
                h.dequeue(); h.enqueue((c, sv.vec_id))
              }
            }
            qi += 1
          }
        }
        qs.iterator.zip(heaps.iterator).flatMap { case (q, h) =>
          h.iterator.map { case (c, id) => (q.vec_id, id, c) }
        }
      }

    // exact cosines for a bounded (qid, vec_id) candidate set, via a join
    // against the float corpus — the only touches of the uncompressed data
    def exactScores(cands: Dataset[(Long, Long)]): Dataset[(Long, Long, Double)] =
      cands.toDF("qid", "vec_id")
        .join(vecs.toDF().select(col("vec_id"), col("embedding")), "vec_id")
        .as[(Long, Long, Array[Float])]
        .mapPartitions { it =>
          // index the broadcast ONCE per partition: O(1) per candidate row
          // instead of an O(Q) linear scan per row
          val byId = bcQ.value.iterator.map(q => q.vec_id -> q).toMap
          it.map { case (vid, qid, emb) =>
            val q = byId.getOrElse(qid,
              throw new NoSuchElementException(s"query vec_id=$qid missing from broadcast query set"))
            (qid, vid, cosine(q.embedding, emb))
          }
        }

    // phase 1: approx top-k, exact-reranked → τ per query
    val phase1 = approxTopK
      .groupByKey(_._1).flatMapGroups { (qid, it) =>
        it.toArray.sortBy { case (_, id, c) => (-c, id) }.take(k)
          .iterator.map { case (_, id, _) => (qid, id) }
      }.persist()
    val p1Exact = exactScores(phase1).persist()
    val tau: Map[Long, Double] = p1Exact.groupByKey(_._1).mapGroups { (qid, it) =>
      val top = it.map(_._3).toArray.sorted(Ordering.Double.TotalOrdering.reverse)
      (qid, if (top.length >= k) top(k - 1) else Double.NegativeInfinity)
    }.collect().toMap
    val bcTau = spark.sparkContext.broadcast(tau)
    val p1Ids: Map[Long, Set[Long]] = phase1.collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    val bcP1 = spark.sparkContext.broadcast(p1Ids)

    // phase 2: every vector whose error ball reaches τ and wasn't reranked
    val survivors = idx.flatMap { sv =>
      val qs = bcQ.value
      val d = sv.q.length
      val deq = new Array[Float](d)
      var i = 0
      while (i < d) { deq(i) = (sv.q(i) * sv.scale).toFloat; i += 1 }
      val nrm = norm(deq)
      val bound = if (sv.scale == 0.0 || nrm == 0.0) 0.0
        else math.sqrt(d.toDouble) * sv.scale / nrm + 1e-6
      qs.iterator.filter { q =>
        sv.vec_id != q.vec_id &&
          !bcP1.value.getOrElse(q.vec_id, Set.empty).contains(sv.vec_id) &&
          cosine(q.embedding, deq) + bound >= bcTau.value.getOrElse(q.vec_id, Double.NegativeInfinity)
      }.map(q => (q.vec_id, sv.vec_id))
    }
    val all = p1Exact.union(exactScores(survivors))
    val out = all.groupByKey(_._1).flatMapGroups { (qid, it) =>
      it.toArray.sortBy { case (_, id, c) => (-c, id) }.take(k)
        .iterator.zipWithIndex.map { case ((_, id, c), r) =>
          Hit(qid, id, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, r + 1) }
    }.persist()
    out.count() // materialize before releasing the intermediates
    phase1.unpersist(); p1Exact.unpersist(); idx.unpersist()
    out
  }

  final case class EmbDup(d1: Long, d2: Long, cosine: Double)

  /** Cosine rounded to 6 decimals (HALF_UP): the oracle-boundary form — a
    * DuckDB twin computing the same dot/sqrt(aa*bb) shape agrees to far more
    * than 6 places, so rounding makes the compare engine-independent. */
  def cosine6(a: Array[Float], b: Array[Float]): Double = {
    val d = dot(a, a) * dot(b, b)
    val c = if (d == 0.0) 0.0 else dot(a, b) / math.sqrt(d)
    BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** SplitMix64 finalizer — deterministic id → chunk hashing. */
  private[graft] def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Chunk-pair (block-nested-loop) decomposition of per-label all-pairs —
    * the testable core of [[embeddingNearDups]].
    *
    * The oracle semantics are EXACT all-pairs within each label at a low
    * threshold (0.35 on a near-orthogonal corpus) — below the regime where
    * LSH/random-projection banding has usable recall (P[same hyperplane
    * side] ≈ 0.62 at that angle, so any banding scheme either misses pairs
    * or degenerates to full buckets). Exactness costs Θ(n²) work per label
    * NO MATTER the plan; what must never happen at 100 TB is that work
    * landing in ONE task. So: each label's vectors are hashed into
    * `ceil(n/maxBlock)` chunks, every vector is replicated once per partner
    * chunk, and each (label, chunkA, chunkB) pair becomes its own shuffle
    * group of <= 2*maxBlock vectors. A hot label becomes (nc choose 2)
    * bounded tasks that the cluster absorbs in parallel — replication factor
    * nc is the standard block-nested-loop trade (shuffle volume n*nc for
    * task-size independence from label size). Each qualifying pair is
    * emitted by exactly one group (chunk ids partition the id space). */
  def chunkedNearDups(vecs: Dataset[(Int, Long, Array[Float])],
                      threshold: Double, maxBlock: Int = 256): Dataset[EmbDup] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // labels are coarse clusters: the (label, count) table is tiny and
    // drives only the chunk fan-out factor
    val nChunks: Map[Int, Int] = vecs.groupByKey(_._1).count().collect()
      .map { case (l, n) => l -> math.max(1, ((n + maxBlock - 1) / maxBlock).toInt) }.toMap
    val bcNc = spark.sparkContext.broadcast(nChunks)
    vecs.flatMap { case (l, id, e) =>
      val nc = bcNc.value(l)
      val c = (math.floorMod(mix64(id), nc.toLong)).toInt
      (0 until nc).iterator.map { other =>
        val (a, b) = if (other < c) (other, c) else (c, other)
        (l, a, b, c, id, e)
      }
    }.groupByKey(t => (t._1, t._2, t._3))
      .flatMapGroups { (key: (Int, Int, Int), it: Iterator[(Int, Int, Int, Int, Long, Array[Float])]) =>
        val (_, a, b) = key
        val members = it.map(t => (t._4, t._5, t._6)).toArray
        if (a == b) {
          val vs = members.map(m => (m._2, m._3)).sortBy(_._1)
          for {
            i <- vs.indices.iterator
            j <- (i + 1) until vs.length
            c = cosine6(vs(i)._2, vs(j)._2)
            if c >= threshold
          } yield EmbDup(vs(i)._1, vs(j)._1, c)
        } else {
          val left = members.filter(_._1 == a).map(m => (m._2, m._3))
          val right = members.filter(_._1 == b).map(m => (m._2, m._3))
          for {
            (i1, e1) <- left.iterator
            (i2, e2) <- right
            c = cosine6(e1, e2)
            if c >= threshold
          } yield EmbDup(math.min(i1, i2), math.max(i1, i2), c)
        }
      }
  }

  /** Embedding-cosine near-dup pairs, blocked by `label` (the coarse cluster
    * the fixture provides) and decomposed into bounded chunk-pair tasks (see
    * [[chunkedNearDups]] for why this beats both one-task-per-label and
    * LSH at the exact-low-threshold semantics). Threshold applies to the
    * 6-decimal-rounded cosine (see [[cosine6]]). */
  def embeddingNearDups(spark: SparkSession, dir: String,
                        threshold: Double = 0.95,
                        maxBlock: Int = 256): Dataset[EmbDup] = {
    import spark.implicits._
    chunkedNearDups(
      Tables.embeddings(spark, dir)
        .select(col("label"), col("vec_id"), col("embedding"))
        .as[(Int, Long, Array[Float])],
      threshold, maxBlock)
  }

  final case class KnnEdge(vec_id: Long, neighbor_id: Long, cosine: Double, rank: Int)

  /** Exact kNN JOIN (kNN graph): EVERY corpus vector is a query — the
    * building block under SemDeDup clustering, kNN-descent, and
    * graph-based ANN index construction. Unlike [[bruteForceTopK]] the
    * query side is corpus-sized, so nothing can broadcast; unlike
    * [[chunkedNearDups]] the output is each vector's top-k, not a
    * thresholded pair set.
    *
    * Same block-nested-loop decomposition as [[chunkedNearDups]] (exact
    * all-pairs work is Θ(n²) whatever the plan; what must never happen is
    * that work landing in one task): vectors hash into `ceil(n/maxBlock)`
    * chunks, each (chunkA, chunkB) pair is one bounded shuffle group, and
    * each group emits ONLY a per-member local top-k against the partner
    * chunk — k·nc candidate rows per vector cross the second exchange,
    * where the final per-vector merge keeps the global top-k. At 100 TB
    * the same merge shape composes with IVF pruning (score only vectors
    * sharing nearby lists — [[ivfTopK]]'s ball bound) instead of all
    * chunk pairs; this operator is the exact-semantics baseline.
    *
    * Ranking happens on RAW doubles (identical left-to-right dot folds in
    * both engines); the cosine is rounded to 6 decimals only at the output
    * boundary — the [[bruteForceTopK]] oracle device.
    *
    * `sampleN > 0` runs the SAME operator over a fixed-count hash-order
    * sample (the [[pairCosineHist]] / dedup_lsh_sweep truth device): the
    * registered `sim_knn_graph` is the exact-semantics DIAGNOSTIC — its
    * all-pairs exchange is pinned at sampleN²/maxBlock rows forever, so
    * the registered surface carries zero super-linear plans. At sf ≤ 0.1
    * the sample IS the whole table (2000 vectors), so recorded values
    * don't move. The full-corpus form (sampleN = 0) stays the recall-sweep
    * endpoint and block-invariance truth ([[knnGraphPrunedSweep]] carries
    * the production-scale contract). */
  def knnGraph(spark: SparkSession, dir: String, k: Int = 3,
               maxBlock: Int = 256, sampleN: Int = 0): Dataset[KnnEdge] = {
    import spark.implicits._
    val all = vectors(spark, dir)
    val vecs = if (sampleN <= 0) all else
      all.orderBy(graft.functions.Fnv32.fnv32(
          concat(col("vec_id").cast("string"), lit(":kg"))), col("vec_id"))
        .limit(sampleN).as[Vec]
    val n = vecs.count()
    val nc = math.max(1, ((n + maxBlock - 1) / maxBlock).toInt)
    val exploded = vecs.flatMap { v =>
      val c = math.floorMod(mix64(v.vec_id), nc.toLong).toInt
      (0 until nc).iterator.map { other =>
        val (a, b) = if (other < c) (other, c) else (c, other)
        (a, b, c, v.vec_id, v.embedding)
      }
    }
    // local top-k of `self` against `others` — ties broken (cos desc, id asc)
    def localTopK(id: Long, e: Array[Float],
                  others: Iterator[(Long, Array[Float])]): Iterator[(Long, Long, Double)] = {
      val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
        Ordering.by[(Double, Long), (Double, Long)] { case (c, nid) => (-c, nid) })
      others.foreach { case (oid, oe) =>
        if (oid != id) {
          val c = cosine(e, oe)
          if (heap.size < k) heap.enqueue((c, oid))
          else if (c > heap.head._1 || (c == heap.head._1 && oid < heap.head._2)) {
            heap.dequeue(); heap.enqueue((c, oid))
          }
        }
      }
      heap.iterator.map { case (c, nid) => (id, nid, c) }
    }
    // The chunk-pair kernel is CPU-dense but byte-TINY, which defeats both
    // layers of default parallelism (r14 StageTimeProbe: the whole n²/nc
    // kernel ran as ONE 3 s task): the sampled form's global limit yields a
    // single partition, which SATISFIES groupByKey's clustering requirement
    // outright (zero exchanges planned), and even with an exchange AQE's
    // byte-driven coalescing folds a few-MB shuffle back to 1-4 tasks. So
    // the group stage is an EXPLICIT repartition on the chunk-pair key with
    // a pinned partition count (user-specified counts are exempt from AQE
    // coalescing) and the grouping runs partition-locally — same groups,
    // same kernel, and the kernel's bounded heaps are total-order
    // tie-broken, so the output set is identical from any partitioning.
    val nGroups = nc.toLong * (nc + 1) / 2
    val p = math.max(1L, math.min(nGroups,
      spark.sparkContext.defaultParallelism.toLong)).toInt
    val partials = exploded.toDF("a", "b", "c", "id", "emb")
      .repartition(p, col("a"), col("b"))
      .as[(Int, Int, Int, Long, Array[Float])]
      .mapPartitions { it =>
        val groups = new java.util.HashMap[Long,
          scala.collection.mutable.ArrayBuffer[(Int, Long, Array[Float])]]()
        it.foreach { case (a, b, c, id, e) =>
          groups.computeIfAbsent((a.toLong << 32) | (b.toLong & 0xffffffffL),
            _ => scala.collection.mutable.ArrayBuffer
              .empty[(Int, Long, Array[Float])]) += ((c, id, e))
        }
        groups.entrySet().iterator().asScala.flatMap { ent =>
          val a = (ent.getKey >> 32).toInt
          val b = ent.getKey.toInt
          val members = ent.getValue
          if (a == b) {
            members.iterator.flatMap { case (_, id, e) =>
              localTopK(id, e, members.iterator.map(m => (m._2, m._3)))
            }
          } else {
            val left = members.filter(_._1 == a).map(m => (m._2, m._3))
            val right = members.filter(_._1 == b).map(m => (m._2, m._3))
            left.iterator.flatMap { case (id, e) => localTopK(id, e, right.iterator) } ++
              right.iterator.flatMap { case (id, e) => localTopK(id, e, left.iterator) }
          }
        }
      }
    partials.groupByKey(_._1).flatMapGroups { (id: Long, it: Iterator[(Long, Long, Double)]) =>
      it.toArray.sortBy { case (_, nid, c) => (-c, nid) }.take(k).iterator.zipWithIndex
        .map { case ((_, nid, c), r) =>
          KnnEdge(id, nid,
            BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, r + 1) }
    }
  }

  // ---------------------------------------- pruned kNN graph (IVF composition)

  /** argmax-cosine list id; first index wins ties — identical to the rank-1
    * entry of [[rankedLists]], so a member's home list is always the first
    * list it would probe. */
  private def nearestList(cs: Array[Array[Float]], e: Array[Float]): Int = {
    var best = 0; var bestC = Double.NegativeInfinity
    var i = 0
    while (i < cs.length) {
      val c = cosine(e, cs(i))
      if (c > bestC) { bestC = c; best = i }
      i += 1
    }
    best
  }

  /** The `np` nearest list ids by (cosine desc, index asc). */
  private def rankedLists(cs: Array[Array[Float]], e: Array[Float], np: Int): Array[Int] =
    cs.indices.map(i => (cosine(e, cs(i)), i))
      .sortBy { case (c, i) => (-c, i) }.take(np).map(_._2).toArray

  /** Local top-k of `e` against `others` (self excluded), tie-broken
    * (cosine desc, id asc) — the [[knnGraph]] per-chunk kernel, shared by
    * the pruned variant. */
  private def localTopKAgainst(id: Long, e: Array[Float], k: Int,
      others: Iterator[(Long, Array[Float])]): Iterator[(Long, Long, Double)] = {
    val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
      Ordering.by[(Double, Long), (Double, Long)] { case (c, nid) => (-c, nid) })
    others.foreach { case (oid, oe) =>
      if (oid != id) {
        val c = cosine(e, oe)
        if (heap.size < k) heap.enqueue((c, oid))
        else if (c > heap.head._1 || (c == heap.head._1 && oid < heap.head._2)) {
          heap.dequeue(); heap.enqueue((c, oid))
        }
      }
    }
    heap.iterator.map { case (c, nid) => (id, nid, c) }
  }

  /** IVF-PRUNED kNN join: every query vector scores ONLY the members of its
    * `nprobe` nearest lists (frozen codebook), instead of every chunk pair.
    * This is the scale path [[knnGraph]]'s scaladoc promises: candidate
    * volume is n·nprobe·listsize (shuffle rows n·nprobe·⌈listsize/maxBlock⌉
    * + k per probe group), not n²/maxBlock — the ratio nprobe/nlist is the
    * pruning factor, and nlist grows with the corpus (targeting ~256-row
    * lists) so per-query work stays ~k·nprobe·256 at any scale.
    *
    * Decomposition: members key by (home list, member chunk) — chunk count
    * per list derived from measured list sizes so no task materializes more
    * than `maxBlock` member vectors; queries replicate to every chunk of
    * each probed list. The two sides meet in a `cogroup` so members buffer
    * (bounded) while queries STREAM through the kernel — a hot list costs
    * task time, never task memory. Per-query partials then merge to the
    * global top-k exactly as in [[knnGraph]]. A further refinement at
    * extreme query skew (many queries probing one list) would salt the
    * query side into sub-groups; the fixture's k-means lists are balanced
    * enough that the member-side chunking alone bounds every task. */
  private[graft] def prunedKnnEdges(queries: Dataset[Vec], members: Dataset[Vec],
      centroids: Array[Array[Float]], nprobe: Int, k: Int,
      maxBlock: Int = 256): Dataset[(Long, Long)] = {
    val spark = queries.sparkSession
    import spark.implicits._
    prunedKnnEdgesMulti(Seq(nprobe -> queries), members, centroids, k, maxBlock)
      .map { case (_, qid, nid) => (qid, nid) }
  }

  /** [[prunedKnnEdges]] for SEVERAL (nprobe, query set) rungs over ONE
    * member relation in ONE pass (§2.3 — the r13 sweep ran the member
    * assignment, the nlist-row listCounts collect AND the member-side
    * cogroup shuffle once PER RUNG; all three are rung-invariant). The
    * probe sides union with an `np` tag; the member chunking, the kernel
    * and the per-(np, query) top-k fold are byte-identical to running each
    * rung alone — every probe row still scores exactly its own chunk's
    * members with the same (cosine desc, id asc) bounded heap, and the
    * final merge keys on (np, qid) instead of qid. Returns (np, qid, nid). */
  private[graft] def prunedKnnEdgesMulti(rungQueries: Seq[(Int, Dataset[Vec])],
      members: Dataset[Vec], centroids: Array[Array[Float]], k: Int,
      maxBlock: Int = 256): Dataset[(Int, Long, Long)] = {
    val spark = members.sparkSession
    import spark.implicits._
    val bcC = spark.sparkContext.broadcast(centroids)
    val assigned = members.map(v => (nearestList(bcC.value, v.embedding), v.vec_id, v.embedding))
    // nlist rows — the only driver-side state, same shape as chunkedNearDups
    val listCounts: Map[Int, Long] = assigned.groupByKey(_._1).count().collect().toMap
    val nmc: Map[Int, Int] = centroids.indices.map(l => l ->
      math.max(1, ((listCounts.getOrElse(l, 0L) + maxBlock - 1) / maxBlock).toInt)).toMap
    val bcNmc = spark.sparkContext.broadcast(nmc)
    val memberRows = assigned.map { case (l, id, e) =>
      (l, math.floorMod(mix64(id), bcNmc.value(l).toLong).toInt, id, e)
    }
    val probeRows = rungQueries.map { case (np, queries) =>
      queries.flatMap { q =>
        val lists = rankedLists(bcC.value, q.embedding, np)
        lists.iterator.flatMap { l =>
          (0 until bcNmc.value(l)).iterator.map(c => (l, c, np, q.vec_id, q.embedding))
        }
      }
    }.reduce(_ unionAll _)
    val partials = memberRows.groupByKey(t => (t._1, t._2))
      .cogroup(probeRows.groupByKey(t => (t._1, t._2))) { (_, mIt, pIt) =>
        val mem = mIt.map(t => (t._3, t._4)).toArray
        pIt.flatMap { case (_, _, np, qid, qe) =>
          localTopKAgainst(qid, qe, k, mem.iterator)
            .map { case (_, nid, c) => (np, qid, nid, c) } }
      }
    partials.groupByKey(t => (t._1, t._2))
      .flatMapGroups { (key: (Int, Long), it: Iterator[(Int, Long, Long, Double)]) =>
        it.toArray.sortBy { case (_, _, nid, c) => (-c, nid) }.take(k).iterator
          .map { case (np, qid, nid, _) => (np, qid, nid) }
      }
  }

  /** Exact top-k for a BOUNDED broadcast query set against the full corpus
    * — one map-only scan with per-query heaps, then a Q-key merge (the
    * [[bruteForceTopK]] physics with an explicit query array). The truth
    * side of the pruned-graph sweep: linear in n at fixed |queries|. */
  private[graft] def exactTopKBroadcast(corpus: Dataset[Vec], queries: Array[Vec],
                                        k: Int): Dataset[(Long, Long)] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bcQ = spark.sparkContext.broadcast(queries)
    val partials = corpus.mapPartitions { it =>
      val qs = bcQ.value
      val heaps = qs.map(_ => scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
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
    partials.groupByKey(_._1).flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double)]) =>
      it.toArray.sortBy { case (_, id, c) => (-c, id) }.take(k).iterator
        .map { case (_, id, _) => (qid, id) }
    }
  }

  /** Recall floors for the pruned-graph sweep, per rung, as exact integer
    * fractions (num/den — engine-side only, so no float contract needed).
    * Measured sampled recalls (KnnProbe, BASELINE.md round-11 notes):
    * rung nlist/8 → 0.417 (sf0.01, n=500), 0.398 (sf0.1, n=2000), 0.966
    * (10×, n=20000, where the clustered TenX corpus lets IVF prune hard);
    * rung nlist/4 → 0.641 / 0.583 / 0.992. Floors 1/10 and 1/5 sit 4-6×
    * below the worst measured point. The endpoint floor is 1/1 — EXACT
    * equality with the brute-force truth, which holds by construction
    * (probing every list IS the all-pairs scan, and both sides rank by the
    * same (cosine desc, id asc) fold). */
  private val PrunedRecallFloors: Seq[(Long, Long)] = Seq((1L, 10L), (1L, 5L), (1L, 1L))

  /** The registered `sim_knn_graph_pruned` query: the pruned kNN join
    * swept over nprobe ∈ {nlist/8, nlist/4, nlist} with a recall-thresholded
    * contract (the sim_topk_pq shape):
    *
    *   - nlist scales with the corpus — max(16, ⌈n/256⌉) — so the rungs are
    *     RATIO-stable (probe 1/8, 1/4, all of the lists) and the candidate
    *     volume per query is ~nprobe·256 at every scale;
    *   - the codebook trains on a fixed-count hash-fate sample (the faiss
    *     stance: k-means on a subsample, assignment over everything), so
    *     training cost is bounded at any corpus size;
    *   - recall per rung is measured on a fixed-count sampled query set
    *     against [[exactTopKBroadcast]] truth (linear in n), and
    *     `recall_ok` asserts the measured value clears the rung's floor;
    *   - the nprobe = nlist endpoint runs the SAME pruned operator over the
    *     sampled queries and must equal the exact graph outright (floor
    *     1/1) — the by-construction exactness anchor;
    *   - `n_edges` asserts completeness: every query emits exactly k edges
    *     (full corpus on the sub-nlist rungs, the sample at the endpoint).
    *
    * The oracle pins the whole surface from COUNT(embeddings) alone —
    * engine-guaranteed booleans, SF-independent (the sim_ivf_recall
    * contract). */
  def knnGraphPrunedSweep(spark: SparkSession, dir: String, k: Int = 3,
                          maxBlock: Int = 256, sampleN: Int = 128,
                          trainN: Int = 2048): DataFrame = {
    import spark.implicits._
    val vecs = vectors(spark, dir)
    val n = vecs.count()
    val nlist = math.max(16, ((n + 255) / 256).toInt)
    // bounded collects: the k-means training sample and the truth query
    // sample are fixed-count by design (trainN rows ≈ 0.5 MB at 64 dims)
    val trainArr = vecs.orderBy(xxhash64(col("vec_id"), lit("knntrain")), col("vec_id"))
      .limit(math.min(trainN.toLong, n).toInt).as[Vec].collect()
    val centroids = trainCentroids(spark.createDataset(trainArr.toIndexedSeq), nlist)
    val sampleArr = vecs.orderBy(xxhash64(col("vec_id"), lit("knnsample")), col("vec_id"))
      .limit(sampleN).as[Vec].collect()
    val sampleDs = spark.createDataset(sampleArr.toIndexedSeq)
    val truth = exactTopKBroadcast(vecs, sampleArr, k).toDF("query_id", "neighbor_id")
    val nTruth = truth.count()
    val rungs = Seq(math.max(1, nlist / 8), math.max(2, nlist / 4), nlist)
    // ALL rungs in one pruned pass: member assignment, listCounts and the
    // member-side cogroup shuffle are rung-invariant (§2.3) — see
    // prunedKnnEdgesMulti. Rung nprobe values are distinct by construction
    // (nlist >= 16 ⇒ nlist/8 < nlist/4 < nlist), so (np, qid) keys never
    // collide across rungs.
    val edges = prunedKnnEdgesMulti(
        rungs.map(np => np -> (if (np == nlist) sampleDs else vecs)),
        vecs, centroids, k, maxBlock)
      .toDF("nprobe", "query_id", "neighbor_id")
    val totals = edges.groupBy(col("nprobe"))
      .agg(countDistinct(col("query_id")).as("n_queries"), count(lit(1)).as("n_edges"))
    val matched = edges.join(truth, Seq("query_id", "neighbor_id"))
      .groupBy(col("nprobe")).agg(count(lit(1)).as("n_matched"))
    val floors = rungs.zip(PrunedRecallFloors)
    def caseOf(pick: ((Long, Long)) => Long) =
      floors.tail.foldLeft(
        when(col("nprobe") === floors.head._1, lit(pick(floors.head._2)))) {
        case (acc, (np, f)) => acc.when(col("nprobe") === np, lit(pick(f))) }
    val caseOfNums = caseOf(_._1); val caseOfDens = caseOf(_._2)
    totals.join(matched, Seq("nprobe"), "left")
      .select(col("nprobe").cast("int").as("nprobe"), col("n_queries"), col("n_edges"),
        (coalesce(col("n_matched"), lit(0L)) * caseOfDens >=
          lit(nTruth) * caseOfNums).as("recall_ok"))
  }
  /** HYBRID RETRIEVAL with reciprocal-rank fusion (Cormack et al. 2009):
    * the lexical list (BM25 over a fixed term set) and the dense list
    * (exact cosine top-N for one query vector) fused by
    * score = Σ 1/(60 + rank) — the standard zero-tuning fusion that needs
    * only RANKS, never the incomparable raw scores.
    *
    * The fixture's item space is shared by construction: doc_id and
    * vec_id coincide (500/500 at sf0.01), so the full-outer rank join IS
    * the item join. Scale shape: each side is one corpus scan with a
    * bounded top-N heap ([[graft.text.TextAnalysis.bm25]]'s
    * TakeOrderedAndProject / [[bruteForceTopK]]'s per-partition heaps);
    * fusion then joins two N-row frames — driver-trivial at any corpus
    * size because N is fixed. The rank window on the lexical side runs on
    * the already-LIMITed N rows, not the corpus.
    *
    * Cross-engine: 1/(60+rank) is one double division of exact ints,
    * summed in a fixed order — bit-identical in both engines; ties broken
    * on item_id. */
  def hybridRrf(spark: SparkSession, dir: String,
                terms: Seq[String] = Seq("table", "query", "window"),
                n: Int = 100, k: Int = 20, rrfK: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = graft.text.TextAnalysis.bm25(spark, dir, terms, topN = n)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
          .as("lex_rank"))
    val vec = bruteForceTopK(spark, dir, numQueries = 1, k = n).toDF()
      .select(col("neighbor_id"), col("rank").as("vec_rank"))
    val contrib = (r: org.apache.spark.sql.Column) =>
      coalesce(lit(1.0) / (lit(rrfK) + r).cast("double"), lit(0.0))
    lex.join(vec, col("doc_id") === col("neighbor_id"), "full_outer")
      .select(coalesce(col("doc_id"), col("neighbor_id")).as("item_id"),
        col("lex_rank"), col("vec_rank"),
        (contrib(col("lex_rank")) + contrib(col("vec_rank"))).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("item_id"))
      .limit(k)
  }

  /** DuckDB re-derivation of [[hybridRrf]] — same term set, same rank
    * windows, same fixed-order double fusion. */
  def hybridRrfOracleSql(terms: Seq[String] = Seq("table", "query", "window"),
                         n: Int = 100, k: Int = 20, rrfK: Int = 60): String = {
    val bm25 = graft.text.TextAnalysis.bm25OracleSql(terms, topN = n)
    s"""WITH lex AS (SELECT doc_id,
       |    ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
       |  FROM ($bm25) b),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |q AS (SELECT emb AS qe FROM e WHERE vec_id = 0),
       |c AS (SELECT v.vec_id AS neighbor_id,
       |    list_inner_product(qe, v.emb) /
       |      sqrt(list_inner_product(qe, qe) * list_inner_product(v.emb, v.emb)) AS cos
       |  FROM q JOIN e v ON v.vec_id <> 0),
       |vec AS (SELECT neighbor_id, vec_rank FROM (
       |    SELECT neighbor_id,
       |      ROW_NUMBER() OVER (ORDER BY cos DESC, neighbor_id) AS vec_rank
       |    FROM c) WHERE vec_rank <= $n)
       |SELECT COALESCE(l.doc_id, v.neighbor_id) AS item_id,
       |  CAST(l.lex_rank AS INT) AS lex_rank, CAST(v.vec_rank AS INT) AS vec_rank,
       |  COALESCE(CAST(1 AS DOUBLE) / CAST($rrfK + l.lex_rank AS DOUBLE), CAST(0 AS DOUBLE)) +
       |  COALESCE(CAST(1 AS DOUBLE) / CAST($rrfK + v.vec_rank AS DOUBLE), CAST(0 AS DOUBLE)) AS rrf_score
       |FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.neighbor_id
       |ORDER BY rrf_score DESC, item_id LIMIT $k""".stripMargin
  }

  /** PAIR-COSINE HISTOGRAM — the calibration readout that PICKS a dedup /
    * retrieval threshold before anything else runs: the distribution of
    * pairwise cosines on a fixed-count hash-order sample, binned at 0.1
    * width over [−1, 1]. Where the near-dup mass separates from the
    * random-pair bulk is where τ goes (this corpus: bulk ≈ 0, near-dup
    * band ≈ 0.35, planted production dups ≈ 0.9 — the numbers the LSH
    * family's thresholds came from, now a registered query instead of a
    * notebook step).
    *
    * Scale shape: the sweep-truth device — a fixed-count sample pins the
    * quadratic all-pairs cost at sampleN²/2 cosines forever (a rate sample
    * would be quadratic); bin ids are integer floor((cos6+1)·10) on the
    * SAME IEEE expression tree both engines evaluate. */
  def pairCosineHist(spark: SparkSession, dir: String, sampleN: Int = 1000): DataFrame = {
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
      .orderBy(graft.functions.Fnv32.fnv32(
        concat(col("vec_id").cast("string"), lit(":ph"))), col("vec_id"))
      .limit(sampleN)
      .repartition(16) // the quadratic truth scan parallelizes
    e.as("a").join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(graft.functions.VecOps.cosine6Col(col("a.emb"), col("b.emb")).as("c"))
      .select(least(floor((col("c") + lit(1.0)) * lit(10.0)).cast("int"), lit(19)).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("bin"), (col("bin").cast("double") / 10.0 - 1.0).as("bin_lo"),
        col("n_pairs"))
  }

  /** DuckDB re-derivation of [[pairCosineHist]] — same sample order, same
    * rounded cosine, same integer binning. */
  def pairCosineHistOracleSql(sampleN: Int = 1000): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
       |           ORDER BY ${graft.text.TrainedOracles.fnvSql("CAST(vec_id AS VARCHAR) || ':ph'")},
       |             vec_id LIMIT $sampleN),
       |c AS (SELECT ROUND(list_inner_product(a.emb, b.emb) /
       |        sqrt(list_inner_product(a.emb, a.emb) * list_inner_product(b.emb, b.emb)), 6) AS c
       |      FROM e a JOIN e b ON a.vec_id < b.vec_id),
       |bins AS (SELECT LEAST(CAST(FLOOR((c + CAST(1.0 AS DOUBLE)) * CAST(10.0 AS DOUBLE)) AS INT), 19) AS bin FROM c)
       |SELECT bin, CAST(bin AS DOUBLE) / 10.0 - 1.0 AS bin_lo,
       |  COUNT(*) AS n_pairs FROM bins GROUP BY 1""".stripMargin

  /** RADIUS (ε-ball) SEARCH — the retrieval dual of top-k: every neighbor
    * with cosine ≥ τ, however many there are. The primitive behind
    * duplicate lookup ("anything this close to the new doc?"), recall-set
    * construction and density estimation, where a k cap would silently
    * truncate dense neighborhoods and pad sparse ones.
    *
    * EXACT under IVF pruning, one scan: a list at angle θ from the query
    * with angular radius r cannot hold anything above cos(max(θ − r, 0)) —
    * the [[ivfTopKExact]] ball bound with the FIXED τ as the cut (no probe
    * phase needed: τ is known before the scan, so admitted-list sets are
    * decided driver-side per query against nlist radii). A 1e-6 slack on
    * the admission keeps borderline vectors whose unrounded cosine sits
    * just under a τ their rounded surface reaches. On this isotropic
    * fixture the bound admits most lists (correctness at IVF cost); on
    * clustered corpora the same cut skips most of them, and the
    * list-partitioned stored layout turns skips into partition pruning. */
  def radiusSearch(spark: SparkSession, dir: String, numQueries: Int = 8,
                   tau: Double = 0.3, nlist: Int = 16): DataFrame = {
    import spark.implicits._
    val vecs = vectors(spark, dir)
    val centroids = trainCentroids(vecs, nlist)
    val bcCent = spark.sparkContext.broadcast(centroids)
    val nearestList: (Array[Array[Float]], Array[Float]) => Int = (cs, e) => {
      var best = 0; var bestC = Double.NegativeInfinity
      var i = 0
      while (i < cs.length) {
        val c = cosine(e, cs(i)); if (c > bestC) { bestC = c; best = i }; i += 1
      }
      best
    }
    val assigned = vecs
      .map(v => (nearestList(bcCent.value, v.embedding), v)).persist()
    val radius = listRadii(assigned.rdd.map { case (l, v) => (l, v.embedding) },
      bcCent, nlist)
    val queries = queryArr(spark, dir, numQueries)
    // driver-side: per query, the lists the ball bound cannot exclude
    val admitted: Array[(Vec, Set[Int])] = queries.map { q =>
      val cs = bcCent.value
      val lists = cs.indices.filter { l =>
        radius.get(l).exists { r =>
          val theta = math.acos(math.max(-1.0, math.min(1.0, cosine(q.embedding, cs(l)))))
          math.cos(math.max(theta - r, 0.0)) >= tau - 1e-6
        }
      }.toSet
      (q, lists)
    }
    val bcQ = spark.sparkContext.broadcast(admitted)
    val out = assigned.mapPartitions { it =>
      val qs = bcQ.value
      it.flatMap { case (list, v) =>
        qs.iterator.flatMap { case (q, lists) =>
          if (lists.contains(list) && v.vec_id != q.vec_id) {
            val c = cosine6(q.embedding, v.embedding)
            if (c >= tau) Iterator.single((q.vec_id, v.vec_id, c)) else Iterator.empty
          } else Iterator.empty
        }
      }
    }.toDF("query_id", "neighbor_id", "cosine")
    assigned.unpersist()
    out
  }

  /** DuckDB re-derivation of [[radiusSearch]]: the plain brute filter —
    * the ball bound only skips provably-below-τ lists, so the pruned scan
    * must equal it exactly. */
  def radiusSearchOracleSql(numQueries: Int = 8, tau: Double = 0.3): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |q AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < $numQueries),
       |c AS (SELECT query_id, v.vec_id AS neighbor_id,
       |    ROUND(list_inner_product(qe, v.emb) /
       |      sqrt(list_inner_product(qe, qe) * list_inner_product(v.emb, v.emb)), 6) AS cosine
       |  FROM q JOIN e v ON v.vec_id <> query_id)
       |SELECT query_id, neighbor_id, cosine FROM c
       |WHERE cosine >= CAST($tau AS DOUBLE)""".stripMargin
}
