package graft.sim

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

import Similarity.{Vec, Hit, cosine}

/** Shared candidate-generation + bounded-exact-rerank skeleton for the
  * compressed-index searches ([[Pq]], [[IvfPq]]): scan the code table with
  * per-partition per-query top-`rerank` heaps (only Q × rerank rows leave
  * each partition), merge to the global top-`rerank` candidate set per
  * query, exact-score exactly those against the float corpus (the ONLY
  * touch of the uncompressed data), and emit the top k with the engine's
  * canonical (-cosine, id) tie-break and 6-decimal rounding. Factoring this
  * out keeps the three invariants every compressed search must share — heap
  * tie-break, rerank take-width, rounding — in one place.
  *
  * `scorerFactory` runs once per partition (LUT construction lives there)
  * and returns the per-(row, query) approximate scorer; NaN means "skip
  * this row for this query" (e.g. an unprobed IVF list). Self-matches are
  * skipped centrally via `idOf`. */
private[sim] object AdcSearch {

  def topK[T](codes: Dataset[T], idOf: T => Long, queries: Array[Vec],
              vecs: Dataset[Vec], k: Int, rerank: Int,
              scorerFactory: Array[Vec] => (T, Int) => Double): Dataset[Hit] = {
    val spark = codes.sparkSession
    import spark.implicits._
    val bcQ = spark.sparkContext.broadcast(queries)
    val rr = math.max(1, rerank)
    val candidates: Dataset[(Long, Long)] = codes.mapPartitions { it =>
      val qs = bcQ.value
      val scorer = scorerFactory(qs)
      val heaps = qs.map(_ => scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
        Ordering.by[(Double, Long), (Double, Long)] { case (c, id) => (-c, id) }))
      it.foreach { row =>
        val id = idOf(row)
        var qi = 0
        while (qi < qs.length) {
          if (id != qs(qi).vec_id) {
            val score = scorer(row, qi)
            if (!score.isNaN) {
              val h = heaps(qi)
              if (h.size < rr) h.enqueue((score, id))
              else if (score > h.head._1 || (score == h.head._1 && id < h.head._2)) {
                h.dequeue(); h.enqueue((score, id))
              }
            }
          }
          qi += 1
        }
      }
      qs.iterator.zip(heaps.iterator).flatMap { case (q, h) =>
        h.iterator.map { case (s, id) => (q.vec_id, id, s) }
      }
    }.groupByKey(_._1).flatMapGroups { (qid, it) =>
      it.toArray.sortBy { case (_, id, s) => (-s, id) }.take(rr)
        .iterator.map { case (_, id, _) => (qid, id) }
    }
    // bounded exact rerank: Q × rerank candidate rows join the float corpus
    val exact = candidates.toDF("qid", "vec_id")
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
    exact.groupByKey(_._1).flatMapGroups { (qid, it) =>
      it.toArray.sortBy { case (_, id, c) => (-c, id) }.take(k)
        .iterator.zipWithIndex.map { case ((_, id, c), r) =>
          Hit(qid, id, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, r + 1) }
    }
  }
}
