package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.sample.Sampling.sourceCap]] — the per-source
  * domain cap ENFORCED ON ARRIVAL instead of by a batch sweep.
  *
  * State per source is the current cap-winner set: at most k (h, doc_id)
  * pairs ordered by (h desc, doc_id asc) — the identical total order as the
  * batch operator's TopKPerKey, so a document kept in an early batch is
  * evicted the moment a higher-hash arrival displaces it. Total state is
  * O(sources × k) and does NOT grow with stream length — the cap is the
  * state bound, which is what makes this viable as a forever-running ingest
  * gate at 100 TB (contrast a "keep everything, cap later" design whose
  * state is the corpus).
  *
  * Each batch emits the group's full current kept set stamped with the
  * group's batch generation counter, so the highest-gen emission per source
  * IS the batch answer over everything that has arrived — the parity spec
  * replays the corpus in two file-batches and compares exactly that against
  * [[graft.sample.Sampling.sourceCap]].
  */
object CapStream {

  final case class CapDoc(source: String, doc_id: Long, h: Int)
  final case class CapState(members: Seq[(Int, Long)], gen: Long)
  final case class CapRow(source: String, doc_id: Long, h: Int, rank: Long, gen: Long)

  /** Pure per-group transition: fold arrivals into the bounded winner set.
    * `distinct` makes replays of the same (h, doc_id) idempotent (the file
    * source is exactly-once, but an at-least-once upstream must not double-
    * count a winner); the sort is the batch operator's total order, so the
    * result is independent of arrival order and of how arrivals are split
    * across batches — the algebraic fact the parity spec leans on, and the
    * property spec checks directly. */
  private[graft] def mergeWinners(prev: Seq[(Int, Long)],
                                      arrivals: Iterator[(Int, Long)],
                                      k: Int): Seq[(Int, Long)] =
    (prev.iterator ++ arrivals).toSeq.distinct
      .sortBy { case (h, id) => (-h, id) }
      .take(k)

  def sourceCapStream(docs: Dataset[CapDoc], k: Int = 10): Dataset[CapRow] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[CapState, CapRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (source: String, it: Iterator[CapDoc], state: GroupState[CapState]) =>
          val prev = state.getOption.getOrElse(CapState(Seq.empty, 0L))
          val merged = mergeWinners(prev.members, it.map(d => (d.h, d.doc_id)), k)
          val gen = prev.gen + 1
          state.update(CapState(merged, gen))
          merged.iterator.zipWithIndex.map { case ((h, id), i) =>
            CapRow(source, id, h, i + 1L, gen)
          }
      }
  }
}
