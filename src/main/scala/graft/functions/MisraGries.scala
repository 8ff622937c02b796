package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** MISRA-GRIES frequent-items sketch (Misra & Gries 1982) in the mergeable
  * formulation of Agarwal et al., "Mergeable Summaries" (PODS 2012): a
  * bounded map of at most `capacity` counters whose compaction step
  * subtracts the (capacity+1)-th largest count from every counter and drops
  * the non-positive ones. Each compaction that subtracts `v` removes at
  * least `(capacity+1)·v` total weight, so across any merge tree the
  * per-item undercount is at most `n / (capacity + 1)` for `n` items seen —
  * the guarantee that makes the sketch a SUPERSET filter: any item with
  * true frequency > n/(capacity+1) still has a positive counter at the end.
  *
  * This is the third member of the sketch family (HLL distincts in
  * `ev_approx_users`, GK quantiles in `q_quantiles_sketch`): the 100 TB
  * answer for heavy hitters over a vocabulary too large to groupBy — the
  * sketch crosses the wire as ≤ capacity counters per partition instead of
  * a vocabulary-sized exchange. Exactness is then recovered by a second,
  * candidate-bounded pass ([[graft.text.TextAnalysis.heavyHitters]]).
  *
  * The buffer grows to 2×capacity between compactions so the cost of an
  * unseen-key insert is amortized O(1) map operations (the textbook
  * decrement-all variant pays O(capacity) per unseen key — quadratic on a
  * mostly-distinct stream). Each compaction is itself a valid mergeable-MG
  * step, so the error bound is unchanged.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")
  private val high = 2 * capacity

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  /** Subtract the (capacity+1)-th largest count and drop non-positives —
    * the Agarwal et al. merge-compaction. Only called when size > capacity,
    * so the subtracted value is well-defined and at least one entry drops. */
  private def compact(b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    val counts = b.values.toArray
    java.util.Arrays.sort(counts)
    val v = counts(counts.length - (capacity + 1)) // (capacity+1)-th largest
    b.filterInPlace((_, c) => c - v > 0L).mapValuesInPlace((_, c) => c - v)
  }

  override def reduce(b: mutable.HashMap[String, Long], item: String): mutable.HashMap[String, Long] = {
    b.updateWith(item) { case prev => Some(prev.getOrElse(0L) + 1L) }
    if (b.size > high) compact(b) else b
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreach { case (k, c) =>
      big.updateWith(k) { case prev => Some(prev.getOrElse(0L) + c) }
    }
    if (big.size > capacity) compact(big) else big
  }

  /** Final compaction to the contract size (reduce leaves up to 2×capacity). */
  override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] =
    (if (b.size > capacity) compact(b) else b).toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}
