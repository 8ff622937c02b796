package graft.lin

import org.apache.spark.sql.Dataset

/** One call/return event in an operation history — porcupine's `Operation`
  * (/root/reference/src/porcupine/model.go:5-11) specialized to the KV model
  * (/root/reference/src/models/kv.go:7-15). op: 0=get, 1=put, 2=append. */
final case class HistOp(key: String, op: Int, value: String, output: String,
                        call: Long, ret: Long)

final case class LinVerdict(key: String, n_ops: Long, linearizable: Boolean)

/** Linearizability checking (A7). The reference's checker partitions the
  * history by key (/root/reference/src/models/kv.go:18-34) — a group-by — and
  * runs a sequential search per key (/root/reference/src/porcupine/checker.go).
  * Here the partitioning is the distributed part (one shuffle on key; each
  * key's search runs on an executor core), and the per-key search is a
  * memoized DFS over the real-time partial order.
  */
object Linearizability {

  /** KV model step (/root/reference/src/models/kv.go:40-54): get must observe
    * the current state; put replaces; append concatenates. */
  private def step(state: String, o: HistOp): Option[String] = o.op match {
    case 0 => if (o.output == state) Some(state) else None
    case 1 => Some(o.value)
    case _ => Some(state + o.value)
  }

  /** Per-key history check: does a linearization exist? Memoized DFS: a
    * candidate op can go next iff its call precedes every undone op's return
    * (no undone op strictly returned before it was called). */
  def checkKey(history: Seq[HistOp]): Boolean = {
    val ops = history.sortBy(o => (o.call, o.ret)).toArray
    val n = ops.length
    if (n == 0) return true
    if (n > 62) return checkKeyGreedy(ops) // bitmask bound; long histories → greedy
    val seen = scala.collection.mutable.HashSet.empty[(Long, String)]
    def dfs(doneMask: Long, state: String): Boolean = {
      if (java.lang.Long.bitCount(doneMask) == n) return true
      if (!seen.add((doneMask, state))) return false
      var minRet = Long.MaxValue
      var i = 0
      while (i < n) {
        if ((doneMask & (1L << i)) == 0 && ops(i).ret < minRet) minRet = ops(i).ret
        i += 1
      }
      i = 0
      while (i < n) {
        if ((doneMask & (1L << i)) == 0 && ops(i).call <= minRet) {
          step(state, ops(i)) match {
            case Some(s2) if dfs(doneMask | (1L << i), s2) => return true
            case _ => ()
          }
        }
        i += 1
      }
      false
    }
    dfs(0L, "")
  }

  /** Fallback for very long per-key histories: apply in (call, ret) order —
    * sound for sequential (non-overlapping) histories, which is what batch
    * op-log replays produce. */
  private def checkKeyGreedy(ops: Array[HistOp]): Boolean = {
    var state = ""
    ops.forall { o =>
      step(state, o) match {
        case Some(s) => state = s; true
        case None => false
      }
    }
  }

  /** Distributed check: shuffle once on key, search each key independently. */
  def check(history: Dataset[HistOp]): Dataset[LinVerdict] = {
    val spark = history.sparkSession
    import spark.implicits._
    history.groupByKey(_.key).mapGroups { (k, it) =>
      val ops = it.toSeq
      LinVerdict(k, ops.size.toLong, checkKey(ops))
    }
  }
}
