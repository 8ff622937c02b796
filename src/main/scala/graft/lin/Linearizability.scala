package graft.lin

import org.apache.spark.sql.Dataset

import scala.collection.immutable.BitSet

/** One call/return event in an operation history — porcupine's `Operation`
  * (/root/reference/src/porcupine/model.go:5-11) specialized to the KV model
  * (/root/reference/src/models/kv.go:7-15). op: 0=get, 1=put, 2=append. */
final case class HistOp(key: String, op: Int, value: String, output: String,
                        call: Long, ret: Long)

final case class LinVerdict(key: String, n_ops: Long, verdict: String)

/** Linearizability checking (A7). The reference's checker partitions the
  * history by key (/root/reference/src/models/kv.go:18-34) — a group-by — and
  * runs a sequential search per key (/root/reference/src/porcupine/checker.go).
  * Here the partitioning is the distributed part (one shuffle on key; each
  * key's search runs on an executor core); the per-key search is a
  * Wing&Gong-style lazy DFS in the shape porcupine implements with an
  * explicit bitset (/root/reference/src/porcupine/bitset.go:1-72,
  * checker.go:101-215), made sound for histories of ANY length:
  *
  *   - No op-count cap (the visited key is an immutable BitSet, not a 64-bit
  *     mask) and no greedy fallback.
  *   - The call-sorted history decomposes at quiescence points — instants
  *     where every earlier op returned before any later op is called — into
  *     components that any linearization must keep in order, so the DFS only
  *     interleaves ops *within* the current component: mostly-sequential
  *     histories (what batch op-log replays produce) check in linear time.
  *   - Refuting a pathologically concurrent history is inherently
  *     exponential (porcupine has the same worst case and its harness treats
  *     a 1 s timeout as pass, /root/reference/src/kvraft/test_test.go:23,447).
  *     Past an expansion budget this checker returns [[Unknown]] — never a
  *     wrong boolean.
  */
object Linearizability {

  sealed trait Verdict
  case object Linearizable extends Verdict
  case object NotLinearizable extends Verdict
  /** Search budget exhausted before a witness or a refutation was found. */
  case object Unknown extends Verdict

  /** A sequential specification in porcupine's model shape
    * (/root/reference/src/porcupine/model.go:27-43): initial state, a step
    * that applies an (operation, claimed output) pair and reports whether it
    * is consistent, and a canonical rendering used for frame memoization.
    * The search below is generic over the model — the KV model is simply
    * the one the reference's tests exercise. */
  trait LinModel[S] extends Serializable {
    def init: S
    def step(state: S, op: HistOp): Option[S]
    def render(state: S): String
  }

  /** KV model (/root/reference/src/models/kv.go:40-54): get must observe
    * the current state; put replaces; append concatenates. */
  object KvModel extends LinModel[String] {
    def init: String = ""
    def step(state: String, o: HistOp): Option[String] = o.op match {
      case 0 => if (o.output == state) Some(state) else None
      case 1 => Some(o.value)
      case _ => Some(state + o.value)
    }
    def render(state: String): String = state
  }

  /** Read-write register (porcupine's canonical example model): put
    * replaces, get must observe — no append. Exists to prove the checker is
    * model-generic, like porcupine's registerModel. */
  object RegisterModel extends LinModel[String] {
    def init: String = ""
    def step(state: String, o: HistOp): Option[String] = o.op match {
      case 0 => if (o.output == state) Some(state) else None
      case 1 => Some(o.value)
      case _ => None // registers have no append
    }
    def render(state: String): String = state
  }

  /** Split a call-sorted history at quiescence points: cut before op i when
    * op i's call is strictly after every earlier op's return. All ops of a
    * component precede all ops of the next in every linearization. */
  private[lin] def components(ops: Array[HistOp]): Array[Array[HistOp]] = {
    val out = Array.newBuilder[Array[HistOp]]
    var start = 0
    var maxRet = Long.MinValue
    var i = 0
    while (i < ops.length) {
      if (i > start && ops(i).call > maxRet) {
        out += ops.slice(start, i)
        start = i
      }
      if (ops(i).ret > maxRet) maxRet = ops(i).ret
      i += 1
    }
    if (start < ops.length) out += ops.slice(start, ops.length)
    out.result()
  }

  /** 128-bit frame digest for the DFS memo: mixes (component index, done
    * bitmask, model state chars) through two independently-seeded SplitMix64
    * chains. Storing 16 bytes per visited frame instead of the frame's full
    * state string bounds memo memory by ENTRY COUNT, not by state length —
    * long append-built states no longer accumulate in executor heap. A
    * false memo hit needs a 128-bit collision among the <= `maxMemo` stored
    * digests (~2^-90 at the default cap) — far below the search's own
    * Unknown-budget fallback; porcupine's cache likewise keys on a hashed
    * bitset (/root/reference/src/porcupine/checker.go:34-45). */
  private def frameDigest(ci: Int, done: BitSet, state: String): (Long, Long) = {
    var h1 = 0x9e3779b97f4a7c15L
    var h2 = 0xc2b2ae3d27d4eb4fL
    @inline def put(x: Long): Unit = {
      h1 = graft.sim.Similarity.mix64(h1 ^ x)
      h2 = graft.sim.Similarity.mix64(h2 + x)
    }
    put(ci.toLong)
    done.toBitMask.foreach(put)
    put(state.length.toLong)
    var i = 0
    while (i < state.length) { put(state.charAt(i).toLong); i += 1 }
    (h1, h2)
  }

  /** Per-key search, generic over the sequential model. Iterative lazy DFS
    * over frames (component, done-set within component, model state),
    * memoized on a 128-bit frame digest — finding one witness proves
    * linearizable; exhausting the space refutes; exceeding `budget` frame
    * expansions OR `maxMemo` memoized frames yields [[Unknown]] — never a
    * wrong boolean and never an OOM. */
  def checkVerdict[S](history: Seq[HistOp], model: LinModel[S],
                      budget: Long = 10_000_000L,
                      maxMemo: Int = 4_000_000): Verdict = {
    val sorted = history.sortBy(o => (o.call, o.ret)).toArray
    if (sorted.isEmpty) return Linearizable
    val comps = components(sorted)
    val nComps = comps.length
    val seen = scala.collection.mutable.HashSet.empty[(Long, Long)]
    val stack = scala.collection.mutable.ArrayDeque.empty[(Int, BitSet, S)]
    stack.append((0, BitSet.empty, model.init))
    var expansions = 0L
    while (stack.nonEmpty) {
      expansions += 1
      if (expansions > budget) return Unknown
      var (ci, done, state) = stack.removeLast()
      // advance through completed components (always via the explicit frame,
      // so cross-component revisits with the same carried state memoize)
      if (done.size == comps(ci).length) {
        if (ci == nComps - 1) return Linearizable
        ci += 1
        done = BitSet.empty
      }
      if (seen.size >= maxMemo) return Unknown
      if (seen.add(frameDigest(ci, done, model.render(state)))) {
        val ops = comps(ci)
        val n = ops.length
        // an op may linearize next iff no undone op in its component
        // returned strictly before its call (real-time order); ops in other
        // components are ordered by the quiescence cut already
        var minRet = Long.MaxValue
        var i = 0
        while (i < n) {
          if (!done(i) && ops(i).ret < minRet) minRet = ops(i).ret
          i += 1
        }
        i = 0
        while (i < n) {
          if (!done(i) && ops(i).call <= minRet) {
            model.step(state, ops(i)).foreach(s2 => stack.append((ci, done + i, s2)))
          }
          i += 1
        }
      }
    }
    NotLinearizable
  }

  /** KV-model form — the per-key entry the distributed check and the
    * reference's tests use. */
  def checkKeyVerdict(history: Seq[HistOp], budget: Long = 10_000_000L,
                      maxMemo: Int = 4_000_000): Verdict =
    checkVerdict(history, KvModel, budget, maxMemo)

  /** Boolean form for histories expected to resolve within budget; throws on
    * [[Unknown]] rather than guessing. */
  def checkKey(history: Seq[HistOp], budget: Long = 10_000_000L): Boolean =
    checkKeyVerdict(history, budget) match {
      case Linearizable    => true
      case NotLinearizable => false
      case Unknown => throw new IllegalStateException(
        s"linearizability search budget ($budget) exhausted; verdict unknown")
    }

  /** Distributed check: shuffle once on key, search each key independently.
    * Verdict column: "linearizable" | "violation" | "unknown". */
  def check(history: Dataset[HistOp]): Dataset[LinVerdict] =
    checkWith(history, KvModel)

  /** Model-generic distributed check (the model ships to executors). */
  def checkWith[S](history: Dataset[HistOp], model: LinModel[S]): Dataset[LinVerdict] = {
    val spark = history.sparkSession
    import spark.implicits._
    history.groupByKey(_.key).mapGroups { (k, it) =>
      val ops = it.toSeq
      val v = checkVerdict(ops, model) match {
        case Linearizable    => "linearizable"
        case NotLinearizable => "violation"
        case Unknown         => "unknown"
      }
      LinVerdict(k, ops.size.toLong, v)
    }
  }
}
