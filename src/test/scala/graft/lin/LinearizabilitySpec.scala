package graft.lin

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class LinearizabilitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // op codes: 0=get, 1=put, 2=append (src/models/kv.go)
  test("sequential put-get history is linearizable") {
    assert(Linearizability.checkKey(Seq(
      HistOp("k", 1, "v", "", 1, 2),
      HistOp("k", 0, "", "v", 3, 4))))
  }

  test("get of a never-written value is NOT linearizable") {
    assert(!Linearizability.checkKey(Seq(
      HistOp("k", 1, "v", "", 1, 2),
      HistOp("k", 0, "", "stale", 3, 4))))
  }

  test("concurrent ops may linearize in either order") {
    // put(a) and put(b) overlap; a later get can see either
    val base = Seq(
      HistOp("k", 1, "a", "", 1, 10),
      HistOp("k", 1, "b", "", 2, 9))
    assert(Linearizability.checkKey(base :+ HistOp("k", 0, "", "a", 20, 21)))
    assert(Linearizability.checkKey(base :+ HistOp("k", 0, "", "b", 20, 21)))
    assert(!Linearizability.checkKey(base :+ HistOp("k", 0, "", "c", 20, 21)))
  }

  test("real-time order is respected (no reordering of non-overlapping ops)") {
    // put(a) finishes before put(b) starts; get after both must see b
    assert(!Linearizability.checkKey(Seq(
      HistOp("k", 1, "a", "", 1, 2),
      HistOp("k", 1, "b", "", 3, 4),
      HistOp("k", 0, "", "a", 5, 6))))
  }

  test("append model: get must see concatenation") {
    assert(Linearizability.checkKey(Seq(
      HistOp("k", 2, "a", "", 1, 2),
      HistOp("k", 2, "b", "", 3, 4),
      HistOp("k", 0, "", "ab", 5, 6))))
    assert(!Linearizability.checkKey(Seq(
      HistOp("k", 2, "a", "", 1, 2),
      HistOp("k", 2, "b", "", 3, 4),
      HistOp("k", 0, "", "ba", 5, 6))))
  }

  test(">62-op concurrent history where greedy (call,ret) order fails is still linearizable") {
    // The round-1 fallback applied ops in (call, ret) order for long
    // histories: here the overlapping get("") MUST linearize before the
    // put it overlaps, so that fixed order wrongly rejects. 120 sequential
    // appends follow to push the history far past any bitmask bound.
    val overlap = Seq(
      HistOp("k", 1, "a", "", 0, 10), // put(a), long-running
      HistOp("k", 0, "", "", 1, 2))   // concurrent get sees pre-put state
    val tail = (0 until 120).map(i =>
      HistOp("k", 2, i.toString, "", 100 + 2 * i, 101 + 2 * i))
    assert(Linearizability.checkKey(overlap ++ tail))
    // and the checker still rejects a genuinely broken long history
    val badTail = tail :+ HistOp("k", 0, "", "WRONG", 1000, 1001)
    assert(!Linearizability.checkKey(overlap ++ badTail))
  }

  test("100+ overlapping ops per key: pairwise-concurrent appends check exhaustively") {
    // 56 pairs of overlapping appends (112 ops, each pair a 2-op component)
    // followed by a get — far past the old 62-op bitmask bound. Finding a
    // witness is lazy (one descent, no state-set materialization); full
    // refutation at this width is inherently exponential, so the checker
    // must answer Unknown (not a wrong boolean) within a small budget.
    val pairs = 56
    val ops = (0 until pairs).flatMap { p =>
      val t = p * 10L
      Seq(HistOp("k", 2, "a", "", t, t + 5), HistOp("k", 2, "b", "", t + 1, t + 4))
    }
    // "ba" repeated: the DFS pushes candidates in index order and pops LIFO,
    // so the b-first interleaving is found on the first descent — a witness
    // for a genuinely concurrent 113-op history, found lazily
    assert(Linearizability.checkKey(ops :+ HistOp("k", 0, "", "ba" * pairs, 10000, 10001)))
    // impossible output (wrong multiset: 2 a's from one a+b pair)
    val bad = ops :+ HistOp("k", 0, "", "aa" + "ba" * (pairs - 1), 10000, 10001)
    assert(Linearizability.checkKeyVerdict(bad, budget = 200_000L) !=
      Linearizability.Linearizable)
    // and with the budget exhausted the verdict is Unknown — never a wrong
    // boolean (the old greedy fallback would have answered false for
    // linearizable inputs of this shape)
    val hard = ops :+ HistOp("k", 0, "", "ab" * pairs, 10000, 10001)
    val v = Linearizability.checkKeyVerdict(hard, budget = 5_000L)
    assert(v == Linearizability.Unknown || v == Linearizability.Linearizable)
  }

  test("checker is model-generic: register model rejects what the KV model accepts") {
    import Linearizability._
    // put(a) concurrent with get observing "ab" after an append: fine for
    // the KV model, impossible for a read-write register (no append op)
    val history = Seq(
      HistOp("r", 1, "a", "", 0, 10),
      HistOp("r", 2, "b", "", 11, 12), // append
      HistOp("r", 0, "", "ab", 13, 14))
    assert(checkVerdict(history, KvModel) == Linearizable)
    assert(checkVerdict(history, RegisterModel) == NotLinearizable)
    // pure put/get histories agree across models
    val rw = Seq(
      HistOp("r", 1, "x", "", 0, 1),
      HistOp("r", 1, "y", "", 0, 5), // concurrent with the get below
      HistOp("r", 0, "", "x", 2, 3))
    assert(checkVerdict(rw, RegisterModel) == Linearizable)
    assert(checkVerdict(rw, KvModel) == Linearizable)
    val bad = Seq(
      HistOp("r", 1, "x", "", 0, 1),
      HistOp("r", 0, "", "z", 2, 3)) // z never written
    assert(checkVerdict(bad, RegisterModel) == NotLinearizable)
  }

  test("LinViz renders a bar per op, lanes overlapping ops, and the verdict") {
    import Linearizability._
    val history = Seq(
      HistOp("k", 1, "a", "", 0, 10),
      HistOp("k", 0, "", "never", 5, 8), // concurrent with the put; violating get
      HistOp("k", 2, "b", "", 20, 25))
    val html = LinViz.render("k", history, checkKeyVerdict(history))
    assert(html.contains("NotLinearizable"))
    assert("<rect ".r.findAllIn(html).size == 3)
    assert(html.contains("get() -&gt; “never”") || html.contains("get()"))
    // the two overlapping ops must occupy different lanes (different y)
    val ys = """<rect x="[^"]*" y="([0-9.]+)"""".r.findAllMatchIn(html).map(_.group(1)).toSeq
    assert(ys.distinct.size >= 2, s"lanes: $ys")
  }

  test("memo cap returns Unknown instead of unbounded memory (never a wrong boolean)") {
    // a width-8 fully-concurrent component forces many memoized frames;
    // with maxMemo=4 the search must give up as Unknown, and with the
    // default cap it resolves to a definite verdict
    val wide = (0 until 8).map(i => HistOp("k", 2, i.toString, "", 0, 100))
    val history = wide :+ HistOp("k", 0, "", wide.indices.map(_.toString).mkString, 200, 201)
    assert(Linearizability.checkKeyVerdict(history, maxMemo = 4) == Linearizability.Unknown)
    assert(Linearizability.checkKeyVerdict(history) == Linearizability.Linearizable)
  }

  test("exhaustive refutation on a concurrent history of moderate width") {
    // 8 overlapping pairs: full refutation of an impossible get must visit
    // every interleaving class (2^8 carried states) and still answer false
    val ops = (0 until 8).flatMap { p =>
      val t = p * 10L
      Seq(HistOp("k", 2, "a", "", t, t + 5), HistOp("k", 2, "b", "", t + 1, t + 4))
    }
    val bad = ops :+ HistOp("k", 0, "", "ab" * 7 + "aa", 10000, 10001)
    assert(!Linearizability.checkKey(bad))
  }

  test("quiescence components split only at true quiescence") {
    val ops = Array(
      HistOp("k", 2, "a", "", 0, 10),
      HistOp("k", 2, "b", "", 5, 6),   // overlaps first
      HistOp("k", 2, "c", "", 11, 12), // starts after both returned
      HistOp("k", 2, "d", "", 12, 13)) // call == prior ret → same component
    val comps = Linearizability.components(ops)
    assert(comps.map(_.length).toList == List(2, 2))
  }

  test("distributed check partitions by key") {
    import spark.implicits._
    val hist = spark.createDataset(Seq(
      HistOp("good", 1, "v", "", 1, 2), HistOp("good", 0, "", "v", 3, 4),
      HistOp("bad", 1, "v", "", 1, 2), HistOp("bad", 0, "", "x", 3, 4)))
    val verdicts = Linearizability.check(hist).collect().map(v => v.key -> v.verdict).toMap
    assert(verdicts == Map("good" -> "linearizable", "bad" -> "violation"))
  }
}
