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

  test("distributed check partitions by key") {
    import spark.implicits._
    val hist = spark.createDataset(Seq(
      HistOp("good", 1, "v", "", 1, 2), HistOp("good", 0, "", "v", 3, 4),
      HistOp("bad", 1, "v", "", 1, 2), HistOp("bad", 0, "", "x", 3, 4)))
    val verdicts = Linearizability.check(hist).collect().map(v => v.key -> v.linearizable).toMap
    assert(verdicts == Map("good" -> true, "bad" -> false))
  }
}
