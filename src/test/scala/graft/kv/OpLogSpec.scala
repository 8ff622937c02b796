package graft.kv

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class OpLogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fold(ops: Seq[Op]): Map[String, String] = {
    import spark.implicits._
    OpLog.materialize(spark.createDataset(ops)).collect()
      .map(s => s.key -> s.value).toMap
  }

  test("append concatenates in ts order; put overwrites") {
    val ops = Seq(
      Op(1, 1, 1, "append", "k", "a"),
      Op(3, 1, 3, "append", "k", "c"),
      Op(2, 1, 2, "append", "k", "b"),
      Op(1, 2, 1, "put", "p", "v1"),
      Op(2, 2, 2, "put", "p", "v2"),
      Op(3, 2, 3, "append", "p", "+x"))
    val st = fold(ops)
    assert(st("k") == "abc")
    assert(st("p") == "v2+x")
  }

  test("exactly-once: duplicate (clientId, seq) applied once — checkClntAppends invariant") {
    // mirror of /root/reference/src/kvraft/test_test.go:83-100 — every append
    // appears exactly once, in per-client order
    val appends = (1 to 20).map(j => Op(j.toLong, 7, j.toLong, "append", "k", s"x 7 $j y"))
    val retries = appends.filter(_.seq % 3 == 0) // client retried some calls
    val st = fold(scala.util.Random.shuffle(appends ++ retries))
    val v = st("k")
    (1 to 20).foreach { j =>
      val elem = s"x 7 $j y"
      val first = v.indexOf(elem)
      assert(first >= 0, s"missing $elem")
      assert(v.indexOf(elem, first + 1) < 0 || elem.length < 7, s"duplicated $elem")
    }
    // per-client order: j ascending
    val positions = (1 to 20).map(j => v.indexOf(s"x 7 $j y"))
    assert(positions == positions.sorted)
  }

  test("foldSorted streams: a key's state is emitted without reading past its last op") {
    // two keys, key-contiguous sorted order; pulling key "a"'s state must not
    // consume key "b"'s ops — proves the fold holds no partition buffer
    var consumed = 0
    val ops = Iterator.tabulate(6) { i =>
      consumed = i + 1
      if (i < 3) Op(i.toLong, 1, i.toLong, "append", "a", i.toString)
      else Op(i.toLong, 1, i.toLong, "append", "b", i.toString)
    }
    val out = OpLog.foldSorted(ops)
    val first = out.next()
    assert(first == KvState("a", "012"))
    assert(consumed <= 4, s"read $consumed ops for key a (3 ops + 1 lookahead allowed)")
    assert(out.next() == KvState("b", "345"))
  }

  test("a single hot key folds 2M ops in constant state (reference kv.go:40-54 semantics)") {
    // lazily generated — never materialized as a collection; per-op state is
    // the current value + one high-water entry, so this completes in bounded
    // heap no matter the op count
    val n = 2000000
    val ops = Iterator.tabulate(n) { i =>
      Op(i.toLong, i.toLong % 4, i.toLong, "put", "hot", s"v$i")
    }
    val st = OpLog.foldSorted(ops).toList
    assert(st == List(KvState("hot", s"v${n - 1}")))
  }

  test("retry with stale seq is dropped (per-client high-water, kvraft duplicate table)") {
    val st = fold(Seq(
      Op(1, 1, 1, "append", "k", "a"),
      Op(2, 1, 2, "append", "k", "b"),
      Op(3, 1, 1, "append", "k", "a"), // client 1 retries seq 1 later: dropped
      Op(4, 2, 1, "append", "k", "c"))) // different client, own seq space
    assert(st("k") == "abc")
  }

  test("get of missing key returns empty string") {
    import spark.implicits._
    val st = OpLog.materialize(spark.createDataset(Seq(Op(1, 1, 1, "put", "k", "v"))))
    assert(OpLog.get(st, "nope") == "")
    assert(OpLog.get(st, "k") == "v")
  }

  test("get ops do not change state") {
    val st = fold(Seq(
      Op(1, 1, 1, "append", "k", "a"),
      Op(2, 1, 2, "get", "k", ""),
      Op(3, 1, 3, "append", "k", "b")))
    assert(st("k") == "ab")
  }
}
