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
