package graft.shard

import org.scalatest.funsuite.AnyFunSuite

class ShardingSpec extends AnyFunSuite {
  import Sharding._

  private def balanced(c: ShardConfig): Unit = {
    if (c.groups.nonEmpty) {
      assert(c.shards.forall(c.groups.contains), s"orphan shard in $c")
      val counts = c.groups.keys.map(g => c.shards.count(_ == g))
      assert(counts.max - counts.min <= 1, s"unbalanced: $c")
    } else assert(c.shards.forall(_ == 0))
  }

  test("join/leave keep balance invariant (shardmaster test_test.go:25-52)") {
    var c = initial
    c = join(c, Map(1 -> Seq("s1a"))); balanced(c)
    assert(c.shards.forall(_ == 1))
    c = join(c, Map(2 -> Seq("s2a"))); balanced(c)
    c = join(c, Map(3 -> Seq("s3a"))); balanced(c)
    c = leave(c, Seq(1)); balanced(c)
    assert(!c.shards.contains(1))
    c = leave(c, Seq(2)); balanced(c)
    assert(c.shards.forall(_ == 3))
  }

  test("sequential joins then leaves across 10 groups stay balanced") {
    var c = initial
    val hist = scala.collection.mutable.ArrayBuffer(c)
    (1 to 10).foreach { g => c = join(c, Map(g -> Seq(s"srv$g"))); balanced(c); hist += c }
    (1 to 9).foreach { g => c = leave(c, Seq(g)); balanced(c); hist += c }
    assert(c.shards.forall(_ == 10))
    // Query semantics: -1 = latest, num = that config
    assert(query(hist.toSeq, -1) == c)
    assert(query(hist.toSeq, 0) == initial)
    assert(query(hist.toSeq, 3).num == 3)
  }

  test("move places a shard explicitly; rebalance is minimal-move") {
    var c = join(join(initial, Map(1 -> Seq("a"))), Map(2 -> Seq("b")))
    val moved = move(c, 0, 2)
    assert(moved.shards(0) == 2)
    assert(moved.num == c.num + 1)
    // joining a third group moves at most ceil(10/3) shards
    val c3 = join(c, Map(3 -> Seq("c")))
    val movedCount = c.shards.zip(c3.shards).count { case (a, b) => a != b }
    assert(movedCount <= 4)
  }

  test("key2shard matches reference semantics (first byte mod 10)") {
    assert(key2shard("0") == '0'.toInt % 10)
    assert(key2shard("") == 0)
    (0 to 9).foreach(d => assert(key2shard(d.toString) == ('0' + d) % 10))
  }

  test("migration plan lists exactly the changed shards") {
    val a = join(initial, Map(1 -> Seq("a")))
    val b = join(a, Map(2 -> Seq("b")))
    val plan = migrationPlan(a, b)
    assert(plan.nonEmpty)
    plan.foreach { case (s, from, to) =>
      assert(a.shards(s) == from && b.shards(s) == to && from != to)
    }
    assert(migrationPlan(b, b).isEmpty)
  }
}
