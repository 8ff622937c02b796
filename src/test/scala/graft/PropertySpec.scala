package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.kv.{Op, OpLog}
import graft.shard.{ShardConfig, Sharding}

/** Property-based invariants (SURVEY §5 plan): random shardmaster op
  * sequences hold the balance invariant; random op logs fold identically to
  * an in-memory reference regardless of Spark partitioning.
  * (Raw ScalaCheck generators, deterministically seeded — the scalatestplus
  * bridge isn't in the offline dependency cache.) */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Deterministic sample stream from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, Seed(42L + i)))
  }

  private def forAll[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    samples(g, n).foreach(body)

  // ------------------------------------------------ shard balance (A6)

  sealed trait CfgOp
  final case class DoJoin(gids: Seq[Int]) extends CfgOp
  final case class DoLeave(k: Int) extends CfgOp
  final case class DoMove(shard: Int, pick: Int) extends CfgOp

  private val genOp: Gen[CfgOp] = Gen.frequency(
    5 -> Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 40)).map(g => DoJoin(g.distinct))),
    3 -> Gen.chooseNum(0, 5).map(DoLeave(_)),
    2 -> Gen.zip(Gen.chooseNum(0, Sharding.NShards - 1), Gen.chooseNum(0, 100))
      .map { case (s, p) => DoMove(s, p) })

  private def applyOp(c: ShardConfig, op: CfgOp): ShardConfig = op match {
    case DoJoin(gids) =>
      val fresh = gids.filterNot(c.groups.contains)
      if (fresh.isEmpty) c
      else Sharding.join(c, fresh.map(g => g -> Seq(s"srv$g")).toMap)
    case DoLeave(k) =>
      val live = c.groups.keys.toSeq.sorted
      if (live.isEmpty) c else Sharding.leave(c, Seq(live(k % live.size)))
    case DoMove(shard, pick) =>
      val live = c.groups.keys.toSeq.sorted
      if (live.isEmpty) c else Sharding.move(c, shard, live(pick % live.size))
  }

  test("shard balance invariant holds after every random Join/Leave/Move sequence") {
    forAll(Gen.listOfN(12, genOp), 50) { ops =>
      var c = Sharding.initial
      ops.foreach { op =>
        val before = c.groups.keySet
        c = applyOp(c, op)
        // every shard on a live group (or 0 when no groups at all)
        if (c.groups.isEmpty) assert(c.shards.forall(_ == 0))
        else assert(c.shards.forall(c.groups.contains))
        // balance is re-established exactly when membership changes (a real
        // Join/Leave); an explicit Move — and a no-op join of an existing
        // gid — leaves placement alone until then, like the reference
        if (c.groups.keySet != before && c.groups.nonEmpty) {
          val counts = c.groups.keys.map(g => c.shards.count(_ == g))
          assert(counts.max - counts.min <= 1,
            s"unbalanced after $op: shards=${c.shards} groups=${c.groups.keySet}")
        }
      }
    }
  }

  // ------------------------------------------------ op-log fold (A5, K3)

  /** (cli, seq) identifies ONE client request in the protocol
    * (/root/reference/src/kvraft/common.go), so op/key/value derive
    * deterministically from it — a repeated (cli, seq) in the log is then a
    * true retransmission, which dedup must fold exactly once. */
  private def reqOf(cli: Int, seq: Int): (String, String, String) = {
    val h = cli * 31 + seq
    (Seq("put", "append", "get")(h % 3), Seq("a", "b", "c")(h / 3 % 3), s"v$cli-$seq.")
  }

  /** Protocol-conformant random logs: each client's fresh requests carry
    * monotonically increasing seq (clients send request n only after n-1 —
    * /root/reference/src/kvraft/client.go), and retries are RETRANSMISSIONS
    * of earlier ops, possibly arriving arbitrarily late. Outside this
    * protocol a global per-client mark and a per-key mark can disagree;
    * inside it they cannot, which is what lets the distributed fold keep
    * its duplicate table partition-local. */
  private val genOps: Gen[List[(Int, Int)]] = for {
    clis <- Gen.listOf(Gen.chooseNum(0, 3))
    picks <- Gen.listOfN(math.min(clis.length, 8),
      Gen.chooseNum(0, math.max(0, clis.length - 1)))
  } yield {
    val next = Array.fill(4)(0)
    val base = clis.map { c => val s = next(c); next(c) += 1; (c, s) }
    if (base.isEmpty) base else base ++ picks.distinct.sorted.map(base(_))
  }

  test("OpLog.materialize equals in-memory reference fold on random logs") {
    import spark.implicits._
    forAll(genOps, 20) { raw =>
      // ts = position; the appended picks are late retransmissions
      val ops = raw.zipWithIndex.map { case ((cli, seq), i) =>
        val (op, k, v) = reqOf(cli, seq)
        Op(i.toLong, cli.toLong, seq.toLong, op, k, v)
      }
      val expected = {
        // per-client high-water dedup — the kvraft duplicate table: clients
        // issue seq monotonically, so an op at or below the mark is a stale
        // retransmission (matches OpLog.foldSorted and the streaming twin).
        // NOTE the mark is global per client, not per (client, key)
        val maxSeq = scala.collection.mutable.Map.empty[Long, Long]
        val state = scala.collection.mutable.Map.empty[String, String].withDefaultValue("")
        ops.sortBy(o => (o.ts, o.clientId, o.seq)).foreach { o =>
          if (maxSeq.getOrElse(o.clientId, Long.MinValue) < o.seq) {
            maxSeq(o.clientId) = o.seq
            o.op match {
              case "put"    => state(o.key) = o.value
              case "append" => state(o.key) = state(o.key) + o.value
              case _        => ()
            }
          }
        }
        // one row per key referenced in the log; get-only keys read as ""
        ops.map(_.key).distinct.map(k => k -> state(k)).toMap
      }
      val got = OpLog.materialize(spark.createDataset(ops).repartition(4))
        .collect().map(s => s.key -> s.value).toMap
      assert(got == expected)
    }
  }

  // ------------------------------------- streaming cap winner-set algebra

  test("cap mergeWinners: batch-split/order/replay invariant, always bounded") {
    import graft.streaming.CapStream.mergeWinners
    val genDocs: Gen[(List[(Int, Long)], Int, Long)] = for {
      n <- Gen.chooseNum(0, 60)
      docs <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, 1 << 20), Gen.chooseNum(0L, 500L)))
      k <- Gen.chooseNum(1, 12)
      seed <- Gen.chooseNum(0L, 1000L)
    } yield (docs, k, seed)
    forAll(genDocs, 200) { case (docs, k, seed) =>
      val truth = docs.distinct.sortBy { case (h, id) => (-h, id) }.take(k)
      // one-shot fold equals the truth
      assert(mergeWinners(Seq.empty, docs.iterator, k) == truth)
      // ANY split into micro-batches folds to the same winners
      val rnd = new scala.util.Random(seed)
      val batches = docs.grouped(math.max(1, rnd.nextInt(7) + 1)).toSeq
      val folded = batches.foldLeft(Seq.empty[(Int, Long)]) { (st, b) =>
        mergeWinners(st, b.iterator, k)
      }
      assert(folded == truth, s"split-invariance broke for k=$k")
      // arrival order within the stream is irrelevant
      val shuffled = rnd.shuffle(docs)
      assert(mergeWinners(Seq.empty, shuffled.iterator, k) == truth)
      // replaying an arbitrary batch is idempotent (at-least-once upstream)
      val replayed = batches.headOption.fold(folded)(b => mergeWinners(folded, b.iterator, k))
      assert(replayed == truth)
      // state is never larger than the cap
      assert(folded.size <= k)
    }
  }

  // ------------------------------------- blocklist scrub algebra

  test("blocklist: conservation + idempotence for random lists over the fixture vocabulary") {
    val vocabulary = Seq("table", "scan", "slow", "fast", "query", "spark",
      "value", "key", "the", "a")
    val genList: Gen[Seq[String]] =
      Gen.chooseNum(1, 4).flatMap(n => Gen.pick(n, vocabulary)).map(_.toSeq)
    forAll(genList, 4) { blocked =>
      val rows = graft.text.TextAnalysis.blocklist(spark, SparkTestSession.sf, blocked)
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (n, nb, scrubbed) = (r.getLong(1), r.getLong(2), r.getString(5))
        val scrubbedToks = scrubbed.split(" ").filter(_.nonEmpty)
        // conservation: removed + kept == total, and no blocked token survives
        assert(nb + scrubbedToks.length == n)
        assert(!scrubbedToks.exists(blocked.contains), s"blocked token survived: $scrubbed")
        // idempotence: scrubbing the scrubbed text again removes nothing
        assert(!blocked.exists(b => scrubbedToks.contains(b)))
      }
    }
  }

  // ------------------------------------- temperature mixing algebra

  test("temperature mixing: τ=1 is the identity; smaller τ flattens harder") {
    def sharesAt(tau: Double): Map[String, (Double, Double)] =
      graft.sample.Sampling.temperatureMixture(spark, SparkTestSession.sf, tau = tau)
        .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val id = sharesAt(1.0)
    // τ=1: pow is exact on the integer counts — temp share == raw share
    id.foreach { case (s, (raw, temp)) => assert(raw == temp, s"$s at τ=1: $raw != $temp") }
    // flattening is monotone in τ: the max share shrinks as τ drops
    val maxShares = Seq(1.0, 0.7, 0.4, 0.1).map(t => sharesAt(t).values.map(_._2).max)
    assert(maxShares == maxShares.sorted.reverse, s"max shares not monotone: $maxShares")
    // and every distribution still sums to ~1 (6-decimal rounding slack)
    Seq(0.1, 0.4, 0.7).foreach { t =>
      val sum = sharesAt(t).values.map(_._2).sum
      assert(math.abs(sum - 1.0) < 2e-5, s"τ=$t shares sum $sum")
    }
  }
}
