package graft.shard

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

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

  test("migrateTable moves shard data between gid partitions; unaffected files untouched (K7)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("shardstate").toString + "/state"

    // configs: {1,2} -> join(3): shards move from 1 and 2 onto 3; some
    // shards of both 1 and 2 stay put
    val from = join(join(initial, Map(1 -> Seq("a"))), Map(2 -> Seq("b")))
    val to = join(from, Map(3 -> Seq("c")))
    val plan = migrationPlan(from, to)
    assert(plan.nonEmpty && plan.forall(_._3 == 3))

    // keyed rows over every shard: key "<d>k<i>" -> shard = first byte % 10
    val rows = for (d <- 0 to 9; i <- 0 until 5) yield {
      val key = s"${d}k$i"
      (key, s"v$d-$i", key2shard(key))
    }
    val state = rows.toDF("key", "value", "shard")
      .withColumn("gid", gidCol(from, col("shard")))
    state.write.partitionBy("gid").parquet(path)

    def files(gid: Int): Map[String, Long] = {
      val dir = new java.io.File(path, s"gid=$gid")
      if (!dir.exists()) Map.empty
      else dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before1 = files(1)
    val before2 = files(2)
    assert(before1.nonEmpty && before2.nonEmpty)

    migrateTable(spark, path, from, to)

    val after = spark.read.parquet(path).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("value"),
        r.getAs[Int]("shard"), r.getAs[Int]("gid")))
    // complete: every row survived, values intact
    assert(after.length == rows.length)
    assert(after.map(t => (t._1, t._2)).toSet == rows.map(t => (t._1, t._2)).toSet)
    // correct: every row sits at its new config's gid
    after.foreach { case (key, _, shard, gid) =>
      assert(gid == to.shards(shard), s"key $key shard $shard at gid $gid, want ${to.shards(shard)}")
    }
    // moved shards landed in gid=3's partition directory
    assert(files(3).nonEmpty)
    // both source gids still own shards after the change -> their partition
    // dirs were rewritten in place (affected), but no rows were lost above;
    // a gid that owned NOTHING would have been GC'd:
    val gone = leave(to, Seq(1, 2))
    migrateTable(spark, path, to, gone)
    assert(files(1).isEmpty && files(2).isEmpty, "emptied gid partitions must be GC'd")
    val after2 = spark.read.parquet(path).collect()
    assert(after2.length == rows.length)
  }

  test("migrateTable leaves unaffected gid partitions physically untouched") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("shardstate2").toString + "/state"
    // three groups; then MOVE one shard of gid 1 to gid 2: gid 3 is not in
    // the plan at all and its files must not be rewritten
    val base = join(join(join(initial, Map(1 -> Seq("a"))), Map(2 -> Seq("b"))), Map(3 -> Seq("c")))
    val shardOf1 = base.shards.indexOf(1)
    val moved = move(base, shardOf1, 2)

    val rows = for (d <- 0 to 9; i <- 0 until 3) yield {
      val key = s"${d}x$i"
      (key, s"w$d-$i", key2shard(key))
    }
    rows.toDF("key", "value", "shard")
      .withColumn("gid", gidCol(base, col("shard")))
      .write.partitionBy("gid").parquet(path)

    def listing(gid: Int): Set[(String, Long, Long)] = {
      val dir = new java.io.File(path, s"gid=$gid")
      if (!dir.exists()) Set.empty
      else dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length(), f.lastModified())).toSet
    }
    val gid3Before = listing(3)
    assert(gid3Before.nonEmpty)
    migrateTable(spark, path, base, moved)
    // unaffected gid: same file names, sizes, mtimes — served throughout
    assert(listing(3) == gid3Before)
    // the moved shard's rows now read back under gid 2
    val got = spark.read.parquet(path).filter(col("shard") === shardOf1)
      .select("gid").distinct().collect().map(_.getInt(0)).toSeq
    assert(got == Seq(2))
  }

  test("migrateTable GCs an affected gid emptied of rows even if it still owns shards") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("shardstate3").toString + "/state"
    // gid 1 owns shards {0,1}; gid 2 owns the rest. Data exists only in
    // shard 0 (for gid 1) and shard 2 (for gid 2). Moving shard 0 to gid 2
    // leaves gid 1 still OWNING shard 1 but holding ZERO rows: dynamic
    // overwrite writes no gid=1 partition, and ownership-keyed GC would
    // skip it — the moved rows would read back under BOTH gids.
    val from = ShardConfig(1, Vector(1, 1, 2, 2, 2, 2, 2, 2, 2, 2),
      Map(1 -> Seq("a"), 2 -> Seq("b")))
    val to = move(from, 0, 2)

    def keyFor(shard: Int, i: Int): String = {
      val c = (('A' to 'z') ++ ('0' to '9')).find(ch => ch.toInt % 10 == shard).get
      s"$c-$i"
    }
    val rows = (0 until 4).flatMap(i => Seq(
      (keyFor(0, i), s"a$i", 0), (keyFor(2, i), s"b$i", 2)))
    rows.toDF("key", "value", "shard")
      .withColumn("gid", gidCol(from, col("shard")))
      .write.partitionBy("gid").parquet(path)
    assert(new java.io.File(path, "gid=1").exists())

    migrateTable(spark, path, from, to)

    // no duplicates: exactly the original rows, all under gid 2
    val after = spark.read.parquet(path).collect()
    assert(after.length == rows.length,
      s"expected ${rows.length} rows, got ${after.length} (stale gid=1 partition left behind?)")
    assert(after.forall(_.getAs[Int]("gid") == 2))
    assert(!new java.io.File(path, "gid=1").exists(), "emptied affected gid dir must be GC'd")
  }

  test("migrateTable does not leak partitionOverwriteMode into the session") {
    val spark = graft.SparkTestSession.spark
    val prior = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    assert(prior.equalsIgnoreCase("static"),
      s"precondition: session default should be static, was $prior")
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("shardstate4").toString + "/state"
    val from = join(join(initial, Map(1 -> Seq("a"))), Map(2 -> Seq("b")))
    val to = join(from, Map(3 -> Seq("c")))
    val rows = for (d <- 0 to 9) yield (s"${d}z", s"v$d", key2shard(s"${d}z"))
    rows.toDF("key", "value", "shard")
      .withColumn("gid", gidCol(from, col("shard")))
      .write.partitionBy("gid").parquet(path)
    migrateTable(spark, path, from, to)
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode").equalsIgnoreCase(prior),
      "migrateTable must not mutate session partitionOverwriteMode")
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
