package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.SparkTestSession

class AsOfJoinSpec extends AnyFunSuite {

  private def withExtSession[A](f: SparkSession => A): A = {
    val shared = SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try f(SparkSession.builder().withExtensions(new graft.GraftExtensions).getOrCreate())
    finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("AsOf.join matches latest right row at-or-before left time; null when none") {
    withExtSession { spark =>
      import spark.implicits._
      val trades = Seq(("a", 10L, "L1"), ("a", 20L, "L2"), ("b", 5L, "L3"))
        .toDF("sym", "t_trade", "trade_id")
      val quotes = Seq(("a", 9L, "R1"), ("a", 15L, "R2"), ("a", 20L, "R3"), ("c", 1L, "R4"))
        .toDF("qsym", "t_quote", "quote_id")
      val out = AsOf.join(trades, quotes, "sym" -> "qsym", "t_trade" -> "t_quote")
        .select("trade_id", "quote_id").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(out == Map("L1" -> Some("R1"), "L2" -> Some("R3"), "L3" -> None))
    }
  }

  test("AsOf.join equals brute-force per-row scan on random data") {
    withExtSession { spark =>
      import spark.implicits._
      val rnd = new scala.util.Random(7)
      val left = Seq.fill(150)((rnd.nextInt(5).toString, rnd.nextInt(1000).toLong, rnd.nextInt(1 << 20)))
      val right = Seq.fill(150)((rnd.nextInt(5).toString, rnd.nextInt(1000).toLong, rnd.nextInt(1 << 20)))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // distinct (key,time): ties are unspecified
      val ldf = left.toDF("k", "t", "lv")
      val rdf = right.toDF("rk", "rt", "rv")
      val got = AsOf.join(ldf, rdf, "k" -> "rk", "t" -> "rt")
        .select("k", "t", "lv", "rv").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2)) -> Option(r.get(3))).toMap
      val want = left.map { case (k, t, lv) =>
        val m = right.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption
        (k, t, lv) -> m.map(_._3)
      }.toMap
      assert(got == want)
    }
  }

  test("AsOf.join breaks same-(key,time) right ties by greatest right tuple") {
    withExtSession { spark =>
      import spark.implicits._
      val trades = Seq(("a", 10L, "L1"), ("a", 30L, "L2")).toDF("sym", "t_trade", "trade_id")
      // three quotes at the same instant for the same key, shuffled across
      // partitions: the greatest right tuple (here, max quote_id since the
      // earlier struct fields are tied) must win on every run
      val quotes = Seq(("a", 10L, "R5"), ("a", 10L, "R9"), ("a", 10L, "R1"), ("a", 25L, "R2"))
        .toDF("qsym", "t_quote", "quote_id")
      for (nPart <- Seq(1, 3, 7)) {
        val out = AsOf.join(trades, quotes.repartition(nPart), "sym" -> "qsym", "t_trade" -> "t_quote")
          .select("trade_id", "quote_id").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        assert(out == Map("L1" -> "R9", "L2" -> "R2"), s"nPart=$nPart")
      }
    }
  }

  test("AsOf.join plans exactly one exchange (linear, not a range join)") {
    withExtSession { spark =>
      import spark.implicits._
      val ldf = Seq(("a", 1L, "x")).toDF("k", "t", "lv")
      val rdf = Seq(("a", 1L, "y")).toDF("rk", "rt", "rv")
      val df = AsOf.join(ldf, rdf, "k" -> "rk", "t" -> "rt")
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert("ShuffleQueryStage".r.findAllIn(plan).size == 1, plan)
    }
  }

  test("operators stacked on top of AsOf.join keep resolving (exprId remap)") {
    withExtSession { spark =>
      import spark.implicits._
      val ldf = Seq(("a", 10L, 5), ("a", 20L, 7)).toDF("k", "t", "lv")
      val rdf = Seq(("a", 9L, 100)).toDF("rk", "rt", "rv")
      val out = AsOf.join(ldf, rdf, "k" -> "rk", "t" -> "rt")
        .filter($"lv" > 6).groupBy($"rk").sum("rv")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == Map("a" -> 100L))
    }
  }
}
