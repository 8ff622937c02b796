package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

import graft.SparkTestSession
import graft.text.TextAnalysis

/** The Misra-Gries contract, both as local merge algebra (adversarial random
  * streams, every partition/merge shape) and through the real Spark typed
  * aggregation inside [[TextAnalysis.heavyHitters]].
  *
  * The load-bearing property is the SUPERSET guarantee: per-item undercount
  * is at most n/(capacity+1) across any merge tree (Agarwal et al., PODS
  * 2012), so any item with true count > n/(capacity+1) still has a positive
  * counter — heavyHitters' exact second pass then cannot miss a qualifying
  * word. The dual (counters never OVERcount) is what bounds the candidate
  * set's garbage: a counter is only ever incremented by true arrivals.
  */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("bounded size, no overcount, and the n/(k+1) superset guarantee " +
    "across random streams, capacities, and partition splits") {
    val rnd = new Random(20260814L)
    for (_ <- 1 to 25) {
      val k = 1 + rnd.nextInt(24)
      val mg = new MisraGries(k)
      val n = 500 + rnd.nextInt(3000)
      // Zipf-ish: sqrt of a uniform draw concentrates mass on low ids, so
      // some items cross the n/(k+1) floor and many sit just under it.
      val stream = Seq.fill(n)("w" + math.sqrt(rnd.nextInt(2500)).toInt)
      val exact = stream.groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }
      // split into p partition slices, reduce each, merge in random order —
      // the shapes Spark's partial aggregation actually produces
      val p = 1 + rnd.nextInt(6)
      val bufs = stream.grouped(math.max(1, n / p))
        .map(sl => sl.foldLeft(mg.zero)(mg.reduce)).toSeq
      val merged = rnd.shuffle(bufs).reduce(mg.merge)
      val out = mg.finish(merged)
      assert(out.size <= k, s"k=$k size=${out.size}")
      out.foreach { case (w, c) =>
        assert(c <= exact(w), s"overcount: $w sketch=$c exact=${exact(w)}")
      }
      val floor = n.toDouble / (k + 1)
      exact.foreach { case (w, c) =>
        if (c > floor)
          assert(out.contains(w), s"lost heavy hitter $w (count $c > floor $floor, k=$k, p=$p)")
      }
    }
  }

  test("heavyHitters == exact GROUP BY heavy hitters on the fixture, " +
    "insensitive to shuffle partitioning, candidate set driver-bounded") {
    import org.apache.spark.sql.functions._
    val got = TextAnalysis.heavyHitters(spark, sf, capacity = 200, denom = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty, "degenerate fixture: no 1% heavy hitters at all")
    assert(got.size <= 200, "output exceeds the sketch capacity bound")
    val toks = graft.Tables.documents(spark, sf)
      .select(explode(TextAnalysis.tokensCol(col("text"))).as("word"))
    val total = toks.count()
    val exact = toks.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 100L >= total)
      .collect().map(r => (r.getString(0), r.getLong(1), total)).toSet
    assert(got == exact)
    // the sketch pass must not depend on data placement: same answer when
    // the aggregation runs at a different parallelism
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val got7 = TextAnalysis.heavyHitters(spark, sf, capacity = 200, denom = 100L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got7 == exact)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
