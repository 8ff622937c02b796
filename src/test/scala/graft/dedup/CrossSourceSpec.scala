package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantics pins for the cross-source overlap matrix (the value oracle is
  * the driver's DuckDB compare on gram strings — hash-vs-string count
  * parity is the decontam collision acceptance). */
class CrossSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("crossSourceOverlap equals a local string-gram reference") {
    val docs = graft.Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase
        .split("[^\\p{L}]+").filter(_.nonEmpty).toSeq))
    def shingles(tk: Seq[String]): Set[String] =
      if (tk.length < 5) Set(tk.mkString(" "))
      else tk.sliding(5).map(_.mkString(" ")).toSet
    val bySource = docs.groupBy(_._1).view
      .mapValues(_.flatMap(d => shingles(d._2)).toSet).toMap
    val sources = bySource.keys.toSeq.sorted
    val want = (for {
      i <- sources.indices; j <- (i + 1) until sources.length
      s1 = sources(i); s2 = sources(j)
      shared = (bySource(s1) & bySource(s2)).size
      if shared > 0
    } yield (s1, s2) -> (shared.toLong,
      BigDecimal(shared.toDouble / math.min(bySource(s1).size, bySource(s2).size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    val got = Dedup.crossSourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == want, {
      val onlyGot = got.keySet -- want.keySet
      val onlyWant = want.keySet -- got.keySet
      val diff = got.collect { case (k, v) if want.get(k).exists(_ != v) => (k, v, want(k)) }
      s"extra=$onlyGot missing=$onlyWant diverging=${diff.take(3)}"
    })
    assert(got.nonEmpty, "no source pair shares a 5-gram — degenerate fixture")
  }

  test("plan: gram-keyed equi-join with exchange reuse, never a product") {
    val q = Dedup.crossSourceOverlap(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"plan:\n${plan.take(1500)}")
  }
}
