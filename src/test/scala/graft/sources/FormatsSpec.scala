package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Format-ingest contracts beyond the value oracle: PERMISSIVE CSV
  * semantics on the planted dirt, and the ORC path really being ORC. */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("dirty CSV: corrupt rows counted by the plant rule, clean fields still parse") {
    val src = graft.Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"),
        col("c_acctbal").cast("decimal(18,2)").as("bal"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
    val want = src.groupBy(_._2).map { case (nat, rs) =>
      val corrupt = rs.count(_._1 % 17 == 3)
      (nat, (rs.length.toLong, corrupt.toLong,
        rs.filter(_._1 % 17 != 3).map(r => BigDecimal(r._3)).sum.toDouble))
    }
    val got = Formats.csvDirty(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (nat, (n, c, bal)) =>
      val (gn, gc, gb) = got(nat)
      assert(gn == n && gc == c, s"nation $nat row/corrupt counts diverge")
      assert(gb == bal, s"nation $nat clean balance $gb != $bal")
    }
    assert(got.values.map(_._2).sum > 0, "no corrupt row planted — degenerate fixture")
    assert(got.values.forall { case (n, c, _) => c < n }, "a nation entirely corrupt")
  }

  test("ORC roundtrip: the aggregate really reads ORC and equals the parquet source") {
    val df = Formats.orcRoundtrip(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("orc"), s"scan is not ORC:\n${plan.take(800)}")
    val got = df.collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    val want = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("q"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("p"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got == want, "ORC roundtrip not value-lossless")
  }

  test("k-anonymity audit == driver-local reference; shifted band covers negatives") {
    val src = graft.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(src.exists(_._3 < 0), "no negative balance — the shift case is untested")
    val want = src.groupBy { case (nat, seg, cents) => (nat, seg, (cents + 100000L) / 100000L) }
      .collect { case (k2, rs) if rs.length < 5 => (k2, rs.length.toLong) }
    val got = graft.relational.RelationalQueries.qKanonAudit(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getString(1), r.getLong(2)), r.getLong(3))).toMap
    assert(got == want.toMap, {
      s"extra=${(got.keySet -- want.keySet).take(3)} missing=${(want.keySet -- got.keySet).take(3)}"
    })
    assert(got.nonEmpty && got.values.forall(_ < 5))
  }
}
