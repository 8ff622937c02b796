package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Structural contract of the SCD2 history build, beyond the value oracle:
  * per user the intervals tile the timeline (contiguous, non-overlapping,
  * sentinel-closed), versions are dense from 1, and consecutive intervals
  * genuinely CHANGE state (no repeat collapse misses). */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("ev_scd2 intervals tile each user's timeline with dense versions") {
    val byUser = RelationalQueries.evScd2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (user, rows) =>
      val iv = rows.sortBy(_._2)
      assert(iv.map(_._2).toSeq == (1 to iv.length).toSeq, s"user $user versions not dense")
      iv.foreach { case (_, _, _, from, to) =>
        assert(from < to, s"user $user has an empty/inverted interval")
      }
      iv.sliding(2).foreach {
        case Array((_, _, t1, _, to1), (_, _, t2, from2, _)) =>
          assert(to1 == from2, s"user $user timeline has a gap/overlap")
          assert(t1 != t2, s"user $user kept a non-change (repeat not collapsed)")
        case _ => ()
      }
      assert(iv.last._5 == 253402300800000L, s"user $user last interval not sentinel-closed")
    }
  }

  test("q_incremental_agg merge == one-pass recompute, bit-exact") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
    val one = lit(1).cast(DecimalType(18, 2))
    val direct = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .cast("double").as("sum_revenue"),
        count(lit(1)).as("count_order"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getLong(4))).toSet
    val merged = RelationalQueries.qIncrementalAgg(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getLong(4))).toSet
    assert(merged == direct, "partial-merge drifted from the one-pass truth")
  }
}
