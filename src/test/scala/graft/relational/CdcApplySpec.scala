package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Structural contracts of the CDC MERGE-apply beyond the value oracle:
  * tombstones really suppress keys, the log depth is conserved, and the
  * snapshot row is the true last writer per key (driver-local replay on the
  * tiny fixture). */
class CdcApplySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("q_cdc_apply: last-writer-wins snapshot == driver-local log replay") {
    val snap = RelationalQueries.qCdcApply(spark, sf).collect()
      .map(r => r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getLong(2), r.getLong(3)))).toMap
    val log = Tables.events(spark, sf)
      .select(col("user_id"), Tables.eventMs.as("ms"), col("event_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val byUser = log.groupBy(_._1)
    val expect = byUser.flatMap { case (u, rows) =>
      val last = rows.maxBy(r => (r._2, r._3))
      if (last._4 == "error") None // tombstone: key vanishes
      else Some(u -> ((last._5, last._2, rows.length.toLong)))
    }
    assert(snap == expect, "snapshot disagrees with the replayed log")
    // non-degenerate: the fixture must actually exercise tombstones
    assert(byUser.size > snap.size, "no user ends on a delete — spec is vacuous")
    // conservation: every log row is counted exactly once by its key
    assert(snap.values.map(_._3).sum ==
      byUser.filter { case (u, _) => snap.contains(u) }.values.map(_.length.toLong).sum)
  }
}
