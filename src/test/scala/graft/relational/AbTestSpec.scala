package graft.relational

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** A/B readout beyond the value oracle: driver-local reference parity —
  * the z-statistic must equal the closed form computed from the exact
  * per-arm counts, and the split must be the documented hash fate. */
class AbTestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("ev_ab_test == closed form over the hash-fate split") {
    val users = graft.Tables.events(spark, sf)
      .select(col("user_id"),
        (col("event_type") === "purchase" && col("value") > 100).cast("int").as("p"))
      .groupBy(col("user_id")).agg(max(col("p")).as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val byArm = users.groupBy { case (u, _) =>
      graft.functions.Fnv32.hash(s"$u:ab") % 2
    }
    val (na, ca) = (byArm(0).length.toLong, byArm(0).map(_._2.toLong).sum)
    val (nb, cb) = (byArm(1).length.toLong, byArm(1).map(_._2.toLong).sum)
    val (ra, rb) = (ca.toDouble / na.toDouble, cb.toDouble / nb.toDouble)
    val pp = (ca + cb).toDouble / (na + nb).toDouble
    val z = (ra - rb) / math.sqrt((pp * (1.0 - pp)) * (1.0 / na.toDouble + 1.0 / nb.toDouble))
    val row = RelationalQueries.evAbTest(spark, sf).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((na, nb, ca, cb)), "arm counts diverge from the hash-fate reference")
    assert(row.getDouble(4) == ra && row.getDouble(5) == rb)
    assert(row.getDouble(6) == z, s"z ${row.getDouble(6)} != closed form $z")
    assert(row.getBoolean(7) == (math.abs(z) > 1.96))
    // a degenerate split (one empty arm) would make the whole readout vacuous
    assert(na > 0 && nb > 0 && math.min(na, nb).toDouble / (na + nb) > 0.3,
      s"hash split badly skewed: $na vs $nb")
  }
}
