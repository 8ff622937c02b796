package graft.relational

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Structural contracts of touch attribution beyond the value oracle:
  * causality (the credited click precedes its purchase), lookback honesty,
  * and first-touch ≤ last-touch ordering. */
class AttributionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("ev_attribution: credited click precedes the purchase; lookback honest") {
    val rows = RelationalQueries.evAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val attributed = r.getBoolean(7)
      if (r.isNullAt(4)) { // never clicked before this purchase
        assert(!attributed && r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(8))
      } else {
        assert(r.getLong(5) <= r.getLong(2), s"credited click is in the future: $r")
        assert(r.getLong(6) == r.getLong(2) - r.getLong(5))
        assert(attributed == (r.getLong(6) <= 7L * 24 * 3600 * 1000))
        // the first touch can never be later than the last touch
        assert(!r.isNullAt(8))
      }
    }
    // non-degenerate fixture: all three outcomes occur
    assert(rows.exists(_.getBoolean(7)), "no attributed purchase")
    assert(rows.exists(r => !r.isNullAt(4) && !r.getBoolean(7)),
      "no out-of-lookback purchase — lookback untested")
    assert(rows.exists(_.isNullAt(4)), "every purchase has a prior click — null path untested")
  }
}
