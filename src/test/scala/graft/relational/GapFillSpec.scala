package graft.relational

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Structural contracts of the new event-analytics queries, beyond the value
  * oracle: the gap-fill spine really is dense and the LOCF/filled semantics
  * are internally consistent; the JSON extraction and outlier counters
  * respect their conservation bounds. */
class GapFillSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("ev_gap_fill: dense hourly spine per type, filled <=> empty hour, " +
    "LOCF null only before the first observation") {
    val rows = RelationalQueries.evGapFill(spark, sf)
      .orderBy(col("event_type"), col("hour_ms"))
      .collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    val lo = rows.map(_.getLong(1)).min
    val hi = rows.map(_.getLong(1)).max
    val expectHours = (lo to hi by 3600000L).toSeq
    byType.foreach { case (t, rs) =>
      assert(rs.map(_.getLong(1)).toSeq == expectHours,
        s"type $t spine is not the dense global [lo, hi] hour grid")
      var seen = false
      rs.foreach { r =>
        val n = r.getLong(2); val filled = r.getBoolean(3)
        assert(filled == (n == 0L), s"filled flag disagrees with n_events at $r")
        if (!filled) seen = true
        // LOCF: null before any observation, non-null from the first one on
        assert(r.isNullAt(4) == !seen, s"LOCF null-ness wrong at $r")
      }
    }
    // non-degenerate on the fixture: some hours are actually empty and filled
    assert(rows.exists(_.getBoolean(3)), "fixture has no gaps — spec is vacuous")
  }

  test("ev_props_extract: event conservation and NULL-counting bounds") {
    val total = graft.Tables.events(spark, sf).count()
    val rows = RelationalQueries.evPropsExtract(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == total, "n_events must partition the table")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_with_k exceeds n_events")
      assert(r.getLong(6) <= r.getLong(2), "distinct k values exceed non-null count")
    }
    // props are well-formed on the fixture: the parse must not silently lose rows
    assert(rows.map(_.getLong(2)).sum == total, "fixture props all carry k")
  }

  test("ev_anomaly: outliers are a strict minority and MAD is non-negative") {
    val rows = RelationalQueries.evAnomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) * 2 < r.getLong(1), s"majority flagged as outliers: $r")
      assert(r.getDouble(4) >= 0.0, "negative MAD")
    }
  }

  test("ev_anomaly_sketch: every envelope boolean holds (the sketch IS inside exact p45..p55)") {
    val rows = RelationalQueries.evAnomalySketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"sketch p50 outside exact envelope: $r")
      assert(r.getBoolean(5), s"sketch MAD outside exact envelope: $r")
      assert(r.getBoolean(6), s"sketch outlier count outside exact envelope: $r")
    }
  }

  test("ev_props_nested: dirty-row accounting — malformed rows keep a NULL-tag row, quoted-numeric u is NULL") {
    import org.apache.spark.sql.functions.col
    val ev = graft.Tables.events(spark, sf)
    val total = ev.count()
    val nMalformed = ev.filter(col("event_id") % 13 === 0).count()
    val nQuoted = ev.filter(col("event_id") % 13 === 1).count()
    val rows = RelationalQueries.evPropsNested(spark, sf).collect()
    // clean rows explode to 2 tags, quoted-u rows to 1, malformed to 1 NULL-tag row
    assert(rows.map(_.getLong(2)).sum == (total - nMalformed - nQuoted) * 2 + nQuoted + nMalformed)
    val nullTag = rows.filter(_.isNullAt(1))
    assert(nullTag.map(_.getLong(2)).sum == nMalformed, "NULL-tag rows must be exactly the malformed rows")
    assert(nullTag.forall(_.getLong(3) == 0), "malformed rows cannot carry a parsed u")
    // tag "a" rows are exactly the quoted-numeric rows: present, but u NULL (field-level PERMISSIVE null)
    val tagA = rows.filter(r => !r.isNullAt(1) && r.getString(1) == "a")
    assert(tagA.map(_.getLong(2)).sum == nQuoted)
    assert(tagA.forall(_.getLong(3) == 0), "quoted-numeric u must parse as NULL")
    // …but the SIBLING fields of the mismatched one still parse: m.a = 1 per row
    assert(tagA.map(_.getLong(4)).sum == nQuoted, "quoted-u rows must still parse m.a")
  }
}
