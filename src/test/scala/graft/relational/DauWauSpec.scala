package graft.relational

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Activity metrics, calibration histogram, and vocab growth beyond their
  * value oracles: driver-local parity and the structural invariants each
  * readout exists to report. */
class DauWauSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("ev_dau_wau == driver-local reference; WAU >= DAU always") {
    val ud = graft.Tables.events(spark, sf)
      .select(graft.Tables.eventMs.as("ms"), col("user_id"))
      .select(expr("ms DIV 86400000").as("day"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = ud.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = byDay.map { case (d, users) =>
      val wau = (d - 6 to d).flatMap(byDay.get).flatten.toSet.size.toLong
      (d, (users.size.toLong, wau, users.size.toDouble / wau.toDouble))
    }
    val got = RelationalQueries.evDauWau(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want, {
      val bad = got.collect { case (d, v) if want.get(d).exists(_ != v) => (d, v, want(d)) }
      s"diff: ${bad.take(3)}; extra=${(got.keySet -- want.keySet).take(3)}"
    })
    assert(got.values.forall { case (dau, wau, s) => wau >= dau && s <= 1.0 && s > 0.0 })
    assert(got.values.exists { case (dau, wau, _) => wau > dau },
      "WAU never exceeds DAU — the 7-day window is vacuous on this fixture")
  }

  test("ev_dau_wau_sketch: exact twin == ev_dau_wau; HLL envelope holds at two parallelisms") {
    def run(): Map[Long, (Long, Long, Boolean, Boolean)] =
      RelationalQueries.evDauWauSketch(spark, sf).collect()
        .map(r => (r.getLong(0),
          (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    val got = run()
    val exact = RelationalQueries.evDauWau(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.view.mapValues(v => (v._1, v._2)).toMap == exact,
      "sketch twin's exact columns drifted from ev_dau_wau")
    assert(got.values.forall(v => v._3 && v._4),
      "HLL estimate outside the 5% envelope at default parallelism")
    // the registered surface (exact counts + booleans) must not depend on
    // how the per-day sketches were partitioned before the window merge
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(run() == got, "sketch readout depends on parallelism")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("sim_pair_hist: bins partition all sample pairs; mass concentrated near zero") {
    val rows = graft.sim.Similarity.pairCosineHist(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    val n = graft.Tables.embeddings(spark, sf).count().min(1000)
    assert(rows.map(_._3).sum == n * (n - 1) / 2, "histogram loses or invents pairs")
    assert(rows.forall { case (b, lo, _) => b >= 0 && b <= 19 && lo == b / 10.0 - 1.0 })
    val bulk = rows.filter(r => r._1 == 9 || r._1 == 10).map(_._3).sum
    assert(bulk * 2 > n * (n - 1) / 2,
      "random-pair bulk not centered at cosine 0 — embedding fixture changed?")
  }

  test("text_vocab_growth: monotone in both coordinates, full checkpoint == corpus") {
    val rows = graft.text.TextAnalysis.vocabGrowth(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(20, 40, 60, 80, 100))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq &&
      rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq,
      "growth curve not monotone")
    val (totalDocs, totalVocab) = {
      val docs = graft.Tables.documents(spark, sf)
        .select(col("doc_id"), graft.text.TextAnalysis.tokensCol(lower(col("text"))).as("tk"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
      (docs.count(_._2 != null).toLong, docs.flatMap(_._2).distinct.length.toLong)
    }
    assert(rows.last._2 == totalDocs && rows.last._3 == totalVocab,
      "100% checkpoint != the whole corpus")
  }
}
