package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Scene-cut detection beyond the value oracle: driver-local reference
  * parity on every fixture video and the zero-shuffle plan pin. */
class SceneCutsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("mm_scene_cuts == driver-local reference over the payload recipe") {
    val want = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .filter(r => r.getLong(0) % 3 == 2)
      .map { r =>
        val bytes = r.getString(1).getBytes("UTF-8")
        val len = bytes.length
        val stats = (0 until 16).map { i =>
          val off = math.min((len.toLong * i / 16).toInt, math.max(0, len - 1))
          (off until math.min(off + 32, len)).map(j => (bytes(j) & 0xff).toLong).sum
        }
        val deltas = stats.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.toSeq
        val cuts = deltas.zipWithIndex.collect {
          case (d, i) if 2L * deltas.length * d >= 3L * deltas.sum && d > 0 => i + 1
        }
        (r.getLong(0), (16, deltas.sum, deltas.max, cuts.length.toLong, cuts.mkString(",")))
      }.filter(_ => true).toMap
    val got = Multimodal.mmSceneCuts(spark, sf).collect()
      .map(r => (r.getLong(0),
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(got == want, {
      val bad = got.collect { case (id, v) if want.get(id).exists(_ != v) => (id, v, want(id)) }
      s"diff (first 3): ${bad.take(3)}; extra=${(got.keySet -- want.keySet).take(3)} " +
        s"missing=${(want.keySet -- got.keySet).take(3)}"
    })
    assert(got.values.exists(_._4 > 0), "no video has any cut — degenerate threshold")
    assert(got.values.forall { case (_, _, _, nc, cf) =>
      (nc == 0) == cf.isEmpty && (cf.isEmpty ||
        cf.split(",").forall(s => s.toInt >= 1 && s.toInt <= 15))
    }, "cut frame indices out of the 1..15 delta range")
  }

  test("plan: scene-cut detection is map-only — no required exchange") {
    // the one allowed Exchange is Tables.spreadSmall's explicit gated
    // repartition (REPARTITION_BY_NUM, fires only on tiny inputs so the
    // decode pass parallelizes); the operator itself must never DEMAND a
    // shuffle — an ENSURE_REQUIREMENTS exchange would mean a join/agg
    // sneaked into the map-only pipeline
    val plan = Multimodal.mmSceneCuts(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("ENSURE_REQUIREMENTS"),
      s"scene cuts should never demand a shuffle:\n${plan.take(1200)}")
    assert("Exchange".r.findAllIn(plan).size <= 1,
      s"at most the spreadSmall repartition is allowed:\n${plan.take(1200)}")
  }
}
