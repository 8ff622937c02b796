package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Feature hashing beyond the value oracle: driver-local reference parity
  * on every fixture doc (including the all-zero-vector degenerate
  * contract) and the zero-exchange plan pin the scaladoc claims. */
class FeatureHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf
  val dims = 16

  test("text_feature_hash == driver-local reference over FNV buckets") {
    val want = graft.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
        val vec = new Array[Long](dims)
        toks.foreach(t => vec(graft.functions.Fnv32.hash(t) % dims) += 1)
        val top = vec.max
        (r.getLong(0), (toks.length.toLong, vec.count(_ > 0),
          vec.map(x => x * x).sum, vec.indexOf(top), top))
      }.toMap
    val got = TextAnalysis.featureHash(spark, sf, dims).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getInt(2), r.getLong(3), r.getInt(4), r.getLong(5)))).toMap
    assert(got == want, {
      val bad = got.collect { case (id, v) if want(id) != v => (id, v, want(id)) }.take(3)
      s"diff: $bad"
    })
    assert(got.values.exists(_._2 > 1), "no doc spreads over 2+ dims — degenerate")
  }

  test("plan: featurization is map-only — zero exchanges at any corpus size") {
    val plan = TextAnalysis.featureHash(spark, sf, dims)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"feature hashing should never shuffle:\n${plan.take(1200)}")
  }
}
