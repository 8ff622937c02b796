package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Losslessness of windowCooc's fused map-only pair generation: it must
  * emit exactly the pair multiset of the naive positional self-join (the
  * oracle's shape), and PMI must respect its own formula. */
class WindowCoocSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("fused pair generation == positional self-join, PMI self-consistent") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.tokensCol(lower(col("text"))).as("t"))
    val tok = docs.select(col("doc_id"), posexplode(col("t")))
      .select(col("doc_id"), col("pos").as("i"), col("col").as("tok"))
    val naive = tok.as("a").join(tok.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
        col("b.i") > col("a.i") && col("b.i") <= col("a.i") + 3 &&
        col("a.tok") =!= col("b.tok"))
      .select(least(col("a.tok"), col("b.tok")).as("w1"),
        greatest(col("a.tok"), col("b.tok")).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 5)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val got = TextAnalysis.windowCooc(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(t => ((t._1, t._2), t._3)).toMap == naive,
      "fused pair counts drifted from the positional self-join")
    // PMI formula check against independently-computed marginals
    val nTok = tok.count()
    val cx = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    got.foreach { case (w1, w2, cxy, pmi) =>
      val want = BigDecimal(math.log(cxy.toDouble * nTok / (cx(w1).toDouble * cx(w2))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(pmi - want) < 1e-9, s"($w1,$w2) pmi $pmi != $want")
    }
  }
}
