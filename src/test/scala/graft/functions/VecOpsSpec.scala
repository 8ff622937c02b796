package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class VecOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def cos(a: Seq[Double], b: Seq[Double]): Option[Double] = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(VecOps.cosine6Col(col("a"), col("b")).as("c"))
      .collect().headOption.map(_.getDouble(0))
  }

  test("cosine6 equals the typed cosine6 surface on known vectors") {
    assert(cos(Seq(1.0, 0.0), Seq(1.0, 0.0)).contains(1.0))
    assert(cos(Seq(1.0, 0.0), Seq(0.0, 1.0)).contains(0.0))
    assert(cos(Seq(1.0, 2.0, 3.0), Seq(3.0, 2.0, 1.0)).contains(
      BigDecimal(10.0 / 14.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("zero-norm input yields 0.0 (the Similarity.cosine6 contract), never NaN/throw") {
    assert(cos(Seq(0.0, 0.0), Seq(1.0, 2.0)).contains(0.0))
    assert(cos(Seq(0.0, 0.0), Seq(0.0, 0.0)).contains(0.0))
    assert(cos(Seq.empty, Seq.empty).contains(0.0))
  }

  test("length mismatch fails with a descriptive error, not a silent truncation") {
    val e = intercept[Exception] { cos(Seq(1.0, 2.0), Seq(1.0)) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("lengths differ")), e.toString)
  }

  test("graft_cosine6 is registered via the session extensions") {
    val r = spark.sql("SELECT graft_cosine6(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect()(0).getDouble(0)
    assert(r == 1.0)
  }
}
