package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SortedConcatSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("graft_sorted_concat from SQL equals declarative sort_array+concat_ws") {
    import spark.implicits._
    SortedConcat.register(spark)
    val df = Seq(("a", "z"), ("a", "m"), ("a", "b"), ("b", "q")).toDF("k", "v")
    df.createOrReplaceTempView("sc_in")
    val udafOut = spark.sql("SELECT k, graft_sorted_concat(v) AS joined FROM sc_in GROUP BY k")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val declarative = df.groupBy($"k")
      .agg(concat_ws(" ", sort_array(collect_list($"v"))).as("joined"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(udafOut == declarative)
    assert(udafOut("a") == "b m z")
  }
}
