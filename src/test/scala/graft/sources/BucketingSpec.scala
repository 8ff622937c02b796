package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{SparkTestSession, Tables}

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("bucketed fact-fact join: zero Exchange in the executed plan, same result") {
    val dir = java.nio.file.Files.createTempDirectory("bucketed").toString
    val orders = Tables.orders(spark, sf)
    val lineitem = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))

    Bucketing.writeBucketed(orders, "b_orders", s"$dir/orders", "o_orderkey", 8)
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", s"$dir/lineitem", "o_orderkey", 8)

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "o_orderkey")
      val n = joined.collect().length

      // correctness: identical to the plain (shuffled) parquet join
      val expected = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey")).count()
      assert(n.toLong == expected && n > 0)

      // the scale property: both sides read pre-partitioned → no shuffle,
      // no broadcast, and the sortBy at write time removes the SMJ sort too
      assert(!Bucketing.hasExchange(joined),
        s"unexpected exchange:\n${joined.queryExecution.executedPlan}")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
