package graft.shard

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SaltingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("salted two-phase aggregation equals direct aggregation on skewed keys") {
    import spark.implicits._
    // 90% of rows on one hot key
    val df = spark.range(10000).select(
      when($"id" % 10 < 9, "hot").otherwise(concat(lit("cold"), $"id" % 7)).as("k"),
      ($"id" % 100).as("v"),
      $"id".as("row_id"))
    val salted = Salting.saltedSumCount(df, $"k", $"v", $"row_id", buckets = 16)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = df.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("salt is deterministic per row (retry-safe) and spreads the hot key") {
    import spark.implicits._
    val df = spark.range(1000).select($"id".as("row_id"))
    val a = df.select(Salting.salt($"row_id", 16).as("s")).collect().map(_.getInt(0))
    val b = df.select(Salting.salt($"row_id", 16).as("s")).collect().map(_.getInt(0))
    assert(a.sameElements(b))
    assert(a.distinct.length == 16)
  }
}
