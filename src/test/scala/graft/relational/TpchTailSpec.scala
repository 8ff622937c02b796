package graft.relational

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec, ShuffledHashJoinExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Structural contracts of the TPC-H tail batch (Q4/Q8/Q9/Q10/Q11/Q13/Q17/
  * Q20) beyond the value oracle: the EXISTS really decorrelates to one semi
  * join, the histogram conserves customers, and the small-quantity predicate
  * agrees with a driver-local recomputation on the tiny fixture. */
class TpchTailSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  private def deepCollect(p: SparkPlan): Seq[SparkPlan] = {
    val through = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: through.flatMap(deepCollect)
  }

  test("q4: the correlated EXISTS runs as ONE left-semi join (no explosion)") {
    val df = RelationalQueries.q4OrderPriority(spark, sf)
    df.queryExecution.toRdd.count() // finalize AQE before inspecting
    val semis = deepCollect(df.queryExecution.executedPlan).filter {
      case j: SortMergeJoinExec => j.joinType.sql == "LEFT SEMI"
      case j: ShuffledHashJoinExec => j.joinType.sql == "LEFT SEMI"
      case j: BroadcastHashJoinExec => j.joinType.sql == "LEFT SEMI"
      case _ => false
    }
    assert(semis.size == 1,
      s"expected exactly one semi join, plan:\n${df.queryExecution.executedPlan.toString.take(1500)}")
    val rows = df.collect()
    assert(rows.length == 5 && rows.forall(_.getLong(1) > 0),
      "every priority class should have late-shipped orders on the fixture")
  }

  test("q13: the order-count histogram conserves the customer population") {
    import org.apache.spark.sql.functions._
    val rows = RelationalQueries.q13CustomerDistribution(spark, sf).collect()
    val nCust = graft.Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nCust,
      "sum(custdist) must equal the number of customers (left join keeps zeros)")
    // the zero bucket is exactly the customers absent from the filtered
    // orders (0 at this sf is legitimate — sf0.001 customers all order;
    // the sf0.01 oracle run does exercise a non-empty zero bucket)
    val nBuyers = graft.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey")).distinct().count()
    assert(rows.collectFirst { case r if r.getLong(0) == 0L => r.getLong(1) }
      .getOrElse(0L) == nCust - nBuyers,
      "zero bucket must equal customers minus distinct qualifying buyers")
  }

  test("q17: the integer fifth-of-average predicate matches a driver-local reference") {
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice").collect()
    val brand = graft.Tables.part(spark, sf)
      .filter($"p_brand" === "Brand#23").select($"p_partkey")
      .collect().map(_.getLong(0)).toSet
    val qtyC = li.groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> (rs.map(r => math.round(r.getDouble(1) * 100)).sum, rs.length.toLong)
    }
    val expect = li.filter { r =>
      val (s, n) = qtyC(r.getLong(0))
      brand.contains(r.getLong(0)) && math.round(r.getDouble(1) * 100) * 5 * n < s
    }
    val expectRev = expect.map(r => BigDecimal(r.getDouble(2)).setScale(2)).sum
    val row = RelationalQueries.q17SmallQtyRevenue(spark, sf).collect().head
    assert(row.getLong(1) == expect.length, "n_items disagrees with the local reference")
    assert(row.getDouble(0) == expectRev.toDouble, "total_revenue disagrees")
  }

  test("q11/q8: shares are genuine fractions of their own totals") {
    val q11 = RelationalQueries.q11ImportantParts(spark, sf).collect()
    assert(q11.nonEmpty && q11.forall { r =>
      r.getDouble(2) > 0.0006 && r.getDouble(2) < 1.0 && r.getDouble(1) > 0
    })
    val q8 = RelationalQueries.q8MarketShare(spark, sf).collect()
    assert(q8.nonEmpty && q8.forall { r =>
      val (nat, tot, share) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      nat >= 0 && nat <= tot && share == nat / tot
    })
  }
}
