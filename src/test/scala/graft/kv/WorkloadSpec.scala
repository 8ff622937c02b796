package graft.kv

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class WorkloadSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("generated workload is deterministic across invocations") {
    val a = Workload.appendOps(spark, 5, 40, 7).collect().sortBy(_.ts)
    val b = Workload.appendOps(spark, 5, 40, 7).collect().sortBy(_.ts)
    assert(a.sameElements(b))
  }

  test("materialize passes checkClntAppends invariant on clean workload") {
    val state = OpLog.materialize(Workload.appendOps(spark, 5, 40, 7))
    val violations = Workload.appendViolations(state).collect()
    assert(violations.isEmpty, violations.mkString("; "))
  }

  test("materialize dedups retries: state with retries equals state without") {
    val clean = OpLog.materialize(Workload.appendOps(spark, 5, 40, 7, withRetries = false))
      .collect().map(s => s.key -> s.value).sorted
    val retried = OpLog.materialize(Workload.appendOps(spark, 5, 40, 7, withRetries = true))
      .collect().map(s => s.key -> s.value).sorted
    assert(retried.sameElements(clean))
    val violations = Workload.appendViolations(
      OpLog.materialize(Workload.appendOps(spark, 5, 40, 7, withRetries = true))).collect()
    assert(violations.isEmpty, violations.mkString("; "))
  }
}
