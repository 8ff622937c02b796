package graft.mr

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ProbesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("parallelism probe observes >= 2 concurrent tasks (test-mr.sh floor)") {
    val spans = Probes.taskSpans(spark, n = 8, sliceMs = 300)
    val maxc = Probes.maxConcurrency(spans).collect()(0).getLong(0)
    assert(maxc >= 2, s"observed max concurrency $maxc")
  }

  test("chaos: first-attempt task failures are retried and output equals fault-free run") {
    val corpus = MrJob.documentsCorpus(spark, sf)
    val clean = MrJob.run(WordCount, corpus).collect().map(kv => kv.key -> kv.value).sorted
    val chaotic = MrJob.run(Probes.chaosOnce(WordCount), corpus).collect().map(kv => kv.key -> kv.value).sorted
    assert(chaotic.sameElements(clean))
  }
}
