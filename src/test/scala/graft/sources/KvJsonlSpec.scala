package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.mr.{KV, MrJob, WordCount}

class KvJsonlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("JSON-lines KV sink/scan round-trips byte-identically") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("kvjsonl").toString + "/kv"
    val kv = MrJob.run(WordCount, MrJob.documentsCorpus(spark, sf))
    val expected = kv.collect().map(k => (k.key, k.value)).sorted
    KvJsonl.write(kv, out)
    val back = KvJsonl.read(spark, out).collect().map(k => (k.key, k.value)).sorted
    assert(back.sameElements(expected))
  }

  test("read uses the pinned schema (no inference) and preserves JSON escapes") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("kvjsonl").toString + "/esc"
    val tricky = Seq(KV("k\"quote", "v\\slash"), KV("tab\tkey", "line\nbreak")).toDS()
    KvJsonl.write(tricky, out)
    val back = KvJsonl.read(spark, out).collect().map(k => (k.key, k.value)).toSet
    assert(back == Set(("k\"quote", "v\\slash"), ("tab\tkey", "line\nbreak")))
  }
}
