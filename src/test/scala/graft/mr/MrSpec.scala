package graft.mr

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("Tokenize drops empty tokens like Go FieldsFunc") {
    assert(Tokenize("a,,b  c!!").toSeq == Seq("a", "b", "c"))
    assert(Tokenize("...").isEmpty)
    assert(Tokenize("héllo wörld1x").toSeq == Seq("héllo", "wörld", "x"))
  }

  test("distributed wc equals sequential oracle") {
    import spark.implicits._
    val corpus = MrJob.documentsCorpus(spark, sf)
    val dist = MrJob.run(WordCount, corpus).collect().map(kv => kv.key -> kv.value).toMap
    val oracle = MrJob.runOracle(WordCount, corpus).collect().map(kv => kv.key -> kv.value).toMap
    assert(dist == oracle)
    assert(dist.nonEmpty)
  }

  test("typed wc equals declarative wordCount") {
    val typed = MrJob.run(WordCount, MrJob.documentsCorpus(spark, sf))
      .collect().map(kv => kv.key -> kv.value.toLong).toMap
    val decl = MrQueries.wordCount(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed == decl)
  }

  test("indexer emits sorted distinct doc lists") {
    val out = MrJob.run(Indexer, MrJob.documentsCorpus(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { kv =>
      val parts = kv.value.split(" ", 2)
      val docs = parts(1).split(",")
      assert(parts(0).toInt == docs.length)
      assert(docs.toSeq == docs.toSeq.sorted)
      assert(docs.distinct.length == docs.length)
    }
  }

  test("nocrash app: 4 keys, values sorted within key") {
    val out = MrJob.run(NocrashApp, MrJob.documentsCorpus(spark, sf)).collect()
    assert(out.map(_.key).sorted.toSeq == Seq("a", "b", "c", "d"))
    out.foreach { kv =>
      val vs = kv.value.split(" ").toSeq
      assert(vs == vs.sorted)
    }
  }

  test("readCorpus reads whole files as (filename, contents) — S1 source") {
    val dir = java.nio.file.Files.createTempDirectory("corpus")
    java.nio.file.Files.write(dir.resolve("a.txt"), "hello world\nhello".getBytes)
    java.nio.file.Files.write(dir.resolve("b.txt"), "world again".getBytes)
    val corpus = MrJob.readCorpus(spark, dir.toString + "/*.txt").collect().toMap
    assert(corpus == Map("a.txt" -> "hello world\nhello", "b.txt" -> "world again"))
    val wc = MrJob.run(WordCount, MrJob.readCorpus(spark, dir.toString + "/*.txt"))
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(wc == Map("hello" -> "2", "world" -> "2", "again" -> "1"))
  }

  test("text sink lines are '<key> <value>' globally sorted") {
    val out = MrJob.toTextLines(MrJob.run(WordCount, MrJob.documentsCorpus(spark, sf)))
      .collect().map(_.getString(0))
    assert(out.toSeq == out.toSeq.sorted)
    assert(out.head.split(" ").length == 2)
  }
}
