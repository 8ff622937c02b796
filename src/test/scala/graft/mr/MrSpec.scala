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

  test("test-mr.sh shape: wc + indexer on an ~3MB 8-file corpus, distributed == oracle, byte-compared") {
    // build a pg-corpus-sized fixture: 8 files, ~400 KB each, from document texts
    val texts = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select("text").collect().map(_.getString(0))
    val dir = java.nio.file.Files.createTempDirectory("pgcorpus")
    (0 until 8).foreach { i =>
      val sb = new StringBuilder
      var j = i
      while (sb.length < 400000) { sb.append(texts(j % texts.length)).append("\n"); j += 7 }
      java.nio.file.Files.write(dir.resolve(f"pg-$i.txt"), sb.toString.getBytes("UTF-8"))
    }
    val corpus = MrJob.readCorpus(spark, dir.toString + "/*.txt")
    Seq(WordCount, Indexer).foreach { app =>
      val dist = MrJob.toTextLines(MrJob.run(app, corpus)).collect().map(_.getString(0))
      val oracle = MrJob.toTextLines(MrJob.runOracle(app, corpus)).collect().map(_.getString(0))
      assert(dist.nonEmpty)
      assert(dist.sameElements(oracle), s"${app.name}: distributed != sequential oracle")
    }
    // the fixture vocabulary is small; prove MB-scale input actually flowed
    // through the shuffle by total occurrence count, not distinct words
    val totalWords = MrJob.run(WordCount, corpus).collect().map(_.value.toLong).sum
    assert(totalWords > 400000L, s"corpus too small: $totalWords occurrences")
  }

  test("text sink lines are '<key> <value>' globally sorted") {
    val out = MrJob.toTextLines(MrJob.run(WordCount, MrJob.documentsCorpus(spark, sf)))
      .collect().map(_.getString(0))
    assert(out.toSeq == out.toSeq.sorted)
    assert(out.head.split(" ").length == 2)
  }
}
