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
    assert(out.toSeq == out.toSeq.sorted(MrJob.goStringOrdering))
    assert(out.head.split(" ").length == 2)
  }

  test("non-BMP corpus: distributed output equals sequential oracle under Go byte-wise sort") {
    // U+FA00 (CJK compat ideograph, letter, UTF-16 0xFA00 / UTF-8 EF A8 80)
    // vs U+10400 (Deseret capital, letter, UTF-16 D801 DC00 / UTF-8 F0 90
    // 90 80): Java's String order puts the Deseret token FIRST (0xD801 <
    // 0xFA00), Go's byte-wise order puts it LAST (0xF0 > 0xEF). This corpus
    // pins the sink to the reference's ordering (worker.go:30 sort.Strings)
    val cjk = "切"
    val deseret = new String(Character.toChars(0x10400))
    val dir = java.nio.file.Files.createTempDirectory("utf8corpus")
    java.nio.file.Files.write(dir.resolve("u1.txt"),
      s"alpha $deseret $cjk beta $deseret".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("u2.txt"),
      s"$cjk $cjk gamma $deseret".getBytes("UTF-8"))
    val corpus = MrJob.readCorpus(spark, dir.toString + "/*.txt")
    val dist = MrJob.toTextLines(MrJob.run(WordCount, corpus)).collect().map(_.getString(0))
    val oracle = MrJob.runOracle(WordCount, corpus).collect()
      .map(kv => s"${kv.key} ${kv.value}").sorted(MrJob.goStringOrdering)
    assert(dist.sameElements(oracle),
      s"dist=${dist.mkString("|")} oracle=${oracle.mkString("|")}")
    // the pin discriminates: Java's natural order gives a DIFFERENT sequence
    assert(dist.toSeq != dist.toSeq.sorted,
      "corpus failed to discriminate UTF-16 vs UTF-8 ordering")
  }
}
