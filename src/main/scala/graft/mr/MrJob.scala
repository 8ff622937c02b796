package graft.mr

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The whole distributed engine of the reference
  * (/root/reference/src/mr/master.go + worker.go, §3.2 of SURVEY.md) is this
  * one declarative plan:
  *
  *   read(wholetext) → flatMap(app.map) → groupByKey → mapGroups(app.reduce)
  *
  * Scheduling, shuffle, the map→reduce barrier, straggler re-execution and
  * crash recovery are all delegated to the DAGScheduler (task retry +
  * speculative execution replace the master's 10 s timeout/blacklist logic,
  * /root/reference/src/mr/master.go:116-134,290-315).
  *
  * `nReduce` maps to the number of shuffle partitions of the groupByKey —
  * the reference hardcodes 10 (/root/reference/src/main/mrmaster.go:26); at
  * cluster scale this is whatever `spark.sql.shuffle.partitions` / AQE picks.
  */
object MrJob {

  /** Read a directory of text files whole-file, as (filename, contents) —
    * reference input model (/root/reference/src/mr/worker.go:68-76). */
  def readCorpus(spark: SparkSession, pathGlob: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(pathGlob)
      .select(
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("filename"),
        col("value").as("contents"))
      .as[(String, String)]
  }

  /** Run an app over a (filename, contents) corpus → Dataset[KV]. */
  def run(app: MrApp, corpus: Dataset[(String, String)]): Dataset[KV] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .flatMap { case (f, c) => app.map(f, c) }
      .groupByKey(_.key)
      .mapGroups((k, vs) => KV(k, app.reduce(k, vs.map(_.value))))
  }

  /** Sequential-oracle mode (/root/reference/src/main/mrsequential.go):
    * identical semantics forced onto a single partition — the differential
    * baseline for [[run]]. */
  def runOracle(app: MrApp, corpus: Dataset[(String, String)]): Dataset[KV] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.coalesce(1)
      .flatMap { case (f, c) => app.map(f, c) }
      .coalesce(1)
      .groupByKey(_.key)
      .mapGroups((k, vs) => KV(k, app.reduce(k, vs.map(_.value))))
  }

  /** Go's string ordering: unsigned lexicographic over UTF-8 bytes (what
    * `sort.Strings` / Go's `<` compare, /root/reference/src/mr/worker.go:30).
    * Java's natural String order compares UTF-16 code units instead, and the
    * two DISAGREE outside the BMP: a supplementary letter (surrogates
    * 0xD800-0xDFFF) sorts before high-BMP letters (0xE000-0xFFFF) in Java
    * but after them in Go/UTF-8 (its first byte is >= 0xF0). Every surface
    * that must match reference output byte-for-byte sorts with THIS. */
  val goStringOrdering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      x.length - y.length
    }
  }

  /** Final text sink `"<key> <value>"` lines, globally sorted in Go byte
    * order — the form test-mr.sh compares
    * (/root/reference/src/mr/worker.go:179, src/main/test-mr.sh:56).
    * Ordering by the UTF-8 encoding (BinaryType compares unsigned
    * byte-wise) IS Go's string order; a plain `orderBy(line)` would use
    * UTF-16 code-unit order and mis-sort non-BMP corpora. */
  def toTextLines(out: Dataset[KV]): DataFrame =
    out.select(concat_ws(" ", col("key"), col("value")).as("line"))
      .orderBy(encode(col("line"), "UTF-8"))
      .select(col("line"))

  /** Treat the fixture `documents` table as a corpus: doc_id is the
    * "filename", text the contents. */
  def documentsCorpus(spark: SparkSession, dir: String): Dataset[(String, String)] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id").cast("string"), col("text"))
      .as[(String, String)]
  }
}
