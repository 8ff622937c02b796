package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SymSpell blocking completeness: the delete-1 variant equi-join must
  * find EVERY pair the direct cross join finds — blocking can add
  * candidates, never lose matches. */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  test("fuzzyJoin == direct cross join + levenshtein (blocking is lossless)") {
    val got = TextAnalysis.fuzzyJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    val docs = graft.Tables.documents(spark, sf)
    val vocab = docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "").distinct()
    val queries = docs.filter(col("doc_id") % 11 === 0)
      .select(col("doc_id"), element_at(split(col("text"), " "), 1).as("qtok"))
      .withColumn("q", expr(
        """concat(substring(qtok, 1, CAST((doc_id DIV 11) % length(qtok) AS INT)),
                  substring(qtok, CAST((doc_id DIV 11) % length(qtok) AS INT) + 2, 1000000))"""))
    val want = queries.crossJoin(vocab)
      .withColumn("dist", levenshtein(col("q"), col("word")))
      .filter(col("dist") <= 1)
      .select(col("doc_id"), col("q"), col("word"), col("dist")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(want.nonEmpty, "planted misspellings produced no matches — fixture drift?")
    assert(got == want)
  }

  test("some planted misspelling is matched back to its source word at distance 1") {
    val hits = TextAnalysis.fuzzyJoin(spark, sf)
      .filter(col("dist") === 1).count()
    assert(hits > 0)
  }
}
