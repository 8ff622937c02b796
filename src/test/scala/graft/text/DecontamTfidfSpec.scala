package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkTestSession, Tables}
import graft.dedup.Dedup

class DecontamTfidfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  private def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("[^\\p{L}]+").toSeq.filter(_.nonEmpty)

  test("decontamOverlap equals a driver-local string-shingle recomputation") {
    val got = Dedup.decontamOverlap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> Dedup.shingles(tokenize(r.getString(1)), w = 5))
    val evalDocs = docs.filter(_._1 % 50 == 0)
    val trainDocs = docs.filter(_._1 % 50 != 0)
    val want = (for {
      (tid, tsh) <- trainDocs
      (eid, esh) <- evalDocs
      c = tsh.intersect(esh).size
      if c >= 1
    } yield (tid, eid) -> (c.toLong, c.toDouble / esh.size)).toMap
    assert(got == want)
  }

  test("decontamOverlap: eval side broadcast, train side never shuffled before the join") {
    val plan = Dedup.decontamOverlap(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only exchanges are the broadcast of the eval grams and the final
    // (train_id, eval_id) aggregation — the train gram stream itself must
    // reach the join without a hash repartition
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    val below = plan.substring(joinIdx)
    assert(!below.replaceFirst("(?s)BroadcastExchange.*", "").contains("Exchange hashpartitioning"),
      plan)
  }

  test("tfidfTop: <= k rows per doc, ranks contiguous, scores non-increasing") {
    val rows = TextAnalysis.tfidfTop(spark, sf, k = 5).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val sorted = rs.sortBy(_.getInt(5))
      assert(sorted.map(_.getInt(5)).toSeq == (1 to rs.length))
      val scores = sorted.map(_.getDouble(4)).toSeq
      assert(scores == scores.sorted(Ordering.Double.TotalOrdering.reverse))
    }
    // df is a corpus-wide property: same word → same df everywhere
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).distinct.length == 1)
    }
  }

  test("tfidfTop scores equal a driver-local tf*ln(N/df) recomputation") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> tokenize(r.getString(1)))
    val n = docs.length.toDouble
    val dfMap = docs.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (w, xs) => w -> xs.length }
    val got = TextAnalysis.tfidfTop(spark, sf, k = 5).collect()
    got.foreach { r =>
      val (doc, word, tf, df, score) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      val toks = docs.toMap.apply(doc)
      assert(tf == toks.count(_ == word).toLong)
      assert(df == dfMap(word).toLong)
      val want = BigDecimal(tf.toDouble * math.log(n / df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(score == want, s"doc=$doc word=$word")
    }
  }
}
