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

  test("bloom decontamination: one-sided error vs the exact overlap, bounded excess") {
    val bloom = Dedup.decontamBloomFlags(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(bloom.nonEmpty)
    // NO FALSE NEGATIVES: every gram the exact join found is also found by
    // the filter probe — per-doc counted, not just flagged. (Exact counts
    // are per-eval-doc pair sums; a train gram shared with TWO eval docs is
    // counted twice there but once by the probe, so compare against the
    // per-pair MAX, which lower-bounds the distinct shared grams.)
    val exactMax = Dedup.decontamOverlap(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (tid, rs) => tid -> rs.map(_.getLong(2)).max }
    exactMax.foreach { case (tid, nShared) =>
      val b = bloom.find(_._1 == tid)
      assert(b.isDefined, s"train doc $tid missing from the bloom scan")
      assert(b.get._3 >= nShared, s"bloom lost grams for $tid: ${b.get._3} < $nShared")
      assert(b.get._4, s"contaminated doc $tid not flagged")
    }
    // ONE-SIDED, BOUNDED excess: clean docs spuriously flagged stay within
    // a loose multiple of the ε·grams expectation (fixture-deterministic)
    val clean = bloom.filter(r => !exactMax.contains(r._1))
    val spurious = clean.count(_._4)
    val expected = clean.map(_._2.toDouble * 1e-4).sum
    assert(spurious <= math.max(3.0, expected * 10),
      s"$spurious spurious flags vs expectation $expected")
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
