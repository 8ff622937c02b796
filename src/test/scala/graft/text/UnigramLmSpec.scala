package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The unigram-LM trainer's contract: the distributed hard-EM fit equals a
  * driver-local reference fold over the same word counts (the BpeTrain /
  * QualityClassifier precedent for trained artifacts no SQL engine can
  * re-derive), the fit is partitioning-insensitive (all model updates are
  * exact integer counts), and the applied segmentation is structurally
  * sound. */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = SparkTestSession.sf

  private val maxLen = 6
  private val vocabSize = 64
  private val seedSize = 512

  /** Driver-local replica of [[UnigramLm.train]] over a local word-count
    * map — shares viterbi/fallbackOf/toModel so what this pins is the
    * DISTRIBUTED aggregation (seeding exchange + per-round count passes),
    * not the per-word DP. */
  private def referenceTrain(words: Seq[(String, Long)]): Seq[UnigramLm.Piece] = {
    def localCount(vocab: Seq[UnigramLm.Piece]): Seq[(String, Long)] = {
      val m = new java.util.HashMap[String, Double]()
      vocab.foreach(p => m.put(p.piece, p.logp))
      val fb = UnigramLm.fallbackOf(vocab.map(_.logp))
      val acc = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, c) =>
        UnigramLm.viterbi(w, m, maxLen, fb).foreach { p =>
          acc(p) = acc.getOrElse(p, 0L) + c
        }
      }
      acc.toSeq
    }
    val subs = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      for (i <- 0 until w.length; l <- 1 to math.min(maxLen, w.length - i)) {
        val p = w.substring(i, i + l)
        subs(p) = subs.getOrElse(p, 0L) + c
      }
    }
    val all = subs.toArray
    val chars = all.filter(_._1.length == 1)
    val seeded = (chars ++ all.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c * p.length, -c, p) }
      .take(math.max(0, seedSize - chars.length))).distinct
    var model = UnigramLm.toModel(seeded.toSeq)
    for (_ <- 1 to 2) model = UnigramLm.toModel(localCount(model))
    val kept = (model.filter(_.piece.length == 1) ++
      model.filter(_.piece.length > 1)
        .sortBy(p => (-p.count, p.piece))
        .take(math.max(0, vocabSize - model.count(_.piece.length == 1))))
      .filter(_.count > 0)
    UnigramLm.toModel(localCount(kept)).filter(_.count > 0)
  }

  test("distributed hard-EM training equals the driver-local reference; " +
    "insensitive to shuffle partitioning") {
    import spark.implicits._
    val words = UnigramLm.wordCounts(spark, sf).as[(String, Long)].collect().toSeq
    val expect = referenceTrain(words)
    val got = UnigramLm.train(spark, sf, vocabSize, seedSize, maxLen)
    assert(got == expect, s"distributed fit diverges:\n got=${got.take(5)}…\n exp=${expect.take(5)}…")
    assert(got.exists(_.piece.length > 1), "degenerate: no multi-char piece learned")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(UnigramLm.train(spark, sf, vocabSize, seedSize, maxLen) == expect,
        "integer-count determinism must make the fit partitioning-independent")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("soft-EM: distributed == driver-local reference; insensitive to shuffle partitioning") {
    import spark.implicits._
    val words = UnigramLm.wordCounts(spark, sf).as[(String, Long)].collect()
    val seeded = UnigramLm.seed(UnigramLm.wordCounts(spark, sf), seedSize, maxLen)
    val expect = UnigramLm.trainSoftLocal(words, seeded, vocabSize, maxLen)
    val got = UnigramLm.trainSoft(spark, sf, vocabSize, seedSize, maxLen)
    assert(got == expect, s"distributed soft fit diverges:\n got=${got.take(5)}…\n exp=${expect.take(5)}…")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(UnigramLm.trainSoft(spark, sf, vocabSize, seedSize, maxLen) == expect,
        "micro-unit fixed-point determinism must make the soft fit partitioning-independent")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("soft-EM is a real E-step: lattice mass differs from Viterbi counts, and the " +
    "fitted model's corpus likelihood is at least the hard-EM model's") {
    import spark.implicits._
    val words = UnigramLm.wordCounts(spark, sf).as[(String, Long)].collect()
    val hard = UnigramLm.train(spark, sf, vocabSize, seedSize, maxLen)
    val soft = UnigramLm.trainSoft(spark, sf, vocabSize, seedSize, maxLen)
    assert(hard != soft, "soft-EM must not collapse to the Viterbi path counts")
    assert(soft.exists(_.piece.length > 1), "degenerate: no multi-char piece learned")
    // marginal corpus log-likelihood (the quantity EM optimizes): Viterbi
    // best-path score is a lower bound of it per word, so compare both
    // models on the SAME metric — the full-lattice marginal
    def marginal(model: Seq[UnigramLm.Piece]): Double = {
      val m = new java.util.HashMap[String, Double]()
      model.foreach(p => m.put(p.piece, p.logp))
      val fb = UnigramLm.fallbackOf(model.map(_.logp))
      words.map { case (w, c) =>
        // forward pass only: reuse expectedCounts' alpha recursion shape
        val n = w.length
        val la = Array.fill(n + 1)(Double.NegativeInfinity)
        la(0) = 0.0
        for (end <- 1 to n; start <- math.max(0, end - maxLen) until end) {
          val piece = w.substring(start, end)
          val lp = m.getOrDefault(piece, if (end - start == 1) fb else Double.NegativeInfinity)
          if (lp != Double.NegativeInfinity && la(start) != Double.NegativeInfinity) {
            val s = la(start) + lp
            la(end) = if (la(end) == Double.NegativeInfinity) s
              else math.max(la(end), s) + math.log1p(math.exp(-math.abs(la(end) - s)))
          }
        }
        c * la(n)
      }.sum
    }
    val (llHard, llSoft) = (marginal(hard), marginal(soft))
    assert(llSoft >= llHard - math.abs(llHard) * 1e-3,
      s"soft-EM marginal likelihood $llSoft should not lose to hard-EM $llHard")
  }

  test("apply: pieces reconstruct every word; fewer pieces than characters overall") {
    import spark.implicits._
    val model = UnigramLm.train(spark, sf, vocabSize, seedSize, maxLen)
    val m = new java.util.HashMap[String, Double]()
    model.foreach(p => m.put(p.piece, p.logp))
    val fb = UnigramLm.fallbackOf(model.map(_.logp))
    UnigramLm.wordCounts(spark, sf).as[(String, Long)].collect().foreach { case (w, _) =>
      val segs = UnigramLm.viterbi(w, m, maxLen, fb)
      assert(segs.mkString == w, s"segmentation must reconstruct '$w': ${segs.toSeq}")
    }
    val applied = UnigramLm.applyWith(spark, sf, model).collect()
    val nChars = graft.Tables.documents(spark, sf)
      .select(sum(length(concat_ws("", TextAnalysis.tokensCol(lower(col("text")))))))
      .head().getLong(0)
    val nPieces = applied.map(_.getLong(2)).sum
    assert(nPieces < nChars, "a trained subword model must beat char-level segmentation")
    assert(applied.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1) * 32))
  }
}
