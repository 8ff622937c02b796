package graft.text

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed BPE tokenizer TRAINING — learn the merge table itself, not
  * just apply one (the `text_bpe_tokens` query applies a fixed regex
  * tokenization; this learns data-driven subword units, the SentencePiece/
  * GPT-2 pre-training step).
  *
  * Loop shape is exactly [[graft.sim.Similarity.trainCentroids]]'s: each
  * round is ONE distributed pass — symbolize every word under the merges
  * learned so far (broadcast, applied map-side), count adjacent symbol
  * pairs with a map-side-combined groupBy, and collect ONE argmax row
  * (deterministic tie-break: highest count, then lexicographic pair) to
  * the driver, which appends it to the merge table for the next round.
  * Driver traffic is k rows total; the corpus is scanned k times (merge
  * r+1 depends on the corpus AS REWRITTEN by merges 1..r — that
  * data-dependence is the algorithm, the same reason k-means re-scans per
  * iteration; at 100 TB one would train on a deterministic hash-sampled
  * subcorpus, which [[graft.sample.Sampling]] already provides).
  *
  * Not SQL-expressible (the per-round rewrite is an ordered greedy fold),
  * so correctness is pinned by the spec's driver-local reference over the
  * whole fixture instead of a DuckDB oracle — the [[graft.streaming]] /
  * layout precedent for non-relational surfaces. */
object BpeTrain {

  final case class Merge(left: String, right: String, pair_count: Long)

  /** `word` as single-char symbols with `merges` applied IN ORDER, each
    * greedily left-to-right, non-overlapping — the standard BPE apply. */
  private[text] def applyMerges(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    merges.foreach { case (a, b) =>
      if (syms.length > 1) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** Adjacent-pair multiset of one symbolized word. */
  private[text] def pairsOf(syms: Array[String]): Iterator[(String, String)] =
    if (syms.length < 2) Iterator.empty
    else (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1)))

  /** The corpus word stream the merges are learned over: lowercased
    * letter-run tokens (the corpus-wide tokenization every text operator
    * shares). */
  def words(spark: SparkSession, dir: String): Dataset[String] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(TextAnalysis.tokensCol(lower(col("text")))).as("w"))
      .as[String]
  }

  /** APPLY side — close the loop from trained tokenizer back to the query
    * surface: tokenize the corpus under the LEARNED merge table and report
    * per-document subword statistics. Registered as the rows-only query
    * `text_bpe_apply` (the merge table is itself trained, so no independent
    * SQL engine can re-derive the values; the spec pins the apply against a
    * driver-local reference instead).
    *
    * Scale shape: training is [[trainMerges]]'s k bounded passes; the apply
    * is then ONE map-only pass — the merge table is tiny and broadcast, each
    * partition rewrites its own rows, nothing shuffles. Tokens are Zipf-
    * heavy, so each partition memoizes word → subword-count: the greedy
    * rewrite runs once per DISTINCT word per partition, not once per
    * occurrence. */
  def bpeApply(spark: SparkSession, dir: String, k: Int = 8): org.apache.spark.sql.DataFrame =
    bpeApplyWith(spark, dir, trainMerges(spark, dir, k).map(m => (m.left, m.right)))

  /** [[bpeApply]] under an explicit merge table (what a production pipeline
    * does: train once — possibly on a hash-sampled subcorpus — then apply
    * the frozen table everywhere, batch or stream). */
  def bpeApplyWith(spark: SparkSession, dir: String,
                   merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokensCol(lower(col("text"))).as("t"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ms = bc.value
        val memo = new java.util.HashMap[String, Integer]()
        it.map { case (id, toks) =>
          var n = 0L
          toks.foreach { w =>
            val cached = memo.get(w)
            val c = if (cached != null) cached.intValue
            else {
              val v = applyMerges(w, ms).length
              memo.put(w, Integer.valueOf(v)); v
            }
            n += c
          }
          (id, toks.length.toLong, n)
        }
      }.toDF("doc_id", "n_tokens", "n_subwords")
  }

  /** Learn `k` merges. Returns them in learn order with the pair count
    * that won each round. Memoized per fixture generation: training is
    * bit-deterministic (integer counts, explicit tie-breaks), so a repeat
    * invocation over unchanged fixture bytes would recompute the identical
    * table — the cache trades only the retrain cost (the ingest-vs-query
    * bench contract, ArtifactCache). */
  def trainMerges(spark: SparkSession, dir: String, k: Int = 8): Seq[Merge] =
    graft.sources.ArtifactCache.memo(
      s"bpe:$k:${graft.sources.ArtifactCache.fixtureKey(dir)}")(trainMergesNow(spark, dir, k))

  private def trainMergesNow(spark: SparkSession, dir: String, k: Int): Seq[Merge] = {
    import spark.implicits._
    val ws = words(spark, dir)
    var merges = Vector.empty[Merge]
    for (_ <- 1 to k) {
      val done = merges.map(m => (m.left, m.right))
      val bc = spark.sparkContext.broadcast(done)
      val best = ws.flatMap(w => pairsOf(applyMerges(w, bc.value)))
        .toDF("left", "right")
        .groupBy(col("left"), col("right")).agg(count(lit(1)).as("pair_count"))
        .orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(1).as[Merge].collect() // bounded: ONE row per round
      bc.unpersist()
      if (best.isEmpty || best(0).pair_count < 2) return merges // corpus exhausted
      merges :+= best(0)
    }
    merges
  }
}
