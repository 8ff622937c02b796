package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextAnalysis

/** Deduplication family for a training-data pipeline, over `documents`.
  *
  * Scale design: exact + token-jaccard are pure declarative plans. The
  * MinHash-LSH and SimHash paths are the 100 TB answer to near-dup detection:
  * candidate generation is a *band-bucket shuffle* (linear in corpus size,
  * one wide exchange) instead of the quadratic all-pairs join; only
  * bucket-local pairs are scored. Buckets are capped (logged, not silent) so
  * a degenerate corpus can't go quadratic in one task.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup (hash-groupBy): one row per distinct text, keeping the
    * smallest doc_id; n_dups counts the group. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  // ------------------------------------------------- token-set jaccard

  /** N-gram (unigram token-set) Jaccard near-dup pairs within
    * (lang, source) blocks: |A∩B| / |A∪B| >= threshold. The block join keeps
    * the candidate space bounded; exact integer intersection counts make the
    * jaccard double bit-exact for the oracle. */
  def tokenJaccard(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val w = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(TextAnalysis.tokensCol(col("text")))).as("word"))
    val sizes = w.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = w.select(col("doc_id").as("d1"), col("lang"), col("source"), col("word"))
    val b = w.select(col("doc_id").as("d2"), col("lang").as("lang2"),
      col("source").as("source2"), col("word").as("word2"))
    val common = a.join(b,
        a("lang") === b("lang2") && a("source") === b("source2") &&
        a("word") === b("word2") && a("d1") < b("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        (col("c").cast("double") / (col("n1") + col("n2") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ------------------------------------------------------- minhash LSH

  /** Deterministic 64-bit FNV-1a string hash (public constants; cf. the
    * 32-bit FNV the reference uses for bucket routing,
    * /root/reference/src/mr/worker.go:36-40). */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  val NumHashes = 64
  val Bands = 16
  val Rows = 4 // NumHashes / Bands
  private val Prime = (1L << 61) - 1 // Mersenne prime for (a*x+b) mod p perms

  /** Seeded permutation coefficients — fixed across runs/executors. */
  private val perms: Array[(Long, Long)] = {
    val rnd = new java.util.Random(42)
    Array.fill(NumHashes)((math.abs(rnd.nextLong()) % (Prime - 1) + 1,
      math.abs(rnd.nextLong()) % Prime))
  }

  /** Word w-shingles of a token sequence. */
  def shingles(tokens: Seq[String], w: Int = 3): Set[String] =
    if (tokens.length < w) Set(tokens.mkString(" "))
    else tokens.sliding(w).map(_.mkString(" ")).toSet

  /** MinHash signature of a shingle set under the fixed permutations. */
  def minhashSig(sh: Set[String]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    sh.foreach { s =>
      val x = fnv64(s) & Long.MaxValue
      var i = 0
      while (i < NumHashes) {
        val (a, b) = perms(i)
        // (a*x+b) mod p via unsigned 128-free reduction: Math.multiplyHigh-free
        val v = (a * (x % Prime) + b) % Prime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  final case class DocSig(doc_id: Long, sig: Array[Long])
  final case class NearDup(d1: Long, d2: Long, est_jaccard: Double)

  /** MinHash signatures for every document. One map-only pass. */
  def signatures(spark: SparkSession, dir: String): Dataset[DocSig] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokensCol(lower(col("text"))).as("toks"))
      .as[(Long, Seq[String])]
      .map { case (id, toks) => DocSig(id, minhashSig(shingles(toks))) }
  }

  /** MinHash + LSH near-dup pairs: band-bucket candidates, signature-estimated
    * jaccard >= threshold. maxBucket bounds worst-case bucket fan-out; when it
    * trips, the overflow is visible in logs (no silent truncation). */
  def minhashLsh(spark: SparkSession, dir: String, threshold: Double = 0.7,
                 maxBucket: Int = 2000): Dataset[NearDup] = {
    import spark.implicits._
    val sigs = signatures(spark, dir)
    val banded = sigs.flatMap { ds =>
      (0 until Bands).iterator.map { band =>
        var h = 0xcbf29ce484222325L
        var r = 0
        while (r < Rows) { h ^= ds.sig(band * Rows + r); h *= 0x100000001b3L; r += 1 }
        ((band, h), ds)
      }
    }
    banded.groupByKey(_._1).flatMapGroups { (key, it) =>
      val docs = it.map(_._2).toArray.sortBy(_.doc_id)
      if (docs.length > maxBucket)
        System.err.println(s"[minhashLsh] bucket $key overflow: ${docs.length} docs, capped to $maxBucket")
      val d = if (docs.length > maxBucket) docs.take(maxBucket) else docs
      for {
        i <- d.indices.iterator
        j <- (i + 1) until d.length
        est = {
          var m = 0; var k = 0
          while (k < NumHashes) { if (d(i).sig(k) == d(j).sig(k)) m += 1; k += 1 }
          m.toDouble / NumHashes
        }
        if est >= threshold
      } yield NearDup(d(i).doc_id, d(j).doc_id, est)
    }.dropDuplicates("d1", "d2")
  }

  // ----------------------------------------------------------- simhash

  /** 64-bit SimHash of a token multiset. */
  def simhash(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv64(t)
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  final case class DocSim(doc_id: Long, sim: Long)
  final case class SimPair(d1: Long, d2: Long, hamming: Int)

  def simhashes(spark: SparkSession, dir: String): Dataset[DocSim] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokensCol(lower(col("text"))).as("toks"))
      .as[(Long, Seq[String])]
      .map { case (id, toks) => DocSim(id, simhash(toks)) }
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist, using the
    * pigeonhole trick: split 64 bits into 4 chunks of 16 — any pair within
    * distance 3 agrees on at least one whole chunk, so chunk-equality buckets
    * are a complete candidate set (linear shuffle, no all-pairs). */
  def simhashDups(spark: SparkSession, dir: String, maxDist: Int = 3,
                  maxBucket: Int = 4000): Dataset[SimPair] = {
    import spark.implicits._
    val sims = simhashes(spark, dir)
    sims.flatMap { d =>
      (0 until 4).iterator.map(c => ((c, (d.sim >>> (c * 16)) & 0xffffL), d))
    }.groupByKey(_._1).flatMapGroups { (key, it) =>
      val docs = it.map(_._2).toArray.sortBy(_.doc_id)
      if (docs.length > maxBucket)
        System.err.println(s"[simhashDups] bucket $key overflow: ${docs.length} docs, capped to $maxBucket")
      val d = if (docs.length > maxBucket) docs.take(maxBucket) else docs
      for {
        i <- d.indices.iterator
        j <- (i + 1) until d.length
        dist = java.lang.Long.bitCount(d(i).sim ^ d(j).sim)
        if dist <= maxDist
      } yield SimPair(d(i).doc_id, d(j).doc_id, dist)
    }.dropDuplicates("d1", "d2")
  }

  // ---------------------------------------------- rolling-hash fingerprints

  final case class DocFp(doc_id: Long, fps: Array[Long])

  /** Karp-Rabin winnowing-style fingerprints: rolling FNV over w-shingles,
    * keep hashes ≡ 0 (mod keepMod) — a sparse, alignment-robust signature for
    * containment/overlap detection (cf. winnowing, Schleimer et al. 2003). */
  def shingleFingerprints(spark: SparkSession, dir: String, w: Int = 5,
                          keepMod: Int = 4): Dataset[DocFp] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.tokensCol(lower(col("text"))).as("toks"))
      .as[(Long, Seq[String])]
      .map { case (id, toks) =>
        val hs = toks.sliding(w).filter(_.nonEmpty)
          .map(sh => fnv64(sh.mkString(" ")))
          .filter(h => (h & (keepMod - 1)) == 0)
          .toArray.distinct.sorted
        DocFp(id, hs)
      }
  }
}
