package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftExtensions

/** EMPIRICAL SCALE-GROWTH PROBE — convert the two strongest 100 TB prose
  * claims into measured exponents, on self-generated corpora at ~1×/10×/100×
  * the bench SF's row count (the driver's testdata caps at sf0.1 and is
  * read-only, so the probe generates its own under /tmp):
  *
  *  (a) `dedup_incremental` candidate-join economics: with a FIXED-SIZE
  *      ingest batch, rows entering the batch side of the candidate join
  *      and candidate pairs out must scale ~linearly with the corpus (the
  *      batch side is batch-sized, the base side corpus-sized, the join
  *      output batch×matches), never corpus² — while the full self-join's
  *      candidate set grows super-linearly on the same data.
  *  (b) `sample_source_cap` via the TopKPerKey physical operator: rows
  *      crossing the exchange stay ≈ partitions×sources×k as the corpus
  *      grows 100×. (Measured honestly against the row_number-window form:
  *      Spark 3.5+'s WindowGroupLimit bounds that shuffle too — the probe
  *      records both — but only after a full map-side sort of every row,
  *      which TopKPartial's heaps never pay.)
  *
  * The generated corpus mirrors the fixture's shape (20 sources, 5 langs,
  * Zipf-ish common vocabulary + per-doc rare tokens so prefix filtering has
  * a real tail to bite on, ~5% planted near-duplicates at id-delta 20 with
  * 5% token mutation — same (lang, source) cell by construction). All
  * generation is seeded by doc_id: deterministic, distributed, no driver
  * loop. Not part of the shipped library (diagnostic main, like PlanAudit).
  */
object ScaleProbe {

  private val Sources = 20
  private val Langs = 5

  /** Base-26 alphabetic encoding — generated words must be ALL LETTERS:
    * the shared tokenizer splits on `[^\p{L}]+`, so digit-suffixed words
    * ("m144871") collapse to their letter prefix and the whole corpus
    * degenerates to an alphabet of ~4 tokens (v1-v3 of this generator;
    * caught when LSH signatures of visibly unrelated docs matched 64/64 —
    * their 8-element single-letter shingle sets were identical). */
  private def alpha(k: Long): String = {
    var v = if (k < 0) -(k + 1) else k
    val sb = new StringBuilder
    while ({ sb.append(('a' + (v % 26)).toChar); v /= 26; v > 0 }) ()
    sb.toString
  }

  private def genText(id: Long, vocabScale: Int): String = {
    // Planted near-dups in whole BLOCKS: block b = ids [20b, 20b+19) spans
    // all 20 sources; every doc of a block with b % 20 == 19 copies the
    // SAME-residue doc 19 blocks earlier — whose own block index is ≡ 0
    // (mod 20), i.e. a true ORIGINAL (v2's id-20 rule chained dups onto
    // dups, whose actual text differs from their seed text, so almost no
    // planted pair was actually similar — caught when verified-pair counts
    // came back near zero). Same source and lang by construction (both are
    // id mod functions preserved at delta 380); dup rate 5%, scattered
    // every 20 blocks, each original copied at most once (disjoint pairs,
    // no cliques).
    val srcId = if ((id / 20) % 20 == 19 && id >= 380) id - 380 else id
    val rnd = new scala.util.Random(srcId * 0x9e3779b97f4a7c15L + 17)
    val n = 40 + rnd.nextInt(80)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      val u = rnd.nextDouble()
      // 30% common Zipf-ish vocab (flattened: a steeper mix measured
      // pathological — unrelated docs shared enough SHINGLES to band-collide
      // corpus-wide, which is a generator artifact, not web-corpus shape),
      // 60% medium tail (grows with corpus, Heaps-style), 10% near-unique
      // rare tokens — the prefix filter's real target
      val word =
        if (u < 0.30) "c" + alpha((math.pow(rnd.nextDouble(), 2.0) * 3000).toLong)
        else if (u < 0.90) "m" + alpha(rnd.nextInt(20000 * vocabScale).toLong)
        else "r" + alpha(rnd.nextLong())
      sb.append(word).append(' ')
      i += 1
    }
    var text = sb.toString
    if (srcId != id) { // mutate ~5% of tokens so jaccard ≈ 0.9
      val mrnd = new scala.util.Random(id * 0x9e3779b97f4a7c15L + 31)
      text = text.split(' ').map(w =>
        if (mrnd.nextDouble() < 0.05) "x" + alpha(mrnd.nextLong()) else w
      ).mkString(" ")
    }
    text
  }

  private def genCorpus(spark: SparkSession, path: String, nDocs: Long,
                        vocabScale: Int): Unit = {
    val target = new java.io.File(s"$path/documents.parquet")
    if (target.exists()) return // idempotent across probe runs
    import spark.implicits._
    spark.range(nDocs).select(col("id").as("doc_id")).as[Long]
      .map { id =>
        val text = genText(id, vocabScale)
        (id, text, "l" + (id % Langs), "s" + (id % Sources), text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(target.toString)
  }

  /** Sum of a named metric over all nodes matching `pick`, walked through
    * AQE stage boundaries (SparkPlan.collect stops at them). */
  private def deepMetric(p: org.apache.spark.sql.execution.SparkPlan,
                         metricName: String,
                         pick: org.apache.spark.sql.execution.SparkPlan => Boolean): Long = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val here =
      if (pick(p) && p.metrics.contains(metricName)) p.metrics(metricName).value else 0L
    val through = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    here + through.map(deepMetric(_, metricName, pick)).sum
  }

  private def shuffleRecords(df: DataFrame): Long = {
    // execute df's OWN QueryExecution — df.count() would wrap the plan in a
    // new aggregation QueryExecution and leave these metrics untouched
    df.queryExecution.toRdd.count()
    deepMetric(df.queryExecution.executedPlan, "shuffleRecordsWritten",
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/scaleprobe")
    val baseRows = 5000L // sf0.1's documents row count
    val batch = 1000L    // FIXED ingest batch across all scales
    val capK = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scales = Seq(1, 10, 100)
    // corpus dirs carry a generator version: regenerating after a generator
    // change must never silently reuse stale data (genCorpus is idempotent)
    def corpusDir(m: Int) = s"$root/v4x$m"
    scales.foreach { m =>
      val (_, t) = timed(genCorpus(spark, corpusDir(m), baseRows * m, m))
      println(f"[scaleprobe] gen x$m%-3d (${baseRows * m}%7d docs) ${t}%6.1f s")
    }

    // ---- probe (a): incremental candidate economics, fixed batch ----
    println("[scaleprobe] (a) dedup_incremental: fixed 1000-doc batch vs growing corpus")
    println("[scaleprobe] scale corpusRows baseSideRows batchSideRows candPairs fullCandPairs incrSec")
    val aRows = scales.map { m =>
      val dir = corpusDir(m)
      val n = baseRows * m
      val cut = n - batch - 1 // batch = doc_id > cut, exactly `batch` docs
      val (incStats, _) =
        timed(graft.dedup.Dedup.jaccardCandidateStats(spark, dir, 0.8, Some(cut)))
      // full self-join candidates for contrast (skip at 100×: its candidate
      // set is the quadratic blow-up the incremental path exists to avoid)
      val fullPairs =
        if (m <= 10) graft.dedup.Dedup.jaccardCandidateStats(spark, dir, 0.8, None)._3
        else -1L
      val (pairs, tInc) =
        timed(graft.dedup.Dedup.incrementalJaccardAt(spark, dir, cut).count())
      println(f"[scaleprobe] x$m%-4d $n%9d ${incStats._1}%11d ${incStats._2}%12d ${incStats._3}%9d $fullPairs%12d $tInc%6.2f  (verified pairs=$pairs)")
      (m, n, incStats._1, incStats._2, incStats._3, fullPairs)
    }
    def slope(x1: Double, y1: Double, x2: Double, y2: Double): Double =
      (math.log(y2) - math.log(y1)) / (math.log(x2) - math.log(x1))
    val (m1, n1, _, b1, c1, f1) = aRows.head
    val (m3, n3, _, b3, c3, _) = aRows.last
    val f2 = aRows(1)._6
    // a zero count on the small end (possible when the fixed batch crosses
    // no near-dup block boundary at 1×) has no log — use the 10×→100× leg
    val (cx1, cy1) = if (c1 > 0) (n1.toDouble, c1.toDouble)
                     else (aRows(1)._2.toDouble, aRows(1)._5.toDouble)
    println(f"[scaleprobe] (a) exponents over 1x→100x: batchSideRows ${slope(n1.toDouble, b1.toDouble, n3.toDouble, b3.toDouble)}%.2f, candPairs ${slope(cx1, cy1, n3.toDouble, c3.toDouble)}%.2f (1.0 = linear, 2.0 = corpus²; zero-start legs measured from 10×); full self-join candPairs 1x→10x ${slope(n1.toDouble, f1.toDouble, 10.0 * n1, f2.toDouble)}%.2f")

    // ---- probe (c): MinHash-LSH candidate growth through the PRODUCTION
    // capped path. First lesson of this probe (kept for the record): an
    // UNCAPPED band self-join on the v1 corpus went quadratic — 2.8M pairs
    // at 5k docs, 307M at 50k (exponent ~2) — because a too-steep common
    // vocabulary made unrelated docs share enough shingles to band-collide
    // corpus-wide. That is exactly the degenerate-corpus cliff
    // `minhashLsh`'s bucket cap exists for: the measured path below is the
    // production operator's (windowed bucket_n <= maxBucket), with any
    // shed mass observable as dropped buckets, on the v2 corpus. ----
    println("[scaleprobe] (c) minhash LSH: capped candidate pairs vs corpus size")
    println("[scaleprobe] scale corpusRows bandRows cappedRows candPairs droppedBuckets estKept lshSec")
    val cRows = scales.map { m =>
      val dir = corpusDir(m)
      val n = baseRows * m
      val banded = graft.dedup.Dedup.signaturesDF(spark, dir)
        .select(col("doc_id"),
          posexplode(graft.dedup.Dedup.bandHashesCol(col("sig"))).as(Seq("band", "bh")))
      val byBucket = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("bh"))
      val withN = banded.withColumn("bucket_n", count(lit(1)).over(byBucket))
      val capped = withN.filter(col("bucket_n") <= 2000)
      val aa = capped.select(col("band"), col("bh"), col("doc_id").as("d1"))
      val bb = capped.select(col("band"), col("bh"), col("doc_id").as("d2"))
      val joined = aa.join(bb.hint("shuffle_merge"), Seq("band", "bh"))
        .filter(col("d1") < col("d2"))
      val ((bandRows, cappedRows, candPairs, dropped, estKept), tLsh) = timed {
        (banded.count(), capped.count(),
          joined.select(col("d1"), col("d2")).dropDuplicates("d1", "d2").count(),
          withN.filter(col("bucket_n") > 2000)
            .select(col("band"), col("bh")).distinct().count(),
          // the production funnel's next stage: signature-estimate filter at
          // the verified pipeline's default cutoff (0.8 - 0.3 margin)
          graft.dedup.Dedup.minhashLsh(spark, dir, threshold = 0.5).count())
      }
      println(f"[scaleprobe] x$m%-4d $n%9d $bandRows%9d $cappedRows%10d $candPairs%9d $dropped%14d $estKept%8d $tLsh%6.2f")
      (n, candPairs, estKept)
    }
    println(f"[scaleprobe] (c) exponents over 1x→100x: capped candidate pairs ${slope(cRows.head._1.toDouble, cRows.head._2.toDouble, cRows.last._1.toDouble, cRows.last._2.toDouble)}%.2f, est-filtered pairs ${slope(cRows.head._1.toDouble, cRows.head._3.toDouble, cRows.last._1.toDouble, cRows.last._3.toDouble)}%.2f (1.0 = linear)")

    // ---- probe (b): source-cap shuffle rows vs window ----
    println("[scaleprobe] (b) sample_source_cap: rows crossing the exchange")
    println("[scaleprobe] scale corpusRows topkShuffleRows windowShuffleRows bound(parts*sources*k) topkSec winSec")
    scales.foreach { m =>
      val dir = corpusDir(m)
      val n = baseRows * m
      val capped = graft.sample.Sampling.sourceCap(spark, dir, capK)
      val (topkRows, tTopk) = timed(shuffleRecords(capped))
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("h").desc, col("doc_id"))
      val windowed = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          graft.functions.Fnv32.fnv32(concat(col("doc_id").cast("string"), lit(":cap"))).as("h"))
        .withColumn("rank", row_number().over(W)).filter(col("rank") <= capK)
      val (winRows, tWin) = timed(shuffleRecords(windowed))
      if (m == 1 && args.contains("--plans")) {
        println("[scaleprobe] window executed plan:\n" +
          windowed.queryExecution.executedPlan.toString)
        println("[scaleprobe] topk executed plan:\n" +
          capped.queryExecution.executedPlan.toString)
      }
      val parts = spark.read.parquet(s"$dir/documents.parquet").rdd.getNumPartitions
      println(f"[scaleprobe] x$m%-4d $n%9d $topkRows%14d $winRows%16d ${parts.toLong * Sources * capK}%12d $tTopk%6.2f $tWin%6.2f")
    }

    // ---- probe (d): hyperplane-LSH candidate growth — the n^ρ law ----
    // The claim under test (EmbeddingLsh scaladoc): a FIXED band width
    // saturates its 2^w buckets as the corpus grows, so candidates go
    // quadratic; scaling width with log₂(n) (and growing bands to hold the
    // per-pair collision recall constant — the LSH n^ρ tradeoff) keeps
    // bucket occupancy, and thus candidates-per-vector, bounded. Planted
    // near-dup pairs (cosine ≈ 0.95) give a linear-cost recall measurement
    // at every scale — no quadratic truth computation anywhere.
    println("[scaleprobe] (d) embedding LSH: fixed-width vs log-scaled bands, planted-pair recall")
    println("[scaleprobe] scale vecs cfg bands width candPairs plantedRecall sec")
    val pBit = 1.0 - math.acos(0.90) / math.Pi // collision prob per bit at τ=0.9
    val dRows = scales.map { m =>
      val nVec = 2000L * m
      val dir = s"$root/vec_v1x$m"
      genVectors(spark, dir, nVec)
      val planted = (0L until nVec - 1).count(_ % 97 == 0).toDouble
      def run(bands: Int, width: Int): (Long, Double, Double) = {
        val planes = graft.dedup.EmbeddingLsh.planesFor(bands * width)
        val ((cand, recall), t) = timed {
          import spark.implicits._
          val bandRows = spark.read.parquet(dir).as[(Long, Array[Float])]
            .mapPartitions { it =>
              it.flatMap { case (id, v) =>
                (0 until bands).iterator.map { b =>
                  var key = 0L
                  var i = 0
                  while (i < width) {
                    val p = planes(b * width + i)
                    var dot = 0.0
                    var j = 0
                    while (j < v.length) { dot += v(j) * p(j); j += 1 }
                    if (dot >= 0) key |= (1L << i)
                    i += 1
                  }
                  (id, b, key)
                }
              }
            }.toDF("vec_id", "band", "key")
          val cand = bandRows.as("a").join(bandRows.as("b"),
              col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
                col("a.vec_id") < col("b.vec_id"))
            .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"))
            .dropDuplicates("d1", "d2")
          val nCand = cand.count()
          val hits = cand.filter(col("d2") === col("d1") + 1 && col("d1") % 97 === 0).count()
          (nCand, hits / planted)
        }
        (cand, recall, t)
      }
      // fixed config: the production default's width. Skipped at 100× —
      // its saturated buckets are the quadratic blow-up under test (the
      // probe-(a) full-self-join precedent); exponent from 1×→10×.
      val (cF, rF, tF) = if (m <= 10) run(8, 8) else (-1L, -1.0, -1.0)
      // scaled config: width tracks log₂(n); bands hold target recall 0.9
      val w = math.ceil(math.log(nVec.toDouble) / math.log(2)).toInt
      val b = math.max(8, math.ceil(math.log(1.0 - 0.9) / math.log(1.0 - math.pow(pBit, w))).toInt)
      val (cS, rS, tS) = run(b, w)
      println(f"[scaleprobe] x$m%-4d $nVec%7d fixed  8 8  $cF%10d $rF%6.3f $tF%6.2f")
      println(f"[scaleprobe] x$m%-4d $nVec%7d scaled $b%2d $w%2d $cS%10d $rS%6.3f $tS%6.2f")
      (nVec, cF, cS)
    }
    println(f"[scaleprobe] (d) exponents: fixed-width candPairs 1x→10x ${slope(dRows.head._1.toDouble, dRows.head._2.toDouble, dRows(1)._1.toDouble, dRows(1)._2.toDouble)}%.2f, log-scaled candPairs 1x→100x ${slope(dRows.head._1.toDouble, dRows.head._3.toDouble, dRows.last._1.toDouble, dRows.last._3.toDouble)}%.2f (1.0 = linear)")
    // ---- probe (e): Misra-Gries heavy hitters — bounded exchange vs vocab ----
    // Claim under test (MisraGries / TextAnalysis.heavyHitters scaladoc):
    // the naive GROUP BY word ships ≈ vocab-per-partition partial rows
    // through the exchange (map-side combine caps at the vocabulary, which
    // GROWS with the corpus — the generator scales vocab with m); the
    // sketch path ships one ≤2·capacity buffer per partition in pass 1 and
    // ≤ capacity+1 bucketed partials per partition in pass 2 — both
    // independent of vocabulary size.
    println("[scaleprobe] (e) heavy hitters: shuffle rows, naive vocab agg vs MG sketch pass 2")
    println("[scaleprobe] scale corpusRows vocab naiveShuffleRows pass2ShuffleRows bound naiveSec mgSec")
    val eRows = scales.map { m =>
      val dir = corpusDir(m)
      import spark.implicits._
      val toks = graft.Tables.documents(spark, dir)
        .select(explode(graft.text.TextAnalysis.tokensCol(col("text"))).as("word"))
      val vocab = toks.distinct().count()
      val naive = toks.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      val (naiveRows, tN) = timed(shuffleRecords(naive))
      val parts = graft.Tables.documents(spark, dir).rdd.getNumPartitions
      val ((p2Rows, nCands), tMg) = timed {
        val sketch = toks.as[String]
          .select(new graft.functions.MisraGries(200).toColumn.name("mg")).head()
        val cands = sketch.keys.toSeq.sorted
        val bucketed = toks
          .groupBy(when(col("word").isInCollection(cands), col("word"))
            .otherwise(lit(" other")).as("w"))
          .agg(count(lit(1)).as("cnt"))
        (shuffleRecords(bucketed), cands.size)
      }
      println(f"[scaleprobe] x$m%-4d ${baseRows * m}%9d $vocab%7d $naiveRows%15d $p2Rows%15d ${parts.toLong * (nCands + 1)}%10d $tN%6.2f $tMg%6.2f")
      (vocab, naiveRows, p2Rows)
    }
    println(f"[scaleprobe] (e) exponents vs vocab 1x→100x: naive partial rows ${slope(eRows.head._1.toDouble, eRows.head._2.toDouble, eRows.last._1.toDouble, eRows.last._2.toDouble)}%.2f, sketch pass-2 rows ${slope(eRows.head._1.toDouble, eRows.head._3.toDouble, eRows.last._1.toDouble, eRows.last._3.toDouble)}%.2f (1.0 = grows with vocab, 0.0 = bounded)")

    spark.stop()
  }

  /** Deterministic unit vectors with cluster structure and planted near-dup
    * pairs: vec(id) for id % 97 == 0 is copied at id+1 with a small
    * perturbation (cosine ≈ 0.95) — a linear-cost recall target at any
    * scale. 50 vectors per cluster center; all coordinates hash-derived
    * (SplitMix64 → Irwin-Hall gaussian-ish), no driver loop. */
  private def genVectors(spark: SparkSession, path: String, nVec: Long): Unit = {
    val target = new java.io.File(path)
    if (target.exists()) return
    import spark.implicits._
    import graft.sim.Similarity.mix64
    def g(seed: Long, k: Long): Double = {
      // Irwin-Hall(4) centered: mean 0, var 1/3 — gaussian-ish, cheap
      var s = 0.0
      var i = 0
      while (i < 4) {
        val h = mix64(seed * 1000003L + k * 7919L + i)
        s += (h >>> 11).toDouble / (1L << 53).toDouble
        i += 1
      }
      s - 2.0
    }
    spark.range(nVec).as[Long].map { id =>
      val base = if (id % 97 == 1 && id > 0) id - 1 else id
      val cluster = base / 50
      val v = new Array[Float](graft.dedup.EmbeddingLsh.Dims)
      var nrm = 0.0
      var j = 0
      while (j < v.length) {
        val center = g(cluster + 1, j)
        val noise = 0.5 * g(base + 1000000007L, j)
        // the planted copy perturbs its ORIGINAL's coordinates slightly
        val perturb = if (base != id) 0.22 * g(id + 2000000011L, j) else 0.0
        val x = center + noise + perturb
        v(j) = x.toFloat
        nrm += x * x
        j += 1
      }
      val inv = (1.0 / math.sqrt(nrm)).toFloat
      j = 0
      while (j < v.length) { v(j) *= inv; j += 1 }
      (id, v)
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(path)
  }
}
