package graft.sample

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fnv32

/** Deterministic sampling for training-data assembly.
  *
  * Both operators key off the same primitive: `bucket(doc) = fnv32(doc_id)
  * % 100` — a content-independent, ENGINE-INDEPENDENT hash bucket (the
  * codegen'd FNV-1a expression on the Spark side, the same arithmetic
  * re-derived in the DuckDB oracle). That determinism is the point:
  * `Dataset.sample`'s row ordering/partitioning-sensitive RNG can never be
  * value-checked across engines or reproduced across re-runs of a resized
  * cluster, while a hash bucket gives every row a stable fate — resampling
  * a 100 TB corpus after adding a source keeps every previously-kept row,
  * which is what makes dataset versions diffable. Both are map-only
  * codegen'd filters: no shuffle, no RNG state, trivially parallel.
  */
object Sampling {

  /** Stable per-document bucket in [0, 100). */
  def bucketCol(id: Column): Column = Fnv32.fnv32(id.cast("string")) % 100

  /** Salted bucket in [0, 100): `fnv32(id || salt) % 100`. A distinct salt
    * per decision keeps fates independent — a document's train/val/test
    * fate says nothing about its weighted-sampling fate, so composing
    * operators never correlates their keep sets. */
  def saltedBucketCol(id: Column, salt: String): Column =
    Fnv32.fnv32(concat(id.cast("string"), lit(salt))) % 100

  /** Stratified mixture sampling — the "data mixing" step of an LLM
    * pipeline: per-language keep rates (e.g. downsample overrepresented
    * languages, upsample scarce ones), applied as `bucket < rate*100`.
    * Emits the kept rows with their bucket so the oracle can re-derive the
    * exact keep decision per row. */
  def mixture(spark: SparkSession, dir: String,
              rates: Map[String, Int] = Map(
                "en" -> 90, "fr" -> 75, "de" -> 50, "es" -> 25, "zh" -> 10))
  : DataFrame = {
    val rateCol = rates.foldLeft(lit(0)) { case (acc, (lang, pct)) =>
      when(col("lang") === lang, lit(pct)).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), bucketCol(col("doc_id")).as("bucket"))
      .filter(col("bucket") < rateCol)
  }

  /** Deterministic train/val/test split by hash range: 80/10/10. Every row
    * lands in exactly one split, stable under re-runs, repartitioning, and
    * corpus growth. */
  def split(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), bucketCol(col("doc_id")).as("bucket"))
      .select(col("doc_id"), col("lang"), col("bucket"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test").as("split"))

  /** Deterministic GLOBAL SHUFFLE — the "shuffle the corpus before
    * training" step. Every document gets a stable pseudo-random rank (a
    * salted FNV hash), a training shard (`rank mod nShards`) and its
    * position within the shard, so the shuffled order is a pure function of
    * the corpus: reproducible across re-runs, cluster sizes and engines
    * (the oracle re-derives the identical permutation), and diffable when
    * the corpus grows — adding documents never reorders existing shards
    * beyond the insertion points.
    *
    * Scale shape: the hash/shard assignment is map-only; the only exchange
    * is the per-shard `row_number` window, a hash partition on `shard`
    * followed by a LOCAL sort — never a global single-task sort. `nShards`
    * is the output-file count: at 100 TB it is chosen so a shard is a few
    * GB (tens of thousands of shards), which also bounds the per-task sort.
    * Ties on the 31-bit hash break by doc_id, so the order is total in
    * both engines. */
  def shuffle(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        Fnv32.fnv32(concat(col("doc_id").cast("string"), lit(":shuffle"))).as("h"))
      .withColumn("shard", col("h") % nShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))).cast("bigint"))
  }

  /** QUALITY-WEIGHTED sampling — keep a document with probability equal to
    * its [[graft.text.TextAnalysis.qualityScore]] (CCNet/DoReMi-style
    * quality-proportional downsampling), decided by the same deterministic
    * hash-fate primitive as [[mixture]]: keep iff
    * `bucket(doc_id:wq) < quality * 100`. The score and the comparison are
    * pure IEEE arithmetic re-derived exactly by the oracle, so every keep
    * decision is cross-engine reproducible — no RNG state anywhere.
    * Map-only: score, bucket and filter all ride the corpus scan (zero
    * exchanges, spec-enforced). */
  def weightedByQuality(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.qualityScore(spark, dir)
      .select(col("doc_id"), col("quality_score"),
        saltedBucketCol(col("doc_id"), ":wq").as("bucket"))
      .filter(col("bucket").cast("double") < col("quality_score") * 100)

  /** PER-SOURCE CAP (domain capping) — bound each source's contribution to
    * the mixture: keep at most `k` documents per source, chosen by the same
    * deterministic salted-hash fate as the other samplers (top-k by
    * `fnv32(doc_id:cap)`, ties to the smaller doc_id), so the kept set is a
    * uniform, reproducible, engine-independent sample of each source — a
    * source that doubles in size keeps the same cap winners plus/minus the
    * hash order, never a different RNG draw.
    *
    * Rides the custom [[graft.plans.TopK]] physical operator instead of a
    * `row_number` window: map-side bounded heaps shed everything but
    * sources×k rows BEFORE the exchange, so at 100 TB the shuffle carries
    * the capped output, not the corpus. (Spark 3.5+'s WindowGroupLimit
    * bounds the window form's shuffle too — ScaleProbe measures both at
    * ≈ partitions×sources×k rows — but pays a full map-side SORT of every
    * corpus row to do it, where the heaps are O(n log k) sort-free; see
    * TopKPerKey's scaladoc.) */
  def sourceCap(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    graft.plans.TopK.perKey(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          Fnv32.fnv32(concat(col("doc_id").cast("string"), lit(":cap"))).as("h")),
      Seq("source"), "h", "doc_id", k)

  /** TEMPERATURE-SCALED SOURCE MIXING — the "how much of each source goes
    * into the training mix" step (the multilingual-pretraining sampling rule
    * of Lample & Conneau, "Cross-lingual Language Model Pretraining", 2019:
    * p_s ∝ c_s^τ with τ < 1 flattening the source distribution so
    * head sources are downsampled and tail sources upsampled).
    *
    * Per source: its whitespace-token count c_s, its raw corpus share, its
    * temperature share p_s = c_s^τ / Σ_t c_t^τ, the token budget allocated
    * to it under a total budget B (floor(p_s·B) on the ROUNDED share — the
    * integer contract), and the implied epoch count budget/c_s (>1 means
    * the source repeats — the signal a mixture designer actually reads).
    *
    * Scale shape: token counting is map-only arithmetic fused into the
    * scan; ONE map-side-combined exchange produces the sources-sized count
    * table, and that is the ONLY corpus-sized work in the plan. The grand
    * totals are a global window over the already-aggregated sources-sized
    * table — O(sources) rows through one partition, safe at any corpus
    * size, and it keeps the plan to a SINGLE corpus scan (the broadcast-
    * total cross-join form recomputes the scan on the broadcast side:
    * Catalyst only dedupes identical exchanges, not different aggregations
    * over one subtree — caught by this operator's plan-shape spec).
    *
    * Cross-engine surface: c_s is exact integer; pow/÷ are the non-exact
    * ops, so shares are 6-decimal rounded (the ln/TF-IDF acceptance) and
    * everything downstream derives from the rounded share. */
  def temperatureMixture(spark: SparkSession, dir: String,
                         tau: Double = 0.7, budget: Long = 1000000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    Tables.documents(spark, dir)
      .select(col("source"),
        size(array_remove(org.apache.spark.sql.functions.split(col("text"), "\\s+"), ""))
          .cast("bigint").as("n_tok"))
      .groupBy(col("source")).agg(sum(col("n_tok")).as("n_tokens"))
      .withColumn("total_tokens", sum(col("n_tokens")).over(w))
      .withColumn("total_pow", sum(pow(col("n_tokens").cast("double"), tau)).over(w))
      .select(col("source"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("total_tokens"), 6).as("raw_share"),
        round(pow(col("n_tokens").cast("double"), tau) / col("total_pow"), 6).as("temp_share"))
      .select(col("source"), col("n_tokens"), col("raw_share"), col("temp_share"),
        floor(col("temp_share") * budget).cast("bigint").as("budget_tokens"))
      .withColumn("epochs", round(col("budget_tokens").cast("double") / col("n_tokens"), 6))
  }

  /** EPOCH-BASED UPSAMPLING — the replication half of data mixing that
    * `mixture`/`temperatureMixture` (keep/drop) cannot express: a data
    * recipe assigns each source an epoch factor e ≥ 1 (possibly
    * fractional), and every document is emitted floor(e) times plus one
    * more with probability frac(e) — deterministically, via the same
    * hash-fate primitive as every sampler here, so both engines emit the
    * identical multiset. The factor itself derives from the data
    * (fnv32(source), e ∈ {1.0, 1.5, …, 3.0}) so the oracle re-derives it
    * with no side channel; production callers pass their recipe instead.
    *
    * All arithmetic is integer (e is carried as 2e) and the fan-out is a
    * map-only `explode(sequence(1, n_copies))` — zero exchanges at any
    * corpus size, the fixture's zero-exchange plan family. */
  def epochUpsample(spark: SparkSession, dir: String): DataFrame = {
    val e2 = lit(2) + Fnv32.fnv32(col("source")) % 5 // 2e ∈ {2..6}
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), e2.as("e2"),
        (Fnv32.fnv32(concat(col("doc_id").cast("string"), lit(":epoch"))) % 100)
          .as("fate"))
      .withColumn("n_copies",
        expr("e2 DIV 2") +
          when(col("e2") % 2 === 1 && col("fate") < 50, 1L).otherwise(0L))
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
  }
}
