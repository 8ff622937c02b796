package graft.sample

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Fnv32
import graft.text.TextAnalysis

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): score every raw document by how much more likely its HASHED
  * N-GRAM profile is under a target distribution (the high-quality corpus
  * you wish you had more of) than under the raw pool, then keep the
  * highest-importance documents. The published estimator: unigram+bigram
  * features hashed into B buckets, per-bucket log-likelihood ratio
  * `llr_b = ln p_target(b) − ln p_raw(b)` (add-one smoothed), per-document
  * importance = Σ over its grams of llr. Here target = the corpus's `en`
  * slice (the "trusted side" a real pipeline would point at Wikipedia),
  * raw = the whole corpus.
  *
  * Cross-engine determinism — the fixed-point-LLR surface: ln is the one
  * non-IEEE-exact op, so each of the B bucket llrs is rounded ONCE to an
  * integer micro-llr (`CAST(ROUND(llr·10⁶) AS BIGINT)`), and every
  * per-document score is then an EXACT integer dot product
  * `Σ c_{d,b} · llr_fx(b)` — integer arithmetic both engines reproduce
  * bit-for-bit (the sq8 explicit-fold precedent, strengthened: only B=64
  * values ever touch the rounding boundary, not one per document). Bucket
  * hashing is the engine's codegen FNV-1a, re-derived in the oracle.
  *
  * Scale shape: ONE corpus scan — the (doc, bucket, count) table is
  * localCheckpointed (the Packing countedOnce precedent) and feeds all
  * three consumers (raw distribution, target distribution, scoring join);
  * both distributions are B-row aggregates (map-side combined), the llr
  * table is B rows broadcast, and the final top-N is a
  * TakeOrderedAndProject (bounded heaps, never a global sort). At 100 TB
  * the checkpoint is a linear spill of ≤ B rows per doc; the paper's own
  * deployment hashes into 10⁴ buckets and fits the llr table in KBs.
  */
object Dsir {

  val NumBuckets = 64
  val TopN = 100

  /** Unigrams ++ bigrams ("a b") of a token array — the DSIR feature set. */
  def gramsCol(tk: Column): Column =
    concat(tk, transform(
      slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
      (x, i) => concat_ws(" ", x, element_at(tk, i + 2))))

  /** The registered query: the TopN highest-importance documents with their
    * exact integer micro-llr score and gram count. */
  def importanceTop(spark: SparkSession, dir: String,
                    targetLang: String = "en"): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        explode(gramsCol(TextAnalysis.tokensCol(col("text")))).as("g"))
      .select(col("doc_id"), col("lang"),
        (Fnv32.fnv32(col("g")) % NumBuckets).as("bucket"))
    // ONE corpus scan: the per-(doc,bucket) count table feeds the raw
    // distribution, the target distribution, and the scoring join
    val cnts = grams
      .groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val w = Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val raw = cnts.groupBy(col("bucket")).agg(sum(col("c")).as("rc"))
    val tgt = cnts.filter(col("lang") === targetLang)
      .groupBy(col("bucket")).agg(sum(col("c")).as("tc"))
    // B-row llr table: totals via a window over the already-aggregated
    // B-row frame (the temperature-mixture precedent), one rounding per
    // bucket onto the integer micro-llr surface
    val llr = raw.join(tgt, Seq("bucket"), "left")
      .select(col("bucket"), col("rc"), coalesce(col("tc"), lit(0L)).as("tc"))
      .withColumn("rtot", sum(col("rc")).over(w))
      .withColumn("ttot", sum(col("tc")).over(w))
      .select(col("bucket"),
        round((log((col("tc") + 1L).cast("double") / (col("ttot") + NumBuckets)) -
               log((col("rc") + 1L).cast("double") / (col("rtot") + NumBuckets))) * 1e6, 0)
          .cast("bigint").as("llr_fx"))
    cnts.join(broadcast(llr), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("llr_fx")).as("score_fx"), sum(col("c")).as("n_grams"))
      .orderBy(col("score_fx").desc, col("doc_id"))
      .limit(TopN)
  }

  /** DuckDB re-derivation of [[importanceTop]]. `fnv` renders the caller's
    * FNV-1a SQL fragment over a varchar expression (the shared oracle
    * helper). */
  def oracleSql(fnv: String => String, targetLang: String = "en"): String =
    s"""WITH tk AS (SELECT doc_id, lang,
       |  list_filter(string_split_regex(text, '[^\\p{L}]+'), x -> x <> '') AS t FROM documents),
       |g AS (SELECT doc_id, lang,
       |  list_concat(t, list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS grams FROM tk),
       |c AS (SELECT doc_id, lang, ${fnv("gram")} % $NumBuckets AS bucket,
       |        CAST(COUNT(*) AS BIGINT) AS c
       |      FROM (SELECT doc_id, lang, unnest(grams) AS gram FROM g)
       |      GROUP BY doc_id, lang, bucket),
       |raw AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS rc FROM c GROUP BY bucket),
       |tgt AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS tc FROM c WHERE lang = '$targetLang' GROUP BY bucket),
       |tot AS (SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM c) AS rtot,
       |               (SELECT CAST(SUM(c) AS BIGINT) FROM c WHERE lang = '$targetLang') AS ttot),
       |llr AS (SELECT raw.bucket,
       |          CAST(ROUND((ln(CAST(COALESCE(tc, 0) + 1 AS DOUBLE) / (ttot + $NumBuckets)) -
       |                      ln(CAST(rc + 1 AS DOUBLE) / (rtot + $NumBuckets))) * 1000000) AS BIGINT) AS llr_fx
       |        FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket, tot)
       |SELECT c.doc_id, CAST(SUM(c.c * llr.llr_fx) AS BIGINT) AS score_fx,
       |  CAST(SUM(c.c) AS BIGINT) AS n_grams
       |FROM c JOIN llr ON c.bucket = llr.bucket
       |GROUP BY c.doc_id ORDER BY score_fx DESC, doc_id LIMIT $TopN""".stripMargin
}
