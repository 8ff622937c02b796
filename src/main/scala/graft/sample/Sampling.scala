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
}
