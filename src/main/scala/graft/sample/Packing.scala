package graft.sample

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextAnalysis

/** Concat-and-chunk SEQUENCE PACKING — the step that turns a cleaned corpus
  * into fixed-length pretraining sequences: documents are concatenated in a
  * deterministic order (doc_id) and the token stream is cut every `seqLen`
  * tokens. Each document therefore starts at a global token offset
  * (the prefix sum of all earlier documents' token counts) and lands in
  * chunks `floor(offset/seqLen) .. floor((offset+n-1)/seqLen)`; a document
  * straddling a cut is the "crosses_boundary" case a loader must split.
  *
  * Scale shape — the prefix sum is TWO-PHASE, never a global window: a
  * `Window.orderBy` with no partition key collapses Spark to one task and
  * is exactly the trap this operator exists to avoid at 100 TB. Instead the
  * corpus is range-partitioned by doc_id, each partition folds its own
  * token count (one tiny row per partition to the driver), the exclusive
  * per-partition offsets are broadcast back, and a map-only pass assigns
  * every document `partition offset + running local sum`. Driver traffic is
  * O(partitions); everything else is the scan. The DuckDB oracle computes
  * the same assignment with an ordinary windowed cumsum — tractable at
  * test scale, which is the point of re-deriving it independently. */
object Packing {

  def packSequences(spark: SparkSession, dir: String, seqLen: Long = 512): DataFrame = {
    import spark.implicits._
    val counted = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TextAnalysis.tokensCol(col("text"))).cast("bigint").as("n_tokens"))
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, Long)]
    // phase 1: per-partition token totals — one row per partition
    val partSums: Array[(Int, Long)] = counted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(s += _._2)
        Iterator.single((pid, s))
      }.collect()
    // exclusive prefix over the (sorted) partition ids → start offset per
    // partition; range partitioning guarantees pid order == doc_id order
    val offsets: Map[Int, Long] = {
      var acc = 0L
      partSums.sortBy(_._1).map { case (pid, s) =>
        val o = pid -> acc; acc += s; o
      }.toMap
    }
    val bcOff = spark.sparkContext.broadcast(offsets)
    // phase 2: map-only — local running sum + broadcast partition offset
    counted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = bcOff.value(pid)
      it.map { case (id, n) =>
        val start = cum
        cum += n
        (id, n, start)
      }
    }.toDF("doc_id", "n_tokens", "token_start")
      .select(col("doc_id"), col("n_tokens"), col("token_start"),
        (col("token_start") / seqLen).cast("bigint").as("first_chunk"),
        (when(col("n_tokens") > 0, (col("token_start") + col("n_tokens") - 1) / seqLen)
          .otherwise(col("token_start") / seqLen)).cast("bigint").as("last_chunk"))
      .withColumn("crosses_boundary", col("last_chunk") =!= col("first_chunk"))
  }
}
